"""Avro payload parsing — the Schema-Registry ingest path the
reference documents but never ships (SURVEY §2.11: Avro schemas exist
in `data_generator/generators/schemas.py`, the producer sends JSON).

`from_avro` needs the external spark-avro jar (`--packages
org.apache.spark:spark-avro_2.13:<ver>`), absent in this container —
the helper converts Spark's late AnalysisException into an explicit,
testable gate error, mirroring the Delta gating pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class AvroUnavailableError(RuntimeError):
    """Raised when the spark-avro data source is not loaded."""


#: Avro twin of streaming.ingest.EVENTS_SCHEMA, mirroring the
#: reference's generator-side record (`generators/schemas.py`).
EVENTS_AVRO_SCHEMA = """
{"type": "record", "name": "event", "fields": [
  {"name": "event_id", "type": "long"},
  {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
  {"name": "user_id", "type": "long"},
  {"name": "event_type", "type": "string"},
  {"name": "value", "type": "double"},
  {"name": "props", "type": ["null", "string"], "default": null}
]}
"""


def parse_avro_payload(
    raw: DataFrame, avro_schema: str = EVENTS_AVRO_SCHEMA, value_col: str = "value"
) -> DataFrame:
    """S2's Avro form: binary payload → typed columns. Same flatten
    shape as ingest.parse_kafka_payload, so bronze stamping and the
    rest of the pipeline are format-agnostic."""
    from pyspark.sql.avro.functions import from_avro

    try:
        parsed = raw.select(
            from_avro(F.col(value_col), avro_schema).alias("data")
        ).select("data.*")
        parsed.schema  # belt-and-braces: force analysis if it was lazy
    except Exception as e:  # AnalysisException: AVRO_NOT_LOADED...
        if "AVRO_NOT_LOADED" in str(e):
            raise AvroUnavailableError(
                "spark-avro data source not loaded; submit with "
                "--packages org.apache.spark:spark-avro (cluster-only here)"
            ) from e
        raise
    return parsed  # pragma: no cover (needs the jar)
