"""Delta maintenance wrappers: SQL generation + gated degradation."""

from __future__ import annotations

import pytest

from real_time_fraud_revenue_intelligence_lakehouse_spark.sources.delta_maintenance import (
    DeltaUnavailableError,
    optimize_sql,
    optimize_table,
    table_history,
    vacuum_sql,
    vacuum_table,
)


def test_maintenance_sql_strings():
    assert optimize_sql("/data/t") == "OPTIMIZE delta.`/data/t`"
    assert (
        optimize_sql("/data/t", ["user_id", "event_date"])
        == "OPTIMIZE delta.`/data/t` ZORDER BY (user_id, event_date)"
    )
    assert vacuum_sql("/data/t") == "VACUUM delta.`/data/t` RETAIN 168 HOURS"
    assert vacuum_sql("/data/t", 24) == "VACUUM delta.`/data/t` RETAIN 24 HOURS"


def test_jdbc_sink_gates_without_driver(spark):
    """S12 wrapper: without a JDBC driver jar the write raises the
    driver-resolution error (cluster-only, like Delta/Avro)."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.sources.tables import write_jdbc

    df = spark.createDataFrame([(1, "a")], "k INT, v STRING")
    with pytest.raises(Exception) as ei:
        write_jdbc(df, "jdbc:postgresql://localhost:5432/nope", "gold.t")
    assert "driver" in str(ei.value).lower()


def test_avro_parse_gates_cleanly_without_jar(spark):
    """No spark-avro jar here: the Avro ingest path must raise its
    explicit gate error at analysis time, not a raw AnalysisException
    deep in a stream."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.streaming.avro import (
        AvroUnavailableError,
        parse_avro_payload,
    )

    raw = spark.createDataFrame([(bytearray(b"x"),)], "value BINARY")
    with pytest.raises(AvroUnavailableError):
        parse_avro_payload(raw)


def test_delta_ops_gate_cleanly_without_delta(spark):
    """No delta-spark in this container: every op must raise the
    explicit gate error, not an AttributeError mid-flight."""
    for fn in (
        lambda: optimize_table(spark, "/tmp/nope"),
        lambda: vacuum_table(spark, "/tmp/nope"),
        lambda: table_history(spark, "/tmp/nope"),
    ):
        with pytest.raises(DeltaUnavailableError):
            fn()
