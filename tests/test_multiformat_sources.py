"""Source-format parity: the engine's transformations are declared
over DataFrames, so any Spark-readable format must produce identical
results. Round-trips the events table through CSV and JSON (explicit
schema — schema inference is banned at scale) and re-runs a
representative aggregation on each, asserting equality with the
parquet path. Covers SURVEY §2.1's raw-source surface beyond parquet."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from tests.conftest import SF_SMOKE

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _rollup(df):
    return (
        df.groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("v"),
        )
        .collect()
    )


def test_csv_json_sources_match_parquet(spark, tmp_path):
    from real_time_fraud_revenue_intelligence_lakehouse_spark.sources.tables import read_table

    pq = read_table(spark, SF_SMOKE, "events")
    expected = sorted(map(tuple, _rollup(pq)))

    csv_dir = str(tmp_path / "events_csv")
    json_dir = str(tmp_path / "events_json")
    # timestampFormat with microseconds so the CSV round-trip is lossless
    (pq.write.mode("overwrite")
       .option("header", True)
       .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
       .csv(csv_dir))
    pq.write.mode("overwrite").json(json_dir)

    csv_df = (
        spark.read.schema(EVENT_SCHEMA)
        .option("header", True)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .csv(csv_dir)
    )
    json_df = spark.read.schema(EVENT_SCHEMA).json(json_dir)

    assert sorted(map(tuple, _rollup(csv_df))) == expected
    assert sorted(map(tuple, _rollup(json_df))) == expected
