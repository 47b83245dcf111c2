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


def test_schema_evolution_merge_schema(spark, tmp_path):
    """Parquet schema evolution: a writer adds a column mid-stream;
    mergeSchema reads both generations, old files surface NULL for
    the new column, and aggregates over the shared columns are
    unchanged — the append-only table-evolution contract a lakehouse
    must honor (the Delta-backed reference gets this from the format;
    the parquet path must match it)."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.sources.tables import read_table

    ev = read_table(spark, SF_SMOKE, "events")
    old = ev.limit(40)
    new = ev.limit(80).subtract(old).withColumn("schema_ver", F.lit(2))
    path = str(tmp_path / "evolving.parquet")
    old.write.mode("append").parquet(path)
    new.write.mode("append").parquet(path)
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert "schema_ver" in merged.columns
    assert merged.count() == 80
    assert merged.filter(F.col("schema_ver").isNull()).count() == 40
    # shared-column aggregate identical to reading without the option
    plain = spark.read.parquet(path)
    a = merged.agg(F.sum("value")).collect()[0][0]
    b = plain.agg(F.sum("value")).collect()[0][0]
    assert a == b


def test_corrupt_json_records_permissive_and_drop(spark, tmp_path):
    """Malformed-row discipline on the JSON source: PERMISSIVE mode
    captures broken lines in a corrupt-record column without killing
    the batch; DROPMALFORMED yields only the clean rows. At 100 TB a
    single bad producer line must never fail an ingest job."""
    p = tmp_path / "raw.jsonl"
    p.write_text(
        '{"event_id": 1, "user_id": 7, "value": 1.5}\n'
        '{"event_id": 2, "user_id": 8, "value": BROKEN}\n'
        '{"event_id": 3, "user_id": 9, "value": 3.0}\n'
    )
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    perm = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
    )
    perm.cache()
    try:
        assert perm.count() == 3
        bad = perm.filter(F.col("_corrupt_record").isNotNull()).collect()
        assert len(bad) == 1 and "BROKEN" in bad[0]["_corrupt_record"]
        good_ids = {r["event_id"] for r in perm.filter(F.col("_corrupt_record").isNull()).collect()}
        assert good_ids == {1, 3}
    finally:
        perm.unpersist()
    dropped = (
        spark.read.schema(T.StructType(schema.fields[:3]))
        .option("mode", "DROPMALFORMED")
        .json(str(p))
    )
    assert {r["event_id"] for r in dropped.collect()} == {1, 3}


def test_read_evolving_absorbs_schema_drift(spark, tmp_path):
    """Bronze schema evolution: a writer adds a column mid-stream; the
    merged read surfaces it (nulls on old files), and conforming to an
    expected schema restores missing columns as typed nulls, drops
    strays, and casts drifted types."""
    from pyspark.sql import types as T

    from real_time_fraud_revenue_intelligence_lakehouse_spark.sources.tables import read_evolving

    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(p)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.mode("append").parquet(p)

    merged = read_evolving(spark, p)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r["id"]: (r["name"], r["score"]) for r in merged.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}

    expected = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("score", T.StringType()),   # drifted type → cast
            T.StructField("flag", T.BooleanType()),   # never written → null
        ]
    )
    conformed = read_evolving(spark, p, expected=expected)
    assert conformed.schema == expected
    got = {r["id"]: (r["score"], r["flag"]) for r in conformed.collect()}
    assert got == {1: (None, None), 2: ("9.5", None)}
