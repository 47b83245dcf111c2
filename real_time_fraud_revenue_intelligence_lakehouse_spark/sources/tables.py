"""Batch table sources.

The reference reads Delta (`spark_jobs/utils/delta_utils.py:72-75`);
the engine's batch source is format-agnostic: parquet for the driver
testdata, Delta when the `delta` package is present. Reads are plain
`spark.read` so Catalyst keeps predicate pushdown / column pruning /
partition pruning — never collect-then-filter.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: Driver testdata catalog (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table as a DataFrame (parquet layout).

    Timestamp normalization (the testdata's physical types have
    varied across driver generations — handle both):

    - parquet TIMESTAMP(NANOS) + `nanosAsLong=true` → epoch-nanos
      long, converted here to a µs-truncated TimestampType;
    - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) → Spark reads
      TIMESTAMP_NTZ, which epoch functions (`unix_millis`, range
      frames on epochs) reject — cast to TimestampType. The session
      timezone is pinned UTC (session.RUNTIME_CONFS), so the NTZ→LTZ
      cast reinterprets the wall time as UTC: bit-identical instants
      to DuckDB's µs-internal reader.
    """
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer div: ns ≈ 1.7e18 overflows double-exact range.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def read_delta(spark: SparkSession, path: str, version: int | None = None, timestamp: str | None = None) -> DataFrame:
    """Delta batch read incl. time travel (`delta_utils.py:72-92`).

    Falls back with ImportError when delta-spark is absent (this
    container); the API shape is kept so cluster deployments work.
    """
    reader = spark.read.format("delta")
    if version is not None:
        reader = reader.option("versionAsOf", str(version))
    if timestamp is not None:
        reader = reader.option("timestampAsOf", timestamp)
    return reader.load(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    user: str | None = None,
    password: str | None = None,
    batch_size: int = 10_000,
) -> None:
    """S12: the reference's warehouse hop
    (`revenue_aggregations.py:36-43` — `df.write.jdbc(url, "gold.<t>",
    mode="overwrite", properties)`). The engine replaces Postgres with
    Spark SQL views for querying (SURVEY §3.3), so this exists for
    parity/export only; no JDBC driver ships in this container.

    Executors open their own connections and insert in
    ``batchsize`` row batches — at scale `repartition` the DataFrame
    to the warehouse's tolerated connection count first (gold
    aggregates are small; the hop is never the bottleneck)."""
    props = {"batchsize": str(batch_size)}
    if user is not None:
        props["user"] = user
    if password is not None:
        props["password"] = password
    df.write.jdbc(url, table, mode=mode, properties=props)


def write_batch(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """Partitioned batch write (`delta_utils.py:27-39` semantics).

    Partitioning by a low-cardinality date column is the engine's
    primary 100 TB pruning lever; callers should `repartition` on the
    partition column first to avoid small-file explosions.
    """
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def read_evolving(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    expected: "T.StructType | None" = None,
) -> DataFrame:
    """Schema-evolution-tolerant batch read: union the schemas of every
    file in ``path`` (``mergeSchema`` — columns added by newer writers
    surface as nulls on older files) and, when ``expected`` is given,
    conform the result to it — missing columns materialize as typed
    nulls, extra columns are dropped, and mismatched types cast. This
    is the ingestion posture a long-lived lakehouse table needs: bronze
    writers gain columns over months, and a reader pinned to SELECT *
    of file 1's footer silently loses them (or crashes on reordering).
    The reference hard-codes its schemas (`spark_jobs/utils/
    schemas.py`) and would break on drift; here drift is absorbed and
    the q_schema_drift audit reports it. mergeSchema costs a footer
    read per file — at 100 TB keep table schemas in a catalog and use
    this for the bronze landing zone only."""
    df = spark.read.format(fmt).option("mergeSchema", "true").load(path)
    if expected is not None:
        cols = []
        have = {f.name: f for f in df.schema.fields}
        for f in expected.fields:
            if f.name in have:
                src = F.col(f.name)
                cols.append(src.cast(f.dataType).alias(f.name) if have[f.name].dataType != f.dataType else src)
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        df = df.select(*cols)
    return df
