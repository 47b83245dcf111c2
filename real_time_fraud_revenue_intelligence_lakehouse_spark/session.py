"""SparkSession construction with scale-ready defaults.

Mirrors the intent of the reference's session factory
(`spark_jobs/utils/spark_session.py:31-54` — AQE on, coalesce+skew
handling, Kryo) without the S3A/Delta coupling. On a real cluster the
same builder works unchanged; only `master` and memory sizing differ.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Runtime confs that MUST hold for deterministic, oracle-comparable
#: results. Applied to any session handed to the query layer (the
#: driver may pass us a session we did not build).
RUNTIME_CONFS = {
    # Pin UTC so epoch↔timestamp↔date derivations match the DuckDB
    # oracle bit-for-bit regardless of host timezone.
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # The testdata's events.ts is parquet TIMESTAMP(NANOS), which
    # Spark has no native type for — read as epoch-nanos long and
    # convert in sources.tables.read_table (µs truncation, matching
    # DuckDB's internal µs representation).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # r16 (guide §1.2 step 2 / §4 boundary of codegen): the fused
    # multi-accumulator aggregates (q_bootstrap_ci's 96 replicate
    # cells, the GBT histogram arms — up to 512 integer cells per
    # level, stacked across rounds/levels) exceed the default
    # 100-field WholeStageCodegen cutoff and silently fall back to
    # interpreted evaluation. Measured: 96-cell bootstrap aggregate
    # 3x faster in codegen; q_gbt_train cold descent 11.8 s → 3.9 s;
    # q_gbt_depth_selection 23 s → 16 s going 1024 → 4096. The limit
    # is scale-independent (it bounds generated-code size, not data);
    # Spark splits oversized generated functions itself.
    "spark.sql.codegen.maxFields": "4096",
    # r16 (guide §6): the default 4 MB per-file open charge caps scan
    # parallelism of a single-file table at size/4MB tasks — at bench
    # scale the 2.6 MB orders table scans as ONE task under a 32-core
    # session. 256 KB models an NVMe-class open cost honestly and let
    # Spark's own bytesPerCore floor (leaf parallelism = default
    # parallelism) spread small scans; at cluster scale with 128 MB-1 GB
    # files the charge is noise either way. Measured -6% on a 36-query
    # mixed slate (min-of-3 interleaved), no structural regression.
    "spark.sql.files.openCostInBytes": str(256 * 1024),
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (idempotent)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Conf not settable at runtime in this build — non-fatal.
            pass
    return spark


def get_spark(
    app_name: str = "rtfril-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``shuffle_partitions`` defaults to the local core count — on a
    real cluster set it (or let AQE coalesce) to ~2-3× total cores.
    """
    master = master or os.environ.get("SPARK_MASTER", "local[*]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # saveAsTable target (bucketed-table tests); static conf, so
        # set at build. Clusters override with their own warehouse.
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/rtfril-spark-warehouse"),
        )
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
