"""Small-file compaction — the parquet stand-in for Delta OPTIMIZE.

The reference's maintenance story (`delta_utils.py:95-116`, OPTIMIZE
+ ZORDER) is gated in this container (no delta-spark); this operator
provides the same operational capability on plain parquet tables:
rewrite a directory of many small files into ceil(bytes/target)
right-sized files. Small files are the classic lakehouse failure
mode — a 100 TB table written from 10k streaming micro-batches reads
10-100× slower through per-file open costs and footer parsing than
the same bytes in 128 MB files.

Sizing uses the Hadoop FileSystem's content summary (works on local
paths, HDFS, and S3A alike) — NOT a driver-side os.walk, so the same
code runs against object stores.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def table_bytes(spark: SparkSession, path: str) -> int:
    """Total on-disk bytes under ``path`` via the Hadoop FS client."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.getContentSummary(hpath).getLength()


def compaction_file_count(
    spark: SparkSession, path: str, target_bytes: int = DEFAULT_TARGET_BYTES
) -> int:
    """Number of output files a compaction of ``path`` should produce."""
    return max(1, math.ceil(table_bytes(spark, path) / target_bytes))


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
) -> int:
    """Rewrite the parquet table at ``src_path`` into
    ceil(bytes/target) files at ``dst_path``; returns the file count.

    `repartition(n)` (round-robin) rather than `coalesce(n)`:
    coalesce merges whole input partitions without a shuffle, so a
    skewed input (one 10 GB file among thousands of 1 MB ones)
    produces skewed output; the round-robin exchange costs one
    shuffle and yields uniformly sized files — the point of
    compaction. Write-then-swap (the ingest module's rename dance)
    is the caller's concern when compacting in place."""
    df: DataFrame = spark.read.parquet(src_path)
    n = compaction_file_count(spark, src_path, target_bytes)
    df.repartition(n).write.mode("overwrite").parquet(dst_path)
    return n
