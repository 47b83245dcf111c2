"""Compaction operator: many small parquet files → ceil(bytes/target)
right-sized files, bit-equal content (the Delta OPTIMIZE stand-in)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_compact_parquet_reduces_files_and_preserves_rows(spark, tmp_path):
    from real_time_fraud_revenue_intelligence_lakehouse_spark.operators.compaction import (
        compact_parquet,
        compaction_file_count,
        table_bytes,
    )
    from real_time_fraud_revenue_intelligence_lakehouse_spark.sources.tables import read_table

    src = str(tmp_path / "shredded")
    dst = str(tmp_path / "compacted")
    ev = read_table(spark, SF_SMOKE, "events")
    ev.repartition(50).write.parquet(src)
    assert len(glob.glob(f"{src}/part-*.parquet")) == 50

    total = table_bytes(spark, src)
    target = max(1, total // 5)
    n = compact_parquet(spark, src, dst, target_bytes=target)
    assert n == compaction_file_count(spark, src, target)
    files = glob.glob(f"{dst}/part-*.parquet")
    assert len(files) == n <= 7  # ceil(bytes/target) with packing overhead slack

    a = spark.read.parquet(src)
    b = spark.read.parquet(dst)
    assert a.count() == b.count()
    sa = a.agg(F.sum(F.col("value").cast("decimal(18,2)"))).collect()[0][0]
    sb = b.agg(F.sum(F.col("value").cast("decimal(18,2)"))).collect()[0][0]
    assert sa == sb
