"""Approximate scale variants of exact aggregates (SURVEY §2.4 A4/A5).

The declared queries use exact forms (hash-gateable); at 100 TB the
approximate forms are the practical choice — `approx_count_distinct`
(HLL++, no giant distinct shuffle) and `percentile_approx` (one-pass
sketch). These tests pin their error against the exact results so the
swap is a measured decision, not a hope."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    import os

    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))


def test_approx_count_distinct_within_rsd(orders):
    row = orders.agg(
        F.countDistinct("o_custkey").alias("exact"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05


def test_percentile_approx_brackets_exact(orders):
    row = orders.agg(
        F.expr("percentile(o_totalprice, 0.95)").alias("exact"),
        F.percentile_approx("o_totalprice", 0.95, 10000).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.01


def test_approx_grouped_within_error_per_group(orders):
    """Per-group HLL++ error stays within ~2.5× the configured rsd.
    (Ranking of near-tied groups is NOT preserved by sketches — the
    priority groups here differ by <1%, so dashboards ordering on
    distinct counts must either use exact counts or tolerate ties.)"""
    g = (
        orders.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("exact"),
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
        )
        .collect()
    )
    assert len(g) == 5
    for r in g:
        assert abs(r["approx"] - r["exact"]) / r["exact"] < 0.05, r
