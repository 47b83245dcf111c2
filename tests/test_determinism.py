"""Cross-engine determinism properties — the foundations under the
hash-gate: portable rounding on half-way ties, order-free money sums,
and permutation-stable aggregates.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from real_time_fraud_revenue_intelligence_lakehouse_spark.functions.scalars import (
    det_round,
    exact_sum,
)

#: Adversarial inputs for 4-digit rounding: exact .5 ties (where
#: Spark's HALF_UP BigDecimal and DuckDB's float rounding disagree),
#: values just above/below ties, and float-representation traps.
TIE_VALUES = [
    0.00005, 0.00015, 0.12345, 0.999949999, 0.99995, 1.00005,
    2.5e-4, 0.1 + 0.2, 1 / 3, 0.0, 1.0, 123.45675,
]


def test_det_round_matches_duckdb_on_ties(spark):
    sdf = spark.createDataFrame([(v,) for v in TIE_VALUES], "v DOUBLE")
    got = [r["r"] for r in sdf.select(det_round(F.col("v"), 4).alias("r")).collect()]
    con = duckdb.connect()
    want = [
        con.execute(
            f"SELECT floor(CAST({v!r} AS DOUBLE) * 10000.0 + 0.5) / 10000.0"
        ).fetchone()[0]
        for v in TIE_VALUES
    ]
    assert got == want  # bit-for-bit, not approx


def test_builtin_round_would_diverge(spark):
    """Documents WHY det_round exists: Spark's round() HALF_UPs the
    decimal representation while the floor formula is pure IEEE
    arithmetic — on at least one tie value they differ."""
    sdf = spark.createDataFrame([(v,) for v in TIE_VALUES], "v DOUBLE")
    rows = sdf.select(
        F.round(F.col("v"), 4).alias("builtin"),
        det_round(F.col("v"), 4).alias("det"),
    ).collect()
    assert any(r["builtin"] != r["det"] for r in rows)


@pytest.mark.parametrize("partitions", [1, 7])
def test_exact_sum_is_partition_order_free(spark, partitions):
    """Money sums must not depend on partitioning/accumulation order:
    decimal accumulation is associative where double addition is not."""
    vals = [(i, ((-1) ** i) * (0.01 + i * 0.07)) for i in range(10_001)]
    df = spark.createDataFrame(vals, "k INT, v DOUBLE").repartition(partitions)
    total = df.agg(exact_sum("v", "s")).collect()[0]["s"]
    # reference: exact decimal arithmetic in Python
    from decimal import Decimal

    want = float(sum(Decimal(str(round(v, 2))) for _, v in vals))
    assert total == pytest.approx(want, abs=1e-9)
    # and identical across the two partition layouts (stronger: equal
    # to itself recomputed — covered by parametrize + hash gate)
