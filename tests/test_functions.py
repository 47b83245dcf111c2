"""Unit tests for functions/scalars.py on tiny literal DataFrames —
the per-operator test layer the reference lacks (SURVEY §5)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from real_time_fraud_revenue_intelligence_lakehouse_spark.functions.scalars import (
    amount_tier,
    det_round,
    exact_avg,
    exact_sum,
    mask_dotted,
    rate,
    surrogate_key,
)


def test_amount_tier_cuts(spark):
    df = spark.createDataFrame(
        [(0.0,), (49.99,), (50.0,), (199.0,), (200.0,), (999.0,), (1000.0,), (4999.0,), (5000.0,)],
        ["amt"],
    )
    got = [r[0] for r in df.select(amount_tier("amt")).collect()]
    assert got == ["micro", "micro", "low", "low", "medium", "medium", "high", "high", "premium"]


def test_det_round_half_up(spark):
    df = spark.createDataFrame([(0.00005,), (0.12344,), (0.12345,)], ["x"])
    got = [r[0] for r in df.select(det_round(F.col("x"), 4)).collect()]
    assert got[0] == 0.0001 or math.isclose(got[0], 0.0001)
    assert math.isclose(got[1], 0.1234)


def test_exact_sum_and_avg_deterministic(spark):
    rows = [(float(f"{i}.{i%10}{i%7}"),) for i in range(1, 1001)]
    df = spark.createDataFrame(rows, ["x"])
    s1 = df.repartition(1).agg(exact_sum("x", "s")).collect()[0]["s"]
    s8 = df.repartition(8).agg(exact_sum("x", "s")).collect()[0]["s"]
    assert s1 == s8  # bit-identical regardless of partitioning
    a1 = df.repartition(1).agg(exact_avg("x", alias="a")).collect()[0]["a"]
    a8 = df.repartition(8).agg(exact_avg("x", alias="a")).collect()[0]["a"]
    assert a1 == a8


def test_rate_eps_guard(spark):
    df = spark.createDataFrame([(0, 0)], ["n", "d"])
    got = df.select(rate(F.col("n"), F.col("d")).alias("r")).collect()[0]["r"]
    assert got == 0.0  # ε-guard: 0/(0+.001) = 0, no div-by-zero


def test_mask_dotted(spark):
    df = spark.createDataFrame([("10.20.30.40",)], ["ip"])
    got = df.select(mask_dotted("ip").alias("m")).collect()[0]["m"]
    assert got == "10.20.*.*"


def test_surrogate_key_null_safe(spark):
    df = spark.createDataFrame([(1, None)], "a INT, b STRING")
    got = df.select(surrogate_key("a", "b").alias("k")).collect()[0]["k"]
    assert len(got) == 32  # md5 hex; None folded to ''
