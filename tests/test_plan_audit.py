"""The plan_audit SinglePartition rule (VERDICT r10 #2): unpartitioned
windows / global sorts over unreduced base rows must flag; windows
over aggregated frames and driver-local spines must not."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from plan_audit import single_partition_over_base  # noqa: E402

SF = "/root/testdata/sf0.001"


def _tree(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_rule_catches_unpartitioned_window_over_base_rows(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    bad = o.select(
        "o_orderkey", F.row_number().over(Window.orderBy("o_totalprice")).alias("rn")
    )
    assert single_partition_over_base(_tree(bad)), "deliberately-broken plan not flagged"


def test_rule_accepts_window_over_aggregated_frame(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    daily = o.groupBy("o_orderdate").agg(F.count(F.lit(1)).alias("n"))
    ok = daily.select(
        "o_orderdate", F.sum("n").over(Window.orderBy("o_orderdate")).alias("cum")
    )
    assert single_partition_over_base(_tree(ok)) == []


def test_rule_accepts_driver_local_spine(spark):
    spine = spark.range(0, 100).select(
        F.col("id"), F.row_number().over(Window.orderBy("id")).alias("rn")
    )
    assert single_partition_over_base(_tree(spine)) == []


def test_decile_lift_plan_is_clean(spark):
    from real_time_fraud_revenue_intelligence_lakehouse_spark.plans.registry import all_queries

    df = all_queries()["q_decile_lift"](spark, SF)
    assert single_partition_over_base(_tree(df)) == []
