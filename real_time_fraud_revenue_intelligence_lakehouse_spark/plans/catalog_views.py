"""Remaining warehouse views (SURVEY §2.4 A12 — `init.sql:150-168`):
v_high_risk_users and v_revenue_by_method analogs, composed on top of
the already-registered gold queries (their oracle SQL is reused as
CTEs, so the layering is verified end-to-end, not re-derived).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_fraud_revenue_intelligence_lakehouse_spark.functions.scalars import det_round
# direct module imports (not the catalog hub, which imports this file
# at its bottom — a hub import here would be circular): gold registers
# q_user_scores; q_revenue_daily lives in the hub but registers before
# the hub's themed-module import block runs.
from real_time_fraud_revenue_intelligence_lakehouse_spark.plans import catalog_gold  # noqa: F401
from real_time_fraud_revenue_intelligence_lakehouse_spark.plans import registry
from real_time_fraud_revenue_intelligence_lakehouse_spark.plans.registry import query

_USER_SCORES_SQL = registry._REGISTRY["q_user_scores"].oracle
_REVENUE_DAILY_SQL = registry._REGISTRY["q_revenue_daily"].oracle

#: Deterministic stand-in for the view's `CURRENT_DATE - 30 days`
#: trailing filter (the driver data ends 1998-08; a moving clock
#: would break hash checks — SURVEY §7 non-determinism policy).
TRAILING_START = "1998-01-01"


@query(
    "q_high_risk_users",
    oracle=f"""
    WITH user_scores AS ({_USER_SCORES_SQL})
    SELECT * FROM user_scores WHERE composite_score >= 0.50
    """,
    tags=("marts", "views"),
)
def q_high_risk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`v_high_risk_users` (`init.sql:150-154`): the user-score table
    filtered at composite ≥ 0.50; ORDER BY left to the consumer
    (same convention as q_country_risk). Composes the registered
    q_user_scores plan — Catalyst pushes the filter below the
    aggregation's HAVING boundary where legal."""
    scores = registry._REGISTRY["q_user_scores"].fn(spark, sf_dir)
    return scores.filter(F.col("composite_score") >= 0.50)


@query(
    "q_revenue_by_method",
    oracle=f"""
    WITH revenue_daily AS ({_REVENUE_DAILY_SQL})
    SELECT o_orderpriority,
           cast(sum(cast(gmv as decimal(38,2))) as double) AS total_gmv,
           cast(sum(cast(fulfilled_gmv as decimal(38,2))) as double) AS total_fulfilled_gmv,
           cast(sum(total_orders) as bigint) AS order_count,
           (floor((cast(sum(cast(fulfilled_rate as decimal(18,6))) as double)
                   / count(fulfilled_rate)) * 10000.0 + 0.5) / 10000.0)
             AS avg_fulfilled_rate
    FROM revenue_daily
    WHERE order_month >= DATE '{TRAILING_START}'
    GROUP BY o_orderpriority
    """,
    tags=("marts", "views"),
)
def q_revenue_by_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`v_revenue_by_method` (`init.sql:157-168`): trailing-period
    re-aggregation of the revenue-daily gold table by method
    (o_orderpriority stands in for payment_method on the testdata).
    Decimal-accumulated re-sums keep the two-level aggregation
    deterministic; the trailing window is a fixed date (module
    docstring)."""
    daily = registry._REGISTRY["q_revenue_daily"].fn(spark, sf_dir)
    filtered = daily.filter(F.col("order_month") >= F.lit(TRAILING_START).cast("date"))
    return filtered.groupBy("o_orderpriority").agg(
        F.sum(F.col("gmv").cast("decimal(38,2)")).cast("double").alias("total_gmv"),
        F.sum(F.col("fulfilled_gmv").cast("decimal(38,2)"))
        .cast("double")
        .alias("total_fulfilled_gmv"),
        F.sum("total_orders").cast("bigint").alias("order_count"),
        det_round(
            F.sum(F.col("fulfilled_rate").cast("decimal(18,6)")).cast("double")
            / F.count("fulfilled_rate"),
            4,
        ).alias("avg_fulfilled_rate"),
    )
