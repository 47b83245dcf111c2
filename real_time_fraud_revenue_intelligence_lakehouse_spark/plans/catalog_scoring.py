"""Batch fraud scoring over the feature vector (SURVEY §3.4).

Composes the registered q_feature_vector (SQL oracle reused verbatim
as a CTE) with the deterministic logistic scorer — the full
features→score→risk-band lifecycle of the reference's serving path
(`ml/serving/api.py:198-258`, `fraud_summary.py:117-133`), minus the
trained artifact (the pandas-UDF seam for that is
ext/scoring.score_pandas_udf, parity-tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.scoring import (
    gbt_score_batch,
    gbt_sql,
    score_batch,
    weights_sql,
)
from real_time_fraud_revenue_intelligence_lakehouse_spark.plans import catalog_cleanse  # noqa: F401  (registers q_feature_vector)
from real_time_fraud_revenue_intelligence_lakehouse_spark.plans import registry
from real_time_fraud_revenue_intelligence_lakehouse_spark.plans.registry import query

_FV_SQL = registry._REGISTRY["q_feature_vector"].oracle
_R6 = "(floor(({c}) * 1000000.0 + 0.5) / 1000000.0)"


@query(
    "q_fraud_scores",
    oracle=f"""
    WITH fv AS ({_FV_SQL}),
    scored AS (
      SELECT o_orderkey, label,
             {_R6.format(c=f"1.0 / (1.0 + exp(-({weights_sql()})))")} AS fraud_score
      FROM fv
    )
    SELECT o_orderkey, label, fraud_score,
           CASE WHEN fraud_score >= 0.7 THEN 'high'
                WHEN fraud_score >= 0.4 THEN 'medium'
                ELSE 'low' END AS risk_label
    FROM scored
    """,
    tags=("features", "scoring"),
)
def q_fraud_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic logistic batch scoring: sigmoid(w·x + b) over
    the 12-feature vector, 3-way risk banding. Row-local (no
    shuffle beyond the feature join); the whole model is a Catalyst
    expression, so scoring rides inside codegen with the scan."""
    fv = registry._REGISTRY["q_feature_vector"].fn(spark, sf_dir)
    return score_batch(fv).select("o_orderkey", "label", "fraud_score", "risk_label")


@query(
    "q_gbt_scores",
    oracle=f"""
    WITH fv AS ({_FV_SQL}),
    scored AS (
      SELECT o_orderkey, label,
             {_R6.format(c=f"1.0 / (1.0 + exp(-({gbt_sql()})))")} AS fraud_score
      FROM fv
    )
    SELECT o_orderkey, label, fraud_score,
           CASE WHEN fraud_score >= 0.7 THEN 'high'
                WHEN fraud_score >= 0.4 THEN 'medium'
                ELSE 'low' END AS risk_label
    FROM scored
    """,
    tags=("features", "scoring"),
)
def q_gbt_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gradient-boosted-tree-STYLE batch scoring: 8 depth-2 trees as
    nested CASE expressions summed through a sigmoid — the standard
    compile-GBT-to-SQL inference shape (the reference's XGBoost
    `ml/serving/api.py:198-258` surface, made deterministic so the
    oracle can replay the exact model). Row-local, fully inside
    whole-stage codegen; the Arrow predict-batch seam
    (ext/scoring.gbt_pandas_udf) is parity-tested for real-artifact
    swap-in."""
    fv = registry._REGISTRY["q_feature_vector"].fn(spark, sf_dir)
    return gbt_score_batch(fv).select("o_orderkey", "label", "fraud_score", "risk_label")
