"""Batch fraud scoring — the engine-side analog of the reference's
ML serving surface (`ml/serving/api.py:198-258`, SURVEY §3.4).

The reference computes a 26-feature vector in Spark, then scores with
XGBoost behind FastAPI (trained artifacts are out of scope for a
query engine). The engine keeps the part that IS a query-engine
concern: deterministic batch scoring over the feature table, in two
interchangeable forms:

- :func:`score_expr` — the scorer as a Catalyst expression
  (logistic model, md5-seeded weights). Fully SQL-expressible, so the
  DuckDB oracle checks it end-to-end; stays in whole-stage codegen.
- :func:`score_pandas_udf` — the same model as an Arrow-vectorized
  pandas UDF (NumPy). This is the integration seam where a real
  XGBoost/sklearn `predict_proba` plugs in unchanged — the
  reference's "~40× vectorized batch inference" pattern
  (`README.md:329`) — with parity to the expression form asserted in
  tests/test_scoring.py.

At 100 TB: scoring is row-local (narrow, no shuffle); the pandas-UDF
path streams Arrow batches through one Python worker per core, so
model inference parallelizes with the scan.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Features consumed from the q_feature_vector projection (bounded
#: magnitudes — the raw money columns enter via amount_log so the
#: logistic stays out of saturation).
SCORE_FEATURES = (
    "amount_log",
    "tier_encoded",
    "acctbal_neg",
    "segment_encoded",
    "order_dow",
    "order_month",
    "is_weekend",
    "is_urgent",
)
BIAS = -1.5


def weight(feature: str) -> float:
    """Deterministic md5-seeded weight in [-0.5, 0.5) — same value in
    Python, Spark literals, and generated oracle SQL."""
    h = hashlib.md5(f"weight:{feature}".encode()).hexdigest()
    return (int(h[:15], 16) % 1000) / 1000.0 - 0.5


def logit_expr(features: tuple[str, ...] = SCORE_FEATURES) -> Column:
    z: Column = F.lit(float(BIAS))
    for f in features:
        z = z + F.lit(weight(f)) * F.col(f).cast("double")
    return z


def score_expr(features: tuple[str, ...] = SCORE_FEATURES) -> Column:
    """P(fraud) = sigmoid(w·x + b) as a pure Catalyst expression."""
    z = logit_expr(features)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def risk_label(score: Column) -> Column:
    """3-way banding, mirroring `fraud_summary.py:117-133`."""
    return (
        F.when(score >= 0.7, "high").when(score >= 0.4, "medium").otherwise("low")
    )


def score_pandas_udf(features: tuple[str, ...] = SCORE_FEATURES):
    """The same model via Arrow batches — swap the body for
    `model.predict_proba(X)[:, 1]` to serve a real artifact."""
    from pyspark.sql.functions import pandas_udf

    ws = np.array([weight(f) for f in features])

    @pandas_udf("double")
    def _score(*cols: pd.Series) -> pd.Series:
        X = np.column_stack([c.to_numpy(dtype=float) for c in cols])
        z = BIAS + X @ ws
        return pd.Series(1.0 / (1.0 + np.exp(-z)))

    return _score


def score_batch(features_df: DataFrame, use_pandas: bool = False) -> DataFrame:
    """Score a feature table → (keys passthrough, fraud_score,
    risk_label), rounded with the engine's portable formula."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.functions.scalars import det_round

    if use_pandas:
        udf = score_pandas_udf()
        raw = udf(*[F.col(f) for f in SCORE_FEATURES])
    else:
        raw = score_expr()
    scored = features_df.withColumn("fraud_score", det_round(raw, 6))
    return scored.withColumn("risk_label", risk_label(F.col("fraud_score")))


def weights_sql() -> str:
    """Oracle twin of :func:`score_expr` (z term), for catalog use."""
    terms = [repr(float(BIAS))] + [
        f"({weight(f)!r} * CAST({f} AS DOUBLE))" for f in SCORE_FEATURES
    ]
    return " + ".join(terms)


def sigmoid_py(z: float) -> float:
    return 1.0 / (1.0 + math.exp(-z))
