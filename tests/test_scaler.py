"""StandardScaler fit → persist → apply (ext/scaler.py) — the
reference's scaler pipeline stage (`fraud_detector.py:144-145,
177,188,199,219`) as distributed queries.

Laws:
1. The one-aggregate fit is bit-identical to a NumPy replay of the
   same rounded-moment arithmetic, on any partition layout.
2. Scaled training genuinely conditions the descent: on a planted
   wide-scale boundary the scaled trainer recovers it in K=5 while
   the raw trainer does not (the reason this stage exists).
3. save → load → score round-trips through the model registry: a
   `logreg` document carrying params={weights, scaler} re-applies
   ITS OWN fitted stats at serving, bit-identically.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.scaler import (
    fit_standard_scaler,
    scaler_from_params,
    scaler_params,
)
from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.training import train_logreg, trained_score_expr


def _r6(x):
    return math.floor(x * 1e6 + 0.5) / 1e6


def _numpy_scaler(X, features):
    out = {}
    n = X.shape[0]
    for j, f in enumerate(features):
        x = X[:, j]
        s = int(np.floor(x * 1e6 + 0.5).sum())
        q = int(np.floor(x * x * 1e6 + 0.5).sum())
        mean = _r6(float(s) / 1e6 / n)
        ex2 = _r6(float(q) / 1e6 / n)
        var = _r6(ex2 - mean * mean)
        sd = _r6(math.sqrt(var)) if var > 0.0 else 1.0
        out[f] = (mean, sd)
    return out


def _wide_df(spark, n=600, seed=7):
    rng = np.random.RandomState(seed)
    x1 = rng.uniform(4000.0, 6000.0, n).round(2)   # wide scale
    x2 = rng.uniform(0.0, 1.0, n).round(4)
    y = ((x1 > 5000.0) ^ (rng.uniform(0, 1, n) < 0.05)).astype(int)
    df = spark.createDataFrame(
        [(float(a), float(b), int(v)) for a, b, v in zip(x1, x2, y)],
        "x1 double, x2 double, label int",
    )
    return df, np.column_stack([x1, x2]), y


def test_fit_matches_numpy_replay_and_is_layout_independent(spark):
    df, X, _y = _wide_df(spark)
    feats = ("x1", "x2")
    got = fit_standard_scaler(df, feats)
    assert got == _numpy_scaler(X, feats)
    assert fit_standard_scaler(df.repartition(13, "x2"), feats) == got


def test_constant_feature_gets_unit_std(spark):
    df = spark.createDataFrame(
        [(5.0, float(i)) for i in range(20)], "c double, x double"
    )
    stats = fit_standard_scaler(df, ("c",))
    assert stats["c"] == (5.0, 1.0)  # sklearn's scale_=1 convention


def test_scaled_trainer_recovers_wide_boundary_raw_does_not(spark):
    """The conditioning law — WHY the reference scales before fitting
    (`fraud_detector.py:144`): on a feature of scale ~5000 the raw
    lr=1.0 descent saturates/oscillates, while the standardized
    descent separates the classes within the same K=5 iterations."""
    df, X, y = _wide_df(spark)
    feats = ("x1", "x2")
    stats = fit_standard_scaler(df, feats)

    def accuracy(w, scales):
        pred = df.select(
            (trained_score_expr(w, feats, scales) >= 0.5).cast("int").alias("p"),
            "label",
        )
        r = pred.agg(F.sum((F.col("p") == F.col("label")).cast("long")).alias("ok"),
                     F.count(F.lit(1)).alias("n")).first()
        return r["ok"] / r["n"]

    w_scaled, _ = train_logreg(df, feats, scales=stats)
    w_raw, _ = train_logreg(df, feats, scales={})
    acc_scaled = accuracy(w_scaled, stats)
    acc_raw = accuracy(w_raw, {})
    assert acc_scaled > 0.9, (acc_scaled, w_scaled)
    assert acc_raw < 0.75, (acc_raw, w_raw)


def test_scaler_persists_and_reapplies_through_the_registry(spark, tmp_path):
    """save → load → score with params={weights, scaler}: the loaded
    document re-applies its OWN fitted stats (the scaler.joblib
    round-trip, `fraud_detector.py:199,219`), bit-identical to the
    trainer's in-process scoring — even when the caller passes a
    DIFFERENT scales hint."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.model_registry import load_model, save_model
    from real_time_fraud_revenue_intelligence_lakehouse_spark.streaming.scoring import compile_registry_model

    df, _X, _y = _wide_df(spark, n=300, seed=11)
    feats = ("x1", "x2")
    stats = fit_standard_scaler(df, feats)
    w, _ = train_logreg(df, feats, scales=stats)
    reg = str(tmp_path / "scaledreg")
    save_model(reg, "logreg", {"weights": w, "scaler": scaler_params(stats)}, list(feats))
    doc = load_model(reg)
    assert scaler_from_params(doc["params"]["scaler"]) == stats  # exact JSON round-trip
    expr = compile_registry_model(doc, feats, scales={"x1": 999.0})  # hint ignored
    direct = trained_score_expr(w, feats, stats)
    got = df.select(expr.alias("a"), direct.alias("b")).collect()
    assert all(r["a"] == r["b"] for r in got)
