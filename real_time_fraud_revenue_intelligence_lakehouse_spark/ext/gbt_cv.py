"""3-fold cross-validated model selection — the reference's ACTUAL
Optuna objective.

The reference ranks hyperparameter configs by 3-fold cross-validated
ROC AUC (`ml/models/fraud_detector.py:268-271`:
``cross_val_score(model, X, y, cv=3, scoring="roc_auc").mean()``);
q_gbt_model_selection ranks by single-holdout log-loss. This module
closes that gap as a COMPOSITION of machinery already proven green:

- **Folds**: ``hash60(o_orderkey) % 3`` — q_kfold's deterministic
  assignment (disjoint + exhaustive by construction, RNG-free,
  append-stable).
- **Training**: per fold, the FUSED depth-2 grid trainer
  (ext/gbt.train_gbt_grid) fits every config on the fold's
  complement — 3 fused runs, each sharing its per-round scans across
  all 4 configs (bit-identical trees to the sequential fold by the
  grid law).
- **Scoring**: per fold, ONE scan of the held-out fold stages every
  config's sigmoid as a column and stacks them long — the union of
  the 3 folds feeds one (fold, cfg, s) score-group aggregate.
- **AUC**: exact Mann-Whitney rank-sum with average-rank ties —
  q_model_card's reduction, windowed per (fold, cfg) over the
  distinct-score table (bounded: a compiled depth-2 booster emits
  ≤ 4^trees distinct scores per config).
- **Objective**: per config, the round6 mean of its 3 round6 fold
  AUCs (left-associated — the determinism contract the oracle's
  scalar-subquery sum mirrors token for token); winner = max mean
  AUC, config-id tie-break.

The SQL oracle unrolls all 3 folds × |configs| boosting chains
(namespaced c{fold}{cfg}_), replays each on its held-out fold, and
computes the identical rank-sum AUCs — CROSS-VALIDATION ITSELF
hash-gates.

Scale: the engine's extra cost over q_gbt_model_selection is 3×
the fused grid (histograms stay ≤ 2·d·B integer cells per config
per round) plus one stacked score-group aggregate; nothing all-pairs,
nothing driver-side beyond 3·|configs| AUC scalars.

Cites: reference `ml/models/fraud_detector.py:268-271` (cv=3
roc_auc objective), `train.py:201` (study driver) — semantics
reproduced, execution re-architected.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.gbt import (
    GBT_BINS,
    GBT_MS_CONFIGS,
    _gbt_ctes,
    _gbt_holdout_ctes,
    gbt_trained_logit_expr,
    train_gbt_grid,
)
from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.scoring import SCORE_FEATURES
from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.text import hash60
from real_time_fraud_revenue_intelligence_lakehouse_spark.functions.scalars import det_round

CV_FOLDS = 3

_R6 = "(floor(({c}) * 1000000.0 + 0.5) / 1000000.0)"
_H60_FOLD = "('0x' || substr(md5(o_orderkey::VARCHAR), 1, 15))::BIGINT % 3"


def _r6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def gbt_cv_fold_aucs(
    fv: DataFrame,
    configs: tuple[tuple[str, int, float, float], ...] = GBT_MS_CONFIGS,
    folds: int = CV_FOLDS,
    features: tuple[str, ...] = SCORE_FEATURES,
    scales: dict[str, float] | None = None,
) -> list[list[float]]:
    """Per-config per-fold round6 holdout AUCs: ``out[cfg][fold]``.

    Trains the fused grid on each fold complement, scores each
    held-out fold in one stacked scan, and reduces all
    folds × configs AUCs through ONE distributed rank-sum aggregate
    (3·|configs| scalar rows to the driver — the sanctioned bounded
    collect class)."""
    fold_col = F.pmod(
        hash60(F.col("o_orderkey").cast("string")), F.lit(folds)
    )
    scored_parts = []
    for f in range(folds):
        tr = fv.filter(fold_col != f)
        va = fv.filter(fold_col == f)
        trees_all = train_gbt_grid(
            tr, configs=configs, features=features, scales=scales
        )
        staged = va.select(
            "label",
            *[
                det_round(
                    F.lit(1.0)
                    / (
                        F.lit(1.0)
                        + F.exp(
                            -gbt_trained_logit_expr(
                                trees_all[i],
                                features=features,
                                eta=configs[i][2],
                                scales=scales,
                            )
                        )
                    ),
                    6,
                ).alias(f"s_{i}")
                for i in range(len(configs))
            ],
        )
        pairs = ", ".join(f"{i}, s_{i}" for i in range(len(configs)))
        scored_parts.append(
            staged.selectExpr(
                f"{f} AS fold",
                "label",
                f"stack({len(configs)}, {pairs}) AS (cfg, s)",
            )
        )
    scored = scored_parts[0]
    for part in scored_parts[1:]:
        scored = scored.unionAll(part)
    grp = scored.groupBy("fold", "cfg", "s").agg(
        F.count(F.lit(1)).alias("n"), F.sum("label").alias("np")
    )
    w = (
        Window.partitionBy("fold", "cfg")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = grp.withColumn("cum_n", F.coalesce(F.sum("n").over(w), F.lit(0)))
    # the model_metrics avg-rank text, per (fold, cfg)
    avg_rank = (F.col("cum_n") + (F.col("n") + 1) / 2.0).cast("decimal(28,1)")
    rs = F.col("np").cast("decimal(28,1)") * avg_rank
    agg = cum.groupBy("fold", "cfg").agg(
        F.sum(rs).alias("rank_sum"),
        F.sum("np").alias("n_pos"),
        (F.sum("n") - F.sum("np")).alias("n_neg"),
    )
    by_key = {(r["fold"], r["cfg"]): r for r in agg.collect()}
    out: list[list[float]] = []
    for i in range(len(configs)):
        row = []
        for f in range(folds):
            r = by_key[(f, i)]
            n_pos, n_neg = int(r["n_pos"]), int(r["n_neg"])
            if n_pos == 0 or n_neg == 0:
                row.append(0.0)
            else:
                raw = (
                    float(r["rank_sum"]) - float(n_pos) * (n_pos + 1) / 2
                ) / (float(n_pos) * n_neg)
                row.append(_r6(raw))
        out.append(row)
    return out


def cv_mean(aucs: list[float]) -> float:
    """round6 of the left-associated float mean — the exact text the
    oracle's scalar-subquery chain computes."""
    s = 0.0
    for a in aucs:
        s = s + a
    return _r6(s / float(len(aucs)))


def gbt_cv_selection_sql(
    fv_sql: str,
    configs: tuple[tuple[str, int, float, float], ...] = GBT_MS_CONFIGS,
    features: tuple[str, ...] = SCORE_FEATURES,
    bins: int = GBT_BINS,
    folds: int = CV_FOLDS,
) -> str:
    """Oracle for q_model_selection_cv: per (fold, config) an
    unrolled boosting chain on the fold complement + a split-replay
    on the held-out fold + a rank-sum AUC; per config the round6
    left-associated mean of its fold AUCs; is_best ranks by
    (cv_auc DESC, config)."""
    parts = [f"base AS ({fv_sql})"]
    for f in range(folds):
        parts.append(
            f"tr{f} AS MATERIALIZED (SELECT * FROM base WHERE {_H60_FOLD} <> {f})"
        )
        parts.append(
            f"va{f} AS MATERIALIZED (SELECT * FROM base WHERE {_H60_FOLD} = {f})"
        )
    auc_names: dict[tuple[int, int], str] = {}
    for f in range(folds):
        for i, (_name, rounds, eta, lam) in enumerate(configs):
            p_ = f"c{f}{i}_"
            ctes, _rk = _gbt_ctes(
                f"SELECT * FROM tr{f}", features, rounds, bins, lam, eta,
                prefix=p_,
            )
            parts.append(ctes)
            hctes, hk = _gbt_holdout_ctes(
                p_, f"va{f}", features, rounds, bins, eta
            )
            parts.append(hctes)
            s6 = _R6.format(c="1.0 / (1.0 + exp(-f))")
            parts.append(
                f"{p_}scored AS (SELECT label, {s6} AS s FROM {hk})"
            )
            parts.append(
                f"{p_}grp AS (SELECT s, count(*) AS n, sum(label) AS np "
                f"FROM {p_}scored GROUP BY 1)"
            )
            parts.append(
                f"{p_}cum AS (SELECT s, n, np, "
                f"coalesce(sum(n) OVER w, 0) AS cum_n FROM {p_}grp "
                f"WINDOW w AS (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING "
                f"AND 1 PRECEDING))"
            )
            parts.append(
                f"{p_}t AS (SELECT sum(np) AS n_pos, "
                f"sum(n) - sum(np) AS n_neg FROM {p_}grp)"
            )
            parts.append(
                f"{p_}agg AS (SELECT n_pos, n_neg, "
                f"sum(CAST(np AS DECIMAL(28,1)) "
                f"* CAST(cum_n + (n + 1) / 2.0 AS DECIMAL(28,1))) AS rank_sum "
                f"FROM {p_}cum CROSS JOIN {p_}t GROUP BY 1, 2)"
            )
            auc_raw = (
                "(CAST(rank_sum AS DOUBLE) "
                "- CAST(n_pos AS DOUBLE) * (n_pos + 1) / 2)"
                " / (CAST(n_pos AS DOUBLE) * n_neg)"
            )
            auc6 = _R6.format(
                c=f"CASE WHEN n_pos = 0 OR n_neg = 0 THEN 0.0 ELSE {auc_raw} END"
            )
            parts.append(
                f"{p_}auc AS (SELECT {auc6} AS auc FROM {p_}agg)"
            )
            auc_names[(f, i)] = f"{p_}auc"
    mean_cols = []
    for i in range(len(configs)):
        terms = " + ".join(
            f"(SELECT auc FROM {auc_names[(f, i)]})" for f in range(folds)
        )
        mean_cols.append(
            f"{_R6.format(c=f'({terms}) / {float(folds)!r}')} AS cv_{i}"
        )
    parts.append("m AS (SELECT " + ", ".join(mean_cols) + ")")
    vals = ", ".join(
        f"('{name}', {rounds}, {eta!r}, {lam!r})"
        for name, rounds, eta, lam in configs
    )
    auc_case = " ".join(
        f"WHEN '{name}' THEN cv_{i}"
        for i, (name, _r, _e, _l) in enumerate(configs)
    )
    fold_cols = ", ".join(
        f"CASE c.config {' '.join(f'''WHEN '{name}' THEN (SELECT auc FROM {auc_names[(f, i)]})''' for i, (name, _r, _e, _l) in enumerate(configs))} END AS auc_fold{f}"
        for f in range(folds)
    )
    cte_block = ",\n    ".join(parts)
    return f"""WITH {cte_block},
    longf AS (
      SELECT c.config, c.rounds, c.eta, c.lam,
             {fold_cols},
             CASE c.config {auc_case} END AS cv_auc
      FROM (VALUES {vals}) c(config, rounds, eta, lam) CROSS JOIN m
    )
    SELECT config, CAST(rounds AS INTEGER) AS rounds, eta, lam,
           {", ".join(f"auc_fold{f}" for f in range(folds))}, cv_auc,
           CAST(CASE WHEN row_number() OVER (ORDER BY cv_auc DESC, config) = 1
                THEN 1 ELSE 0 END AS INTEGER) AS is_best
    FROM longf"""


# --- CV over the FULL sampled space (trial x fold, every dimension) ---------------

#: Trials for the full-space CV — the study's exact objective shape
#: (every trial CV-scored over every fold). 4 trials x 3 folds keeps
#: the oracle at the 12-chain magnitude q_model_selection_cv already
#: proved tractable, while every one of the nine dimensions still
#: varies across the four trials.
CV_FULL_TRIALS = 4


def gbt_cv_fold_aucs_full(
    fv: DataFrame,
    configs,
    folds: int = CV_FOLDS,
    features: tuple[str, ...] = SCORE_FEATURES,
    scales: dict[str, float] | None = None,
) -> list[list[float]]:
    """:func:`gbt_cv_fold_aucs` over FULL nine-axis trials: per fold
    the fused full-space trainer (ext/gbt_deep.train_gbt_grid_full)
    fits every trial on the complement — subsample/colsample/
    scale_pos_weight/mcw/L1 all riding the shared per-(round, level)
    scan — then the SAME one-aggregate rank-sum tail yields all
    folds x trials AUCs."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.gbt_deep import (
        gbt_deep_logit_expr,
        train_gbt_grid_full,
    )

    fold_col = F.pmod(
        hash60(F.col("o_orderkey").cast("string")), F.lit(folds)
    )
    scored_parts = []
    for f in range(folds):
        tr = fv.filter(fold_col != f)
        va = fv.filter(fold_col == f)
        trees_all = train_gbt_grid_full(
            tr, configs=configs, features=features, scales=scales
        )
        staged = va.select(
            "label",
            *[
                det_round(
                    F.lit(1.0)
                    / (
                        F.lit(1.0)
                        + F.exp(
                            -gbt_deep_logit_expr(
                                trees_all[i],
                                features=features,
                                eta=configs[i][2],
                                scales=scales,
                            )
                        )
                    ),
                    6,
                ).alias(f"s_{i}")
                for i in range(len(configs))
            ],
        )
        pairs = ", ".join(f"{i}, s_{i}" for i in range(len(configs)))
        scored_parts.append(
            staged.selectExpr(
                f"{f} AS fold",
                "label",
                f"stack({len(configs)}, {pairs}) AS (cfg, s)",
            )
        )
    scored = scored_parts[0]
    for part in scored_parts[1:]:
        scored = scored.unionAll(part)
    grp = scored.groupBy("fold", "cfg", "s").agg(
        F.count(F.lit(1)).alias("n"), F.sum("label").alias("np")
    )
    w = (
        Window.partitionBy("fold", "cfg")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = grp.withColumn("cum_n", F.coalesce(F.sum("n").over(w), F.lit(0)))
    avg_rank = (F.col("cum_n") + (F.col("n") + 1) / 2.0).cast("decimal(28,1)")
    rs = F.col("np").cast("decimal(28,1)") * avg_rank
    agg = cum.groupBy("fold", "cfg").agg(
        F.sum(rs).alias("rank_sum"),
        F.sum("np").alias("n_pos"),
        (F.sum("n") - F.sum("np")).alias("n_neg"),
    )
    by_key = {(r["fold"], r["cfg"]): r for r in agg.collect()}
    out: list[list[float]] = []
    for i in range(len(configs)):
        row = []
        for f in range(folds):
            r = by_key[(f, i)]
            n_pos, n_neg = int(r["n_pos"]), int(r["n_neg"])
            if n_pos == 0 or n_neg == 0:
                row.append(0.0)
            else:
                raw = (
                    float(r["rank_sum"]) - float(n_pos) * (n_pos + 1) / 2
                ) / (float(n_pos) * n_neg)
                row.append(_r6(raw))
        out.append(row)
    return out


def gbt_cv_selection_full_sql(
    fv_sql: str,
    configs,
    features: tuple[str, ...] = SCORE_FEATURES,
    bins: int = GBT_BINS,
    folds: int = CV_FOLDS,
) -> str:
    """Oracle for q_model_selection_cv_full: per (fold, trial) an
    unrolled DEEP chain carrying ALL of the trial's axes (subsample
    predicate, colsample schedule, mcw admissibility, ThresholdL1,
    scale_pos_weight) + a held-out-fold replay + a rank-sum AUC;
    per trial the round6 left-associated fold mean; is_best ranks by
    (cv_auc DESC, config)."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.gbt_deep import (
        _gbt_deep_ctes,
        _gbt_deep_holdout_ctes,
    )

    parts = [f"base AS ({fv_sql})"]
    for f in range(folds):
        parts.append(
            f"tr{f} AS MATERIALIZED (SELECT * FROM base WHERE {_H60_FOLD} <> {f})"
        )
        parts.append(
            f"va{f} AS MATERIALIZED (SELECT * FROM base WHERE {_H60_FOLD} = {f})"
        )
    auc_names: dict[tuple[int, int], str] = {}
    for f in range(folds):
        for i, (_nm, rounds, eta, lam, depth, sub, csam, mcw, alpha, spw) in enumerate(
            configs
        ):
            p_ = f"v{f}{i}_"
            ctes, _rk = _gbt_deep_ctes(
                f"SELECT * FROM tr{f}", features, rounds, bins, lam, eta,
                depth,
                subsample=(None if sub is None or sub >= 1.0 else sub),
                colsample=(None if csam is None or csam >= 1.0 else csam),
                prefix=p_, min_child_weight=mcw, reg_alpha=alpha,
                pos_weight=(None if spw is None or float(spw) == 1.0 else spw),
            )
            parts.append(ctes)
            hctes, hk = _gbt_deep_holdout_ctes(
                p_, f"va{f}", features, rounds, bins, eta, depth
            )
            parts.append(hctes)
            s6 = _R6.format(c="1.0 / (1.0 + exp(-f))")
            parts.append(
                f"{p_}scored AS (SELECT label, {s6} AS s FROM {hk})"
            )
            parts.append(
                f"{p_}grp AS (SELECT s, count(*) AS n, sum(label) AS np "
                f"FROM {p_}scored GROUP BY 1)"
            )
            parts.append(
                f"{p_}cum AS (SELECT s, n, np, "
                f"coalesce(sum(n) OVER w, 0) AS cum_n FROM {p_}grp "
                f"WINDOW w AS (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING "
                f"AND 1 PRECEDING))"
            )
            parts.append(
                f"{p_}t AS (SELECT sum(np) AS n_pos, "
                f"sum(n) - sum(np) AS n_neg FROM {p_}grp)"
            )
            parts.append(
                f"{p_}agg AS (SELECT n_pos, n_neg, "
                f"sum(CAST(np AS DECIMAL(28,1)) "
                f"* CAST(cum_n + (n + 1) / 2.0 AS DECIMAL(28,1))) AS rank_sum "
                f"FROM {p_}cum CROSS JOIN {p_}t GROUP BY 1, 2)"
            )
            auc_raw = (
                "(CAST(rank_sum AS DOUBLE) "
                "- CAST(n_pos AS DOUBLE) * (n_pos + 1) / 2)"
                " / (CAST(n_pos AS DOUBLE) * n_neg)"
            )
            auc6 = _R6.format(
                c=f"CASE WHEN n_pos = 0 OR n_neg = 0 THEN 0.0 ELSE {auc_raw} END"
            )
            parts.append(
                f"{p_}auc AS (SELECT {auc6} AS auc FROM {p_}agg)"
            )
            auc_names[(f, i)] = f"{p_}auc"
    mean_cols = []
    for i in range(len(configs)):
        terms = " + ".join(
            f"(SELECT auc FROM {auc_names[(f, i)]})" for f in range(folds)
        )
        mean_cols.append(
            f"{_R6.format(c=f'({terms}) / {float(folds)!r}')} AS cv_{i}"
        )
    parts.append("m AS (SELECT " + ", ".join(mean_cols) + ")")
    vals = ", ".join(
        f"('{nm}', {rounds}, {eta!r}, {lam!r}, {depth}, {sub!r}, {csam!r}, "
        f"{mcw!r}, {alpha!r}, {spw!r})"
        for nm, rounds, eta, lam, depth, sub, csam, mcw, alpha, spw in configs
    )
    auc_case = " ".join(
        f"WHEN '{c[0]}' THEN cv_{i}" for i, c in enumerate(configs)
    )
    fold_cols = ", ".join(
        f"CASE c.config {' '.join(f'''WHEN '{c[0]}' THEN (SELECT auc FROM {auc_names[(f, i)]})''' for i, c in enumerate(configs))} END AS auc_fold{f}"
        for f in range(folds)
    )
    cte_block = ",\n    ".join(parts)
    return f"""WITH {cte_block},
    longf AS (
      SELECT c.config, c.rounds, c.eta, c.lam, c.depth, c.subsample,
             c.colsample, c.min_child_weight, c.reg_alpha, c.pos_weight,
             {fold_cols},
             CASE c.config {auc_case} END AS cv_auc
      FROM (VALUES {vals}) c(config, rounds, eta, lam, depth, subsample,
                             colsample, min_child_weight, reg_alpha,
                             pos_weight) CROSS JOIN m
    )
    SELECT config, CAST(rounds AS INTEGER) AS rounds, eta, lam,
           CAST(depth AS INTEGER) AS depth,
           CAST(subsample AS DOUBLE) AS subsample,
           CAST(colsample AS DOUBLE) AS colsample,
           CAST(min_child_weight AS DOUBLE) AS min_child_weight,
           CAST(reg_alpha AS DOUBLE) AS reg_alpha,
           CAST(pos_weight AS DOUBLE) AS pos_weight,
           {", ".join(f"auc_fold{f}" for f in range(folds))}, cv_auc,
           CAST(CASE WHEN row_number() OVER (ORDER BY cv_auc DESC, config) = 1
                THEN 1 ELSE 0 END AS INTEGER) AS is_best
    FROM longf"""
