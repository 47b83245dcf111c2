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
    _argmax_split,
    _bin_expr,
    _compress_binned,
    _gbt_ctes,
    _gbt_holdout_ctes,
    _leaf_w,
    _tree_logit_on_bins,
)
from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.scoring import SCORE_FEATURES
from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.text import hash60
from real_time_fraud_revenue_intelligence_lakehouse_spark.functions.scalars import det_round

CV_FOLDS = 3

_R6 = "(floor(({c}) * 1000000.0 + 0.5) / 1000000.0)"
_H60_FOLD = "('0x' || substr(md5(o_orderkey::VARCHAR), 1, 15))::BIGINT % 3"


def _r6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def cv_binned_frame(
    fv: DataFrame,
    fold_col,
    features: tuple[str, ...] = SCORE_FEATURES,
    bins: int = GBT_BINS,
    label: str = "label",
    scales: dict[str, float] | None = None,
) -> DataFrame:
    """The depth-2 CV working frame: distinct (label, fold, bins)
    vectors with exact __cnt multiplicities (see _compress_binned).
    Built ONCE per CV selection and shared by the fold-fused trainer
    AND the holdout scorer — the scorer's per-(fold, cfg, score)
    group counts are Σ __cnt / Σ __cnt·label over the same vectors,
    the identical integers the raw rows would count (r17, guide
    §1.2: one pass for sums several consumers need)."""
    return _compress_binned(
        fv.select(
            F.col(label).alias("label"),
            fold_col.cast("int").alias("__fold"),
            *[_bin_expr(f, scales, bins).alias(f"b_{f}") for f in features],
        ),
        wide=True,
    )


def train_gbt_grid_cv(
    fv: DataFrame,
    fold_col,
    configs: tuple[tuple[str, int, float, float], ...] = GBT_MS_CONFIGS,
    folds: int = CV_FOLDS,
    features: tuple[str, ...] = SCORE_FEATURES,
    bins: int = GBT_BINS,
    label: str = "label",
    scales: dict[str, float] | None = None,
    binned: DataFrame | None = None,
) -> list[list[list[dict]]]:
    """Fit EVERY (fold, config) depth-2 model in max(rounds)·2 shared
    scans — ext/gbt.train_gbt_grid with the CV FOLD LOOP fused into
    the same stacked aggregate (guide §1.2/§2.3: the fold loop re-ran
    the whole grid trainer per complement, 3× the scans and 3× the
    eager jobs for sums a single pass can produce side by side).

    Per (round, level) ONE stacked aggregate carries every
    (fold, config) pair: each pair's gradients come from its own
    partial ensemble staged as its own sigmoid column, and a
    post-stack ``fold != __fold`` filter keeps exactly the complement
    rows — model (f, c) therefore sums the identical integer micros
    over the identical row set as ``train_gbt_grid(fv.filter(fold_col
    != f))``, so the returned tree lists are bit-identical to the
    per-fold loop (law-pinned in tests/test_gbt_deep.py). Returns
    ``trees[fold][cfg]``.

    Scale: stacked rows grow (folds−1)/folds · folds / 1 = ×(folds−1)
    per scan versus one fold's scan, but the SCAN COUNT drops ×folds
    and every byte stays in the same map-side combine — at 100 TB the
    histograms remain ≤ folds·k·2·d·B integer cells."""
    # _compress_binned folds the frame to distinct (label, fold, bins)
    # rows with exact __cnt multiplicities (see its docstring); its
    # groupBy exchange also lands the frame on shuffle_partitions
    # partitions, which subsumes the former _spread repartition. The
    # caller may pass the (persisted) frame in so the holdout scorer
    # reads the same vectors without re-scanning fv.
    if binned is None:
        binned = cv_binned_frame(fv, fold_col, features, bins, label, scales)
    k = len(configs)
    trees_cv: list[list[list[dict]]] = [[[] for _ in configs] for _ in range(folds)]
    max_rounds = max(r for _n, r, _e, _l in configs)
    n_f = len(features)
    # r17: partial-logit __f_<fold>_<cfg> columns + per-round persisted
    # frame — the rows{t} plan-truncation discipline (see
    # ext/gbt.train_gbt's comment); every plan holds at most one tree
    # per (fold, config) model.
    state = binned
    carried: list[tuple[int, int]] = []
    prev_work = None
    for t in range(max_rounds):
        active = [c for c in range(k) if configs[c][1] > t]

        def f_expr(f: int, c: int):
            return (
                F.col(f"__f_{f}_{c}") if (f, c) in carried else F.lit(0.0)
            )

        staged = state
        for f in range(folds):
            for c in active:
                staged = staged.withColumn(
                    f"__p_{f}_{c}",
                    det_round(
                        F.lit(1.0) / (F.lit(1.0) + F.exp(-f_expr(f, c))), 6
                    ),
                )
        cols = [
            "label",
            "__fold",
            *[f"b_{feat}" for feat in features],
            "__cnt",
            *[F.col(f"__f_{f}_{c}") for (f, c) in carried if c in active],
        ]
        for f in range(folds):
            for c in active:
                p = F.col(f"__p_{f}_{c}")
                g = p - F.col("label").cast("double")
                h = p * (F.lit(1.0) - p)
                # ×__cnt: the distinct row stands for cnt identical
                # raw rows (_compress_binned) — sums stay exact ints
                cols.append(
                    (F.floor(g * F.lit(1e6) + F.lit(0.5)).cast("long")
                     * F.col("__cnt")).alias(f"gm_{f}_{c}")
                )
                cols.append(
                    (F.floor(h * F.lit(1e6) + F.lit(0.5)).cast("long")
                     * F.col("__cnt")).alias(f"hm_{f}_{c}")
                )
        work = staged.select(*cols).persist()
        entries = ", ".join(
            f"{f}, {c}, {i}, b_{feat}, gm_{f}_{c}, hm_{f}_{c}"
            for f in range(folds)
            for c in active
            for i, feat in enumerate(features)
        )
        stacked = work.selectExpr(
            "__fold",
            f"stack({folds * len(active) * n_f}, {entries}) "
            "AS (fold, cfg, fidx, bin, gm, hm)",
        ).filter("fold != __fold")
        h1 = (
            stacked.groupBy("fold", "cfg", "fidx", "bin")
            .agg(F.sum("gm").alias("gs"), F.sum("hm").alias("hs"))
            .collect()
        )
        roots: dict[tuple[int, int], tuple[int, int, float]] = {}
        for f in range(folds):
            for c in active:
                lam_c = float(configs[c][3])
                cells = [
                    (r["fidx"], r["bin"], r["gs"], r["hs"])
                    for r in h1
                    if r["fold"] == f and r["cfg"] == c
                ]
                rfidx, rbin, _glm, _hlm, _gm, _hm, rgain = _argmax_split(
                    cells, features, lam_c
                )
                roots[(f, c)] = (rfidx, rbin, rgain)
        work2 = work
        for f in range(folds):
            for c in active:
                rfidx, rbin, _g = roots[(f, c)]
                work2 = work2.withColumn(
                    f"node_{f}_{c}",
                    F.when(F.col(f"b_{features[rfidx]}") <= rbin, 0).otherwise(1),
                )
        entries2 = ", ".join(
            f"{f}, {c}, node_{f}_{c}, {i}, b_{feat}, gm_{f}_{c}, hm_{f}_{c}"
            for f in range(folds)
            for c in active
            for i, feat in enumerate(features)
        )
        stacked2 = work2.selectExpr(
            "__fold",
            f"stack({folds * len(active) * n_f}, {entries2}) "
            "AS (fold, cfg, node, fidx, bin, gm, hm)",
        ).filter("fold != __fold")
        h2 = (
            stacked2.groupBy("fold", "cfg", "node", "fidx", "bin")
            .agg(F.sum("gm").alias("gs"), F.sum("hm").alias("hs"))
            .collect()
        )
        if prev_work is not None:
            prev_work.unpersist()
        prev_work = work
        for f in range(folds):
            for c in active:
                lam_c = float(configs[c][3])
                rfidx, rbin, rgain = roots[(f, c)]
                by_node: dict[int, list] = {}
                for r in h2:
                    if r["fold"] == f and r["cfg"] == c:
                        by_node.setdefault(r["node"], []).append(
                            (r["fidx"], r["bin"], r["gs"], r["hs"])
                        )
                if sorted(by_node) != [0, 1]:
                    raise ValueError(
                        f"degenerate root split in round {t} of config "
                        f"{configs[c][0]} fold {f}: child node(s) "
                        f"{sorted({0, 1} - set(by_node))} are empty"
                    )
                tree = {"root": (rfidx, rbin), "gain_root": rgain}
                for n_id, side in ((0, "left"), (1, "right")):
                    cfidx, cbin, glm, hlm, g_m, h_m, cgain = _argmax_split(
                        by_node[n_id], features, lam_c
                    )
                    tree[side] = (cfidx, cbin)
                    tree[f"gain_{side}"] = cgain
                    wl = _leaf_w(glm, hlm, lam_c)
                    wr = _leaf_w(g_m - glm, h_m - hlm, lam_c)
                    if n_id == 0:
                        tree["w_ll"], tree["w_lr"] = wl, wr
                    else:
                        tree["w_rl"], tree["w_rr"] = wl, wr
                trees_cv[f][c].append(tree)
        if t + 1 < max_rounds:
            nxt = [c for c in range(k) if configs[c][1] > t + 1]
            state = work.select(
                "label",
                "__fold",
                *[f"b_{feat}" for feat in features],
                "__cnt",
                *[
                    (
                        f_expr(f, c)
                        + F.lit(float(configs[c][2]))
                        * _tree_logit_on_bins(trees_cv[f][c][-1], features)
                    ).alias(f"__f_{f}_{c}")
                    for f in range(folds)
                    for c in nxt
                ],
            )
            carried = [(f, c) for f in range(folds) for c in nxt]
    if prev_work is not None:
        prev_work.unpersist()
    return trees_cv


def gbt_cv_fold_aucs(
    fv: DataFrame,
    configs: tuple[tuple[str, int, float, float], ...] = GBT_MS_CONFIGS,
    folds: int = CV_FOLDS,
    features: tuple[str, ...] = SCORE_FEATURES,
    scales: dict[str, float] | None = None,
) -> list[list[float]]:
    """Per-config per-fold round6 holdout AUCs: ``out[cfg][fold]``.

    Trains ALL folds × configs through the fold-fused grid trainer
    (one stacked aggregate per round-level — r17, guide §1.2/§2.3;
    bit-identical trees to the per-fold loop), scores each held-out
    fold in one stacked scan, and reduces all folds × configs AUCs
    through ONE distributed rank-sum aggregate (3·|configs| scalar
    rows to the driver — the sanctioned bounded collect class)."""
    fold_col = F.pmod(
        hash60(F.col("o_orderkey").cast("string")), F.lit(folds)
    )
    # ONE compressed (label, fold, bins, __cnt) frame feeds both the
    # fold-fused trainer and the holdout scorer (r17): the scorer's
    # group counts become Σ __cnt / Σ __cnt·label over the distinct
    # vectors — the identical integers — and the per-fold raw fv
    # re-scans disappear.
    binned = cv_binned_frame(fv, fold_col, features, GBT_BINS, "label", scales).persist()
    trees_cv = train_gbt_grid_cv(
        fv, fold_col, configs=configs, folds=folds, features=features,
        scales=scales, binned=binned,
    )
    scored_parts = []
    for f in range(folds):
        va = binned.filter(F.col("__fold") == f)
        trees_all = trees_cv[f]

        # r17: cascades run on the staged bin columns (same long bins
        # → same comparisons → same leaf doubles, bit-identical
        # scores), over the compressed vectors.
        def ens(i: int):
            z = F.lit(0.0)
            for tr_ in trees_all[i]:
                z = z + F.lit(float(configs[i][2])) * _tree_logit_on_bins(
                    tr_, features
                )
            return z

        staged = va.select(
            "label",
            "__cnt",
            *[
                det_round(
                    F.lit(1.0) / (F.lit(1.0) + F.exp(-ens(i))), 6
                ).alias(f"s_{i}")
                for i in range(len(configs))
            ],
        )
        pairs = ", ".join(f"{i}, s_{i}" for i in range(len(configs)))
        scored_parts.append(
            staged.selectExpr(
                f"{f} AS fold",
                "label",
                "__cnt",
                f"stack({len(configs)}, {pairs}) AS (cfg, s)",
            )
        )
    scored = scored_parts[0]
    for part in scored_parts[1:]:
        scored = scored.unionAll(part)
    grp = scored.groupBy("fold", "cfg", "s").agg(
        F.sum("__cnt").alias("n"),
        F.sum(F.col("label").cast("long") * F.col("__cnt")).alias("np"),
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
    binned.unpersist()
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


def cv_full_binned_frame(
    fv: DataFrame,
    fold_col,
    configs,
    features: tuple[str, ...] = SCORE_FEATURES,
    bins: int = GBT_BINS,
    label: str = "label",
    scales: dict[str, float] | None = None,
) -> DataFrame:
    """The full-space CV working frame (see :func:`cv_binned_frame`):
    distinct (label, fold, subsample-buckets, bins) vectors with
    exact __cnt multiplicities. Per-round subsample BUCKET instead of
    the raw hash (see ext/gbt_deep.train_gbt_grid_full): h < thr_j ⟺
    bucket(h) < j, so the buckets carry every per-(row, trial, round)
    decision bit and _compress_binned can fold rows that agree on
    them. Shared by the fold-fused full trainer AND the holdout
    scorer (scores never read the buckets, so the frame is merely
    less compressed for scoring — still exact)."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.gbt_deep import _sub_pct

    sampling = any(c[5] is not None and c[5] < 1.0 for c in configs)
    max_rounds = max(c[1] for c in configs)
    pcts = [
        100 if c[5] is None or c[5] >= 1.0 else _sub_pct(c[5]) for c in configs
    ]
    thrs = sorted({p for p in pcts if p < 100})

    def _bucket(t_: int):
        key = F.concat(F.col("o_orderkey").cast("string"), F.lit(f"#r{t_}"))
        h = hash60(key) % 100
        b = F.lit(0)
        for thr in thrs:
            b = b + (h >= F.lit(thr)).cast("int")
        return b

    return _compress_binned(
        fv.select(
            F.col(label).alias("label"),
            fold_col.cast("int").alias("__fold"),
            *(
                [_bucket(t_).alias(f"__k_{t_}") for t_ in range(max_rounds)]
                if sampling
                else []
            ),
            *[_bin_expr(f, scales, bins).alias(f"b_{f}") for f in features],
        ),
        wide=True,
    )


def train_gbt_grid_full_cv(
    fv: DataFrame,
    fold_col,
    configs,
    folds: int = CV_FOLDS,
    features: tuple[str, ...] = SCORE_FEATURES,
    bins: int = GBT_BINS,
    label: str = "label",
    scales: dict[str, float] | None = None,
    binned: DataFrame | None = None,
) -> list[list[list[dict]]]:
    """:func:`train_gbt_grid_cv` over FULL nine-axis trials —
    ext/gbt_deep.train_gbt_grid_full with the CV fold loop fused into
    the shared per-(round, level) stacked aggregate. Every stochastic
    / regularization axis rides exactly as in the single-fold fused
    trainer (subsample = the shared per-round hash column + per-trial
    post-stack threshold; colsample = per-trial plan-time stack
    entries; scale_pos_weight inside each (fold, trial)'s staged
    gm/hm; mcw/L1 driver-side), and the ``fold != __fold`` post-stack
    filter restricts model (f, c) to its complement rows — the sums
    are the identical integer micros over the identical row sets, so
    the trees are bit-identical to the per-fold loop. Returns
    ``trees[fold][cfg]``."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.gbt_deep import (
        _argmax_split_sub,
        _leaf_w_l1,
        _sub_pct,
        col_subset,
        deep_tree_logit_on_bins,
    )
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.gbt import _leaf_w

    sampling = any(c[5] is not None and c[5] < 1.0 for c in configs)
    k = len(configs)
    trees_cv: list[list[list[dict]]] = [[[] for _ in configs] for _ in range(folds)]
    max_rounds = max(c[1] for c in configs)
    pcts = [
        100 if c[5] is None or c[5] >= 1.0 else _sub_pct(c[5]) for c in configs
    ]
    thrs = sorted({p for p in pcts if p < 100})
    ranks = [
        (thrs.index(p) + 1) if p < 100 else (len(thrs) + 1) for p in pcts
    ]
    if binned is None:
        binned = cv_full_binned_frame(
            fv, fold_col, configs, features, bins, label, scales
        )
    # r17: partial-logit __f_<fold>_<cfg> columns + per-round persisted
    # frame — the rows{t} plan-truncation discipline; see
    # ext/gbt.train_gbt's comment.
    state = binned
    carried: list[tuple[int, int]] = []
    prev_work = None
    for t in range(max_rounds):
        round_active = [c for c in range(k) if configs[c][1] > t]

        def f_expr(f: int, c: int):
            return (
                F.col(f"__f_{f}_{c}") if (f, c) in carried else F.lit(0.0)
            )

        staged = state
        for f in range(folds):
            for c in round_active:
                staged = staged.withColumn(
                    f"__p_{f}_{c}",
                    det_round(
                        F.lit(1.0) / (F.lit(1.0) + F.exp(-f_expr(f, c))), 6
                    ),
                )
        cols = [
            "label",
            "__fold",
            *(
                [f"__k_{t_}" for t_ in range(t, max_rounds)]
                if sampling
                else []
            ),
            *[f"b_{feat}" for feat in features],
            "__cnt",
            *[F.col(f"__f_{f}_{c}") for (f, c) in carried if c in round_active],
        ]
        for f in range(folds):
            for c in round_active:
                p = F.col(f"__p_{f}_{c}")
                g = p - F.col("label").cast("double")
                h = p * (F.lit(1.0) - p)
                spw_c = configs[c][9]
                if spw_c is not None and float(spw_c) != 1.0:
                    wgt = F.when(
                        F.col("label") == 1, F.lit(float(spw_c))
                    ).otherwise(F.lit(1.0))
                    gc, hc = g * wgt * F.lit(1e6), h * wgt * F.lit(1e6)
                else:
                    gc, hc = g * F.lit(1e6), h * F.lit(1e6)
                # ×__cnt: the distinct row stands for cnt identical
                # raw rows (_compress_binned) — sums stay exact ints
                cols.append(
                    (F.floor(gc + F.lit(0.5)).cast("long")
                     * F.col("__cnt")).alias(f"gm_{f}_{c}")
                )
                cols.append(
                    (F.floor(hc + F.lit(0.5)).cast("long")
                     * F.col("__cnt")).alias(f"hm_{f}_{c}")
                )
        # sigmoid cascades + micro-floors computed once per round; the
        # depth levels re-read the cached columns (within-query persist)
        work = staged.select(*cols).persist()
        actives = {
            c: col_subset(features, t, configs[c][6]) for c in round_active
        }
        nodes: dict[tuple[int, int], object] = {
            (f, c): F.lit(1) for f in range(folds) for c in round_active
        }
        trees_new: dict[tuple[int, int], dict] = {
            (f, c): {
                "depth": configs[c][4],
                "splits": {},
                "gains": {},
                "leaves": {},
            }
            for f in range(folds)
            for c in round_active
        }
        max_depth = max(configs[c][4] for c in round_active)
        for lvl in range(max_depth):
            lvl_active = [c for c in round_active if configs[c][4] > lvl]
            work_l = work
            for f in range(folds):
                for c in lvl_active:
                    work_l = work_l.withColumn(f"node_{f}_{c}", nodes[(f, c)])
            entries = ", ".join(
                f"{f}, {c}, node_{f}_{c}, {i}, b_{features[i]}, gm_{f}_{c}, hm_{f}_{c}"
                for f in range(folds)
                for c in lvl_active
                for i in actives[c]
            )
            n_entries = folds * sum(len(actives[c]) for c in lvl_active)
            stacked = work_l.selectExpr(
                "__fold",
                *([f"__k_{t}"] if sampling else []),
                f"stack({n_entries}, {entries}) "
                "AS (fold, cfg, node, fidx, bin, gm, hm)",
            ).filter("fold != __fold")
            if sampling:
                # h < pct_c ⟺ bucket < rank_c (see _bucket above)
                rnk = F.element_at(
                    F.array(*[F.lit(r_) for r_ in ranks]), F.col("cfg") + 1
                )
                stacked = stacked.filter(F.col(f"__k_{t}") < rnk)
            rows = (
                stacked.groupBy("fold", "cfg", "node", "fidx", "bin")
                .agg(F.sum("gm").alias("gs"), F.sum("hm").alias("hs"))
                .collect()
            )
            nodes_at = list(range(2**lvl, 2 ** (lvl + 1)))
            for f in range(folds):
                for c in lvl_active:
                    lam_c = float(configs[c][3])
                    depth_c = configs[c][4]
                    mcw_micro = int(round(float(configs[c][7]) * 1e6))
                    alpha_micro = int(round(float(configs[c][8]) * 1e6))
                    by_node: dict[int, list] = {}
                    for r in rows:
                        if r["fold"] == f and r["cfg"] == c:
                            by_node.setdefault(r["node"], []).append(
                                (r["fidx"], r["bin"], r["gs"], r["hs"])
                            )
                    if sorted(by_node) != nodes_at:
                        raise ValueError(
                            f"degenerate split in round {t} level {lvl} of "
                            f"config {configs[c][0]} fold {f}: node(s) "
                            f"{sorted(set(nodes_at) - set(by_node))} received "
                            "no selected rows"
                        )
                    branch = None
                    for n_id in nodes_at:
                        fidx, b, glm, hlm, g_m, h_m, gain = _argmax_split_sub(
                            by_node[n_id], actives[c], lam_c, mcw_micro,
                            alpha_micro,
                        )
                        trees_new[(f, c)]["splits"][n_id] = (fidx, b)
                        trees_new[(f, c)]["gains"][n_id] = gain
                        if lvl == depth_c - 1:
                            if alpha_micro:
                                trees_new[(f, c)]["leaves"][2 * n_id] = _leaf_w_l1(
                                    glm, hlm, lam_c, alpha_micro
                                )
                                trees_new[(f, c)]["leaves"][2 * n_id + 1] = (
                                    _leaf_w_l1(
                                        g_m - glm, h_m - hlm, lam_c, alpha_micro
                                    )
                                )
                            else:
                                trees_new[(f, c)]["leaves"][2 * n_id] = _leaf_w(
                                    glm, hlm, lam_c
                                )
                                trees_new[(f, c)]["leaves"][2 * n_id + 1] = _leaf_w(
                                    g_m - glm, h_m - hlm, lam_c
                                )
                        else:
                            side = F.when(
                                F.col(f"b_{features[fidx]}") <= b, 0
                            ).otherwise(1)
                            cond = nodes[(f, c)] == n_id
                            branch = (
                                F.when(cond, side)
                                if branch is None
                                else branch.when(cond, side)
                            )
                    if lvl < depth_c - 1:
                        nodes[(f, c)] = nodes[(f, c)] * 2 + branch
        if prev_work is not None:
            prev_work.unpersist()
        prev_work = work
        for f in range(folds):
            for c in round_active:
                trees_cv[f][c].append(trees_new[(f, c)])
        if t + 1 < max_rounds:
            nxt = [c for c in range(k) if configs[c][1] > t + 1]
            state = work.select(
                "label",
                "__fold",
                *(
                    [f"__k_{t_}" for t_ in range(t + 1, max_rounds)]
                    if sampling
                    else []
                ),
                *[f"b_{feat}" for feat in features],
                "__cnt",
                *[
                    (
                        f_expr(f, c)
                        + F.lit(float(configs[c][2]))
                        * deep_tree_logit_on_bins(trees_cv[f][c][-1], features)
                    ).alias(f"__f_{f}_{c}")
                    for f in range(folds)
                    for c in nxt
                ],
            )
            carried = [(f, c) for f in range(folds) for c in nxt]
    if prev_work is not None:
        prev_work.unpersist()
    return trees_cv


def gbt_cv_fold_aucs_full(
    fv: DataFrame,
    configs,
    folds: int = CV_FOLDS,
    features: tuple[str, ...] = SCORE_FEATURES,
    scales: dict[str, float] | None = None,
) -> list[list[float]]:
    """:func:`gbt_cv_fold_aucs` over FULL nine-axis trials: ALL
    folds × trials fit through the fold-fused full-space trainer
    (one stacked aggregate per round-level — r17, guide §1.2/§2.3;
    bit-identical trees to the per-fold loop), then the SAME
    one-aggregate rank-sum tail yields all folds x trials AUCs."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.gbt_deep import (
        deep_tree_logit_on_bins,
    )

    fold_col = F.pmod(
        hash60(F.col("o_orderkey").cast("string")), F.lit(folds)
    )
    # ONE compressed frame shared by trainer and scorer (see
    # gbt_cv_fold_aucs): the scorer's group counts become weighted
    # sums over the distinct vectors — identical integers.
    binned = cv_full_binned_frame(
        fv, fold_col, configs, features, GBT_BINS, "label", scales
    ).persist()
    trees_cv = train_gbt_grid_full_cv(
        fv, fold_col, configs, folds=folds, features=features, scales=scales,
        binned=binned,
    )
    scored_parts = []
    for f in range(folds):
        va = binned.filter(F.col("__fold") == f)
        trees_all = trees_cv[f]

        # r17: cascades on the staged bin columns (bit-identical
        # scores), over the compressed vectors.
        def ens(i: int):
            z = F.lit(0.0)
            for tr_ in trees_all[i]:
                z = z + F.lit(float(configs[i][2])) * deep_tree_logit_on_bins(
                    tr_, features
                )
            return z

        staged = va.select(
            "label",
            "__cnt",
            *[
                det_round(
                    F.lit(1.0) / (F.lit(1.0) + F.exp(-ens(i))), 6
                ).alias(f"s_{i}")
                for i in range(len(configs))
            ],
        )
        pairs = ", ".join(f"{i}, s_{i}" for i in range(len(configs)))
        scored_parts.append(
            staged.selectExpr(
                f"{f} AS fold",
                "label",
                "__cnt",
                f"stack({len(configs)}, {pairs}) AS (cfg, s)",
            )
        )
    scored = scored_parts[0]
    for part in scored_parts[1:]:
        scored = scored.unionAll(part)
    grp = scored.groupBy("fold", "cfg", "s").agg(
        F.sum("__cnt").alias("n"),
        F.sum(F.col("label").cast("long") * F.col("__cnt")).alias("np"),
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
    binned.unpersist()
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
