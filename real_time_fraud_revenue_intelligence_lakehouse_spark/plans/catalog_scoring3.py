"""Round-16 trainer extensions: the StandardScaler pipeline stage
(fit → persist → apply), patience-k AUC early stopping, and
hash-sampled random search — the last three gaps VERDICT r15 ranked
against the reference's `FraudDetector` training loop
(`ml/models/fraud_detector.py:144-145,245-247,274`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.scaler import (
    fit_standard_scaler,
    scaler_stats_sql,
)
from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.scoring import SCORE_FEATURES
from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.training import logreg_weights_sql, train_logreg
from real_time_fraud_revenue_intelligence_lakehouse_spark.plans.catalog_scoring import (
    _FV_SQL,
    _logreg_fv,
)
from real_time_fraud_revenue_intelligence_lakehouse_spark.plans.registry import query
from real_time_fraud_revenue_intelligence_lakehouse_spark.plans.shared_frames import register_cache

#: memoized fitted stats / weights per (applicationId, sf_dir) — the
#: _trained_weights discipline; bench.py's trainer_cold series
#: reports the honest cache-cleared descent.
_SCALER: dict = {}
_LOGREG_SCALED: dict = {}
register_cache(_SCALER)
register_cache(_LOGREG_SCALED)


def _key(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    import os as _os

    return (spark.sparkContext.applicationId, _os.path.realpath(sf_dir))


def _fitted_scaler(spark: SparkSession, sf_dir: str) -> dict:
    k = _key(spark, sf_dir)
    if k not in _SCALER:
        _SCALER[k] = fit_standard_scaler(_logreg_fv(spark, sf_dir))
    return _SCALER[k]


@query(
    "q_standard_scale_train",
    oracle=scaler_stats_sql(_FV_SQL),
    tags=("training", "scoring", "features"),
)
def q_standard_scale_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StandardScaler FIT as a query — the reference's
    `self.scaler.fit_transform(X)` stage (`fraud_detector.py:144`),
    whose fitted artifact serving re-applies (`:177,188`) and the
    registry persists (`:199,219` scaler.joblib). One distributed
    aggregate: per feature two exact integer-micro decimal sums
    (Σ⌊x·1e6+0.5⌋, Σ⌊x²·1e6+0.5⌋) plus one count — associative,
    layout-independent, map-side combined (2d+1 decimals per
    partition of shuffle payload). mean/E[x²] round6 after the same
    /1e6/n order both engines use; var on the rounded pair;
    std = round6(sqrt(var)) with the zero-variance → 1.0 convention
    (sklearn's `scale_`). Output: one (feature, mu, sd) row per
    model feature. The oracle recomputes the identical moments chain
    in SQL."""
    stats = _fitted_scaler(spark, sf_dir)
    rows = [(f, stats[f][0], stats[f][1]) for f in SCORE_FEATURES]
    return spark.createDataFrame(rows, "feature string, mu double, sd double")


@query(
    "q_logreg_train_scaled",
    oracle=logreg_weights_sql(_FV_SQL, standardized=True),
    tags=("training", "scoring", "iterative"),
)
def q_logreg_train_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full scale-then-fit pipeline (`fraud_detector.py:144-148`:
    StandardScaler.fit_transform feeding the model) for the logistic
    trainer — the one model family where standardization genuinely
    changes the fit (trees are split-invariant under monotone maps,
    SURVEY §2.22's binning argument). The fitted (mean, std) pairs
    from q_standard_scale_train's aggregate enter train_logreg as
    affine literals — (x − mean)/std rides row-local inside each
    gradient scan's codegen, zero extra shuffle — and the SAME K
    exact-decimal GD iterations produce the weights. The oracle
    unrolls scaler fit AND training end-to-end from the raw tables
    (scaler_ctes chain cross-joined into every gradient aggregate),
    so no engine-computed stat is smuggled in as a literal. The
    fitted pipeline persists to the model registry as
    params={weights, scaler} and compile_registry_model re-applies
    the document's own scaler at serving (round-trip-tested in
    tests/test_model_registry.py)."""
    k = _key(spark, sf_dir)
    if k not in _LOGREG_SCALED:
        stats = _fitted_scaler(spark, sf_dir)
        w, _n = train_logreg(_logreg_fv(spark, sf_dir), scales=stats)
        _LOGREG_SCALED[k] = w
    w = _LOGREG_SCALED[k]
    import math

    r6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
    names = ["bias"] + list(SCORE_FEATURES)
    return spark.createDataFrame(
        [(m, r6(w[m])) for m in names], "feature string, weight double"
    )


# --- patience-k early stopping on holdout AUC ---------------------------------

from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.gbt import (  # noqa: E402
    GBT_ETA,
    early_stop_decision_auc,
    gbt_early_stop_auc_sql,
    train_gbt,
)

#: patience window at test scale — the reference's
#: early_stopping_rounds=20 shape at 3-round ladders.
ES_PATIENCE = 2


def holdout_auc_ladder(va: DataFrame, trees: list[dict], tree_expr,
                       eta: float = GBT_ETA) -> list[float]:
    """Per-round holdout AUCs from ONE stacked scan: every partial
    ensemble's round6 sigmoid is a staged column, the stack unpivots
    to (round, s, label), and the exact Mann-Whitney rank-sum
    (q_model_card's machinery, windowed per round over the BOUNDED
    distinct-score table — ≤ leaf-combination many distinct round6
    scores per round, not |rows|) yields all rounds+1 AUCs in one
    aggregate. Driver state: rounds+1 scalar triples."""
    import math

    from pyspark.sql import Window

    from real_time_fraud_revenue_intelligence_lakehouse_spark.functions.scalars import det_round

    zs = [F.lit(0.0)]
    for tr_ in trees:
        zs.append(zs[-1] + F.lit(float(eta)) * tree_expr(tr_))
    staged = va.select(
        "label",
        *[
            det_round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias(f"s_{t}")
            for t, z in enumerate(zs)
        ],
    )
    pairs = ", ".join(f"{t}, s_{t}" for t in range(len(zs)))
    scored = staged.selectExpr(
        "label", f"stack({len(zs)}, {pairs}) AS (round, s)"
    )
    grp = scored.groupBy("round", "s").agg(
        F.count(F.lit(1)).alias("n"), F.sum("label").alias("np")
    )
    w = (
        Window.partitionBy("round")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = grp.withColumn("cum_n", F.coalesce(F.sum("n").over(w), F.lit(0)))
    avg_rank = (F.col("cum_n") + (F.col("n") + 1) / 2.0).cast("decimal(28,1)")
    rs = F.col("np").cast("decimal(28,1)") * avg_rank
    agg = cum.groupBy("round").agg(
        F.sum(rs).alias("rank_sum"),
        F.sum("np").alias("n_pos"),
        (F.sum("n") - F.sum("np")).alias("n_neg"),
    )
    by_round = {r["round"]: r for r in agg.collect()}
    r6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
    out = []
    for t in range(len(zs)):
        r = by_round[t]
        n_pos, n_neg = int(r["n_pos"]), int(r["n_neg"])
        if n_pos == 0 or n_neg == 0:
            out.append(0.0)
        else:
            raw = (
                float(r["rank_sum"]) - float(n_pos) * (n_pos + 1) / 2
            ) / (float(n_pos) * n_neg)
            out.append(r6(raw))
    return out


@query(
    "q_gbt_early_stop_auc",
    oracle=gbt_early_stop_auc_sql(_FV_SQL, patience=ES_PATIENCE),
    tags=("training", "evaluation", "selection", "trees"),
)
def q_gbt_early_stop_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Early stopping on the metric the reference ACTUALLY monitors —
    eval_metric='auc' with a patience window (`fraud_detector.py:
    245-247`: early_stopping_rounds=20; k=2 at 3-round test ladders) —
    next to q_gbt_early_stop's patience-1 log-loss rule. The two
    ladders can legitimately disagree on the stopping round (a round
    can improve calibration while hurting ranking, and vice versa —
    pinned by a planted test), which is exactly why the metric is a
    parameter of the reference's fit. Per-round holdout AUCs come
    from ONE stacked scan + one exact rank-sum aggregate
    (holdout_auc_ladder); the patience-k rule runs on the round6
    ladder in the driver, identically to the oracle's
    last-improving-round window form. Reuses the grid's config-0
    booster when this process already trained it (the q_gbt_early_stop
    memo discipline)."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.plans.catalog_scoring import (
        _GBT_ES,
        _GBT_GRID,
        _fold_splits,
        _gbt_tree_expr_raw,
    )

    key = _key(spark, sf_dir)
    tr_split, va = _fold_splits(spark, sf_dir)
    if key in _GBT_GRID:
        trees = _GBT_GRID[key][0]
    else:
        if key not in _GBT_ES:
            _GBT_ES[key] = train_gbt(tr_split)
        trees = _GBT_ES[key]
    aucs = holdout_auc_ladder(va, trees, _gbt_tree_expr_raw)
    stop_at, best_round = early_stop_decision_auc(aucs, ES_PATIENCE)
    out = [
        (t, aucs[t], 1 if t <= stop_at else 0, 1 if t == best_round else 0)
        for t in range(len(aucs))
    ]
    return spark.createDataFrame(
        out, "round int, val_auc double, reached int, is_best int"
    )


# --- hash-sampled random search through the fused deep grid ---------------------

from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.gbt_deep import (  # noqa: E402
    gbt_random_search_sql,
    grid_holdout_aucs,
    sampled_search_configs,
    train_gbt_grid_deep,
)

RS_CONFIGS = sampled_search_configs()

_RS: dict = {}
register_cache(_RS)


@query(
    "q_gbt_random_search",
    oracle=gbt_random_search_sql(_FV_SQL, RS_CONFIGS),
    tags=("training", "evaluation", "selection", "trees"),
)
def q_gbt_random_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's SEARCH BREADTH — a 30-trial sampled Optuna
    study (`fraud_detector.py:274`), not a fixed 4-config grid — as a
    deterministic random search: 8 trials whose per-dimension draws
    are md5 buckets of "trial-<i>#<param>" (RNG-free, append-stable;
    sampled_search_configs), swept over rounds/eta/λ/depth and fit by
    the FUSED deep grid trainer. The fused fold's cost is
    CONFIG-WIDTH INDEPENDENT in scan count: per (round, level) ONE
    shared stacked aggregate carries every active trial (job-count
    law pinned in tests/test_gbt_deep.py — 8 trials schedule exactly
    as many Spark jobs as 2), so doubling the study's breadth adds
    integer histogram cells to the combine, never scans — the claim
    that makes 30 trials affordable at 100 TB. Trials rank by holdout
    AUC (the study's scoring='roc_auc') from ONE stacked scan + one
    rank-sum aggregate (grid_holdout_aucs); is_best = (val_auc DESC,
    trial id). The oracle unrolls all 8 deep chains + holdout replays
    + rank-sum AUCs. Domain note: like q_gbt_depth_selection, the
    depth-3 trials are out of the gated domain on the toy sf0.001
    frame's 80% fold (gated ValueError on both engines); the
    correctness gate (sf0.01) and bench (sf0.1) are in-domain."""
    k = _key(spark, sf_dir)
    if k not in _RS:
        from real_time_fraud_revenue_intelligence_lakehouse_spark.plans.catalog_scoring import _fold_splits

        tr, va = _fold_splits(spark, sf_dir)
        trees_all = train_gbt_grid_deep(tr, configs=RS_CONFIGS)
        _RS[k] = grid_holdout_aucs(va, trees_all, RS_CONFIGS)
    aucs = _RS[k]
    best = 0
    for i in range(1, len(RS_CONFIGS)):
        if aucs[i] > aucs[best]:
            best = i
    out = [
        (name, rounds, eta, lam, depth, aucs[i], 1 if i == best else 0)
        for i, (name, rounds, eta, lam, depth) in enumerate(RS_CONFIGS)
    ]
    return spark.createDataFrame(
        out,
        "config string, rounds int, eta double, lam double, depth int, "
        "val_auc double, is_best int",
    )


# --- FULL-space sampled search (all nine study dimensions per trial) -------------

from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.gbt_deep import (  # noqa: E402
    gbt_random_search_full_sql,
    sampled_search_configs_full,
    train_gbt_grid_full,
)

RS_FULL_CONFIGS = sampled_search_configs_full()

_RS_FULL: dict = {}
register_cache(_RS_FULL)


@query(
    "q_gbt_random_search_full",
    oracle=gbt_random_search_full_sql(_FV_SQL, RS_FULL_CONFIGS),
    tags=("training", "evaluation", "selection", "trees"),
)
def q_gbt_random_search_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_gbt_random_search widened to the study's FULL space — every
    trial draws ALL NINE Optuna dimensions
    (`fraud_detector.py:249-267`: n_estimators, learning_rate,
    reg_lambda, max_depth, subsample, colsample_bytree,
    min_child_weight, reg_alpha, scale_pos_weight) from md5 buckets
    of "trial-<i>#<param>" and fits through ONE fused fold
    (train_gbt_grid_full): per (round, level) a single stacked
    aggregate carries every active trial — subsample rides as ONE
    shared per-round hash column with per-trial thresholds, colsample
    as per-trial plan-time stack entries, scale_pos_weight inside
    each trial's staged gm/hm, min_child_weight/reg_alpha in the
    driver-side argmax over the same collected cells. Scan count
    stays config-width independent (the job-count law extends to the
    full space — pinned in tests/test_gbt_deep.py), which is what
    makes the reference's 30-trial breadth affordable at 100 TB.
    Trials rank by holdout rank-sum AUC from one stacked scan; the
    oracle unrolls all 8 fully-parameterized deep chains + replays.
    Domain note: depth-3 trials are outside the gated domain on the
    toy sf0.001 frame (ValueError on both engines); the correctness
    gate (sf0.01) and bench (sf0.1) are in-domain."""
    k = _key(spark, sf_dir)
    if k not in _RS_FULL:
        from real_time_fraud_revenue_intelligence_lakehouse_spark.plans.catalog_scoring import _fold_splits

        tr, va = _fold_splits(spark, sf_dir)
        trees_all = train_gbt_grid_full(tr, configs=RS_FULL_CONFIGS)
        _RS_FULL[k] = grid_holdout_aucs(va, trees_all, RS_FULL_CONFIGS)
    aucs = _RS_FULL[k]
    best = 0
    for i in range(1, len(RS_FULL_CONFIGS)):
        if aucs[i] > aucs[best]:
            best = i
    out = [
        (nm, rounds, eta, lam, depth, sub, csam, mcw, alpha, spw,
         aucs[i], 1 if i == best else 0)
        for i, (nm, rounds, eta, lam, depth, sub, csam, mcw, alpha, spw)
        in enumerate(RS_FULL_CONFIGS)
    ]
    return spark.createDataFrame(
        out,
        "config string, rounds int, eta double, lam double, depth int, "
        "subsample double, colsample double, min_child_weight double, "
        "reg_alpha double, pos_weight double, val_auc double, is_best int",
    )


# --- CV over the full space: the study's exact trial x fold objective ------------

from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.gbt_cv import (  # noqa: E402
    CV_FULL_TRIALS,
    cv_mean,
    gbt_cv_fold_aucs_full,
    gbt_cv_selection_full_sql,
)

#: The CV'd trials: the first 4 full-space draws — every one of the
#: nine dimensions still varies across them (asserted in tests), and
#: 4 trials x 3 folds keeps the oracle at the 12-chain magnitude
#: q_model_selection_cv already proved tractable.
CV_FULL_CONFIGS = RS_FULL_CONFIGS[:CV_FULL_TRIALS]

_CV_FULL: dict = {}
register_cache(_CV_FULL)


@query(
    "q_model_selection_cv_full",
    oracle=gbt_cv_selection_full_sql(_FV_SQL, CV_FULL_CONFIGS),
    tags=("training", "evaluation", "selection", "trees"),
)
def q_model_selection_cv_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The study's objective at FULL WIDTH — every sampled trial
    carries all nine Optuna dimensions AND is scored by the
    reference's actual objective, 3-fold cross-validated ROC AUC
    (`fraud_detector.py:249-271`: the trial dict feeds
    cross_val_score(cv=3, scoring='roc_auc').mean()). Composition of
    two proven folds: per fold the fused FULL-space trainer
    (train_gbt_grid_full) fits all 4 trials on the complement —
    subsample/colsample/scale_pos_weight/mcw/L1 riding the shared
    per-(round, level) scan — then ONE stacked scan per fold and one
    rank-sum aggregate yield all 12 (fold, trial) AUCs; per trial the
    round6 left-associated fold mean ranks the study. The oracle
    unrolls all 12 fully-parameterized deep chains + fold replays.
    Domain note: depth-3 trials on 2/3-of-sf0.001 complements are
    outside the gated domain (ValueError both engines); sf0.01+ is
    in-domain."""
    k = _key(spark, sf_dir)
    if k not in _CV_FULL:
        _CV_FULL[k] = gbt_cv_fold_aucs_full(
            _logreg_fv(spark, sf_dir), CV_FULL_CONFIGS
        )
    aucs = _CV_FULL[k]
    means = [cv_mean(a) for a in aucs]
    best = 0
    for i in range(1, len(CV_FULL_CONFIGS)):
        if means[i] > means[best] or (
            means[i] == means[best]
            and CV_FULL_CONFIGS[i][0] < CV_FULL_CONFIGS[best][0]
        ):
            best = i
    out = [
        (nm, rounds, eta, lam, depth, sub, csam, mcw, alpha, spw,
         aucs[i][0], aucs[i][1], aucs[i][2], means[i],
         1 if i == best else 0)
        for i, (nm, rounds, eta, lam, depth, sub, csam, mcw, alpha, spw)
        in enumerate(CV_FULL_CONFIGS)
    ]
    return spark.createDataFrame(
        out,
        "config string, rounds int, eta double, lam double, depth int, "
        "subsample double, colsample double, min_child_weight double, "
        "reg_alpha double, pos_weight double, "
        "auc_fold0 double, auc_fold1 double, auc_fold2 double, "
        "cv_auc double, is_best int",
    )


# --- pre-scoring validation gate -------------------------------------------------

from real_time_fraud_revenue_intelligence_lakehouse_spark.sources.tables import read_table  # noqa: E402
from real_time_fraud_revenue_intelligence_lakehouse_spark.streaming.scoring import (  # noqa: E402
    GATE_RULES,
    gate_report,
    input_gate,
)


def _gate_oracle() -> str:
    conds = {
        name: (
            f"{name} IS NULL OR {name} < {lo!r} OR {name} > {hi!r}"
            if default is None
            else f"{name} IS NOT NULL AND ({name} < {lo!r} OR {name} > {hi!r})"
        )
        for name, lo, hi, default in GATE_RULES
    }
    reason = "CASE " + " ".join(
        f"WHEN {conds[name]} THEN '{name}'" for name, *_ in GATE_RULES
    ) + " END"
    v_sums = ", ".join(
        f"sum(CASE WHEN gate_reason = '{name}' THEN 1 ELSE 0 END) AS v_{name}"
        for name, *_ in GATE_RULES
    )
    arms = [
        f"SELECT '{name}' AS field, 'out_of_range' AS outcome, "
        f"CAST(v_{name} AS BIGINT) AS n FROM a"
        for name, *_ in GATE_RULES
    ] + [
        "SELECT 'hour_of_day', 'defaulted', CAST(d_hour AS BIGINT) FROM a",
        "SELECT '_all_', 'pass', CAST(n_pass AS BIGINT) FROM a",
        "SELECT '_all_', 'quarantined', CAST(n_quar AS BIGINT) FROM a",
    ]
    return f"""
    WITH g AS (
      SELECT CAST(value AS DOUBLE) AS total_amount,
             CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) AS DOUBLE)
               AS velocity_k,
             CAST(json_extract_string(props, '$.h') AS DOUBLE) AS hour_of_day
      FROM events
    ),
    r AS (SELECT *, {reason} AS gate_reason FROM g),
    a AS (SELECT {v_sums},
      sum(CASE WHEN gate_reason IS NULL AND hour_of_day IS NULL
               THEN 1 ELSE 0 END) AS d_hour,
      sum(CASE WHEN gate_reason IS NULL THEN 1 ELSE 0 END) AS n_pass,
      sum(CASE WHEN gate_reason IS NOT NULL THEN 1 ELSE 0 END) AS n_quar
      FROM r)
    {" UNION ALL ".join(arms)}"""


@query(
    "q_score_input_gate",
    oracle=_gate_oracle(),
    tags=("streaming", "quality", "scoring"),
)
def q_score_input_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The serving contract's request validation
    (`ml/serving/api.py:92-130`: pydantic ge/le bounds on required
    fields, documented defaults on optionals) as a pre-scoring gate
    over the event payload — the piece between ingest's
    null/corrupt quarantine and the model: out-of-range features →
    quarantine row with the FIRST violated field as reason
    (pydantic's field-order error), missing optionals → imputed
    defaults (hour_of_day → 12.0, `to_feature_row`), survivors
    score. The gate itself is a stateless codegen projection
    (streaming/scoring.input_gate — the identical expression gates a
    micro-batch, stream ≡ batch tested); this query is its audit
    rollup from ONE conditional aggregate (gate_report, the q_dq_suite
    fused-scan discipline): per-field violation counts,
    defaults-applied count among scored rows, pass/quarantine
    totals."""
    ev = read_table(spark, sf_dir, "events")
    return gate_report(input_gate(ev))


# --- depth-4 boosting: the level loop past 3 -------------------------------------

from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.gbt_deep import (  # noqa: E402
    gbt_train_deep_sql,
    train_gbt_deep,
)
from real_time_fraud_revenue_intelligence_lakehouse_spark.plans.catalog_scoring2 import (  # noqa: E402
    _DEEP_SCHEMA,
    _deep_tree_rows,
)

#: depth-4 at 2 rounds: one level PAST the r15 depth-3 ceiling (the
#: reference sweeps max_depth to 9, `fraud_detector.py:258`); rounds
#: bounded so the unrolled 4-level oracle stays tractable at sf0.01.
D4_ROUNDS = 2

_GBT_D4: dict = {}
register_cache(_GBT_D4)


@query(
    "q_gbt_train_depth4",
    oracle=gbt_train_deep_sql(_FV_SQL, rounds=D4_ROUNDS, depth=4),
    tags=("training", "scoring", "iterative", "trees"),
)
def q_gbt_train_depth4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth as a FREE parameter, proven one level past r15's ceiling:
    15-split/16-leaf depth-4 trees from the same heap-indexed level
    loop (ext/gbt_deep.train_gbt_deep — no depth-4-specific code
    exists; this query pins that the generalization holds where the
    reference's max_depth sweep actually lives, 3-9). Per round FOUR
    level histograms (widest 8·8·16 integer cells, map-side
    combined); rounds=2 bounds the generated oracle's unrolled
    4-level chain. SHAP stays ≤ depth 3 by scope (q_gbt_shap_deep's
    ≤2⁷-subset exactness argument; deeper attribution would need the
    full polynomial-time descent — documented, not silently claimed).
    In-domain down to the toy sf0.001 frame (trained on the FULL
    feature frame, not a fold — unlike the split-fold grids)."""
    k = _key(spark, sf_dir)
    if k not in _GBT_D4:
        _GBT_D4[k] = train_gbt_deep(
            _logreg_fv(spark, sf_dir), depth=4, rounds=D4_ROUNDS
        )
    return spark.createDataFrame(_deep_tree_rows(_GBT_D4[k]), _DEEP_SCHEMA)
