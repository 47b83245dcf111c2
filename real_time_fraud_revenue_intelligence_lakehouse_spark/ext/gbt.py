"""Distributed, deterministic gradient-boosted-tree TRAINING.

The reference's actual model family is XGBoost with histogram split
finding (`ml/models/fraud_detector.py:36,154` —
``XGBClassifier(tree_method="hist")``, fitted by `train.py:201` after
pulling the feature table to one machine). The engine already *serves*
a GBT (`q_gbt_scores` compiles an ensemble to CASE expressions); this
module closes the loop by FITTING one, in the only shape that survives
100 TB — the insight being that ``tree_method=hist`` is literally an
aggregation pipeline:

- **Binning**: each feature quantizes once into ``GBT_BINS`` fixed
  buckets of its scaled [0,1] range (the FEATURE_SCALES discipline) —
  row-local, computed once, reused by every round and level.
- **Split finding**: per boosting round × per tree level, ONE groupBy
  over (node, feature, bin) summing micro-floored gradient/hessian
  integers through exact BIGINT folds (map-side combined; ≤
  nodes·d·B cells — bytes, not rows, cross the wire). Cumulative
  sums over bins give every candidate split's (G_L, H_L); the greedy
  argmax of the standard XGBoost gain
  ``G_L²/(H_L+λ) + G_R²/(H_R+λ) − G²/(H+λ)``
  is a deterministic fold over ≤ d·B candidates (gain desc, feature
  index asc, bin asc — the q_bpe_merges argmax-per-round pattern).
- **Leaf values**: ``w = −G_leaf/(H_leaf+λ)`` from the SAME collected
  histogram — no extra pass.
- **Boosting**: the partial ensemble compiles to nested CASE
  expressions (exactly the q_gbt_scores / q_naive_bayes_score
  model-as-Catalyst-expression discipline), so next round's gradients
  are row-local inside codegen: ``p = round6(σ(f)), g = p − y,
  h = p·(1−p)`` micro-floored to integers.

Driver state is the tree list (3 trees × 7 structure fields — the
sanctioned model-broadcast scalar class); per round the engine runs
exactly TWO aggregate jobs (root histogram, children histogram).

Determinism contract (the q_logreg_train conventions, extended to
tree structure): probabilities det-round to 6 before the gradient;
gradient/hessian contributions are integer micros summed exactly;
gains are IEEE doubles computed by the identical expression in Spark
(driver Python), generated DuckDB SQL, and the NumPy replay
(tests/test_gbt.py), so the argmax — and therefore the TREE ITSELF —
is bit-identical across engines and partition layouts. The oracle
unrolls the same rounds as generated MATERIALIZED CTE blocks
(per-row node/side resolution goes through the stacked long form
joined to the 1-row best-split tables, the standard trick for
"CASE on a data-dependent column name" in SQL).

Cites: reference `ml/models/fraud_detector.py:36,154` (XGBClassifier,
tree_method=hist), `ml/models/train.py:201` (fit call),
`FINAL_VALIDATION_REPORT.md:349-419` (model card) — semantics
reproduced, execution re-architected.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.scoring import SCORE_FEATURES
from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.training import _x_expr, _x_sql
from real_time_fraud_revenue_intelligence_lakehouse_spark.functions.scalars import det_round

#: Fixed hyper-parameters — part of the query's identity (the oracle
#: unrolls exactly this many rounds at exactly this shrinkage).
#: 3 depth-2 trees × 16 bins is the smallest REAL boosting run: the
#: round-2/3 trees fit the residuals the earlier trees leave, which a
#: NumPy sweep confirms (log-loss 0.6931 → 0.6372 → 0.6365 → 0.6362
#: on sf0.01; each later tree moves the loss, so the boosting — not
#: just the first tree — is what the hash gates).
GBT_ROUNDS = 3
GBT_BINS = 16
GBT_LAMBDA = 1.0
GBT_ETA = 0.3

_MICRO = 1_000_000.0
_R6 = "(floor(({c}) * 1000000.0 + 0.5) / 1000000.0)"


def _r6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _spread(df: DataFrame) -> DataFrame:
    """Spread a CPU-bound trainer working frame to the session's full
    parallelism when its input arrives narrower (r17, guide §2.6/§1.2
    step 2). Used ONLY by the fold-fused CV trainers, whose stacked
    scans carry folds × configs × features entries per row (~14M
    generated rows/level at bench scale) — there the 4-partition fv
    layout leaves 7/8 of a local[32] session idle and spreading
    measured 19 vs 31 s on q_model_selection_cv_full. The single-fold
    trainers measured FASTER without it (grid_full 5.9 vs 7-10 s,
    depth-2 grid 2.4 vs 4.2 s: with the partial-logit __f columns
    their scans are scheduling-bound, and 32 tasks × 2 stages per
    tiny aggregate cost more than the 4-way compute saves) — rejected
    there after interleaved A/B. Exact integer micro-sums make every
    downstream histogram layout-independent, so the trees are
    bit-identical either way (law-pinned). On a cluster whose fv
    already carries ≥ defaultParallelism partitions this is a no-op."""
    sc = df.sparkSession.sparkContext
    p = sc.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        df = df.repartition(p)
    return df


def _compress_binned(binned: DataFrame, wide: bool = False) -> DataFrame:
    """Collapse a trainer's binned working frame to ONE row per
    distinct column vector with an exact ``__cnt`` multiplicity (r17,
    guide §2.3 "shuffle keys and metadata instead of payloads" applied
    to the trainer's own scans). Every per-row quantity the descent
    computes — the staged sigmoid, gradients, hessians, node paths,
    partial logits — is a pure function of the frame's columns (label,
    bin vector, and any fold/sample keys the caller kept), so rows
    with equal vectors contribute IDENTICAL integer micros to every
    histogram cell; summing ``__cnt·gm`` over the distinct rows is the
    same integer as summing ``gm`` over the raw rows — the trees are
    bit-identical (NumPy-replay- and law-pinned). At bench scale this
    is a 43× row cut (600k → 14,022 distinct (label, 8-bin) vectors),
    taken once up front by one exchange of the un-amplified rows;
    every subsequent (round, level) histogram job then scans the
    compressed frame. At 100 TB the compression ratio is the
    cardinality of the binned feature space (≤ label·B^d, data-bounded
    by the distinct vectors actually present) over the row count —
    histogram boosting's standard weighted-instance form.

    The compressed frame coalesces to defaultParallelism/8 partitions
    (override: ``spark.rtfril.gbt.compress.parts``): after the 40×
    row cut every (round, level) histogram job is task-launch-bound,
    and 32 shuffle partitions × 2 stages of setup cost more than the
    remaining compute (measured on train_gbt_deep at local[32]:
    4.9 s at 32 parts → 2.2 s at 4). The divisor keeps the setting
    scale-adaptive — a 1000-core cluster still fans the (possibly
    millions-of-rows) compressed frame across 125 tasks.

    ``wide=True`` (the fold-fused CV trainers) keeps the frame at full
    defaultParallelism instead: their stacks multiply every row by
    folds × configs × features (~200 arms), so even the compressed
    frame feeds a compute-bound generate+aggregate — there narrow
    layouts measured 25 s vs 17 s on q_model_selection_cv_full."""
    spark = binned.sparkSession
    dp = spark.sparkContext.defaultParallelism
    parts = (
        dp
        if wide
        else int(
            spark.conf.get(
                "spark.rtfril.gbt.compress.parts",
                str(max(1, dp // 8)),
            )
        )
    )
    return (
        binned.groupBy(*binned.columns)
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .coalesce(parts)
    )


def _bin_expr(f: str, scales: dict[str, float] | None, bins: int) -> Column:
    """least(greatest(floor(x_scaled·B), 0), B−1) — identical text in
    :func:`_bin_sql`; features are scaled into [0,1] so the clamp only
    catches the exact-1.0 boundary."""
    raw = F.floor(_x_expr(f, scales) * F.lit(float(bins)))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1)).cast("long")


def _bin_sql(f: str, bins: int) -> str:
    return (
        f"CAST(least(greatest(floor(({_x_sql(f)}) * {float(bins)!r}), 0), "
        f"{bins - 1}) AS BIGINT)"
    )


def _gain(glm: int, hlm: int, gm: int, hm: int, lam: float) -> float:
    """XGBoost split gain from integer micro-sums — the EXACT
    expression the SQL oracle writes (same operation order, so the
    resulting doubles are bit-identical and the argmax transfers)."""
    gl = glm / 1e6
    hl = hlm / 1e6
    gr = (gm - glm) / 1e6
    hr = (hm - hlm) / 1e6
    g = gm / 1e6
    h = hm / 1e6
    return (gl * gl) / (hl + lam) + (gr * gr) / (hr + lam) - (g * g) / (h + lam)


def _gain_sql(glm: str, hlm: str, gm: str, hm: str, lam: float) -> str:
    gl = f"(CAST({glm} AS DOUBLE) / 1000000.0)"
    hl = f"(CAST({hlm} AS DOUBLE) / 1000000.0)"
    gr = f"(CAST({gm} - {glm} AS DOUBLE) / 1000000.0)"
    hr = f"(CAST({hm} - {hlm} AS DOUBLE) / 1000000.0)"
    g = f"(CAST({gm} AS DOUBLE) / 1000000.0)"
    h = f"(CAST({hm} AS DOUBLE) / 1000000.0)"
    return (
        f"({gl} * {gl}) / ({hl} + {lam!r}) + ({gr} * {gr}) / ({hr} + {lam!r})"
        f" - ({g} * {g}) / ({h} + {lam!r})"
    )


def _leaf_w(glm: int, hlm: int, lam: float) -> float:
    """w = −G/(H+λ) from integer micro-sums — same text as the SQL."""
    return -(glm / 1e6) / ((hlm / 1e6) + lam)


def _argmax_split(
    cells: list[tuple[int, int, int, int]],
    features: tuple[str, ...],
    lam: float,
) -> tuple[int, int, int, int, int, int, float]:
    """Greedy best split over histogram cells (fidx, bin, gs, hs):
    returns (fidx, bin, gl_m, hl_m, g_m, h_m, gain). Deterministic
    fold: strictly-greater gain wins, so ties keep the smallest
    (fidx, bin) — matching ORDER BY gain DESC, fidx, bin LIMIT 1.

    Candidates are INTERIOR only — each feature's last occupied bin
    is excluded (its "split" sends every row left; XGBoost's
    enumeration never proposes a split with an empty child). Found
    at r15: on a weak-signal fold a large λ can push every interior
    gain below the boundary's exact 0.0, so including the boundary
    turned an over-regularized-but-valid config into a degenerate
    crash. A node with a single occupied bin in EVERY feature has no
    admissible split at all → ValueError (the gated-domain
    contract; the SQL oracles' chk CTEs error() identically)."""
    if not cells:
        # empty input frame (ADVICE r15): fail with the gated-domain
        # contract, not a raw KeyError — the SQL oracles' nz guard
        # error()s identically
        raise ValueError(
            "empty feature frame: GBT training needs at least one row "
            "— outside the gated GBT domain"
        )
    by_f: dict[int, list[tuple[int, int, int]]] = {}
    for fidx, b, gs, hs in cells:
        by_f.setdefault(fidx, []).append((b, gs, hs))
    # node totals from feature 0's cells (every row carries every
    # feature, so any one feature's cells partition the node)
    g_m = sum(gs for b, gs, hs in by_f[0])
    h_m = sum(hs for b, gs, hs in by_f[0])
    best = None
    for fidx in range(len(features)):
        glm = 0
        hlm = 0
        occupied = sorted(by_f.get(fidx, []))
        for b, gs, hs in occupied[:-1]:  # interior candidates only
            glm += gs
            hlm += hs
            gain = _gain(glm, hlm, g_m, h_m, lam)
            if best is None or gain > best[0]:
                best = (gain, fidx, b, glm, hlm)
    if best is None:
        raise ValueError(
            "unsplittable node: every feature has a single occupied bin "
            "— no admissible (non-empty-child) split exists; the input "
            "is outside the gated GBT domain"
        )
    gain_v, fidx, b, glm, hlm = best
    return fidx, b, glm, hlm, g_m, h_m, gain_v


def _tree_logit_on_bins(tree: dict, features: tuple[str, ...]) -> Column:
    """Tree value over the b_<feature> bin columns of the working
    frame (the trainer's inner loop — the raw-feature form for
    serving is :func:`gbt_trained_logit_expr`)."""
    rf, rb = tree["root"]
    lf, lb = tree["left"]
    rrf, rrb = tree["right"]
    left = F.when(
        F.col(f"b_{features[lf]}") <= lb, F.lit(tree["w_ll"])
    ).otherwise(F.lit(tree["w_lr"]))
    right = F.when(
        F.col(f"b_{features[rrf]}") <= rrb, F.lit(tree["w_rl"])
    ).otherwise(F.lit(tree["w_rr"]))
    return F.when(F.col(f"b_{features[rf]}") <= rb, left).otherwise(right)


def train_gbt(
    fv: DataFrame,
    features: tuple[str, ...] = SCORE_FEATURES,
    rounds: int = GBT_ROUNDS,
    bins: int = GBT_BINS,
    lam: float = GBT_LAMBDA,
    eta: float = GBT_ETA,
    label: str = "label",
    scales: dict[str, float] | None = None,
    pos_weight: float | None = None,
) -> list[dict]:
    """Fit ``rounds`` depth-2 trees by histogram gradient boosting.

    Each round: compile the partial ensemble to a row-local logit,
    micro-floor gradients/hessians, then TWO distributed aggregates —
    (feature, bin) for the root split, (node, feature, bin) for the
    child splits — each collecting ≤ nodes·d·B integer cells (the
    sanctioned model-broadcast class). Returns the tree list; leaf
    values are full-precision doubles (round only at the output
    boundary).

    ``pos_weight`` is XGBoost's scale_pos_weight, the exact parameter
    the reference sets (`fraud_detector.py:148`): positive rows'
    gradient AND hessian contributions multiply by it before the
    micro-floor — splits then optimize weighted loss and leaves
    −G/(H+λ) are naturally weighted (no n_eff: the weights flow
    through both numerator and denominator).
    """
    binned = _compress_binned(
        fv.select(
            F.col(label).alias("label"),
            *[_bin_expr(f, scales, bins).alias(f"b_{f}") for f in features],
        )
    )
    wgt: Column | None = (
        None
        if pos_weight is None
        else F.when(F.col("label") == 1, F.lit(float(pos_weight))).otherwise(
            F.lit(1.0)
        )
    )
    trees: list[dict] = []
    # r17 (guide §3.3 plan truncation / §1.2): the partial ensemble's
    # logit rides as a materialized __f column in a per-round persisted
    # frame — the SQL oracle's own rows{t} discipline — so no plan ever
    # holds more than ONE tree cascade and both level jobs (root +
    # children histograms) read the computed gm/hm once. f accumulates
    # left-associated in the identical op order (f + η·tree): the
    # doubles — and the trees — are bit-identical (law-pinned).
    state = binned
    prev_work = None
    for _t in range(rounds):
        z: Column = F.col("__f") if trees else F.lit(0.0)
        # stage p as a real column (the q_kmeans_train staged-argmin
        # discipline): gm and hm both read ONE computed sigmoid value
        staged = state.withColumn(
            "__p", det_round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
        )
        p = F.col("__p")
        g = p - F.col("label").cast("double")
        h = p * (F.lit(1.0) - p)
        gc = g * F.lit(_MICRO) if wgt is None else g * wgt * F.lit(_MICRO)
        hc = h * F.lit(_MICRO) if wgt is None else h * wgt * F.lit(_MICRO)
        work = staged.select(
            "label",
            *[f"b_{f}" for f in features],
            "__cnt",
            *([F.col("__f")] if trees else []),
            # gm/hm carry the row's multiplicity: cnt·floor(g·1e6+.5)
            # sums to the exact raw-row total (see _compress_binned)
            (F.floor(gc + F.lit(0.5)).cast("long") * F.col("__cnt")).alias("gm"),
            (F.floor(hc + F.lit(0.5)).cast("long") * F.col("__cnt")).alias("hm"),
        ).persist()
        n_f = len(features)
        pairs = ", ".join(f"{i}, b_{f}" for i, f in enumerate(features))
        stacked = work.selectExpr(
            "gm", "hm", f"stack({n_f}, {pairs}) AS (fidx, bin)"
        )
        h1 = (
            stacked.groupBy("fidx", "bin")
            .agg(F.sum("gm").alias("gs"), F.sum("hm").alias("hs"))
            .collect()
        )
        cells = [(r["fidx"], r["bin"], r["gs"], r["hs"]) for r in h1]
        rfidx, rbin, _glm, _hlm, _gm, _hm, rgain = _argmax_split(
            cells, features, lam
        )

        node = F.when(F.col(f"b_{features[rfidx]}") <= rbin, 0).otherwise(1)
        stacked2 = work.withColumn("node", node).selectExpr(
            "node", "gm", "hm", f"stack({n_f}, {pairs}) AS (fidx, bin)"
        )
        h2 = (
            stacked2.groupBy("node", "fidx", "bin")
            .agg(F.sum("gm").alias("gs"), F.sum("hm").alias("hs"))
            .collect()
        )
        if prev_work is not None:
            prev_work.unpersist()
        prev_work = work
        by_node: dict[int, list] = {}
        for r in h2:
            by_node.setdefault(r["node"], []).append(
                (r["fidx"], r["bin"], r["gs"], r["hs"])
            )
        if sorted(by_node) != [0, 1]:
            raise ValueError(
                f"degenerate root split in round {_t}: child node(s) "
                f"{sorted({0, 1} - set(by_node))} are empty — the input "
                "frame has too little feature variation for depth-2 trees"
            )
        tree = {"root": (rfidx, rbin), "gain_root": rgain}
        for n_id, side in ((0, "left"), (1, "right")):
            cfidx, cbin, glm, hlm, g_m, h_m, cgain = _argmax_split(
                by_node[n_id], features, lam
            )
            tree[side] = (cfidx, cbin)
            tree[f"gain_{side}"] = cgain
            wl = _leaf_w(glm, hlm, lam)
            wr = _leaf_w(g_m - glm, h_m - hlm, lam)
            if n_id == 0:
                tree["w_ll"], tree["w_lr"] = wl, wr
            else:
                tree["w_rl"], tree["w_rr"] = wl, wr
        had_trees = bool(trees)
        trees.append(tree)
        if _t + 1 < rounds:
            state = work.select(
                "label",
                *[f"b_{f}" for f in features],
                "__cnt",
                (
                    (F.col("__f") if had_trees else F.lit(0.0))
                    + F.lit(float(eta)) * _tree_logit_on_bins(tree, features)
                ).alias("__f"),
            )
    if prev_work is not None:
        prev_work.unpersist()
    return trees


def gbt_trained_logit_expr(
    trees: list[dict],
    features: tuple[str, ...] = SCORE_FEATURES,
    bins: int = GBT_BINS,
    eta: float = GBT_ETA,
    scales: dict[str, float] | None = None,
) -> Column:
    """The trained ensemble's logit over RAW feature columns (bins
    recomputed row-locally) — the train→serve closure; shape-identical
    to ext/scoring.gbt_logit_expr's compiled-CASE serving form."""

    def bcol(fidx: int) -> Column:
        return _bin_expr(features[fidx], scales, bins)

    z: Column = F.lit(0.0)
    for tr in trees:
        rf, rb = tr["root"]
        lf, lb = tr["left"]
        rrf, rrb = tr["right"]
        left = F.when(bcol(lf) <= lb, F.lit(tr["w_ll"])).otherwise(
            F.lit(tr["w_lr"])
        )
        right = F.when(bcol(rrf) <= rrb, F.lit(tr["w_rl"])).otherwise(
            F.lit(tr["w_rr"])
        )
        t_val = F.when(bcol(rf) <= rb, left).otherwise(right)
        z = z + F.lit(float(eta)) * t_val
    return z


# --- generated DuckDB oracle -------------------------------------------------


def _gbt_ctes(
    fv_sql: str,
    features: tuple[str, ...] = SCORE_FEATURES,
    rounds: int = GBT_ROUNDS,
    bins: int = GBT_BINS,
    lam: float = GBT_LAMBDA,
    eta: float = GBT_ETA,
    weighted: bool = False,
    prefix: str = "",
) -> tuple[str, str]:
    """(cte_block, final_rows_cte): the unrolled boosting rounds.
    Every arithmetic step mirrors :func:`train_gbt` token for token.
    Per-row split application resolves the data-dependent split
    feature through the stacked long form joined to the 1-row best
    tables; hot CTEs are MATERIALIZED (DuckDB otherwise re-inlines
    each reference, exponentially re-evaluating the chain).
    ``weighted=True`` multiplies every gradient/hessian contribution
    by scale_pos_weight = n0/n1 (from a cnts CTE of exact counts)
    before the micro-floor — the weighted :func:`train_gbt` fold.
    ``prefix`` namespaces every CTE so several configs can share one
    statement (q_gbt_model_selection — the logreg_train_ctes
    convention).

    Degenerate-frame contract (ADVICE r13): on a frame where the root
    split leaves a child node EMPTY, :func:`train_gbt` raises
    ValueError — and so does this oracle: a chk CTE (evaluated on the
    best2 path every arm reads) calls DuckDB ``error()`` unless both
    child nodes materialized, so engine and oracle agree on degenerate
    inputs by BOTH failing loudly instead of the oracle inventing
    NULL-structured rows."""
    p_ = prefix
    bin_cols = ", ".join(
        f"{_bin_sql(f, bins)} AS b_{f}" for f in features
    )
    stack_case = " ".join(
        f"WHEN {i} THEN g.b_{f}" for i, f in enumerate(features)
    )
    fidx_vals = ", ".join(f"({i})" for i in range(len(features)))
    parts = [
        f"{p_}fv AS ({fv_sql})",
        (
            f"{p_}rows0 AS MATERIALIZED (SELECT o_orderkey, label, "
            f"{bin_cols}, CAST(0.0 AS DOUBLE) AS f FROM {p_}fv)"
        ),
        # Empty-frame guard (ADVICE r15): ck1/ck2/chk ride join WHEREs,
        # so on a fully EMPTY frame no row ever evaluates them and the
        # oracle would return silent NULL/zero-row trees while
        # train_gbt raises. This 1-row CTE always exists; consumers
        # whose final arms are unconditional (gbt_train_sql's per-tree
        # selects) scan it, so the error() provably fires.
        (
            f"{p_}nz AS (SELECT CASE WHEN (SELECT count(*) FROM {p_}rows0) "
            f">= 1 THEN 1 ELSE CAST(error('empty feature frame: GBT "
            f"training needs at least one row - outside the gated GBT "
            f"domain (train_gbt raises ValueError)') AS INTEGER) END AS oknz)"
        ),
    ]
    if weighted:
        parts.append(
            f"{p_}cnts AS (SELECT CAST(sum(1 - label) AS DOUBLE) AS n0, "
            f"CAST(sum(label) AS DOUBLE) AS n1 FROM {p_}fv)"
        )
    wgt = "(CASE WHEN label = 1 THEN (n0 / n1) ELSE 1.0 END)"
    b_star = ", ".join(f"b_{f}" for f in features)
    for t in range(1, rounds + 1):
        p = _R6.format(c="1.0 / (1.0 + exp(-f))")
        gc = f"(({p}) - CAST(label AS DOUBLE))"
        hc = f"(({p}) * (1.0 - ({p})))"
        if weighted:
            gc = f"{gc} * {wgt}"
            hc = f"{hc} * {wgt}"
        parts.append(
            f"{p_}gh{t} AS MATERIALIZED (SELECT o_orderkey, label, {b_star}, f, "
            f"CAST(floor({gc} * 1000000.0 + 0.5) AS BIGINT) AS gm, "
            f"CAST(floor({hc} * 1000000.0 + 0.5) AS BIGINT) AS hm "
            f"FROM {p_}rows{t - 1}{f' CROSS JOIN {p_}cnts' if weighted else ''})"
        )
        parts.append(
            f"{p_}st{t} AS MATERIALIZED (SELECT g.o_orderkey, g.gm, g.hm, fe.fidx, "
            f"CASE fe.fidx {stack_case} END AS bin "
            f"FROM {p_}gh{t} g CROSS JOIN (VALUES {fidx_vals}) fe(fidx))"
        )
        parts.append(
            f"{p_}h1_{t} AS MATERIALIZED (SELECT fidx, bin, "
            f"sum(gm) AS gs, sum(hm) AS hs FROM {p_}st{t} GROUP BY 1, 2)"
        )
        parts.append(
            f"{p_}tot{t} AS (SELECT sum(gs) AS g_m, sum(hs) AS h_m "
            f"FROM {p_}h1_{t} WHERE fidx = 0)"
        )
        parts.append(
            f"{p_}cum1_{t} AS (SELECT fidx, bin, "
            f"sum(gs) OVER (PARTITION BY fidx ORDER BY bin) AS gl_m, "
            f"sum(hs) OVER (PARTITION BY fidx ORDER BY bin) AS hl_m, "
            # each feature's LAST occupied bin is not a candidate —
            # its "split" sends every row left (the r15 interior-only
            # rule, mirrored in _argmax_split)
            f"max(bin) OVER (PARTITION BY fidx) AS maxbin "
            f"FROM {p_}h1_{t})"
        )
        # the _argmax_split "unsplittable node" ValueError twin:
        # admissible candidates exist iff some feature occupies ≥2
        # bins; evaluated in best1's WHERE, whose input (cum1 × tot)
        # is non-empty whenever the frame is, so the error() fires
        parts.append(
            f"{p_}ck1_{t} AS (SELECT CASE WHEN (SELECT count(*) FROM "
            f"(SELECT fidx FROM {p_}h1_{t} GROUP BY fidx "
            f"HAVING count(*) >= 2)) >= 1 THEN 1 "
            f"ELSE CAST(error('unsplittable root in round {t}: every "
            f"feature has a single occupied bin - outside the gated GBT "
            f"domain (train_gbt raises ValueError)') AS INTEGER) END AS ok1)"
        )
        gain1 = _gain_sql("c.gl_m", "c.hl_m", "t.g_m", "t.h_m", lam)
        parts.append(
            f"{p_}best1_{t} AS MATERIALIZED (SELECT c.fidx, c.bin, {gain1} AS gain "
            f"FROM {p_}cum1_{t} c CROSS JOIN {p_}tot{t} t "
            f"CROSS JOIN {p_}ck1_{t} "
            f"WHERE c.bin < c.maxbin AND ok1 = 1 "
            f"ORDER BY {gain1} DESC, c.fidx, c.bin LIMIT 1)"
        )
        parts.append(
            f"{p_}nod{t} AS MATERIALIZED (SELECT s.o_orderkey, "
            f"CASE WHEN s.bin <= b.bin THEN 0 ELSE 1 END AS node "
            f"FROM {p_}st{t} s JOIN {p_}best1_{t} b ON s.fidx = b.fidx)"
        )
        parts.append(
            f"{p_}h2_{t} AS MATERIALIZED (SELECT n.node, s.fidx, s.bin, "
            f"sum(s.gm) AS gs, sum(s.hm) AS hs "
            f"FROM {p_}st{t} s JOIN {p_}nod{t} n ON n.o_orderkey = s.o_orderkey "
            f"GROUP BY 1, 2, 3)"
        )
        parts.append(
            f"{p_}tot2_{t} AS (SELECT node, sum(gs) AS g_m, sum(hs) AS h_m "
            f"FROM {p_}h2_{t} WHERE fidx = 0 GROUP BY 1)"
        )
        # the train_gbt ValueError twin: an empty child node means no
        # depth-2 tree exists — refuse to fabricate NULL structure
        parts.append(
            f"{p_}chk{t} AS (SELECT CASE WHEN "
            f"(SELECT count(*) FROM {p_}tot2_{t}) = 2 THEN 1 "
            f"ELSE CAST(error('degenerate root split in round {t}: a child "
            f"node is empty - out of the gated GBT domain (train_gbt "
            f"raises ValueError)') AS INTEGER) END AS ok)"
        )
        # per-node admissibility twin for the children (some feature
        # occupies ≥2 bins in BOTH nodes), evaluated in best2's WHERE
        parts.append(
            f"{p_}ck2_{t} AS (SELECT CASE WHEN (SELECT count(*) FROM "
            f"(SELECT node FROM (SELECT node, fidx FROM {p_}h2_{t} "
            f"GROUP BY node, fidx HAVING count(*) >= 2) GROUP BY node)) = 2 "
            f"THEN 1 ELSE CAST(error('unsplittable child node in round {t}: "
            f"every feature has a single occupied bin - outside the gated "
            f"GBT domain (train_gbt raises ValueError)') AS INTEGER) "
            f"END AS ok2)"
        )
        parts.append(
            f"{p_}cum2_{t} AS (SELECT node, fidx, bin, "
            f"sum(gs) OVER (PARTITION BY node, fidx ORDER BY bin) AS gl_m, "
            f"sum(hs) OVER (PARTITION BY node, fidx ORDER BY bin) AS hl_m, "
            f"max(bin) OVER (PARTITION BY node, fidx) AS maxbin "
            f"FROM {p_}h2_{t})"
        )
        gain2 = _gain_sql("c.gl_m", "c.hl_m", "t.g_m", "t.h_m", lam)
        parts.append(
            f"{p_}best2_{t} AS MATERIALIZED (SELECT node, fidx, bin, gl_m, hl_m, gain FROM ("
            f"SELECT c.node, c.fidx, c.bin, c.gl_m, c.hl_m, {gain2} AS gain, "
            f"row_number() OVER (PARTITION BY c.node "
            f"ORDER BY {gain2} DESC, c.fidx, c.bin) AS rn "
            # interior-only BEFORE the row_number, so rn=1 is the best
            # ADMISSIBLE candidate per node
            f"FROM {p_}cum2_{t} c JOIN {p_}tot2_{t} t ON t.node = c.node "
            f"WHERE c.bin < c.maxbin) "
            # ok rides in the WHERE (not an unused projection DuckDB
            # would prune away): the filter must evaluate the CASE,
            # so the error() actually fires on degenerate frames
            f"CROSS JOIN {p_}chk{t} CROSS JOIN {p_}ck2_{t} "
            f"WHERE rn = 1 AND ok = 1 AND ok2 = 1)"
        )
        wl = (
            "-(CAST(b.gl_m AS DOUBLE) / 1000000.0)"
            f" / ((CAST(b.hl_m AS DOUBLE) / 1000000.0) + {lam!r})"
        )
        wr = (
            "-(CAST(t.g_m - b.gl_m AS DOUBLE) / 1000000.0)"
            f" / ((CAST(t.h_m - b.hl_m AS DOUBLE) / 1000000.0) + {lam!r})"
        )
        parts.append(
            f"{p_}leafw{t} AS MATERIALIZED (SELECT b.node, s.side, "
            f"CASE s.side WHEN 0 THEN {wl} ELSE {wr} END AS w "
            f"FROM {p_}best2_{t} b JOIN {p_}tot2_{t} t ON t.node = b.node "
            f"CROSS JOIN (VALUES (0), (1)) s(side))"
        )
        parts.append(
            f"{p_}sides{t} AS (SELECT n.o_orderkey, n.node, "
            f"CASE WHEN s.bin <= b.bin THEN 0 ELSE 1 END AS side "
            f"FROM {p_}nod{t} n JOIN {p_}best2_{t} b ON b.node = n.node "
            f"JOIN {p_}st{t} s ON s.o_orderkey = n.o_orderkey AND s.fidx = b.fidx)"
        )
        parts.append(
            f"{p_}rows{t} AS MATERIALIZED (SELECT r.o_orderkey, r.label, {b_star}, "
            f"r.f + {eta!r} * l.w AS f "
            f"FROM {p_}rows{t - 1} r "
            f"JOIN {p_}sides{t} sd ON sd.o_orderkey = r.o_orderkey "
            f"JOIN {p_}leafw{t} l ON l.node = sd.node AND l.side = sd.side)"
        )
    return ",\n    ".join(parts), f"{p_}rows{rounds}"


def gbt_train_sql(
    fv_sql: str,
    features: tuple[str, ...] = SCORE_FEATURES,
    rounds: int = GBT_ROUNDS,
    bins: int = GBT_BINS,
    lam: float = GBT_LAMBDA,
    eta: float = GBT_ETA,
    weighted: bool = False,
) -> str:
    """Complete oracle for q_gbt_train (and its scale_pos_weight
    twin): one row per tree with the full depth-2 structure — split
    features by NAME, split bins, and the four round6 leaf values."""
    ctes, _ = _gbt_ctes(fv_sql, features, rounds, bins, lam, eta, weighted=weighted)
    fname_case = " ".join(
        f"WHEN {i} THEN '{f}'" for i, f in enumerate(features)
    )
    tree_sels = []
    for t in range(1, rounds + 1):
        w = lambda node, side: (  # noqa: E731
            f"(SELECT {_R6.format(c='w')} FROM leafw{t} "
            f"WHERE node = {node} AND side = {side})"
        )
        tree_sels.append(
            f"SELECT CAST({t - 1} AS INTEGER) AS tree, "
            f"(SELECT CASE fidx {fname_case} END FROM best1_{t}) AS root_feature, "
            f"(SELECT bin FROM best1_{t}) AS root_bin, "
            f"(SELECT CASE fidx {fname_case} END FROM best2_{t} WHERE node = 0) AS l_feature, "
            f"(SELECT bin FROM best2_{t} WHERE node = 0) AS l_bin, "
            f"(SELECT CASE fidx {fname_case} END FROM best2_{t} WHERE node = 1) AS r_feature, "
            f"(SELECT bin FROM best2_{t} WHERE node = 1) AS r_bin, "
            f"{w(0, 0)} AS w_ll, {w(0, 1)} AS w_lr, "
            f"{w(1, 0)} AS w_rl, {w(1, 1)} AS w_rr "
            # the empty-frame guard: nz always has exactly 1 row, so
            # this arm still emits 1 tree row — but the WHERE forces
            # oknz's CASE to evaluate, erroring loudly on empty input
            f"FROM nz WHERE oknz = 1"
        )
        if t < rounds:
            tree_sels.append("UNION ALL")
    return f"WITH {ctes}\n    " + "\n    ".join(tree_sels)


def gbt_importance_sql(
    fv_sql: str,
    features: tuple[str, ...] = SCORE_FEATURES,
    rounds: int = GBT_ROUNDS,
    bins: int = GBT_BINS,
    lam: float = GBT_LAMBDA,
    eta: float = GBT_ETA,
) -> str:
    """Oracle for q_gbt_importance: total split gain per feature over
    all rounds×levels (XGBoost's gain-mode feature_importances_).
    Per-split gains round6 to decimals BEFORE summing so the per-
    feature total is order-independent across the UNION arms."""
    ctes, _ = _gbt_ctes(fv_sql, features, rounds, bins, lam, eta)
    arms = []
    for t in range(1, rounds + 1):
        arms.append(f"SELECT fidx, gain FROM best1_{t}")
        arms.append(f"SELECT fidx, gain FROM best2_{t}")
    splits = " UNION ALL ".join(arms)
    fvals = ", ".join(f"({i}, '{f}')" for i, f in enumerate(features))
    g6 = _R6.format(c="s.gain")
    return f"""WITH {ctes},
    splits AS ({splits})
    SELECT fe.fname AS feature,
           CAST(coalesce(sum(CAST({g6} AS DECIMAL(18,6))), 0) AS DOUBLE) AS total_gain,
           CAST(count(s.fidx) AS BIGINT) AS n_splits
    FROM (VALUES {fvals}) fe(fidx, fname)
    LEFT JOIN splits s ON s.fidx = fe.fidx
    GROUP BY 1"""


def gbt_learning_curve_sql(
    fv_sql: str,
    features: tuple[str, ...] = SCORE_FEATURES,
    rounds: int = GBT_ROUNDS,
    bins: int = GBT_BINS,
    lam: float = GBT_LAMBDA,
    eta: float = GBT_ETA,
) -> str:
    """Oracle for q_gbt_learning_curve: in-sample mean log-loss of
    the partial ensemble after each boosting round (round 0 = the
    constant 0-logit model) — the loss ladder that proves each tree
    earns its keep. Every rows{t} CTE already carries the partial
    logit f, so each arm is one aggregate over a MATERIALIZED frame."""
    ctes, _ = _gbt_ctes(fv_sql, features, rounds, bins, lam, eta)
    arms = []
    for t in range(rounds + 1):
        p = _R6.format(c="1.0 / (1.0 + exp(-f))")
        raw = f"CASE WHEN label = 1 THEN -ln({p}) ELSE -ln(1.0 - {p}) END"
        l6 = _R6.format(c=raw)
        mean = _R6.format(
            c=f"CAST(sum(CAST({l6} AS DECIMAL(18,6))) AS DOUBLE) / count(*)"
        )
        arms.append(
            f"SELECT CAST({t} AS INTEGER) AS round, {mean} AS train_logloss "
            f"FROM rows{t}"
        )
    body = "\n    UNION ALL ".join(arms)
    return f"WITH {ctes}\n    {body}"


def gbt_roc_sql(
    fv_sql: str,
    features: tuple[str, ...] = SCORE_FEATURES,
    rounds: int = GBT_ROUNDS,
    bins: int = GBT_BINS,
    lam: float = GBT_LAMBDA,
    eta: float = GBT_ETA,
) -> str:
    """Oracle for q_gbt_roc: re-train via the unrolled rounds, then
    the fixed-threshold confusion sweep with the logreg_roc_sql
    zero-denominator guards (identical sweep text — only the scored
    CTE differs)."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.training import ROC_THRESHOLDS

    ctes, rows_k = _gbt_ctes(fv_sql, features, rounds, bins, lam, eta)
    s = _R6.format(c="1.0 / (1.0 + exp(-f))")
    taus = ", ".join(f"({t!r})" for t in ROC_THRESHOLDS)
    return f"""WITH {ctes},
    scored AS (SELECT label, {s} AS s FROM {rows_k}),
    sweep AS (
      SELECT t.tau, scored.label, scored.s
      FROM scored CROSS JOIN (VALUES {taus}) t(tau)
    )
    SELECT tau,
           CAST(sum(CASE WHEN s >= tau AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(sum(CASE WHEN s >= tau AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CASE WHEN sum(label) = 0 THEN 0.0
                ELSE CAST(sum(CASE WHEN s >= tau AND label = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                     / sum(label) END AS tpr,
           CASE WHEN sum(1 - label) = 0 THEN 0.0
                ELSE CAST(sum(CASE WHEN s >= tau AND label = 0 THEN 1 ELSE 0 END) AS DOUBLE)
                     / sum(1 - label) END AS fpr,
           CASE WHEN sum(CASE WHEN s >= tau THEN 1 ELSE 0 END) = 0 THEN 0.0
                ELSE CAST(sum(CASE WHEN s >= tau AND label = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                     / sum(CASE WHEN s >= tau THEN 1 ELSE 0 END) END AS precision_at
    FROM sweep GROUP BY 1"""


def gbt_score_band_sql(
    fv_sql: str,
    features: tuple[str, ...] = SCORE_FEATURES,
    rounds: int = GBT_ROUNDS,
    bins: int = GBT_BINS,
    lam: float = GBT_LAMBDA,
    eta: float = GBT_ETA,
) -> str:
    """Complete oracle for q_gbt_train_score: re-train via the
    unrolled rounds, score every row with the final ensemble logit,
    band 3-way, aggregate — the logreg_score_sql shape for trees."""
    ctes, rows_k = _gbt_ctes(fv_sql, features, rounds, bins, lam, eta)
    s = _R6.format(c="1.0 / (1.0 + exp(-f))")
    mean_s = _R6.format(
        c="CAST(sum(CAST(s AS DECIMAL(28,6))) AS DOUBLE) / count(*)"
    )
    rate = _R6.format(c="CAST(sum(label) AS DOUBLE) / count(*)")
    return f"""WITH {ctes},
    scored AS (SELECT label, {s} AS s FROM {rows_k}),
    banded AS (
      SELECT label, s,
             CASE WHEN s >= 0.7 THEN 'high'
                  WHEN s >= 0.4 THEN 'medium'
                  ELSE 'low' END AS risk_label
      FROM scored
    )
    SELECT risk_label, count(*) AS n, {mean_s} AS mean_score,
           {rate} AS event_rate
    FROM banded GROUP BY 1"""


# --- deterministic GBT hyperparameter grid (model selection) ------------------

#: The GBT grid: (config id, rounds, eta, lam) — the deterministic
#: subset of the space the reference's Optuna study actually sweeps
#: (`ml/models/fraud_detector.py:249-276`: n_estimators,
#: learning_rate, min_child_weight/lambda; called from
#: `train.py:201`). Subsampling enters via the content-hash
#: train/holdout split, not RNG. Config 0 is the production default
#: (GBT_ROUNDS/GBT_ETA/GBT_LAMBDA), so its trees double as the
#: early-stopping ladder's booster.
GBT_MS_CONFIGS: tuple[tuple[str, int, float, float], ...] = (
    ("r3_e0.3_l1", GBT_ROUNDS, GBT_ETA, GBT_LAMBDA),
    ("r2_e0.3_l1", 2, GBT_ETA, GBT_LAMBDA),
    ("r3_e0.1_l1", GBT_ROUNDS, 0.1, GBT_LAMBDA),
    ("r3_e0.3_l5", GBT_ROUNDS, GBT_ETA, 5.0),
)


def train_gbt_grid(
    fv: DataFrame,
    configs: tuple[tuple[str, int, float, float], ...] = GBT_MS_CONFIGS,
    features: tuple[str, ...] = SCORE_FEATURES,
    bins: int = GBT_BINS,
    label: str = "label",
    scales: dict[str, float] | None = None,
) -> list[list[dict]]:
    """Fit EVERY grid config in max(rounds)·2 shared scans — the
    multi-model fusion of :func:`train_gbt` (train_logreg_grid's
    shared-scan discipline for boosting): per round, ONE stacked
    aggregate computes all still-active configs' (feature, bin) root
    histograms side by side, and ONE their (node, feature, bin) child
    histograms (each config's gradients come from its own partial
    ensemble staged as its own sigmoid column; its node column from
    its own root split). Per-config arithmetic is INDEPENDENT and
    written in the identical operation order as the sequential fold,
    so the returned tree lists are bit-identical to calling train_gbt
    per config (law-pinned in tests/test_gbt.py) and the unrolled
    per-config SQL oracle still gates them. At 100 TB each extra
    config is ≤ 2·d·B more integer cells in the same map-side
    combine — the scan is shared, the histograms stay bytes."""
    binned = fv.select(
        F.col(label).alias("label"),
        *[_bin_expr(f, scales, bins).alias(f"b_{f}") for f in features],
    )
    binned = _compress_binned(binned)
    k = len(configs)
    trees_all: list[list[dict]] = [[] for _ in configs]
    max_rounds = max(r for _n, r, _e, _l in configs)
    n_f = len(features)
    # r17: partial-logit __f_<c> columns + per-round persisted frame —
    # the rows{t} plan-truncation discipline (see train_gbt's comment);
    # every plan holds at most one tree per config.
    state = binned
    carried: list[int] = []
    prev_work = None
    for t in range(max_rounds):
        active = [c for c in range(k) if configs[c][1] > t]

        def f_expr(c: int) -> Column:
            return F.col(f"__f_{c}") if c in carried else F.lit(0.0)

        staged = state
        for c in active:
            staged = staged.withColumn(
                f"__p_{c}",
                det_round(F.lit(1.0) / (F.lit(1.0) + F.exp(-f_expr(c))), 6),
            )
        cols = [
            "label",
            *[f"b_{f}" for f in features],
            "__cnt",
            *[F.col(f"__f_{c}") for c in carried if c in active],
        ]
        for c in active:
            p = F.col(f"__p_{c}")
            g = p - F.col("label").cast("double")
            h = p * (F.lit(1.0) - p)
            # ×__cnt: the distinct row stands for cnt identical raw
            # rows (see _compress_binned) — sums stay exact integers
            cols.append(
                (F.floor(g * F.lit(_MICRO) + F.lit(0.5)).cast("long")
                 * F.col("__cnt")).alias(f"gm_{c}")
            )
            cols.append(
                (F.floor(h * F.lit(_MICRO) + F.lit(0.5)).cast("long")
                 * F.col("__cnt")).alias(f"hm_{c}")
            )
        work = staged.select(*cols).persist()
        entries = ", ".join(
            f"{c}, {i}, b_{f}, gm_{c}, hm_{c}"
            for c in active
            for i, f in enumerate(features)
        )
        stacked = work.selectExpr(
            f"stack({len(active) * n_f}, {entries}) AS (cfg, fidx, bin, gm, hm)"
        )
        h1 = (
            stacked.groupBy("cfg", "fidx", "bin")
            .agg(F.sum("gm").alias("gs"), F.sum("hm").alias("hs"))
            .collect()
        )
        roots: dict[int, tuple[int, int, float]] = {}
        for c in active:
            lam_c = float(configs[c][3])
            cells = [
                (r["fidx"], r["bin"], r["gs"], r["hs"]) for r in h1 if r["cfg"] == c
            ]
            rfidx, rbin, _glm, _hlm, _gm, _hm, rgain = _argmax_split(
                cells, features, lam_c
            )
            roots[c] = (rfidx, rbin, rgain)
        work2 = work
        for c in active:
            rfidx, rbin, _g = roots[c]
            work2 = work2.withColumn(
                f"node_{c}",
                F.when(F.col(f"b_{features[rfidx]}") <= rbin, 0).otherwise(1),
            )
        entries2 = ", ".join(
            f"{c}, node_{c}, {i}, b_{f}, gm_{c}, hm_{c}"
            for c in active
            for i, f in enumerate(features)
        )
        stacked2 = work2.selectExpr(
            f"stack({len(active) * n_f}, {entries2}) AS (cfg, node, fidx, bin, gm, hm)"
        )
        h2 = (
            stacked2.groupBy("cfg", "node", "fidx", "bin")
            .agg(F.sum("gm").alias("gs"), F.sum("hm").alias("hs"))
            .collect()
        )
        if prev_work is not None:
            prev_work.unpersist()
        prev_work = work
        for c in active:
            lam_c = float(configs[c][3])
            rfidx, rbin, rgain = roots[c]
            by_node: dict[int, list] = {}
            for r in h2:
                if r["cfg"] == c:
                    by_node.setdefault(r["node"], []).append(
                        (r["fidx"], r["bin"], r["gs"], r["hs"])
                    )
            if sorted(by_node) != [0, 1]:
                raise ValueError(
                    f"degenerate root split in round {t} of config "
                    f"{configs[c][0]}: child node(s) "
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
            trees_all[c].append(tree)
        if t + 1 < max_rounds:
            nxt = [c for c in range(k) if configs[c][1] > t + 1]
            state = work.select(
                "label",
                *[f"b_{f}" for f in features],
                "__cnt",
                *[
                    (
                        f_expr(c)
                        + F.lit(float(configs[c][2]))
                        * _tree_logit_on_bins(trees_all[c][-1], features)
                    ).alias(f"__f_{c}")
                    for c in nxt
                ],
            )
            carried = nxt
    if prev_work is not None:
        prev_work.unpersist()
    return trees_all


_H60_OK = "('0x' || substr(md5(o_orderkey::VARCHAR), 1, 15))::BIGINT % 100"


def _gbt_holdout_ctes(
    prefix: str,
    holdout_from: str,
    features: tuple[str, ...] = SCORE_FEATURES,
    rounds: int = GBT_ROUNDS,
    bins: int = GBT_BINS,
    eta: float = GBT_ETA,
) -> tuple[str, str]:
    """(cte_block, final_holdout_cte): replay the TRAINED splits on a
    holdout frame — per round, resolve each holdout row's node and
    side against the training chain's {prefix}best1/{prefix}best2
    tables and accumulate f += eta·w from {prefix}leafw, in the exact
    operation order rows{t} uses, so the holdout logit is the same
    left-associated double the engine's compiled ensemble computes."""
    p_ = prefix
    bin_cols = ", ".join(f"{_bin_sql(f, bins)} AS b_{f}" for f in features)
    stack_case = " ".join(
        f"WHEN {i} THEN g.b_{f}" for i, f in enumerate(features)
    )
    fidx_vals = ", ".join(f"({i})" for i in range(len(features)))
    parts = [
        (
            f"{p_}hrows0 AS MATERIALIZED (SELECT o_orderkey, label, "
            f"{bin_cols}, CAST(0.0 AS DOUBLE) AS f FROM {holdout_from})"
        ),
        (
            f"{p_}hst AS MATERIALIZED (SELECT g.o_orderkey, fe.fidx, "
            f"CASE fe.fidx {stack_case} END AS bin "
            f"FROM {p_}hrows0 g CROSS JOIN (VALUES {fidx_vals}) fe(fidx))"
        ),
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f"{p_}hnod{t} AS (SELECT s.o_orderkey, "
            f"CASE WHEN s.bin <= b.bin THEN 0 ELSE 1 END AS node "
            f"FROM {p_}hst s JOIN {p_}best1_{t} b ON s.fidx = b.fidx)"
        )
        parts.append(
            f"{p_}hsides{t} AS (SELECT n.o_orderkey, n.node, "
            f"CASE WHEN s.bin <= b.bin THEN 0 ELSE 1 END AS side "
            f"FROM {p_}hnod{t} n JOIN {p_}best2_{t} b ON b.node = n.node "
            f"JOIN {p_}hst s ON s.o_orderkey = n.o_orderkey AND s.fidx = b.fidx)"
        )
        parts.append(
            f"{p_}hrows{t} AS MATERIALIZED (SELECT r.o_orderkey, r.label, "
            f"r.f + {eta!r} * l.w AS f "
            f"FROM {p_}hrows{t - 1} r "
            f"JOIN {p_}hsides{t} sd ON sd.o_orderkey = r.o_orderkey "
            f"JOIN {p_}leafw{t} l ON l.node = sd.node AND l.side = sd.side)"
        )
    return ",\n    ".join(parts), f"{p_}hrows{rounds}"


def _gbt_ms_parts(
    fv_sql: str,
    configs: tuple[tuple[str, int, float, float], ...] = GBT_MS_CONFIGS,
    features: tuple[str, ...] = SCORE_FEATURES,
    bins: int = GBT_BINS,
) -> tuple[list[str], str, str]:
    """(cte parts through the selection, vals, loss_case): hash-split
    train/holdout, one unrolled boosting chain per config (namespaced
    g{i}_), a holdout split-replay per config, per-config decimal-
    folded holdout losses folded into the 1-row ``m`` CTE, plus the
    VALUES/CASE strings consumers need to label configs — shared by
    the selection and retrain-best oracles."""
    parts = [
        f"base AS ({fv_sql})",
        f"tr AS MATERIALIZED (SELECT * FROM base WHERE {_H60_OK} < 80)",
        f"va AS MATERIALIZED (SELECT * FROM base WHERE {_H60_OK} >= 80)",
    ]
    loss_ctes = []
    for i, (_name, rounds, eta, lam) in enumerate(configs):
        p_ = f"g{i}_"
        ctes, _rk = _gbt_ctes(
            "SELECT * FROM tr", features, rounds, bins, lam, eta, prefix=p_
        )
        parts.append(ctes)
        hctes, hk = _gbt_holdout_ctes(p_, "va", features, rounds, bins, eta)
        parts.append(hctes)
        p = _R6.format(c="1.0 / (1.0 + exp(-f))")
        raw = f"CASE WHEN label = 1 THEN -ln({p}) ELSE -ln(1.0 - {p}) END"
        l6 = _R6.format(c=raw)
        loss_ctes.append(f"{p_}loss")
        parts.append(
            f"{p_}loss AS (SELECT count(*) AS n, "
            f"sum(CAST({l6} AS DECIMAL(18,6))) AS L FROM {hk})"
        )
    joins = " ".join(f"CROSS JOIN {lc} v{i}" for i, lc in enumerate(loss_ctes[1:], 1))
    means = ", ".join(
        f"{_R6.format(c=f'CAST(v{i}.L AS DOUBLE) / v{i}.n')} AS m_{i}"
        for i in range(len(configs))
    )
    parts.append(f"m AS (SELECT {means} FROM {loss_ctes[0]} v0 {joins})")
    vals = ", ".join(
        f"('{name}', {rounds}, {eta!r}, {lam!r})"
        for name, rounds, eta, lam in configs
    )
    loss_case = " ".join(
        f"WHEN '{name}' THEN m_{i}"
        for i, (name, _r, _e, _l) in enumerate(configs)
    )
    return parts, vals, loss_case


def gbt_model_selection_sql(
    fv_sql: str,
    configs: tuple[tuple[str, int, float, float], ...] = GBT_MS_CONFIGS,
    features: tuple[str, ...] = SCORE_FEATURES,
    bins: int = GBT_BINS,
) -> str:
    """Oracle for q_gbt_model_selection: hash-split train/holdout
    (the q_model_selection split), one unrolled boosting chain per
    config (namespaced by prefix), a holdout split-replay per config,
    then per-config decimal-folded holdout log-loss and an is_best
    rank (val_logloss asc, config id tie-break)."""
    parts, vals, loss_case = _gbt_ms_parts(fv_sql, configs, features, bins)
    cte_block = ",\n    ".join(parts)
    return f"""WITH {cte_block},
    longf AS (
      SELECT c.config, c.rounds, c.eta, c.lam,
             CASE c.config {loss_case} END AS val_logloss
      FROM (VALUES {vals}) c(config, rounds, eta, lam) CROSS JOIN m
    )
    SELECT config, CAST(rounds AS INTEGER) AS rounds, eta, lam, val_logloss,
           CAST(CASE WHEN row_number() OVER (ORDER BY val_logloss, config) = 1
                THEN 1 ELSE 0 END AS INTEGER) AS is_best
    FROM longf"""


def gbt_retrain_best_sql(
    fv_sql: str,
    configs: tuple[tuple[str, int, float, float], ...] = GBT_MS_CONFIGS,
    features: tuple[str, ...] = SCORE_FEATURES,
    bins: int = GBT_BINS,
    gates: dict[str, float] | None = None,
) -> str:
    """Oracle for q_retrain_best — the reference `train.py` main flow
    in one statement: the selection chains pick the winner, every
    config ALSO re-trains on the FULL frame with its card computed
    (SQL cannot branch the unrolled training on the data-dependent
    winner — the engine trains only the winner; this all-configs form
    is an oracle artifact), and the winner's card is gated against
    the promotion floors."""
    if gates is None:
        from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.model_registry import QUALITY_GATES

        gates = QUALITY_GATES
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.training import model_metrics_ctes

    parts, vals, loss_case = _gbt_ms_parts(fv_sql, configs, features, bins)
    card_arms = []
    for i, (name, rounds, eta, lam) in enumerate(configs):
        p_ = f"f{i}_"
        ctes, rk = _gbt_ctes(
            "SELECT * FROM base", features, rounds, bins, lam, eta, prefix=p_
        )
        parts.append(ctes)
        s = _R6.format(c="1.0 / (1.0 + exp(-f))")
        parts.append(f"{p_}scored AS (SELECT label, {s} AS s FROM {rk})")
        cctes, card = model_metrics_ctes(prefix=p_, scored_from=f"{p_}scored")
        parts.append(cctes)
        card_arms.append(f"SELECT '{name}' AS config, * FROM {card}")
    parts.append(
        f"""longf AS (
      SELECT c.config, c.rounds, c.eta, c.lam,
             CASE c.config {loss_case} END AS val_logloss
      FROM (VALUES {vals}) c(config, rounds, eta, lam) CROSS JOIN m
    )"""
    )
    parts.append(
        "win AS (SELECT config, rounds, eta, lam, val_logloss "
        "FROM longf ORDER BY val_logloss, config LIMIT 1)"
    )
    parts.append("cards AS (" + " UNION ALL ".join(card_arms) + ")")
    parts.append(
        "wcard AS (SELECT c.* FROM cards c JOIN win w ON w.config = c.config)"
    )
    gate_vals = ", ".join(f"('{m}', {v!r})" for m, v in gates.items())
    val_case = " ".join(f"WHEN '{m}' THEN {m}" for m in gates)
    cte_block = ",\n    ".join(parts)
    return f"""WITH {cte_block}
    SELECT w.config, CAST(w.rounds AS INTEGER) AS rounds, w.eta, w.lam,
           w.val_logloss,
           g.metric,
           CASE g.metric {val_case} END AS value,
           g.floor AS min_required,
           CAST(CASE WHEN (CASE g.metric {val_case} END) >= g.floor
                THEN 1 ELSE 0 END AS INTEGER) AS ok,
           CAST(min(CASE WHEN (CASE g.metric {val_case} END) >= g.floor
                THEN 1 ELSE 0 END) OVER () AS INTEGER) AS promoted
    FROM wcard CROSS JOIN win w CROSS JOIN (VALUES {gate_vals}) g(metric, floor)"""


def gbt_early_stop_sql(
    fv_sql: str,
    features: tuple[str, ...] = SCORE_FEATURES,
    rounds: int = GBT_ROUNDS,
    bins: int = GBT_BINS,
    lam: float = GBT_LAMBDA,
    eta: float = GBT_ETA,
) -> str:
    """Oracle for q_gbt_early_stop: train on the hash-split train
    fold, replay the splits on the holdout fold, emit the per-round
    HOLDOUT log-loss ladder, then apply the patience-1 rule in SQL:
    stop at the first round that fails to improve the running best
    (eval_set + early_stopping_rounds, `fraud_detector.py:157,246`);
    is_best marks the argmin among reached rounds."""
    p_ = "es_"
    parts = [
        f"base AS ({fv_sql})",
        f"tr AS MATERIALIZED (SELECT * FROM base WHERE {_H60_OK} < 80)",
        f"va AS MATERIALIZED (SELECT * FROM base WHERE {_H60_OK} >= 80)",
    ]
    ctes, _rk = _gbt_ctes(
        "SELECT * FROM tr", features, rounds, bins, lam, eta, prefix=p_
    )
    parts.append(ctes)
    hctes, _hk = _gbt_holdout_ctes(p_, "va", features, rounds, bins, eta)
    parts.append(hctes)
    arms = []
    for t in range(rounds + 1):
        p = _R6.format(c="1.0 / (1.0 + exp(-f))")
        raw = f"CASE WHEN label = 1 THEN -ln({p}) ELSE -ln(1.0 - {p}) END"
        l6 = _R6.format(c=raw)
        mean = _R6.format(
            c=f"CAST(sum(CAST({l6} AS DECIMAL(18,6))) AS DOUBLE) / count(*)"
        )
        arms.append(
            f"SELECT CAST({t} AS INTEGER) AS round, {mean} AS val_logloss "
            f"FROM {p_}hrows{t}"
        )
    parts.append("lad AS (" + "\n      UNION ALL ".join(arms) + ")")
    parts.append(
        "pb AS (SELECT round, val_logloss, "
        "min(val_logloss) OVER (ORDER BY round "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_best "
        "FROM lad)"
    )
    parts.append(
        "fl AS (SELECT round, val_logloss, "
        "CASE WHEN round = 0 OR val_logloss < prev_best THEN 1 ELSE 0 END "
        "AS improved FROM pb)"
    )
    parts.append(
        f"sp AS (SELECT coalesce(min(CASE WHEN improved = 0 THEN round END), "
        f"{rounds}) AS stop_at FROM fl)"
    )
    cte_block = ",\n    ".join(parts)
    return f"""WITH {cte_block}
    SELECT f.round, f.val_logloss,
           CAST(CASE WHEN f.round <= s.stop_at THEN 1 ELSE 0 END AS INTEGER)
             AS reached,
           CAST(CASE WHEN f.round <= s.stop_at
                AND row_number() OVER (
                  PARTITION BY CASE WHEN f.round <= s.stop_at THEN 1 ELSE 0 END
                  ORDER BY f.val_logloss, f.round) = 1
                THEN 1 ELSE 0 END AS INTEGER) AS is_best
    FROM fl f CROSS JOIN sp s"""


def gbt_early_stop_auc_sql(
    fv_sql: str,
    features: tuple[str, ...] = SCORE_FEATURES,
    rounds: int = GBT_ROUNDS,
    bins: int = GBT_BINS,
    lam: float = GBT_LAMBDA,
    eta: float = GBT_ETA,
    patience: int = 2,
) -> str:
    """Oracle for q_gbt_early_stop_auc: train on the hash-split train
    fold, replay the splits on the holdout fold, emit the per-round
    HOLDOUT rank-sum AUC ladder, then apply the patience-k rule in
    window form: boosting stops at the first round whose distance to
    the last improving round reaches ``patience`` (the reference's
    eval_metric='auc' + early_stopping_rounds, `fraud_detector.py:
    245-247`); is_best marks the argmax among reached rounds."""
    p_ = "esa_"
    parts = [
        f"base AS ({fv_sql})",
        f"tr AS MATERIALIZED (SELECT * FROM base WHERE {_H60_OK} < 80)",
        f"va AS MATERIALIZED (SELECT * FROM base WHERE {_H60_OK} >= 80)",
    ]
    ctes, _rk = _gbt_ctes(
        "SELECT * FROM tr", features, rounds, bins, lam, eta, prefix=p_
    )
    parts.append(ctes)
    hctes, _hk = _gbt_holdout_ctes(p_, "va", features, rounds, bins, eta)
    parts.append(hctes)
    s6 = _R6.format(c="1.0 / (1.0 + exp(-f))")
    arms = [
        f"SELECT CAST({t} AS INTEGER) AS round, {s6} AS s, label "
        f"FROM {p_}hrows{t}"
        for t in range(rounds + 1)
    ]
    parts.append("sc AS (" + "\n      UNION ALL ".join(arms) + ")")
    # the q_model_card rank-sum machinery, windowed per round: exact
    # Mann-Whitney over the bounded distinct-score table
    parts.append(
        "grp AS (SELECT round, s, count(*) AS n, sum(label) AS np "
        "FROM sc GROUP BY 1, 2)"
    )
    parts.append(
        "cum AS (SELECT round, s, n, np, "
        "coalesce(sum(n) OVER w, 0) AS cum_n FROM grp "
        "WINDOW w AS (PARTITION BY round ORDER BY s "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))"
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
        "agg AS (SELECT round, sum(np) AS n_pos, sum(n) - sum(np) AS n_neg, "
        "sum(CAST(np AS DECIMAL(28,1)) "
        "* CAST(cum_n + (n + 1) / 2.0 AS DECIMAL(28,1))) AS rank_sum "
        "FROM cum GROUP BY 1)"
    )
    parts.append(f"lad AS (SELECT round, {auc6} AS val_auc FROM agg)")
    # patience-k in window form: improved = strictly beats the running
    # best; streak at t = t − (last improving round ≤ t); round 0
    # improves by definition
    parts.append(
        "pb AS (SELECT round, val_auc, "
        "max(val_auc) OVER (ORDER BY round "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_best "
        "FROM lad)"
    )
    parts.append(
        "fl AS (SELECT round, val_auc, "
        "CASE WHEN round = 0 OR val_auc > prev_best THEN 1 ELSE 0 END "
        "AS improved FROM pb)"
    )
    parts.append(
        "st AS (SELECT round, val_auc, "
        "round - max(CASE WHEN improved = 1 THEN round END) "
        "OVER (ORDER BY round) AS streak FROM fl)"
    )
    parts.append(
        f"sp AS (SELECT coalesce(min(CASE WHEN streak >= {patience} "
        f"THEN round END), {rounds}) AS stop_at FROM st)"
    )
    cte_block = ",\n    ".join(parts)
    return f"""WITH {cte_block}
    SELECT f.round, f.val_auc,
           CAST(CASE WHEN f.round <= s.stop_at THEN 1 ELSE 0 END AS INTEGER)
             AS reached,
           CAST(CASE WHEN f.round <= s.stop_at
                AND row_number() OVER (
                  PARTITION BY CASE WHEN f.round <= s.stop_at THEN 1 ELSE 0 END
                  ORDER BY f.val_auc DESC, f.round) = 1
                THEN 1 ELSE 0 END AS INTEGER) AS is_best
    FROM st f CROSS JOIN sp s"""


def early_stop_decision_auc(
    aucs: list[float], patience: int = 2
) -> tuple[int, int]:
    """(stop_at, best_round) under the patience-k rule over a round6
    holdout AUC ladder (aucs[t] = holdout AUC after t rounds):
    boosting stops at the first round that completes ``patience``
    consecutive failures to improve the running best — the
    reference's eval_metric='auc' + early_stopping_rounds=20
    (`fraud_detector.py:245-247`; k=2 at test scale, the same window
    rule). best_round is the argmax among reached rounds, earliest on
    ties — the round count a retrain would deploy with. Identical
    logic to the SQL oracle's last-improving-round window form
    (gbt_early_stop_auc_sql): the streak at t equals
    t − last_improving_round."""
    best = aucs[0]
    streak = 0
    stop_at = len(aucs) - 1
    for t in range(1, len(aucs)):
        if aucs[t] > best:
            best = aucs[t]
            streak = 0
        else:
            streak += 1
            if streak >= patience:
                stop_at = t
                break
    best_round = max(range(stop_at + 1), key=lambda t: (aucs[t], -t))
    return stop_at, best_round


def early_stop_decision(losses: list[float]) -> tuple[int, int]:
    """(stop_at, best_round) under the patience-1 rule over a round6
    holdout loss ladder (losses[t] = holdout log-loss after t rounds):
    boosting stops at the first round that fails to improve the
    running best (the reference's eval_set + early_stopping_rounds,
    `fraud_detector.py:157,246`, at patience 1); best_round is the
    argmin among reached rounds, earliest on ties — the round count a
    retrain would deploy with. Identical logic to the SQL oracle's
    window-function form (gbt_early_stop_sql)."""
    best_loss = losses[0]
    stop_at = len(losses) - 1
    for t in range(1, len(losses)):
        if losses[t] < best_loss:
            best_loss = losses[t]
        else:
            stop_at = t
            break
    best_round = min(range(stop_at + 1), key=lambda t: (losses[t], t))
    return stop_at, best_round
