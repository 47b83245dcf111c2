"""Exact per-prediction attribution (TreeSHAP) for the depth-2 booster.

The reference explains individual predictions with SHAP over its
fitted XGBoost (`ml/models/fraud_detector.py:185-191`, ``explain()``
building a ``shap.TreeExplainer``). For depth-2 trees the
path-dependent TreeSHAP value is CLOSED FORM: a tree touches at most
3 features (root a, left-child b, right-child c — possibly
coincident), so the Shapley sum runs over ≤ 2³ subsets of its unique
features, with the conditional expectation

    v(S) = Σ_leaves w_leaf · Π_nodes factor(node, S)
    factor = [feature ∈ S] → follow x's branch (0/1)
             [feature ∉ S] → cover(child)/cover(node)

— Lundberg's cover-weighted descent, which needs only the per-node
TRAINING row counts (covers) the fitted splits already induce.

Determinism contract (the ext/gbt.py conventions): covers are exact
integers from one count aggregate; per (tree, subset) terms
``coef · (v(S∪f) − v(S)) · eta`` are evaluated in ONE fixed
parenthesization written identically in driver Python and in the
generated DuckDB SQL, then micro-floored to integers BEFORE any
aggregation — so per-row φ values are integer micros, sums are
order-independent on any partition layout, and the whole artifact
hash-gates. Coincident features (the same feature splitting root and
a child, or both children) are handled by the subset enumeration
itself: equal features share one Shapley player, and the mask →
position-membership mapping ties their factors together.

Per row the engine's φ is a CASE literal on the row's 3 branch
indicators (≤ 8 patterns/tree, precomputed driver-side from the
collected covers — the sanctioned model-broadcast scalar class);
scoring stays row-local inside codegen, and the only aggregation is
the final (band, feature) rollup. The additivity law
Σ_f φ_f = v(full) − v(∅) per tree is pinned EXACTLY in Fractions in
tests/test_shap.py, alongside an independent brute-force Shapley
replay.

Depth contract (VERDICT r14): this module is DEPTH-2-SPECIFIC by
design — the closed form enumerates the ≤ 2³ subsets of a depth-2
tree's ≤ 3 unique features, and the per-row CASE compiler keys on
the 3 branch indicators (root/left/right). It serves q_gbt_shap /
q_gbt_shap_top / explain_stream, all of which explain the
PRODUCTION depth-2 booster (ext/gbt.py's q_gbt_train family). The
depth-3 trainer (ext/gbt_deep.py, q_gbt_train_deep) is a selection
/ benchmarking axis, not the served model; explaining a depth-d
booster exactly means enumerating ≤ 2^(2^d−1) subsets of ≤ 2^d−1
unique features per tree (128 at depth 3) — the same construction,
a wider table. Generalize HERE (subset enumeration over heap trees)
if a deep booster is ever promoted to serving; do not bolt a
different approximation (e.g. Saabas) onto the serving path, which
would silently change attribution semantics.

Cites: reference `ml/models/fraud_detector.py:185-191` (explain,
shap.TreeExplainer) — semantics reproduced, execution re-architected.
"""

from __future__ import annotations

import math

from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.gbt import (
    GBT_BINS,
    GBT_ETA,
    GBT_LAMBDA,
    GBT_ROUNDS,
    _gbt_ctes,
    _R6,
)
from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.scoring import SCORE_FEATURES

#: Covers of a fitted depth-2 tree, as exact training-row counts:
#: (n, nL, nR, nLL, nLR, nRL, nRR) — root, root children, leaves.
Covers = tuple[int, int, int, int, int, int, int]


def _coef(u: int, size: int) -> float:
    """Shapley weight |S|!·(u−|S|−1)!/u! as the identical double the
    SQL writes: u=1 → 1.0; u=2 → 0.5; u=3 → 1/3, 1/6, 1/3."""
    if u == 1:
        return 1.0
    if u == 2:
        return 0.5
    return (1.0 / 3.0) if size in (0, 2) else (1.0 / 6.0)


def _v(
    bA: int,
    bB: int,
    bC: int,
    ia: float,
    ib: float,
    ic: float,
    pl: float,
    pr: float,
    pll: float,
    plr: float,
    prl: float,
    prr: float,
    wll: float,
    wlr: float,
    wrl: float,
    wrr: float,
) -> float:
    """Cover-weighted conditional expectation for one membership
    pattern — the EXACT parenthesization :func:`_v_sql` emits, so
    driver Python and DuckDB produce bit-identical doubles."""
    fa_l = ia if bA == 1 else pl
    fa_r = (1.0 - ia) if bA == 1 else pr
    gb_l = ib if bB == 1 else pll
    gb_r = (1.0 - ib) if bB == 1 else plr
    gc_l = ic if bC == 1 else prl
    gc_r = (1.0 - ic) if bC == 1 else prr
    return (fa_l * ((gb_l * wll) + (gb_r * wlr))) + (
        fa_r * ((gc_l * wrl) + (gc_r * wrr))
    )


def shap_terms(
    tree: dict, covers: Covers, eta: float = GBT_ETA
) -> dict[tuple[int, int, int], dict[int, int]]:
    """Per branch-pattern (iA, iB, iC) → {fidx: φ6} integer micros of
    the eta-scaled Shapley values of ONE fitted tree.

    Subset enumeration over the tree's unique features: ranks are
    1-based in ascending fidx order (the SQL's row_number ORDER BY
    fidx); masks run 0..2^u−1; a position's membership bit is its
    feature's rank bit, so coincident features share bits by
    construction. Each term micro-floors INDEPENDENTLY (the
    q_gbt_importance round-before-sum discipline) so φ6 sums are
    order-free in any engine."""
    fa, ba = tree["root"]
    fb, _bb = tree["left"]
    fc, _bc = tree["right"]
    n, nl, nr, nll, nlr, nrl, nrr = covers
    pl = float(nl) / float(n)
    pr = float(nr) / float(n)
    pll = float(nll) / float(nl)
    plr = float(nlr) / float(nl)
    prl = float(nrl) / float(nr)
    prr = float(nrr) / float(nr)
    ws = (tree["w_ll"], tree["w_lr"], tree["w_rl"], tree["w_rr"])
    uniq = sorted({fa, fb, fc})
    u = len(uniq)
    rank = {f: i + 1 for i, f in enumerate(uniq)}
    ra, rb, rc = rank[fa], rank[fb], rank[fc]
    out: dict[tuple[int, int, int], dict[int, int]] = {}
    for iA in (0, 1):
        for iB in (0, 1):
            for iC in (0, 1):
                ia, ib, ic = float(iA), float(iB), float(iC)
                phis: dict[int, int] = {}
                for f in uniq:
                    rf = rank[f]
                    p6 = 0
                    for m in range(1 << u):
                        if (m >> (rf - 1)) & 1:
                            continue
                        size = ((m & 1) + ((m >> 1) & 1)) + ((m >> 2) & 1)
                        coef = _coef(u, size)
                        m1 = m | (1 << (rf - 1))
                        v0 = _v(
                            (m >> (ra - 1)) & 1,
                            (m >> (rb - 1)) & 1,
                            (m >> (rc - 1)) & 1,
                            ia, ib, ic,
                            pl, pr, pll, plr, prl, prr,
                            *ws,
                        )
                        v1 = _v(
                            (m1 >> (ra - 1)) & 1,
                            (m1 >> (rb - 1)) & 1,
                            (m1 >> (rc - 1)) & 1,
                            ia, ib, ic,
                            pl, pr, pll, plr, prl, prr,
                            *ws,
                        )
                        p6 += math.floor(
                            (coef * (v1 - v0)) * eta * 1000000.0 + 0.5
                        )
                    phis[f] = p6
                out[(iA, iB, iC)] = phis
    return out


# --- generated DuckDB oracle -------------------------------------------------


def _v_sql(bA: str, bB: str, bC: str) -> str:
    """The :func:`_v` template with membership bits as SQL integer
    expressions — same parenthesization, token for token."""
    fa_l = f"(CASE WHEN {bA} = 1 THEN ia ELSE pl END)"
    fa_r = f"(CASE WHEN {bA} = 1 THEN (1.0 - ia) ELSE pr END)"
    gb_l = f"(CASE WHEN {bB} = 1 THEN ib ELSE pll END)"
    gb_r = f"(CASE WHEN {bB} = 1 THEN (1.0 - ib) ELSE plr END)"
    gc_l = f"(CASE WHEN {bC} = 1 THEN ic ELSE prl END)"
    gc_r = f"(CASE WHEN {bC} = 1 THEN (1.0 - ic) ELSE prr END)"
    return (
        f"(({fa_l} * ((({gb_l} * wll)) + (({gb_r} * wlr))))"
        f" + ({fa_r} * ((({gc_l} * wrl)) + (({gc_r} * wrr)))))"
    )


def gbt_shap_sql(
    fv_sql: str,
    features: tuple[str, ...] = SCORE_FEATURES,
    rounds: int = GBT_ROUNDS,
    bins: int = GBT_BINS,
    lam: float = GBT_LAMBDA,
    eta: float = GBT_ETA,
) -> str:
    """Complete oracle for q_gbt_shap: re-train via the unrolled
    rounds, derive each tree's covers from its nod/sides frames, run
    the identical subset enumeration relationally (uniq ranks →
    masks → membership bits → the :func:`_v_sql` template), micro-
    floor each term, and aggregate mean φ / mean |φ| per (risk band,
    feature) over the full feature grid."""
    parts, _ = _shap_cte_parts(fv_sql, features, rounds, bins, lam, eta)
    fvals = ", ".join(f"({i}, '{f}')" for i, f in enumerate(features))
    mean_phi = _R6.format(c="CAST(sum(p6) AS DOUBLE) / count(*) / 1000000.0")
    mean_abs = _R6.format(c="CAST(sum(abs(p6)) AS DOUBLE) / count(*) / 1000000.0")
    cte_block = ",\n    ".join(parts)
    return f"""WITH {cte_block},
    grid AS (
      SELECT b.risk_label, fe.fname,
             coalesce(p.p6, 0) AS p6
      FROM banded b CROSS JOIN (VALUES {fvals}) fe(fidx, fname)
      LEFT JOIN phis p ON p.o_orderkey = b.o_orderkey AND p.fidx = fe.fidx
    )
    SELECT risk_label, fname AS feature, count(*) AS n,
           {mean_phi} AS mean_phi, {mean_abs} AS mean_abs_phi
    FROM grid GROUP BY 1, 2"""


def _shap_cte_parts(
    fv_sql: str,
    features: tuple[str, ...] = SCORE_FEATURES,
    rounds: int = GBT_ROUNDS,
    bins: int = GBT_BINS,
    lam: float = GBT_LAMBDA,
    eta: float = GBT_ETA,
) -> tuple[list[str], str]:
    """(cte parts, final rows cte): everything through the per-row
    per-feature φ6 table (``phis``) and the score banding (``banded``)
    — shared by the band-mean and top-feature oracles."""
    ctes, rows_k = _gbt_ctes(fv_sql, features, rounds, bins, lam, eta)
    parts = [ctes]
    phi_arms = []
    for t in range(1, rounds + 1):
        parts.append(
            f"covs{t} AS MATERIALIZED (SELECT "
            f"CAST((SELECT count(*) FROM nod{t} WHERE node = 0) AS DOUBLE) / "
            f"CAST((SELECT count(*) FROM nod{t}) AS DOUBLE) AS pl, "
            f"CAST((SELECT count(*) FROM nod{t} WHERE node = 1) AS DOUBLE) / "
            f"CAST((SELECT count(*) FROM nod{t}) AS DOUBLE) AS pr, "
            f"CAST((SELECT count(*) FROM sides{t} WHERE node = 0 AND side = 0) AS DOUBLE) / "
            f"CAST((SELECT count(*) FROM nod{t} WHERE node = 0) AS DOUBLE) AS pll, "
            f"CAST((SELECT count(*) FROM sides{t} WHERE node = 0 AND side = 1) AS DOUBLE) / "
            f"CAST((SELECT count(*) FROM nod{t} WHERE node = 0) AS DOUBLE) AS plr, "
            f"CAST((SELECT count(*) FROM sides{t} WHERE node = 1 AND side = 0) AS DOUBLE) / "
            f"CAST((SELECT count(*) FROM nod{t} WHERE node = 1) AS DOUBLE) AS prl, "
            f"CAST((SELECT count(*) FROM sides{t} WHERE node = 1 AND side = 1) AS DOUBLE) / "
            f"CAST((SELECT count(*) FROM nod{t} WHERE node = 1) AS DOUBLE) AS prr)"
        )
        parts.append(
            f"struct{t} AS MATERIALIZED (SELECT "
            f"(SELECT fidx FROM best1_{t}) AS fa, "
            f"(SELECT bin FROM best1_{t}) AS ba, "
            f"(SELECT fidx FROM best2_{t} WHERE node = 0) AS fb, "
            f"(SELECT bin FROM best2_{t} WHERE node = 0) AS bb, "
            f"(SELECT fidx FROM best2_{t} WHERE node = 1) AS fc, "
            f"(SELECT bin FROM best2_{t} WHERE node = 1) AS bc, "
            f"(SELECT w FROM leafw{t} WHERE node = 0 AND side = 0) AS wll, "
            f"(SELECT w FROM leafw{t} WHERE node = 0 AND side = 1) AS wlr, "
            f"(SELECT w FROM leafw{t} WHERE node = 1 AND side = 0) AS wrl, "
            f"(SELECT w FROM leafw{t} WHERE node = 1 AND side = 1) AS wrr)"
        )
        parts.append(
            f"uniq{t} AS MATERIALIZED (SELECT f AS fidx, "
            f"CAST(row_number() OVER (ORDER BY f) AS INTEGER) AS rk, "
            f"CAST(count(*) OVER () AS INTEGER) AS u FROM "
            f"(SELECT fa AS f FROM struct{t} UNION "
            f"SELECT fb FROM struct{t} UNION SELECT fc FROM struct{t}) uf)"
        )
        parts.append(
            f"rks{t} AS MATERIALIZED (SELECT "
            f"(SELECT rk FROM uniq{t} un, struct{t} s WHERE un.fidx = s.fa) AS ra, "
            f"(SELECT rk FROM uniq{t} un, struct{t} s WHERE un.fidx = s.fb) AS rb, "
            f"(SELECT rk FROM uniq{t} un, struct{t} s WHERE un.fidx = s.fc) AS rc)"
        )
        parts.append(
            f"ind{t} AS MATERIALIZED (SELECT sa.o_orderkey, "
            f"CASE WHEN sa.bin <= st.ba THEN 1.0 ELSE 0.0 END AS ia, "
            f"CASE WHEN sb.bin <= st.bb THEN 1.0 ELSE 0.0 END AS ib, "
            f"CASE WHEN sc.bin <= st.bc THEN 1.0 ELSE 0.0 END AS ic "
            f"FROM struct{t} st "
            f"JOIN st{t} sa ON sa.fidx = st.fa "
            f"JOIN st{t} sb ON sb.o_orderkey = sa.o_orderkey AND sb.fidx = st.fb "
            f"JOIN st{t} sc ON sc.o_orderkey = sa.o_orderkey AND sc.fidx = st.fc)"
        )
        parts.append(
            f"pm{t} AS MATERIALIZED (SELECT un.fidx, un.rk, un.u, mm.m "
            f"FROM uniq{t} un JOIN (VALUES (0), (1), (2), (3), (4), (5), (6), (7)) "
            f"mm(m) ON mm.m < (1 << un.u) AND ((mm.m >> (un.rk - 1)) & 1) = 0)"
        )
        size = "(((p.m & 1) + ((p.m >> 1) & 1)) + ((p.m >> 2) & 1))"
        coef = (
            f"(CASE WHEN p.u = 1 THEN 1.0 WHEN p.u = 2 THEN 0.5 "
            f"ELSE (CASE {size} WHEN 0 THEN (1.0 / 3.0) "
            f"WHEN 1 THEN (1.0 / 6.0) ELSE (1.0 / 3.0) END) END)"
        )
        m1 = "(p.m | (1 << (p.rk - 1)))"
        v0 = _v_sql(
            "((p.m >> (rk.ra - 1)) & 1)",
            "((p.m >> (rk.rb - 1)) & 1)",
            "((p.m >> (rk.rc - 1)) & 1)",
        )
        v1 = _v_sql(
            f"(({m1} >> (rk.ra - 1)) & 1)",
            f"(({m1} >> (rk.rb - 1)) & 1)",
            f"(({m1} >> (rk.rc - 1)) & 1)",
        )
        parts.append(
            f"terms{t} AS (SELECT i.o_orderkey, p.fidx, "
            f"CAST(floor(({coef} * ({v1} - {v0})) * {eta!r} * 1000000.0 + 0.5) "
            f"AS BIGINT) AS t6 "
            f"FROM ind{t} i CROSS JOIN pm{t} p CROSS JOIN covs{t} "
            f"CROSS JOIN struct{t} CROSS JOIN rks{t} rk)"
        )
        parts.append(
            f"phi{t} AS MATERIALIZED (SELECT o_orderkey, fidx, "
            f"sum(t6) AS p6 FROM terms{t} GROUP BY 1, 2)"
        )
        phi_arms.append(f"SELECT * FROM phi{t}")
    parts.append(
        "phis AS MATERIALIZED (SELECT o_orderkey, fidx, sum(p6) AS p6 FROM ("
        + " UNION ALL ".join(phi_arms)
        + ") GROUP BY 1, 2)"
    )
    s = _R6.format(c="1.0 / (1.0 + exp(-f))")
    parts.append(
        f"banded AS MATERIALIZED (SELECT o_orderkey, "
        f"CASE WHEN {s} >= 0.7 THEN 'high' "
        f"WHEN {s} >= 0.4 THEN 'medium' ELSE 'low' END AS risk_label "
        f"FROM {rows_k})"
    )
    return parts, rows_k


def gbt_shap_top_sql(
    fv_sql: str,
    features: tuple[str, ...] = SCORE_FEATURES,
    rounds: int = GBT_ROUNDS,
    bins: int = GBT_BINS,
    lam: float = GBT_LAMBDA,
    eta: float = GBT_ETA,
) -> str:
    """Complete oracle for q_gbt_shap_top: per row, the feature with
    the largest |φ6| (FIRST index on ties — matching the engine's
    array_position-of-max fold), aggregated per (risk band, top
    feature) with the mean |φ| it carried when on top."""
    parts, _ = _shap_cte_parts(fv_sql, features, rounds, bins, lam, eta)
    fvals = ", ".join(f"({i}, '{f}')" for i, f in enumerate(features))
    mean_abs = _R6.format(c="CAST(sum(abs(p6)) AS DOUBLE) / count(*) / 1000000.0")
    cte_block = ",\n    ".join(parts)
    return f"""WITH {cte_block},
    grid AS (
      SELECT b.o_orderkey, b.risk_label, fe.fidx, fe.fname,
             coalesce(p.p6, 0) AS p6
      FROM banded b CROSS JOIN (VALUES {fvals}) fe(fidx, fname)
      LEFT JOIN phis p ON p.o_orderkey = b.o_orderkey AND p.fidx = fe.fidx
    ),
    ranked AS (
      SELECT risk_label, fname, p6,
             row_number() OVER (PARTITION BY o_orderkey
                                ORDER BY abs(p6) DESC, fidx) AS rn
      FROM grid
    )
    SELECT risk_label, fname AS top_feature, count(*) AS n,
           {mean_abs} AS mean_abs_phi
    FROM ranked WHERE rn = 1 GROUP BY 1, 2"""


def shap_phi_columns(
    trees: list[dict],
    tables: list[dict[tuple[int, int, int], dict[int, int]]],
    features: tuple[str, ...] = SCORE_FEATURES,
    scales: dict[str, float] | None = None,
    bins: int = GBT_BINS,
) -> list:
    """Per-feature φ6 Spark columns for a fitted ensemble, given the
    precomputed per-(tree, branch-pattern) tables (:func:`shap_terms`
    over training covers): pure CASE literals on the row's bin
    comparisons — row-local and STATELESS, so the same columns score
    batch frames and streaming micro-batches identically
    (streaming/scoring.explain_stream rides them inside ingest)."""
    from pyspark.sql import functions as F

    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.training import _x_sql

    # r16 (guide §1 driver-overhead rule): the CASE cascade was built
    # as hundreds of individual py4j when()/&/~ calls per query (~1 s
    # of measured driver time); rendering the SAME expression as SQL
    # text and parsing it with one F.expr per (tree, feature) keeps the
    # plan and values identical (the bin text below is byte-for-byte
    # _bin_sql / the oracle's binning; NOT/AND mirror ~/& null
    # semantics).
    def bsql(fidx: int) -> str:
        return (
            f"CAST(least(greatest(floor(({_x_sql(features[fidx], scales)})"
            f" * {float(bins)!r}), 0), {bins - 1}) AS BIGINT)"
        )

    cols = []
    for fidx in range(len(features)):
        col = F.lit(0).cast("long")
        for t, tr in enumerate(trees):
            if fidx not in {tr["root"][0], tr["left"][0], tr["right"][0]}:
                continue
            rf, rb = tr["root"]
            lf, lb = tr["left"]
            rrf, rrb = tr["right"]
            i_a = f"({bsql(rf)} <= {int(rb)})"
            i_b = f"({bsql(lf)} <= {int(lb)})"
            i_c = f"({bsql(rrf)} <= {int(rrb)})"
            arms = []
            for (a, b, c), phis in tables[t].items():
                cond = " AND ".join(
                    ind if on else f"(NOT {ind})"
                    for ind, on in ((i_a, a), (i_b, b), (i_c, c))
                )
                arms.append(
                    f"WHEN {cond} THEN CAST({int(phis.get(fidx, 0))} AS BIGINT)"
                )
            col = col + F.expr(
                "CASE " + " ".join(arms) + " ELSE CAST(0 AS BIGINT) END"
            )
        cols.append(col)
    return cols
