"""Exact TreeSHAP for the depth-3 booster — ext/shap.py generalized
to heap trees.

ext/shap.py's closed form enumerates the ≤ 2³ subsets of a depth-2
tree's ≤ 3 unique features; this module runs the SAME construction
over ext/gbt_deep.py's heap-indexed depth-3 trees: 7 internal nodes,
≤ 7 unique features, ≤ 2⁷ = 128 subsets, and per row a 7-bit branch
PATTERN (one indicator per internal node) instead of 3. The
conditional expectation is the identical cover-weighted descent —

    v(S) = Σ_leaves w_leaf · Π_path factor(node, S)
    factor = [player(node) ∈ S] → the row's branch indicator (0/1)
             [player(node) ∉ S] → cover(child)/cover(node)

— evaluated in ONE fixed parenthesization written identically in
driver Python (:func:`_v_deep`) and generated DuckDB SQL
(:func:`_v_deep_sql`), so every double matches bit-for-bit and the
whole artifact hash-gates. Shapley coefficients are the exact
factorial ratio |S|!·(u−|S|−1)!/u! computed once in Python and
emitted as repr-literals into the SQL (both sides read the same
double). Terms micro-floor independently before any aggregation
(the q_gbt_importance discipline), so per-row φ values are integer
micros and order-independent on any layout.

Per-row cost: the 7 indicators ride the scoring scan; φ per feature
is one element_at into a 128-literal array indexed by the row's
pattern (per tree, per feature-in-tree) — row-local, stateless, zero
joins. Covers come from ONE 14-sums-per-tree count aggregate. At
100 TB the explanation is still a codegen projection plus a
(band, feature) rollup.

Additivity Σ_f φ_f = v(full) − v(∅) per (tree, pattern) is pinned
EXACTLY in Fractions against an independent brute-force Shapley
replay over the 7-player game (tests/test_shap_deep.py).

Cites: reference `ml/models/fraud_detector.py:185-191` (explain,
shap.TreeExplainer over the fitted XGBoost, whose max_depth the
study sweeps 3-9 at :258) — semantics reproduced, execution
re-architected.
"""

from __future__ import annotations

import math

from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.gbt import (
    GBT_BINS,
    GBT_ETA,
    GBT_LAMBDA,
    GBT_ROUNDS,
    _R6,
)
from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.gbt_deep import (
    GBT_DEPTH,
    _gbt_deep_ctes,
)
from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.scoring import SCORE_FEATURES

#: heap layout of a depth-3 tree
INTERNAL = tuple(range(1, 8))  # nodes 1..7
LEAVES = tuple(range(8, 16))  # nodes 8..15


def shap_coef(u: int, size: int) -> float:
    """|S|!·(u−|S|−1)!/u! as the exact double both engines read —
    Python true division of exact integers is correctly rounded, and
    the SQL carries repr() of this very value."""
    return math.factorial(size) * math.factorial(u - size - 1) / math.factorial(u)


def _v_deep(
    bits: dict[int, int],
    inds: dict[int, float],
    ps: dict[int, float],
    ws: dict[int, float],
) -> float:
    """Cover-weighted conditional expectation of one depth-3 tree for
    one membership pattern — the EXACT parenthesization
    :func:`_v_deep_sql` emits."""

    def L(k: int) -> float:
        return inds[k] if bits[k] == 1 else ps[2 * k]

    def R(k: int) -> float:
        return (1.0 - inds[k]) if bits[k] == 1 else ps[2 * k + 1]

    return (
        L(1)
        * (
            (L(2) * ((L(4) * ws[8]) + (R(4) * ws[9])))
            + (R(2) * ((L(5) * ws[10]) + (R(5) * ws[11])))
        )
    ) + (
        R(1)
        * (
            (L(3) * ((L(6) * ws[12]) + (R(6) * ws[13])))
            + (R(3) * ((L(7) * ws[14]) + (R(7) * ws[15])))
        )
    )


def deep_covers_ratios(covers: dict[int, int]) -> dict[int, float]:
    """child → cover(child)/cover(parent) as the same float division
    text the SQL writes (CAST(c AS DOUBLE) / CAST(p AS DOUBLE))."""
    return {
        c: float(covers[c]) / float(covers[c // 2])
        for c in list(range(2, 16))
    }


def shap_terms_deep(
    tree: dict, covers: dict[int, int], eta: float = GBT_ETA
) -> dict[int, dict[int, int]]:
    """Per 7-bit branch pattern → {fidx: φ6} integer micros for ONE
    fitted depth-3 tree. Pattern bit k−1 is node k's indicator
    (pattern = Σ i_k · 2^(k−1), heap order). Ranks are 1-based over
    the tree's unique split features in ascending fidx order (the
    SQL's row_number ORDER BY fidx); coincident features share one
    Shapley player by construction."""
    splits = tree["splits"]
    ws = {leaf: float(w) for leaf, w in tree["leaves"].items()}
    ps = deep_covers_ratios(covers)
    uniq = sorted({splits[k][0] for k in INTERNAL})
    u = len(uniq)
    rank = {f: i + 1 for i, f in enumerate(uniq)}
    node_rank = {k: rank[splits[k][0]] for k in INTERNAL}
    out: dict[int, dict[int, int]] = {}
    for pattern in range(128):
        inds = {k: float((pattern >> (k - 1)) & 1) for k in INTERNAL}
        phis: dict[int, int] = {}
        for f in uniq:
            rf = rank[f]
            p6 = 0
            for m in range(1 << u):
                if (m >> (rf - 1)) & 1:
                    continue
                size = bin(m).count("1")
                coef = shap_coef(u, size)
                m1 = m | (1 << (rf - 1))
                bits0 = {k: (m >> (node_rank[k] - 1)) & 1 for k in INTERNAL}
                bits1 = {k: (m1 >> (node_rank[k] - 1)) & 1 for k in INTERNAL}
                v0 = _v_deep(bits0, inds, ps, ws)
                v1 = _v_deep(bits1, inds, ps, ws)
                p6 += math.floor((coef * (v1 - v0)) * eta * 1000000.0 + 0.5)
            phis[f] = p6
        out[pattern] = phis
    return out


def deep_pattern_expr(tree: dict, features: tuple[str, ...],
                      scales: dict[str, float] | None = None,
                      bins: int = GBT_BINS):
    """The row's 7-bit branch pattern over RAW feature columns."""
    from pyspark.sql import functions as F

    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.gbt import _bin_expr

    pat = F.lit(0)
    for k in INTERNAL:
        fidx, b = tree["splits"][k]
        ind = (_bin_expr(features[fidx], scales, bins) <= b).cast("int")
        pat = pat + ind * F.lit(1 << (k - 1))
    return pat


def deep_shap_phi_columns(
    trees: list[dict],
    tables: list[dict[int, dict[int, int]]],
    features: tuple[str, ...] = SCORE_FEATURES,
    scales: dict[str, float] | None = None,
    bins: int = GBT_BINS,
) -> list:
    """Per-feature φ6 Spark columns for the fitted deep ensemble:
    per (tree, feature-in-tree) one element_at into a 128-literal
    array indexed by the row's staged pattern — row-local, stateless
    (the shap_phi_columns discipline, array-indexed instead of
    CASE-cascaded because the pattern space is 16× wider)."""
    from pyspark.sql import functions as F

    # r16 (guide §1 driver-overhead rule): the 128-literal arrays were
    # built as 128 individual F.lit() py4j calls per (tree, feature) —
    # ~2700 driver round-trips ≈ 1.9 s of build time per query. One
    # F.expr over the rendered integer list parses the identical
    # literal array in a single call (same plan, same values).
    pats = [deep_pattern_expr(tr, features, scales, bins) for tr in trees]
    cols = []
    for fidx in range(len(features)):
        col = F.lit(0).cast("long")
        for t, tr in enumerate(trees):
            tree_feats = {tr["splits"][k][0] for k in INTERNAL}
            if fidx not in tree_feats:
                continue
            arr = F.expr(
                "array("
                + ",".join(str(int(tables[t][p].get(fidx, 0))) for p in range(128))
                + ")"
            )
            col = col + F.element_at(arr, pats[t] + F.lit(1)).cast("long")
        cols.append(col.alias(f"phi6_{features[fidx]}"))
    return cols


# --- generated DuckDB oracle ---------------------------------------------------


def _v_deep_sql(bit: dict[int, str]) -> str:
    """The :func:`_v_deep` template with membership bits as SQL
    integer expressions — same parenthesization, token for token.
    Reads i1..i7 (indicators), p2..p15 (cover ratios), w8..w15."""

    def L(k: int) -> str:
        return f"(CASE WHEN {bit[k]} = 1 THEN i{k} ELSE p{2 * k} END)"

    def R(k: int) -> str:
        return f"(CASE WHEN {bit[k]} = 1 THEN (1.0 - i{k}) ELSE p{2 * k + 1} END)"

    return (
        f"(({L(1)} * (({L(2)} * (({L(4)} * w8) + ({R(4)} * w9)))"
        f" + ({R(2)} * (({L(5)} * w10) + ({R(5)} * w11)))))"
        f" + ({R(1)} * (({L(3)} * (({L(6)} * w12) + ({R(6)} * w13)))"
        f" + ({R(3)} * (({L(7)} * w14) + ({R(7)} * w15))))))"
    )


def _coef_deep_sql() -> str:
    """CASE over (u, |S|) emitting the exact repr-literals of
    :func:`shap_coef` — both engines read the same doubles."""
    arms = []
    for u in range(1, 8):
        inner = " ".join(
            f"WHEN {s} THEN {shap_coef(u, s)!r}" for s in range(u)
        )
        size = " + ".join(f"((p.m >> {i}) & 1)" for i in range(7))
        arms.append(f"WHEN {u} THEN (CASE ({size}) {inner} END)")
    return "(CASE p.u " + " ".join(arms) + " END)"


def gbt_shap_deep_sql(
    fv_sql: str,
    features: tuple[str, ...] = SCORE_FEATURES,
    rounds: int = GBT_ROUNDS,
    bins: int = GBT_BINS,
    lam: float = GBT_LAMBDA,
    eta: float = GBT_ETA,
    depth: int = GBT_DEPTH,
) -> str:
    """Complete oracle for q_gbt_shap_deep: re-train the depth-3
    booster via the unrolled deep rounds, derive every node's cover
    from the chain's nd/sd frames, run the identical subset
    enumeration relationally (uniq ranks → 128 masks → membership
    bits → the :func:`_v_deep_sql` template with repr-literal
    coefficients), micro-floor each term, and aggregate mean φ /
    mean |φ| per (risk band, feature)."""
    assert depth == 3, "the deep SHAP closed form is written for depth 3"
    ctes, rows_k = _gbt_deep_ctes(fv_sql, features, rounds, bins, lam, eta, depth)
    parts = [ctes]
    phi_arms = []
    for t in range(1, rounds + 1):
        # covers: level frames nd{t}_0 (node 1), nd{t}_1 (2,3),
        # nd{t}_2 (4..7); leaves 8..15 = sd{t}.node*2+side
        ratio = []
        for c in (2, 3):
            ratio.append(
                f"CAST((SELECT count(*) FROM nd{t}_1 WHERE node = {c}) AS DOUBLE) / "
                f"CAST((SELECT count(*) FROM nd{t}_0) AS DOUBLE) AS p{c}"
            )
        for c in (4, 5, 6, 7):
            ratio.append(
                f"CAST((SELECT count(*) FROM nd{t}_2 WHERE node = {c}) AS DOUBLE) / "
                f"CAST((SELECT count(*) FROM nd{t}_1 WHERE node = {c // 2}) AS DOUBLE) AS p{c}"
            )
        for leaf in LEAVES:
            parent, side = leaf // 2, leaf % 2
            ratio.append(
                f"CAST((SELECT count(*) FROM sd{t} WHERE node = {parent} "
                f"AND side = {side}) AS DOUBLE) / "
                f"CAST((SELECT count(*) FROM nd{t}_2 WHERE node = {parent}) AS DOUBLE) AS p{leaf}"
            )
        parts.append(f"covs{t} AS MATERIALIZED (SELECT " + ", ".join(ratio) + ")")
        node_src = {1: (f"b{t}_0", 1)}
        for k in (2, 3):
            node_src[k] = (f"b{t}_1", k)
        for k in (4, 5, 6, 7):
            node_src[k] = (f"b{t}_2", k)
        struct_cols = []
        for k in INTERNAL:
            tbl, node = node_src[k]
            struct_cols.append(
                f"(SELECT fidx FROM {tbl} WHERE node = {node}) AS f{k}"
            )
            struct_cols.append(
                f"(SELECT bin FROM {tbl} WHERE node = {node}) AS b{k}"
            )
        for leaf in LEAVES:
            parent, side = leaf // 2, leaf % 2
            struct_cols.append(
                f"(SELECT w FROM lw{t} WHERE node = {parent} AND side = {side}) AS w{leaf}"
            )
        parts.append(
            f"struct{t} AS MATERIALIZED (SELECT " + ", ".join(struct_cols) + ")"
        )
        uf = " UNION ".join(f"SELECT f{k} AS f FROM struct{t}" for k in INTERNAL)
        parts.append(
            f"uniq{t} AS MATERIALIZED (SELECT f AS fidx, "
            f"CAST(row_number() OVER (ORDER BY f) AS INTEGER) AS rk, "
            f"CAST(count(*) OVER () AS INTEGER) AS u FROM ({uf}) uf)"
        )
        rk_cols = ", ".join(
            f"(SELECT rk FROM uniq{t} un, struct{t} s WHERE un.fidx = s.f{k}) AS r{k}"
            for k in INTERNAL
        )
        parts.append(f"rks{t} AS MATERIALIZED (SELECT {rk_cols})")
        ind_cols = ", ".join(
            f"CASE WHEN s{k}.bin <= st.b{k} THEN 1.0 ELSE 0.0 END AS i{k}"
            for k in INTERNAL
        )
        ind_joins = " ".join(
            f"JOIN st{t} s{k} ON s{k}.o_orderkey = s1.o_orderkey "
            f"AND s{k}.fidx = st.f{k}"
            for k in INTERNAL
            if k != 1
        )
        parts.append(
            f"ind{t} AS MATERIALIZED (SELECT s1.o_orderkey, {ind_cols} "
            f"FROM struct{t} st JOIN st{t} s1 ON s1.fidx = st.f1 {ind_joins})"
        )
        masks = ", ".join(f"({m})" for m in range(128))
        parts.append(
            f"pm{t} AS MATERIALIZED (SELECT un.fidx, un.rk, un.u, mm.m "
            f"FROM uniq{t} un JOIN (VALUES {masks}) "
            f"mm(m) ON mm.m < (1 << un.u) AND ((mm.m >> (un.rk - 1)) & 1) = 0)"
        )
        coef = _coef_deep_sql()
        m1 = "(p.m | (1 << (p.rk - 1)))"
        v0 = _v_deep_sql(
            {k: f"((p.m >> (rk.r{k} - 1)) & 1)" for k in INTERNAL}
        )
        v1 = _v_deep_sql(
            {k: f"(({m1} >> (rk.r{k} - 1)) & 1)" for k in INTERNAL}
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
