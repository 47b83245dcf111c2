"""Exact TreeSHAP for the depth-3 booster (ext/shap_deep.py).

The test_shap.py laws generalized to 7-player games, checked against
an INDEPENDENT Fraction-exact Shapley replay over heap trees:

1. φ values match a brute-force Shapley computation (all subsets of
   the tree's unique features, cover-weighted conditional
   expectations in exact Fractions) for every branch pattern and
   several coincidence shapes, within the per-term micro-floor bound.
2. Additivity: Σ_f φ_f = v(full) − v(∅) holds EXACTLY in Fractions
   for every one of the 128 patterns.
3. The per-row pattern/array compilation reproduces the driver-side
   tables on a real fitted booster (engine law; the relational
   enumeration is gated by q_gbt_shap_deep's oracle in selfcheck).
"""

from __future__ import annotations

import math
from fractions import Fraction
from itertools import combinations

import pytest

from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.gbt import GBT_ETA
from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.shap_deep import (
    INTERNAL,
    LEAVES,
    deep_covers_ratios,
    shap_coef,
    shap_terms_deep,
)


def _v_ref(tree, covers, S, pattern):
    """Fraction-exact cover-weighted conditional expectation: at each
    internal node, follow the row's branch if the node's split
    FEATURE is in S, else weight both children by training covers."""

    def rec(node) -> Fraction:
        if node in LEAVES:
            return Fraction(tree["leaves"][node])
        fidx, _b = tree["splits"][node]
        ind = (pattern >> (node - 1)) & 1
        if fidx in S:
            return rec(2 * node) if ind == 1 else rec(2 * node + 1)
        pl = Fraction(covers[2 * node], covers[node])
        pr = Fraction(covers[2 * node + 1], covers[node])
        return pl * rec(2 * node) + pr * rec(2 * node + 1)

    return rec(1)


def _phi_ref(tree, covers, pattern):
    """Brute-force Shapley in exact Fractions over the tree's unique
    features."""
    uniq = sorted({tree["splits"][k][0] for k in INTERNAL})
    u = len(uniq)
    out = {}
    for f in uniq:
        others = [g for g in uniq if g != f]
        phi = Fraction(0)
        for r in range(len(others) + 1):
            for combo in combinations(others, r):
                S = set(combo)
                coef = Fraction(
                    math.factorial(len(S)) * math.factorial(u - len(S) - 1),
                    math.factorial(u),
                )
                phi += coef * (
                    _v_ref(tree, covers, S | {f}, pattern)
                    - _v_ref(tree, covers, S, pattern)
                )
        out[f] = phi
    return out


def _tree(splits, leaves):
    return {
        "depth": 3,
        "splits": {k: splits[k] for k in INTERNAL},
        "gains": {k: 0.0 for k in INTERNAL},
        "leaves": dict(zip(LEAVES, leaves)),
    }


#: covers: a full 2000-row frame descending unevenly
_COVERS = {1: 2000, 2: 1200, 3: 800, 4: 700, 5: 500, 6: 500, 7: 300,
           8: 400, 9: 300, 10: 350, 11: 150, 12: 320, 13: 180, 14: 220, 15: 80}

_WS = [0.8, -0.4, 0.3, -0.9, 0.5, -0.2, 0.7, -0.6]

_SHAPES = {
    # 7 distinct features: the widest game (u = 7)
    "all_distinct": _tree(
        {1: (0, 7), 2: (1, 4), 3: (2, 9), 4: (3, 2), 5: (4, 11), 6: (5, 6), 7: (6, 13)},
        _WS,
    ),
    # one feature everywhere: u = 1 (maximal coincidence)
    "all_same": _tree(
        {k: (2, 3 + k) for k in INTERNAL},
        _WS,
    ),
    # root feature repeated at two deep nodes, two other players
    "root_repeats_deep": _tree(
        {1: (1, 8), 2: (4, 5), 3: (1, 12), 4: (6, 3), 5: (1, 9), 6: (4, 10), 7: (6, 7)},
        _WS,
    ),
    # siblings coincide level-wise: 3 players, one per level
    "level_players": _tree(
        {1: (0, 7), 2: (3, 5), 3: (3, 10), 4: (5, 2), 5: (5, 8), 6: (5, 11), 7: (5, 14)},
        _WS,
    ),
}


@pytest.mark.parametrize("shape", sorted(_SHAPES))
def test_additivity_is_exact_in_fractions(shape):
    tree = _SHAPES[shape]
    uniq = {tree["splits"][k][0] for k in INTERNAL}
    for pattern in range(128):
        phis = _phi_ref(tree, _COVERS, pattern)
        full = _v_ref(tree, _COVERS, uniq, pattern)
        base = _v_ref(tree, _COVERS, set(), pattern)
        assert sum(phis.values()) == full - base, (shape, pattern)


@pytest.mark.parametrize("shape", sorted(_SHAPES))
def test_module_phi_matches_bruteforce_shapley(shape):
    """shap_terms_deep's mask-algebra φ6 (micro-floored per term,
    eta-scaled) vs the independent exact Shapley values: within the
    floor bound of 0.5 micro per term (≤ 2^(u−1) terms per feature)."""
    tree = _SHAPES[shape]
    table = shap_terms_deep(tree, _COVERS, eta=GBT_ETA)
    uniq = sorted({tree["splits"][k][0] for k in INTERNAL})
    u = len(uniq)
    bound = 0.5 * (1 << max(0, u - 1)) + 1e-9
    for pattern in (0, 1, 37, 64, 85, 127):
        ref = _phi_ref(tree, _COVERS, pattern)
        phis6 = table[pattern]
        assert set(phis6) == set(ref)
        for f, p6 in phis6.items():
            exact = float(ref[f]) * GBT_ETA * 1e6
            assert abs(p6 - exact) <= bound, (shape, pattern, f, p6, exact)


def test_coef_matches_fraction_exactly():
    for u in range(1, 8):
        for s in range(u):
            exact = Fraction(
                math.factorial(s) * math.factorial(u - s - 1), math.factorial(u)
            )
            assert shap_coef(u, s) == float(exact)


def test_covers_ratios_shape():
    ps = deep_covers_ratios(_COVERS)
    assert set(ps) == set(range(2, 16))
    # children of each node partition it
    for k in range(1, 8):
        assert _COVERS[2 * k] + _COVERS[2 * k + 1] == _COVERS[k]


def test_engine_columns_reproduce_tables_on_fitted_booster(spark):
    """Fit a real depth-3 booster, compile the pattern/array columns,
    and check each row's φ6 equals the driver-side table entry at
    that row's pattern — the engine compilation law (the relational
    oracle is gated separately by selfcheck)."""
    import numpy as np
    from pyspark.sql import functions as F

    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.gbt_deep import train_gbt_deep
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.shap_deep import (
        deep_pattern_expr,
        deep_shap_phi_columns,
    )

    rng = np.random.RandomState(5)
    n = 800
    x1 = rng.uniform(0, 1, n).round(4)
    x2 = rng.uniform(0, 1, n).round(4)
    x3 = rng.uniform(0, 1, n).round(4)
    y = (((x2 > 0.55) & (x1 > 0.3)) ^ (rng.uniform(0, 1, n) < 0.15)).astype(int)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c), int(v)) for a, b, c, v in zip(x1, x2, x3, y)],
        "x1 double, x2 double, x3 double, label int",
    )
    feats = ("x1", "x2", "x3")
    trees = train_gbt_deep(df, features=feats, scales={}, depth=3, rounds=2)
    # covers via the same indicator construction the query uses
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.gbt import GBT_BINS, _bin_expr

    aggs = [F.count(F.lit(1)).alias("n")]
    for t, tr in enumerate(trees):
        inds = {
            k: _bin_expr(feats[tr["splits"][k][0]], {}, GBT_BINS) <= tr["splits"][k][1]
            for k in INTERNAL
        }
        reach = {1: F.lit(True)}
        for k in INTERNAL:
            reach[2 * k] = reach[k] & inds[k]
            reach[2 * k + 1] = reach[k] & ~inds[k]
        for node in range(2, 16):
            aggs.append(F.sum(reach[node].cast("long")).alias(f"c{t}_{node}"))
    row = df.agg(*aggs).first()
    covers = []
    for t in range(len(trees)):
        cov = {1: int(row["n"])}
        cov.update({node: int(row[f"c{t}_{node}"]) for node in range(2, 16)})
        covers.append(cov)
    tables = [shap_terms_deep(tr, cov) for tr, cov in zip(trees, covers)]
    phis = deep_shap_phi_columns(trees, tables, feats, {})
    pats = [deep_pattern_expr(tr, feats, {}) for tr in trees]
    got = df.select(
        *[p.alias(f"pat_{t}") for t, p in enumerate(pats)], *phis
    ).collect()
    for r in got:
        for i, f in enumerate(feats):
            want = sum(
                tables[t][r[f"pat_{t}"]].get(i, 0)
                for t in range(len(trees))
                if i in {trees[t]["splits"][k][0] for k in INTERNAL}
            )
            assert r[f"phi6_{f}"] == want
