"""Exact depth-2 TreeSHAP (ext/shap.py).

Three laws, checked against an INDEPENDENT Fraction-exact Shapley
implementation (direct subset enumeration over feature sets with
recursive cover-weighted descent — structurally different from the
module's mask algebra):

1. Additivity (efficiency): Σ_f φ_f = v(full) − v(∅) EXACTLY in
   Fractions, for every branch pattern and every coincidence shape
   (distinct / root=child / child=child / all-same features).
2. The module's micro-floored φ6 values match the exact Shapley
   values within the term-floor bound (≤ 0.5 micro per term).
3. End-to-end: on a planted boundary the signal feature dominates
   mean |φ|, and a single-feature tree's φ is value − base.
"""

from __future__ import annotations

import math
from fractions import Fraction
from itertools import combinations

import numpy as np
import pytest

from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.gbt import GBT_ETA, train_gbt
from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.shap import shap_terms


def _v_ref(tree, covers, S, branches):
    """Independent cover-weighted conditional expectation, exact in
    Fractions: at each internal node, follow x's branch if the node's
    feature is conditioned on (∈ S), else average children by their
    training covers."""
    n, nl, nr, nll, nlr, nrl, nrr = covers
    fa = tree["root"][0]
    fb = tree["left"][0]
    fc = tree["right"][0]
    i_a, i_b, i_c = branches
    wll, wlr = Fraction(tree["w_ll"]), Fraction(tree["w_lr"])
    wrl, wrr = Fraction(tree["w_rl"]), Fraction(tree["w_rr"])
    if fb in S:
        left = wll if i_b else wlr
    else:
        left = Fraction(nll, nl) * wll + Fraction(nlr, nl) * wlr
    if fc in S:
        right = wrl if i_c else wrr
    else:
        right = Fraction(nrl, nr) * wrl + Fraction(nrr, nr) * wrr
    if fa in S:
        return left if i_a else right
    return Fraction(nl, n) * left + Fraction(nr, n) * right


def _phi_ref(tree, covers, branches):
    """Exact Shapley values per unique feature — the brute-force
    definition over feature subsets."""
    uniq = sorted({tree["root"][0], tree["left"][0], tree["right"][0]})
    u = len(uniq)
    phis = {}
    for f in uniq:
        others = [g for g in uniq if g != f]
        total = Fraction(0)
        for k in range(len(others) + 1):
            for S in combinations(others, k):
                w = Fraction(
                    math.factorial(k) * math.factorial(u - k - 1),
                    math.factorial(u),
                )
                total += w * (
                    _v_ref(tree, covers, set(S) | {f}, branches)
                    - _v_ref(tree, covers, set(S), branches)
                )
        phis[f] = total
    return phis


_COVERS = (100, 60, 40, 35, 25, 10, 30)
_WS = dict(w_ll=0.41, w_lr=-0.27, w_rl=-0.64, w_rr=0.13)

#: one tree per coincidence shape — the subset algebra must tie
#: coincident features into one Shapley player in every case
_SHAPES = {
    "distinct": dict(root=(0, 7), left=(1, 3), right=(2, 11), **_WS),
    "root_eq_right": dict(root=(0, 7), left=(1, 3), right=(0, 11), **_WS),
    "root_eq_left": dict(root=(0, 7), left=(0, 2), right=(2, 11), **_WS),
    "children_eq": dict(root=(0, 7), left=(1, 3), right=(1, 12), **_WS),
    "all_same": dict(root=(0, 7), left=(0, 2), right=(0, 11), **_WS),
}


@pytest.mark.parametrize("shape", sorted(_SHAPES))
def test_additivity_is_exact_in_fractions(shape):
    tree = _SHAPES[shape]
    for i_a in (0, 1):
        for i_b in (0, 1):
            for i_c in (0, 1):
                phis = _phi_ref(tree, _COVERS, (i_a, i_b, i_c))
                uniq = set(phis)
                full = _v_ref(tree, _COVERS, uniq, (i_a, i_b, i_c))
                base = _v_ref(tree, _COVERS, set(), (i_a, i_b, i_c))
                assert sum(phis.values()) == full - base, (shape, i_a, i_b, i_c)


@pytest.mark.parametrize("shape", sorted(_SHAPES))
def test_module_phi_matches_bruteforce_shapley(shape):
    """shap_terms' mask-algebra φ6 (micro-floored per term, scaled by
    eta) vs the independent exact Shapley values: within the floor
    bound of 0.5 micro per term (≤ 4 terms per feature)."""
    tree = _SHAPES[shape]
    table = shap_terms(tree, _COVERS, eta=GBT_ETA)
    for (i_a, i_b, i_c), phis6 in table.items():
        ref = _phi_ref(tree, _COVERS, (i_a, i_b, i_c))
        assert set(phis6) == set(ref)
        for f, p6 in phis6.items():
            exact = float(ref[f]) * GBT_ETA * 1e6
            assert abs(p6 - exact) <= 2.0 + 1e-9, (shape, (i_a, i_b, i_c), f)


def test_single_feature_tree_phi_is_value_minus_base():
    """u = 1: the lone player takes the whole deviation — φ equals
    the (eta-scaled) tree value at x minus the cover-weighted base."""
    tree = _SHAPES["all_same"]
    table = shap_terms(tree, _COVERS, eta=1.0)
    n, nl, nr, nll, nlr, nrl, nrr = _COVERS
    base = (nl / n) * ((nll / nl) * tree["w_ll"] + (nlr / nl) * tree["w_lr"]) + (
        nr / n
    ) * ((nrl / nr) * tree["w_rl"] + (nrr / nr) * tree["w_rr"])
    for (i_a, i_b, i_c), phis in table.items():
        val = (
            (tree["w_ll"] if i_b else tree["w_lr"])
            if i_a
            else (tree["w_rl"] if i_c else tree["w_rr"])
        )
        assert abs(phis[0] / 1e6 - (val - base)) < 2e-6


def test_signal_feature_dominates_attribution(spark):
    """Planted boundary (y follows x2, x1 is noise): the booster's
    mean |φ| must load on x2 — attribution finds the signal."""
    from pyspark.sql import functions as F

    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.gbt import GBT_BINS, _bin_expr

    rng = np.random.RandomState(11)
    n = 600
    x1 = rng.uniform(0, 1, n).round(4)
    x2 = rng.uniform(0, 1, n).round(4)
    flip = rng.uniform(0, 1, n) < 0.1
    y = ((x2 > 0.55) ^ flip).astype(int)
    df = spark.createDataFrame(
        [(float(a), float(b), int(v)) for a, b, v in zip(x1, x2, y)],
        "x1 double, x2 double, label int",
    )
    trees = train_gbt(df, features=("x1", "x2"), scales={})
    # covers per tree from one aggregate (the q_gbt_shap recipe)
    feats = ("x1", "x2")

    def bcol(fidx):
        return _bin_expr(feats[fidx], {}, GBT_BINS)

    mean_abs = {0: 0.0, 1: 0.0}
    for tr in trees:
        i_a = bcol(tr["root"][0]) <= tr["root"][1]
        i_b = bcol(tr["left"][0]) <= tr["left"][1]
        i_c = bcol(tr["right"][0]) <= tr["right"][1]
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(i_a.cast("long")).alias("nl"),
            F.sum((i_a & i_b).cast("long")).alias("nll"),
            F.sum(((~i_a) & i_c).cast("long")).alias("nrl"),
        ).first()
        nn, nl = int(row["n"]), int(row["nl"])
        covers = (
            nn,
            nl,
            nn - nl,
            int(row["nll"]),
            nl - int(row["nll"]),
            int(row["nrl"]),
            (nn - nl) - int(row["nrl"]),
        )
        table = shap_terms(tr, covers, eta=GBT_ETA)
        # fold |φ| over the data distribution via the branch patterns
        pat = df.select(
            i_a.cast("int").alias("a"),
            i_b.cast("int").alias("b"),
            i_c.cast("int").alias("c"),
        ).groupBy("a", "b", "c").count().collect()
        for r in pat:
            phis = table[(r["a"], r["b"], r["c"])]
            for f, p6 in phis.items():
                mean_abs[f] += abs(p6) * r["count"] / n / 1e6
    assert mean_abs[1] > 5 * max(mean_abs[0], 1e-9), mean_abs
