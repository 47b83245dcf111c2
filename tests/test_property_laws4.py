"""Property-based law tests, batch 4: the in-warehouse scoring
compilation claims and the dataset-assembly operators.

The scoring module's headline claim is that a model spec (logistic
weights, depth-2 tree ensemble) compiles to a Catalyst expression that
is bit-identical to evaluating the spec directly — these tests walk
`tree_spec`/`weight` in plain Python (NOT via the module's own pandas
UDF, which shares code) and compare logits exactly; sigmoids compare
after det_round(·, 6), the engine's published form (libm exp is not
correctly rounded across runtimes).
Dataset-assembly laws: stratified_sample is a pure md5 threshold
function of (id, class); pack_sequences' closed-form window really is
the stream-offset walk.
"""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=10,
    derandomize=True,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# --- logistic score: Catalyst expression == spec ---------------------------

feature_rows = st.lists(
    st.tuples(
        st.floats(0, 13, allow_nan=False),   # amount_log
        st.integers(0, 4),                   # tier_encoded
        st.integers(0, 1),                   # acctbal_neg
        st.integers(0, 5),                   # segment_encoded
        st.integers(1, 7),                   # order_dow
        st.integers(1, 12),                  # order_month
        st.integers(0, 1),                   # is_weekend
        st.integers(0, 1),                   # is_urgent
    ),
    min_size=1,
    max_size=8,
)


def _mk_features_df(spark, rows):
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.scoring import SCORE_FEATURES

    data = [(i, *r) for i, r in enumerate(rows)]
    schema = "row_id LONG, amount_log DOUBLE, " + ", ".join(
        f"{f} INT" for f in SCORE_FEATURES[1:]
    )
    return spark.createDataFrame(data, schema)


def _r6(x: float) -> float:
    """det_round twin: the engine's portable 6-digit rounding."""
    return math.floor(x * 1e6 + 0.5) / 1e6


@given(rows=feature_rows)
@SETTINGS
def test_logistic_score_expr_equals_spec(spark, rows):
    """logit_expr == BIAS + Σ weight(f)·x evaluated in plain Python
    with the same md5-seeded weights and the same left-to-right
    accumulation order — bit-identical, for ANY in-range feature
    vector. The sigmoid is compared only after det_round(·, 6), the
    form score_batch actually publishes: libm exp() is not correctly
    rounded, so JVM and CPython may differ in the last ULP (which is
    exactly why the engine rounds scores before exposing them)."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.scoring import (
        BIAS,
        SCORE_FEATURES,
        logit_expr,
        score_expr,
        weight,
    )
    from real_time_fraud_revenue_intelligence_lakehouse_spark.functions.scalars import det_round

    df = _mk_features_df(spark, rows)
    got = {
        r["row_id"]: (r["z"], r["p"])
        for r in df.select(
            "row_id",
            logit_expr().alias("z"),
            det_round(score_expr(), 6).alias("p"),
        ).collect()
    }
    want = {}
    for i, r in enumerate(rows):
        z = float(BIAS)
        for f, x in zip(SCORE_FEATURES, r):
            z = z + weight(f) * float(x)
        want[i] = (z, _r6(1.0 / (1.0 + math.exp(-z))))
    assert got == want


# --- GBT ensemble: nested CASE compilation == walking the tree specs -------


@given(rows=feature_rows, n_trees=st.integers(1, 8))
@SETTINGS
def test_gbt_score_expr_equals_tree_walk(spark, rows, n_trees):
    """gbt_logit_expr == a Python walk of the tree_spec dicts (root
    split → child split → leaf, strict <, trees summed in order after
    the bias) — proving the nested-CASE compilation implements the
    spec exactly, including boundary rows sitting ON a threshold. The
    sigmoid is compared det_round(·, 6)-ed (libm exp ULP caveat, see
    the logistic test)."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.scoring import (
        GBT_BIAS,
        SCORE_FEATURES,
        gbt_logit_expr,
        gbt_score_expr,
        tree_spec,
    )
    from real_time_fraud_revenue_intelligence_lakehouse_spark.functions.scalars import det_round

    df = _mk_features_df(spark, rows)
    got = {
        r["row_id"]: (r["z"], r["p"])
        for r in df.select(
            "row_id",
            gbt_logit_expr(n_trees=n_trees).alias("z"),
            det_round(gbt_score_expr(n_trees=n_trees), 6).alias("p"),
        ).collect()
    }

    def walk(spec: dict, x: dict) -> float:
        fr, tr = spec["root"]
        if x[fr] < tr:
            fl, tl = spec["left"]
            return spec["leaves"][0] if x[fl] < tl else spec["leaves"][1]
        frr, trr = spec["right"]
        return spec["leaves"][2] if x[frr] < trr else spec["leaves"][3]

    want = {}
    for i, r in enumerate(rows):
        x = {f: float(v) for f, v in zip(SCORE_FEATURES, r)}
        z = float(GBT_BIAS)
        for t in range(n_trees):
            z = z + walk(tree_spec(t), x)
        want[i] = (z, _r6(1.0 / (1.0 + math.exp(-z))))
    assert got == want


# --- stratified_sample == md5 threshold twin -------------------------------


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 500), st.sampled_from("abc")),
        min_size=0,
        max_size=20,
    ),
    fa=st.integers(0, 100),
    fb=st.integers(0, 100),
)
@SETTINGS
def test_stratified_sample_equals_md5_twin(spark, rows, fa, fb):
    """stratified_sample keeps EXACTLY the rows whose md5 bucket (of
    10k) is under their class's threshold: membership is a pure
    function of (id, class) — reproducible across reruns, engines,
    and appends — and unlisted classes are always dropped."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.sampling import stratified_sample

    fractions = {"a": fa / 100.0, "b": fb / 100.0}  # class "c" unlisted
    df = (
        spark.createDataFrame(rows, "doc_id INT, cls STRING")
        if rows
        else spark.createDataFrame([], "doc_id INT, cls STRING")
    )
    got = sorted(
        (r["doc_id"], r["cls"])
        for r in stratified_sample(df, "cls", fractions, id_col="doc_id").collect()
    )

    def bucket(i: int) -> int:
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 10_000

    want = sorted(
        (i, c)
        for i, c in rows
        if c in fractions and bucket(i) < int(fractions[c] * 10_000)
    )
    assert got == want


# --- pack_sequences closed form == the stream-offset walk ------------------


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 12)), min_size=0, max_size=15
    ),
    budget=st.integers(1, 8),
)
@SETTINGS
def test_pack_sequences_equals_stream_walk(spark, rows, budget):
    """pack_sequences' one-window closed form floor((cumsum-n)/budget)
    equals the definitional stream walk: concatenate documents in
    order (tokens capped at budget) and shard the stream at budget
    boundaries — a document lands in the pack where its first token
    falls. Zero-token docs and over-budget docs (capped) included."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.sampling import pack_sequences

    data = [(g, i, n) for i, (g, n) in enumerate(rows)]
    df = (
        spark.createDataFrame(data, "grp INT, doc_id INT, ntok INT")
        if data
        else spark.createDataFrame([], "grp INT, doc_id INT, ntok INT")
    )
    got = {
        (r["grp"], r["doc_id"]): r["pack_id"]
        for r in pack_sequences(
            df, "ntok", budget, group_cols=["grp"], order_col="doc_id"
        ).collect()
    }
    want = {}
    for g in {g for g, _, _ in data}:
        offset = 0
        for gg, i, n in sorted(data, key=lambda t: t[1]):
            if gg != g:
                continue
            want[(g, i)] = offset // budget
            offset += min(n, budget)
    assert got == want
