"""Property-based law tests, batch 3: the skew-mitigation operators'
exact-equivalence claims, the MinHash/LSH hash math, deterministic
splits, and the similarity baseline.

Same contract as batches 1-2: each test re-derives the operator's
headline claim from its *definition* in pure Python (md5 digests,
IEEE-754 fold order, textbook sorts) and checks the Spark plan
reproduces it bit-for-bit on hypothesis-generated adversarial shapes
— hot keys, tie storms, whitespace-only docs, shared band storms.
House rules: few examples, tiny rows — one Spark job per example is
the cost driver, shape adversarialism is the value.
"""

from __future__ import annotations

import hashlib
import math
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = settings(
    max_examples=10,
    derandomize=True,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _hash60_py(s: str) -> int:
    """Python twin of ext.text.hash60: md5 hex prefix, 60 bits."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def _signature_py(raw: str, k: int = 8, n: int = 3) -> tuple[int, ...]:
    """Python twin of ext.text.with_minhash for one document,
    re-derived from the definitions: norm_text (collapse ws, trim,
    lower), whitespace tokens, n-gram shingles with the whole-text
    fallback, ONE md5-60bit hash per shingle, k XOR permutations."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.text import perm_mask

    normed = re.sub(r"\s+", " ", raw).strip().lower()
    toks = normed.split(" ")  # "" -> [""], matching Spark's split
    if len(toks) >= n:
        sh = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    else:
        sh = [" ".join(toks)]
    hashes = [_hash60_py(s) for s in sh]
    return tuple(min(h ^ perm_mask(j) for h in hashes) for j in range(k))


# --- salted_agg == plain groupBy agg ---------------------------------------


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(-50, 50)), min_size=0, max_size=25
    ),
    salt=st.integers(1, 5),
)
@SETTINGS
def test_salted_agg_equals_plain_groupby(spark, rows, salt):
    """Two-phase salted aggregation is EXACTLY the plain groupBy for
    algebraic aggregates, for ANY data (including one all-hot key)
    and ANY shard count — the skew mitigation must never change the
    answer, only the shuffle shape."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.operators.skew import salted_agg

    df = (
        spark.createDataFrame(rows, "k INT, v INT")
        if rows
        else spark.createDataFrame([], "k INT, v INT")
    )
    got = {
        r["k"]: (r["n"], r["s"], r["mx"])
        for r in salted_agg(
            df,
            ["k"],
            partial=[
                (F.count(F.lit(1)), "n"),
                (F.sum("v"), "s"),
                (F.max("v"), "mx"),
            ],
            merge=[("sum", "n"), ("sum", "s"), ("max", "mx")],
            salt=salt,
        ).collect()
    }
    want = {}
    for k in {k for k, _ in rows}:
        vs = [v for kk, v in rows if kk == k]
        want[k] = (len(vs), sum(vs), max(vs))
    assert got == want


# --- salted_topk == naive top-k under the total order ----------------------


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 3)), min_size=0, max_size=15
    ),
    k=st.integers(1, 3),
)
@SETTINGS
def test_salted_topk_equals_naive_total_order(spark, rows, k):
    """salted_topk returns EXACTLY the rows and ranks of the naive
    single-window top-k under (order_cols, tiebreak ASC), for ANY
    group sizes and deliberate score-tie storms — the two-stage salt
    prune must be invisible in the result."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.operators.topk import salted_topk

    data = [(g, s, i) for i, (g, s) in enumerate(rows)]  # uid = row index
    df = (
        spark.createDataFrame(data, "grp INT, score INT, uid INT")
        if data
        else spark.createDataFrame([], "grp INT, score INT, uid INT")
    )
    got = sorted(
        (r["grp"], r["uid"], r["rk"])
        for r in salted_topk(
            df, ["grp"], [F.desc("score")], "uid", k=k, salts=3
        ).collect()
    )
    want = []
    for g in {g for g, _, _ in data}:
        mine = sorted(
            ((s, i) for gg, s, i in data if gg == g), key=lambda t: (-t[0], t[1])
        )
        want.extend((g, i, rk) for rk, (_, i) in enumerate(mine[:k], start=1))
    assert got == sorted(want)


# --- MinHash signatures == the md5/XOR definition --------------------------

texts_strategy = st.lists(
    st.text(alphabet="ab AB\t", max_size=16), min_size=1, max_size=6
)


@given(texts=texts_strategy)
@SETTINGS
def test_minhash_signature_equals_python_twin(spark, texts):
    """with_minhash's one-md5 + k-XOR-permutation signatures equal a
    Python re-derivation from the definition, for ANY text shape —
    mixed case, tab runs, whitespace-only and empty docs (whole-text
    fallback shingle). This is the 'XOR with a constant is a valid
    min-wise permutation, and both engines see identical longs' claim
    at the bit level."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.text import with_minhash

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id LONG, text STRING")
    sig = with_minhash(df, "doc_id", "text", k=8)
    got = {
        r["doc_id"]: tuple(r[f"mh{j}"] for j in range(8)) for r in sig.collect()
    }
    want = {i: _signature_py(t, k=8) for i, t in enumerate(texts)}
    assert got == want


# --- LSH candidates == pairs sharing a band, from the same signatures ------


@given(texts=texts_strategy)
@SETTINGS
def test_lsh_candidates_equals_band_twin(spark, texts):
    """lsh_candidates (uncapped) returns EXACTLY the id pairs whose
    Python-twin signatures agree on at least one aligned band of
    r = k/bands consecutive values — the banded-join blocking is pure
    set algebra over the signature table, nothing more or less.
    Low-entropy docs force shared-band storms and duplicate docs."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.dedup import lsh_candidates

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id LONG, text STRING")
    got = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidates(
            df, "doc_id", "text", k=8, bands=4, max_bucket=None
        ).collect()
    }
    sigs = {i: _signature_py(t, k=8) for i, t in enumerate(texts)}
    want = {
        (a, b)
        for a in sigs
        for b in sigs
        if a < b
        and any(sigs[a][2 * band : 2 * band + 2] == sigs[b][2 * band : 2 * band + 2] for band in range(4))
    }
    assert got == want


# --- hash_split == md5 twin; splits partition the frame --------------------


@given(
    ids=st.lists(st.integers(0, 10_000), min_size=0, max_size=20),
    train=st.integers(0, 100),
    val_frac=st.integers(0, 100),
)
@SETTINGS
def test_hash_split_equals_md5_twin(spark, ids, train, val_frac):
    """hash_split assigns EXACTLY the bucket the md5 definition gives
    — so membership is a pure function of the id (append-stable: new
    rows can never move an existing row between splits), and the
    three splits partition the frame for ANY (train, val) thresholds
    including the degenerate 0/100 corners."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.sampling import hash_split

    val = val_frac * (100 - train) // 100  # keep train+val <= 100
    df = (
        spark.createDataFrame([(i,) for i in ids], "doc_id INT")
        if ids
        else spark.createDataFrame([], "doc_id INT")
    )
    got = [(r["doc_id"], r["split"]) for r in hash_split(df, "doc_id", train, val).collect()]
    assert len(got) == len(ids)  # no row dropped or duplicated

    def twin(i: int) -> str:
        b = _hash60_py(str(i)) % 100
        return "train" if b < train else ("val" if b < train + val else "test")

    assert sorted(got) == sorted((i, twin(i)) for i in ids)


# --- brute-force cosine top-k == Python IEEE fold --------------------------

vecs_strategy = st.lists(
    st.lists(st.integers(-3, 3), min_size=3, max_size=3).filter(
        lambda v: any(x != 0 for x in v)
    ),
    min_size=2,
    max_size=6,
)


@given(vecs=vecs_strategy, k=st.integers(1, 3))
@SETTINGS
def test_brute_topk_equals_python_cosine(spark, vecs, k):
    """brute_force_topk equals a Python twin that replays the exact
    IEEE-754 evaluation order — sequential zip_with fold for the dot,
    sqrt(dot) norms, det_round's floor(x*1e6+0.5)/1e6, ties broken on
    match_id — for ANY small integer vectors (colinear pairs force
    cosine==1.0 ties; negatives force the sign path)."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.similarity import brute_force_topk

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    got = sorted(
        (r["query_id"], r["match_id"], r["cosine_sim"], r["rank"])
        for r in brute_force_topk(df, df, k=k).collect()
    )

    def fold_dot(a: list[float], b: list[float]) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    want = []
    for qi, qv in rows:
        cands = []
        for ci, cv in rows:
            if ci == qi:
                continue
            sim = fold_dot(qv, cv) / (math.sqrt(fold_dot(qv, qv)) * math.sqrt(fold_dot(cv, cv)))
            cands.append((ci, math.floor(sim * 1e6 + 0.5) / 1e6))
        cands.sort(key=lambda t: (-t[1], t[0]))
        want.extend((qi, ci, s, rk) for rk, (ci, s) in enumerate(cands[:k], start=1))
    assert got == sorted(want)
