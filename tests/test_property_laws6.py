"""Property-based law tests, batch 6: the stateful CUSUM fold and the
exact dedup tier.

The streaming CUSUM's stream==batch claim rests on one algebraic law:
folding a series segment-by-segment with carried integer state equals
one uninterrupted fold (resume-associativity) — tested in pure Python
over adversarial segmentations, then the Spark batch twin is checked
against an independent reimplementation of the integer-micros
recursion. The exact dedup tier's claims (md5 fingerprint grouping,
brute-force token-set Jaccard) get definition twins like the other
batches.
"""

from __future__ import annotations

import hashlib
import math
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=10,
    derandomize=True,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

MEAN, STD, K, H = 10.0, 4.0, 0.5, 2.0


def _cusum_py(values: list[float]) -> tuple[int, int]:
    """Independent reimplementation of the integer-micros recursion:
    dev = floor(((v-mean)/std - k)·1e6 + 0.5); s = max(0, s+dev);
    alarm whenever s > floor(h·1e6 + 0.5)."""
    h_micros = math.floor(H * 1e6 + 0.5)
    s, alarms = 0, 0
    for v in values:
        dev = math.floor(((v - MEAN) / STD - K) * 1e6 + 0.5)
        s = max(0, s + dev)
        if s > h_micros:
            alarms += 1
    return s, alarms


# --- resume-associativity: segmented fold == one-pass fold (pure Python) ---


@given(
    values=st.lists(st.floats(-50, 50, allow_nan=False), min_size=0, max_size=30),
    cuts=st.lists(st.integers(0, 30), max_size=5),
)
@SETTINGS
def test_cusum_segmented_resume_law(values, cuts):
    """_cusum_fold resumed across ANY micro-batch segmentation equals
    the uninterrupted fold — the exact law that makes the streaming
    form (state carried across micro-batches) equal the batch twin
    under in-order arrival. Pure Python: no Spark job needed to pin
    an algebraic identity."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.streaming.stateful import _cusum_fold

    whole_s, whole_alarms, whole_n = _cusum_fold(0, 0, values, MEAN, STD, K, H)

    bounds = sorted({c for c in cuts if c <= len(values)} | {0, len(values)})
    s, alarms, total_n = 0, 0, 0
    for lo, hi in zip(bounds, bounds[1:]):
        s, alarms, n = _cusum_fold(s, alarms, values[lo:hi], MEAN, STD, K, H)
        total_n += n
    assert (s, alarms, total_n) == (whole_s, whole_alarms, whole_n)
    # and the fold itself matches the independent recursion
    assert (whole_s, whole_alarms) == _cusum_py(values)


# --- Spark batch twin == the Python recursion over sorted history ----------


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),          # series key
            st.integers(0, 5),                    # ts (coarse → order ties)
            st.floats(-50, 50, allow_nan=False),  # value
        ),
        min_size=1,
        max_size=12,
    )
)
@SETTINGS
def test_running_cusum_batch_equals_python(spark, rows):
    """running_cusum_batch == the Python integer-micros recursion over
    each key's (ts, event_id)-ordered history, for ANY value series —
    including ties on ts (event_id totalizes the order) and values
    that pin s at the zero clip or storm the alarm threshold."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.streaming.stateful import running_cusum_batch

    data = [(k, ts, i, v) for i, (k, ts, v) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "event_type STRING, ts INT, event_id INT, value DOUBLE"
    )
    got = {
        r["series_key"]: (r["batch_rows"], r["total_rows"], r["s_end"], r["n_alarms"])
        for r in running_cusum_batch(df, MEAN, STD, k=K, h=H).collect()
    }
    want = {}
    for key in {k for k, _, _, _ in data}:
        mine = sorted(
            ((ts, i, v) for k, ts, i, v in data if k == key), key=lambda t: (t[0], t[1])
        )
        s, alarms = _cusum_py([v for _, _, v in mine])
        want[key] = (len(mine), len(mine), s / 1e6, alarms)
    assert got == want


# --- exact_dedup_groups == md5 fingerprint twin -----------------------------

texts_strategy = st.lists(st.text(alphabet="ab AB\t", max_size=12), min_size=1, max_size=8)


@given(texts=texts_strategy)
@SETTINGS
def test_exact_dedup_groups_equals_md5_twin(spark, texts):
    """exact_dedup_groups == grouping by md5(norm_text): canonical =
    min id per fingerprint, group_size = multiplicity, is_dup for
    every non-canonical row — for ANY texts including formatting
    variants that normalize equal (the operator's whole point)."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.dedup import exact_dedup_groups

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: (r["fp"], r["canonical_id"], r["group_size"], r["is_dup"])
        for r in exact_dedup_groups(df, "doc_id", "text").collect()
    }
    fps = {
        i: hashlib.md5(re.sub(r"\s+", " ", t).strip().lower().encode()).hexdigest()
        for i, t in enumerate(texts)
    }
    want = {}
    for i, fp in fps.items():
        members = [j for j, f in fps.items() if f == fp]
        want[i] = (fp, min(members), len(members), i != min(members))
    assert got == want


# --- jaccard_pairs == brute-force token-set twin ----------------------------


@given(texts=texts_strategy, thr_pct=st.sampled_from([20, 40, 100]))
@SETTINGS
def test_jaccard_pairs_equals_set_brute(spark, texts, thr_pct):
    """jaccard_pairs == Python set Jaccard over the same 60-bit token
    hashes, with the same |A|+|B|−|I| union arithmetic and the same
    double division — exact pair set AND exact jaccard values, for
    ANY threshold including 1.0 (exact-duplicate-only) and heavy
    containment/empty-doc shapes."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.dedup import jaccard_pairs

    thr = thr_pct / 100.0
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id LONG, text STRING")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs(df, "doc_id", "text", threshold=thr).collect()
    }

    def hset(t: str) -> set[int]:
        normed = re.sub(r"\s+", " ", t).strip().lower()
        return {
            int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
            for tok in normed.split(" ")
        }

    sets = {i: hset(t) for i, t in enumerate(texts)}
    want = {}
    for a in sets:
        for b in sets:
            if a >= b:
                continue
            inter = len(sets[a] & sets[b])
            j = inter / max(len(sets[a]) + len(sets[b]) - inter, 1)
            if j >= thr:
                want[(a, b)] = j
    assert got == want
