"""Property-based tests (hypothesis) for the operators whose
correctness is an algebra, not a fixture: MERGE upsert laws and the
velocity window against a brute-force Python reference.

Strategy note: one Spark job per example is expensive, so examples
are few (max_examples=10) and rows are small — the value is the
adversarial *shape* generation (dup keys, empty sides, boundary
timestamps), not volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from real_time_fraud_revenue_intelligence_lakehouse_spark.operators.merge import merge_upsert
from real_time_fraud_revenue_intelligence_lakehouse_spark.operators.velocity import (
    velocity_rangeframe,
)

SETTINGS = settings(
    max_examples=10,
    derandomize=True,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

kv_rows = st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 100)), min_size=0, max_size=12
)


@given(target=kv_rows, source=kv_rows)
@SETTINGS
def test_merge_upsert_laws(spark, target, source):
    """source wins on collision; unmatched target rows survive; no
    other rows appear; idempotent under re-merge. (Within-source dup
    keys are first reduced to one row per key, as the streaming
    foreachBatch path does.)"""
    t = spark.createDataFrame(target, "k INT, v INT") if target else spark.createDataFrame([], "k INT, v INT")
    s_rows = {k: v for k, v in source}  # latest-wins reduction
    s = (
        spark.createDataFrame(list(s_rows.items()), "k INT, v INT")
        if s_rows
        else spark.createDataFrame([], "k INT, v INT")
    )
    merged = merge_upsert(t, s, ["k"])
    # merge_upsert keeps ALL unmatched target rows (duplicate target
    # keys both survive when unmatched) — compare as multisets.
    got_rows = sorted((r["k"], r["v"]) for r in merged.collect())
    kept = [(k, v) for k, v in target if k not in s_rows]
    want_rows = sorted(list(s_rows.items()) + kept)
    assert got_rows == want_rows
    # idempotency
    again = merge_upsert(merged, s, ["k"])
    assert sorted((r["k"], r["v"]) for r in again.collect()) == got_rows


@given(
    events=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000)),  # (user, second)
        min_size=1,
        max_size=20,
        unique=True,
    )
)
@SETTINGS
def test_velocity_matches_python_reference(spark, events):
    """rangeBetween velocity == brute-force O(n²) reference: count of
    same-user events in [ts-W, ts), W=1h, strict upper bound, ties on
    equal timestamps excluded (they're not strictly prior)."""
    rows = [(i, u, s * 1000) for i, (u, s) in enumerate(events)]
    df = spark.createDataFrame(rows, "event_id INT, user_id INT, ms LONG").select(
        "event_id", "user_id", F.timestamp_millis(F.col("ms")).alias("ts")
    )
    got = {
        r["event_id"]: r["velocity_1h"]
        for r in velocity_rangeframe(df, "user_id", "ts", {"1h": 3_600_000}).collect()
    }
    for i, (u, s) in enumerate(events):
        ms = s * 1000
        want = sum(
            1
            for j, (u2, s2) in enumerate(events)
            if u2 == u and ms - 3_600_000 <= s2 * 1000 < ms
        )
        assert got[i] == want, (i, u, s)


@settings(max_examples=10, derandomize=True, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n_tokens=st.integers(min_value=0, max_value=120),
    chunk_size=st.integers(min_value=4, max_value=48),
    overlap_frac=st.floats(min_value=0.0, max_value=0.9),
)
def test_chunking_reconstruction_law(spark, n_tokens, chunk_size, overlap_frac):
    """For ANY (doc length, chunk size, overlap): chunk_documents
    covers the token stream exactly — dropping each non-first chunk's
    overlap prefix reconstructs the original tokens, every chunk is
    ≤ chunk_size, and chunk indices are dense from 0."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.text import chunk_documents

    overlap = min(int(chunk_size * overlap_frac), chunk_size - 1)
    text = " ".join(f"t{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], "doc_id LONG, text STRING")
    rows = sorted(
        (r["chunk_idx"], r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(df, "doc_id", "text", chunk_size, overlap).collect()
    )
    assert [ci for ci, _, _ in rows] == list(range(len(rows)))
    chunks = [t.split(" ") for _, _, t in rows]  # "".split(" ") == [''], matching the engine
    assert all(len(c) <= chunk_size for c in chunks)
    recon = (chunks[0] if chunks else []) + [
        tok for c in chunks[1:] for tok in c[overlap:]
    ]
    # empty text tokenizes to [''] in the engine (split of ""), so
    # compare against the same convention
    want = text.split(" ") if text else [""]
    assert recon == want
