"""Dataset-assembly operators: split stability, stratified fractions,
and greedy-packing invariants (the properties the SQL oracle can't
express)."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.sampling import (
    greedy_pack_sequences,
    hash_split,
    stratified_sample,
)


def test_hash_split_is_append_stable(spark):
    """Adding documents must never move an existing doc's split."""
    small = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(small).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(big).collect()}
    assert all(b[k] == v for k, v in a.items())
    # and roughly the right proportions on the larger set
    from collections import Counter

    c = Counter(b.values())
    assert 700 < c["train"] < 900 and 50 < c["val"] < 160 and 50 < c["test"] < 160


def test_stratified_fractions_are_respected(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(2000)], "doc_id LONG, lang STRING"
    )
    kept = stratified_sample(df, "lang", {"en": 0.25, "de": 1.0})
    counts = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["de"] == 1000          # fraction 1.0 keeps everything
    assert 180 < counts["en"] < 330      # ≈250 of 1000


def test_greedy_packing_invariants(spark):
    rows = [(i, "g", n) for i, n in enumerate([100, 200, 300, 512, 600, 50, 462, 1])]
    df = spark.createDataFrame(rows, "doc_id LONG, grp STRING, n_tokens LONG")
    packed = greedy_pack_sequences(df, "n_tokens", 512, group_col="grp").collect()
    assert len(packed) == len(rows)                      # every doc assigned
    by_pack: dict[int, list] = {}
    for r in packed:
        by_pack.setdefault(r["pack_id"], []).append(r)
    for pid, docs in by_pack.items():
        total = sum(d["n_tokens"] for d in docs)
        if total > 512:                                  # only singleton overflow
            assert len(docs) == 1 and docs[0]["n_tokens"] >= 512, (pid, docs)
    # deterministic across runs
    again = greedy_pack_sequences(df, "n_tokens", 512, group_col="grp").collect()
    assert sorted((r["doc_id"], r["pack_id"]) for r in packed) == sorted(
        (r["doc_id"], r["pack_id"]) for r in again
    )
    # contiguity: docs in a pack are consecutive in doc_id order
    for docs in by_pack.values():
        ids = sorted(d["doc_id"] for d in docs)
        assert ids == list(range(ids[0], ids[-1] + 1))
