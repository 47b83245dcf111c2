"""Tests for the LLM-pipeline extensions (dedup / similarity /
multimodal) — properties the SQL oracle can't express: LSH recall
bounds, candidate-set containment, Python-batch parity, stub seams.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_fraud_revenue_intelligence_lakehouse_spark.ext import dedup as D
from real_time_fraud_revenue_intelligence_lakehouse_spark.ext import multimodal as M
from real_time_fraud_revenue_intelligence_lakehouse_spark.ext import similarity as S


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_exact_dedup_finds_normalized_dups(spark):
    df = _docs(
        spark,
        [
            (1, "Hello   World"),
            (2, "hello world"),       # dup of 1 after normalization
            (3, "something else"),
        ],
    )
    got = {r["doc_id"]: (r["canonical_id"], r["is_dup"])
           for r in D.exact_dedup_groups(df, "doc_id", "text").collect()}
    assert got == {1: (1, False), 2: (1, True), 3: (3, False)}


def test_lsh_finds_planted_near_dups(spark):
    """MinHash-LSH must surface planted near-duplicates: 20 base docs
    (~50 tokens from a wide vocabulary) each with a 2-token-edited
    twin (shingle overlap ≈ 0.8 ⇒ per-band collision ≈ 0.6 ⇒ miss
    probability per pair ≈ 0.4⁴ ≈ 2.6%). Unrelated docs share no
    shingles, so no band collisions are expected between them."""
    import random

    rng = random.Random(42)
    vocab = [f"tok{i}" for i in range(500)]
    rows = []
    for base in range(20):
        words = [rng.choice(vocab) for _ in range(50)]
        rows.append((base * 2, " ".join(words)))
        twin = list(words)
        for _ in range(2):
            twin[rng.randrange(len(twin))] = rng.choice(vocab)
        rows.append((base * 2 + 1, " ".join(twin)))
    df = _docs(spark, rows)
    planted = {(b * 2, b * 2 + 1) for b in range(20)}
    lsh = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_lsh_pairs(df, "doc_id", "text", threshold=0.5).collect()
    }
    missed = planted - lsh
    assert len(missed) <= 2, f"LSH missed planted pairs {missed}"
    assert lsh <= planted | set(), "no false pairs should pass Jaccard verification"


def test_lsh_bucket_cap(spark):
    """A pathological bucket (many docs sharing identical boilerplate
    text → identical band keys) must be droppable via max_bucket
    WITHOUT disturbing pairs found through normal buckets: the capped
    run returns exactly the normal near-dup pairs, while the uncapped
    run additionally returns the quadratic boilerplate pairs."""
    import random

    rng = random.Random(7)
    vocab = [f"tok{i}" for i in range(500)]
    rows = []
    for base in range(10):  # normal near-dup twins in small buckets
        words = [rng.choice(vocab) for _ in range(50)]
        rows.append((base * 2, " ".join(words)))
        twin = list(words)
        twin[rng.randrange(len(twin))] = rng.choice(vocab)
        rows.append((base * 2 + 1, " ".join(twin)))
    boiler = " ".join(rng.choice(vocab) for _ in range(50))
    skew_ids = list(range(100, 120))  # 20 identical docs → one giant bucket
    rows += [(i, boiler) for i in skew_ids]
    df = _docs(spark, rows)

    uncapped = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_lsh_pairs(df, "doc_id", "text", threshold=0.5, max_bucket=None).collect()
    }
    capped = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_lsh_pairs(df, "doc_id", "text", threshold=0.5, max_bucket=10).collect()
    }
    skew = set(skew_ids)
    boiler_pairs = {(a, b) for a, b in uncapped if a in skew and b in skew}
    assert len(boiler_pairs) == 20 * 19 // 2, "uncapped run must see the quadratic bucket"
    assert capped == uncapped - boiler_pairs, "cap must drop ONLY oversized-bucket pairs"
    # the boilerplate group is still caught — by the exact tier, one shuffle
    exact = D.exact_dedup_groups(df.filter(F.col("doc_id") >= 100), "doc_id", "text")
    assert exact.filter(F.col("group_size") == 20).count() == 20


def test_rolling_hash_is_order_sensitive(spark):
    """Same token multiset, different order ⇒ different rolling hash
    (what the set-based fingerprints collapse); same text modulo
    whitespace/case ⇒ same hash."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.text import rolling_hash

    df = _docs(
        spark,
        [
            (1, "alpha beta gamma"),
            (2, "gamma beta alpha"),      # permutation of 1
            (3, "  Alpha   BETA gamma "),  # normalization variant of 1
        ],
    )
    h = {r["doc_id"]: r["rh"] for r in df.select(
        "doc_id", rolling_hash(F.col("text")).alias("rh")).collect()}
    assert h[1] != h[2]
    assert h[1] == h[3]


def test_dup_clusters_merges_transitive_chain(spark):
    """A chain a~b, b~c (a and c NOT direct near-dups) must land in
    ONE cluster labeled with the min id — transitivity is the whole
    point of the cluster pass over pairwise output."""
    base = " ".join(f"w{i}" for i in range(40))
    mid = " ".join(f"w{i}" for i in range(8, 48))     # ~0.67 overlap with both ends
    far = " ".join(f"w{i}" for i in range(16, 56))    # ~0.43 with base — below 0.5
    other = " ".join(f"x{i}" for i in range(40))
    df = _docs(spark, [(10, base), (11, mid), (12, far), (13, other)])
    pairs = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_lsh_pairs(df, "doc_id", "text", threshold=0.5).collect()
    }
    assert (10, 11) in pairs and (11, 12) in pairs and (10, 12) not in pairs, pairs
    got = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in D.dup_clusters(df, "doc_id", "text", threshold=0.5).collect()
    }
    assert got == {10: (10, 3), 11: (10, 3), 12: (10, 3)}


def test_simhash_close_for_near_dup(spark):
    df = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and again today"),
            (3, "completely different words about database engines and shuffles"),
        ],
    )
    sims = {r["doc_id"]: r["simhash"] for r in D.simhash(df, "doc_id", "text").collect()}
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(sims[1], sims[2]) < ham(sims[1], sims[3])


def test_simhash_blocked_equals_brute_force(spark, sf_dir):
    """Pigeonhole blocking is LOSSLESS: splitting 16-bit signatures
    into max_hamming+1 blocks guarantees every pair within
    max_hamming bits collides on at least one exact block, so the
    blocked join + Hamming filter must return exactly the all-pairs
    result — same pairs, same distances."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    blocked = sorted(
        tuple(r)
        for r in D.simhash_pairs(d, "doc_id", "text", max_hamming=3, sample_mod=4).collect()
    )
    brute = sorted(
        tuple(r)
        for r in D.simhash_pairs(
            d, "doc_id", "text", max_hamming=3, sample_mod=4, blocked=False
        ).collect()
    )
    assert blocked == brute
    assert len(blocked) > 0, "sample must produce at least one close pair"


def test_ann_recall_vs_brute_force(spark, sf_dir):
    """Multi-table LSH (8×4) recall@5 against exact top-5 — measured
    0.71 on this corpus; assert a safety-margin floor."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 20)
    bf = S.brute_force_topk(e, q, k=5).select("query_id", "match_id")
    ann = S.ann_topk(e, q, k=5).select("query_id", "match_id")
    hits = bf.join(ann, ["query_id", "match_id"]).count()
    assert hits / bf.count() >= 0.5


def test_ann_arrow_path_bitwise_equals_jvm_fold(spark, sf_dir):
    """The Arrow/NumPy LSH index accumulates per-dimension — the same
    sequential IEEE addition order as the interpreted JVM fold — so
    bucket ids, norms, and rounded similarities must be IDENTICAL
    (not just close): same candidates, same ranks, same doubles."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 20)
    arrow = sorted(tuple(r) for r in S.ann_topk(e, q, k=5, use_arrow=True).collect())
    jvm = sorted(tuple(r) for r in S.ann_topk(e, q, k=5, use_arrow=False).collect())
    assert arrow == jvm


def test_neardup_arrow_bitwise_equals_jvm(spark, sf_dir):
    """All three near-dup paths — distributed Arrow pair scoring (the
    default), driver-collected small-sample batch scoring, and the
    interpreted JVM fold — must produce the same pairs and the same
    rounded similarities, bit for bit."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(F.col("vec_id") % 5 == 0)
    arrow = sorted(tuple(r) for r in S.neardup_pairs(e, threshold=0.35, use_arrow=True).collect())
    small = sorted(
        tuple(r)
        for r in S.neardup_pairs(e, threshold=0.35, use_arrow=True, small_sample=True).collect()
    )
    jvm = sorted(tuple(r) for r in S.neardup_pairs(e, threshold=0.35, use_arrow=False).collect())
    assert arrow == jvm
    assert small == jvm


def test_neardup_default_plan_has_no_driver_collect(spark, sf_dir, monkeypatch):
    """The registered q_embed_neardup default must be a pure plan:
    constructing it may not trigger any driver-side materialization
    (the round-1 scale-killer was a full-corpus collect at build)."""
    from pyspark.sql import DataFrame

    def _boom(self, *a, **k):  # pragma: no cover - failure path
        raise AssertionError("driver-side collect during plan construction")

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(F.col("vec_id") % 5 == 0)
    monkeypatch.setattr(DataFrame, "collect", _boom)
    monkeypatch.setattr(DataFrame, "toPandas", _boom)
    df = S.neardup_pairs(e, threshold=0.35)  # build only — must not collect
    assert "cosine_sim" in df.columns


def test_ivf_arrow_assignment_bitwise_equals_jvm(spark, sf_dir):
    """Arrow IVF assignment (NumPy, sequential per-dim accumulation,
    det_round formula verbatim) must reproduce the JVM broadcast-join
    path exactly — same cells, same ranks, same rounded sims."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 20)
    arrow = sorted(
        tuple(r) for r in S.ivf_topk(e, q, k=5, nprobe=2, use_arrow=True).collect()
    )
    jvm = sorted(
        tuple(r) for r in S.ivf_topk(e, q, k=5, nprobe=2, use_arrow=False).collect()
    )
    assert arrow == jvm


def test_kmeans_improves_inertia_and_plugs_into_ivf(spark, sf_dir):
    """Lloyd iterations must not worsen the clustering objective, and
    trained centroids must drop into ivf_assignments unchanged."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    seed = S.kmeans_centroids(e, k=8, iters=0)
    trained = S.kmeans_centroids(e, k=8, iters=2)
    i0 = S.kmeans_inertia(e, seed)
    i2 = S.kmeans_inertia(e, trained)
    assert i2 <= i0 + 1e-9, (i0, i2)
    cells = S.ivf_assignments(e, trained, nprobe=1)
    assert cells.count() == e.count()
    n_cells = cells.select("centroid_id").distinct().count()
    assert 1 < n_cells <= 8


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    """IVF with nprobe=2 over ~14 cells: recall floor vs exact top-5.
    (Probing 2/14 cells ≈ 14% of the corpus; near neighbors
    concentrate in near cells, so recall lands far above that.)"""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 20)
    bf = S.brute_force_topk(e, q, k=5).select("query_id", "match_id")
    ivf = S.ivf_topk(e, q, k=5, nprobe=2).select("query_id", "match_id")
    hits = bf.join(ivf, ["query_id", "match_id"]).count()
    assert hits / bf.count() >= 0.3


def test_cosine_pandas_udf_parity(spark, sf_dir):
    """The Arrow/NumPy cosine path must agree with the JVM fold to
    float tolerance (different accumulation orders, same math)."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    a = e.select(F.col("vec_id").alias("ia"), S.as_double(F.col("embedding")).alias("va"))
    b = e.select(F.col("vec_id").alias("ib"), S.as_double(F.col("embedding")).alias("vb"))
    pairs = a.crossJoin(b).filter(F.col("ia") < F.col("ib")).limit(200)
    cos_udf = S.cosine_pandas_udf()
    rows = pairs.select(
        S.cosine(F.col("va"), F.col("vb")).alias("jvm"),
        cos_udf(F.col("va"), F.col("vb")).alias("py"),
    ).collect()
    assert rows
    assert all(abs(r["jvm"] - r["py"]) < 1e-9 for r in rows)


def test_cosine_self_similarity(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(5)
    v = S.as_double(F.col("embedding"))
    rows = e.select(S.cosine(v, v).alias("c")).collect()
    assert all(abs(r["c"] - 1.0) < 1e-12 for r in rows)


def test_multimodal_decode_parity(spark):
    """mapInPandas byte features must equal Python-side ground truth
    (the Arrow batch boundary preserves bytes exactly)."""
    df = _docs(spark, [(1, "abc"), (2, "hello!")])
    feats = {
        r["doc_id"]: r for r in M.decode_features(M.attach_binary(df)).collect()
    }
    for doc_id, text in [(1, "abc"), (2, "hello!")]:
        b = text.encode()
        r = feats[doc_id]
        assert r["byte_len"] == len(b)
        assert r["first_byte"] == b[0]
        assert r["last_byte"] == b[-1]
        assert r["byte_sum_mod"] == sum(b) % 997
        assert r["n_frames"] == len(b) % 10 + 1


def test_multimodal_real_decode_is_stubbed(spark):
    df = M.attach_binary(_docs(spark, [(1, "abc")]))
    with pytest.raises(Exception) as exc_info:
        M.decode_features(df, real_decode=True).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_resize_media_updates_payload_and_meta(spark):
    df = M.attach_binary(_docs(spark, [(1, "x" * 4000), (2, "short doc")]))
    out = {r["doc_id"]: r for r in M.resize_media(df, 16, 16).collect()}
    for doc_id in (1, 2):
        r = out[doc_id]
        assert r["media_meta"]["width"] == 16 and r["media_meta"]["height"] == 16
        assert r["media_meta"]["byte_len"] == len(r["payload"])
    # the big payload actually shrank
    assert out[1]["media_meta"]["byte_len"] < 4000


def test_frame_sample_is_deterministic_subset(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    binary = M.attach_binary(docs)
    a = sorted(r["doc_id"] for r in M.frame_sample(binary, 4).select("doc_id").collect())
    b = sorted(r["doc_id"] for r in M.frame_sample(binary, 4).select("doc_id").collect())
    assert a == b
    assert 0 < len(a) < binary.count()


def test_chunking_reconstructs_and_overlaps(spark):
    """Chunk invariants: stride-aligned starts, every chunk ≤
    chunk_size tokens, consecutive chunks share exactly `overlap`
    tokens, and dropping each chunk's overlap prefix reconstructs the
    original token stream."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.text import chunk_documents

    words = " ".join(f"w{i}" for i in range(75))
    df = _docs(spark, [(1, words), (2, "short doc"), (3, " ".join(f"x{i}" for i in range(32)))])
    out = chunk_documents(df, "doc_id", "text", chunk_size=32, overlap=8)
    rows = sorted((r["doc_id"], r["chunk_idx"], r["n_tokens"], r["chunk_text"]) for r in out.collect())
    by_doc = {}
    for d, ci, n, txt in rows:
        by_doc.setdefault(d, []).append((ci, n, txt.split(" ")))
    # doc 1: 75 tokens, stride 24 → ceil((75-8)/24) = 3 chunks
    assert [ci for ci, _, _ in by_doc[1]] == [0, 1, 2]
    chunks = [t for _, _, t in by_doc[1]]
    assert all(len(c) <= 32 for c in chunks)
    for a, b in zip(chunks, chunks[1:]):
        assert a[-8:] == b[:8]  # overlap region agrees
    recon = chunks[0] + [t for c in chunks[1:] for t in c[8:]]
    assert recon == [f"w{i}" for i in range(75)]
    # short doc: single partial chunk
    assert by_doc[2] == [(0, 2, ["short", "doc"])]
    # exactly one window: one chunk, no empty tail chunk
    assert len(by_doc[3]) == 1 and by_doc[3][0][1] == 32


def test_pii_detection_and_redaction(spark):
    """Planted PII must be counted per category and fully scrubbed
    from the redacted text; clean text passes through untouched."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.text import pii_stats

    df = _docs(
        spark,
        [
            (1, "mail alice.smith+x@corp.example.org then call 555-123-4567 twice 555-123-4567"),
            (2, "ssn 123-45-6789 lives here"),
            (3, "perfectly clean document"),
        ],
    )
    got = {r["doc_id"]: r for r in pii_stats(df, "doc_id", "text").collect()}
    assert (got[1]["n_emails"], got[1]["n_phones"], got[1]["n_ssns"]) == (1, 2, 0)
    assert got[1]["n_pii"] == 3
    assert "<EMAIL>" in got[1]["redacted_text"] and "<PHONE>" in got[1]["redacted_text"]
    assert "alice" not in got[1]["redacted_text"] and "555" not in got[1]["redacted_text"]
    assert got[2]["n_ssns"] == 1 and "<SSN>" in got[2]["redacted_text"]
    assert got[3]["n_pii"] == 0 and got[3]["redacted_text"] == "perfectly clean document"


def test_contamination_flags_planted_overlap(spark):
    """A doc sharing half its shingles with the benchmark must score
    ~0.5; benchmark members themselves score exactly 1.0; disjoint
    docs score 0.0."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext.text import contamination_check

    bench_text = " ".join(f"b{i}" for i in range(20))
    half = " ".join(f"b{i}" for i in range(10)) + " " + " ".join(f"c{i}" for i in range(10))
    clean = " ".join(f"z{i}" for i in range(20))
    df = _docs(spark, [(1, bench_text), (2, half), (3, clean)])
    bench = df.filter(F.col("doc_id") == 1)
    got = {r["doc_id"]: r for r in contamination_check(df, bench, "doc_id", "text").collect()}
    assert got[1]["contamination_rate"] == 1.0 and got[1]["is_contaminated"]
    assert got[3]["n_contaminated"] == 0 and not got[3]["is_contaminated"]
    assert 0.0 < got[2]["contamination_rate"] < 1.0


def test_star_cc_equals_label_propagation(spark, sf_dir):
    """Large-star/small-star must label the real corpus's dup graph
    identically to min-label propagation (same components, same
    min-id cluster labels, same sizes)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(F.col("doc_id") % 2 == 0)
    a = sorted(tuple(r) for r in D.dup_clusters(d, "doc_id", "text", threshold=0.5).collect())
    b = sorted(tuple(r) for r in D.dup_clusters_star(d, "doc_id", "text", threshold=0.5).collect())
    assert a == b
    assert len(a) > 0


def test_star_cc_handles_deep_chain(spark):
    """A 12-node path graph (worst case for propagation depth) must
    collapse to one component labeled by the min node — the O(log d)
    regime the star algorithm exists for."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 111)], "id_a LONG, id_b LONG"
    )
    got = {
        r["node"]: r["cluster_id"]
        for r in D.connected_components_star(edges).collect()
    }
    assert got == {i: 100 for i in range(100, 112)}


def test_nprobe_filter_equals_per_tier_assignment(spark, sf_dir):
    """q_ivf_nprobe_curve's r16 optimization rests on one identity:
    ivf_assignments ranks EVERY centroid under the same
    (sim DESC, centroid_id) order whatever nprobe is, so the tier-np
    assignment must equal the crank<=np slice of the widest tier's
    assignment — and therefore the per-tier candidate-pair sets
    (min-crank filtered) match the per-tier joins they replaced."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 20)
    cents = e.filter(F.col("vec_id") % S.CENTROID_MOD == 0)
    tiers = (1, 2, 4)
    wide = S.ivf_assignments(q, cents, nprobe=max(tiers))
    for np_ in tiers:
        sliced = sorted(
            tuple(r)
            for r in wide.filter(F.col("crank") <= np_)
            .select("vec_id", "centroid_id", "crank")
            .collect()
        )
        fresh = sorted(
            tuple(r)
            for r in S.ivf_assignments(q, cents, nprobe=np_)
            .select("vec_id", "centroid_id", "crank")
            .collect()
        )
        assert sliced == fresh, f"nprobe={np_}: slice != fresh assignment"
