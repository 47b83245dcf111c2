"""Round-5 additions: paragraph-block dedup invariants, PQ encoding
properties, and the convergence-PageRank fixpoint (oracle-less by
design — its trip count is data-driven). Value correctness for the
oracle-backed queries lives in tools/selfcheck.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _q(name):
    from real_time_fraud_revenue_intelligence_lakehouse_spark.plans import registry

    return registry.all_queries()[name]


# --- paragraph-block dedup -------------------------------------------------

def test_paragraph_dedup_ratio_bounds(spark):
    out = _q("q_paragraph_dedup")(spark, SF_SMOKE)
    rows = out.collect()
    assert rows
    for r in rows:
        assert 0 < r["n_blocks"]
        assert 0 <= r["n_shared_blocks"] <= r["n_blocks"]
        assert 0.0 <= r["shared_ratio"] <= 1.0


def test_paragraph_dedup_detects_planted_boilerplate(spark):
    """Two documents sharing an aligned 2-block boilerplate plus
    distinct tails must both report ≥2 shared blocks; a third,
    fully-distinct doc must report zero."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.plans.catalog_corpus2 import BLOCK

    boiler = " ".join(f"b{i}" for i in range(2 * BLOCK))
    docs = [
        (1, boiler + " " + " ".join(f"x{i}" for i in range(BLOCK))),
        (2, boiler + " " + " ".join(f"y{i}" for i in range(BLOCK))),
        (3, " ".join(f"z{i}" for i in range(3 * BLOCK))),
    ]
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
            f"{d}/documents.parquet"
        )
        rows = {r["doc_id"]: r for r in _q("q_paragraph_dedup")(spark, d).collect()}
    assert rows[1]["n_shared_blocks"] >= 2
    assert rows[2]["n_shared_blocks"] >= 2
    assert rows[3]["n_shared_blocks"] == 0


# --- product quantization --------------------------------------------------

def test_pq_codes_complete_and_in_range(spark):
    from real_time_fraud_revenue_intelligence_lakehouse_spark.plans.catalog_corpus2 import PQ_K, PQ_M
    from real_time_fraud_revenue_intelligence_lakehouse_spark.sources.tables import read_table

    out = _q("q_embed_pq")(spark, SF_SMOKE)
    n_vecs = read_table(spark, SF_SMOKE, "embeddings").count()
    assert out.count() == n_vecs * PQ_M  # every (vector, subspace) encoded
    assert out.filter((F.col("code") < 0) | (F.col("code") >= PQ_K)).count() == 0
    assert out.filter(F.col("dist") < 0).count() == 0


def test_pq_seed_vectors_encode_to_themselves(spark):
    """A codeword's own subvector is at distance 0 from itself, so
    every seed vector must encode to its own id with dist 0."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.plans.catalog_corpus2 import PQ_K

    seeds = _q("q_embed_pq")(spark, SF_SMOKE).filter(F.col("vec_id") < PQ_K)
    bad = seeds.filter(
        (F.col("code") != F.col("vec_id")) | (F.col("dist") != 0.0)
    ).count()
    assert bad == 0


# --- convergence PageRank --------------------------------------------------

def test_pagerank_converge_is_a_fixpoint(spark):
    """One extra power-iteration round (same damping) over the
    converged ranks must move no node by more than PR_EPS (plus the
    1e-8 output-rounding noise) — the defining property of
    convergence. Also: ranks sum to ~1 (probability distribution)."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.plans.catalog_heavy import (
        PR_CONV_DAMP,
        PR_CONV_YEAR,
        PR_EPS,
        _pr_round,
        _trade_graph,
    )

    out = _q("q_pagerank_converge")(spark, SF_SMOKE)
    edges, nodes, stats, deg, _ = _trade_graph(spark, SF_SMOKE, year=PR_CONV_YEAR)
    ranks = out.select("node", F.col("pagerank").alias("rank"))
    nxt = _pr_round(edges, stats, deg, ranks, PR_CONV_DAMP, teleport=0.5)
    moved = (
        nxt.join(ranks.withColumnRenamed("rank", "_old"), "node")
        .agg(F.max(F.abs(F.col("rank") - F.col("_old"))).alias("d"))
        .collect()[0]["d"]
    )
    assert moved < PR_EPS + 2e-8
    total = out.agg(F.sum("pagerank").alias("s")).collect()[0]["s"]
    assert abs(total - 1.0) < 1e-3


def test_pagerank_converge_matches_long_unrolled_run(spark):
    """The convergence loop must land on the same fixpoint as a plain
    25-round unrolled power iteration at the same damping — proving
    the early-exit logic stops at the answer, not near it."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.plans.catalog_heavy import (
        PR_CONV_DAMP,
        PR_CONV_YEAR,
        _pr_round,
        _trade_graph,
    )

    b = {
        r["node"]: r["pagerank"]
        for r in _q("q_pagerank_converge")(spark, SF_SMOKE).collect()
    }
    edges, nodes, stats, deg, ranks = _trade_graph(spark, SF_SMOKE, year=PR_CONV_YEAR)
    ranks = ranks.localCheckpoint()
    for i in range(25):
        ranks = _pr_round(edges, stats, deg, ranks, PR_CONV_DAMP, teleport=0.5)
        if i % 5 == 4:
            ranks = ranks.localCheckpoint()
    a = {r["node"]: r["rank"] for r in ranks.collect()}
    assert set(a) == set(b)
    worst = max(abs(a[k] - b[k]) for k in a)
    assert worst < 1e-5
