"""Invariant tests for round-11 operators (oracle equality is the
driver/selfcheck's job; these pin the semantic laws)."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def queries():
    from real_time_fraud_revenue_intelligence_lakehouse_spark.plans.registry import all_queries

    return all_queries()


def test_attribution_shares_partition_revenue(spark, queries):
    rows = queries["q_attribution_last_touch"](spark, SF).collect()
    assert abs(sum(r["revenue_share"] for r in rows) - 1.0) < 1e-3
    assert all(r["n_purchases"] > 0 and r["revenue"] > 0 for r in rows)
    assert {"direct"} <= {r["channel"] for r in rows}
    assert "purchase" not in {r["channel"] for r in rows}  # a purchase can't attribute itself


def test_interarrival_burstiness_bounded(spark, queries):
    rows = queries["q_interarrival_stats"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_events"] >= 3
        assert r["mean_gap_s"] > 0
        assert -1.0 <= r["burstiness"] <= 1.0


def test_hits_l1_normalized_per_role(spark, queries):
    rows = queries["q_hits"](spark, SF).collect()
    hub = [r for r in rows if r["role"] == "hub"]
    auth = [r for r in rows if r["role"] == "authority"]
    assert hub and auth
    assert abs(sum(r["score"] for r in hub) - 1.0) < 1e-4
    assert abs(sum(r["score"] for r in auth) - 1.0) < 1e-4
    # bipartite: hubs are (negated) supplier ids, authorities customers
    assert all(r["node"] < 0 for r in hub)
    assert all(r["node"] >= 0 for r in auth)


def test_active_users_hll_error_within_sketch_bound(spark, queries):
    rows = queries["q_active_users_hll"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["wau_exact"] > 0 and r["wau_hll"] > 0
        # 256 registers → ~6.5% typical error; 20% is the generous gate
        assert r["rel_error"] < 0.20


def test_theil_sen_slope_is_robust_to_outlier_day(spark, queries):
    """The defining property: corrupting ONE day's revenue 100x moves
    OLS but leaves the Theil-Sen slope essentially unchanged (the
    median of pairwise slopes shrugs off a single corrupted day)."""
    from pyspark.sql import functions as F

    from real_time_fraud_revenue_intelligence_lakehouse_spark.operators.ranking import select_kth
    from real_time_fraud_revenue_intelligence_lakehouse_spark.functions.scalars import det_round

    base = queries["q_theil_sen"](spark, SF).collect()[0]
    assert base["n_days"] >= 100 and base["n_pairs"] == base["n_days"] * (base["n_days"] - 1) // 2

    o = spark.read.parquet(f"{SF}/orders.parquet")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("y"))
        .select(F.datediff("d", F.lit("1970-01-01").cast("date")).alias("x"), "y")
    )
    poisoned = daily.withColumn(
        "y", F.when(F.col("x") == daily.agg(F.min("x")).first()[0], F.col("y") * 100).otherwise(F.col("y"))
    ).localCheckpoint()
    a = poisoned.select(F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = poisoned.select(F.col("x").alias("xb"), F.col("y").alias("yb"))
    slopes = a.join(b, F.col("xa") < F.col("xb")).select(
        det_round((F.col("yb") - F.col("ya")) / (F.col("xb") - F.col("xa")), 8).alias("s")
    ).localCheckpoint()
    poisoned_slope = select_kth(slopes, "s")

    def ols_slope(d):
        r = d.agg(
            F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx"), F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"), F.sum(F.col("x") * F.col("x")).alias("sxx"),
        ).first()
        return (r["n"] * r["sxy"] - r["sx"] * r["sy"]) / (r["n"] * r["sxx"] - r["sx"] ** 2)

    theil_shift = abs(poisoned_slope - base["slope"]) / abs(base["slope"])
    ols_shift = abs(ols_slope(poisoned) - ols_slope(daily)) / abs(ols_slope(daily))
    # the breakdown claim: the same single poisoned day moves OLS far
    # more than the pairwise-slope median (measured ~0.07 vs ~8.8 here)
    assert theil_shift < 0.15
    assert ols_shift > 10 * theil_shift


def test_calibration_bins_consistent(spark, queries):
    rows = queries["q_calibration"](spark, SF).collect()
    assert rows and all(0 <= r["bin"] <= 9 for r in rows)
    for r in rows:
        assert 0.0 <= r["mean_score"] <= 1.0 and 0.0 <= r["event_rate"] <= 1.0
        assert abs(r["calib_gap"] - (r["mean_score"] - r["event_rate"])) < 2e-6
        assert 0.0 <= r["brier"] <= 1.0
        # mean score inside (or on) its bin's nominal edges
        assert r["bin"] / 10 - 1e-9 <= r["mean_score"] <= (r["bin"] + 1) / 10 + 0.1


def test_degree_assortativity_in_range(spark, queries):
    r = queries["q_degree_assortativity"](spark, SF).collect()[0]
    assert r["n_edges"] > 0
    assert -1.0 <= r["assortativity"] <= 1.0


def test_rank_distributed_switch_changes_no_output(spark, queries):
    """spark.rtfril.rank.distributed flips the ntile/gini family onto
    the banded operators — the deployment form for 1e9-entity
    aggregates — and must change NOTHING in the results."""
    ids = ("q_ntile_quartiles", "q_percent_rank", "q_rfm_segments", "q_gini")
    sf = "/root/testdata/sf0.001"

    def snap():
        return {
            qid: sorted(tuple(r) for r in queries[qid](spark, sf).collect())
            for qid in ids
        }

    spark.conf.set("spark.rtfril.rank.distributed", "false")
    default_form = snap()
    try:
        spark.conf.set("spark.rtfril.rank.distributed", "true")
        distributed_form = snap()
    finally:
        spark.conf.set("spark.rtfril.rank.distributed", "false")
    assert distributed_form == default_form


def test_linear_attribution_conserves_revenue(spark, queries):
    """Equal-split credits must (approximately — split rounding is
    micro-scale) conserve total purchase revenue, and shares sum to 1;
    'direct' only carries whole-value credits."""
    from pyspark.sql import functions as F

    rows = queries["q_attribution_linear"](spark, SF).collect()
    total_credit = sum(r["revenue"] for r in rows)
    total_purchases = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"))
        .first()[0]
    )
    assert abs(total_credit - total_purchases) / total_purchases < 1e-4
    assert abs(sum(r["revenue_share"] for r in rows) - 1.0) < 1e-3
    assert "purchase" not in {r["channel"] for r in rows}


def test_conversion_latency_ordering(spark, queries):
    r = queries["q_conversion_latency"](spark, SF).collect()[0]
    assert r["n_converted"] > 0
    assert 0 <= r["min_s"] <= r["p50_s"] <= r["p90_s"] <= r["max_s"]


def test_new_vs_returning_split_consistent(spark, queries):
    from pyspark.sql import functions as F

    rows = queries["q_new_vs_returning"](spark, SF).collect()
    assert rows
    total = sum(r["new_revenue"] + r["returning_revenue"] for r in rows)
    purchases = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"))
        .first()[0]
    )
    assert abs(total - purchases) < 1e-6
    for r in rows:
        assert 0.0 <= r["new_share"] <= 1.0


def test_personalized_pagerank_concentrates_on_seed_side(spark, queries):
    """PPR's defining property vs global PR: rank mass concentrates
    near the seed set — the seed suppliers (negative node ids from
    nation 1) must hold more average mass than non-seed suppliers."""
    from pyspark.sql import functions as F

    rows = queries["q_personalized_pagerank"](spark, SF).collect()
    sup_nation1 = {
        -(r["s_suppkey"] + 1)
        for r in spark.read.parquet(f"{SF}/supplier.parquet")
        .filter(F.col("s_nationkey") == 1)
        .collect()
    }
    seeds = [r["ppr"] for r in rows if r["node"] in sup_nation1]
    other_sup = [r["ppr"] for r in rows if r["node"] < 0 and r["node"] not in sup_nation1]
    assert seeds and other_sup
    assert sum(seeds) / len(seeds) > 2 * (sum(other_sup) / len(other_sup))
    assert all(r["ppr"] >= 0 for r in rows)


def test_dim_truncation_recall_monotone(spark, queries):
    """More dimensions must not retrieve worse: recall@10 is
    non-decreasing in d, and every tier keeps a sane floor (random
    10-of-499 would sit near 0.02)."""
    rows = {r["d"]: r["recall_at_10"] for r in queries["q_embed_dim_truncation"](spark, SF).collect()}
    assert sorted(rows) == [8, 16, 32]
    assert rows[8] <= rows[16] <= rows[32] <= 1.0
    assert rows[8] > 0.05


def test_nprobe_curve_monotone(spark, queries):
    """More probes must not retrieve worse and must scan more: recall
    and candidate volume are both non-decreasing in nprobe."""
    rows = {r["nprobe"]: r for r in queries["q_ivf_nprobe_curve"](spark, SF).collect()}
    assert sorted(rows) == [1, 2, 4]
    assert rows[1]["recall_at_10"] <= rows[2]["recall_at_10"] <= rows[4]["recall_at_10"] <= 1.0
    assert rows[1]["n_candidates"] <= rows[2]["n_candidates"] <= rows[4]["n_candidates"]
    assert rows[4]["recall_at_10"] > 0.3


def test_price_elasticity_is_negative_demand_slope(spark, queries):
    """Economics sanity: demand curves slope DOWN — every brand's
    log-log elasticity must be negative, with enough points behind it."""
    rows = queries["q_price_elasticity"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n"] >= 30
        assert -2.0 < r["elasticity"] < 0.0


def test_hhi_bounded_by_floor_and_one(spark, queries):
    rows = queries["q_hhi_concentration"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_suppliers"] >= 1
        # HHI lives in [1/n, 1]; floor equality only at a perfect split
        assert r["hhi_floor"] - 1e-6 <= r["hhi"] <= 1.0 + 1e-9
