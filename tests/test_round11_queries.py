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
