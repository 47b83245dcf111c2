"""Physical-plan quality assertions — the 100 TB discipline, frozen.

Each test pins a plan property that matters at scale and would
silently regress otherwise: predicate pushdown reaching the parquet
scan, column pruning, broadcast joins on dimension lookups (incl.
anti-joins), velocity-as-window (one shuffle, not three self-joins),
and partial (map-side) aggregation before the exchange.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from real_time_fraud_revenue_intelligence_lakehouse_spark.plans import registry


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    qs = registry.all_queries()

    def plan_of(name: str) -> str:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    return plan_of


def test_filters_push_down_to_scan(plans):
    p = plans("q_clean_filter")
    assert "PushedFilters: [" in p
    pushed = next(l for l in p.splitlines() if "PushedFilters" in l)
    assert "IsNotNull(o_orderkey)" in pushed
    assert "GreaterThan(o_totalprice,0.0)" in pushed


def test_column_pruning_reaches_scan(plans):
    """q_topk projects 2 columns; the scan must not read all 9."""
    p = plans("q_topk")
    schema = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "o_custkey" in schema and "o_totalprice" in schema
    assert "o_comment" not in schema and "o_clerk" not in schema


def test_dim_lookups_broadcast(plans):
    """part/supplier lookups must be broadcast, never shuffled."""
    p = plans("q_lookup_join")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_fk_orphans_single_scan_broadcast(plans):
    """Both FK existence checks ride ONE scan of the fact as
    broadcast left-outer null-marker joins; the only exchange is the
    final distinct. No shuffle join, no second fact scan."""
    p = plans("q_dq_fk_orphans")
    assert p.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in p
    # formatted mode prints each node twice (tree + detail):
    # 3 scans — lineitem + the two parents — appear 6 times.
    assert p.count("Scan parquet") == 6


def test_velocity_is_single_window_not_self_joins(plans):
    """SURVEY §2.3 J2: the reference's 3× band self-join re-expressed
    as ONE range-frame window — one exchange on user_id, zero joins."""
    p = plans("q_velocity_window")
    assert "Window" in p
    assert "Join" not in p
    # formatted mode prints each node twice (tree + detail): count the
    # tree entries only.
    assert p.count("+- Exchange") == 1


def test_revenue_daily_has_partial_aggregation(plans):
    """Map-side combine before the shuffle: HashAggregate must appear
    both below and above the Exchange."""
    p = plans("q_revenue_daily")
    lines = [l for l in p.splitlines() if l.strip().startswith(("+- HashAggregate", "+- Exchange", "HashAggregate", "Exchange"))]
    assert p.count("HashAggregate") >= 2
    assert "Exchange" in p


def test_relational_core_has_no_python_boundary(plans):
    """Zero Python UDFs in the relational core (SURVEY §2.13 policy):
    no BatchEvalPython / ArrowEvalPython nodes anywhere. (The only
    sanctioned Python stage is q_multimodal_decode's mapInPandas.)"""
    for q in ("q_revenue_daily", "q_clean_filter", "q_join_left",
              "q_lookup_join", "q_lsh_pairs", "q_embed_topk"):
        p = plans(q)
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, (
            f"{q} crossed into Python"
        )
    assert "MapInPandas" in plans("q_multimodal_decode")


def test_pricing_summary_pushes_date_filter(plans):
    p = plans("q_pricing_summary")
    pushed = next(l for l in p.splitlines() if "PushedFilters" in l)
    assert "l_shipdate" in pushed


def test_shipping_priority_join_shape(plans):
    """Q3 analog: filtered customer side broadcasts; the LIMIT
    compiles to TakeOrderedAndProject, not a global sort."""
    p = plans("q_shipping_priority")
    assert "BroadcastHashJoin" in p
    assert "TakeOrderedAndProject" in p


def test_lsh_candidate_join_is_narrow(plans):
    """The LSH self-join must shuffle only (id, band) rows — token
    arrays attach after pair dedup (the sf0.1 197s→3s lesson)."""
    p = plans("q_lsh_pairs")
    # the band-bucket join appears before any token-array column
    join_pos = p.find("Join")
    assert join_pos != -1
    assert "toks" not in p[:join_pos]


def test_embed_top1_aggregates_without_window_sort(plans):
    """q_embed_top1's top-1 must be a partial-aggregable max(struct),
    not a window row_number: no Window node (and therefore no per-
    query sort of the candidate lists) anywhere in the plan."""
    p = plans("q_embed_top1")
    assert "Window" not in p
    assert "HashAggregate" in p or "SortAggregate" in p or "ObjectHashAggregate" in p


def test_neardup_plan_is_distributed(plans):
    """q_embed_neardup's default plan: the pair join runs on executors
    (a join node is present) — the round-1 driver-collect shape would
    show a bare mapInPandas over one source with no join."""
    p = plans("q_embed_neardup")
    assert "Join" in p


def test_jaccard_threshold_not_folded_into_join(plans):
    """q_ngram_jaccard relies on a projection barrier so Catalyst does
    NOT fold `jaccard >= t` into the nested-loop join condition (there
    the array_intersect would be re-evaluated per comparison instead
    of once per pair via subexpression elimination). Pin it: the join
    node's condition must stay the pure id inequality."""
    p = plans("q_ngram_jaccard")
    import re

    join_lines = [ln for ln in p.splitlines() if "NestedLoopJoin" in ln or "Join Inner" in ln]
    assert join_lines, p
    assert not any("array_intersect" in ln for ln in join_lines), join_lines


def test_hll_register_merge_is_associative_and_idempotent(spark):
    """q_active_users_hll's correctness rests on elementwise-max
    register merge being associative + idempotent: merging day sets
    (A∪B)∪C, A∪(B∪C), and a re-merge of an already-merged summary all
    yield identical registers — so ANY merge tree (rolling window,
    hierarchical rollup, stream checkpoint) gives the same estimate."""
    from pyspark.sql import functions as F

    from real_time_fraud_revenue_intelligence_lakehouse_spark.plans.catalog_behavior import (
        hll_day_registers,
        hll_estimate,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    dreg = hll_day_registers(e).cache()
    days = sorted(r["day"] for r in dreg.select("day").distinct().collect())
    assert len(days) >= 3
    a, b, c = days[0], days[1], days[2]

    def merged(day_set):
        return {
            (r["idx"]): r["m_j"]
            for r in dreg.filter(F.col("day").isin(list(day_set)))
            .groupBy("idx")
            .agg(F.max("m_j").alias("m_j"))
            .collect()
        }

    def combine(x, y):
        return {k: max(x.get(k, 0), y.get(k, 0)) for k in set(x) | set(y)}

    m_abc = merged({a, b, c})
    assert combine(merged({a, b}), merged({c})) == m_abc        # (A∪B)∪C
    assert combine(merged({a}), merged({b, c})) == m_abc        # A∪(B∪C)
    assert combine(m_abc, m_abc) == m_abc                        # idempotent
    assert combine(m_abc, merged({b})) == m_abc                  # re-merge absorbs

    # and the estimate is a pure function of the merged registers
    rows = [(0, k, v) for k, v in m_abc.items()]
    df = spark.createDataFrame(rows, "g int, idx long, m_j int")
    est1 = hll_estimate(df, ["g"]).collect()[0]["est"]
    est2 = hll_estimate(df, ["g"]).collect()[0]["est"]
    assert est1 == est2 > 0
    dreg.unpersist()
