"""Round-7 additions: salted top-k, cumulative distinct, TWAP, YoY,
chi-square association, A-ES weighted sampling, Hamilton allocation,
market-basket lift, kNN-graph triangles, degree histogram, inverted
index, BPE merge training, and decile lift. Value correctness for the
oracle-backed forms lives in tools/selfcheck.py; these tests pin the
semantics on planted fixtures and the invariants that must hold at
any scale."""

from __future__ import annotations

import tempfile

from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _q(name):
    from real_time_fraud_revenue_intelligence_lakehouse_spark.plans import registry

    return registry.all_queries()[name]


ORDERS_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate string, o_orderpriority string"
)
LINEITEM_COLS = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
    "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
    "l_returnflag string, l_linestatus string, l_shipdate string"
)
EVENTS_SCHEMA = (
    "event_id long, ts string, user_id long, event_type string, value double, props string"
)


def _write_orders(spark, d, rows):
    spark.createDataFrame(rows, ORDERS_SCHEMA).withColumn(
        "o_orderdate", F.to_timestamp("o_orderdate")
    ).write.parquet(f"{d}/orders.parquet")


def _write_lineitem(spark, d, rows):
    spark.createDataFrame(rows, LINEITEM_COLS).withColumn(
        "l_shipdate", F.to_timestamp("l_shipdate")
    ).write.parquet(f"{d}/lineitem.parquet")


def _li(orderkey, partkey, suppkey):
    return (orderkey, partkey, suppkey, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", "1996-01-01")


def _write_events(spark, d, rows):
    spark.createDataFrame(rows, EVENTS_SCHEMA).withColumn(
        "ts", F.to_timestamp("ts")
    ).write.parquet(f"{d}/events.parquet")


# --- salted top-k per group -------------------------------------------------


def test_topk_per_group_matches_naive_window(spark):
    from real_time_fraud_revenue_intelligence_lakehouse_spark.plans.catalog_analytics2 import TOPK_K
    from real_time_fraud_revenue_intelligence_lakehouse_spark.sources.tables import read_table

    got = {
        (r["o_orderpriority"], r["rk"]): (r["o_orderkey"], r["o_totalprice"])
        for r in _q("q_topk_per_group")(spark, SF_SMOKE).collect()
    }
    o = read_table(spark, SF_SMOKE, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    naive = {
        (r["o_orderpriority"], r["rk"]): (r["o_orderkey"], r["o_totalprice"])
        for r in o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOPK_K)
        .collect()
    }
    assert got == naive


def test_topk_per_group_breaks_ties_on_key(spark):
    rows = [
        (10, 1, "O", 500.0, "2024-01-01", "P"),
        (3, 1, "O", 500.0, "2024-01-01", "P"),
        (7, 1, "O", 500.0, "2024-01-01", "P"),
        (5, 1, "O", 500.0, "2024-01-01", "P"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _write_orders(spark, d, rows)
        got = [
            (r["rk"], r["o_orderkey"])
            for r in _q("q_topk_per_group")(spark, d).orderBy("rk").collect()
        ]
    assert got == [(1, 3), (2, 5), (3, 7)]


# --- cumulative distinct ----------------------------------------------------


def test_cumulative_distinct_monotone_and_exhaustive(spark):
    from real_time_fraud_revenue_intelligence_lakehouse_spark.sources.tables import read_table

    rows = _q("q_cumulative_distinct")(spark, SF_SMOKE).orderBy("day").collect()
    assert rows
    cum = 0
    for r in rows:
        cum += r["new_users"]
        assert r["cum_users"] == cum  # running sum consistency
    n_users = read_table(spark, SF_SMOKE, "events").select("user_id").distinct().count()
    assert rows[-1]["cum_users"] == n_users  # every user counted exactly once


# --- TWAP -------------------------------------------------------------------


def test_twap_planted_durations(spark):
    # u1 holds 10.0 for 10s then 20.0 (terminal, no duration) → twap 10
    # u2 holds 10.0 for 10s, 30.0 for 30s → twap (100+900)/40 = 25
    events = [
        (1, "2024-01-01 00:00:00", 1, "a", 10.0, "{}"),
        (2, "2024-01-01 00:00:10", 1, "a", 20.0, "{}"),
        (3, "2024-01-01 00:00:00", 2, "a", 10.0, "{}"),
        (4, "2024-01-01 00:00:10", 2, "a", 30.0, "{}"),
        (5, "2024-01-01 00:00:40", 2, "a", 99.0, "{}"),
        (6, "2024-01-01 00:00:00", 3, "a", 7.0, "{}"),  # single event: excluded
    ]
    with tempfile.TemporaryDirectory() as d:
        _write_events(spark, d, events)
        out = {r["user_id"]: r for r in _q("q_twap")(spark, d).collect()}
    assert out[1]["twap_value"] == 10.0 and out[1]["tot_ms"] == 10_000
    assert out[2]["twap_value"] == 25.0 and out[2]["n_intervals"] == 2
    assert 3 not in out


# --- YoY growth -------------------------------------------------------------


def test_yoy_growth_planted(spark):
    orders = [
        (1, 1, "O", 100.0, "1996-06-01", "P"),
        (2, 1, "O", 150.0, "1997-06-01", "P"),
        (3, 1, "O", 75.0, "1998-06-01", "P"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _write_orders(spark, d, orders)
        spark.createDataFrame(
            [(1, 5)], "c_custkey long, c_nationkey long"
        ).write.parquet(f"{d}/customer.parquet")
        spark.createDataFrame(
            [(5, "ZANZIBAR")], "n_nationkey long, n_name string"
        ).write.parquet(f"{d}/nation.parquet")
        got = {
            r["order_year"]: r["yoy_pct"]
            for r in _q("q_yoy_growth")(spark, d).collect()
        }
    assert got == {1997: 50.0, 1998: -50.0}  # 1996 has no prior year


# --- chi-square / MI --------------------------------------------------------


def test_chi_square_independent_table_scores_zero(spark):
    # priority ⟂ status: every (p, s) cell has identical count
    orders = [
        (i * 10 + j * 2 + k, 1, ["A", "B"][j], 100.0, "2024-01-01", ["P1", "P2"][k])
        for i in range(25)
        for j in range(2)
        for k in range(2)
    ]
    with tempfile.TemporaryDirectory() as d:
        _write_orders(spark, d, orders)
        row = _q("q_chi_square")(spark, d).collect()[0]
    assert row["n_rows"] == 100 and row["dof"] == 1
    assert row["chi2"] == 0.0 and row["cramers_v"] == 0.0 and row["mutual_info"] == 0.0


def test_chi_square_dependent_table_saturates(spark):
    # status is a function of priority → Cramér's V = 1
    orders = [(i, 1, ["A", "B"][i % 2], 100.0, "2024-01-01", ["P1", "P2"][i % 2]) for i in range(100)]
    with tempfile.TemporaryDirectory() as d:
        _write_orders(spark, d, orders)
        row = _q("q_chi_square")(spark, d).collect()[0]
    assert row["cramers_v"] == 1.0
    assert abs(row["chi2"] - 100.0) < 1e-6  # chi2 = n for a perfect 2x2 association


# --- A-ES weighted sample ---------------------------------------------------


def test_weighted_sample_deterministic_and_append_stable(spark):
    from real_time_fraud_revenue_intelligence_lakehouse_spark.plans.catalog_analytics2 import WS_K

    a = _q("q_weighted_sample")(spark, SF_SMOKE).collect()
    b = _q("q_weighted_sample")(spark, SF_SMOKE).collect()
    assert [r["o_orderkey"] for r in a] == [r["o_orderkey"] for r in b]
    assert len(a) == WS_K
    assert all(r["es_key"] <= 0.0 for r in a)  # ln(u)/w with u in (0,1]


# --- Hamilton allocation ----------------------------------------------------


def test_allocation_preserves_budget_exactly(spark):
    from real_time_fraud_revenue_intelligence_lakehouse_spark.plans.catalog_analytics2 import ALLOC_BUDGET

    rows = _q("q_allocation")(spark, SF_SMOKE).collect()
    assert rows
    assert sum(r["alloc"] for r in rows) == ALLOC_BUDGET
    total = sum(r["revenue"] for r in rows)
    for r in rows:
        exact = r["revenue"] / total * ALLOC_BUDGET
        assert abs(r["alloc"] - exact) < 1.0  # each within 1 unit of pro-rata


# --- market-basket lift -----------------------------------------------------


def test_basket_lift_planted_association(spark):
    # parts 1,2 co-occur in 3 of 5 orders; part 3 floats alone
    li = (
        [_li(1, 1, 1), _li(1, 2, 1)]
        + [_li(2, 1, 1), _li(2, 2, 1)]
        + [_li(3, 1, 1), _li(3, 2, 1)]
        + [_li(4, 1, 1), _li(4, 3, 1)]
        + [_li(5, 3, 1)]
    )
    with tempfile.TemporaryDirectory() as d:
        _write_lineitem(spark, d, li)
        out = {
            (r["part_a"], r["part_b"]): r
            for r in _q("q_basket_lift")(spark, d).collect()
        }
    r = out[(1, 2)]
    assert r["pair_orders"] == 3
    assert r["support"] == 0.6  # 3 of 5 orders
    # lift = P(1,2) / (P(1)·P(2)) = 0.6 / (0.8 · 0.6) = 1.25
    assert r["lift"] == 1.25
    assert (1, 3) not in out  # single co-occurrence < MIN_SUP


# --- kNN triangles ----------------------------------------------------------


def test_knn_triangles_planted_clique(spark):
    # 4 suppliers all serving the same 2 customers → K4: 4 triangles,
    # 12 wedges, clustering exactly 1.
    li, orders = [], []
    ok = 1
    for cust in (1, 2):
        for supp in (1, 2, 3, 4):
            orders.append((ok, cust, "O", 100.0, "2024-01-01", "P"))
            li.append(_li(ok, 1, supp))
            ok += 1
    with tempfile.TemporaryDirectory() as d:
        _write_orders(spark, d, orders)
        _write_lineitem(spark, d, li)
        row = _q("q_knn_triangles")(spark, d).collect()[0]
    assert row["n_nodes"] == 4 and row["n_edges"] == 6
    assert row["n_triangles"] == 4 and row["n_wedges"] == 12
    assert row["clustering"] == 1.0


def test_knn_triangles_sf_consistency(spark):
    row = _q("q_knn_triangles")(spark, SF_SMOKE).collect()[0]
    from real_time_fraud_revenue_intelligence_lakehouse_spark.plans.catalog_graph import K_NN

    # kNN cap: each node contributes ≤ K_NN directed picks
    assert row["n_edges"] <= K_NN * row["n_nodes"]
    assert 0.0 <= row["clustering"] <= 1.0


# --- degree histogram -------------------------------------------------------


def test_graph_degree_buckets_partition_nodes(spark):
    from real_time_fraud_revenue_intelligence_lakehouse_spark.sources.tables import read_table

    rows = _q("q_graph_degree")(spark, SF_SMOKE).collect()
    by_side = {}
    for r in rows:
        assert 2 ** r["deg_bucket"] <= r["max_deg"] < 2 ** (r["deg_bucket"] + 1) or (
            r["min_deg"] >= 2 ** r["deg_bucket"]
        )
        by_side[r["side"]] = by_side.get(r["side"], 0) + r["n_nodes"]
    li = read_table(spark, SF_SMOKE, "lineitem")
    n_supp = li.select("l_suppkey").distinct().count()
    assert by_side["supplier"] == n_supp


# --- inverted index ---------------------------------------------------------


def test_inverted_index_planted_postings(spark):
    from real_time_fraud_revenue_intelligence_lakehouse_spark.plans.catalog_corpus3 import IDX_MIN_DF

    docs = [(i, "zebra stripes", "en", "s", 13) for i in range(IDX_MIN_DF)]
    docs.append((90, "zebra zebra", "en", "s", 11))  # tf 2
    docs.append((91, "plain text", "en", "s", 10))  # below df floor
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(f"{d}/documents.parquet")
        out = {r["term"]: r for r in _q("q_inverted_index")(spark, d).collect()}
    z = out["zebra"]
    assert z["df"] == IDX_MIN_DF + 1 and z["cf"] == IDX_MIN_DF + 2
    assert z["postings"] == ",".join(
        [f"{i}:1" for i in range(IDX_MIN_DF)] + ["90:2"]
    )
    assert "plain" not in out and "stripes" in out


# --- BPE merges -------------------------------------------------------------


def test_bpe_merges_run_parity_and_tie_break(spark):
    # corpus: 'aaaa' ×10, 'bc' ×3.
    # r1: (a,a) weight 30 (runs merge at odd offsets: a a a a → aa aa)
    # r2: tie (aa,</w>)=10 vs (aa,aa)=10 → lexicographic: '</w>' < 'aa'
    # r3: (aa,aa</w>) = 10
    # r4: (b,c)=3 beats (c,</w>)=3 lexicographically
    docs = [(i, " ".join(["aaaa"] * 10 + ["bc"] * 3), "en", "s", 1) for i in range(1)]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(f"{d}/documents.parquet")
        got = [
            (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_count"])
            for r in _q("q_bpe_merges")(spark, d).orderBy("merge_rank").collect()
        ]
    assert got == [
        (1, "a", "a", 30),
        (2, "aa", "</w>", 10),
        (3, "aa", "aa</w>", 10),
        (4, "b", "c", 3),
    ]


def test_bpe_merges_deterministic_on_corpus(spark):
    a = _q("q_bpe_merges")(spark, SF_SMOKE).orderBy("merge_rank").collect()
    b = _q("q_bpe_merges")(spark, SF_SMOKE).orderBy("merge_rank").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == 4
    assert all(r["pair_count"] > 0 for r in a)


# --- decile lift ------------------------------------------------------------


def test_decile_lift_capture_and_weighted_lift(spark):
    rows = sorted(
        _q("q_decile_lift")(spark, SF_SMOKE).collect(), key=lambda r: r["decile"]
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    # cumulative capture is monotone and ends at 1
    caps = [r["cum_capture"] for r in rows]
    assert all(b >= a for a, b in zip(caps, caps[1:]))
    assert abs(caps[-1] - 1.0) < 1e-6
    # per-decile counts are equal within 1 (floor banding)
    ns = [r["n"] for r in rows]
    assert max(ns) - min(ns) <= 1
    # lift averaged over deciles (weighted by n) is 1 by construction
    total = sum(ns)
    pos = sum(r["n_pos"] for r in rows)
    w_lift = sum(r["lift"] * r["n"] for r in rows) / total
    assert abs(w_lift - 1.0) < 1e-3
    assert pos > 0


# --- Kaplan-Meier -----------------------------------------------------------


def test_survival_km_planted_curve(spark):
    # u1,u2 convert on day 2 (of 4 at risk) → S(2)=0.5; u3 censored day 5;
    # u4 converts day 7 with n_risk=1 → curve hits exactly 0.
    events = [
        (1, "2024-01-01 00:00:00", 1, "view", 1.0, "{}"),
        (2, "2024-01-03 00:00:00", 1, "purchase", 1.0, "{}"),
        (3, "2024-01-01 00:00:00", 2, "view", 1.0, "{}"),
        (4, "2024-01-03 00:00:00", 2, "purchase", 1.0, "{}"),
        (5, "2024-01-01 00:00:00", 3, "view", 1.0, "{}"),
        (6, "2024-01-06 00:00:00", 3, "click", 1.0, "{}"),
        (7, "2024-01-01 00:00:00", 4, "view", 1.0, "{}"),
        (8, "2024-01-08 00:00:00", 4, "purchase", 1.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _write_events(spark, d, events)
        rows = {r["duration_days"]: r for r in _q("q_survival_km")(spark, d).collect()}
    assert rows[2]["n_risk"] == 4 and rows[2]["n_events"] == 2
    assert rows[2]["survival"] == 0.5
    assert rows[5]["n_censored"] == 1 and rows[5]["survival"] == 0.5
    assert rows[7]["n_risk"] == 1 and rows[7]["survival"] == 0.0


def test_survival_km_monotone_on_corpus(spark):
    rows = sorted(
        _q("q_survival_km")(spark, SF_SMOKE).collect(),
        key=lambda r: r["duration_days"],
    )
    assert rows
    s = [r["survival"] for r in rows]
    assert all(0.0 <= x <= 1.0 for x in s)
    assert all(b <= a + 1e-9 for a, b in zip(s, s[1:]))  # non-increasing
    # risk set shrinks by exactly the departures at each step
    for prev, nxt in zip(rows, rows[1:]):
        assert nxt["n_risk"] == prev["n_risk"] - prev["n_events"] - prev["n_censored"]


# --- CUSUM ------------------------------------------------------------------


def test_cusum_flags_planted_level_shift(spark):
    # 30 stable days at ~100, then 10 shifted days at ~200: the alarm
    # must stay silent in the stable window and fire inside the shift.
    orders = [(i, 1, "O", 100.0 + (i % 3), f"2024-01-{i % 30 + 1:02d}", "P") for i in range(30)]
    orders += [(100 + i, 1, "O", 200.0 + (i % 3), f"2024-02-{i + 1:02d}", "P") for i in range(10)]
    with tempfile.TemporaryDirectory() as d:
        _write_orders(spark, d, orders)
        rows = sorted(_q("q_cusum")(spark, d).collect(), key=lambda r: r["day"])
    assert all(r["cusum"] >= 0.0 for r in rows)
    jan = [r for r in rows if r["day"].month == 1]
    feb = [r for r in rows if r["day"].month == 2]
    assert all(r["alarm"] == 0 for r in jan)
    assert any(r["alarm"] == 1 for r in feb)
    # recursion cross-check: s_t == max(0, s_{t-1} + zdev_t) within rounding
    s = 0.0
    for r in rows:
        s = max(0.0, s + r["zdev"])
        assert abs(s - r["cusum"]) < 1e-4, (r["day"], s, r["cusum"])


# --- item-item CF -----------------------------------------------------------


def test_item_sim_planted_cosine(spark):
    # parts 1,2 in 3 common orders of 4/3 appearances → sim 3/sqrt(12)
    li = (
        [_li(1, 1, 1), _li(1, 2, 1)]
        + [_li(2, 1, 1), _li(2, 2, 1)]
        + [_li(3, 1, 1), _li(3, 2, 1)]
        + [_li(4, 1, 1), _li(4, 3, 1)]
        + [_li(5, 3, 1)]
    )
    with tempfile.TemporaryDirectory() as d:
        _write_lineitem(spark, d, li)
        out = {(r["part"], r["neighbor"]): r for r in _q("q_item_sim")(spark, d).collect()}
    import math

    exp = round(math.floor((3 / math.sqrt(4 * 3)) * 1e6 + 0.5) / 1e6, 6)
    assert out[(1, 2)]["sim"] == exp and out[(2, 1)]["sim"] == exp
    assert out[(1, 2)]["rk"] == 1 and out[(1, 2)]["co_orders"] == 3
    assert (1, 3) not in out  # below min support


def test_item_sim_respects_k_cap(spark):
    from real_time_fraud_revenue_intelligence_lakehouse_spark.plans.catalog_graph import ITEM_K

    rows = _q("q_item_sim")(spark, SF_SMOKE).collect()
    assert rows
    per_part = {}
    for r in rows:
        per_part.setdefault(r["part"], []).append(r["rk"])
    for part, rks in per_part.items():
        assert sorted(rks) == list(range(1, len(rks) + 1))
        assert len(rks) <= ITEM_K


# --- FD discovery -----------------------------------------------------------


def test_fd_discovery_planted_dependency(spark):
    # p_partkey→p_name holds (key); p_brand→p_type violated by brand B1
    parts = [
        (1, "alpha", "B1", "T1", 5, 10.0),
        (2, "beta", "B1", "T2", 5, 10.0),
        (3, "gamma", "B2", "T3", 5, 10.0),
        (4, "delta", "B2", "T3", 5, 10.0),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            parts,
            "p_partkey long, p_name string, p_brand string, p_type string, p_size int, p_retailprice double",
        ).write.parquet(f"{d}/part.parquet")
        out = {r["fd"]: r for r in _q("q_fd_discovery")(spark, d).collect()}
    assert out["p_partkey->p_name"]["holds"] == 1
    assert out["p_partkey->p_name"]["violations"] == 0
    b = out["p_brand->p_type"]
    assert b["holds"] == 0 and b["n_lhs"] == 2 and b["n_pairs"] == 3 and b["violations"] == 1


def test_fd_discovery_consistency_on_corpus(spark):
    rows = _q("q_fd_discovery")(spark, SF_SMOKE).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["n_pairs"] >= r["n_lhs"]
        assert r["violations"] == r["n_pairs"] - r["n_lhs"]
        assert r["holds"] == (1 if r["violations"] == 0 else 0)
    # partkey is the table key → its FD must hold
    assert {r["fd"]: r["holds"] for r in rows}["p_partkey->p_name"] == 1


# --- reconciliation ---------------------------------------------------------


def test_reconciliation_planted_mismatch(spark):
    from real_time_fraud_revenue_intelligence_lakehouse_spark.plans.catalog_quality import RECON_TOL

    # month 1 reconciles exactly; month 2's lineitem side is short 50%
    orders = [
        (1, 1, "O", 200.0, "2024-01-15", "P"),
        (2, 1, "O", 200.0, "2024-02-15", "P"),
    ]
    li = [
        (1, 1, 1, 1, 1.0, 200.0, 0.0, 0.0, "N", "O", "2024-01-16"),
        (2, 1, 1, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", "2024-02-16"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _write_orders(spark, d, orders)
        _write_lineitem(spark, d, li)
        out = {r["month"].month: r for r in _q("q_reconciliation")(spark, d).collect()}
    assert out[1]["alarm"] == 0 and out[1]["rel_diff"] == 0.0
    assert out[2]["alarm"] == 1 and out[2]["rel_diff"] == 0.5
    assert out[2]["n_orders"] == 1 and out[2]["n_li_orders"] == 1
    assert RECON_TOL < 0.5


# --- readability ------------------------------------------------------------


def test_readability_planted_formula(spark):
    # "the cat sat." → 3 words, 1 sentence, 3 syllables (e/a/a)
    # flesch = 206.835 - 1.015*3 - 84.6*1 = 119.19
    docs = [(1, "the cat sat.", "en", "simple", 12)]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(f"{d}/documents.parquet")
        row = _q("q_readability")(spark, d).collect()[0]
    assert row["n_docs"] == 1 and row["total_words"] == 3
    assert abs(row["avg_flesch"] - (206.835 - 1.015 * 3 - 84.6 * 1.0)) < 1e-3


def test_readability_orders_simple_before_dense(spark):
    # many short monosyllabic sentences must out-score one long
    # polysyllabic run-on
    docs = [
        (1, "we go. we sit. we eat. it is so.", "en", "simple", 30),
        (2, "organizational sustainability considerations notwithstanding expeditious implementation", "en", "dense", 90),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(f"{d}/documents.parquet")
        out = {r["source"]: r["avg_flesch"] for r in _q("q_readability")(spark, d).collect()}
    assert out["simple"] > out["dense"]


# --- OLS trend --------------------------------------------------------------


def test_ols_trend_planted_perfect_line(spark):
    # daily revenue 100 + 10*t → slope 10, r2 1, forecast at tmax+7
    orders = [(i, 1, "O", 100.0 + 10.0 * i, f"2024-01-{i + 1:02d}", "P") for i in range(20)]
    with tempfile.TemporaryDirectory() as d:
        _write_orders(spark, d, orders)
        row = _q("q_ols_trend")(spark, d).collect()[0]
    assert row["n_days"] == 20
    assert abs(row["slope"] - 10.0) < 1e-6
    assert abs(row["intercept"] - 100.0) < 1e-6
    assert abs(row["r2"] - 1.0) < 1e-6
    assert abs(row["forecast"] - (100.0 + 10.0 * 26)) < 1e-6


# --- seasonal anomaly -------------------------------------------------------


def test_seasonal_anomaly_flags_shifted_weekday_only(spark):
    # 30 weeks: Mondays at 100±1, one Monday at 1000 → only that day
    # flags (enough weeks that the outlier can't mask itself by
    # inflating its own weekday's sigma); a global z-score would also
    # flag ordinary high weekdays.
    import datetime

    orders = []
    k = 0
    base = datetime.date(2024, 1, 1)  # a Monday
    for w in range(30):
        for doff in range(7):
            day = base + datetime.timedelta(days=7 * w + doff)
            amt = 100.0 + doff * 50 + (w % 3)  # weekday-dependent level
            if w == 4 and doff == 0:
                amt = 1000.0  # the anomalous Monday
            orders.append((k, 1, "O", amt, day.isoformat(), "P"))
            k += 1
    with tempfile.TemporaryDirectory() as d:
        _write_orders(spark, d, orders)
        rows = _q("q_seasonal_anomaly")(spark, d).collect()
    flagged = [r["day"].isoformat() for r in rows if r["flag"] == 1]
    assert flagged == ["2024-01-29"]
    dows = {r["day"].isoformat(): r["dow"] for r in rows}
    assert dows["2024-01-01"] == 2  # Monday = 2 in Spark's 1=Sunday convention


# --- abandonment ------------------------------------------------------------


def test_abandoned_planted_window(spark):
    events = [
        (1, "2024-01-01 00:00:00", 1, "click", 1.0, "{}"),   # converted (+2d)
        (2, "2024-01-03 00:00:00", 1, "purchase", 1.0, "{}"),
        (3, "2024-02-01 00:00:00", 1, "click", 1.0, "{}"),   # abandoned (no purchase after)
        (4, "2024-01-01 00:00:00", 2, "click", 1.0, "{}"),   # abandoned (+8d is outside)
        (5, "2024-01-09 00:00:00", 2, "purchase", 1.0, "{}"),
        (6, "2024-01-01 00:00:00", 3, "click", 1.0, "{}"),   # abandoned (other user's purchase)
    ]
    with tempfile.TemporaryDirectory() as d:
        _write_events(spark, d, events)
        out = {r["user_id"]: r for r in _q("q_abandoned")(spark, d).collect()}
    assert out[1]["n_clicks"] == 2 and out[1]["n_abandoned"] == 1 and out[1]["abandon_rate"] == 0.5
    assert out[2]["n_abandoned"] == 1
    assert out[3]["n_abandoned"] == 1


# --- BPE encode -------------------------------------------------------------


def test_bpe_encode_planted_compression(spark):
    # same corpus as the merge test: merges collapse 'aaaa' to ONE
    # token (via the round-1/2/3 chain) and 'bc' to two.
    # fertility = (10·1 + 3·2)/13; compression = (10·5 + 3·3)/16.
    docs = [(1, " ".join(["aaaa"] * 10 + ["bc"] * 3), "en", "s", 1)]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(f"{d}/documents.parquet")
        row = _q("q_bpe_encode")(spark, d).collect()[0]
    assert row["n_words"] == 13 and row["n_tokens"] == 16
    assert abs(row["fertility"] - 16 / 13) < 1e-6
    assert abs(row["compression"] - 59 / 16) < 1e-6


def test_bpe_encode_bounds_on_corpus(spark):
    rows = _q("q_bpe_encode")(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["n_tokens"] <= 0 or r["fertility"] >= 1.0  # </w> keeps ≥1 token/word
        assert r["compression"] >= 1.0  # merges never grow a sequence
        assert r["n_tokens"] <= r["n_words"] * 30


# --- SCD2 point-in-time lookup ----------------------------------------------


def test_scd2_lookup_attributes_to_prior_segment(spark):
    # u1: view(day1) → purchase(day2, 50) → purchase(day3, 70).
    # 1st purchase attributes to 'view'; 2nd to the 'purchase' segment
    # opened by the 1st. u2's first-ever event is a purchase → no
    # prior state → excluded.
    events = [
        (1, "2024-01-01 00:00:00", 1, "view", 0.0, "{}"),
        (2, "2024-01-02 00:00:00", 1, "purchase", 50.0, "{}"),
        (3, "2024-01-03 00:00:00", 1, "purchase", 70.0, "{}"),
        (4, "2024-01-01 00:00:00", 2, "purchase", 999.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _write_events(spark, d, events)
        out = {r["segment"]: r for r in _q("q_scd2_lookup")(spark, d).collect()}
    assert out["view"]["n_purchases"] == 1 and out["view"]["total_value"] == 50.0
    assert out["purchase"]["n_purchases"] == 1 and out["purchase"]["total_value"] == 70.0
    assert sum(r["n_purchases"] for r in out.values()) == 2  # u2's dropped


# --- lang-id confusion ------------------------------------------------------


def test_langid_confusion_is_stochastic_matrix(spark):
    rows = _q("q_langid_confusion")(spark, SF_SMOKE).collect()
    assert rows
    by_true = {}
    for r in rows:
        assert r["n"] > 0
        by_true.setdefault(r["lang_true"], 0.0)
        by_true[r["lang_true"]] += r["recall_share"]
    for lang, tot in by_true.items():
        assert abs(tot - 1.0) < 1e-4, (lang, tot)


# --- target encoding --------------------------------------------------------


def test_target_encoding_loo_formula(spark):
    # category A: 4 rows, 3 positive → loo_pos = 2/3, loo_neg = 1 (3/3)
    orders = [
        (1, 1, "F", 1.0, "2024-01-01", "A"),
        (2, 1, "F", 1.0, "2024-01-01", "A"),
        (3, 1, "F", 1.0, "2024-01-01", "A"),
        (4, 1, "O", 1.0, "2024-01-01", "A"),
        (5, 1, "F", 1.0, "2024-01-01", "B"),
        (6, 1, "O", 1.0, "2024-01-01", "B"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _write_orders(spark, d, orders)
        out = {r["category"]: r for r in _q("q_target_encoding")(spark, d).collect()}
    a = out["A"]
    assert a["n"] == 4 and a["n_pos"] == 3 and a["mean_target"] == 0.75
    assert abs(a["loo_mean_pos"] - 2 / 3) < 1e-6
    assert a["loo_mean_neg"] == 1.0
    b = out["B"]
    assert b["loo_mean_pos"] == 0.0 and b["loo_mean_neg"] == 1.0  # n=2 LOO extremes


def test_target_encoding_never_leaks_own_label(spark):
    # leakage fingerprint: within a category, the positive-row encoding
    # is STRICTLY below the negative-row encoding (each excludes itself)
    rows = _q("q_target_encoding")(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        if r["loo_mean_pos"] is not None and r["loo_mean_neg"] is not None and 0 < r["n_pos"] < r["n"]:
            assert r["loo_mean_pos"] < r["loo_mean_neg"]
        assert 0.0 <= r["smoothed"] <= 1.0


# --- graph communities ------------------------------------------------------


def test_graph_communities_planted_two_cliques(spark):
    # suppliers {1,2,3} serve customer 1; suppliers {11,12} serve
    # customer 2 — two disjoint communities of sizes 3 and 2.
    li, orders, ok = [], [], 1
    for cust, supps in ((1, (1, 2, 3)), (2, (11, 12))):
        for supp in supps:
            orders.append((ok, cust, "O", 100.0, "2024-01-01", "P"))
            li.append(_li(ok, 1, supp))
            ok += 1
    with tempfile.TemporaryDirectory() as d:
        _write_orders(spark, d, orders)
        _write_lineitem(spark, d, li)
        out = {r["community_size"]: r["n_communities"]
               for r in _q("q_graph_communities")(spark, d).collect()}
    assert out == {3: 1, 2: 1}


def test_graph_communities_partition_nodes(spark):
    rows = _q("q_graph_communities")(spark, SF_SMOKE).collect()
    total_nodes = sum(r["community_size"] * r["n_communities"] for r in rows)
    tri = _q("q_knn_triangles")(spark, SF_SMOKE).collect()[0]
    assert total_nodes == tri["n_nodes"]  # same edge set, same node universe


# --- event paths ------------------------------------------------------------


def test_event_paths_planted(spark):
    # two users share a>b>c; one user goes a>c>b; a 2-event user drops
    events = [
        (1, "2024-01-01 00:00:00", 1, "a", 0.0, "{}"),
        (2, "2024-01-01 00:01:00", 1, "b", 0.0, "{}"),
        (3, "2024-01-01 00:02:00", 1, "c", 0.0, "{}"),
        (4, "2024-01-01 00:03:00", 1, "d", 0.0, "{}"),  # beyond PATH_LEN
        (5, "2024-01-01 00:00:00", 2, "a", 0.0, "{}"),
        (6, "2024-01-01 00:01:00", 2, "b", 0.0, "{}"),
        (7, "2024-01-01 00:02:00", 2, "c", 0.0, "{}"),
        (8, "2024-01-01 00:00:00", 3, "a", 0.0, "{}"),
        (9, "2024-01-01 00:01:00", 3, "c", 0.0, "{}"),
        (10, "2024-01-01 00:02:00", 3, "b", 0.0, "{}"),
        (11, "2024-01-01 00:00:00", 4, "a", 0.0, "{}"),
        (12, "2024-01-01 00:01:00", 4, "b", 0.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _write_events(spark, d, events)
        rows = _q("q_event_paths")(spark, d).orderBy("rk").collect()
    assert [(r["path"], r["n_users"], r["rk"]) for r in rows] == [
        ("a>b>c", 2, 1),
        ("a>c>b", 1, 2),
    ]


# --- cohort LTV -------------------------------------------------------------


def test_cohort_ltv_monotone_and_normalized(spark):
    rows = _q("q_cohort_ltv")(spark, SF_SMOKE).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort"], []).append(r)
    for cohort, rs in by_cohort.items():
        rs.sort(key=lambda r: r["age_days"])
        ltv = [r["cum_ltv_per_user"] for r in rs]
        assert all(b >= a for a, b in zip(ltv, ltv[1:]))  # cumulative
        assert all(r["age_days"] >= 0 for r in rs)
        assert len({r["n_users"] for r in rs}) == 1  # size constant per cohort


# --- diff-in-diff -----------------------------------------------------------


def test_diff_in_diff_planted_effect(spark):
    # control doubles 100→200; treated would double 150→300 but gets
    # +50 uplift → 350. DiD = (350-150) - (200-100) = 100.
    parts = [(1, "x", "B", "PROMO", 1, 1.0), (2, "y", "B", "STANDARD", 1, 1.0)]
    li = []
    k = 1
    for part, year, price in ((1, 1996, 150.0), (1, 1997, 350.0), (2, 1996, 100.0), (2, 1997, 200.0)):
        for _ in range(3):  # 3 identical lines per cell
            li.append((k, part, 1, 1, 1.0, price, 0.0, 0.0, "N", "O", f"{year}-06-01"))
            k += 1
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            parts,
            "p_partkey long, p_name string, p_brand string, p_type string, p_size int, p_retailprice double",
        ).write.parquet(f"{d}/part.parquet")
        _write_lineitem(spark, d, li)
        row = _q("q_diff_in_diff")(spark, d).collect()[0]
    assert row["treated_pre"] == 150.0 and row["treated_post"] == 350.0
    assert row["control_pre"] == 100.0 and row["control_post"] == 200.0
    assert row["did"] == 100.0 and row["n_lines"] == 12


# --- PMI collocations -------------------------------------------------------


def test_pmi_planted_collocation(spark):
    # repeating 'zig zag alpha beta': zig-zag / zag-alpha / alpha-beta
    # each occur 6x (PMI ln(4), tie broken lexicographically) while
    # the wrap-around beta-zig occurs only 5x (PMI ln(10/3)) — the
    # weaker association must rank strictly last.
    import math

    text = " ".join(["zig zag alpha beta"] * 6)
    docs = [(1, text, "en", "s", len(text))]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(f"{d}/documents.parquet")
        rows = _q("q_pmi_collocations")(spark, d).orderBy("rk").collect()
    assert [(r["w1"], r["w2"]) for r in rows] == [
        ("alpha", "beta"), ("zag", "alpha"), ("zig", "zag"), ("beta", "zig"),
    ]
    assert abs(rows[0]["pmi"] - math.log(4)) < 1e-5
    assert rows[3]["n_bi"] == 5
    assert abs(rows[3]["pmi"] - math.log(5 * 24 / 36)) < 1e-5


# --- percent of parent ------------------------------------------------------


def test_parent_share_sums_to_one_per_level(spark):
    rows = _q("q_parent_share")(spark, SF_SMOKE).collect()
    regions = [r for r in rows if r["level"] == "region"]
    nations = [r for r in rows if r["level"] == "nation"]
    assert abs(sum(r["share_of_parent"] for r in regions) - 1.0) < 1e-4
    by_region = {}
    for r in nations:
        assert r["nation"] is not None
        by_region.setdefault(r["region"], 0.0)
        by_region[r["region"]] += r["share_of_parent"]
    for reg, tot in by_region.items():
        assert abs(tot - 1.0) < 1e-4, (reg, tot)
    # region revenue equals the sum of its nations
    nat_rev = {}
    for r in nations:
        nat_rev[r["region"]] = nat_rev.get(r["region"], 0.0) + r["revenue"]
    for r in regions:
        assert abs(r["revenue"] - nat_rev[r["region"]]) < 1e-6


# --- bounded Bellman-Ford ---------------------------------------------------


def test_cheapest_route_planted_weights(spark):
    # line graph 1-2-3 via shared customers: w(1,2)=1/2 (2 common),
    # w(2,3)=1 (1 common). dist: 1→0, 2→0.5, 3→1.5
    li, orders, ok = [], [], 1
    for cust, supps in ((1, (1, 2)), (2, (1, 2)), (3, (2, 3))):
        for supp in supps:
            orders.append((ok, cust, "O", 100.0, "2024-01-01", "P"))
            li.append(_li(ok, 1, supp))
            ok += 1
    with tempfile.TemporaryDirectory() as d:
        _write_orders(spark, d, orders)
        _write_lineitem(spark, d, li)
        out = {r["node"]: r["dist"] for r in _q("q_cheapest_route")(spark, d).collect()}
    assert out == {1: 0.0, 2: 0.5, 3: 1.5}


def test_cheapest_route_triangle_shortcut(spark):
    # direct edge 1-3 is weak (w=1); the 1-2-3 detour is strong
    # (w=1/3 each) → Bellman-Ford must prefer the 2-hop 2/3 path.
    li, orders, ok = [], [], 1
    shared = {(1, 2): 3, (2, 3): 3, (1, 3): 1}
    cust = 1
    for (sa, sb), n in shared.items():
        for _ in range(n):
            for supp in (sa, sb):
                orders.append((ok, cust, "O", 100.0, "2024-01-01", "P"))
                li.append(_li(ok, 1, supp))
                ok += 1
            cust += 1
    with tempfile.TemporaryDirectory() as d:
        _write_orders(spark, d, orders)
        _write_lineitem(spark, d, li)
        out = {r["node"]: r["dist"] for r in _q("q_cheapest_route")(spark, d).collect()}
    assert out[2] == round(1 / 3, 6) or abs(out[2] - 1 / 3) < 1e-6
    assert abs(out[3] - 2 / 3) < 1e-6  # NOT the direct w=1 edge


# --- windowed funnel --------------------------------------------------------


def test_funnel_windowed_budgets_enforced(spark):
    # u1 converts inside both budgets; u2's click is 2h after view
    # (out of the 1h budget); u3's purchase is 2 days after click.
    events = [
        (1, "2024-01-01 00:00:00", 1, "view", 0.0, "{}"),
        (2, "2024-01-01 00:30:00", 1, "click", 0.0, "{}"),
        (3, "2024-01-01 10:00:00", 1, "purchase", 0.0, "{}"),
        (4, "2024-01-01 00:00:00", 2, "view", 0.0, "{}"),
        (5, "2024-01-01 02:00:00", 2, "click", 0.0, "{}"),
        (6, "2024-01-01 03:00:00", 2, "purchase", 0.0, "{}"),
        (7, "2024-01-01 00:00:00", 3, "view", 0.0, "{}"),
        (8, "2024-01-01 00:30:00", 3, "click", 0.0, "{}"),
        (9, "2024-01-03 01:00:00", 3, "purchase", 0.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _write_events(spark, d, events)
        out = {r["stage"]: r for r in _q("q_funnel_windowed")(spark, d).collect()}
    assert out["view"]["n_users"] == 3
    assert out["click_1h"]["n_users"] == 2      # u2 missed the 1h budget
    assert out["purchase_24h"]["n_users"] == 1  # u3 missed the 24h budget
    assert out["purchase_24h"]["conv_from_top"] == round(1 / 3, 4) or abs(out["purchase_24h"]["conv_from_top"] - 1/3) < 1e-3


# --- A/B test ---------------------------------------------------------------


def test_ab_test_null_on_hash_split(spark):
    # hash-split arms of ONE population: rates near-equal, |z| far
    # from significance — the null machinery must hold
    row = _q("q_ab_test")(spark, SF_SMOKE).collect()[0]
    assert row["n_control"] > 0 and row["n_treat"] > 0
    assert row["conv_control"] <= row["n_control"]
    assert row["conv_treat"] <= row["n_treat"]
    assert 0.0 <= row["rate_control"] <= 1.0 and 0.0 <= row["rate_treat"] <= 1.0
    if row["z_stat"] is not None:  # degenerate pooled rate → NULL by contract
        assert abs(row["z_stat"]) < 5.0  # same-population split: no real effect


def test_ab_test_detects_planted_effect(spark):
    # construct users whose conversion depends on their md5 arm:
    # arm-1 users purchase within a day, arm-0 users never do
    import hashlib

    events, eid = [], 1
    for u in range(1, 201):
        arm = int(hashlib.md5(f"ab-{u}".encode()).hexdigest()[:13], 16) % 2
        events.append((eid, "2024-01-01 00:00:00", u, "view", 0.0, "{}")); eid += 1
        if arm == 1:
            events.append((eid, "2024-01-01 05:00:00", u, "purchase", 1.0, "{}")); eid += 1
    with tempfile.TemporaryDirectory() as d:
        _write_events(spark, d, events)
        row = _q("q_ab_test")(spark, d).collect()[0]
    assert row["rate_control"] == 0.0 and row["rate_treat"] == 1.0
    assert row["significant"] == 1 and row["z_stat"] > 10


# --- embedding drift --------------------------------------------------------


def test_embed_drift_identical_halves_score_high(spark):
    # identical vectors in both periods → cosine exactly 1, shift 0
    vecs = [(i, [1.0, 2.0, 3.0, 4.0], 0) for i in range(10)]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            vecs, "vec_id long, embedding array<float>, label int"
        ).write.parquet(f"{d}/embeddings.parquet")
        row = _q("q_embed_drift")(spark, d).collect()[0]
    assert row["n_a"] == 5 and row["n_b"] == 5 and row["n_dims"] == 4
    assert row["cos_sim"] == 1.0 and row["l2_shift"] == 0.0


def test_embed_drift_orthogonal_shift_detected(spark):
    # period 0 on axis x, period 1 on axis y → cosine 0, shift sqrt(2)
    import math

    vecs = [(2 * i, [1.0, 0.0], 0) for i in range(5)]
    vecs += [(2 * i + 1, [0.0, 1.0], 0) for i in range(5)]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            vecs, "vec_id long, embedding array<float>, label int"
        ).write.parquet(f"{d}/embeddings.parquet")
        row = _q("q_embed_drift")(spark, d).collect()[0]
    assert row["cos_sim"] == 0.0
    assert abs(row["l2_shift"] - math.sqrt(2)) < 1e-6


# --- revenue bridge ---------------------------------------------------------


def test_revenue_bridge_decomposition_identity(spark):
    row = _q("q_revenue_bridge")(spark, SF_SMOKE).collect()[0]
    # the waterfall must reconstruct the delta exactly (within rounding)
    recon = row["volume_effect"] + row["price_effect"] + row["cross_effect"]
    assert abs(recon - row["delta_rev"]) < 1e-2
    assert abs(row["delta_rev"] - (row["rev_post"] - row["rev_pre"])) < 1e-2


def test_revenue_bridge_planted_pure_price_move(spark):
    # same quantities both years, unit price doubles → all delta is
    # price effect; volume and cross are exactly zero
    li = []
    k = 1
    for year, price in ((1996, 10.0), (1997, 20.0)):
        for _ in range(5):
            li.append((k, 1, 1, 1, 2.0, price * 2, 0.0, 0.0, "N", "O", f"{year}-06-01"))
            k += 1
    with tempfile.TemporaryDirectory() as d:
        _write_lineitem(spark, d, li)
        row = _q("q_revenue_bridge")(spark, d).collect()[0]
    assert row["volume_effect"] == 0.0 and row["cross_effect"] == 0.0
    assert row["price_effect"] == row["delta_rev"] == 100.0


# --- golden record ----------------------------------------------------------


def test_golden_record_survivorship_rules(spark):
    orders = [
        (1, 7, "O", 100.0, "2024-01-01", "B"),
        (2, 7, "F", 300.0, "2024-03-01", "A"),  # latest order → status F
        (3, 7, "P", 200.0, "2024-02-01", "A"),
        (4, 7, "O", 150.0, "2024-02-15", "C"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _write_orders(spark, d, orders)
        row = _q("q_golden_record")(spark, d).collect()[0]
    assert row["customer"] == 7 and row["n_orders"] == 4
    assert row["latest_status"] == "F"
    assert row["first_seen"].isoformat() == "2024-01-01"
    assert row["max_order_value"] == 300.0
    assert row["mode_priority"] == "A"  # 2×A beats 1×B, 1×C


def test_golden_record_mode_tie_breaks_lexicographic(spark):
    orders = [
        (1, 7, "O", 100.0, "2024-01-01", "Z"),
        (2, 7, "O", 100.0, "2024-01-02", "M"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _write_orders(spark, d, orders)
        row = _q("q_golden_record")(spark, d).collect()[0]
    assert row["mode_priority"] == "M"


# --- exact-substring duplicate spans ----------------------------------------


def test_dup_spans_planted_verbatim_overlap(spark):
    from real_time_fraud_revenue_intelligence_lakehouse_spark.plans.catalog_corpus3 import SPAN_K

    shared = " ".join(f"tok{i}" for i in range(12))  # 12-token verbatim span
    docs = [
        (1, shared + " unique one tail here", "en", "s", 1),
        (2, "different head text then " + shared, "en", "s", 1),
        (3, "completely unrelated words only appear here once today", "en", "s", 1),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(f"{d}/documents.parquet")
        out = {r["doc_id"]: r for r in _q("q_dup_spans")(spark, d).collect()}
    assert set(out) == {1, 2}  # doc 3 shares nothing
    for doc_id in (1, 2):
        assert out[doc_id]["n_spans"] == 1
        assert out[doc_id]["longest_span"] == 12
    assert 12 >= SPAN_K


def test_dup_spans_interval_union_no_double_count(spark):
    # one doc fully contained in another → share for the contained
    # doc is exactly 1.0 (overlapping shingle windows must merge)
    body = " ".join(f"w{i}" for i in range(30))
    docs = [
        (1, body, "en", "s", 1),
        (2, "prefix words here " + body + " suffix words there", "en", "s", 1),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(f"{d}/documents.parquet")
        out = {r["doc_id"]: r for r in _q("q_dup_spans")(spark, d).collect()}
    assert out[1]["dup_token_share"] == 1.0  # fully duplicated
    assert out[1]["n_spans"] == 1 and out[1]["longest_span"] == 30
    assert out[2]["longest_span"] == 30


def test_dup_spans_short_and_empty_docs_do_not_crash(spark):
    # regression: docs with < SPAN_K tokens used to hit Spark's
    # sequence(1, 0) == [1, 0] descending quirk, emitting i=0 and
    # crashing slice() with INVALID_PARAMETER_VALUE.START while the
    # DuckDB oracle (whose range(1, n) is empty) returned normally.
    shared = " ".join(f"tok{i}" for i in range(12))
    docs = [
        (1, shared + " unique one", "en", "s", 1),
        (2, "head then " + shared, "en", "s", 1),
        (3, "tiny doc", "en", "s", 1),  # 2 tokens < SPAN_K
        (4, "", "en", "s", 1),  # empty text
        (5, "exactly seven tokens sit right here now", "en", "s", 1),  # SPAN_K-1
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(f"{d}/documents.parquet")
        out = {r["doc_id"]: r for r in _q("q_dup_spans")(spark, d).collect()}
    # short/empty docs emit zero shingles → absent from output; the
    # planted pair still resolves
    assert set(out) == {1, 2}
    assert out[1]["longest_span"] == 12


# --- vocab coverage ---------------------------------------------------------


def test_vocab_coverage_bounds_and_planted_oov(spark):
    from real_time_fraud_revenue_intelligence_lakehouse_spark.plans.catalog_corpus3 import VOCAB_TOP

    # tiny corpus: vocab cap far above distinct tokens → zero OOV;
    # then a source whose tokens are all hapax-unique still fits when
    # total vocab < cap
    docs = [(i, "common words repeat here", "en", "core", 1) for i in range(5)]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(f"{d}/documents.parquet")
        row = _q("q_vocab_coverage")(spark, d).collect()[0]
    assert row["n_oov"] == 0 and row["oov_rate"] == 0.0
    assert VOCAB_TOP >= 4
    rows = _q("q_vocab_coverage")(spark, SF_SMOKE).collect()
    for r in rows:
        assert 0.0 <= r["oov_rate"] <= 1.0
        assert r["n_oov"] <= r["n_tokens"]


# --- DAU / WAU --------------------------------------------------------------


def test_active_users_planted_rolling_distinct(spark):
    # u1 active day1+day2; u2 active day1 only; u3 active day9 only.
    events = [
        (1, "2024-01-01 10:00:00", 1, "a", 0.0, "{}"),
        (2, "2024-01-02 10:00:00", 1, "a", 0.0, "{}"),
        (3, "2024-01-01 11:00:00", 2, "a", 0.0, "{}"),
        (4, "2024-01-09 11:00:00", 3, "a", 0.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as d:
        _write_events(spark, d, events)
        out = {r["day"].isoformat(): r for r in _q("q_active_users")(spark, d).collect()}
    assert out["2024-01-01"]["dau"] == 2 and out["2024-01-01"]["wau"] == 2
    assert out["2024-01-02"]["dau"] == 1 and out["2024-01-02"]["wau"] == 2  # u1+u2 in window
    assert out["2024-01-09"]["dau"] == 1 and out["2024-01-09"]["wau"] == 1  # day1/2 aged out
    assert out["2024-01-02"]["stickiness"] == 0.5


def test_active_users_wau_dominates_dau(spark):
    rows = _q("q_active_users")(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["wau"] >= r["dau"] > 0
        assert 0.0 < r["stickiness"] <= 1.0


# --- Gini / Pareto ----------------------------------------------------------


def test_gini_planted_extremes(spark):
    # perfectly equal revenues → gini 0; one whale and many zeros-ish
    orders_eq = [(i, i, "O", 100.0, "2024-01-01", "P") for i in range(1, 11)]
    with tempfile.TemporaryDirectory() as d:
        _write_orders(spark, d, orders_eq)
        row = _q("q_gini")(spark, d).collect()[0]
    assert row["n_customers"] == 10
    assert row["gini"] == 0.0
    assert row["top20_share"] == 0.2  # top 2 of 10 equal customers
    # one whale holding ~all revenue → gini near (n-1)/n
    orders_wh = [(1, 1, "O", 100000.0, "2024-01-01", "P")]
    orders_wh += [(i, i, "O", 1.0, "2024-01-01", "P") for i in range(2, 11)]
    with tempfile.TemporaryDirectory() as d:
        _write_orders(spark, d, orders_wh)
        row = _q("q_gini")(spark, d).collect()[0]
    assert row["gini"] > 0.89
    assert row["top20_share"] > 0.999


def test_gini_bounds_on_corpus(spark):
    row = _q("q_gini")(spark, SF_SMOKE).collect()[0]
    assert 0.0 <= row["gini"] < 1.0
    assert 0.2 <= row["top20_share"] <= 1.0  # top-20% hold at least 20%


# --- latency SLA ------------------------------------------------------------


def test_latency_sla_consistency(spark):
    from real_time_fraud_revenue_intelligence_lakehouse_spark.plans.catalog_analytics2 import SLA_DAYS

    rows = _q("q_latency_sla")(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["p50_days"] <= r["p95_days"]
        assert 0.0 <= r["breach_rate"] <= 1.0
        assert r["n_breach"] <= r["n_lines"]
        # p95 above the SLA implies a breach share above ~5%
        if r["p95_days"] > SLA_DAYS:
            assert r["breach_rate"] >= 0.05 - 1e-9
