"""Operator-level tests: velocity dual-form equality (SURVEY §7 risk
item) and MERGE upsert semantics/idempotency."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_fraud_revenue_intelligence_lakehouse_spark.operators.merge import merge_upsert
from real_time_fraud_revenue_intelligence_lakehouse_spark.operators.velocity import (
    velocity_rangeframe,
    velocity_selfjoin,
)
from real_time_fraud_revenue_intelligence_lakehouse_spark.sources.tables import read_table


def test_velocity_forms_agree(spark, sf_dir):
    """Range-frame window ≡ reference's band self-join on real data,
    including duplicate-timestamp and window-boundary behavior."""
    e = read_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    a = velocity_rangeframe(e, "user_id", "ts").select(
        "event_id", "velocity_1h", "velocity_24h", "velocity_7d"
    )
    b = velocity_selfjoin(e, "user_id", "ts", ["event_id", "user_id", "ts"]).select(
        "event_id", "velocity_1h", "velocity_24h", "velocity_7d"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_velocity_strict_interval(spark):
    """[ts-W, ts): row exactly W ms earlier counts; same-ms peer does
    not; the row itself does not."""
    rows = [
        (1, 100, 1_000_000),  # base
        (2, 100, 1_000_000),  # same-ms peer of 1
        (3, 100, 1_000_000 + 3_600_000),  # exactly 1h later: includes ts-W row
        (4, 100, 1_000_000 + 3_600_001),  # 1h+1ms later: row1/2 fall out
    ]
    df = spark.createDataFrame(rows, "event_id INT, user_id INT, ms LONG").select(
        "event_id", "user_id", F.timestamp_millis(F.col("ms")).alias("ts")
    )
    got = {
        r["event_id"]: r["velocity_1h"]
        for r in velocity_rangeframe(df, "user_id", "ts", {"1h": 3_600_000}).collect()
    }
    assert got == {1: 0, 2: 0, 3: 2, 4: 1}


def test_merge_upsert_semantics(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b")], "k INT, v STRING")
    source = spark.createDataFrame([(2, "B"), (3, "C")], "k INT, v STRING")
    got = {r["k"]: r["v"] for r in merge_upsert(target, source, ["k"]).collect()}
    assert got == {1: "a", 2: "B", 3: "C"}  # update, keep, insert


def test_merge_upsert_idempotent(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b")], "k INT, v STRING")
    source = spark.createDataFrame([(2, "B"), (3, "C")], "k INT, v STRING")
    once = merge_upsert(target, source, ["k"])
    twice = merge_upsert(once, source, ["k"])
    assert sorted(once.collect()) == sorted(twice.collect())


def test_salted_topk_equals_naive_window_any_salts(spark):
    from pyspark.sql import Window
    from real_time_fraud_revenue_intelligence_lakehouse_spark.operators.topk import salted_topk
    from real_time_fraud_revenue_intelligence_lakehouse_spark.sources.tables import read_table
    from tests.conftest import SF_SMOKE

    o = read_table(spark, SF_SMOKE, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    naive = {
        (r["o_orderstatus"], r["rk"], r["o_orderkey"])
        for r in o.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 5).collect()
    }
    for salts in (1, 2, 32):  # salt count must never change the result
        got = {
            (r["o_orderstatus"], r["rk"], r["o_orderkey"])
            for r in salted_topk(
                o, ["o_orderstatus"], [F.desc("o_totalprice")], "o_orderkey", 5, salts=salts
            ).collect()
        }
        assert got == naive, salts


def test_largest_remainder_sum_preserving_extremes(spark):
    from real_time_fraud_revenue_intelligence_lakehouse_spark.operators.allocation import largest_remainder

    # pathological weights: one dominant, several tiny, one zero
    df = spark.createDataFrame(
        [("a", 97.3), ("b", 1.1), ("c", 1.1), ("d", 0.5), ("e", 0.0)],
        "k string, w double",
    )
    for budget in (1, 7, 100, 9999):
        rows = largest_remainder(df, "k", "w", budget).collect()
        assert sum(r["alloc"] for r in rows) == budget
        assert all(r["alloc"] >= 0 for r in rows)
        by = {r["k"]: r["alloc"] for r in rows}
        assert by["e"] <= 1  # zero weight gets at most a remainder unit


def test_largest_remainder_all_zero_weights_fails_loudly(spark):
    from real_time_fraud_revenue_intelligence_lakehouse_spark.operators.allocation import largest_remainder

    # regression: an all-zero (or all-NULL) weight frame used to
    # yield NULL allocations, silently breaking sum(alloc)==budget
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    for rows in ([("a", 0.0), ("b", 0.0)], [("a", None), ("b", None)]):
        df = spark.createDataFrame(rows, "k string, w double")
        with pytest.raises((SparkRuntimeException, Py4JJavaError)) as ei:
            largest_remainder(df, "k", "w", 10).collect()
        assert "largest_remainder" in str(ei.value)


def test_union_intervals_merges_overlap_and_adjacency(spark):
    from real_time_fraud_revenue_intelligence_lakehouse_spark.operators.intervals import union_intervals

    rows = [
        ("a", 1, 5), ("a", 4, 8),    # overlap → one island 1-8
        ("a", 9, 10),                # adjacent (9 = 8+1) → merges at adjacency=1
        ("a", 20, 25),               # disjoint
        ("b", 3, 3),
    ]
    df = spark.createDataFrame(rows, "k string, s int, e int")
    got = {
        (r["k"], r["island_id"]): (r["start"], r["end"], r["n_intervals"])
        for r in union_intervals(df, ["k"], "s", "e").collect()
    }
    assert got == {
        ("a", 1): (1, 10, 3),
        ("a", 2): (20, 25, 1),
        ("b", 1): (3, 3, 1),
    }
    strict = {
        (r["k"], r["island_id"]): (r["start"], r["end"])
        for r in union_intervals(df, ["k"], "s", "e", adjacency=0).collect()
    }
    # with adjacency=0 the touching 9-10 interval stays separate
    assert strict[("a", 1)] == (1, 8) and strict[("a", 2)] == (9, 10)


def test_distributed_row_number_matches_single_partition_window(spark):
    """The sketch-banded rank (operators/ranking.py) must be
    bit-identical to the Exchange-SinglePartition window form it
    replaces — including under heavy score ties, where banding only
    works because tied scores always share a band."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from real_time_fraud_revenue_intelligence_lakehouse_spark.operators.ranking import distributed_row_number

    rows = [(i, float((i * 37) % 11), f"k{i:04d}") for i in range(500)]  # 11 distinct scores → brutal ties
    df = spark.createDataFrame(rows, "id int, score double, key string")

    for descending in (True, False):
        order = [F.desc("score") if descending else F.asc("score"), F.asc("key")]
        want = {
            r["id"]: r["rn"]
            for r in df.select("id", F.row_number().over(Window.orderBy(*order)).alias("rn")).collect()
        }
        got = {
            r["id"]: (r["rn"], r["n"])
            for r in distributed_row_number(
                df, "score", [F.asc("key")], descending=descending, bands=8,
                rn_col="rn", total_col="n",
            ).select("id", "rn", "n").collect()
        }
        assert all(n == 500 for _, n in got.values())
        assert {i: rn for i, (rn, _) in got.items()} == want


def test_distributed_row_number_no_single_partition_window_over_base(spark):
    """The plan's only row_number WindowExec is band-partitioned; the
    sole SinglePartition exchanges sit over the <=bands+1-row counts
    frame."""
    from pyspark.sql import functions as F

    from real_time_fraud_revenue_intelligence_lakehouse_spark.operators.ranking import distributed_row_number

    df = spark.range(0, 2000).select(
        F.col("id"), (F.col("id") % 97).cast("double").alias("score")
    )
    out = distributed_row_number(df, "score", [F.asc("id")], bands=8, rn_col="rn")
    plan = out._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "row_number()" in line:
            assert "__rank_band" in line, line


def test_ntile_banded_matches_window_ntile(spark):
    """ntile_banded must replicate SQL ntile's remainder rule exactly
    (first n-mod-k tiles get the extra row), including when n % k != 0
    and under score ties."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from real_time_fraud_revenue_intelligence_lakehouse_spark.operators.ranking import ntile_banded

    for n, k in ((503, 4), (500, 7), (10, 4), (3, 4)):
        rows = [(i, float((i * 13) % 29)) for i in range(n)]
        df = spark.createDataFrame(rows, "id int, score double")
        want = {
            r["id"]: r["t"]
            for r in df.select(
                "id", F.ntile(k).over(Window.orderBy("score", "id")).alias("t")
            ).collect()
        }
        got = {
            r["id"]: r["t"]
            for r in ntile_banded(
                df, k, "score", [F.asc("id")], bands=8, out_col="t"
            ).collect()
        }
        assert got == want, (n, k)


def test_rank_positions_match_window_forms(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from real_time_fraud_revenue_intelligence_lakehouse_spark.operators.ranking import rank_positions

    rows = [(i, float((i * 7) % 13)) for i in range(400)]
    df = spark.createDataFrame(rows, "id int, score double")
    w = Window.orderBy("score", "id")
    want = {
        r["id"]: (r["p"], r["c"])
        for r in df.select(
            "id",
            F.percent_rank().over(w).alias("p"),
            F.cume_dist().over(w).alias("c"),
        ).collect()
    }
    got = {
        r["id"]: (r["pct_rank"], r["cume_dist"])
        for r in rank_positions(df, "score", [F.asc("id")], bands=8).collect()
    }
    assert got == want


def test_distributed_cumsum_matches_window_forms(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from real_time_fraud_revenue_intelligence_lakehouse_spark.operators.ranking import distributed_cumsum

    rows = [(float(i), i % 7, (i * 3) % 5) for i in range(1000)]
    df = spark.createDataFrame(rows, "v double, a int, b int")
    for exclusive in (False, True):
        end = -1 if exclusive else 0
        w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, end)
        want = {
            r["v"]: (r["ca"], r["cb"])
            for r in df.select(
                "v",
                F.coalesce(F.sum("a").over(w), F.lit(0)).alias("ca"),
                F.coalesce(F.sum("b").over(w), F.lit(0)).alias("cb"),
            ).collect()
        }
        got = {
            r["v"]: (r["cum_a"], r["cum_b"])
            for r in distributed_cumsum(
                df, "v", ["a", "b"], bands=8, exclusive=exclusive
            ).collect()
        }
        assert got == want, exclusive


def test_select_kth_matches_sorted_indexing(spark):
    import random

    from pyspark.sql import functions as F  # noqa: F401

    from real_time_fraud_revenue_intelligence_lakehouse_spark.operators.ranking import select_kth

    rng = random.Random(7)
    vals = [round(rng.uniform(-100, 100), 3) for _ in range(5000)] + [1.5] * 50  # dup block
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    sv = sorted(vals)
    n = len(vals)
    for k in (1, 2, (n + 1) // 2, n - 1, n):
        assert select_kth(df, "v", k, bands=8) == sv[k - 1], k
    assert select_kth(df, "v", bands=8) == sv[(n + 1) // 2 - 1]  # lower median default
    assert select_kth(spark.createDataFrame([], "v double"), "v") is None
    # overstated caller-supplied n → clear error, not a TypeError deep
    # in the band scan (ADVICE r11 #4)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="outside actual row count"):
        select_kth(df, "v", k=n + 500, n=n + 1000, bands=8)
    # r16 n-trusting small path: exact n → same answers as the
    # counted path in ONE job; a merely-overstated n (valid k) still
    # errors loudly instead of selecting against the wrong rank base.
    for k in (1, (n + 1) // 2, n):
        assert select_kth(df, "v", k, n=n, bands=8) == sv[k - 1], k
    assert select_kth(df, "v", n=n, bands=8) == sv[(n + 1) // 2 - 1]
    with _pytest.raises(ValueError, match="outside actual row count"):
        select_kth(df, "v", n=n + 1, bands=8)
