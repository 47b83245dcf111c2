"""Bucketed co-located joins — the big-join scale lever (SCALE.md):
two fact-sized tables bucketed on the join key join WITHOUT any
exchange, because bucket layout already satisfies the join's
distribution requirement."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def no_broadcast(spark):
    """Force the join planner away from broadcast so the test shows
    the bucketing effect (broadcast would hide the shuffle anyway)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_shuffle(spark, sf_dir, no_broadcast):
    # warehouse dir is set at session build (session.get_spark).
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS customer_bkt")
    # the in-memory catalog forgets tables across sessions but their
    # files persist — clear stale locations so saveAsTable can recreate
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("orders_bkt", "customer_bkt"):
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    (
        orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("orders_bkt")
    )
    (
        customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("customer_bkt")
    )
    joined = spark.table("orders_bkt").join(
        spark.table("customer_bkt"),
        F.col("o_custkey") == F.col("c_custkey"),
    ).select("o_orderkey", "o_custkey", "c_name")

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, "bucketed join still shuffled"

    # correctness: same result as the plain (shuffling) join
    want = orders.join(customer, orders.o_custkey == customer.c_custkey).count()
    assert joined.count() == want
