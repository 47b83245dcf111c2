"""Partitioned batch writes → partition-pruned reads (the SCALE.md
storage-layout claim, demonstrated end-to-end)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from real_time_fraud_revenue_intelligence_lakehouse_spark.sources.tables import write_batch


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .withColumn("order_year", F.year("o_orderdate"))
    )
    out = str(tmp_path / "orders_by_year")
    write_batch(orders, out, mode="overwrite", partition_by=["order_year"])

    # physical layout: one directory per year
    years = sorted(
        p.name for p in (tmp_path / "orders_by_year").iterdir() if p.name.startswith("order_year=")
    )
    assert len(years) >= 5

    back = spark.read.parquet(out).filter(F.col("order_year") == 1997)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.explain("formatted")
    plan = buf.getvalue()
    # the year predicate must land in PartitionFilters (pruning), not
    # as a post-scan Filter over all partitions
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "order_year" in pf_line and "1997" in pf_line

    # and the values round-trip
    want = orders.filter(F.col("order_year") == 1997).count()
    assert back.count() == want > 0


def test_multi_format_roundtrip(spark, sf_dir, tmp_path):
    """S16 extension — the engine's batch write/read path must be
    format-agnostic: parquet, ORC, JSON and CSV all round-trip the
    same rows through write_batch (schema supplied on read for the
    text formats, as any production pipeline must)."""
    src = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .filter(F.col("o_orderkey") % 100 == 0)
    )
    want = sorted(tuple(r) for r in src.collect())
    schema = src.schema
    for fmt in ["parquet", "orc", "json", "csv"]:
        out = str(tmp_path / f"rt_{fmt}")
        write_batch(src, out, mode="overwrite", fmt=fmt)
        reader = spark.read.format(fmt)
        if fmt in ("json", "csv"):
            reader = reader.schema(schema)
        if fmt == "csv":
            reader = reader.option("header", "false")
        back = reader.load(out)
        got = sorted(tuple(r) for r in back.collect())
        assert got == want, f"{fmt} roundtrip mismatch"


def test_dynamic_partition_pruning_on_dim_join(spark, tmp_path):
    """Runtime partition pruning — the 100 TB lever beyond static
    pruning: a fact partitioned by month, joined to a dim row that
    selects ONE month, must plan a `dynamicpruning` subquery in the
    scan's PartitionFilters (Catalyst prunes fact partitions at
    RUNTIME from the dim's filter result — no literal month appears
    in the query). This is why the engine's partitioned writes key on
    low-cardinality dates: star joins then scan only the months the
    dim side selects."""
    from pyspark.sql import functions as F

    from real_time_fraud_revenue_intelligence_lakehouse_spark.sources.tables import write_batch

    fact_path = str(tmp_path / "fact_by_month")
    o = (
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .withColumn("order_month", F.date_format("o_orderdate", "yyyy-MM"))
    )
    write_batch(o, fact_path, mode="overwrite", partition_by=["order_month"])
    fact = spark.read.parquet(fact_path)

    months = [r["order_month"] for r in fact.select("order_month").distinct().collect()]
    dim = spark.createDataFrame(
        [(m, 1 if i == 0 else 0) for i, m in enumerate(sorted(months))],
        "order_month string, is_focus int",
    )
    joined = fact.join(F.broadcast(dim).filter(F.col("is_focus") == 1), "order_month")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # and the join really returns only the focus month's rows
    got_months = {r["order_month"] for r in joined.select("order_month").distinct().collect()}
    assert got_months == {sorted(months)[0]}
