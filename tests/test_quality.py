"""Unit tests for the data-quality operator suite (SURVEY §2.10, M4).

Tiny literal DataFrames, known violation counts — the per-operator
layer the reference lacks (its Spark transforms are untested, SURVEY
§5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_fraud_revenue_intelligence_lakehouse_spark.operators.quality import (
    check_accepted_values,
    check_expression,
    check_fk,
    check_min_rows,
    check_not_null,
    check_range,
    check_unique,
    run_suite,
)


def _violations(df) -> int:
    return df.collect()[0]["violations"]


def test_quality_checks(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "ok"), (2, -5.0, "ok"), (2, 200.0, "bad"), (None, 50.0, None)],
        "k INT, amount DOUBLE, status STRING",
    )
    assert _violations(check_not_null(df, "k")) == 1
    assert _violations(check_unique(df, "k")) == 1  # k=2 twice → 3 non-null - 2 distinct
    assert _violations(check_range(df, "amount", 0, 100)) == 2  # -5, 200
    assert _violations(check_min_rows(df, 4, "min4")) == 0
    assert _violations(check_min_rows(df, 5, "min5")) == 1
    assert _violations(check_accepted_values(df, "status", ["ok"])) == 2  # bad + null
    assert _violations(check_expression(df, F.col("amount") > 0, "pos")) == 1  # -5


def test_quality_fk(spark):
    child = spark.createDataFrame([(1, 10), (2, 20), (3, 99)], "id INT, fk INT")
    parent = spark.createDataFrame([(10,), (20,)], "pk INT")
    assert _violations(check_fk(child, parent, "fk", "pk", "fk_test")) == 1


def test_fused_counts_single_scan_equivalence(spark):
    """fused_counts must produce exactly what the per-check
    DataFrames produce — in one aggregation (one Exchange in the
    plan) instead of one scan per check."""
    import contextlib
    import io

    from real_time_fraud_revenue_intelligence_lakehouse_spark.operators.quality import (
        fused_counts,
        not_null_violations,
        range_violations,
        unique_violations,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (2, 200.0), (None, 50.0)], "k INT, amount DOUBLE"
    )
    fused = fused_counts(
        df,
        {
            "not_null_k": not_null_violations("k"),
            "unique_k": unique_violations("k"),
            "range_amount": range_violations("amount", 0, 100),
        },
    )
    got = {r["check_name"]: (r["violations"], r["passed"]) for r in fused.collect()}
    assert got == {
        "not_null_k": (1, False),
        "unique_k": (1, False),
        "range_amount": (2, False),
    }
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fused.explain("formatted")
    # one aggregation over one scan node — not three (count physical
    # node entries, not raw text: formatted output repeats names)
    import re

    scan_nodes = [n for n in re.findall(r"\(\d+\) (\w[\w ]*)", buf.getvalue()) if "Scan" in n]
    assert len(scan_nodes) == 1, scan_nodes


def test_quality_suite_shape(spark):
    df = spark.createDataFrame([(1,), (None,)], "k INT")
    out = run_suite([check_not_null(df, "k"), check_unique(df, "k")]).collect()
    by_name = {r["check_name"]: (r["violations"], r["passed"]) for r in out}
    assert by_name == {"not_null_k": (1, False), "unique_k": (0, True)}


def test_k_anonymity_accounts_for_every_row(spark):
    from real_time_fraud_revenue_intelligence_lakehouse_spark.plans import registry
    from real_time_fraud_revenue_intelligence_lakehouse_spark.plans.catalog_quality import KANON_K
    from real_time_fraud_revenue_intelligence_lakehouse_spark.sources.tables import read_table
    from tests.conftest import SF_SMOKE

    rows = registry.all_queries()["q_k_anonymity"](spark, SF_SMOKE).collect()
    total = read_table(spark, SF_SMOKE, "customer").count()
    assert sum(r["group_size"] for r in rows) == total
    for r in rows:
        assert r["violates_k"] == (1 if r["group_size"] < KANON_K else 0)
    assert abs(sum(r["row_share"] for r in rows) - 1.0) < 1e-3
