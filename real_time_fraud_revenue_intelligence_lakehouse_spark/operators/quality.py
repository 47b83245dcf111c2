"""Data-quality predicates as composable DataFrame operators.

Re-expresses the reference's SQL validation runner
(`data_quality/validate.py:67-171`) and dbt generic tests
(`dbt/models/*/schema.yml`) as Spark checks. Each check yields a
one-row DataFrame ``(check_name, violations)``; :func:`run_suite`
unions them into a single result with pass flags — the engine's own
regression harness (SURVEY §7 M4).

Every check is a pure aggregation — at 100 TB each is one scan with a
map-side-combinable count; the whole suite over one table can share a
single scan by fusing the counts into one agg (see fused_counts).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _one(df: DataFrame, name: str, violations: Column) -> DataFrame:
    return df.agg(violations.cast("long").alias("violations")).select(
        F.lit(name).alias("check_name"), "violations"
    )


def check_not_null(df: DataFrame, col: str, name: str | None = None) -> DataFrame:
    """`COUNT(*) WHERE col IS NULL` (`validate.py:67-78`)."""
    return _one(df, name or f"not_null_{col}", F.count(F.when(F.col(col).isNull(), True)))


def check_unique(df: DataFrame, col: str, name: str | None = None) -> DataFrame:
    """`COUNT(*) - COUNT(DISTINCT col)` (`validate.py:80-91`)."""
    return _one(
        df, name or f"unique_{col}", F.count(F.col(col)) - F.countDistinct(F.col(col))
    )


def check_range(
    df: DataFrame, col: str, lo: float, hi: float, name: str | None = None
) -> DataFrame:
    """`COUNT(*) WHERE col < lo OR col > hi` (`validate.py:93-116`)."""
    c = F.col(col)
    return _one(
        df, name or f"range_{col}", F.count(F.when((c < lo) | (c > hi), True))
    )


def check_min_rows(df: DataFrame, n: int, name: str) -> DataFrame:
    """`COUNT(*) >= n` → 0/1 violations (`validate.py:140-150`)."""
    return _one(df, name, F.when(F.count(F.lit(1)) >= n, 0).otherwise(1))


def check_accepted_values(
    df: DataFrame, col: str, values: list, name: str | None = None
) -> DataFrame:
    """dbt accepted_values: rows outside the whitelist."""
    return _one(
        df,
        name or f"accepted_values_{col}",
        F.count(F.when(~F.col(col).isin(values) | F.col(col).isNull(), True)),
    )


def check_fk(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    name: str,
) -> DataFrame:
    """dbt relationships test = orphan count via LEFT ANTI join
    (`schema.yml` relationships; SURVEY §2.10 q_dq_fk). The anti join
    broadcasts the parent's key column when small; at 100 TB both
    sides shuffle on the key — same cost as the production join it
    guards."""
    orphans = child.join(
        parent.select(F.col(parent_key).alias(child_key)), child_key, "left_anti"
    )
    return _one(orphans, name, F.count(F.lit(1)))


def check_freshness(
    df: DataFrame,
    ts_col: str,
    max_hours: float,
    now: str,
    name: str | None = None,
) -> DataFrame:
    """Freshness check (`validate.py:118-138`): violation when the
    newest ``ts_col`` is older than ``max_hours`` relative to ``now``,
    or the table is empty.

    ``now`` is INJECTED ('YYYY-MM-DD HH:MM:SS', UTC) instead of the
    reference's wall clock — same semantics, but deterministic and
    therefore oracle-checkable; production callers pass the pipeline
    run's logical timestamp."""
    age_h = (
        F.unix_timestamp(F.lit(now)) - F.unix_timestamp(F.max(F.col(ts_col)))
    ) / 3600.0
    stale = F.when(F.max(F.col(ts_col)).isNull(), 1).when(age_h > max_hours, 1).otherwise(0)
    return _one(df, name or f"freshness_{ts_col}_max{int(max_hours)}h", stale)


def check_expression(df: DataFrame, predicate: Column, name: str) -> DataFrame:
    """dbt expression_is_true: rows violating an arbitrary predicate."""
    return _one(df, name, F.count(F.when(~predicate, True)))


def run_suite(checks: list[DataFrame]) -> DataFrame:
    """Union all check rows and derive the pass flag."""
    out = reduce(lambda a, b: a.unionByName(b), checks)
    return out.withColumn("passed", F.col("violations") == 0)


def fused_counts(df: DataFrame, violations: dict[str, Column]) -> DataFrame:
    """All same-table checks in ONE scan: a single aggregation
    computes every violation count, then `stack` unpivots to the
    suite's (check_name, violations, passed) shape.

    This is the 100 TB form — run_suite over N per-check DataFrames
    scans the table N times (fine at test scale, wasteful at
    petabytes); fused_counts is plan-equivalent to N checks but
    costs one pass. Join-based checks (FK) can't fuse and stay
    separate."""
    row = df.agg(
        *[v.cast("long").alias(f"v{i}") for i, (_, v) in enumerate(violations.items())]
    )
    stack_args = ", ".join(
        f"'{name}', v{i}" for i, name in enumerate(violations)
    )
    out = row.selectExpr(
        f"stack({len(violations)}, {stack_args}) as (check_name, violations)"
    )
    return out.withColumn("passed", F.col("violations") == 0)


def not_null_violations(col: str) -> Column:
    return F.count(F.when(F.col(col).isNull(), True))


def unique_violations(col: str) -> Column:
    return F.count(F.col(col)) - F.countDistinct(F.col(col))


def range_violations(col: str, lo: float, hi: float) -> Column:
    c = F.col(col)
    return F.count(F.when((c < lo) | (c > hi), True))
