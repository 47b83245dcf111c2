"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the engine's declared-query registry
(`real_time_fraud_revenue_intelligence_lakehouse_spark/plans/registry.py`):
every SURVEY.md §2 operator registers a PySpark callable and (when
SQL-expressible) a DuckDB oracle twin there; this module just
re-exports the registry to the driver.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from real_time_fraud_revenue_intelligence_lakehouse_spark.plans import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Both flagships on sf0.001: the LLM-corpus dedup pipeline
    (MinHash-LSH pairs → connected components → surviving corpus,
    `q_dedup_pipeline`) executes fully against a noop sink — the
    single-call demonstration of the training-data tier — and the
    relational flagship (revenue-daily aggregate) is returned as the
    DataFrame the driver collects, keeping entry()'s output schema
    stable across rounds."""
    sf = "/root/testdata/sf0.001"
    qs = registry.all_queries()
    qs["q_dedup_pipeline"](spark, sf).write.format("noop").mode("overwrite").save()
    return qs["q_revenue_daily"](spark, sf)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    return registry.all_oracles()
