"""Declared-query registry — the engine's correctness contract.

Every operator from SURVEY.md §2 registers here as a named query:
a PySpark callable ``fn(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) an equivalent ANSI-SQL string the DuckDB oracle runs
on the same parquet tables. `__spark_entry__.py` simply re-exports
this registry to the driver.

Column-name discipline: the driver's comparator sorts columns by name
and hashes values, so the Spark result and the oracle SQL must agree
on every output column name — alias everything on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from real_time_fraud_revenue_intelligence_lakehouse_spark.session import tune


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register ``fn(spark, sf_dir)`` as a declared query."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # The driver may hand us a session we didn't build; pin
            # the determinism-critical runtime confs before planning.
            tune(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if name in _REGISTRY:
            raise ValueError(f"duplicate query id: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=wrapped, oracle=oracle, tags=tags, doc=fn.__doc__ or "")
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import real_time_fraud_revenue_intelligence_lakehouse_spark.plans.catalog  # noqa: F401


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: spec.fn for name, spec in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in _REGISTRY.items() if spec.oracle is not None}


def specs() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)
