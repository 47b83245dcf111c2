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


# Verification priority: the driver's correctness gate walks queries()
# in dict order with a hard 50-entry per-round budget (r01-r09 each
# sampled exactly 50; every registered id has at least one green row
# in the r01-r09 union), so queries needing a fresh driver row come
# FIRST. Recomputed at round 10 per VERDICT r9 #4 — the rolling
# re-verification rotation:
#   1-5:   round-10's NEW ids (no driver row yet);
#   6-11:  ids whose last driver row predates the round-8
#          corpus3/shared_frames plumbing their plans flow through
#          (BPE memo path touched r8; q_readability/q_embed_drift
#          hold r06 rows; q_pmi_collocations/q_dup_spans r07);
#   12-50: oldest-row-first — the r01 cleansing/relational block
#          (46 ids; the last 7 overflow past the 50-cap and lead the
#          round-11 rotation).
# Names not listed keep their registration order after these.
_FRONT: tuple[str, ...] = (
    # — new in round 10, never driver-verified —
    "q_misra_gries",
    "q_bpe_encode_external",
    "q_quantile_sketch",
    "q_quantile_by_key",
    "q_route_reconstruct",
    # — last row predates the r8 corpus3/shared_frames plumbing —
    "q_bpe_merges",
    "q_bpe_encode",
    "q_readability",
    "q_embed_drift",
    "q_pmi_collocations",
    "q_dup_spans",
    # — r01 rows, oldest first (registration order within) —
    "q_revenue_daily",
    "q_clean_filter",
    "q_dedup_keep_any",
    "q_enum_whitelist",
    "q_enum_mapping",
    "q_bucket_tier",
    "q_string_funcs",
    "q_scalar_math",
    "q_epoch_ms_to_date",
    "q_time_parts",
    "q_fillna",
    "q_casts",
    "q_json_parse",
    "q_hash_key",
    "q_lookup_join",
    "q_derived_flags",
    "q_feature_vector",
    "q_hourly_rollup",
    "q_explode_agg",
    "q_user_scores",
    "q_percentiles",
    "q_distinct_count",
    "q_topk",
    "q_union_all",
    "q_except_check",
    "q_grouping_sets",
    "q_dim_dates",
    "q_dim_users_segments",
    "q_fact_orders",
    "q_fact_fraud_events",
    "q_country_risk",
    "q_stg_payments",
    "q_dashboard_today",
    "q_pivot_status",
    "q_join_left",
    "q_join_lookup",
    "q_agg_join",
    "q_star_join",
    "q_latest_per_key",
    "q_ratio_to_user_avg",
    "q_ratio_to_user_p95",
    "q_lag_delta",
    # — 51+: overflow → round-11 front —
    "q_velocity_window",
    "q_asof_join",
    "q_merge_upsert",
    "q_ntile_quartiles",
)


def _ordered() -> dict[str, QuerySpec]:
    front = [n for n in _FRONT if n in _REGISTRY]
    rest = [n for n in _REGISTRY if n not in set(front)]
    return {n: _REGISTRY[n] for n in front + rest}


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: spec.fn for name, spec in _ordered().items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in _ordered().items() if spec.oracle is not None}


def specs() -> dict[str, QuerySpec]:
    _load_all()
    return _ordered()
