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
# in dict order with a hard 50-entry per-round budget (r01-r10 each
# sampled exactly 50; every registered id has at least one green row
# in the r01-r10 union), so queries needing a fresh driver row come
# FIRST. Recomputed at round 11 per VERDICT r10 #4 — the rolling
# re-verification rotation:
#   1-16:  round-11's NEW ids (no driver row yet — the round added
#          15 queries) + q_decile_lift, whose ranking stage was
#          rewritten this round (sketch-banded rank, VERDICT r10 #1)
#          and needs a fresh row at HEAD;
#   17-23: the 7 ids that overflowed round-10's 50-cap and still hold
#          r01 rows;
#   24-43: the r02 block (20 ids, registration order within);
#   44-50: the r04 block head (registration order; the r04 tail past
#          the cap leads the round-12 rotation).
# Names not listed keep their registration order after these.
# Planned-but-not-yet-registered names are harmless: _ordered()
# filters on membership.
_FRONT: tuple[str, ...] = (
    # — new in round 11, never driver-verified —
    "q_active_users_hll",
    "q_hits",
    "q_attribution_last_touch",
    "q_attribution_linear",
    "q_interarrival_stats",
    "q_theil_sen",
    "q_stream_interval_join",
    "q_calibration",
    "q_degree_assortativity",
    "q_ewma_recursive",
    "q_distinct_hll_shards",
    "q_conversion_latency",
    "q_new_vs_returning",
    "q_personalized_pagerank",
    "q_embed_dim_truncation",
    "q_ivf_nprobe_curve",
    "q_price_elasticity",
    "q_hhi_concentration",
    # — plan rewritten round 11 (sketch-banded deciles) —
    "q_decile_lift",
    # — r01 rows: overflowed round-10's 50-cap —
    "q_velocity_window",
    "q_asof_join",
    "q_merge_upsert",
    "q_ntile_quartiles",
    "q_ratio_to_user_avg",
    "q_ratio_to_user_p95",
    "q_lag_delta",
    # — r02 rows (registration order) —
    "q_bool_sum_agg",
    "q_trend_7d",
    "q_percent_rank",
    "q_incremental_month",
    "q_dq_suite",
    "q_dq_freshness",
    "q_dq_fk_orphans",
    "q_train_test_split",
    "q_stratified_sample",
    "q_sequence_packing",
    "q_scd2_segments",
    "q_cdc_apply",
    "q_fraud_scores",
    "q_gbt_scores",
    "q_sql_mart_monthly",
    "q_stream_tumbling",
    "q_session_window",
    "q_sessionize_batch",
    "q_high_risk_users",
    "q_revenue_by_method",
    # — r04 rows (registration order; tail past the 50-cap leads r12) —
    "q_retention_cohort",
    "q_rfm_segments",
    "q_winsorize",
    "q_zscore_outliers",
    "q_interval_join",
    "q_multimodal_framesample",
    "q_intersect_check",
    "q_volume_shipping",
    "q_product_profit",
    "q_promo_share",
    "q_bracket_revenue",
    "q_semi_join",
    "q_scalar_subquery",
    "q_having",
    "q_rollup",
    "q_running_total",
    "q_stats_agg",
    "q_array_ops",
    "q_regexp_funcs",
    "q_decimal_money",
    "q_local_supplier_volume",
    "q_returned_revenue",
    "q_salted_agg",
    "q_filter_clause",
    "q_date_arith",
    "q_string_pad",
    "q_bool_bit_agg",
    "q_unpivot",
    "q_profile_cardinality",
    "q_kmv_distinct",
    "q_sliding_window",
    "q_order_priority_check",
    "q_line_priority_mix",
    "q_cust_order_distribution",
    "q_top_supplier",
    "q_waiting_suppliers",
    "q_dormant_customers",
    "q_forecast_revenue",
    "q_part_supplier_variety",
    "q_excess_suppliers",
    "q_groupwise_min",
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
