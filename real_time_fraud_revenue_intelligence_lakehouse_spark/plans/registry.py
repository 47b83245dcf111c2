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
# in dict order with a ~50-entry per-round budget, so queries that
# have never had a driver-green row come FIRST. After CORRECTNESS_r02
# the union of r01+r02 green rows covers 98 of the round-2 queries;
# the round-3 front window is the 7 still-unverified round-2 tail
# entries plus every round-3 addition (42 total — inside one round's
# budget), ordered cheapest-first by sf0.01 oracle-check runtime in
# case the budget is time-based. Names not listed keep their
# registration order after these.
_FRONT: tuple[str, ...] = (
    # round-2 additions the r2 window didn't reach
    "q_intersect_check",
    "q_map_functions",
    "q_json_roundtrip",
    "q_multimodal_resize",
    "q_multimodal_framesample",
    "q_text_cleanup",
    "q_market_share",
    # round-3: relational depth
    "q_regexp_funcs",
    "q_decimal_money",
    "q_string_pad",
    "q_array_ops",
    "q_window_share",
    "q_anti_join",
    "q_semi_join",
    "q_first_last",
    "q_minmax_by",
    "q_length_histogram",
    "q_date_arith",
    "q_bool_bit_agg",
    "q_stats_agg",
    "q_running_total",
    "q_rollup",
    "q_profile_cardinality",
    "q_filter_clause",
    "q_unpivot",
    "q_scalar_subquery",
    "q_local_supplier_volume",
    "q_returned_revenue",
    "q_having",
    "q_correlated_subquery",
    # round-3: streaming + behavioral
    "q_kmv_distinct",
    "q_bloom_prune",
    "q_interval_join",
    "q_sliding_window",
    "q_zscore_outliers",
    "q_winsorize",
    "q_rfm_segments",
    "q_retention_cohort",
    "q_event_funnel",
    "q_salted_agg",
    # round-3: corpus depth (heaviest oracles close the window)
    "q_cms_heavy_hitters",
    "q_audio_frames",
    "q_exif_meta",
    "q_pagerank",
    "q_vector_norms",
    "q_bm25",
    "q_dup_ngram_ratio",
    "q_knn_label_vote",
    "q_dedup_pipeline",
    # round-4: slot 50 of the window (the other round-4 additions —
    # q_volume_shipping, q_product_profit, q_bracket_revenue,
    # q_stateful_profile, q_unigram_logprob, q_fuzzy_match,
    # q_embed_quantize — queue for the round-5 front window)
    "q_promo_share",
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
