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
# the union of r01+r02 green rows covers 96 queries; this front window
# holds every remaining driver-unverified query (all selfchecked
# green locally), ordered cheapest-first by measured runtime within
# each addition batch so a time-capped budget still maximizes green
# rows: first the 73 pre-round-5 stragglers, then the round-5 batch,
# then the round-6 batches in landing order. q_greedy_packing already
# holds its rows-only row from r02 and is excluded. Names not listed
# keep their registration order after these.
_FRONT: tuple[str, ...] = (
    "q_bool_bit_agg",
    "q_string_pad",
    "q_length_histogram",
    "q_audio_frames",
    "q_forecast_revenue",
    "q_regexp_funcs",
    "q_unpivot",
    "q_scalar_subquery",
    "q_salted_agg",
    "q_promo_share",
    "q_embed_quantize",
    "q_sample_limit",
    "q_bracket_revenue",
    "q_line_priority_mix",
    "q_cust_order_distribution",
    "q_multimodal_framesample",
    "q_rollup",
    "q_filter_clause",
    "q_order_priority_check",
    "q_top_supplier",
    "q_part_supplier_variety",
    "q_groupwise_min",
    "q_profile_cardinality",
    "q_interval_join",
    "q_rfm_segments",
    "q_paragraph_dedup",
    "q_excess_suppliers",
    "q_text_cleanup",
    "q_stats_agg",
    "q_having",
    "q_sliding_window",
    "q_zscore_outliers",
    "q_unigram_logprob",
    "q_product_profit",
    "q_dormant_customers",
    "q_decimal_money",
    "q_kmv_distinct",
    "q_winsorize",
    "q_retention_cohort",
    "q_volume_shipping",
    "q_intersect_check",
    "q_semi_join",
    "q_date_arith",
    "q_running_total",
    "q_cms_heavy_hitters",
    "q_array_ops",
    "q_vector_norms",
    "q_waiting_suppliers",
    "q_local_supplier_volume",
    "q_returned_revenue",
    "q_important_parts",
    "q_map_functions",
    "q_first_last",
    "q_bloom_prune",
    "q_json_roundtrip",
    "q_window_share",
    "q_anti_join",
    "q_event_funnel",
    "q_embed_pq",
    "q_knn_label_vote",
    "q_ivfpq_topk",
    "q_minmax_by",
    "q_correlated_subquery",
    "q_bm25",
    "q_fuzzy_match",
    "q_multimodal_resize",
    "q_market_share",
    "q_dup_ngram_ratio",
    "q_exif_meta",
    "q_dedup_pipeline",
    "q_pagerank",
    "q_pagerank_converge",
    "q_stateful_profile",
    # round-5 additions (slots 74+, cheapest-first by idle-machine
    # sf0.1 min-of-3) — reached only if the driver budget exceeds the
    # 73 above; otherwise they hold the round-4 window's head.
    "q_kfold",
    "q_priority_sample",
    "q_robust_scale",
    "q_skyline",
    "q_feature_hash",
    "q_benford",
    "q_round_amount_anomaly",
    "q_duplicate_invoice",
    "q_quantile_norm",
    "q_token_entropy",
    "q_k_anonymity",
    "q_psi",
    "q_gap_fill",
    "q_rolling_median",
    "q_event_transitions",
    "q_ks_test",
    "q_mad_outliers",
    "q_auc",
    "q_kmv_set_ops",
    "q_median_mode",
    "q_augment",
    "q_ewma",
    "q_bigram_logprob",
    "q_minhash_accuracy",
    "q_bfs_distance",
    "q_prefix_jaccard_join",
    "q_lsh_quality",
    # round-6 additions (slots 101+, cheapest-first by warm sf0.01
    # selfcheck runtime) — queue behind everything still unverified.
    "q_weighted_sample",
    "q_decile_lift",
    "q_topk_per_group",
    "q_allocation",
    "q_graph_degree",
    "q_cumulative_distinct",
    "q_twap",
    "q_basket_lift",
    "q_yoy_growth",
    "q_chi_square",
    "q_bpe_merges",
    "q_inverted_index",
    "q_knn_triangles",
    "q_survival_km",
    "q_cusum",
    "q_item_sim",
    "q_readability",
    "q_fd_discovery",
    "q_reconciliation",
    "q_abandoned",
    "q_ols_trend",
    "q_seasonal_anomaly",
    "q_bpe_encode",
    "q_scd2_lookup",
    "q_langid_confusion",
    "q_target_encoding",
    "q_graph_communities",
    "q_event_paths",
    "q_cohort_ltv",
    "q_diff_in_diff",
    "q_pmi_collocations",
    "q_parent_share",
    "q_cheapest_route",
    "q_embed_drift",
    "q_ab_test",
    "q_funnel_windowed",
    "q_revenue_bridge",
    "q_golden_record",
    "q_dup_spans",
    "q_vocab_coverage",
    "q_active_users",
    "q_gini",
    "q_latency_sla",
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
