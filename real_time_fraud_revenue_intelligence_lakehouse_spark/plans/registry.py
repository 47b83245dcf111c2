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
# have never had a driver-green row come FIRST. After CORRECTNESS_r04
# the union of r01+r02+r04 green rows covers 147 of 240 queries; this
# front window holds exactly the 93 never-driver-verified queries
# (all selfchecked green locally), cheapest-first by the driver's own
# BENCH_r04 sf0.1 timings (BENCH_FULL fallback) so a time-capped
# budget maximizes new green rows. q_sample_limit and
# q_greedy_packing follow immediately after: both previously
# rows-only rows, re-oracled this round (deterministic ordering /
# invariant emission) and due a fresh hash-green row. Names not
# listed keep their registration order after these.
_FRONT: tuple[str, ...] = (
    "q_kfold",
    "q_exif_meta",
    "q_feature_hash",
    "q_anti_join",
    "q_k_anonymity",
    "q_priority_sample",
    "q_cumulative_distinct",
    "q_skyline",
    "q_weighted_sample",
    "q_benford",
    "q_round_amount_anomaly",
    "q_robust_scale",
    "q_multimodal_resize",
    "q_psi",
    "q_abandoned",
    "q_gap_fill",
    "q_map_functions",
    "q_readability",
    "q_first_last",
    "q_minmax_by",
    "q_window_share",
    "q_survival_km",
    "q_duplicate_invoice",
    "q_twap",
    "q_token_entropy",
    "q_quantile_norm",
    "q_cohort_ltv",
    "q_embed_drift",
    "q_event_transitions",
    "q_langid_confusion",
    "q_topk_per_group",
    "q_chi_square",
    "q_ab_test",
    "q_mad_outliers",
    "q_event_paths",
    "q_scd2_lookup",
    "q_target_encoding",
    "q_revenue_bridge",
    "q_fd_discovery",
    "q_yoy_growth",
    "q_funnel_windowed",
    "q_vocab_coverage",
    "q_gini",
    "q_ks_test",
    "q_allocation",
    "q_cusum",
    "q_rolling_median",
    "q_seasonal_anomaly",
    "q_golden_record",
    "q_inverted_index",
    "q_auc",
    "q_important_parts",
    "q_pmi_collocations",
    "q_parent_share",
    "q_active_users",
    "q_json_roundtrip",
    "q_ols_trend",
    "q_event_funnel",
    "q_decile_lift",
    "q_bm25",
    "q_diff_in_diff",
    "q_kmv_set_ops",
    "q_latency_sla",
    "q_bpe_merges",
    "q_market_share",
    "q_correlated_subquery",
    "q_dup_ngram_ratio",
    "q_embed_pq",
    "q_median_mode",
    "q_bigram_logprob",
    "q_knn_label_vote",
    "q_stateful_profile",
    "q_fuzzy_match",
    "q_graph_degree",
    "q_reconciliation",
    "q_ewma",
    "q_augment",
    "q_bloom_prune",
    "q_bpe_encode",
    "q_basket_lift",
    "q_item_sim",
    "q_minhash_accuracy",
    "q_dup_spans",
    "q_dedup_pipeline",
    "q_bfs_distance",
    "q_ivfpq_topk",
    "q_knn_triangles",
    "q_lsh_quality",
    "q_pagerank",
    "q_pagerank_converge",
    "q_cheapest_route",
    "q_prefix_jaccard_join",
    "q_graph_communities",
    # re-oracled this round — previously rows-only by design:
    "q_sample_limit",
    "q_greedy_packing",
    # new this round (TPC-H Q2 full dim-chain anchor + round-8
    # additions: HLL sketch, ANN retrieval eval, bootstrap CI,
    # Z-order layout key):
    "q_min_cost_supplier",
    "q_hll_registers",
    "q_ann_recall",
    "q_bootstrap_ci",
    "q_zorder_key",
    "q_holt_winters",
    "q_shard_rebalance",
    "q_weighted_median",
    "q_silhouette",
    "q_schema_drift",
    "q_phash_neardup",
    "q_full_outer_diff",
    "q_data_skew_report",
    "q_record_linkage",
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
