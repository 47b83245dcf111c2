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
# in dict order with a hard 50-entry per-round budget (r01-r06 each
# sampled exactly 50), so queries that have never had a driver-green
# row come FIRST. Recomputed at round 7 from the union of
# CORRECTNESS_r01+r02+r04+r05+r06 hash-green rows (195/254 green);
# this front window holds exactly the 59 never-driver-verified ids
# (all selfchecked green locally), expensive-first per VERDICT r6 #1
# so the perpetually-deferred heavy graph/similarity tier finally
# gets sampled. q_sample_limit / q_greedy_packing (whose only driver
# rows are stale pre-fix `err: no_oracle`) are promoted into the
# top 50 at the expense of two cheap tail ids (q_ols_trend,
# q_record_linkage), per the verdict's count-cap instruction. Names
# not listed keep their registration order after these.
_FRONT: tuple[str, ...] = (
    "q_cheapest_route",
    "q_pagerank_converge",
    "q_graph_communities",
    "q_lsh_quality",
    "q_pagerank",
    "q_knn_triangles",
    "q_prefix_jaccard_join",
    "q_ivfpq_topk",
    "q_bfs_distance",
    "q_dup_spans",
    "q_bootstrap_ci",
    "q_minhash_accuracy",
    "q_item_sim",
    "q_dedup_pipeline",
    "q_basket_lift",
    "q_bpe_encode",
    "q_fuzzy_match",
    "q_weighted_median",
    "q_bloom_prune",
    "q_reconciliation",
    "q_min_cost_supplier",
    "q_graph_degree",
    "q_bigram_logprob",
    "q_augment",
    "q_median_mode",
    "q_ewma",
    "q_zorder_key",
    "q_ann_recall",
    "q_knn_label_vote",
    "q_dup_ngram_ratio",
    "q_stateful_profile",
    "q_bpe_merges",
    "q_data_skew_report",
    "q_embed_pq",
    "q_correlated_subquery",
    "q_silhouette",
    "q_market_share",
    "q_kmv_set_ops",
    "q_decile_lift",
    "q_shard_rebalance",
    "q_latency_sla",
    "q_diff_in_diff",
    "q_pmi_collocations",
    "q_auc",
    "q_bm25",
    "q_parent_share",
    "q_hll_registers",
    "q_json_roundtrip",
    "q_sample_limit",
    "q_greedy_packing",
    "q_ols_trend",
    "q_record_linkage",
    "q_active_users",
    "q_phash_neardup",
    "q_schema_drift",
    "q_event_funnel",
    "q_important_parts",
    "q_holt_winters",
    "q_full_outer_diff",
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
