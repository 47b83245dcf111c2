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
# in dict order with a bounded per-round budget, so queries that have
# never had a driver-green row come FIRST. Round-1 left the entire
# ext/quality/stream/views/sampling/scd2/scoring/sql/heavy/incremental
# surface unverified (CORRECTNESS_r01 stopped at entry 50) and two
# gold queries hash-red; those lead. Names not listed keep their
# registration order after these.
_FRONT: tuple[str, ...] = (
    # round-1 hash-fails, fixed this round — must re-verify
    "q_bool_sum_agg", "q_trend_7d",
    # new this round
    "q_tfidf_terms", "q_dq_freshness", "q_gbt_scores", "q_embed_top1",
    "q_chunk_documents", "q_pii_scan", "q_contamination",
    "q_percent_rank", "q_dedup_incremental", "q_cdc_apply", "q_sessionize_batch",
    "q_gopher_quality", "q_source_mix",
    # round-1 driver-unverified block
    "q_lang_id", "q_quality_score", "q_fingerprint", "q_rolling_hash",
    "q_dedup_exact", "q_ngram_jaccard", "q_minhash_signature", "q_lsh_pairs",
    "q_dup_clusters", "q_simhash", "q_simhash_pairs", "q_embed_topk",
    "q_embed_neardup", "q_ann_topk", "q_ivf_topk", "q_multimodal_meta",
    "q_multimodal_decode", "q_top_tokens", "q_source_profile",
    "q_pricing_summary", "q_shipping_priority", "q_incremental_month",
    "q_dq_suite", "q_dq_fk_orphans", "q_train_test_split",
    "q_stratified_sample", "q_sequence_packing", "q_greedy_packing",
    "q_scd2_segments", "q_fraud_scores", "q_sql_mart_monthly",
    "q_stream_tumbling", "q_session_window", "q_high_risk_users",
    "q_revenue_by_method",
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
