"""Upsert (MERGE) semantics — `delta_utils.py:42-69` re-expressed.

The reference merges with `whenMatchedUpdateAll / whenNotMatchedInsertAll`
on Delta. The engine provides:

- :func:`merge_upsert` — engine-native emulation over any DataFrame
  pair: source rows win on key collision, unmatched target rows are
  kept. This is the oracle-checkable form (anti-join ∪ source).
- :func:`delta_merge_upsert` — the real Delta MERGE when delta-spark
  is importable (not in this container; API kept cluster-ready).

Composite keys are supported and recommended: the reference documents
merge on (order_id, event_date) but implements only order_id
(SURVEY §2.11) — partition-scoped keys let Delta prune files and keep
reruns idempotent per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def merge_upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """whenMatchedUpdateAll + whenNotMatchedInsertAll as a DataFrame op.

    = source ∪ (target ⟕anti source on keys). One shuffle on the keys
    (broadcast if source is small); idempotent — running twice with
    the same source yields the same table.
    """
    kept = target.join(source.select(*keys), keys, "left_anti")
    return source.unionByName(kept)


def delta_merge_upsert(spark, target_path: str, source: DataFrame, keys: list[str]) -> None:
    """Real Delta MERGE (create-if-missing, else upsert) — mirrors
    `delta_utils.py:42-69` with composite-key support."""
    try:
        from delta.tables import DeltaTable  # gated: not in test container
    except ImportError as e:  # pragma: no cover
        raise ImportError("delta-spark not installed; use merge_upsert()") from e

    if not DeltaTable.isDeltaTable(spark, target_path):  # pragma: no cover
        source.write.format("delta").save(target_path)
        return
    tgt = DeltaTable.forPath(spark, target_path)  # pragma: no cover
    cond = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    (
        tgt.alias("t")
        .merge(source.alias("s"), cond)
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
