"""Interval union (gaps-and-islands) — merge overlapping/adjacent
[start, end] intervals per key into maximal islands.

The canonical SQL shape behind span merging (q_dup_spans), session
stitching, and downtime/coverage accounting: sort by start, open a
new island whenever start > running-max(end) + 1 (integer-adjacent
intervals merge; pass ``adjacency=0`` to merge only true overlaps),
then aggregate per island. One key-partition window + one aggregate —
a single shuffle on the key, valid at any scale where per-key
interval counts fit a task (they are output-bounded by construction).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def union_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    start_col: str,
    end_col: str,
    adjacency: int = 1,
) -> DataFrame:
    """Merge intervals per key. Returns one row per maximal island:
    key columns + ``island_id`` (1-based, in start order), ``start``,
    ``end``, ``n_intervals`` (inputs merged into the island).

    Intervals are inclusive integer-like bounds; two intervals merge
    when the next start is within ``adjacency`` of the running max
    end (1 = touching counts, 0 = only genuine overlap)."""
    keys = list(key_cols)
    wprev = Window.partitionBy(*keys).orderBy(start_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    wcum = Window.partitionBy(*keys).orderBy(start_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    marked = df.withColumn(
        "_new",
        F.when(
            F.col(start_col)
            > F.coalesce(F.max(end_col).over(wprev), F.col(start_col) - 1 - adjacency)
            + adjacency,
            1,
        ).otherwise(0),
    )
    islands = marked.withColumn("_island", F.sum("_new").over(wcum))
    return islands.groupBy(*keys, "_island").agg(
        F.min(start_col).alias("start"),
        F.max(end_col).alias("end"),
        F.count(F.lit(1)).alias("n_intervals"),
    ).withColumnRenamed("_island", "island_id")
