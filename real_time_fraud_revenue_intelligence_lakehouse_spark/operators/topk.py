"""Skew-proof per-group top-k — the library form of the two-stage
salted ranking q_topk_per_group demonstrates.

The naive ``row_number() OVER (PARTITION BY group ORDER BY ...)``
sends every row of a group through ONE task; with few/hot groups that
task is the job at 100 TB. Salting first bounds every task: stage 1
ranks within (group, pmod(hash(tiebreak), salts)) and keeps its local
top-k, stage 2 ranks the ≤ groups·salts·k survivors. Any global top-k
row is a local top-k row in its salt shard, so the composition is
exact — provided the ordering is TOTAL (a unique tiebreak column),
which is also what makes the result deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_SALTS = 32


def salted_topk(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    tiebreak_col: str,
    k: int,
    salts: int = DEFAULT_SALTS,
    rank_name: str = "rk",
) -> DataFrame:
    """Exact top-``k`` rows per group under a total order.

    ``order_cols`` are the ranking expressions (e.g. ``[F.desc(x)]``);
    ``tiebreak_col`` must be unique per row — it both totalizes the
    order (appended ASC) and seeds the salt hash. Output = input
    columns + ``rank_name`` (1-based), exactly the rows the naive
    single window would keep (equivalence is pinned in
    tests/test_operators.py and, end-to-end, by q_topk_per_group's
    DuckDB oracle which runs the naive form)."""
    order = [*order_cols, F.asc(tiebreak_col)]
    salted = df.withColumn("_salt", F.pmod(F.hash(tiebreak_col), F.lit(salts)))
    w1 = Window.partitionBy(*group_cols, "_salt").orderBy(*order)
    local = salted.withColumn("_lrk", F.row_number().over(w1)).filter(
        F.col("_lrk") <= k
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        local.withColumn(rank_name, F.row_number().over(w2))
        .filter(F.col(rank_name) <= k)
        .drop("_salt", "_lrk")
    )
