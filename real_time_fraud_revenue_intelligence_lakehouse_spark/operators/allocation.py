"""Largest-remainder (Hamilton) integer allocation — the library form
behind q_allocation.

Splitting an integer budget proportionally and rounding each share
independently drifts off the total; Hamilton's method floors every
share and hands the leftover units to the largest fractional parts,
so the allocations sum EXACTLY to the budget. Sum preservation is the
operator's contract (tested); determinism comes from breaking
fractional-part ties on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def largest_remainder(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    budget: int,
    alloc_name: str = "alloc",
) -> DataFrame:
    """Allocate ``budget`` integer units across rows proportional to
    ``weight_col`` (non-negative; exact-representable doubles — cents
    — keep the shares bit-stable). Output = input columns +
    ``alloc_name`` (long); sum(alloc) == budget exactly.

    The whole-frame windows assume ``df`` is an AGGREGATED frame
    (one row per allocation target — nations, campaigns, shards), not
    a raw fact table; reduce first."""
    wall = Window.partitionBy()
    # Degenerate guard: when sum(weight) is 0 or NULL the proportional
    # share is undefined — without this, share/alloc silently become
    # NULL and the sum(alloc)==budget contract breaks. Fail loudly
    # instead via raise_error so the caller sees the bad frame.
    total_w = F.sum(weight_col).over(wall)
    checked_total = F.when(
        total_w.isNull() | (total_w == 0),
        F.raise_error(
            F.lit(
                "largest_remainder: sum(weight_col) is 0 or NULL — "
                "proportional allocation is undefined; filter or "
                "reweight the frame first"
            )
        ).cast("double"),
    ).otherwise(total_w)
    share = F.col(weight_col) / checked_total * F.lit(budget)
    frac = share - F.floor(share)
    sh = df.select(
        "*",
        F.floor(share).cast("long").alias("_base"),
        F.row_number().over(Window.orderBy(frac.desc(), F.asc(key_col))).alias("_frac_rank"),
        (F.lit(budget) - F.sum(F.floor(share).cast("long")).over(wall)).alias("_slots"),
    )
    return sh.withColumn(
        alloc_name,
        (F.col("_base") + F.when(F.col("_frac_rank") <= F.col("_slots"), 1).otherwise(0)).cast("long"),
    ).drop("_base", "_frac_rank", "_slots")
