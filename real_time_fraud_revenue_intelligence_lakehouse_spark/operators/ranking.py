"""Distributed exact global ranking — row_number without the
single-partition window.

``row_number().over(Window.orderBy(...))`` with an empty partition
spec plans as ``Exchange SinglePartition`` + one-partition sort: every
row moves to one task, which is the one plan shape that cannot survive
a 100 TB fact table. But exact global rank does not need a global
window — it needs band boundaries (any boundaries) plus the
observation that per-band *counts* are enough to offset band-local
ranks into exact global ones:

1. one aggregate pass builds quantile-sketch boundaries over the score
   (``percentile_approx`` — a mergeable sketch, map-side combined) and
   ships the ~``bands`` values to the driver (tiny scalar collect, the
   same sanctioned pattern as the IVF centroid broadcast);
2. every row's band is a *pure literal expression* of its score —
   deterministic by construction, so every branch of a multi-branch
   plan assigns identical bands (this is why the band id is NOT
   ``spark_partition_id()`` after a sampled range exchange: the sample
   is nondeterministic and plan branches that re-execute the exchange
   can disagree);
3. ``row_number`` partitioned by band — ``bands``-way parallel
   WindowExec, never SinglePartition;
4. per-band counts (≤ bands+1 rows) → prefix-sum offsets, broadcast
   back; global rank = offset + band-local rank.

The result is bit-identical to the single-partition form: ties on the
score all land in one band (bands are half-open score intervals), so
the tiebreak columns only ever order rows *within* a band, and sketch
error only skews band *sizes*, never band *order*. Exactness holds for
any boundary quality.

Reference parity: the reference ranks scored orders driver-side after
a full sort (`ml/models/evaluate.py` gains-table helper); this is the
shape that replaces it at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BAND = "__rank_band"
_LOCAL_RN = "__local_rn"


def distributed_row_number(
    df: DataFrame,
    score: str,
    tiebreak: list[Column],
    descending: bool = True,
    bands: int = 32,
    rn_col: str = "rn",
    total_col: str | None = None,
) -> DataFrame:
    """Append exact global ``row_number`` under
    ``(score DESC|ASC, *tiebreak)`` — which must be a total order, so
    include a unique tiebreak — as ``rn_col``, plus the total row count
    as ``total_col`` when requested. No unpartitioned window anywhere:
    one sketch-aggregate job at plan time (eager, like the iterative
    operators), then one ``bands``-way window + one tiny broadcast
    join. ``score`` must be non-null and numeric.
    """
    qs = [j / bands for j in range(1, bands)]
    row = df.select(
        F.percentile_approx(F.col(score).cast("double"), F.array(*[F.lit(q) for q in qs]))
        .alias("b")
    ).first()
    raw = row["b"] if row is not None and row["b"] is not None else []
    # Duplicate boundaries (heavy ties) collapse into one band.
    bounds = sorted(set(raw), reverse=descending)

    score_d = F.col(score).cast("double")
    band = F.lit(0)
    for b in bounds:
        # Descending rank: band 0 holds score >= b_max, ties inclusive
        # on the high side; ascending mirrors. Half-open intervals ⇒
        # equal scores always share a band.
        band = band + F.when(score_d < F.lit(b) if descending else score_d > F.lit(b), 1).otherwise(0)

    order = [F.desc(score) if descending else F.asc(score), *tiebreak]
    banded = df.withColumn(_BAND, band.cast("int"))
    local = banded.withColumn(
        _LOCAL_RN, F.row_number().over(Window.partitionBy(_BAND).orderBy(*order))
    )
    counts = banded.groupBy(_BAND).agg(F.count(F.lit(1)).alias("__n"))
    # ≤ bands+1 rows: the prefix sum every distributed sort does on the
    # driver; kept as a plan node so lineage stays pure.
    off_w = Window.orderBy(_BAND).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        _BAND,
        F.coalesce(F.sum("__n").over(off_w), F.lit(0)).alias("__offset"),
        F.sum("__n").over(Window.partitionBy(F.lit(1))).alias("__total"),
    )
    out = (
        local.join(F.broadcast(offsets), _BAND)
        .withColumn(rn_col, (F.col("__offset") + F.col(_LOCAL_RN)).cast("long"))
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.col("__total").cast("long"))
    return out.drop(_BAND, _LOCAL_RN, "__offset", "__total")
