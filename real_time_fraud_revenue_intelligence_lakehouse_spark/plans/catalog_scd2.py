"""SCD Type-2 dimension build (SURVEY §2.11 — the reference documents
slowly-changing dim_users (`SYSTEM_DESIGN.md:424-433`) but ships a
type-1 view; the engine implements the documented intent).

Change events → validity intervals, the standard two-window build:
(1) collapse consecutive duplicates (a change row survives only when
the attribute differs from its predecessor), (2) close each interval
with the successor's start (open interval = current row). Two window
passes over the same (entity, time) ordering ⇒ a single sort/shuffle
on the entity key reused by both — Catalyst plans one Exchange+Sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from real_time_fraud_revenue_intelligence_lakehouse_spark.plans.registry import query
from real_time_fraud_revenue_intelligence_lakehouse_spark.sources.tables import read_table


def scd2_from_events(
    df: DataFrame,
    key: str,
    attr: str,
    ts_col: str,
    tiebreak: str,
) -> DataFrame:
    """Generic SCD2 builder over a change-event stream."""
    w = Window.partitionBy(key).orderBy(F.col(ts_col), F.col(tiebreak))
    changes = (
        df.withColumn("_prev", F.lag(attr).over(w))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col(attr)))
        .select(key, F.col(attr).alias("segment"),
                F.col(ts_col).alias("valid_from"), F.col(tiebreak).alias("_tb"))
    )
    w2 = Window.partitionBy(key).orderBy(F.col("valid_from"), F.col("_tb"))
    nxt = F.lead("valid_from").over(w2)
    return changes.select(
        key,
        "segment",
        "valid_from",
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@query(
    "q_scd2_segments",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_seg
      FROM events
    ),
    changes AS (
      SELECT user_id, event_type AS segment, ts AS valid_from, event_id
      FROM ordered
      WHERE prev_seg IS NULL OR prev_seg <> event_type
    )
    SELECT user_id, segment, valid_from,
           lead(valid_from) OVER w2 AS valid_to,
           lead(valid_from) OVER w2 IS NULL AS is_current
    FROM changes
    WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from, event_id)
    """,
    tags=("marts", "scd2", "window"),
)
def q_scd2_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 user-segment dimension from the events stream: each
    user's event_type treated as a changing attribute; output rows
    are validity intervals with an open current row. Deterministic
    ordering via (ts, event_id) so both engines agree on ties."""
    ev = read_table(spark, sf_dir, "events")
    return scd2_from_events(ev, "user_id", "event_type", "ts", "event_id")
