"""M5 — streaming-semantics queries, batch-checked (SURVEY §2.11).

The stateful streaming operators (tumbling/session windows) run the
SAME plan in batch and streaming mode; registering them as batch
queries lets the DuckDB oracle verify the window semantics the stream
will execute. The stream-only behaviors (watermark late-drop,
checkpoint recovery, foreachBatch merge) are covered by
tests/test_streaming.py with deterministic file micro-batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_fraud_revenue_intelligence_lakehouse_spark.functions.scalars import exact_sum
from real_time_fraud_revenue_intelligence_lakehouse_spark.plans.registry import query
from real_time_fraud_revenue_intelligence_lakehouse_spark.sources.tables import read_table
from real_time_fraud_revenue_intelligence_lakehouse_spark.streaming.ingest import (
    session_agg,
    tumbling_agg,
)


@query(
    "q_stream_tumbling",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           count(*) AS n_events,
           cast(sum(cast(value as decimal(18,2))) as double) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    tags=("streaming", "window"),
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window aggregate via `F.window` — the
    documented-but-unshipped streaming window (`SYSTEM_DESIGN.md`
    real-time framing; `window` imported unused at
    `build_fraud_features.py:23`). Identical plan runs under
    writeStream (see test_streaming.py); aligned tumbling windows are
    oracle-equivalent to date_trunc. Partial aggregation is map-side;
    one shuffle on (window, event_type)."""
    ev = read_table(spark, sf_dir, "events")
    return tumbling_agg(
        ev,
        "1 hour",
        extra_keys=["event_type"],
        aggs=[
            F.count(F.lit(1)).alias("n_events"),
            exact_sum("value", "total_value"),
        ],
    )


@query(
    "q_session_window",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 5 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    numbered AS (
      SELECT user_id, ts, value,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM marked
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 5 MINUTE AS session_end,
           count(*) AS n_events,
           cast(sum(cast(value as decimal(18,2))) as double) AS total_value
    FROM numbered
    GROUP BY user_id, sess_id
    """,
    tags=("streaming", "window"),
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows per user via `F.session_window`
    (5-minute gap) — SURVEY §2.11 stretch. Oracle is the classic
    gaps-and-islands: a new session starts when the gap to the
    previous event is >= the timeout (Spark merges windows that
    overlap, i.e. strictly-less-than-gap spacing). Stateful shuffle on
    user_id; in streaming mode the watermark bounds session state."""
    ev = read_table(spark, sf_dir, "events")
    return session_agg(
        ev,
        "5 minutes",
        keys=["user_id"],
        aggs=[
            F.count(F.lit(1)).alias("n_events"),
            exact_sum("value", "total_value"),
        ],
    )
