"""Watermarked stream-stream joins — the Structured Streaming surface
for correlating two live feeds (click→purchase attribution, auth→
capture reconciliation) without landing either to storage first.

Reference parity: the reference joins its Kafka topics only AFTER
landing to bronze tables (`spark_jobs/silver/transform_transactions.py`
batch joins); the streaming form is the latency upgrade a real-time
fraud gate needs — flag the purchase WHILE the session is live.

Spark's state-cleanup contract drives the shape: both sides carry
event-time watermarks, and the join condition carries an explicit
time range, so the state store can drop a row once the other side's
watermark passes its window — state ∝ rows inside the join horizon,
never the full history. The SAME builder runs on batch frames (no
watermark path), which is what lets the stream be equality-tested
against its batch twin in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_pair_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    within: str = "1 hour",
    watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each left event to every right event for the same ``key``
    whose timestamp falls in [left.ts, left.ts + within] — the
    attribution/reconciliation interval join.

    ``watermark`` set (streaming): both inputs get event-time
    watermarks and the range condition bounds the state store (rows
    age out once the opposing watermark passes their horizon — the
    documented Spark stream-stream join requirement). ``watermark``
    None: either the batch twin on static frames, or streaming inputs
    that ALREADY carry watermarks. ``how='left_outer'`` additionally
    emits unmatched left rows with null right columns once the right
    watermark proves no match can arrive (streaming outer joins
    REQUIRE the watermark + range).

    OPERATIONAL TRAP (found by the left-outer test): when both sides
    split from ONE source, watermark the SOURCE before filtering and
    pass ``watermark=None`` here. Applying the watermark after a
    selective filter (as this function does to its inputs) stalls
    the global min-policy watermark at the sparser branch's max event
    time — a click-only branch whose last click is hours old pins the
    watermark there, and outer results never flush."""
    if watermark is not None:
        left = left.withWatermark("ts", watermark)
        right = right.withWatermark("ts", watermark)
    l = left.select(
        F.col(key).alias("k"),
        F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_event_id"),
        F.col("value").alias("l_value"),
    )
    r = right.select(
        F.col(key).alias("rk"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
        F.col("value").alias("r_value"),
    )
    cond = (
        (l["k"] == r["rk"])
        & (r["r_ts"] >= l["l_ts"])
        & (r["r_ts"] <= l["l_ts"] + F.expr(f"INTERVAL {within}"))
    )
    return (
        l.join(r, cond, how)
        .select(
            F.col("k").alias(key),
            "l_event_id", "l_ts", "l_value",
            "r_event_id", "r_ts", "r_value",
        )
    )
