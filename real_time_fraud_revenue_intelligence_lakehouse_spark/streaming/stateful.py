"""Custom stateful streaming operators via applyInPandasWithState.

Spark's built-in stateful operators (windows, stream dedup) cover the
reference's surface; this module adds the escape hatch for semantics
they can't express — arbitrary per-key state machines over Arrow
batches. The shipped operator is a per-user running profile (event
count + value total across micro-batches), the streaming form of the
per-entity aggregates in `fraud_summary.py:91-134`: where the batch
job recomputes user profiles from all history every 2 h, the stateful
stream maintains them incrementally with O(keys) state.

Scale: state lives in the executor state store partitioned by key
(one shuffle per micro-batch); Arrow batches flow per key-partition.
Pair with watermark-based `GroupStateTimeout.EventTimeTimeout` in
production so abandoned keys expire instead of accumulating forever.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

OUTPUT_SCHEMA = (
    "user_id BIGINT, batch_events BIGINT, total_events BIGINT, total_value DOUBLE"
)
STATE_SCHEMA = "total_events BIGINT, total_value DOUBLE"


def _update_user_profile(
    key: tuple[Any, ...], pdfs: Iterator["pd.DataFrame"], state: GroupState
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    total_events, total_value = state.get if state.exists else (0, 0.0)
    batch_events = 0
    batch_value = 0.0
    for pdf in pdfs:
        batch_events += len(pdf)
        batch_value += float(pdf["value"].sum())
    total_events += batch_events
    total_value += batch_value
    state.update((total_events, total_value))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "batch_events": [batch_events],
            "total_events": [total_events],
            "total_value": [round(total_value, 2)],
        }
    )


def running_user_profiles(events: DataFrame) -> DataFrame:
    """Incrementally-maintained per-user totals over a stream of
    events(user_id, value, …) — one output row per (user, micro-batch)
    with the post-batch running totals."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_profile,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
