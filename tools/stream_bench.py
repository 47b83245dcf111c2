"""Streaming ingest throughput probe.

Drives the full bronze pipeline (file source → explicit-schema parse
→ audit stamping → event_date derivation → checkpointed partitioned
parquet append) over the sf events table and reports events/second —
the number to set against the reference's ~50 events/s sustained /
~120 events/s claimed headroom (`BASELINE.md`).

Usage: python tools/stream_bench.py [--sf /root/testdata/sf0.1]
Prints one JSON line: {"metric": "stream_ingest_events_per_sec", ...}
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from real_time_fraud_revenue_intelligence_lakehouse_spark.session import get_spark
    from real_time_fraud_revenue_intelligence_lakehouse_spark.sources.tables import read_table
    from real_time_fraud_revenue_intelligence_lakehouse_spark.streaming.ingest import (
        EVENTS_SCHEMA,
        read_file_stream,
        stamp_bronze,
        start_append_sink,
    )

    spark = get_spark("stream-bench")
    spark.sparkContext.setLogLevel("ERROR")

    work = Path(tempfile.mkdtemp(prefix="stream_bench_"))
    src, out, ckpt = work / "src", work / "bronze", work / "ckpt"
    # Stage the events table as the stream's input files (json, the
    # reference's wire format), split for per-file micro-batching.
    ev = read_table(spark, str(args.sf), "events")
    n_events = ev.count()
    ev.repartition(8).write.json(str(src))

    t0 = time.time()
    q = start_append_sink(
        stamp_bronze(read_file_stream(spark, str(src), schema=EVENTS_SCHEMA)),
        str(out),
        str(ckpt),
        partition_by=["event_date"],
        available_now=True,
    )
    q.awaitTermination(600)
    wall = time.time() - t0

    written = spark.read.parquet(str(out)).count()
    assert written == n_events, (written, n_events)
    shutil.rmtree(work, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "stream_ingest_events_per_sec",
                "value": round(n_events / wall, 1),
                "unit": "events/sec",
                "events": n_events,
                "wall_sec": round(wall, 2),
                "sf_dir": str(args.sf),
                "pipeline": "json file stream -> parse -> stamp -> partitioned parquet + checkpoint",
            }
        )
    )


if __name__ == "__main__":
    main()
