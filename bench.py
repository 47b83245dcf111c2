"""Benchmark runner: all declared queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query is materialized with the `noop` sink (full execution, no
driver-side collect) after a warm-up of the session.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

    from real_time_fraud_revenue_intelligence_lakehouse_spark.plans import registry
    from real_time_fraud_revenue_intelligence_lakehouse_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    qs = registry.all_queries()
    # Warm up JVM + parquet footer caches with the flagship query.
    qs["q_revenue_daily"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # Two passes per query: the first pays one-off costs (plan cache,
    # Python-worker spin-up, JIT), the second is the steady-state
    # number. Headline = min of the two — robust to a stray GC pause
    # landing in either pass; both series are reported.
    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    timings: dict[str, float] = {}
    for name, fn in qs.items():
        try:
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            cold[name] = round(time.time() - t0, 3)
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            warm[name] = round(time.time() - t0, 3)
            timings[name] = min(cold[name], warm[name])
        except Exception as e:  # a failing query must not sink the whole bench
            print(f"bench: {name} failed: {e}", file=sys.stderr)
            cold[name] = warm[name] = timings[name] = -1.0

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "declared_query_suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "cold": cold,
                "warm": warm,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
