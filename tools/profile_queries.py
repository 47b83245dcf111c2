"""Per-query profiler — guide §1 measurement harness.

For each declared query, under the bench's exact session config:

- ``build_s``: wall time of ``fn(spark, sf_dir)`` — Catalyst plan
  construction PLUS any eager driver-side jobs the query runs at plan
  time (sketch collects, iterative rounds, localCheckpoints);
- ``exec_s``: wall time of the noop-sink write (guide §1.4);
- ``jobs_build`` / ``jobs_exec``: Spark job counts in each phase via
  ``setJobGroup`` + ``statusTracker().getJobIdsForGroup`` — the
  fixed-overhead multiplier at bench scale (each local job costs
  ~40-120 ms of scheduling regardless of data size);
- optionally the ``explain("formatted")`` text to a directory.

Usage:
  python tools/profile_queries.py [--plans DIR] [--passes N] [query ...]

Prints one TSV row per query (min over passes) sorted by total time,
and a JSON dump to /tmp/profile_queries.json for post-processing.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    plans_dir = None
    passes = 2
    if "--plans" in args:
        i = args.index("--plans")
        plans_dir = Path(args[i + 1])
        plans_dir.mkdir(parents=True, exist_ok=True)
        del args[i : i + 2]
    if "--passes" in args:
        i = args.index("--passes")
        passes = int(args[i + 1])
        del args[i : i + 2]
    names = args

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

    from real_time_fraud_revenue_intelligence_lakehouse_spark.plans import registry
    from real_time_fraud_revenue_intelligence_lakehouse_spark.session import get_spark

    spark = get_spark("profile", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    qs = registry.all_queries()
    if names:
        qs = {n: qs[n] for n in names}

    # Bench-identical warmups: flagship + Python-worker pre-fork.
    registry.all_queries()["q_revenue_daily"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(0, int(cpus) * 10, 1, int(cpus)).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    tracker = sc.statusTracker()

    def jobs_in(group: str) -> int:
        ids = tracker.getJobIdsForGroup(group)
        return len(ids) if ids else 0

    out: dict[str, dict] = {}
    for p in range(passes):
        for name, fn in qs.items():
            rec = out.setdefault(
                name, {"build_s": [], "exec_s": [], "jobs_build": 0, "jobs_exec": 0}
            )
            gb = f"{name}__build{p}"
            sc.setJobGroup(gb, gb)
            t0 = time.time()
            try:
                df = fn(spark, sf_dir)
            except Exception as e:
                print(f"profile: {name} build failed: {e}", file=sys.stderr)
                continue
            t_build = time.time() - t0
            ge = f"{name}__exec{p}"
            sc.setJobGroup(ge, ge)
            t0 = time.time()
            try:
                df.write.format("noop").mode("overwrite").save()
            except Exception as e:
                print(f"profile: {name} exec failed: {e}", file=sys.stderr)
                continue
            t_exec = time.time() - t0
            sc.setJobGroup(None, None)
            rec["build_s"].append(round(t_build, 3))
            rec["exec_s"].append(round(t_exec, 3))
            rec["jobs_build"] = jobs_in(gb)
            rec["jobs_exec"] = jobs_in(ge)
            if plans_dir is not None and p == 0:
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                (plans_dir / f"{name}.txt").write_text(buf.getvalue())

    rows = []
    for name, rec in out.items():
        if not rec["build_s"]:
            continue
        b = min(rec["build_s"])
        e = min(rec["exec_s"])
        rows.append((b + e, name, b, e, rec["jobs_build"], rec["jobs_exec"], rec))
    rows.sort(reverse=True)
    print(f"{'query':34s} {'total':>7s} {'build':>7s} {'exec':>7s} {'jB':>3s} {'jE':>3s}")
    for tot, name, b, e, jb, je, _ in rows:
        print(f"{name:34s} {tot:7.3f} {b:7.3f} {e:7.3f} {jb:3d} {je:3d}")
    dump = {
        name: {
            "build_s": rec["build_s"],
            "exec_s": rec["exec_s"],
            "jobs_build": rec["jobs_build"],
            "jobs_exec": rec["jobs_exec"],
        }
        for _, name, *_rest, rec in rows
    }
    Path("/tmp/profile_queries.json").write_text(json.dumps(dump, indent=1))
    print(f"\n{len(rows)} profiled; JSON at /tmp/profile_queries.json")


if __name__ == "__main__":
    main()
