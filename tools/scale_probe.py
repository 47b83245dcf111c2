"""10x scale probe — measured evidence for the 100 TB design claims.

Amplifies the sf0.1 tables 10x by unioning shifted copies (keys offset
so join/group cardinalities scale with volume, not collapse onto the
same keys), then times representative heavy queries at 1x and 10x.
Linear-or-better wall-clock scaling on local[32] means the plan's
parallel structure absorbs data growth — the property that transfers
to a 1000-executor cluster; super-linear growth flags a plan whose
cost is concentrated in a non-scalable stage.

Usage: python tools/scale_probe.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

AMP = 10

# (table, key columns to offset per copy) — offsets keep keys disjoint
# across copies so group/join cardinality grows with the data.
OFFSETS = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
}


def amplify(df: DataFrame, keys: list[str], shift: int) -> DataFrame:
    out = df
    for i in range(1, AMP):
        copy = df
        for k in keys:
            copy = copy.withColumn(k, F.col(k) + i * shift)
        out = out.unionByName(copy)
    return out


def main() -> None:
    from real_time_fraud_revenue_intelligence_lakehouse_spark.session import get_spark
    from real_time_fraud_revenue_intelligence_lakehouse_spark.sources.tables import read_table

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale-probe", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    base = str(Path("/tmp/scale_probe_10x"))
    shift = 100_000_000
    for t, keys in OFFSETS.items():
        dst = f"{base}/{t}.parquet"
        if not Path(dst).exists():
            amplify(read_table(spark, sf, t), keys, shift).write.mode(
                "overwrite"
            ).parquet(dst)
    # tables the probe queries need but we don't amplify (dims)
    for t in ("nation", "region", "supplier", "part", "embeddings"):
        dst = f"{base}/{t}.parquet"
        if not Path(dst).exists():
            read_table(spark, sf, t).write.mode("overwrite").parquet(dst)

    import __spark_entry__ as E

    qs = E.queries()
    probes = [
        "q_pricing_summary",     # full-scan arithmetic throughput (TPC-H Q1)
        "q_revenue_daily",       # flagship multi-key agg
        "q_market_share",        # widest join chain (TPC-H Q8)
        "q_velocity_window",     # range-frame window
        "q_minhash_signature",   # corpus shingle pipeline
        "q_dedup_exact",         # hash-shuffle dedup
        "q_basket_lift",         # per-order pair comprehension + pair-key agg
        "q_knn_triangles",       # co-occurrence self-join + kNN cap + triangle closure
        "q_item_sim",            # pruned pair tier + per-part ranking window
        "q_bpe_merges",          # corpus scan + 4 vocab-table merge rounds
        "q_inverted_index",      # (term,doc) shuffle + term windows
        "q_dup_spans",           # rolling shingles + hash agg + island windows (pair-free)
    ]
    print(f"{'query':24s} {'1x':>8s} {'10x':>8s} {'ratio':>7s}")
    for name in probes:
        for sfdir in (sf, base):
            qs[name](spark, sfdir).write.format("noop").mode("overwrite").save()  # warm
        t1 = min(_time(qs[name], spark, sf) for _ in range(2))
        t10 = min(_time(qs[name], spark, base) for _ in range(2))
        print(f"{name:24s} {t1:8.2f} {t10:8.2f} {t10 / t1:7.2f}")


def _time(fn, spark, sfdir) -> float:
    t = time.time()
    fn(spark, sfdir).write.format("noop").mode("overwrite").save()
    return time.time() - t


if __name__ == "__main__":
    main()
