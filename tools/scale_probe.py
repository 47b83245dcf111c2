"""10x scale probe — measured evidence for the 100 TB design claims.

Amplifies the sf0.1 tables 10x by unioning shifted copies (keys offset
so join/group cardinalities scale with volume, not collapse onto the
same keys), then times representative heavy queries at 1x and 10x.
Linear-or-better wall-clock scaling on local[32] means the plan's
parallel structure absorbs data growth — the property that transfers
to a 1000-executor cluster; super-linear growth flags a plan whose
cost is concentrated in a non-scalable stage.

Usage: python tools/scale_probe.py [sf_dir]
Env:  SCALE_PROBE_AMP      amplification factor (default 10; 100 for
                           the quadratic-tail probe — heavier build)
      SCALE_PROBE_QUERIES  comma-separated query ids overriding the
                           default probe list
      SCALE_PROBE_SALT_DOCS=1  salt each document copy's text with a
                           per-copy token interleaved every 2 tokens:
                           copies of one doc stop being near-dups of
                           each other (every 3-shingle carries the
                           salt), while copy i of A ~ copy i of B iff
                           A ~ B — so TRUE similarity pairs grow
                           ~AMP x (a genuinely bigger corpus), not
                           ~AMP^2 x (an AMP-way-duplicated one).
                           Verbatim duplication is the dedup WORST
                           case (kept as the 10x stress); salted is
                           the right 100x probe for the pair tiers,
                           whose output would otherwise be quadratic
                           BY CONSTRUCTION and fill the disk, not
                           reveal a plan flaw.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

AMP = int(os.environ.get("SCALE_PROBE_AMP", "10"))

# (table, key columns to offset per copy) — offsets keep keys disjoint
# across copies so group/join cardinality grows with the data.
OFFSETS = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
}


SALT_DOCS = os.environ.get("SCALE_PROBE_SALT_DOCS", "") == "1"


def _salt_text(copy: DataFrame, i: int) -> DataFrame:
    # interleave a per-copy token after every 2nd token: every
    # 3-shingle of copy i contains cp<i>, so shingle sets of
    # different copies are disjoint (no cross-copy near-dups), while
    # same-index copies of similar docs remain similar.
    salt = f"cp{i}"
    return copy.withColumn(
        "text",
        F.array_join(
            F.flatten(
                F.transform(
                    F.split(F.col("text"), r"\s+"),
                    lambda x, pos: F.when(
                        pos % 2 == 1, F.array(x, F.lit(salt))
                    ).otherwise(F.array(x)),
                )
            ),
            " ",
        ),
    )


def amplify(df: DataFrame, keys: list[str], shift: int, table: str) -> DataFrame:
    out = df if not (SALT_DOCS and table == "documents") else _salt_text(df, 0)
    for i in range(1, AMP):
        copy = df
        for k in keys:
            copy = copy.withColumn(k, F.col(k) + i * shift)
        if SALT_DOCS and table == "documents":
            copy = _salt_text(copy, i)
        out = out.unionByName(copy)
    return out


def main() -> None:
    from real_time_fraud_revenue_intelligence_lakehouse_spark.session import get_spark
    from real_time_fraud_revenue_intelligence_lakehouse_spark.sources.tables import read_table

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale-probe", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    base = str(Path(f"/tmp/scale_probe_{AMP}x" + ("_salted" if SALT_DOCS else "")))
    shift = 100_000_000
    for t, keys in OFFSETS.items():
        dst = f"{base}/{t}.parquet"
        if not Path(dst).exists():
            amplify(read_table(spark, sf, t), keys, shift, t).write.mode(
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
        "q_misra_gries",         # mergeable shard summaries (merge input must stay KB-sized)
        "q_quantile_sketch",     # decimal log-histogram + histogram-pruned exact ranks
    ]
    override = os.environ.get("SCALE_PROBE_QUERIES", "").strip()
    if override:
        probes = [q.strip() for q in override.split(",") if q.strip()]
    print(f"{'query':24s} {'1x':>8s} {AMP:>7d}x {'ratio':>7s}")
    for name in probes:
        for sfdir in (sf, base):
            qs[name](spark, sfdir).write.format("noop").mode("overwrite").save()  # warm
        t1 = min(_time(qs[name], spark, sf) for _ in range(2))
        t10 = min(_time(qs[name], spark, base) for _ in range(2))
        print(f"{name:24s} {t1:8.2f} {t10:8.2f} {t10 / t1:7.2f}")


def _time(fn, spark, sfdir) -> float:
    # time the FULL query cost: a warm-run-primed shared_frames cache
    # would otherwise exclude the dominant corpus/graph build passes
    from real_time_fraud_revenue_intelligence_lakehouse_spark.plans import shared_frames

    shared_frames.clear_cache()
    t = time.time()
    fn(spark, sfdir).write.format("noop").mode("overwrite").save()
    return time.time() - t


if __name__ == "__main__":
    main()
