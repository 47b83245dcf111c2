"""Round-5 corpus/embedding depth — sub-document dedup and the PQ
storage tier (ROADMAP round-5 candidates 5-6).

q_paragraph_dedup moves deduplication BELOW document granularity:
MinHash/SimHash (catalog_ext) catch whole near-duplicate documents,
but boilerplate paragraphs shared across otherwise-distinct pages are
the dominant duplication mode in web corpora — caught here by hashing
fixed-width token blocks and counting cross-document occurrences
(the exact-substring analog of the suffix-array dedup in the
deduplicating-trainING-data literature, block-granular so it stays one
hash shuffle at 100 TB).

q_embed_pq is the storage tier below int8 (q_embed_quantize):
product quantization — split each vector into M subvectors, encode
each as the id of its nearest codeword, 64 floats → 4 codes. The
codebook here is seed-vector-derived (vec_id < K as codewords) so
assignment is a pure function of the data and the DuckDB oracle can
replay it exactly; swapping in k-means-trained codebooks
(ext/similarity.kmeans_centroids) changes only the codebook DataFrame,
not the plan. Distances use the |a|²+|b|²-2a·b identity so both
engines run the identical list_dot_product / sequential-fold
arithmetic (the bit-exactness trick the ANN tier already proves).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_fraud_revenue_intelligence_lakehouse_spark.ext import similarity as S
from real_time_fraud_revenue_intelligence_lakehouse_spark.ext import text as X
from real_time_fraud_revenue_intelligence_lakehouse_spark.functions.scalars import det_round
from real_time_fraud_revenue_intelligence_lakehouse_spark.plans.catalog_ext import TOKS, _DBL
from real_time_fraud_revenue_intelligence_lakehouse_spark.plans.registry import query
from real_time_fraud_revenue_intelligence_lakehouse_spark.sources.tables import read_table

R4 = "(floor(({c}) * 10000.0 + 0.5) / 10000.0)"
R6 = "(floor(({c}) * 1000000.0 + 0.5) / 1000000.0)"

# --- sub-document (paragraph-block) dedup ----------------------------------

#: Tokens per block. Non-overlapping fixed-width blocks: a shared
#: boilerplate paragraph ≥2·BLOCK tokens long is guaranteed to
#: contribute at least one identical block to every document that
#: contains it (alignment can split the first/last fragment only).
BLOCK = 16


@query(
    "q_paragraph_dedup",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {TOKS.format(c='text')} AS t FROM documents
    ),
    blocks AS (
      SELECT doc_id,
             md5(array_to_string(t[(b*{BLOCK}+1):(b*{BLOCK}+{BLOCK})], ' ')) AS bh
      FROM toks, UNNEST(range(len(t) // {BLOCK})) AS u(b)
    ),
    docs_per AS (
      SELECT bh, count(DISTINCT doc_id) AS nd FROM blocks GROUP BY 1
    )
    SELECT b.doc_id,
           count(*) AS n_blocks,
           CAST(sum(CASE WHEN d.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_blocks,
           {R4.format(c="sum(CASE WHEN d.nd > 1 THEN 1 ELSE 0 END)::DOUBLE / count(*)")} AS shared_ratio
    FROM blocks b JOIN docs_per d USING (bh)
    GROUP BY 1
    """,
    tags=("ext", "dedup", "text"),
)
def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document exact dedup: hash non-overlapping 16-token blocks,
    count how many DISTINCT documents each block appears in, report
    per-document the fraction of its blocks shared with any other
    document — the boilerplate/template signal document-level MinHash
    can't see (two distinct pages sharing one nav paragraph). Plan:
    explode to blocks (row-local), one shuffle on the block hash for
    the distinct-doc count, join back on the same key (AQE reuses the
    exchange), one shuffle on doc_id for the rollup. Block hashes are
    16 bytes regardless of block text, so the shuffle payload is flat
    — at 100 TB this is the exact shape of the MinHash signature
    pipeline, with ids-only traffic. Docs shorter than one block drop
    out on both engines (no blocks → no row)."""
    d = read_table(spark, sf_dir, "documents")
    t = X.tokens(F.col("text"))
    nb = F.floor(F.size(t) / F.lit(BLOCK)).cast("int")
    idx = F.when(nb > 0, F.sequence(F.lit(0), nb - 1)).otherwise(
        F.array().cast("array<int>")
    )
    blocks = d.select(
        "doc_id",
        F.explode(idx).alias("b"),
        t.alias("t"),
    ).select(
        "doc_id",
        F.md5(
            F.concat_ws(" ", F.slice(F.col("t"), F.col("b") * BLOCK + 1, BLOCK))
        ).alias("bh"),
    )
    docs_per = blocks.groupBy("bh").agg(F.countDistinct("doc_id").alias("nd"))
    shared = F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
    return (
        blocks.join(docs_per, "bh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            shared.cast("long").alias("n_shared_blocks"),
            det_round(shared.cast("double") / F.count(F.lit(1)), 4).alias("shared_ratio"),
        )
    )


# --- product quantization (PQ) encode --------------------------------------

PQ_M = 4          # subspaces
PQ_K = 16         # codewords per subspace (seed vectors vec_id < PQ_K)
PQ_SUB = 16       # dims per subspace (EMBED_DIM / PQ_M)

# L2² via the dot-product identity — both engines evaluate three
# list_dot_product/sequential-fold terms in identical order, so the
# doubles agree bit-for-bit (same trick as the cosine tier).
_SQ = (
    "(list_dot_product({a}, {a}) + list_dot_product({b}, {b})"
    " - 2 * list_dot_product({a}, {b}))"
)


@query(
    "q_embed_pq",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, {_DBL.format(v='embedding')} AS v FROM embeddings
    ),
    sub AS (
      SELECT vec_id, s AS sub_id,
             v[(s*{PQ_SUB}+1):(s*{PQ_SUB}+{PQ_SUB})] AS sv
      FROM e, UNNEST(range({PQ_M})) AS u(s)
    ),
    cb AS (
      SELECT sub_id, vec_id AS code, sv AS cv FROM sub WHERE vec_id < {PQ_K}
    ),
    scored AS (
      SELECT p.vec_id, p.sub_id, c.code,
             {R6.format(c=_SQ.format(a='p.sv', b='c.cv'))} AS d
      FROM sub p JOIN cb c USING (sub_id)
    )
    SELECT vec_id, sub_id,
           (min({{'d': d, 'c': code}})).c AS code,
           (min({{'d': d, 'c': code}})).d AS dist
    FROM scored GROUP BY 1, 2
    """,
    tags=("ext", "similarity", "quantize"),
)
def q_embed_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding: each 64-dim vector splits into
    4×16-dim subvectors; each subvector is assigned its nearest of 16
    codewords (argmin L2², distance rounded to 6 digits BEFORE the
    argmin so ties are engine-portable, broken toward the smaller
    code). 64 floats → 4 small codes = 64× compression; at 100 TB
    the codebook (M·K subvectors) broadcasts and encoding is one
    scan — the same broadcast-argmin shape as the IVF assignment
    (ext/similarity.ivf_assignments), which is exactly what an IVF-PQ
    index composes. The argmin is a map-side-combinable min(struct)
    aggregate, not a window sort."""
    e = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", S.as_double(F.col("embedding")).alias("v")
    )
    sub = e.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("sub_id"),
        F.col("v"),
    ).select(
        "vec_id",
        "sub_id",
        F.slice(F.col("v"), F.col("sub_id") * PQ_SUB + 1, PQ_SUB).alias("sv"),
    )
    cb = sub.filter(F.col("vec_id") < PQ_K).select(
        "sub_id", F.col("vec_id").alias("code"), F.col("sv").alias("cv")
    )
    sq = (
        S.dot(F.col("sv"), F.col("sv"))
        + S.dot(F.col("cv"), F.col("cv"))
        - F.lit(2) * S.dot(F.col("sv"), F.col("cv"))
    )
    scored = sub.join(F.broadcast(cb), "sub_id").select(
        "vec_id", "sub_id", "code", det_round(sq, 6).alias("d")
    )
    best = F.min(F.struct(F.col("d"), F.col("code")))
    return (
        scored.groupBy("vec_id", "sub_id")
        .agg(best.alias("_b"))
        .select(
            "vec_id",
            "sub_id",
            F.col("_b").getField("code").alias("code"),
            F.col("_b").getField("d").alias("dist"),
        )
    )
