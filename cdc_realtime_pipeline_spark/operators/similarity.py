"""Similarity search over embedding columns (``array<float>``).

Two paths over the ``embeddings`` fixture (64-dim float vectors):

* brute-force cosine top-K — the exactness baseline: broadcast the
  query set, one pass over the corpus, per-partition top-K via a rank
  window. At 100 TB the corpus side stays partition-parallel and the
  query side is a broadcast — no shuffle of the corpus.
* LSH-bucketed ANN — random-hyperplane signatures (deterministic,
  seed-derived) bucket the corpus; queries probe only their bucket.
  The scale path: candidate generation is an equi-join on the
  signature, cost ∝ bucket size, not corpus size.

Dot products run JVM-side via ``F.zip_with`` + ``F.aggregate`` (a
sequential left fold — the identical summation order DuckDB's
``list_dot_product`` uses, so oracle floats agree to the last ulp and
``round(…, 6)`` stabilizes them).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdc_realtime_pipeline_spark.session import load_table

TOP_K = 5
N_QUERIES = 3  # vec_id < 3 are the query vectors


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-K for each query vector against the corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    corpus = emb.select("vec_id", "embedding")
    scored = (
        corpus.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine(F.col("q"), F.col("embedding")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "rk", "vec_id", "cos")
        .orderBy("query_id", "rk")
    )


SIMILARITY_TOPK_BRUTEFORCE_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.query_id, e.vec_id,
         round(list_dot_product(qv, e.embedding::DOUBLE[])
               / (sqrt(list_dot_product(qv, qv))
                  * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))),
               6) AS cos
  FROM embeddings e JOIN q ON e.vec_id != q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rk
  FROM scored
)
SELECT query_id, rk, vec_id, cos FROM ranked WHERE rk <= {TOP_K}
ORDER BY query_id, rk
"""


def _hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (seeded LCG —
    reproducible across engines/runs without numpy RNG state)."""
    planes = []
    state = 0x5DEECE66D
    for _ in range(n_planes):
        v = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            # map to (-1, 1)
            v.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
        norm = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / norm for x in v])
    return planes


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature string over random hyperplanes."""
    bits = [
        F.when(dot(vec, F.array(*[F.lit(x) for x in p])) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for p in planes
    ]
    return F.concat(*bits)


def similarity_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-K: probe only the query's LSH bucket, then exact rerank.

    8 hyperplanes → 256 buckets; recall is tunable via planes/probes.
    Rows-only driver check (bucketing maths is pathological in the
    oracle dialect); recall vs brute force is asserted in
    tests/test_similarity.py.
    """
    planes = _hyperplanes(8, 64)
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "sig", lsh_signature(F.col("embedding"), planes)
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q"), F.col("sig").alias("qsig")
    )
    cand = emb.join(
        F.broadcast(queries),
        (F.col("sig") == F.col("qsig")) & (F.col("vec_id") != F.col("query_id")),
    )
    scored = cand.withColumn("cos", F.round(cosine(F.col("q"), F.col("embedding")), 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "rk", "vec_id", "cos")
        .orderBy("query_id", "rk")
    )


def embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label norm/centroid-coordinate stats — array aggregation surface."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.withColumn("norm", l2_norm(F.col("embedding")))
        .withColumn("first_dim", F.col("embedding")[0].cast("double"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("norm"), 4).alias("avg_norm"),
            F.round(F.avg("first_dim"), 4).alias("avg_first_dim"),
        )
        .orderBy("label")
    )


EMBEDDING_LABEL_STATS_SQL = """
SELECT label,
       count(*) AS n,
       round(avg(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 4) AS avg_norm,
       round(avg(CAST(embedding[1] AS DOUBLE)), 4) AS avg_first_dim
FROM embeddings
GROUP BY label ORDER BY label
"""


QUERIES = {
    "similarity_topk_bruteforce": similarity_topk_bruteforce,
    "similarity_topk_lsh": similarity_topk_lsh,  # rows-only (see docstring)
    "embedding_label_stats": embedding_label_stats,
}

ORACLES = {
    "similarity_topk_bruteforce": SIMILARITY_TOPK_BRUTEFORCE_SQL,
    "embedding_label_stats": EMBEDDING_LABEL_STATS_SQL,
}
