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
    Oracle-gated: the seeded hyperplanes embed as literals in the
    oracle SQL, and both engines compute dot products in the same
    sequential order, so bucket signatures match exactly; recall vs
    brute force is additionally asserted in tests/test_similarity.py.
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


def banded_signatures_udf(planes: list[list[float]], n_bands: int):
    """Vectorized band-signature kernel: one Arrow-batched pandas UDF
    computing all hyperplane sign bits as a single numpy matmul, split
    into ``n_bands`` band strings (MinHash-style banding applied to
    hyperplane LSH): near-identical vectors agree on every bit with
    high probability, so they collide on at least one whole band
    essentially always, while unrelated vectors rarely collide on any.

    A per-plane JVM expression (64 interpreted zip_with/aggregate
    folds per row) was measured ~7 s at sf0.1; the matmul is
    milliseconds and stays executor-side on Arrow batches. Signatures
    feed CANDIDATE generation only — the exact-cosine verify step
    decides membership, so kernel summation order cannot change
    results (asserted against the all-pairs ground truth in tests).
    """
    import numpy as np
    import pandas as pd

    proj = np.asarray(planes, dtype=np.float64).T  # dim × n_planes
    per_band = len(planes) // n_bands

    def _sigs(emb):
        mat = np.vstack(emb.to_numpy()).astype(np.float64)  # n × dim
        bits = mat @ proj >= 0
        out = []
        for row in bits:
            s = "".join("1" if b else "0" for b in row)
            out.append([s[i * per_band : (i + 1) * per_band] for i in range(n_bands)])
        return pd.Series(out)

    return F.pandas_udf(_sigs, "array<string>")


def dedup_embeddings_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: pairs with cosine ≥ τ, keep-min survivor.

    Candidates-then-verify, never all-pairs: 64 hyperplane sign bits in
    8 bands of 8 bucket the corpus; candidate pairs are same-(band, sig)
    equi-join collisions; exact cosine verifies only those. A pair at
    cos ≥ 0.999 (the planted near-dups) misses all 8 bands with
    probability ~4e-8, so the result equals the all-pairs ground truth
    the oracle computes — asserted across fixtures. At 100 TB the same
    plan holds with wider bands (16–32 bits) to keep per-band buckets
    ~corpus/2^bits; cost is Σ bucket², never corpus².
    """
    tau = 0.95
    base = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        # widen to double up front so the union with perturbed copies
        # (double arithmetic) type-checks
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    # The random fixture has no natural ≥τ pairs, so plant near-dups
    # (vec_id+10000 = same vector nudged on its first coordinate) —
    # otherwise the check is vacuously empty.
    near = base.filter(F.col("vec_id") % 9 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform(
            "embedding", lambda x, i: F.when(i == 0, x + F.lit(0.15)).otherwise(x)
        ).alias("embedding"),
    )
    emb = base.unionByName(near)
    planes = _hyperplanes(64, 64)
    sig_kernel = banded_signatures_udf(planes, 8)
    bands = emb.select(
        "vec_id", F.posexplode(sig_kernel(F.col("embedding"))).alias("band", "sig")
    )
    x, y = bands.alias("x"), bands.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.sig") == F.col("y.sig"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(F.col("x.vec_id").alias("vec_a"), F.col("y.vec_id").alias("vec_b"))
        .distinct()
    )
    va = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    vb = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    pairs = (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("ea"), F.col("eb")), 6).alias("cos"),
        )
    )
    return pairs.filter(F.col("cos") >= tau)


DEDUP_EMBEDDINGS_COSINE_SQL = """
WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 10000 AS vec_id,
         list_concat([embedding[1]::DOUBLE + 0.15],
                     list_transform(embedding[2:], x -> x::DOUBLE)) AS embedding
  FROM embeddings WHERE vec_id % 9 = 0
),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         round(list_dot_product(a.embedding, b.embedding)
               / (sqrt(list_dot_product(a.embedding, a.embedding))
                  * sqrt(list_dot_product(b.embedding, b.embedding))),
               6) AS cos
  FROM emb a JOIN emb b ON a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cos FROM pairs WHERE cos >= 0.95
"""


def similarity_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse-quantize to the nearest of K seed centroids,
    probe only the query's cell, exact rerank inside it.

    Deterministic centroids = the first K vectors by id (k-means init
    seeds; a production build would iterate Lloyd's via repeated
    groupBy-average — same plan shape). Oracle-gated: assignment and
    rerank reproduce exactly in the oracle dialect; recall properties
    are additionally asserted in tests/test_similarity.py.
    """
    k_cells = 4
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < k_cells).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("cent")
    )
    # assign every vector to its max-cosine cell (broadcast centroids,
    # one pass, rank window over k_cells candidates per vector)
    scored = emb.join(F.broadcast(cents), how="cross").withColumn(
        "cell_cos", cosine(F.col("embedding"), F.col("cent"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cell_cos"), F.asc("cell_id"))
    assigned = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "embedding", "cell_id")
    )
    queries = assigned.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q"),
        F.col("cell_id").alias("qcell"),
    )
    cand = assigned.join(
        F.broadcast(queries),
        (F.col("cell_id") == F.col("qcell")) & (F.col("vec_id") != F.col("query_id")),
    )
    rer = cand.withColumn("cos", F.round(cosine(F.col("q"), F.col("embedding")), 6))
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        rer.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "rk", "vec_id", "cos")
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


def _lsh_oracle_sql() -> str:
    """Oracle for the LSH path: the hyperplanes are deterministic
    (seeded LCG), so they embed as double literals; sign bits come from
    the same sequential-order dot product (`list_dot_product`), making
    signatures — and therefore buckets — identical across engines."""
    planes = _hyperplanes(8, 64)
    sig_expr = " || ".join(
        "(CASE WHEN list_dot_product(embedding::DOUBLE[], "
        f"[{', '.join(repr(x) for x in p)}]::DOUBLE[]) >= 0 THEN '1' ELSE '0' END)"
        for p in planes
    )
    return f"""
WITH sigs AS (
  SELECT vec_id, embedding::DOUBLE[] AS e, {sig_expr} AS sig
  FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, e AS qv, sig AS qsig FROM sigs WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.query_id, s.vec_id,
         round(list_dot_product(qv, s.e)
               / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(s.e, s.e))),
               6) AS cos
  FROM sigs s JOIN q ON s.sig = q.qsig AND s.vec_id != q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rk
  FROM scored
)
SELECT query_id, rk, vec_id, cos FROM ranked WHERE rk <= {TOP_K}
ORDER BY query_id, rk
"""


SIMILARITY_TOPK_IVF_SQL = f"""
WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
),
cents AS (
  SELECT vec_id AS cell_id, e AS cent FROM emb WHERE vec_id < 4
),
cell_scored AS (
  SELECT emb.vec_id, emb.e, cents.cell_id,
         list_dot_product(e, cent)
           / (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(cent, cent))) AS cell_cos
  FROM emb CROSS JOIN cents
),
assigned AS (
  SELECT vec_id, e, cell_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cell_cos DESC, cell_id ASC) AS ark
    FROM cell_scored
  ) WHERE ark = 1
),
q AS (
  SELECT vec_id AS query_id, e AS qv, cell_id AS qcell
  FROM assigned WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.query_id, a.vec_id,
         round(list_dot_product(qv, a.e)
               / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(a.e, a.e))),
               6) AS cos
  FROM assigned a JOIN q ON a.cell_id = q.qcell AND a.vec_id != q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rk
  FROM scored
)
SELECT query_id, rk, vec_id, cos FROM ranked WHERE rk <= {TOP_K}
ORDER BY query_id, rk
"""


def similarity_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality report: top-K recall of the LSH and IVF paths
    against the exact brute-force answer — the self-evaluation an ANN
    deployment runs before trusting an index. Fully declarative: tag ∪
    semi-join ∪ ratio against a one-row broadcast denominator (no
    driver-side loops)."""
    bf = similarity_topk_bruteforce(spark, sf_dir).select("query_id", "vec_id")
    lsh = similarity_topk_lsh(spark, sf_dir).select("query_id", "vec_id")
    ivf = similarity_topk_ivf(spark, sf_dir).select("query_id", "vec_id")
    methods = lsh.withColumn("method", F.lit("lsh")).unionByName(
        ivf.withColumn("method", F.lit("ivf"))
    )
    hits = (
        methods.join(bf, ["query_id", "vec_id"], "left_semi")
        .groupBy("method")
        .agg(F.count("*").alias("n_hit"))
    )
    denom = bf.agg(F.count("*").alias("n_bf"))
    return (
        hits.crossJoin(F.broadcast(denom))
        .select(
            "method",
            "n_hit",
            "n_bf",
            F.round(F.col("n_hit") / F.col("n_bf"), 4).alias("recall"),
        )
        .orderBy("method")
    )


def _recall_oracle_sql() -> str:
    return f"""
WITH bf AS (SELECT query_id, vec_id FROM ({SIMILARITY_TOPK_BRUTEFORCE_SQL}) t),
lsh AS (SELECT query_id, vec_id FROM ({_lsh_oracle_sql()}) t),
ivf AS (SELECT query_id, vec_id FROM ({SIMILARITY_TOPK_IVF_SQL}) t),
methods AS (
  SELECT 'lsh' AS method, query_id, vec_id FROM lsh
  UNION ALL
  SELECT 'ivf' AS method, query_id, vec_id FROM ivf
),
hits AS (
  SELECT method, count(*) AS n_hit
  FROM methods m
  WHERE EXISTS (SELECT 1 FROM bf WHERE bf.query_id = m.query_id AND bf.vec_id = m.vec_id)
  GROUP BY method
)
SELECT method, n_hit, (SELECT count(*) FROM bf) AS n_bf,
       round(n_hit::DOUBLE / (SELECT count(*) FROM bf), 4) AS recall
FROM hits ORDER BY method
"""


QUERIES = {
    "similarity_topk_bruteforce": similarity_topk_bruteforce,
    "similarity_topk_lsh": similarity_topk_lsh,
    "similarity_topk_ivf": similarity_topk_ivf,
    "dedup_embeddings_cosine": dedup_embeddings_cosine,
    "embedding_label_stats": embedding_label_stats,
    "similarity_recall_report": similarity_recall_report,
}

ORACLES = {
    "similarity_topk_bruteforce": SIMILARITY_TOPK_BRUTEFORCE_SQL,
    "similarity_topk_lsh": _lsh_oracle_sql(),
    "similarity_topk_ivf": SIMILARITY_TOPK_IVF_SQL,
    "dedup_embeddings_cosine": DEDUP_EMBEDDINGS_COSINE_SQL,
    "embedding_label_stats": EMBEDDING_LABEL_STATS_SQL,
    "similarity_recall_report": _recall_oracle_sql(),
}
