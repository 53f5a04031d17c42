"""End-to-end training-data preparation — the north-star composition.

A complete corpus-preparation pipeline chaining the engine's text and
dedup operators the way a real LLM-data job would
(C4/Gopher/RefinedWeb-style public recipes):

    language filter → quality filter → exact dedup (content hash)
    → shard assignment → per-shard token accounting

plus embedding preprocessing (L2-normalize + int8 quantize) for the
retrieval side. Every stage is the JVM-side declarative form already
oracle-gated piecewise; these queries gate the *composition*.

Scale: the pipeline is filter → filter → one dedup shuffle → one shard
shuffle; shard assignment is content-hash based (deterministic,
resume-safe) — at 100 TB each stage streams, nothing collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_realtime_pipeline_spark.functions import text as TX
from cdc_realtime_pipeline_spark.operators.dedup import docs_with_dupes
from cdc_realtime_pipeline_spark.session import load_table

QUALITY_MIN = 0.5
N_SHARDS = 8


def clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cleaned corpus: lang ∈ {en,de,es,fr}, quality ≥ threshold,
    exact-deduped on normalized content (min doc_id survives)."""
    docs = docs_with_dupes(spark, sf_dir)  # corpus with planted dupes
    labeled = docs.select(
        "doc_id",
        "text",
        TX.lang_id(F.col("text")).alias("pred_lang"),
        TX.quality_score(F.col("text")).alias("quality"),
        TX.content_fingerprint(F.col("text")).alias("content_hash"),
    )
    filtered = labeled.filter(
        F.col("pred_lang").isin("en", "de", "es", "fr")
        & (F.col("quality") >= QUALITY_MIN)
    )
    deduped = (
        filtered.groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.first("pred_lang").alias("pred_lang"),  # constant per hash
            F.first("quality").alias("quality"),
            F.count("*").alias("n_copies"),
        )
    )
    return deduped


def corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline output contract: surviving docs with shard assignment
    and whitespace-token counts, ready to write as training shards."""
    docs = docs_with_dupes(spark, sf_dir).select("doc_id", "text")
    cleaned = clean_corpus(spark, sf_dir).join(docs, "doc_id")
    return cleaned.select(
        "doc_id",
        "pred_lang",
        "quality",
        "n_copies",
        # deterministic content-based sharding: stable under reruns and
        # resumable — never round-robin at scale
        (
            F.conv(F.substring(F.col("content_hash"), 1, 7), 16, 10).cast("long")
            % N_SHARDS
        ).alias("shard"),
        TX.ws_token_count(F.col("text")).alias("n_tokens"),
    )


CORPUS_PREP_PIPELINE_SQL = rf"""
WITH docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 200000 AS doc_id, substring(text, 1, 400) AS text
  FROM documents WHERE doc_id % 11 = 0
),
scored AS (
  SELECT doc_id, text,
         CASE WHEN s_en <= 0 AND s_de <= 0 AND s_es <= 0 AND s_fr <= 0 AND s_zh <= 0 THEN 'en'
              WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
              WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
              WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
              WHEN s_fr >= s_zh THEN 'fr'
              ELSE 'zh' END AS pred_lang,
         round(0.4 * least(CAST(length(text) AS DOUBLE) / 200.0, CAST(1.0 AS DOUBLE))
               + 0.3 * (len(list_distinct(string_split_regex(lower(trim(text)), '\s+')))
                        / greatest(len(string_split_regex(lower(trim(text)), '\s+')), 1))
               + 0.2 * (CASE WHEN length(text) / greatest(len(string_split_regex(lower(trim(text)), '\s+')), 1) >= 3
                              AND length(text) / greatest(len(string_split_regex(lower(trim(text)), '\s+')), 1) <= 10
                             THEN 1.0 ELSE 0.5 END)
               + 0.1 * (1 - (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g')))
                            / greatest(length(text), 1)) + 1e-9, 4) AS quality,
         md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
                                 '\s+', ' ', 'g'))) AS content_hash
  FROM (
    SELECT *,
           {{s_en}} AS s_en, {{s_de}} AS s_de, {{s_es}} AS s_es, {{s_fr}} AS s_fr,
           (length(text) - length(regexp_replace(text, '[一-鿿]', '', 'g')))
             / greatest(length(text), 1) AS s_zh
    FROM docs
  )
),
filtered AS (
  SELECT * FROM scored
  WHERE pred_lang IN ('en','de','es','fr') AND quality >= {QUALITY_MIN}
),
deduped AS (
  SELECT min(doc_id) AS doc_id,
         first(pred_lang) AS pred_lang,
         first(quality) AS quality,
         count(*) AS n_copies,
         content_hash
  FROM filtered GROUP BY content_hash
)
SELECT d.doc_id, d.pred_lang, d.quality, d.n_copies,
       ('0x' || substr(d.content_hash, 1, 7))::BIGINT % {N_SHARDS} AS shard,
       len(string_split_regex(trim(docs.text), '\s+')) AS n_tokens
FROM deduped d JOIN docs ON d.doc_id = docs.doc_id
"""


def corpus_shard_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard accounting: docs, tokens, mean quality — the numbers a
    training job reads before consuming shards."""
    p = corpus_prep_pipeline(spark, sf_dir)
    return (
        p.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.round(F.avg("quality"), 4).alias("avg_quality"),
        )
    )


def embeddings_preprocessed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector preprocessing for retrieval: L2-normalize then symmetric
    int8 quantization (round(127·x) clamped) — the storage-shrink step
    before ANN indexing. All array expressions, JVM-side."""
    emb = load_table(spark, sf_dir, "embeddings")
    vec = F.transform("embedding", lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(vec, F.lit(0.0), lambda a, x: a + x * x))
    unit = F.transform(vec, lambda x: x / norm)
    q = F.transform(
        unit,
        lambda x: F.greatest(
            F.lit(-127), F.least(F.lit(127), F.floor(x * 127 + 0.5).cast("int"))
        ),
    )
    return emb.select(
        "vec_id",
        "label",
        F.round(norm, 6).alias("l2_norm"),
        # Serialized — the driver canonicalizer cannot hash array values.
        F.array_join(q, ",").alias("q_int8"),
        F.round(F.aggregate(q, F.lit(0), lambda a, x: a + x * x).cast("double"), 1).alias(
            "q_energy"
        ),
    )


EMBEDDINGS_PREPROCESSED_SQL = """
WITH v AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS e,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS l2_norm
  FROM embeddings
),
q AS (
  SELECT vec_id, label, l2_norm,
         list_transform(e, x -> CAST(greatest(-127, least(127, floor(x / l2_norm * 127 + 0.5))) AS INTEGER)) AS q_int8
  FROM v
)
SELECT vec_id, label,
       round(l2_norm, 6) AS l2_norm,
       array_to_string(q_int8, ',') AS q_int8,
       round(CAST(list_sum(list_transform(q_int8, x -> x * x)) AS DOUBLE), 1) AS q_energy
FROM q
"""


def _fill_lang_scores(sql: str) -> str:
    from cdc_realtime_pipeline_spark.operators.text_ops import _marker_score_sql

    return sql.format(
        s_en=_marker_score_sql(TX.LANG_MARKERS["en"]),
        s_de=_marker_score_sql(TX.LANG_MARKERS["de"]),
        s_es=_marker_score_sql(TX.LANG_MARKERS["es"]),
        s_fr=_marker_score_sql(TX.LANG_MARKERS["fr"]),
    )


def embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector data-quality gate: embeddings whose L2 norm deviates more
    than 3σ from the corpus mean — the degenerate/corrupt-vector sweep
    run before ANN indexing (zero vectors, double-normalized rows,
    truncation artifacts all surface here). Two passes: a 1-row global
    stats aggregate broadcast back over the corpus — no window over an
    unpartitioned sort, no collect.

    The random fixture's norms are tightly concentrated (no natural
    3σ outliers — the check would be vacuous), so deterministic bad
    vectors are planted: every 101st vector re-enters ×3 scaled
    (vec_id+20000), the corrupt-row stand-in.
    """
    base = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    bad = base.filter(F.col("vec_id") % 101 == 0).select(
        (F.col("vec_id") + 20000).alias("vec_id"),
        "label",
        F.transform("embedding", lambda x: x * 3.0).alias("embedding"),
    )
    emb = base.unionByName(bad)
    norms = emb.select(
        "vec_id",
        "label",
        F.sqrt(
            F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x)
        ).alias("norm"),
    )
    stats = norms.agg(
        F.avg("norm").alias("mu"), F.stddev_pop("norm").alias("sigma")
    )
    return (
        norms.crossJoin(F.broadcast(stats))
        .withColumn("z", (F.col("norm") - F.col("mu")) / F.col("sigma"))
        .filter(F.abs("z") > 3.0)
        .select(
            "vec_id",
            "label",
            F.round("norm", 6).alias("norm"),
            F.round("z", 4).alias("z"),
        )
    )


EMBEDDING_NORM_OUTLIERS_SQL = """
WITH emb AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
  UNION ALL
  SELECT vec_id + 20000 AS vec_id, label,
         list_transform(embedding::DOUBLE[], x -> x * 3.0) AS e
  FROM embeddings WHERE vec_id % 101 = 0
),
norms AS (
  SELECT vec_id, label, sqrt(list_dot_product(e, e)) AS norm
  FROM emb
),
stats AS (
  SELECT avg(norm) AS mu, stddev_pop(norm) AS sigma FROM norms
)
SELECT vec_id, label, round(norm, 6) AS norm,
       round((norm - mu) / sigma, 4) AS z
FROM norms, stats
WHERE abs((norm - mu) / sigma) > 3.0
"""


_JL_IN_DIM = 64
_JL_OUT_DIM = 16


def _jl_sign(i: int, j: int) -> int:
    """Deterministic Rademacher ±1 from the portable md5 idiom — the
    projection matrix is a pure function of (i, j), so every executor
    (and the DuckDB oracle's literal) regenerates it identically; no
    matrix is stored or shuffled."""
    import hashlib

    h = int(hashlib.md5(f"jl:{i}:{j}".encode()).hexdigest()[:15], 16)
    return 1 if h % 2 == 0 else -1


def _jl_matrix() -> list[list[int]]:
    # column-major: _jl_matrix()[j][i] = sign for output dim j, input dim i
    return [
        [_jl_sign(i, j) for i in range(_JL_IN_DIM)] for j in range(_JL_OUT_DIM)
    ]


def embeddings_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection 64→16 dims with a
    Rademacher (Achlioptas 2003) sign matrix: the dimensionality-
    reduction step run before ANN indexing / clustering at scale —
    16 dims cost 4× less to shuffle, store and compare, and the JL
    lemma bounds the norm/distance distortion. Emits the per-vector
    distortion audit: original norm, projected norm (×1/√k scaling),
    and their ratio — concentrated around 1.0 (pinned in tests; the
    corpus-level mean-ratio bound is the practical JL certificate).

    Scale shape: the projection matrix is DERIVED (md5 of (i,j)), not
    stored — zero broadcast, zero shuffle; each output dim is one
    JVM-side ``zip_with``/``aggregate`` fold over the embedding array,
    so the whole operator is a narrow map over the corpus. The
    sequential left-fold order of ``F.aggregate`` matches DuckDB's
    ``list_dot_product`` accumulation, making the doubles bit-identical
    cross-engine before the final round.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    vec = F.transform("embedding", lambda x: x.cast("double"))
    mat = _jl_matrix()
    scale = 1.0 / (_JL_OUT_DIM ** 0.5)
    y = [
        F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(s)) for s in mat[j]]),
                lambda x, s: x * s,
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        * scale
        for j in range(_JL_OUT_DIM)
    ]
    orig_norm = F.sqrt(F.aggregate(vec, F.lit(0.0), lambda a, x: a + x * x))
    proj_sq = y[0] * y[0]
    for j in range(1, _JL_OUT_DIM):
        proj_sq = proj_sq + y[j] * y[j]
    proj_norm = F.sqrt(proj_sq)
    return emb.select(
        "vec_id",
        "label",
        F.round(orig_norm, 6).alias("l2_norm"),
        F.round(proj_norm, 6).alias("jl_norm"),
        F.round(proj_norm / orig_norm + 1e-9, 4).alias("distortion"),
    ).orderBy("vec_id")


def _jl_sql() -> str:
    mat = _jl_matrix()
    scale = 1.0 / (_JL_OUT_DIM ** 0.5)
    dots = [
        f"list_dot_product(e, [{', '.join(f'{s}.0' for s in mat[j])}]) * {scale!r}"
        for j in range(_JL_OUT_DIM)
    ]
    proj_sq = " + ".join(f"y{j} * y{j}" for j in range(_JL_OUT_DIM))
    ys = ", ".join(f"{d} AS y{j}" for j, d in enumerate(dots))
    return f"""
WITH v AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS e,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS l2_norm
  FROM embeddings
),
p AS (SELECT vec_id, label, l2_norm, {ys} FROM v)
SELECT vec_id, label,
       round(l2_norm, 6) AS l2_norm,
       round(sqrt({proj_sq}), 6) AS jl_norm,
       round(sqrt({proj_sq}) / l2_norm + 1e-9, 4) AS distortion
FROM p ORDER BY vec_id
"""


EMBEDDINGS_JL_PROJECTION_SQL = _jl_sql()


def embeddings_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension activation statistics over the embedding corpus —
    the whitening / PCA-prep pass (dimension means for centering,
    variances for scaling) and the collapsed-dimension detector
    (near-zero variance ⇒ the encoder ignores that coordinate;
    saturation fraction ⇒ clipping): the standard audit before
    training an ANN index or a projection head on 100 TB of vectors.

    Shape: ``posexplode`` fans each row into 64 (dim, x) pairs, then
    ONE hash aggregate on a 64-key space — partial aggregation
    absorbs the 64× fan-out map-side, so the shuffle carries exactly
    64 × n_partitions partial rows regardless of corpus size. No
    Python, no window, no driver loop.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = emb.select(
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "pos", "x"
        )
    ).select((F.col("pos") + 1).alias("dim"), "x")
    return (
        pairs.groupBy("dim")
        .agg(
            F.count("*").alias("n"),
            (F.round(F.avg("x") + 1e-9, 4) + 0.0).alias("mean_x"),
            (F.round(F.stddev_pop("x") + 1e-9, 4) + 0.0).alias("std_x"),
            (F.round(F.min("x") + 1e-9, 4) + 0.0).alias("min_x"),
            (F.round(F.max("x") + 1e-9, 4) + 0.0).alias("max_x"),
            F.count(F.when(F.abs("x") > 0.5, F.lit(1))).alias("n_saturated"),
        )
        .orderBy("dim")
    )


EMBEDDINGS_DIM_STATS_SQL = """
SELECT i AS dim,
       count(*) AS n,
       round(avg(x) + 1e-9, 4) + 0.0 AS mean_x,
       round(stddev_pop(x) + 1e-9, 4) + 0.0 AS std_x,
       round(min(x) + 1e-9, 4) + 0.0 AS min_x,
       round(max(x) + 1e-9, 4) + 0.0 AS max_x,
       count(CASE WHEN abs(x) > 0.5 THEN 1 END) AS n_saturated
FROM (
  SELECT i, list_extract(embedding::DOUBLE[], i) AS x
  FROM embeddings CROSS JOIN range(1, 65) r(i)
) pairs
GROUP BY i
ORDER BY i
"""



_MIX_TEMP_NUM, _MIX_TEMP_DEN = 1, 2  # temperature tau = 1/2


def corpus_domain_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source training-mixture re-weighting — the domain-balance
    step every multi-source pretraining corpus runs (the temperature-
    scaled sampling of GPT-3 / The Pile / DoReMi's baseline): given
    each source's observed token share p_s and a uniform target share
    t = 1/S, the sampling weight is (t / p_s)^tau with tau = 1/2 —
    tau=1 would flatten the mixture exactly, tau=0 keeps it as-is;
    the square root is the standard compromise that boosts small
    domains without drowning large ones. Emits the observed share,
    the weight, and the share the re-weighted sampler would actually
    draw (renormalized p_s·w_s).

    One corpus pass (token counts off the session-memoized ``doc_words``
    array — no explode), then source-bounded scalar algebra.
    Cross-engine: shares round 8dp BEFORE feeding pow so both engines
    exponentiate identical inputs; weights round 6dp before the
    renormalization product.
    """
    from cdc_realtime_pipeline_spark.operators.dedup import doc_words

    per_source = (
        doc_words(spark, sf_dir)
        .select(
            "source",
            F.size(F.filter("words", lambda w: F.length(w) > 0))
            .cast("long")
            .alias("n_tok"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )
    tot = per_source.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.count("*").alias("n_sources"),
    )
    shared = per_source.crossJoin(F.broadcast(tot)).withColumn(
        "actual_share",
        F.round(F.col("n_tokens") / F.col("total_tokens") + 1e-9, 8) + 0.0,
    )
    weighted = shared.withColumn(
        "weight",
        F.round(
            F.pow(
                (1.0 / F.col("n_sources")) / F.col("actual_share"),
                F.lit(_MIX_TEMP_NUM / _MIX_TEMP_DEN),
            )
            + 1e-9,
            6,
        )
        + 0.0,
    ).withColumn("aw", F.col("actual_share") * F.col("weight"))
    norm = weighted.agg(F.sum("aw").alias("sum_aw"))
    return (
        weighted.crossJoin(F.broadcast(norm))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "actual_share",
            "weight",
            (F.round(F.col("aw") / F.col("sum_aw") + 1e-9, 6) + 0.0).alias(
                "resampled_share"
            ),
        )
        .orderBy("source")
    )


CORPUS_DOMAIN_MIXTURE_WEIGHTS_SQL = r"""
WITH per_source AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(len(list_filter(
           string_split(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' '),
           w -> length(w) > 0))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(sum(n_tokens) AS DOUBLE) AS total_tokens,
         CAST(count(*) AS BIGINT) AS n_sources
  FROM per_source
),
shared AS (
  SELECT source, n_docs, n_tokens,
         round(n_tokens / tot.total_tokens + 1e-9, 8) + 0.0 AS actual_share,
         tot.n_sources
  FROM per_source CROSS JOIN tot
),
weighted AS (
  SELECT *,
         round(pow((1.0 / n_sources) / actual_share, 0.5) + 1e-9, 6) + 0.0
           AS weight
  FROM shared
)
SELECT source, n_docs, n_tokens, actual_share, weight,
       round(actual_share * weight
             / (SELECT sum(actual_share * weight) FROM weighted)
             + 1e-9, 6) + 0.0 AS resampled_share
FROM weighted ORDER BY source
"""


QUERIES = {
    "embeddings_dim_stats": embeddings_dim_stats,
    "embeddings_jl_projection": embeddings_jl_projection,
    "corpus_prep_pipeline": corpus_prep_pipeline,
    "corpus_shard_stats": corpus_shard_stats,
    "embeddings_preprocessed": embeddings_preprocessed,
    "embedding_norm_outliers": embedding_norm_outliers,
    "corpus_domain_mixture_weights": corpus_domain_mixture_weights,
}

ORACLES = {
    "corpus_domain_mixture_weights": CORPUS_DOMAIN_MIXTURE_WEIGHTS_SQL,
    "embeddings_dim_stats": EMBEDDINGS_DIM_STATS_SQL,
    "embeddings_jl_projection": EMBEDDINGS_JL_PROJECTION_SQL,
    "corpus_prep_pipeline": _fill_lang_scores(CORPUS_PREP_PIPELINE_SQL),
    "corpus_shard_stats": (
        "SELECT shard, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens, "
        "round(avg(quality), 4) AS avg_quality FROM ("
        + _fill_lang_scores(CORPUS_PREP_PIPELINE_SQL)
        + ") p GROUP BY shard"
    ),
    "embeddings_preprocessed": EMBEDDINGS_PREPROCESSED_SQL,
    "embedding_norm_outliers": EMBEDDING_NORM_OUTLIERS_SQL,
}
