"""Dedup family: planted exact/near duplicates must be found; unrelated
documents must not collide (the unit-level guarantee behind the
rows-only MinHash/SimHash driver checks).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cdc_realtime_pipeline_spark.operators.dedup import (
    dedup_docs_jaccard,
    dedup_docs_minhash,
    dedup_keep_min,
    docs_with_dupes,
    minhash_signatures,
    simhash_fingerprints,
)


def test_dedup_keep_min_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "k long, payload string"
    )
    out = {r["k"]: r["payload"] for r in dedup_keep_min(df, ["k"], "payload").collect()}
    assert out == {1: "a", 2: "c"}  # lowest payload survives, always


def test_planted_exact_copies_share_signature(spark, sf_dir):
    # doc_id+100000 rows are byte-identical copies — every MinHash slot
    # must agree
    sig = minhash_signatures(docs_with_dupes(spark, sf_dir)).collect()
    by_id = {r["doc_id"]: tuple(r[f"mh_{i}"] for i in range(16)) for r in sig}
    copies = [d for d in by_id if d >= 100000 and d < 200000]
    assert copies
    for c in copies:
        assert by_id[c] == by_id[c - 100000]


def test_minhash_finds_planted_near_dups(spark, sf_dir):
    cand = dedup_docs_minhash(spark, sf_dir).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["est_jaccard"] for r in cand}
    # all exact copies must be candidates with est_jaccard == 1
    exact_expected = {
        (r["doc_id"], r["doc_id"] + 100000)
        for r in docs_with_dupes(spark, sf_dir)
        .filter((F.col("doc_id") % 7 == 0) & (F.col("doc_id") < 100000))
        .select("doc_id")
        .collect()
    }
    found_exact = {p for p in pairs if p in exact_expected}
    assert found_exact == exact_expected
    for p in found_exact:
        assert pairs[p] == 1.0


def test_jaccard_scores_match_planted_structure(spark, sf_dir):
    rows = dedup_docs_jaccard(spark, sf_dir).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in rows}
    # exact copies score 1.0
    assert any(v == 1.0 for v in pairs.values())
    truncated = {p: v for p, v in pairs.items() if p[1] >= 200000}
    assert truncated
    assert all(0.6 <= v <= 1.0 for v in truncated.values())
    # a doc longer than the 400-char truncation really loses shingles,
    # so its planted copy must score strictly below 1
    from pyspark.sql import functions as F
    from cdc_realtime_pipeline_spark.session import load_table

    long_docs = {
        r["doc_id"]
        for r in load_table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 11 == 0) & (F.col("n_chars") > 420))
        .collect()
    }
    really_truncated = {p: v for p, v in truncated.items() if p[0] in long_docs}
    if really_truncated:  # present at every sf ≥ 0.001 in practice
        assert all(v < 1.0 for v in really_truncated.values())


def test_simhash_exact_copies_identical_on_fixture(spark, sf_dir):
    fp = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(spark, sf_dir).collect()}

    def ham(a, b):
        return bin(a ^ b).count("1")

    # exact copies: distance 0; truncated copies: much closer than the
    # corpus-wide noise floor (the fixture's shared word pool keeps all
    # docs loosely similar, so thresholds are relative)
    for d in [k for k in fp if 100000 <= k < 200000]:
        assert ham(fp[d], fp[d - 100000]) == 0
    trunc = [ham(fp[d], fp[d - 200000]) for d in fp if d >= 200000]
    assert trunc and max(trunc) <= 10


def test_simhash_separates_disjoint_vocabularies(spark):
    # controlled corpus: A/A' share a vocabulary, B is disjoint —
    # near-dups must land close, unrelated docs far
    from cdc_realtime_pipeline_spark.operators.dedup import simhash_over

    docs = spark.createDataFrame(
        [
            (1, "red green blue cyan magenta yellow " * 5),
            (2, "red green blue cyan magenta amber " * 5),
            (3, "sort merge join scan filter project shuffle spill " * 5),
        ],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: r["simhash"] for r in simhash_over(docs).collect()}

    def ham(a, b):
        return bin(a ^ b).count("1")

    assert ham(fp[1], fp[2]) < 15
    assert ham(fp[1], fp[3]) > 15
    assert ham(fp[1], fp[2]) < ham(fp[1], fp[3])


def _uncapped_jaccard_truth(spark, sf_dir, tau=0.6):
    """Brute-force exact Jaccard over ALL pairs sharing any shingle —
    the uncapped ground truth the candidate stage must reproduce."""
    from pyspark.sql import functions as F

    from cdc_realtime_pipeline_spark.operators.dedup import (
        _word_shingles,
        docs_with_dupes,
    )

    sh = _word_shingles(docs_with_dupes(spark, sf_dir))
    a, b = sh.alias("a"), sh.alias("b")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4),
        )
        .filter(F.col("jaccard") >= tau)
        .select("doc_a", "doc_b", "jaccard")
    )


@pytest.mark.slow
def test_capped_candidates_match_uncapped_ground_truth(spark, sf_dir):
    """The candidate stage must not lose any true pair: the
    capped+verified Jaccard result equals brute-force exact Jaccard
    over ALL pairs sharing any shingle (computed uncapped here)."""
    truth = _uncapped_jaccard_truth(spark, sf_dir)
    got = dedup_docs_jaccard(spark, sf_dir).select("doc_a", "doc_b", "jaccard")
    assert truth.count() > 0  # fixture must plant positives
    assert got.exceptAll(truth).count() == 0
    assert truth.exceptAll(got).count() == 0


@pytest.mark.slow
def test_minhash_backstop_survives_crippled_caps(spark, sf_dir, monkeypatch):
    """Forced degradation: cripple the df-capped rare-shingle path
    entirely (df cap 2, rare-shared bar unreachable) — the MinHash band
    backstop alone must still deliver every true pair to the exact
    verify, proving correctness no longer hinges on fixture-measured
    cap margins. Deterministic: xxhash64 salts are fixed, so band
    collisions are a pure function of the fixture."""
    import cdc_realtime_pipeline_spark.operators.dedup as D

    monkeypatch.setattr(D, "MAX_SHINGLE_DF", 2)
    monkeypatch.setattr(D, "MIN_RARE_SHARED", 10**9)
    truth = _uncapped_jaccard_truth(spark, sf_dir)
    got = D.dedup_docs_jaccard(spark, sf_dir).select("doc_a", "doc_b", "jaccard")
    assert truth.count() > 0
    assert got.exceptAll(truth).count() == 0
    assert truth.exceptAll(got).count() == 0


@pytest.mark.slow
def test_lsh_cosine_dedup_matches_all_pairs(spark, sf_dir):
    """Banded-LSH candidates must recover every cosine ≥ τ pair the
    all-pairs half-matrix finds (planted near-identical dups collide
    on at least one band w.p. ~1-4e-8)."""
    from pyspark.sql import functions as F

    from cdc_realtime_pipeline_spark.operators.similarity import (
        cosine,
        dedup_embeddings_cosine,
    )
    from cdc_realtime_pipeline_spark.session import load_table

    base = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    near = base.filter(F.col("vec_id") % 9 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform(
            "embedding", lambda x, i: F.when(i == 0, x + F.lit(0.15)).otherwise(x)
        ).alias("embedding"),
    )
    emb = base.unionByName(near)
    a, b = emb.alias("a"), emb.alias("b")
    truth = (
        a.join(F.broadcast(b), F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cosine(F.col("a.embedding"), F.col("b.embedding")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= 0.95)
    )
    got = dedup_embeddings_cosine(spark, sf_dir)
    assert truth.count() > 0
    assert got.exceptAll(truth).count() == 0
    assert truth.exceptAll(got).count() == 0


def test_span_stats_planted_truncations_have_long_runs(spark, sf_dir):
    """The planted 80%-truncated near-dups (doc_id+200000) share their
    whole prefix with the original: their longest duplicated run must
    cover ~all their grams, and docs with no duplicate anywhere must
    read 0. Exact copies (doc_id+100000) are fully duplicated runs."""
    from pyspark.sql import functions as F

    from cdc_realtime_pipeline_spark.operators.dedup import dedup_span_stats

    out = dedup_span_stats(spark, sf_dir)
    near = out.filter(F.col("doc_id") >= 200000)
    # every planted truncation's longest run spans ≥80% of its grams
    frac = near.select(
        (F.col("longest_dup_run") / F.col("n_grams")).alias("f")
    )
    assert frac.filter(F.col("f") < 0.8).count() == 0
    exact = out.filter(
        (F.col("doc_id") >= 100000) & (F.col("doc_id") < 200000)
    )
    assert exact.filter(F.col("longest_dup_run") != F.col("n_grams")).count() == 0
    # and zero-run docs exist (the fixture corpus is mostly unique)
    base = out.filter(F.col("doc_id") < 100000)
    assert base.filter(F.col("longest_dup_run") == 0).count() > 0
