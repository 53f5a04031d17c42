"""Invariant tests for the corpus-curation operators (the DuckDB
differential gate checks exact values; these pin semantic properties
that must hold on any corpus, not just this fixture)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cdc_realtime_pipeline_spark.operators.curation import (
    _BENCH_MOD,
    _CONTAM_MIN_SHARED,
    _SAMPLE_RATES,
    corpus_stratified_sample,
    decontaminate_vs_benchmark,
    text_repetition,
    text_unigram_lm_score,
)


def test_decontamination_never_flags_benchmark_docs(spark, sf_dir):
    rows = decontaminate_vs_benchmark(spark, sf_dir).collect()
    assert rows, "fixture must contain at least one contaminated doc"
    for r in rows:
        assert r["doc_id"] % _BENCH_MOD != 0  # eval docs are not training docs
        assert r["n_shared_shingles"] >= _CONTAM_MIN_SHARED
        assert r["n_bench_docs"] >= 1


def test_repetition_fractions_are_consistent(spark, sf_dir):
    rows = text_repetition(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_distinct"] <= r["n_ngrams"]
        assert 0.0 <= r["dup_ngram_frac"] < 1.0
        # the dominant n-gram covers at least 1/n and at most all of it
        assert r["top_ngram_frac"] >= round(1.0 / r["n_ngrams"], 4) - 1e-9
        assert r["top_ngram_frac"] <= 1.0 + 1e-9


def test_stratified_sample_is_deterministic_and_near_target(spark, sf_dir):
    a = {r["source"]: r for r in corpus_stratified_sample(spark, sf_dir).collect()}
    b = {r["source"]: r for r in corpus_stratified_sample(spark, sf_dir).collect()}
    assert a.keys() == b.keys() and len(a) > 1
    for s in a:
        assert a[s]["n_kept"] == b[s]["n_kept"]  # pure-hash keep: no RNG drift
        assert 0 <= a[s]["n_kept"] <= a[s]["n_docs"]
        assert a[s]["target_rate"] in _SAMPLE_RATES
        # law of large numbers check, loose (fixture sources are small)
        if a[s]["n_docs"] >= 20:
            assert abs(a[s]["achieved_rate"] - a[s]["target_rate"]) <= 0.25


def test_unigram_lm_scores_are_positive_and_total(spark, sf_dir):
    rows = text_unigram_lm_score(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_tokens"] >= 1
        # -ln p > 0 strictly unless one word IS the whole corpus
        assert r["avg_neg_logp"] > 0.0


@pytest.mark.slow
def test_funnel_is_monotone_and_anchored(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.curation import corpus_curation_funnel

    rows = sorted(
        corpus_curation_funnel(spark, sf_dir).collect(), key=lambda r: r["stage_idx"]
    )
    assert [r["stage"] for r in rows] == [
        "total", "lang_keep", "length_ok", "low_repetition",
        "decontaminated", "sampled", "dedup_survivor",
    ]
    counts = [r["n_docs"] for r in rows]
    assert counts[0] > 0
    assert all(a >= b for a, b in zip(counts, counts[1:]))  # funnel never grows
    assert counts[-1] > 0  # something must survive the whole pipeline


def test_all_shingles_edge_cases(spark):
    """Kernel-level edge cases for the occurrence-preserving shingle
    generator: empty/whitespace/punctuation-only docs vanish, short
    docs produce their single best-effort shingle, duplicates are
    preserved (repetition scoring depends on multiplicity)."""
    from cdc_realtime_pipeline_spark.operators.curation import _all_shingles

    docs = spark.createDataFrame(
        [
            (1, ""),
            (2, "   "),
            (3, "!!! ??? ..."),
            (4, "one"),
            (5, "one two"),
            (6, "one two three"),
            (7, "a b c a b c a b c"),  # repeated trigram "a b c" etc.
        ],
        "doc_id long, text string",
    )
    rows = _all_shingles(docs).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["shingle"])
    assert 1 not in by_doc and 2 not in by_doc and 3 not in by_doc
    assert by_doc[4] == ["one"]
    assert by_doc[5] == ["one two"]
    assert by_doc[6] == ["one two three"]
    assert len(by_doc[7]) == 7  # 9 words -> 7 trigram occurrences
    assert by_doc[7].count("a b c") == 3  # multiplicity preserved
    assert all(s for docs_ in by_doc.values() for s in docs_)  # none empty


@pytest.mark.slow
def test_dsir_scores_rank_target_like_docs_higher(spark, sf_dir):
    """The importance weight is a log-likelihood ratio target/raw:
    docs with a higher fraction of target-domain tokens must score
    higher. Compare the mean score of the top vs bottom doc quartile
    by target-token fraction, and require every score finite
    (smoothing covers buckets absent from the target sample)."""
    from cdc_realtime_pipeline_spark.operators.curation import (
        _DSIR_TARGET_TOKENS,
        corpus_dsir_importance,
    )
    from cdc_realtime_pipeline_spark.operators.dedup import normalize_text
    from cdc_realtime_pipeline_spark.session import load_table

    out = corpus_dsir_importance(spark, sf_dir)
    assert out.filter(F.isnan("dsir_score") | F.col("dsir_score").isNull()).count() == 0

    target_vocab = sorted(set(_DSIR_TARGET_TOKENS))
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias("word"),
    ).filter(F.length("word") > 0)
    frac = words.groupBy("doc_id").agg(
        (
            F.count(F.when(F.col("word").isin(target_vocab), 1)) / F.count("*")
        ).alias("target_frac")
    )
    joined = out.join(frac, "doc_id")
    q1, q3 = joined.approxQuantile("target_frac", [0.25, 0.75], 0.0)
    top = joined.filter(F.col("target_frac") >= q3).agg(F.avg("dsir_score")).collect()[0][0]
    bot = joined.filter(F.col("target_frac") <= q1).agg(F.avg("dsir_score")).collect()[0][0]
    assert top > bot, (top, bot)


def test_dsir_model_join_is_broadcast_no_word_shuffle(spark, sf_dir):
    """DSIR's point is a corpus-size-independent model: the per-word
    bucket join must be against a broadcast 256-row dim, never a
    word- or bucket-keyed shuffle of the exploded corpus."""
    import io
    from contextlib import redirect_stdout

    from cdc_realtime_pipeline_spark.operators.curation import corpus_dsir_importance

    df = corpus_dsir_importance(spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    # the only exchanges allowed are the tiny bucket/total aggregates
    # and the final doc_id aggregate — no SortMergeJoin of word rows
    assert "SortMergeJoin" not in plan
