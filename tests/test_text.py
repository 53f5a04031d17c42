"""Text-function edge cases the fixture corpus never exercises:
empty strings, punctuation soup, unicode, degenerate token streams.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_realtime_pipeline_spark.functions import text as TX


def _one(spark, s, fn):
    df = spark.createDataFrame([(s,)], "text string")
    return df.select(fn(F.col("text")).alias("v")).collect()[0]["v"]


def test_quality_handles_empty_and_punct_soup(spark):
    assert _one(spark, "", TX.quality_score) is not None
    soup = _one(spark, "!!! ??? ;;; ###", TX.quality_score)
    clean = _one(spark, "a sensible sentence with several distinct words here", TX.quality_score)
    assert clean > soup  # punctuation soup scores lower


def test_punct_ratio_bounds(spark):
    assert _one(spark, "", TX.punct_ratio) == 0.0
    assert _one(spark, "!!!!", TX.punct_ratio) == 1.0
    assert 0.0 < _one(spark, "ab!!", TX.punct_ratio) < 1.0


def test_lang_id_markers_and_fallback(spark):
    assert _one(spark, "der hund und die katze und das haus", TX.lang_id) == "de"
    assert _one(spark, "el perro de la casa que los gatos", TX.lang_id) == "es"
    assert _one(spark, "这是一个中文句子", TX.lang_id) == "zh"
    # no markers at all → deterministic 'en' fallback
    assert _one(spark, "zzz qqq xxx", TX.lang_id) == "en"


def test_token_counts(spark):
    assert _one(spark, "one two  three", TX.ws_token_count) == 3
    # BPE-ish: letter runs + digit runs + symbols counted separately
    assert _one(spark, "abc123!", TX.bpe_ish_token_count) == 3


def test_fingerprint_normalization_invariance(spark):
    a = _one(spark, "Hello,   World!", TX.content_fingerprint)
    b = _one(spark, "hello world", TX.content_fingerprint)
    c = _one(spark, "hello there", TX.content_fingerprint)
    assert a == b  # case/punct/whitespace-insensitive
    assert a != c
