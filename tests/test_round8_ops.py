"""Invariant tests for the round-8 wave: the exact re-rank refine
stage after the PQ-ADC scan (the third leg of the FAISS-style
coarse → scan → refine pipeline)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from cdc_realtime_pipeline_spark.operators.similarity import (
    _ADC_K,
    _RERANK_R,
    N_QUERIES,
    similarity_pq_adc_rerank,
    similarity_pq_adc_topk,
    similarity_topk_bruteforce,
)
from cdc_realtime_pipeline_spark.session import load_table


def test_rerank_rows_and_ordering(spark, sf_dir):
    got = similarity_pq_adc_rerank(spark, sf_dir).collect()
    assert len(got) == N_QUERIES * _ADC_K
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, _ADC_K + 1))
        # exact-cosine order, ties by vec_id — and every row came from
        # the ADC candidate pool
        for a, b in zip(rows, rows[1:]):
            assert (a.cos, -a.vec_id) >= (b.cos, -b.vec_id)
        for r in rows:
            assert 1 <= r.adc_rank <= _RERANK_R


def test_rerank_cos_is_exact_cosine(spark, sf_dir):
    """The refine stage's cos column must be the full-precision cosine
    of the fetched vectors, not anything ADC-derived."""
    got = similarity_pq_adc_rerank(spark, sf_dir).collect()
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    for r in got:
        q, v = emb[r.query_id], emb[r.vec_id]
        want = float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v)))
        assert abs(r.cos - want) < 2e-6, (r.query_id, r.vec_id)


def test_rerank_recall_dominates_adc_topk(spark, sf_dir):
    """Refining the top-R ADC pool by exact distance can only improve
    (never hurt) recall vs taking the ADC top-K directly: any true
    top-K member inside the pool outranks every non-member exactly."""
    bf = {
        (r.query_id, r.vec_id)
        for r in similarity_topk_bruteforce(spark, sf_dir).collect()
    }
    adc = similarity_pq_adc_topk(spark, sf_dir).collect()
    rr = similarity_pq_adc_rerank(spark, sf_dir).collect()
    adc_hits = sum((r.query_id, r.vec_id) in bf for r in adc)
    rr_hits = sum((r.query_id, r.vec_id) in bf for r in rr)
    assert rr_hits >= adc_hits
    # hit_exact column agrees with the recomputed membership
    for r in rr:
        assert r.hit_exact == int((r.query_id, r.vec_id) in bf)
