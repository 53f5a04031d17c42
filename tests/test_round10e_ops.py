"""Round-10 wave 8: gate fairness, diff-in-diff, nDCG agreement."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_fairness_audit_reconciles_with_gate(spark, sf_dir):
    """Per-source counts reconcile with the gate's own output, the
    reference source holds the maximum pass rate (di_ratio 1.0, never
    flagged), and the four-fifths flag matches its exact definition."""
    from cdc_realtime_pipeline_spark.operators.curation import (
        docs_gopher_quality_gate,
        quality_gate_fairness_audit,
    )

    rows = quality_gate_fairness_audit(spark, sf_dir).collect()
    gate = {
        r["source"]: (r["n_docs"], r["kept"])
        for r in docs_gopher_quality_gate(spark, sf_dir).collect()
    }
    assert {r["source"] for r in rows} == set(gate)
    ref = rows[0]["ref_source"]
    max_rate = max(k / n for n, k in gate.values())
    for r in rows:
        n, k = gate[r["source"]]
        assert (r["n_docs"], r["n_kept"]) == (n, k)
        assert r["ref_source"] == ref
        assert abs(r["pass_rate"] - k / n) < 1e-5
        expected_flag = int(
            5 * k * gate[ref][0] < 4 * n * gate[ref][1]
        )
        assert r["fails_four_fifths"] == expected_flag
        if r["source"] == ref:
            assert abs(r["di_ratio"] - 1.0) < 1e-9
            assert r["fails_four_fifths"] == 0
        assert abs(r["pass_rate"] - max_rate) < 1e-5 or r["di_ratio"] < 1.0 + 1e-9


def test_diff_in_diff_identity(spark, sf_dir):
    """The DiD estimate equals the mean identity from its own cells,
    the four cells partition the corpus, and t = did/se."""
    from cdc_realtime_pipeline_spark.operators.inference import (
        events_diff_in_diff,
    )

    r = events_diff_in_diff(spark, sf_dir).collect()[0]
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert (
        r["n_ctrl_pre"] + r["n_ctrl_post"] + r["n_treat_pre"] + r["n_treat_post"]
        == n_events
    )
    expect = (r["mean_treat_post"] - r["mean_treat_pre"]) - (
        r["mean_ctrl_post"] - r["mean_ctrl_pre"]
    )
    assert abs(r["did"] - expect) < 1e-5
    assert r["se"] > 0
    assert abs(r["t_stat"] - r["did"] / r["se"]) < 1e-3


def test_ndcg_bounds_and_recompute(spark, sf_dir):
    """nDCG sits in (0, 1], overlap is bounded by k, and a pure-Python
    recompute from the two rankings agrees."""
    from cdc_realtime_pipeline_spark.operators.text_ops import (
        _NDCG_K,
        _TFIDF_TOPK,
        retrieval_ndcg_agreement,
        text_bm25_topk,
        text_tfidf_topk,
    )

    r = retrieval_ndcg_agreement(spark, sf_dir).collect()[0]
    assert r["k"] == _NDCG_K
    assert 0 <= r["n_overlap"] <= _NDCG_K
    assert 0.0 < r["ndcg"] <= 1.0 + 1e-9
    bm = [
        row["doc_id"]
        for row in text_bm25_topk(spark, sf_dir).collect()[:_NDCG_K]
    ]
    tfi = [row["doc_id"] for row in text_tfidf_topk(spark, sf_dir).collect()]
    rel = {d: _TFIDF_TOPK - i for i, d in enumerate(tfi)}
    dcg = sum(
        rel.get(d, 0) / math.log2(i + 2) for i, d in enumerate(bm)
    )
    idcg = sum(
        (_TFIDF_TOPK - i) / math.log2(i + 2) for i in range(_NDCG_K)
    )
    assert abs(r["ndcg"] - dcg / idcg) < 1e-5
