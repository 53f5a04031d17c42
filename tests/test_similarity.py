"""Similarity search: brute-force exactness properties and LSH recall."""

from __future__ import annotations

import math

from cdc_realtime_pipeline_spark.operators.similarity import (
    similarity_topk_bruteforce,
    similarity_topk_lsh,
)


def test_bruteforce_topk_properties(spark, sf_dir):
    rows = similarity_topk_bruteforce(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r["rk"])
        # scores non-increasing, within [-1, 1], self excluded
        scores = [r["cos"] for r in rs]
        assert scores == sorted(scores, reverse=True)
        assert all(-1.0 - 1e-9 <= s <= 1.0 + 1e-9 for s in scores)
        assert all(r["vec_id"] != q for r in rs)
        assert len(rs) == 5


def test_ivf_results_carry_exact_scores(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.similarity import similarity_topk_ivf

    brute = {
        (r["query_id"], r["vec_id"]): r["cos"]
        for r in similarity_topk_bruteforce(spark, sf_dir).collect()
    }
    ivf = similarity_topk_ivf(spark, sf_dir).collect()
    assert ivf
    for r in ivf:
        key = (r["query_id"], r["vec_id"])
        if key in brute:
            assert math.isclose(r["cos"], brute[key], abs_tol=1e-9)
    # every query probes its own cell, so it must get a full top-K or
    # the whole cell; either way ranks are 1..n contiguous
    by_q = {}
    for r in ivf:
        by_q.setdefault(r["query_id"], []).append(r["rk"])
    for rks in by_q.values():
        assert sorted(rks) == list(range(1, len(rks) + 1))


def test_lsh_results_are_subset_with_exact_scores(spark, sf_dir):
    brute = {
        (r["query_id"], r["vec_id"]): r["cos"]
        for r in similarity_topk_bruteforce(spark, sf_dir).collect()
    }
    lsh = similarity_topk_lsh(spark, sf_dir).collect()
    assert lsh  # buckets are non-degenerate on the fixture
    # any (q, v) the LSH path returns that brute force also ranked must
    # carry the identical exact cosine (same rerank math)
    overlap = [(r, brute[(r["query_id"], r["vec_id"])]) for r in lsh
               if (r["query_id"], r["vec_id"]) in brute]
    for r, expect in overlap:
        assert math.isclose(r["cos"], expect, abs_tol=1e-9)


def test_ann_recall_floors(spark, sf_dir):
    """VERDICT r2 #5: pin top-K recall floors for both ANN paths so a
    future plan change cannot silently trade recall for speed. The
    pipeline is fully deterministic (seeded hyperplanes, fixed
    fixture), so the measured values are stable: at sf0.001 multi-probe
    H<=2 LSH recalls 3/15 (single-probe recalled 1/15) and IVF
    probe-1 recalls 15/15. Floors sit at measured-value-with-margin;
    an intentional retune that lowers recall must update this test."""
    from cdc_realtime_pipeline_spark.operators.similarity import similarity_recall_report

    rep = {r["method"]: r for r in similarity_recall_report(spark, sf_dir).collect()}
    assert rep["lsh"]["recall"] >= 0.2
    assert rep["ivf"]["recall"] >= 0.95
    # denominators must be the full brute-force top-K set
    assert rep["lsh"]["n_bf"] == rep["ivf"]["n_bf"] > 0


def test_int8_quantized_recall_floor(spark, sf_dir):
    """int8 symmetric quantization must barely perturb top-K retrieval:
    recall vs exact float >= 0.9 on the fixture (measured 14/15)."""
    from cdc_realtime_pipeline_spark.operators.similarity import (
        similarity_quantized_recall,
    )

    [row] = similarity_quantized_recall(spark, sf_dir).collect()
    assert row["recall"] >= 0.9
    assert row["n_bf"] > 0


def test_semantic_dedup_subset_and_recall(spark, sf_dir):
    # SemDeDup finds only within-cluster pairs — every pair must exist
    # in the exact all-pairs truth with the same cosine, and the
    # cross-cluster miss class must stay small on the planted fixture
    from cdc_realtime_pipeline_spark.operators.similarity import (
        dedup_embeddings_cosine,
        dedup_embeddings_semantic,
    )

    truth = {
        (r.vec_a, r.vec_b): r.cos
        for r in dedup_embeddings_cosine(spark, sf_dir, exact=True).collect()
    }
    sem = dedup_embeddings_semantic(spark, sf_dir).collect()
    assert len(sem) > 0
    for r in sem:
        assert truth[(r.vec_a, r.vec_b)] == r.cos  # subset, exact scores
    # recall floor: a planted near-identical pair lands in the same
    # cluster unless the nudge crosses a Voronoi boundary — rare
    assert len(sem) / len(truth) >= 0.8


def test_jl_projection_distortion_concentrates(spark, sf_dir):
    """JL certificate: with k=16 Rademacher dims the norm ratio is
    within [0.5, 1.5] for ~all vectors and its mean is near 1 — the
    bound that justifies running ANN/clustering on the projected
    vectors. Also: zero Exchange in the plan (pure narrow map)."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from cdc_realtime_pipeline_spark.operators.training_data import (
        embeddings_jl_projection,
    )

    out = embeddings_jl_projection(spark, sf_dir)
    rows = out.agg(
        F.avg("distortion").alias("m"),
        F.count(F.when((F.col("distortion") < 0.5) | (F.col("distortion") > 1.5), 1)).alias("bad"),
        F.count("*").alias("n"),
    ).collect()[0]
    assert 0.85 < rows["m"] < 1.15, rows["m"]
    assert rows["bad"] / rows["n"] < 0.05

    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange hashpartitioning" not in plan
