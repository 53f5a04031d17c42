"""Round-10 wave 9: EM linkage, SPRT sequential monitor."""

from __future__ import annotations


def test_em_patterns_bounded_and_sane(spark, sf_dir):
    """Patterns are the distinct agreement vectors (≤16), posteriors
    are probabilities, the all-agree pattern gets the highest
    posterior, pattern counts conserve the candidate population, and
    lambda is consistent with the assigned mass."""
    from cdc_realtime_pipeline_spark.operators.dedup import (
        dedup_docs_jaccard,
        linkage_em_patterns,
    )

    rows = linkage_em_patterns(spark, sf_dir).collect()
    assert 1 <= len(rows) <= 16
    keys = {(r["f1"], r["f2"], r["f3"], r["f4"]) for r in rows}
    assert len(keys) == len(rows)
    n_pairs = dedup_docs_jaccard(spark, sf_dir).count()
    assert sum(r["n_g"] for r in rows) == n_pairs
    lam = rows[0]["lambda_final"]
    assert 0.0 < lam < 1.0
    for r in rows:
        assert 0.0 <= r["posterior"] <= 1.0
        assert r["assigned_match"] == int(r["posterior"] >= 0.5)
        assert r["lambda_final"] == lam
    by_agree = {
        sum((r["f1"], r["f2"], r["f3"], r["f4"])): r["posterior"]
        for r in rows
    }
    if 4 in by_agree and 0 in by_agree:
        assert by_agree[4] > by_agree[0]


def test_sprt_decisions_consistent(spark, sf_dir):
    """Baselines are probabilities summing to ~1 across types, crossing
    hours sit after the training window, and the decision column
    matches the crossing-hour logic."""
    from cdc_realtime_pipeline_spark.operators.inference import (
        _SPRT_TRAIN_H,
        events_sprt_monitor,
    )

    rows = events_sprt_monitor(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r["p0"] for r in rows) - 1.0) < 0.01
    for r in rows:
        assert 0.0 < r["p0"] < 1.0
        for h in (r["h1_hour"], r["h0_hour"]):
            if h is not None:
                assert h >= _SPRT_TRAIN_H
        if r["decision"] == "accept_h1":
            assert r["h1_hour"] is not None
            if r["h0_hour"] is not None:
                assert r["h1_hour"] <= r["h0_hour"]
        elif r["decision"] == "accept_h0":
            assert r["h0_hour"] is not None
        else:
            assert r["h1_hour"] is None and r["h0_hour"] is None
