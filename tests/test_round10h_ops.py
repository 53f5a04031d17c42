"""Round-10 wave 11: lagged cross-correlation, word burstiness."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_cross_correlation_pairs_and_bounds(spark, sf_dir):
    """Every ordered type pair appears once, correlations are valid,
    the best lag sits in the search window, and r_best dominates
    r_lag0 (lag 0 is one of the candidates)."""
    from cdc_realtime_pipeline_spark.operators.inference import (
        _XC_MAX_LAG,
        events_cross_correlation,
    )

    rows = events_cross_correlation(spark, sf_dir).collect()
    types = {
        r["event_type"]
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type")
        .distinct()
        .collect()
    }
    assert {(r["type_a"], r["type_b"]) for r in rows} == {
        (a, b) for a in types for b in types if a != b
    }
    for r in rows:
        assert -1.0 - 1e-6 <= r["r_lag0"] <= 1.0 + 1e-6
        assert -1.0 - 1e-6 <= r["r_best"] <= 1.0 + 1e-6
        assert 0 <= r["best_lag"] <= _XC_MAX_LAG
        assert r["r_best"] >= r["r_lag0"] - 1e-9
        assert r["min_points"] > 2


def test_burstiness_moments(spark, sf_dir):
    """Rows come in df-descending order, means are >= 1 token per
    containing doc, the adaptation probability is a probability, and
    a word with every-tf-equal would have Fano 0 <= fano anyway."""
    from cdc_realtime_pipeline_spark.operators.text_ops import (
        _BURST_TOP,
        text_word_burstiness,
    )

    rows = text_word_burstiness(spark, sf_dir).collect()
    assert 0 < len(rows) <= _BURST_TOP
    dfs = [r["df"] for r in rows]
    assert dfs == sorted(dfs, reverse=True)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    for r in rows:
        assert 1 <= r["df"] <= n_docs
        assert r["mean_tf"] >= 1.0
        assert 0.0 <= r["p_adapt"] <= 1.0
        assert r["fano"] >= 0.0
        assert r["total_tf"] >= r["df"]
