"""Round-10 wave 15: intrinsic dimension, Markov next-event eval."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_intrinsic_dim_recompute(spark, sf_dir):
    """The MLE reproduces from the kNN graph's own rank-1/2 rows, the
    estimate is positive and bounded by the ambient dimension times a
    slack, and accounting covers every graph node."""
    from cdc_realtime_pipeline_spark.operators.similarity import (
        embeddings_intrinsic_dim,
        embeddings_knn_graph,
    )

    r = embeddings_intrinsic_dim(spark, sf_dir).collect()[0]
    g = embeddings_knn_graph(spark, sf_dir).filter(F.col("rank") <= 2)
    per: dict[int, dict[int, float]] = {}
    for row in g.collect():
        per.setdefault(row["vec_id"], {})[row["rank"]] = 1.0 - row["cos"]
    lnmus = [
        round(math.log(d[2] / d[1]), 8)
        for d in per.values()
        if 1 in d and 2 in d and d[1] > 0
    ]
    assert r["n_used"] == len(lnmus)
    assert r["n_used"] + r["n_dropped"] == len(per)
    assert abs(r["id_two_nn"] - len(lnmus) / sum(lnmus)) < 1e-2
    assert 0.0 < r["id_two_nn"] < 200.0


def test_markov_eval_out_of_time(spark, sf_dir):
    """One row per from-state seen in both halves, the prediction is
    a state from the training vocabulary, accuracy is n_correct /
    n_test, and test steps reconcile with a direct recount."""
    from cdc_realtime_pipeline_spark.operators.extended import (
        events_markov_next_eval,
    )

    rows = events_markov_next_eval(spark, sf_dir).collect()
    assert rows
    types = {
        r["event_type"]
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type")
        .distinct()
        .collect()
    }
    seen = {r["from_type"] for r in rows}
    assert seen <= types
    for r in rows:
        assert r["pred_type"] in types
        assert 0 <= r["n_correct"] <= r["n_test"]
        assert abs(r["accuracy"] - r["n_correct"] / r["n_test"]) < 1e-3
        assert r["n_train"] >= 1


def test_entropy_rate_bounds(spark, sf_dir):
    """π sums to 1, per-state conditional entropies are bounded by
    log2(k), the rate is the contribution sum, and it lies within
    [0, max h_state]."""
    import math

    from cdc_realtime_pipeline_spark.operators.extended import (
        events_entropy_rate,
    )

    rows = events_entropy_rate(spark, sf_dir).collect()
    assert rows
    k = len(rows)
    rate = rows[0]["entropy_rate_bits"]
    assert abs(sum(r["stationary_p"] for r in rows) - 1.0) < 0.01
    for r in rows:
        assert 0.0 <= r["h_state"] <= math.log2(k) + 1e-6
        assert r["entropy_rate_bits"] == rate
    assert abs(rate - sum(r["contribution"] for r in rows)) < 1e-4
    assert 0.0 <= rate <= max(r["h_state"] for r in rows) + 1e-6


def test_hubness_accounting(spark, sf_dir):
    """Occurrence mass conserves the graph's edge count, antihubs and
    hubs are disjoint sub-populations, and the mean k-occurrence is
    the edge count over the node count."""
    from cdc_realtime_pipeline_spark.operators.similarity import (
        embeddings_hubness_audit,
        embeddings_knn_graph,
    )

    r = embeddings_hubness_audit(spark, sf_dir).collect()[0]
    g = embeddings_knn_graph(spark, sf_dir)
    n_edges = g.count()
    n_nodes = g.select("vec_id").distinct().count()
    assert r["n_nodes"] == n_nodes
    assert abs(r["mean_k_occurrence"] - n_edges / n_nodes) < 1e-3
    assert 0 <= r["n_antihubs"] < r["n_nodes"]
    assert 0 <= r["n_hubs"] < r["n_nodes"]
    assert r["max_k_occurrence"] >= 1
