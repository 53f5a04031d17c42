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
