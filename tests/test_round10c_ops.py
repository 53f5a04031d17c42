"""Round-10 wave 6: full-outer stream-stream join, bitemporal as-of,
decision stump, Davies-Bouldin."""

from __future__ import annotations

import pytest

import math

from pyspark.sql import functions as F


@pytest.mark.slow
def test_full_outer_supersets_left_and_inner(spark, sf_dir):
    """Full outer = inner matches + the left-outer null leg + a
    non-empty right-outer null leg (clicks with no purchase), with
    both outer legs watermark-gated."""
    from cdc_realtime_pipeline_spark.streaming.stream_queries import (
        stream_stream_full_outer,
        stream_stream_join,
        stream_stream_left_outer,
    )

    full = stream_stream_full_outer(spark, sf_dir).collect()
    inner = {
        (r["purchase_id"], r["click_id"])
        for r in stream_stream_join(spark, sf_dir).collect()
    }
    left = stream_stream_left_outer(spark, sf_dir).collect()
    matched = {
        (r["purchase_id"], r["click_id"])
        for r in full
        if r["purchase_id"] is not None and r["click_id"] is not None
    }
    assert matched == inner
    left_nulls = {
        r["purchase_id"] for r in left if r["click_id"] is None
    }
    full_p_nulls = {
        r["purchase_id"]
        for r in full
        if r["click_id"] is None and r["purchase_id"] is not None
    }
    assert full_p_nulls == left_nulls
    right_nulls = [r for r in full if r["purchase_id"] is None]
    assert right_nulls, "right-outer leg empty"
    assert all(r["gap_s"] is None for r in right_nulls)
    assert all(r["user_id"] is not None for r in full)


def test_bitemporal_snapshot_transition(spark, sf_dir):
    """At t060 the +70-min new periods are not yet known (0 wins); at
    t120 exactly the %7 keys flip to their new period; both snapshots
    cover every key exactly once."""
    from cdc_realtime_pipeline_spark.operators.cdc_ops import (
        cdc_bitemporal_asof,
    )

    rows = {r["snapshot"]: r for r in cdc_bitemporal_asof(spark, sf_dir).collect()}
    assert set(rows) == {"t060", "t120"}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n = ev.count()
    n7 = ev.filter(F.col("event_id") % 7 == 0).count()
    n5 = ev.filter(F.col("event_id") % 5 == 0).count()
    n57 = ev.filter(
        (F.col("event_id") % 5 == 0) & (F.col("event_id") % 7 == 0)
    ).count()
    t60, t120 = rows["t060"], rows["t120"]
    assert t60["n_keys"] == n and t120["n_keys"] == n
    assert t60["n_new_period"] == 0
    assert t120["n_new_period"] == n7
    # at t060 every %5 key resolves to its correction
    assert t60["n_corrected"] == n5
    # at t120 corrections still win only where no new period exists
    assert t120["n_corrected"] == n5 - n57
    assert t60["price_checksum"] != t120["price_checksum"]


def test_decision_stump_gain_recompute(spark, sf_dir):
    """Ranks are a permutation, left/right counts conserve the corpus,
    and the top split's gain matches a pure-Python recompute from the
    emitted contingency counts."""
    from cdc_realtime_pipeline_spark.operators.inference import (
        events_decision_stump,
    )

    rows = events_decision_stump(spark, sf_dir).collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    n = rows[0]["n_left"] + rows[0]["n_right"]
    npos = rows[0]["n_pos_left"] + rows[0]["n_pos_right"]
    for r in rows:
        assert r["n_left"] + r["n_right"] == n
        assert r["n_pos_left"] + r["n_pos_right"] == npos
        assert r["gain"] >= -1e-6

    def h(p: float) -> float:
        if p <= 0.0 or p >= 1.0:
            return 0.0
        return -p * math.log2(p) - (1 - p) * math.log2(1 - p)

    top = rows[0]
    expect = (
        h(npos / n)
        - (top["n_left"] / n) * h(top["n_pos_left"] / top["n_left"])
        - (top["n_right"] / n) * h(top["n_pos_right"] / top["n_right"])
    )
    assert abs(expect - top["gain"]) < 1e-5


def test_davies_bouldin_geometry(spark, sf_dir):
    """One row per label, positive scatters and ratios, the worst
    partner is never the label itself, and membership counts conserve
    the corpus."""
    from cdc_realtime_pipeline_spark.operators.similarity import (
        label_davies_bouldin,
    )

    rows = label_davies_bouldin(spark, sf_dir).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    labels = {r["label"] for r in emb.select("label").distinct().collect()}
    assert {r["label"] for r in rows} == labels
    assert sum(r["n_vecs"] for r in rows) == emb.count()
    for r in rows:
        assert r["s_own"] > 0.0
        assert r["r_max"] > 0.0
        assert r["worst_other"] != r["label"]
        assert r["worst_other"] in labels
