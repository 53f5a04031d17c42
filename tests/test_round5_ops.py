"""Invariant tests for the round-5 operator block (the oracle harness
checks cross-engine equality; these pin the semantic claims the
docstrings make, on the sf0.001 fixture)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cdc_realtime_pipeline_spark.operators.corpus_ops import (
    dedup_cluster_canonical,
    dup_clusters_connected_components,
)
from cdc_realtime_pipeline_spark.operators.curation import corpus_token_budget_pack
from cdc_realtime_pipeline_spark.operators.extended import (
    grouping_sets_conformance,
    interval_datetime_conformance,
)
from cdc_realtime_pipeline_spark.operators.multimodal import media_phash_near_dup
from cdc_realtime_pipeline_spark.operators.relational_tpch import (
    tpch_q8_like,
    tpch_q11_like,
)
from cdc_realtime_pipeline_spark.operators.similarity import similarity_range_search
from cdc_realtime_pipeline_spark.operators.temporal import (
    _ASOF_TOL_MS,
    asof_join_nearest,
)
from cdc_realtime_pipeline_spark.operators.text_ops import text_char_ngram_entropy
from cdc_realtime_pipeline_spark.operators.training_data import embeddings_dim_stats


def test_q8_market_share_is_a_true_ratio(spark, sf_dir):
    rows = tpch_q8_like(spark, sf_dir).collect()
    assert rows, "market must be non-degenerate at sf0.001"
    for r in rows:
        assert 0.0 <= r.mkt_share <= 1.0
        assert r.bloc_volume <= r.total_volume + 1e-6


def test_q11_threshold_filters_but_not_everything(spark, sf_dir):
    out = tpch_q11_like(spark, sf_dir)
    n_parts = out.sparkSession.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey"
    ).distinct().count()
    n = out.count()
    assert 0 < n < n_parts  # the 1.25x-mean floor keeps a strict subset


def test_grouping_sets_totals_are_consistent(spark, sf_dir):
    rows = grouping_sets_conformance(spark, sf_dir).collect()
    by_gid = {}
    for r in rows:
        by_gid.setdefault(r.gid, []).append(r)
    # gid 0 = (type, month), 1 = (type), 2 = (month), 3 = grand total
    assert set(by_gid) == {0, 1, 2, 3}
    total = sum(r.n for r in by_gid[0])
    assert total == sum(r.n for r in by_gid[1])
    assert total == sum(r.n for r in by_gid[2])
    assert total == by_gid[3][0].n


def test_interval_conformance_day_offsets_monotone(spark, sf_dir):
    rows = interval_datetime_conformance(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.min_day_offset <= r.max_day_offset
        assert 0 <= r.n_spill_next_month <= r.n


def test_phash_detects_planted_bitflips_and_exact_copies(spark, sf_dir):
    rows = {r.hamming: r for r in media_phash_near_dup(spark, sf_dir).collect()}
    # exact replicas from the shared dup corpus => hamming 0 pairs
    assert 0 in rows and rows[0].n_pairs > 0
    # planted single-bit flips => hamming 1 pairs flagged as variants
    assert 1 in rows and rows[1].n_planted_variant_pairs > 0
    assert rows[1].n_planted_variant_pairs <= rows[1].n_pairs


def test_canonical_is_longest_member(spark, sf_dir):
    cc = {
        r.component: r.n_members
        for r in dup_clusters_connected_components(spark, sf_dir).collect()
    }
    rows = dedup_cluster_canonical(spark, sf_dir).collect()
    assert {r.component for r in rows} == set(cc)
    for r in rows:
        assert r.n_members == cc[r.component]
        # canonical keeps the longest => dropped members can't beat it
        # by more than the tie rule allows (equal length, higher id)
        assert r.canonical_chars * (r.n_members - 1) >= r.dropped_chars - 1e-9


def test_range_search_counts_nest(spark, sf_dir):
    for r in similarity_range_search(spark, sf_dir).collect():
        assert 0 <= r.n_tight <= r.n_in_range
        assert r.best_cos >= r.mean_cos - 1e-9


def test_entropy_bounds(spark, sf_dir):
    rows = text_char_ngram_entropy(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # 4dp rounding can push an all-distinct doc's H a hair past
        # the log2(N) bound
        assert 0.0 - 1e-9 <= r.entropy_bits <= math.log2(r.n_grams) + 1e-3
        assert r.n_distinct_grams <= r.n_grams


def test_token_budget_pack_respects_budget(spark, sf_dir):
    rows = corpus_token_budget_pack(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 2 * r.tokens_kept <= r.tokens_total
        assert r.n_kept <= r.n_docs
        assert 0.0 <= r.kept_token_frac <= 0.5 + 1e-9


def test_asof_nearest_within_tolerance_and_prefers_backward(spark, sf_dir):
    rows = asof_join_nearest(spark, sf_dir).collect()
    assert rows
    matched = [r for r in rows if r.direction is not None]
    assert matched, "tolerance window must be non-vacuous"
    for r in matched:
        assert 0 <= r.gap_ms <= _ASOF_TOL_MS
        assert r.direction in ("b", "f")
    assert any(r.direction == "b" for r in matched)


def test_dim_stats_covers_all_dims(spark, sf_dir):
    rows = embeddings_dim_stats(spark, sf_dir).collect()
    assert [r.dim for r in rows] == list(range(1, 65))
    n = rows[0].n
    for r in rows:
        assert r.n == n  # rectangular embedding matrix
        assert r.min_x <= r.mean_x <= r.max_x
        assert r.std_x >= 0.0
        assert 0 <= r.n_saturated <= r.n


def test_dq_rule_engine_catches_planted_violations(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.dq import dq_rule_engine

    rows = {r.rule: r for r in dq_rule_engine(spark, sf_dir).collect()}
    assert set(rows) == {
        "not_null_custkey", "unique_orderkey", "accepted_status",
        "price_in_range", "priority_format", "orders_fresh_60d",
    }
    n_planted = rows["not_null_custkey"].n_failed
    assert n_planted > 0  # the corrupted rows exist at sf0.001
    # one corrupted row trips all five row-level rules identically
    # (x1000 pushes every fixture price past the 500k ceiling)
    for rule in (
        "unique_orderkey", "accepted_status", "priority_format", "price_in_range"
    ):
        assert rows[rule].n_failed == n_planted
    assert rows["orders_fresh_60d"].passed
    for r in rows.values():
        assert r.passed == (r.n_failed == 0)
