"""Invariant tests for the round-4 operator block (the oracle harness
checks cross-engine equality; these pin the semantic claims the
docstrings make, on the sf0.001 fixture)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_realtime_pipeline_spark.operators.corpus_ops import split_leakage_audit
from cdc_realtime_pipeline_spark.operators.curation import (
    _CHUNK_TOKENS,
    corpus_mixture_weights,
    docs_chunked,
)
from cdc_realtime_pipeline_spark.operators.dedup import (
    dedup_candidates_audit,
    dedup_docs_jaccard,
    dup_cross_source_matrix,
)
from cdc_realtime_pipeline_spark.operators.dq import events_schema_drift
from cdc_realtime_pipeline_spark.operators.extended import attribution_last_touch


def test_leakage_audit_partitions_jaccard_pairs(spark, sf_dir):
    # the 3x3 split matrix must account for every verified pair exactly once
    n_pairs = dedup_docs_jaccard(spark, sf_dir).count()
    audit = split_leakage_audit(spark, sf_dir).collect()
    assert sum(r.n_pairs for r in audit) == n_pairs
    for r in audit:
        assert r.leaked == int(r.split_a != r.split_b)


def test_candidates_audit_matches_jaccard_count(spark, sf_dir):
    row = dedup_candidates_audit(spark, sf_dir).collect()[0]
    assert row.n_matches_tau == dedup_docs_jaccard(spark, sf_dir).count()
    assert row.self_check == 1
    # every candidate came from at least one generator
    assert row.n_rare_path + row.n_band_only == row.n_candidates


def test_cross_source_matrix_accounts_every_pair(spark, sf_dir):
    n_pairs = dedup_docs_jaccard(spark, sf_dir).count()
    m = dup_cross_source_matrix(spark, sf_dir).collect()
    assert sum(r.n_pairs for r in m) == n_pairs
    for r in m:
        assert r.cross_source == int(r.source_a != r.source_b)
        assert 0.6 <= r.avg_jaccard <= 1.0 + 1e-9


def test_docs_chunked_window_invariants(spark, sf_dir):
    chunks = docs_chunked(spark, sf_dir)
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.max("chunk_idx").alias("max_idx"),
            F.min("n_tokens").alias("min_tok"),
            F.max("n_tokens").alias("max_tok"),
        )
        .collect()
    )
    assert per_doc  # every doc yields >= 1 chunk
    for r in per_doc:
        assert r.max_idx == r.n_chunks - 1  # contiguous 0..n-1
        assert 1 <= r.min_tok and r.max_tok <= _CHUNK_TOKENS
    # all chunks except a doc's last are full-width
    full = chunks.join(
        chunks.groupBy("doc_id").agg(F.max("chunk_idx").alias("last_idx")), "doc_id"
    ).filter(F.col("chunk_idx") < F.col("last_idx"))
    assert full.filter(F.col("n_tokens") != _CHUNK_TOKENS).count() == 0


def test_mixture_weights_normalize(spark, sf_dir):
    rows = corpus_mixture_weights(spark, sf_dir).collect()
    total = sum(r.mix_weight for r in rows)
    assert abs(total - 1.0) <= len(rows) * 1e-6  # 6dp rounding per source
    for r in rows:
        assert r.mix_weight > 0 and r.epochs_at_budget > 0


def test_schema_drift_flags_planted_key(spark, sf_dir):
    rows = events_schema_drift(spark, sf_dir).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.key, []).append(r)
    assert set(by_key) == {"k", "beta_field"}
    assert all(r.is_new == 0 for r in by_key["k"])
    assert all(r.is_new == 1 for r in by_key["beta_field"])
    # planted drift starts mid-stream, so beta_field spans fewer days
    assert len(by_key["beta_field"]) < len(by_key["k"])


def test_attribution_bounds(spark, sf_dir):
    rows = attribution_last_touch(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_attributed <= r.n_purchases
        assert r.avg_mins_to_convert >= 0
        # attributed clicks are within the 1h window
        if r.n_attributed:
            assert r.avg_mins_to_convert <= 60 + 1e-9


def test_kmeans_assign_partitions_corpus(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.similarity import (
        embeddings_kmeans_assign,
    )
    from cdc_realtime_pipeline_spark.session import load_table

    rows = embeddings_kmeans_assign(spark, sf_dir).collect()
    n_total = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vectors for r in rows) == n_total  # every vector assigned once
    assert len({r.cluster for r in rows}) == len(rows)
    for r in rows:
        assert r.avg_d2 >= 0


def test_mad_outliers_bounds(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.dq import value_mad_outliers

    for r in value_mad_outliers(spark, sf_dir).collect():
        assert 0 <= r.n_outliers <= r.n
        assert r.mad >= 0
        # MAD flags can exceed sigma-rule rates on heavy tails but must
        # stay a small minority on the fixture's bounded values
        assert r.outlier_frac < 0.5


def test_shingle_df_histogram_consistency(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.dedup import (
        MAX_SHINGLE_DF,
        _shared_shingles,
        shingle_df_histogram,
    )

    rows = shingle_df_histogram(spark, sf_dir).collect()
    n_distinct = _shared_shingles(spark, sf_dir).select("shingle").distinct().count()
    assert sum(r.n_shingles for r in rows) == n_distinct
    for r in rows:
        lo = 2**r.df_bucket
        assert r.n_rare <= r.n_shingles
        # buckets fully under the cap are all-rare; fully above, none
        if 2 ** (r.df_bucket + 1) - 1 <= MAX_SHINGLE_DF:
            assert r.n_rare == r.n_shingles
        if lo > MAX_SHINGLE_DF:
            assert r.n_rare == 0


def test_kmeans_train_monotone_inertia(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.similarity import (
        _KMEANS_ITERS,
        embeddings_kmeans_train,
    )

    rows = embeddings_kmeans_train(spark, sf_dir).collect()
    assert [r.iteration for r in rows] == list(range(_KMEANS_ITERS))
    inertias = [r.inertia for r in rows]
    assert all(b <= a + 1e-3 for a, b in zip(inertias, inertias[1:]))
    assert all(r.non_increasing == 1 for r in rows)
    assert len({r.n_assigned for r in rows}) == 1  # corpus never shrinks


def test_lang_confusion_matrix_consistency(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.text_ops import (
        lang_confusion_matrix,
        text_lang_id,
    )

    rows = lang_confusion_matrix(spark, sf_dir).collect()
    assert sum(r.n_docs for r in rows) == text_lang_id(spark, sf_dir).count()
    from collections import defaultdict

    frac = defaultdict(float)
    for r in rows:
        frac[r.declared_lang] += r.cell_frac
        assert r.agree == int(r.declared_lang == r.pred_lang)
    for lang, tot in frac.items():
        assert abs(tot - 1.0) < 1e-4, lang


def test_key_skew_profile_invariants(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.dq import key_skew_profile
    from cdc_realtime_pipeline_spark.session import load_table

    row = key_skew_profile(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events")
    assert row.n_rows == ev.count()
    assert row.n_keys == ev.select("user_id").distinct().count()
    assert row.top1_share <= row.top10_share <= 1.0 + 1e-9
    assert row.p50_key_rows <= row.p99_key_rows <= row.max_key_rows
    assert row.skew_ratio >= 1.0 - 1e-9
    # top1_share is max/total by definition
    assert abs(row.top1_share - row.max_key_rows / row.n_rows) < 1e-5


def test_bloom_semijoin_exact_vs_plain_semi(spark, sf_dir):
    # the bloom is a prefilter only: output must equal the plain
    # semi join bit-for-bit (no false negatives survive, false
    # positives are removed by the exact join)
    from cdc_realtime_pipeline_spark.operators.relational import (
        bloom_semijoin_reduction,
    )
    from cdc_realtime_pipeline_spark.session import load_table

    got = bloom_semijoin_reduction(spark, sf_dir).collect()[0]
    hv = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select("o_orderkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    plain = (
        li.join(hv, li.l_orderkey == hv.o_orderkey, "left_semi")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("l_orderkey").alias("o"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) + 1e-9,
                2,
            ).alias("rev"),
        )
        .collect()[0]
    )
    assert (got.n_pruned_in, got.n_orders, got.hv_revenue) == (
        plain.n,
        plain.o,
        plain.rev,
    )


def test_chunk_dedup_stats_consistent_with_docs_chunked(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.curation import chunk_dedup_stats

    rows = chunk_dedup_stats(spark, sf_dir).collect()
    # same chunking as docs_chunked: totals must agree
    assert sum(r.n_chunks for r in rows) == docs_chunked(spark, sf_dir).count()
    for r in rows:
        assert 0 <= r.n_dup_chunks <= r.n_chunks
        assert 0.0 <= r.dup_ratio <= 1.0 + 1e-9
        if r.n_dup_chunks:
            assert r.max_multiplicity >= 2


def test_correlated_subquery_matches_decorrelated_forms(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.extended import (
        correlated_subquery_conformance,
    )
    from cdc_realtime_pipeline_spark.session import load_table

    row = correlated_subquery_conformance(spark, sf_dir).collect()[0]
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nat_avg = cust.groupBy("c_nationkey").agg(F.avg("c_acctbal").alias("nav"))
    above = (
        cust.join(nat_avg, "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("nav"))
        .count()
    )
    no_orders = cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).count()
    big = cust.join(
        orders.filter(F.col("o_totalprice") > 150000),
        cust.c_custkey == F.col("o_custkey"),
        "left_semi",
    ).count()
    assert row.n_above_nation_avg == above
    assert row.n_without_orders == no_orders
    assert row.n_with_big_order == big


def test_lateral_topk_matches_window_rank_twin(spark, sf_dir):
    from pyspark.sql import Window

    from cdc_realtime_pipeline_spark.operators.extended import (
        lateral_join_topk_conformance,
    )
    from cdc_realtime_pipeline_spark.session import load_table

    got = {
        (r.c_custkey, r.o_orderkey)
        for r in lateral_join_topk_conformance(spark, sf_dir).collect()
    }
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 10 == 0)
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    want = {
        (r.o_custkey, r.o_orderkey)
        for r in orders.join(
            cust, orders.o_custkey == cust.c_custkey, "left_semi"
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .collect()
    }
    assert got == want


def test_listagg_md5_matches_python_ordered_concat(spark, sf_dir):
    import hashlib

    from cdc_realtime_pipeline_spark.operators.extended import listagg_conformance
    from cdc_realtime_pipeline_spark.session import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 97 == 0)
        .select("event_type", "event_id", "user_id")
        .collect()
    )
    by_type: dict = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append((r.event_id, r.user_id))
    rows = listagg_conformance(spark, sf_dir).collect()
    assert {r.event_type for r in rows} == set(by_type)
    for r in rows:
        seq = ",".join(str(u) for _, u in sorted(by_type[r.event_type]))
        assert r.n == len(by_type[r.event_type])
        assert r.seq_md5 == hashlib.md5(seq.encode()).hexdigest()


def test_tpch_q18_like_threshold_and_limit(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.relational import tpch_q18_like
    from cdc_realtime_pipeline_spark.session import load_table

    rows = tpch_q18_like(spark, sf_dir).collect()
    assert 0 < len(rows) <= 100
    li = load_table(spark, sf_dir, "lineitem")
    sums = {
        r.l_orderkey: r.qty
        for r in li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 300)
        .collect()
    }
    for r in rows:
        assert r.o_orderkey in sums
        assert abs(r.total_qty - sums[r.o_orderkey]) < 1e-6


def test_weighted_reservoir_exact_budget_and_bias(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.curation import (
        _RESERVOIR_K,
        corpus_weighted_reservoir,
    )
    from cdc_realtime_pipeline_spark.operators.text_ops import text_quality

    rows = corpus_weighted_reservoir(spark, sf_dir).collect()
    per_source: dict = {}
    for r in rows:
        per_source.setdefault(r.source, []).append(r)
        assert 1 <= r.rk <= _RESERVOIR_K
        assert 0.0 <= r.res_key <= 1.0 + 1e-6
    for src, members in per_source.items():
        assert len(members) == _RESERVOIR_K, src
        assert sorted(m.rk for m in members) == list(range(1, _RESERVOIR_K + 1))
    # weighted selection must favor quality: mean quality of the
    # sample exceeds the corpus mean (clear margin on this fixture)
    q = [r.quality for r in text_quality(spark, sf_dir).collect()]
    sample_q = [r.quality for r in rows]
    assert sum(sample_q) / len(sample_q) > sum(q) / len(q)


def test_bitmap_rollup_exactness_and_bounds(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.dq import daily_users_bitmap_rollup
    from cdc_realtime_pipeline_spark.session import load_table

    rows = daily_users_bitmap_rollup(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("week", "ts").alias("week_start"), "user_id"
    )
    want = {
        r.week_start: r.n
        for r in ev.groupBy("week_start")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert {r.week_start for r in rows} == set(want)
    for r in rows:
        # the bitmap path must be EXACT, not approximate
        assert r.wau_exact == want[r.week_start]
        assert r.sum_daily_dau >= r.wau_exact
        assert r.revisit_ratio >= 1.0 - 1e-9


def test_try_functions_null_counts(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.extended import (
        try_functions_conformance,
    )
    from cdc_realtime_pipeline_spark.session import load_table

    row = try_functions_conformance(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    n_zero_den = ev.filter(F.col("event_id") % 5 == 0).count()
    n_pos_id = ev.filter(F.col("event_id") > 0).count()
    assert row.n_rows == n
    assert row.n_div_null == n_zero_den
    assert row.n_badcast_null == n  # event_type is never numeric
    assert row.n_overflow_null == n_pos_id
    assert row.n_roundtrip_ok == n  # double -> string -> double is lossless
