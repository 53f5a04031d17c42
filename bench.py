"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Runs the engine's representative query set (scan/agg, star joins,
window functions, CDC parse, dedup, text, similarity) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <scale factor>}

Each query executes fully via the ``noop`` write format (distributed
execution, no driver-side collect — measures the plan, not py4j
transfer).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one per operator family, weighted toward the plans that
# dominate at scale (joins, window aggs, text/dedup pipelines).
BENCH_QUERIES = [
    "tpch_q1",
    "tpch_q6",
    "revenue_top_orders",
    "region_revenue",
    "top_parts_per_supplier",
    "monthly_order_stats",
    "window_agg_5m",
    "dash_latency_per_minute",
    "dash_bid_ask_ranking",
    "alerts_price_spike",
    "alerts_rapid_trades",
    "cdc_roundtrip",
    "cdc_apply_changes",
    "dedup_events_exact",
    "dedup_docs_exact",
    "dedup_docs_jaccard",
    "dedup_docs_levenshtein",
    "dedup_docs_incremental",
    "dedup_candidates_audit",
    "dedup_embeddings_cosine",
    "alerts_rapid_trades_reset",
    "text_quality",
    "text_lang_id",
    "similarity_topk_bruteforce",
    "similarity_topk_lsh",
    "corpus_prep_pipeline",
    "corpus_pack_sequences",
    "label_centroids",
    "embeddings_preprocessed",
    "window_agg_sliding",
    "sessionize_native",
    "asof_join_last_click",
    "bucketized_range_join",
    # round-3 curation family (new queries extend the list; round-over-
    # round comparisons use the shared-query subset)
    "decontaminate_vs_benchmark",
    "text_unigram_lm_score",
    "text_pii_scrub",
    "corpus_curation_funnel",
    # round-3 tick time-series family
    "ohlc_bars_5m",
    "twap_hourly",
    "gap_fill_locf",
    "rolling_price_bands",
    "trailing_10min_value",
    "window_agg_1h_rollup",
    "hourly_median_iqr",
    # round-3 DQ monitoring family
    "orders_dq_profile",
    "value_distribution_psi",
    # round-3 sparse retrieval pair
    "text_tfidf_topk",
    "text_bm25_topk",
    # round-4 additions: chunking (map-side generate), last-touch
    # attribution (per-user window), cross-source matrix + split
    # leakage (both reuse the persisted candidate stage)
    "docs_chunked",
    "attribution_last_touch",
    "dup_cross_source_matrix",
    "split_leakage_audit",
    "value_mad_outliers",
    "events_schema_drift",
    "corpus_oov_rate",
    "embeddings_kmeans_assign",
    # round-4 second wave: skew diagnostics (keyed count + scalar
    # re-agg), bloom semijoin reduction (bitmap broadcast prefilter),
    # chunk-level dedup (md5-key window), correlated subqueries
    # (Catalyst decorrelation)
    "key_skew_profile",
    "bloom_semijoin_reduction",
    "chunk_dedup_stats",
    "correlated_subquery_conformance",
    "dup_graph_pagerank",
    "lateral_join_topk_conformance",
    "tpch_q18_like",
    "corpus_weighted_reservoir",
    # round-4 third wave: sketch-pruned heavy hitters (MapInPandas MG +
    # broadcast verify), codegen'd lambda-HOF pipeline, Z-order
    # projection, SemDeDup within-cluster dedup
    "heavy_hitters_mg",
    "higher_order_functions_conformance",
    "zorder_layout_stats",
    "dedup_embeddings_semantic",
    "timeseries_pattern_topk",
    # round-4 fourth wave: TPC-H shape completion representatives (the
    # join-shape outliers: left-outer two-level agg, nested
    # window-share semijoin, anti-join + scalar threshold) and DSIR
    # broadcast-model scoring
    "tpch_q13_like",
    "tpch_q20_like",
    "tpch_q22_like",
    "corpus_dsir_importance",
    "dedup_span_stats",
    "audience_overlap_bitmap",
    "tokenizer_bpe_pair_counts",
    "embeddings_jl_projection",
    "copurchase_pairs_topk",
    "event_transition_matrix",
    "cdc_diff_snapshots",
    # round-5 wave: TPC-H completion pair, canonical dedup selection
    # (reuses the CC label cache), media pHash banding, trigram
    # entropy (position explode), token-budget packing (two windows,
    # one sort), nearest as-of (two carries, one sort), per-dim
    # embedding stats, radius search
    "tpch_q8_like",
    "tpch_q11_like",
    "dedup_cluster_canonical",
    "media_phash_near_dup",
    "text_char_ngram_entropy",
    "corpus_token_budget_pack",
    "asof_join_nearest",
    "embeddings_dim_stats",
    "similarity_range_search",
    # round-5 late wave: Spark-4 recursive CTE (iterative union loop),
    # matrix-free PCA power iteration (2 corpus passes × 3 unrolled
    # iterations), 2-D skyline sort-sweep, algebraic regr_* moments
    "recursive_cte_conformance",
    "embeddings_pca_power",
    "pareto_frontier_customers",
    "regr_aggregates_conformance",
    "stream_cep_funnel",
    "dp_noised_release",
    "k_anonymity_audit",
    "window_funnel_depth",
    "corpus_zipf_fit",
    "value_benford_digits",
    "cdc_python_datasource_roundtrip",
    "stream_cdc_python_datasource",
    "cdc_python_datasource_write_roundtrip",
    # round-6 wave: statistical inference & association (all algebraic-
    # moment shapes — one hash agg + closed-form scalar solve)
    "events_ols_two_factor",
    "source_welch_ttest",
    "mi_event_value_bands",
    "value_ks_grid",
    "events_autocorr_lag1",
    "market_basket_rules",
    "stream_window_chain",
    "group_by_all_conformance",
    "similarity_mmr_rerank",
    "tokenizer_bpe_train_merges",
    "value_cusum_drift",
    "events_seasonal_backtest",
    "corpus_vocab_coverage_curve",
    "orders_cohort_ltv_curve",
    "dup_graph_common_neighbors",
    "text_rake_keywords",
    "embeddings_pq_assign",
    "value_mannwhitney_grid",
    "lang_source_chisq",
    "value_spearman_banded",
    "events_bootstrap_ci",
    "events_countmin_audit",
    "events_periodogram",
    "value_hampel_filter",
    "bucketed_join_colocated",
    "events_holt_linear",
    "dup_graph_kcore",
    "events_anova_oneway",
    "dynamic_partition_pruning_join",
    "text_bigram_kneser_ney",
    "orders_survival_km",
    "customer_value_gini",
    "label_knn_loo_eval",
    "events_markov_stationary",
    "value_hill_tail_index",
    "stream_countmin_sketch",
    "source_stylometry_delta",
    "label_silhouette_centroid",
    "parts_abc_classification",
    "dup_graph_assortativity",
    "lineitem_weighted_median",
    "events_two_proportion_ztest",
    "user_poisson_regression",
    "user_logistic_regression",
    "value_conformal_interval",
    "text_pmi_collocations",
    "user_overdispersion_check",
    "customer_tercile_migration",
    "lang_id_cohens_kappa",
    "kmeans_label_ari",
    "text_readability_flesch",
    "events_dau_wau_stickiness",
    "customer_lorenz_curve",
    "embeddings_anisotropy_audit",
    "text_mtld_diversity",
]


def _engine_versions() -> dict[str, str]:
    import pyspark

    out = {"pyspark": pyspark.__version__}
    try:
        import duckdb

        out["duckdb"] = duckdb.__version__
    except ImportError:
        pass
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from cdc_realtime_pipeline_spark.session import get_spark
    from cdc_realtime_pipeline_spark.plans.registry import all_queries

    spark = get_spark("bench")
    queries = all_queries()

    # JVM/codegen/noop-writer warmup on tiny data so the first timed
    # query doesn't absorb one-time init costs (JIT, codegen cache,
    # broadcast machinery).
    from pyspark.sql import functions as F

    region = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n"))
        .write.mode("overwrite")
        .format("noop")
        .save()
    )

    from cdc_realtime_pipeline_spark.session import release_caches

    # Host-noise calibration: a fixed reference workload (lineitem scan
    # + hash agg, identical every round) timed before and after the
    # query loop. Cross-round wall-clock comparisons are only valid
    # after normalizing by this probe — measured same-code swings of
    # ±25-75% on this host purely from co-tenant load.
    #
    # The probe itself must measure steady state: every recorded round
    # through r4 showed calib_start ≈ 0.67 s vs calib_end ≈ 0.29 s —
    # a SYSTEMATIC first-scan bias (page cache + scan JIT for
    # lineitem, which the warmup above never touched), not co-tenancy.
    # One untimed throwaway probe removes it, so calib_start/calib_end
    # now bracket the loop with two comparable steady-state readings.
    def _calib() -> float:
        t0 = time.time()
        (
            spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
            .groupBy("l_returnflag")
            .agg(F.sum("l_quantity"), F.count("*"))
            .write.mode("overwrite")
            .format("noop")
            .save()
        )
        return round(time.time() - t0, 3)

    _calib()  # untimed warm-up probe (see comment above)

    # Untimed session-memo prewarm (VERDICT r9 #3): memo builds are
    # once-per-corpus index costs (shingles, CC labels, PQ/OPQ
    # distance tables, SemDeDup assignment). Building them here — the
    # _calib() discipline applied to memos — makes every per-query
    # timed line order-independent steady-state consumption; the
    # build cost is priced separately in memo_prewarm_sec.
    from cdc_realtime_pipeline_spark.plans.prewarm import prewarm_memos

    memo_prewarm_sec = prewarm_memos(spark, sf_dir)

    calib_start = _calib()

    # --extras benches the COMPLEMENT of the headline set (VERDICT r6
    # #2): every registered query must hold at least one BENCH_FULL
    # row at sf0.1. The headline line stays cross-round comparable;
    # the extras line is run once per session as the closing sweep.
    extras_mode = "--extras" in sys.argv
    bench_names = (
        sorted(n for n in queries if n not in set(BENCH_QUERIES))
        if extras_mode
        else BENCH_QUERIES
    )

    timings: dict[str, float] = {}
    for name in bench_names:
        fn = queries[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.time() - t0, 3)
    # Release tracked caches AFTER the loop, not per query: Spark's
    # CacheManager legitimately shares cached subplans across queries
    # (levenshtein reuses jaccard's shingle cache), which is both the
    # realistic session behavior and the methodology the r1/r2 baselines
    # were recorded under. Total tracked cache footprint over the whole
    # set is ~100 MB at sf0.1 — bounded, then released here.
    release_caches()

    # streaming micro-bench: full CDC fan-out (parse → raw + agg-partial
    # sinks) over the events-derived topic, one availableNow cycle —
    # checked against the reference's <5 s E2E target (README.md:181)
    # at comparable batch sizes.
    if not extras_mode:
        import tempfile

        from cdc_realtime_pipeline_spark.cdc.envelope import (
            synthesize_cdc_json_from_events,
        )
        from cdc_realtime_pipeline_spark.session import load_table
        from cdc_realtime_pipeline_spark.sources.cdc_file_source import (
            write_cdc_json_files,
        )
        from cdc_realtime_pipeline_spark.streaming.job import run_cdc_fanout

        stream_dir = tempfile.mkdtemp(prefix="bench_stream_")
        write_cdc_json_files(
            synthesize_cdc_json_from_events(load_table(spark, sf_dir, "events")),
            stream_dir,
        )
        t0 = time.time()
        run_cdc_fanout(
            spark,
            stream_dir,
            tempfile.mkdtemp(prefix="bench_out_"),
            tempfile.mkdtemp(prefix="bench_ck_"),
        )
        timings["stream_cdc_fanout_e2e"] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    # Stream/batch subtotal split (VERDICT r12 #4): streaming rows are
    # availableNow-trigger-latency-bound and track host scheduler noise
    # much harder than batch rows — round 12's run 2 was calib-ok yet
    # carried a +31% stream subtotal from a co-tenant burst. Emitting
    # the split makes that adjudication mechanical: a stream-subtotal
    # inflation with a flat batch subtotal is host noise, not a code
    # regression (see BASELINE.md §recording protocol).
    stream_subtotal = round(
        sum(t for n, t in timings.items() if n.startswith("stream_")), 3
    )
    batch_subtotal = round(total - stream_subtotal, 3)

    # Regression table vs the stored round-1 baseline (BENCH_r01.json):
    # per-query delta in seconds (negative = faster than baseline), so
    # each round can answer "which queries regressed" mechanically.
    deltas: dict[str, float] = {}
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_r01.json")
    try:
        with open(base_path) as f:
            base = json.load(f)["parsed"]["queries"]
        deltas = {
            n: round(t - base[n], 3) for n, t in timings.items() if n in base
        }
    except (OSError, KeyError, ValueError):
        pass

    calib_end = _calib()

    # Calibration normalization IN the artifact (VERDICT r6 #3): raw
    # r6 read 1.13× r1 while normalized read 0.80× — a host slowdown
    # must never read as a code regression, so the line now carries
    # the normalized numbers instead of leaving the division to the
    # reader. CALIB_REF_SEC is the committed reference host speed:
    # the median of mean([start, end]) over the ten clean runs in
    # BENCH_FULL.jsonl rounds 4-6 (0.3095..0.4375, median 0.374). The
    # r1 baseline predates the probe, so this median stands in as the
    # r1-era host speed for the vs-r1 normalized ratio.
    CALIB_REF_SEC = 0.374
    calib_run = (calib_start + calib_end) / 2.0
    # Recording precondition (VERDICT r11 #4): the calib pair must
    # agree within ~30% of their mean for a run to stand as a round's
    # official certified line — BENCH_r11 shipped on a hot window
    # ([0.493, 0.255], ~2× disagreement) and read 13% above the same
    # round's clean line. A disagreeing pair means host load SHIFTED
    # mid-run, so neither raw nor normalized totals are comparable;
    # rerun until the pair agrees before recording (BASELINE.md
    # §recording protocol).
    calib_spread_pct = round(
        abs(calib_start - calib_end) / calib_run * 100.0, 1
    )
    calib_pair_ok = calib_spread_pct <= 30.0
    if not calib_pair_ok:
        print(
            f"WARNING: calib pair [{calib_start}, {calib_end}] disagrees "
            f"by {calib_spread_pct}% (>30%) — host load shifted mid-run; "
            "rerun before recording this line as official",
            file=sys.stderr,
        )
    value_calib_normalized = round(total * CALIB_REF_SEC / calib_run, 3)
    ratio_vs_r1_raw = None
    ratio_vs_r1_calib_normalized = None
    try:
        with open(base_path) as f:
            base_q = json.load(f)["parsed"]["queries"]
        shared = [n for n in timings if n in base_q]
        r1_shared = sum(base_q[n] for n in shared)
        if r1_shared > 0:
            raw = sum(timings[n] for n in shared) / r1_shared
            ratio_vs_r1_raw = round(raw, 3)
            ratio_vs_r1_calib_normalized = round(
                raw * CALIB_REF_SEC / calib_run, 3
            )
    except (OSError, KeyError, ValueError, ZeroDivisionError):
        pass

    payload = {
        "metric": "registry_extras_seconds" if extras_mode else "headline_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "delta_vs_r1": deltas,
        # fixed reference workload timed before/after the loop;
        # divide cross-round totals by the calib ratio before
        # reading deltas (host co-tenancy swings ±25-75%)
        "calib_sec": [calib_start, calib_end],
        # recording precondition (VERDICT r11 #4): official per-round
        # lines require calib_pair_ok — see BASELINE.md §recording
        "calib_spread_pct": calib_spread_pct,
        "calib_pair_ok": calib_pair_ok,
        # stream vs batch split — the second, necessary sanity read
        # beyond the calib pair (VERDICT r12 #4): stream-subtotal
        # inflation with flat batch = co-tenant trigger latency
        "batch_subtotal_sec": batch_subtotal,
        "stream_subtotal_sec": stream_subtotal,
        # untimed once-per-corpus memo builds, priced separately so
        # per-query lines never embed first-consumer attribution
        "memo_prewarm_sec": memo_prewarm_sec,
        # all-in figure (VERDICT r13 #1 accounting contract): timed
        # total PLUS the untimed memo prewarm, so moving work between
        # the two regions can never read as a headline improvement.
        # The memo slot set is FROZEN as of round 14 (BENCH_NOTES.md
        # §Round 14 lists it; tests/test_round14_opt.py pins it) — new
        # slots require a recorded justification in that list.
        "headline_plus_prewarm_sec": round(
            total + sum(memo_prewarm_sec.values()), 3
        ),
        "calib_ref_sec": CALIB_REF_SEC,
        "value_calib_normalized": value_calib_normalized,
        # shared-subset total vs the stored r1 baseline, raw and
        # host-speed-normalized — read the normalized one first
        "ratio_vs_r1_raw": ratio_vs_r1_raw,
        "ratio_vs_r1_calib_normalized": ratio_vs_r1_calib_normalized,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # engine versions on the record (VERDICT r5 #4): a dialect or
        # planner change between rounds is invisible without these.
        "versions": _engine_versions(),
    }
    print(json.dumps(payload))

    # The driver truncates BENCH_r{N}.json tails to ~2000 chars, which
    # loses the per-query table once the headline set grew past ~40
    # entries. Append the full record to a committed history file so
    # cross-round per-query comparison never needs reconstruction.
    # --no-append: smoke/debug runs must not pollute the committed
    # history (cross-round reads assume every line is a clean sf0.1 run).
    if "--no-append" in sys.argv:
        return
    try:
        full_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.jsonl"
        )
        with open(full_path, "a") as f:
            f.write(json.dumps({"ts": int(time.time()), **payload}) + "\n")
    except OSError:
        pass


if __name__ == "__main__":
    main()
