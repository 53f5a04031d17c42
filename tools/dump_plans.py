"""Dump formatted physical plans of representative queries → PLANS.md.

Evidence artifact for plan review: shows PushedFilters / ReadSchema /
join strategies / aggregate phases as Catalyst actually plans them at
the given sf. Regenerate after plan-affecting changes:

    python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHOWCASE = [
    ("tpch_q1", "scan → partial/final hash agg; pushdown + pruning"),
    ("revenue_top_orders", "fact⋈fact⋈broadcast-dim, top-K"),
    ("region_revenue", "5-way star join, dims broadcast"),
    ("window_agg_5m", "keyed tumbling window aggregate"),
    ("dash_recent_alerts", "TakeOrderedAndProject top-K"),
    ("alerts_price_spike", "window function (lag) on key partition"),
    ("cdc_roundtrip", "JSON synth → from_json parse chain"),
    ("dedup_docs_exact", "content-hash groupBy dedup"),
    ("similarity_topk_bruteforce", "broadcast queries × corpus + rank"),
    ("asof_join_last_click", "union + carry-forward as-of join"),
    ("bucketized_range_join", "interval join via bucket equi-join"),
    ("dedup_docs_jaccard", "df-capped candidates → exact set verify"),
    ("dedup_embeddings_cosine", "banded-LSH candidates → exact cosine verify"),
    ("corpus_pack_sequences", "per-shard window cumsum packing"),
    ("label_centroids", "posexplode → per-(label,dim) partial mean"),
    ("decontaminate_vs_benchmark", "broadcast benchmark shingles, corpus streams past"),
    ("corpus_curation_funnel", "all-stage flags + single agg + stack unpivot"),
    ("text_unigram_lm_score", "distributed vocab join + per-doc mean"),
    ("similarity_topk_lsh", "multi-probe H≤2 broadcast probes over corpus sigs"),
    ("ohlc_bars_5m", "one-pass min_by/max_by candle bars, single shuffle"),
    ("twap_hourly", "lead() window + clustering-reuse agg, one shuffle"),
    ("gap_fill_locf", "per-key sequence+explode grid, LOCF window pass"),
    ("rolling_price_bands", "bounded-ROWS frame bands, rounded-operand breakout"),
    ("window_agg_1h_rollup", "hourly re-aggregation of 5-min partials"),
    ("value_distribution_psi", "broadcast 1-row bounds, (type,bin)→(type) aggs"),
    ("docs_chunked", "zero-exchange context-window chunking (generate, no shuffle)"),
    ("attribution_last_touch", "per-user running-max window + day rollup"),
    ("embeddings_kmeans_assign", "broadcast seeds ×K fan-out, integer argmin"),
    ("shingle_df_histogram", "df agg → log2 bucket agg over shared shingles"),
    ("events_schema_drift", "json-keys explode → (day,key) agg + window mins"),
    ("key_skew_profile", "per-key counts → one diagnostic row (rank over bounded relation)"),
    ("bloom_semijoin_reduction", "bit_or bitmap broadcast prefilter → exact semi join"),
    ("chunk_dedup_stats", "map-side chunk generate → md5-key multiplicity window"),
    ("lateral_join_topk_conformance", "LATERAL LIMIT decorrelated to WindowGroupLimit"),
    ("dup_graph_pagerank", "3 unrolled rank iterations, node-sized relation"),
    ("heavy_hitters_mg", "MG sketch candidates → broadcast semijoin exact verify"),
    ("higher_order_functions_conformance", "codegen'd lambda HOFs, one keyed agg"),
    ("zorder_layout_stats", "broadcast bounds → Morton projection → bucket agg"),
    ("dedup_embeddings_semantic", "k-means partition → within-cluster verify"),
    ("timeseries_pattern_topk", "minute agg → 16-row frame windows → fold dots"),
    ("cep_funnel_sequence", "per-key lag-chain strict-contiguity match"),
    ("dup_graph_triangles", "two-join triangle count, checkpointed edges"),
    ("tpch_q13_like", "LEFT OUTER with join-side predicate → two-level agg"),
    ("tpch_q15_like", "argmax vs broadcast 1-row max (no global window)"),
    ("tpch_q20_like", "window share on pair agg — one fact scan"),
    ("tpch_q22_like", "broadcast scalar threshold + LeftAnti idle filter"),
    ("corpus_dsir_importance", "broadcast 256-row model join — no word shuffle"),
    ("tokenizer_bpe_pair_counts", "vocab-sized pair explode after word-count agg"),
    ("embeddings_jl_projection", "derived Rademacher matrix, zero-exchange map"),
    ("dedup_span_stats", "positional gram df join → gaps-and-islands runs"),
    ("audience_overlap_bitmap", "persisted bitmap partials → inclusion-exclusion"),
    ("contrastive_hard_negatives", "broadcast anchors, label-split rank windows"),
    ("cdc_diff_snapshots", "two applied snapshots → full-outer class diff"),
    ("custom_agg_trimmed_mean", "Arrow GROUPED_AGG seam + broadcast count join"),
    ("nan_inf_conformance", "planted IEEE specials through the agg surface"),
    # round-5 wave
    ("tpch_q8_like", "CASE-ratio market share in ONE grouped agg, dims broadcast"),
    ("tpch_q11_like", "keyed value agg reused for broadcast scalar HAVING floor"),
    ("grouping_sets_conformance", "one Expand (4-way) + one hash aggregate"),
    ("media_phash_near_dup", "pHash band equi-join → bit_count(xor) verify"),
    ("text_char_ngram_entropy", "position explode → two keyed aggs, 3-byte grams"),
    ("corpus_token_budget_pack", "two windows over one sort (cum + total)"),
    ("asof_join_nearest", "two carries (last/first) sharing one Exchange+Sort"),
    ("embeddings_dim_stats", "posexplode absorbed map-side into 64-key agg"),
    # round-5 late wave
    ("recursive_cte_conformance", "Spark-4 UnionLoop recursion, frontier joins"),
    ("embeddings_pca_power", "3 unrolled power steps, 64-row broadcast v"),
    ("pareto_frontier_customers", "skyline sort-sweep on customer aggregate"),
    ("regr_aggregates_conformance", "algebraic regr_* moments, map-side partials"),
    ("dp_noised_release", "seeded-Laplace scalar noise on 5-row aggregate"),
    ("k_anonymity_audit", "QI-class agg → risk-band re-agg, broadcast total"),
    ("window_funnel_depth", "two window passes, struct-min chain — no self-join"),
    ("corpus_zipf_fit", "map-side token count → vocab-sized rank + regr moments"),
    ("value_benford_digits", "magnitude-ladder digit → 9-key agg + broadcast total"),
    ("cdc_python_datasource_roundtrip", "BatchScan cdc_envelope → unchanged JVM parse chain"),
    ("events_ols_two_factor", "10-moment hash agg + Cramer scalar solve"),
    ("source_welch_ttest", "group moments × broadcast total, closed-form t/df"),
    ("mi_event_value_bands", "joint agg → broadcast marginal joins, MI terms"),
    ("value_ks_grid", "grid reduction → bounded cumulative window"),
    ("market_basket_rules", "basket self-join + marginal joins + lift rank"),
    ("similarity_mmr_rerank", "broadcast scan + pool pairs → ArrowEvalPython greedy"),
    ("group_by_all_conformance", "GROUP BY ALL expansion, one hash agg"),
    # round-6 session-2 wave
    ("value_mannwhitney_grid", "grid midranks → 5-scalar closed-form U/z"),
    ("lang_source_chisq", "marginal cross × left-join joint, empty cells kept"),
    ("events_bootstrap_ci", "32-replicate Poisson fan-out, map-side collapse"),
    ("events_countmin_audit", "4-way fan-out → 1024-row sketch, broadcast probe"),
    ("embeddings_pq_assign", "posexplode dims × broadcast codebook, argmin window"),
    ("value_hampel_filter", "constant-frame arrays: rolling median/MAD closed form"),
    ("events_holt_linear", "series collect → higher-order fold, executor-local"),
    ("dup_graph_kcore", "induced-degree semijoin peel, checkpointed alive set"),
    ("bucketed_join_colocated", "bucketed scans → zero-exchange SortMergeJoin"),
    ("dynamic_partition_pruning_join", "runtime dim-fed PartitionFilters on fact scan"),
    ("text_bigram_kneser_ney", "zip_with bigrams → three word-keyed integer aggs"),
    ("orders_survival_km", "two-order window → day-keyed risk walk"),
    ("customer_value_gini", "customer agg → rank window → 3-moment scalar"),
    ("user_poisson_regression", "3 unrolled IRLS aggs, broadcast coefficients"),
    ("user_logistic_regression", "4 unrolled IRLS aggs, clipped link"),
    ("value_conformal_interval", "md5 split → grid quantile → coverage agg"),
    ("text_pmi_collocations", "uni+bi aggs, broadcast totals, bounded top-K"),
    ("source_stylometry_delta", "marker cross + z-scores + bounded pair join"),
    ("label_silhouette_centroid", "broadcast centroids fan-out, per-vec argmin"),
    ("lineitem_weighted_median", "per-group cum-weight walk, conditional min"),
    ("parts_abc_classification", "revenue agg → cumulative-share classes"),
    ("dup_graph_assortativity", "edge-degree joins → 5 Pearson moments"),
    ("events_markov_stationary", "12 unrolled power steps on |types|² relation"),
    # round-8 wave
    ("similarity_pq_adc_rerank", "ADC top-R pool → keyed vector fetch + exact re-rank"),
    ("similarity_pq_adc_topk_kernel", "packed codes → ArrowEval gather+sum, per-batch top-K"),
    ("similarity_topk_ivf_multiprobe", "nprobe=2 cell cut, exact rerank in probed set"),
    ("similarity_rrf_fusion", "two ≤20-row retriever relations, full-outer + rank"),
    ("similarity_topk_filtered", "label predicate inside the broadcast join condition"),
    ("similarity_truncated_dim_recall", "sliced-corpus kernels ∪ semi-join vs full answer"),
    ("tokenizer_bpe_encode", "token stream ⋈ vocab-sized (word→syms), per-doc agg"),
    ("events_mann_kendall", "hours-sized pairwise signs + continuous-median slope"),
    ("events_kruskal_wallis", "distinct-value midranks, corpus side two keyed aggs"),
    ("events_pettitt_changepoint", "anchor-keyed W_t agg + cumulative U_t window"),
    ("events_ljung_box", "one ordered pass, 8 lags melted, series-sized aggs"),
    ("events_target_encoding_oof", "md5 folds, (cat,fold) agg re-agg, broadcast mean"),
    ("user_quality_calibration", "IRLS score -> bins -> max-min PAVA + ECE"),
    ("value_equidepth_scalable", "distinct-value cum counts -> bucket agg"),
    ("similarity_recall_report_full", "9-method union + semi-join vs exact"),
    # round-9 wave
    ("embeddings_opq_rotate", "4 rotation candidates → distortion + recall audit"),
    ("similarity_opq_adc_topk", "chosen-rotation ADC scan, same code budget"),
    ("similarity_binary_sign_topk", "two packed sign words → bit_count(xor) scan"),
    ("docs_gopher_quality_gate", "array-HOF moments → exact-integer rule matrix"),
    ("docs_psi_drift", "one pass (side,bin) counts → smoothed PSI terms"),
    ("similarity_binary_rerank", "Hamming pool → Q·R keyed fetch + exact re-rank"),
    ("events_cusum_changepoint", "hourly agg → bounded per-key series fold"),
    ("dedup_minhash_estimate_audit", "memoized sigs ⋈ jaccard pairs → error bands"),
    ("allen_interval_relations", "per-user interval pairs → 13-way CASE counts"),
    ("corpus_softdedup_weights", "CC labels → 1/|cluster| weights, source roll-up"),
    ("dedup_lsh_band_sweep", "one sig build → 4 banding configs, bucket joins"),
    # round-10 wave
    ("similarity_sq8_topk", "per-dim grid train → broadcast-LUT ADC scan"),
    ("similarity_sq8_rerank", "SQ8 pool → Q·R keyed fetch + exact re-rank"),
    ("similarity_ivf_cell_balance", "coarse assignment → K-bounded occupancy audit"),
    ("dup_graph_label_propagation", "3 unrolled modal-label rounds, edge-sized aggs"),
    ("salted_agg_conformance", "salt explode → partial agg → final re-agg"),
    ("corpus_domain_mixture_weights", "source token shares → temperature reweight"),
    ("corpus_quality_curriculum", "distinct-score token walk → stage budgets"),
    ("text_hashed_ngram_features", "md5 hashing trick → 1024-bucket features"),
    ("orders_rfm_segments", "3 scalable quintile grids → RFM code rollup"),
    ("events_benjamini_hochberg", "per-type z → p → BH step-up on bounded relation"),
    ("user_time_decay_features", "broadcast anchor → decay terms → user agg"),
    ("media_shard_manifest", "per-type byte cumsum → shard manifest"),
    ("referential_integrity_audit", "per-leg key agg → anti-join orphans"),
    ("embeddings_knn_graph", "capped byte-bands + NN-descent round + verify"),
    ("asof_join_tolerance", "union-carry asof + staleness gate"),
    ("corpus_tokenizer_fertility", "BPE encode roll-up per source"),
    ("observed_metrics_conformance", "in-flight Observation metrics, one scan"),
    ("l_diversity_audit", "QI classes → distinct-sensitive bands"),
    ("embeddings_centroid_drift", "half-split dim means → per-label cosine"),
    ("corpus_heaps_law_fit", "first-prefix per word → 10-point loglog fit"),
    ("watermark_delay_sweep", "jittered lateness pass → 4 delay verdicts"),
    ("columnar_encoding_advisor", "4-col melt → per-group run walk"),
    ("orders_duplicate_payment_audit", "week-bucket self-join + exact verify"),
    # round-10 waves 5-7
    ("t_closeness_audit", "QI × type counts → integer TVD band algebra"),
    ("dup_graph_modularity", "memoized LPA labels × edges → community Q"),
    ("user_logistic_roc_auc", "IRLS scores → distinct-score cum windows"),
    ("text_winnowing_fingerprint", "array-HOF winnow, no explode until fp audit"),
    ("linkage_fellegi_sunter", "pair features → m/u moments → log-odds bands"),
    ("lang_nb_confusion", "sparse NB: observed (w,l) rows + 5-row fan-out"),
    ("cdc_bitemporal_asof", "3-version log × 2 snapshots → struct-max"),
    ("events_decision_stump", "binned counts → threshold cum windows → rank"),
    ("label_davies_bouldin", "broadcast centroid scan + K² pairwise ratios"),
    ("media_audio_energy", "mapInPandas cumsum framing, 1:1 rows out"),
    ("text_good_turing", "bigram count-of-counts → bounded GT table"),
    ("quality_gate_fairness_audit", "gate output → DI/parity closed forms"),
    ("events_diff_in_diff", "one scan → 2×2 moment cells → closed forms"),
    ("retrieval_ndcg_agreement", "two bounded rankers → 20-row nDCG"),
    ("linkage_em_patterns", "pattern collapse → 16-row unrolled EM"),
    ("events_sprt_monitor", "hour-ordered LLR walk → boundary decisions"),
    ("orders_open_interval_depth", "interval deltas → calendar cumsum"),
    ("events_cross_correlation", "hourly counts × 7 lags → pair moments"),
    ("text_word_burstiness", "(word, doc) tf → vocab-keyed Fano moments"),
    ("customer_theil_decomposition", "cents collapse → group ln terms, no sort"),
    ("docs_boilerplate_ngrams", "per-doc distinct grams → source coverage top-K"),
    ("orders_logrank_test", "span window → dense time × arm risk sets"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from cdc_realtime_pipeline_spark.plans.registry import all_queries
    from cdc_realtime_pipeline_spark.session import get_spark

    spark = get_spark("dump_plans")
    queries = all_queries()
    out = [
        "# PLANS — formatted physical plans (generated)",
        "",
        f"`python tools/dump_plans.py {sf_dir}` — regenerate after",
        "plan-affecting changes. Properties asserted in",
        "tests/test_plans.py; this file is the human-readable snapshot.",
        "",
    ]
    # Cap each section: a plan snapshot is evidence of SHAPE (scan
    # pushdown, join strategy, exchange placement), which the first
    # few hundred lines carry; the multi-thousand-line operator-detail
    # tails of the big union plans (the 9-method recall table, the
    # OPQ audit) add bulk, not reviewability.
    cap = 600
    for name, why in SHOWCASE:
        buf = io.StringIO()
        with redirect_stdout(buf):
            queries[name](spark, sf_dir).explain("formatted")
        text = buf.getvalue().strip()
        lines = text.splitlines()
        if len(lines) > cap:
            text = "\n".join(lines[:cap]) + (
                f"\n… [truncated: {len(lines) - cap} more lines;"
                " regenerate without cap via explain('formatted')]"
            )
        out.append(f"## {name} — {why}\n\n```\n{text}\n```\n")
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
