"""Round-9 operators: OPQ rotation selection, binary-sign Hamming ANN,
Gopher-rule quality gate, PSI drift."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_opq_selection_never_worse_than_identity(spark, sf_dir):
    """The construction guarantee: recall-first selection with a
    bit-identical-to-plain-PQ identity candidate means the chosen
    rotation's validation n_hit ≥ identity's (and the audit carries
    both metrics for every candidate)."""
    from cdc_realtime_pipeline_spark.operators.similarity import (
        embeddings_opq_rotate,
    )

    rows = {r["cand"]: r for r in embeddings_opq_rotate(spark, sf_dir).collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert rows[0]["rotation"] == "identity"
    chosen = [r for r in rows.values() if r["chosen"] == 1]
    assert len(chosen) == 1
    assert chosen[0]["n_hit"] >= rows[0]["n_hit"]
    assert all(r["distortion"] > 0 for r in rows.values())


def test_opq_identity_adc_matches_plain_pq(spark, sf_dir):
    """The identity candidate's ADC relation is plain PQ bit-for-bit —
    the property the selection guarantee rests on."""
    from cdc_realtime_pipeline_spark.operators.similarity import (
        _opq_adc_all,
        similarity_pq_adc_topk,
        _ADC_K,
    )
    from pyspark.sql.window import Window

    wq = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("vec_id")
    )
    ident = (
        _opq_adc_all(spark, sf_dir)
        .filter(F.col("cand") == 0)
        .withColumn("rank", F.row_number().over(wq))
        .filter(F.col("rank") <= _ADC_K)
        .select("query_id", "rank", "vec_id", "adc_dist")
    )
    plain = similarity_pq_adc_topk(spark, sf_dir)
    a = {(r["query_id"], r["rank"]): (r["vec_id"], r["adc_dist"]) for r in ident.collect()}
    b = {(r["query_id"], r["rank"]): (r["vec_id"], r["adc_dist"]) for r in plain.collect()}
    assert a == b


def test_binary_sign_hamming_bounds_and_ties(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.similarity import (
        similarity_binary_sign_topk,
        N_QUERIES,
    )

    rows = similarity_binary_sign_topk(spark, sf_dir).collect()
    assert rows
    by_q = {}
    for r in rows:
        assert 0 <= r["hamming"] <= 64
        assert r["vec_id"] >= N_QUERIES
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r["rank"])
        assert len(rs) == 5
        # non-decreasing hamming; ties must break by vec_id
        for a, b in zip(rs, rs[1:]):
            assert (a["hamming"], a["vec_id"]) < (b["hamming"], b["vec_id"])


def test_gopher_gate_integer_rules(spark, sf_dir):
    """Rules are exact-integer: re-derive the per-source counters from
    the token relation and check the gate agrees; kept + any-fail
    partitions the corpus."""
    from cdc_realtime_pipeline_spark.operators.curation import (
        docs_gopher_quality_gate,
    )
    from cdc_realtime_pipeline_spark.operators.dedup import doc_words

    gate = {r["source"]: r for r in docs_gopher_quality_gate(spark, sf_dir).collect()}
    n_docs_by_source = {
        r["source"]: r["n"]
        for r in doc_words(spark, sf_dir)
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert gate and set(gate) <= set(n_docs_by_source)
    for src, row in gate.items():
        # every doc with ≥1 token rows somewhere; kept ≤ n_docs
        assert 0 <= row["kept"] <= row["n_docs"]
        assert row["n_docs"] <= n_docs_by_source[src]
        for col in ("fail_wordcount", "fail_meanlen", "fail_alpha"):
            assert 0 <= row[col] <= row["n_docs"]


def test_psi_drift_nonnegative_and_consistent(spark, sf_dir):
    """PSI terms are (p−q)·ln(p/q) ≥ 0 by the same-sign property, and
    the repeated total equals the sum of the rounded terms."""
    from cdc_realtime_pipeline_spark.operators.dq import docs_psi_drift

    rows = docs_psi_drift(spark, sf_dir).collect()
    assert rows
    totals = {r["psi_total"] for r in rows}
    assert len(totals) == 1
    total = totals.pop()
    assert total >= 0
    assert abs(total - round(sum(r["psi_term"] for r in rows) + 1e-9, 6)) < 1e-9
    for r in rows:
        assert r["psi_term"] >= 0
        assert r["n_ref"] + r["n_cur"] > 0
