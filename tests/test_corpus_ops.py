"""Invariant tests for the corpus-preparation operators (beyond the
DuckDB differential gate): structural properties that must hold on any
input, not just hash-equality on the fixture."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.mark.slow
def test_connected_components_invariants(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.corpus_ops import (
        dup_clusters_connected_components,
    )
    from cdc_realtime_pipeline_spark.operators.dedup import dedup_docs_jaccard

    clusters = dup_clusters_connected_components(spark, sf_dir).collect()
    assert clusters  # planted dup structure must produce clusters
    comp = {}
    for r in clusters:
        # the survivor is the component label itself (keep-min rule)
        assert r["survivor"] == r["component"]
        assert r["n_members"] >= 2  # every clustered node has an edge
        comp[r["component"]] = r["n_members"]
    # every edge endpoint pair must land in the same component: rebuild
    # the node→component map by rerunning and checking edge closure
    pairs = dedup_docs_jaccard(spark, sf_dir).select("doc_a", "doc_b").collect()
    # union-find ground truth in plain Python
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        ra, rb = find(r["doc_a"]), find(r["doc_b"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want: dict[int, int] = {}
    for node in list(parent):
        want[find(node)] = want.get(find(node), 0) + 1
    assert comp == want


def test_pack_sequences_conserves_tokens(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.corpus_ops import (
        _doc_tokens,
        corpus_pack_sequences,
    )

    packed = corpus_pack_sequences(spark, sf_dir)
    total_packed = packed.agg(F.sum("bin_tokens")).collect()[0][0]
    total_docs = _doc_tokens(spark, sf_dir).agg(F.sum("n_tokens")).collect()[0][0]
    assert total_packed == total_docs  # no doc lost or double-packed
    # bins are dense per shard: 0..max with no gaps
    rows = packed.select("shard", "bin").collect()
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["bin"])
    for bins in by_shard.values():
        assert sorted(bins) == list(range(len(bins)))


def test_train_val_split_is_deterministic_and_complete(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.corpus_ops import (
        _doc_tokens,
        corpus_train_val_split,
    )

    s1 = {r["split"]: r["n_docs"] for r in corpus_train_val_split(spark, sf_dir).collect()}
    s2 = {r["split"]: r["n_docs"] for r in corpus_train_val_split(spark, sf_dir).collect()}
    assert s1 == s2  # pure function of doc identity
    assert sum(s1.values()) == _doc_tokens(spark, sf_dir).count()
    assert s1["train"] > s1.get("val", 0) and s1["train"] > s1.get("test", 0)


def test_vocab_topk_ordering(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.corpus_ops import corpus_vocab_topk

    rows = corpus_vocab_topk(spark, sf_dir).collect()
    counts = [r["n"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(c > 0 for c in counts)


def test_pagerank_mass_conservation_and_node_set(spark, sf_dir):
    from pyspark.sql import functions as F

    from cdc_realtime_pipeline_spark.operators.corpus_ops import (
        dup_clusters_connected_components,
        dup_graph_pagerank,
    )

    rows = dup_graph_pagerank(spark, sf_dir).collect()
    n = len(rows)
    # no dangling nodes (every node has degree >= 1) => total rank mass
    # is conserved at n, up to the per-iteration 6dp rounding
    assert abs(sum(r.pagerank for r in rows) - n) < n * 1e-4
    for r in rows:
        assert r.pagerank >= 0.15 - 1e-9
        assert r.degree >= 1
    # node universe matches the CC operator's (same edge set)
    n_cc_members = sum(
        c.n_members
        for c in dup_clusters_connected_components(spark, sf_dir).collect()
    )
    assert n == n_cc_members
