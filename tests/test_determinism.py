"""Partition-count invariance — outputs must not depend on the
cluster's parallelism.

A 100 TB job reruns on different executor counts, loses tasks to
retries, and gets AQE-coalesced differently every run; any operator
whose ANSWER depends on physical partitioning (rand() sampling,
first() without ordering, partition-local counters leaking into
results) is silently irreproducible. The repo's sampling/dedup
operators claim hash-based, retry-stable semantics — this pins it:
each query must produce identical rows under 3, 8, and 17 shuffle
partitions.

`heavy_hitters_mg` is the sharpest case: its INTERNAL candidate set
genuinely varies with partitioning (per-partition MG sketches), but
the exact verify pass must erase that — same final rows regardless.
"""

from __future__ import annotations

import pytest

from cdc_realtime_pipeline_spark.plans.registry import all_queries

INVARIANT_QUERIES = [
    "corpus_stratified_sample",  # hash-bucket sampling
    "corpus_weighted_reservoir",  # A-ES keys from id hashes
    "label_balanced_sample",  # per-class hash quota
    "corpus_train_val_split",  # pure hash projection
    "heavy_hitters_mg",  # sketch candidates vary; verified output may not
    "dedup_events_exact",  # min-id survivor, not dropDuplicates
]


def _rows(spark, name, sf_dir):
    df = all_queries()[name](spark, sf_dir)
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", INVARIANT_QUERIES)
def test_partition_count_invariance(spark, sf_dir, name):
    key = "spark.sql.shuffle.partitions"
    orig = spark.conf.get(key)
    try:
        results = []
        for n in (3, 8, 17):
            spark.conf.set(key, str(n))
            results.append(_rows(spark, name, sf_dir))
        assert results[0] == results[1] == results[2]
        assert len(results[0]) > 0
    finally:
        spark.conf.set(key, orig)
