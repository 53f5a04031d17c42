"""Run the LLM-data-curation pipeline end-to-end and write real shards.

The training-data counterpart of `run_pipeline.py` (which demos the
reference's CDC topology): documents → language/quality/dedup gates
(`corpus_prep_pipeline`) → shard-partitioned parquet + a per-shard
manifest — the artifact a downstream tokenizer/dataloader consumes.
Sharding is content-hash based (rerun/resume stable, never
round-robin), written with `partitionBy(shard)` so each shard is an
independent directory a loader can claim.

    python tools/run_curation.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="curation_out_")

    from pyspark.sql import functions as F

    from cdc_realtime_pipeline_spark.operators.training_data import (
        corpus_prep_pipeline,
    )
    from cdc_realtime_pipeline_spark.session import get_spark

    spark = get_spark("run_curation")
    t0 = time.time()

    prepped = corpus_prep_pipeline(spark, sf_dir)
    shards_dir = os.path.join(out, "shards")
    prepped.write.mode("overwrite").partitionBy("shard").parquet(shards_dir)

    manifest = (
        spark.read.parquet(shards_dir)
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .orderBy("shard")
    )
    manifest_dir = os.path.join(out, "manifest")
    manifest.write.mode("overwrite").parquet(manifest_dir)

    rows = manifest.collect()
    total_docs = sum(r.n_docs for r in rows)
    total_tokens = sum(r.n_tokens for r in rows)
    print(f"curation pipeline complete in {time.time() - t0:.1f}s")
    print(f"  shards:   {len(rows)} under {shards_dir}")
    print(f"  docs:     {total_docs}")
    print(f"  tokens:   {total_tokens}")
    for r in rows:
        print(f"    shard {r.shard}: {r.n_docs} docs, {r.n_tokens} tokens")

    # integrity: shard dirs re-read to the same totals the plan produced
    assert total_docs == prepped.count(), "shard write lost rows"
    print("  integrity: re-read totals match the plan — OK")


if __name__ == "__main__":
    main()
