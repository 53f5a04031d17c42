"""Streaming trigger/state-commit floor decomposition (VERDICT r13 #6).

The ~20 fresh-checkpoint stream rows carry a ~16 s bench subtotal whose
data work is known-small (the r11/r12 α-probes). This probe runs a
representative set of stream rows with ``_memory_sink`` monkeypatched
to capture each StreamingQuery's ``recentProgress``, and prints per
query: micro-batch count and the per-batch durationMs decomposition
(triggerExecution, queryPlanning, getBatch/latestOffset, addBatch,
walCommit, commitOffsets) plus state-operator commit times. Optionally
contrasts a conf override A/B (e.g. RocksDB changelog checkpointing).

Usage:
    python tools/stream_floor_probe.py [sf_dir] [reps] [k=v ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "stream_window_chain",
    "stream_cep_funnel",
    "stream_countmin_sketch",
    "stream_cdc_fanout_e2e",  # via bench's run_cdc_fanout? no — registry row
    "stream_window_agg_5m",
    "stream_dedup_events",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    overrides = dict(a.split("=", 1) for a in sys.argv[3:])

    from cdc_realtime_pipeline_spark.plans.registry import all_queries
    from cdc_realtime_pipeline_spark.session import get_spark
    from cdc_realtime_pipeline_spark.streaming import stream_queries as sq

    spark = get_spark("stream_floor_probe")
    for k, v in overrides.items():
        spark.conf.set(k, v)

    captured: list[dict] = []
    orig = sq._memory_sink

    def capturing_sink(df, output_mode, src=None):
        sp = df.sparkSession
        name = "q_probe_" + os.urandom(6).hex()
        key = "spark.sql.shuffle.partitions"
        old = sp.conf.get(key)
        if src is not None:
            sp.conf.set(key, str(sq._scaled_state_partitions(sp, src)))
        try:
            q = (
                df.writeStream.format("memory")
                .queryName(name)
                .outputMode(output_mode)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            prog = [json.loads(p.json) for p in q.recentProgress]
            captured.append({"batches": len(prog), "progress": prog})
        finally:
            if src is not None:
                sp.conf.set(key, old)
        return sp.table(name)

    sq._memory_sink = capturing_sink
    queries = all_queries()
    try:
        for qname in QUERIES:
            if qname not in queries:
                continue
            for rep in range(reps):
                captured.clear()
                t0 = time.time()
                queries[qname](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                wall = round(time.time() - t0, 3)
                for cap in captured:
                    decomp = []
                    for p in cap["progress"]:
                        d = p.get("durationMs", {})
                        st = p.get("stateOperators", [])
                        decomp.append(
                            {
                                "batchId": p.get("batchId"),
                                "durationMs": d,
                                "stateCommitMs": [
                                    s.get("commitTimeMs") for s in st
                                ],
                                "numRowsTotal": [
                                    s.get("numRowsTotal") for s in st
                                ],
                            }
                        )
                    print(
                        json.dumps(
                            {
                                "query": qname,
                                "rep": rep,
                                "wall_s": wall,
                                "n_batches": cap["batches"],
                                "batches": decomp,
                                "overrides": overrides,
                            }
                        )
                    )
    finally:
        sq._memory_sink = orig


if __name__ == "__main__":
    main()
