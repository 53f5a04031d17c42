"""Per-query floor decomposition probe (VERDICT r13 #5 / round 14).

The ~130 sub-2 s headline rows pay a roughly constant per-query cost
(~0.4-0.8 s at sf0.1) that dominates their timed lines. This probe
decomposes that floor for a representative set of cheap queries into:

  build_s    — Python-side plan construction (operator fn(spark, sf_dir))
  analyze_s  — analysis + optimization (force via optimizedPlan())
  exec_s     — physical planning + job scheduling + execution + noop
               commit (write.format("noop").save())

and, for the execution leg, contrasts three session postures A/B:

  aqe        — the engine default (AQE on, as shipped)
  no_aqe     — AQE off (diagnostic ONLY: quantifies AQE's replan/stage
               overhead share; NOT a candidate config — AQE is
               load-bearing at cluster scale)
  bigsplit   — spark.sql.files.maxPartitionBytes=1g (guide §9 posture,
               justified at scale independently; at sf0.1 it mostly
               collapses scan task counts)

Usage:
    python tools/floor_probe.py [sf_dir] [reps]

Prints one JSON line per (query, posture) with per-leg seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "tpch_q6",  # single-table scan+filter+agg — the floor's floor
    "monthly_order_stats",  # one keyed agg
    "dash_latency_per_minute",  # events bucket agg
    "text_tfidf_topk",  # memo consumer
    "corpus_oov_rate",
    "key_skew_profile",
    "value_hill_tail_index",
    "group_by_all_conformance",
    "events_two_proportion_ztest",
    "value_mannwhitney_grid",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from cdc_realtime_pipeline_spark.plans.prewarm import prewarm_memos
    from cdc_realtime_pipeline_spark.plans.registry import all_queries
    from cdc_realtime_pipeline_spark.session import get_spark, release_caches

    spark = get_spark("floor_probe")
    prewarm_memos(spark, sf_dir)
    queries = all_queries()

    postures = {
        "aqe": {},
        "no_aqe": {"spark.sql.adaptive.enabled": "false"},
        "bigsplit": {"spark.sql.files.maxPartitionBytes": str(1024**3)},
    }
    base = {
        "spark.sql.adaptive.enabled": spark.conf.get("spark.sql.adaptive.enabled"),
        "spark.sql.files.maxPartitionBytes": spark.conf.get(
            "spark.sql.files.maxPartitionBytes"
        ),
    }

    for pname, conf in postures.items():
        for k, v in {**base, **conf}.items():
            spark.conf.set(k, v)
        for name in QUERIES:
            fn = queries[name]
            rows = []
            for _ in range(reps):
                release_caches()
                spark.sparkContext.setJobDescription(f"floor:{pname}:{name}")
                t0 = time.time()
                df = fn(spark, sf_dir)
                t1 = time.time()
                df._jdf.queryExecution().optimizedPlan()
                t2 = time.time()
                df.write.format("noop").mode("overwrite").save()
                t3 = time.time()
                rows.append(
                    (round(t1 - t0, 3), round(t2 - t1, 3), round(t3 - t2, 3))
                )
                spark.sparkContext.setJobDescription(None)
            best = min(rows, key=lambda r: sum(r))
            print(
                json.dumps(
                    {
                        "posture": pname,
                        "query": name,
                        "build_s": best[0],
                        "analyze_s": best[1],
                        "exec_s": best[2],
                        "reps": rows,
                    }
                )
            )
    # restore engine defaults
    for k, v in base.items():
        spark.conf.set(k, v)


if __name__ == "__main__":
    main()
