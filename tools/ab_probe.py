"""A/B timing probe for single queries — the round-13 noisy-host
protocol: time named queries with the noop sink (guide §1.4) for N
reps after the standard untimed memo prewarm (bench.py methodology),
and report every rep plus the min. Run back-to-back on two checkouts
(git worktree of the pre-change commit vs the working tree) so host
noise hits both sides; compare MINS, which are robust to co-tenant
bursts.

    python tools/ab_probe.py <query>[,<query>...] [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = [n for n in sys.argv[1].split(",") if n]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from cdc_realtime_pipeline_spark.plans.prewarm import prewarm_memos
    from cdc_realtime_pipeline_spark.plans.registry import all_queries
    from cdc_realtime_pipeline_spark.session import get_spark, release_caches

    spark = get_spark("ab_probe")
    prewarm_memos(spark, sf_dir)
    queries = all_queries()
    out: dict[str, dict] = {}
    for name in names:
        ts = []
        for _ in range(reps):
            release_caches()
            spark.sparkContext.setJobDescription(f"ab_probe:{name}")
            t0 = time.time()
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"reps": ts, "min": min(ts)}
        print(f"# {name}: {ts} min={min(ts)}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
