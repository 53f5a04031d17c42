"""Run-to-run determinism scan — every registry query executed TWICE
in one session, order-insensitive value hashes compared.

This targets the flake class the round-10 closing gate caught on
`orders_rfm_segments` (a float money-mean crossing a ntile band edge
differently across shuffle orders): Spark double aggregation is
order-dependent, so any query whose rounded output sits exactly on a
rounding/band boundary can hash differently between runs even though
both runs are "correct". The differential harness cannot see this
class (it runs each side once); this scan can.

    python tools/flake_scan.py [sf_dir]

Round-11 results: sf0.01 — 376 compared, 0 flakes, 0 errors (814 s);
sf0.1 — 376 compared, 0 flakes, 0 errors (1315 s).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    from check_correctness import value_hash

    from cdc_realtime_pipeline_spark.plans import registry
    from cdc_realtime_pipeline_spark.plans.prewarm import prewarm_memos
    from cdc_realtime_pipeline_spark.session import get_spark, release_caches

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("flake_scan")
    prewarm_memos(spark, sf)
    qs = registry.all_queries()
    t0 = time.time()
    n = flakes = errs = 0
    for name, fn in qs.items():
        try:
            d1 = fn(spark, sf)
            h1 = value_hash(d1.collect(), d1.columns)
            release_caches()
            d2 = fn(spark, sf)
            h2 = value_hash(d2.collect(), d2.columns)
            release_caches()
        except Exception as e:  # noqa: BLE001 — survey tool, keep going
            print(f"ERR {name}: {str(e)[:120]}")
            errs += 1
            continue
        n += 1
        if h1 != h2:
            flakes += 1
            print(f"FLAKE {name}: {h1} != {h2}")
    print(f"done: {n} compared, {flakes} flakes, {errs} errors "
          f"in {time.time() - t0:.0f}s")
    return 1 if flakes or errs else 0


if __name__ == "__main__":
    raise SystemExit(main())
