"""Dump `explain("formatted")` for a list of queries → plans/r13/.

Round-13 optimization evidence: per touched query, the plan snapshot
the judge checks claims against.

    python tools/dump_r13_plans.py <suffix> <query>[,<query>...] [sf_dir]

Writes plans/r13/<query>_<suffix>.txt for each query, relative to the
repo this script lives in (so it works from a worktree too).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    suffix = sys.argv[1]
    names = [n for n in sys.argv[2].split(",") if n]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    out_dir = os.environ.get(
        "R13_PLANS_DIR", os.path.join(REPO, "plans", "r13")
    )
    os.makedirs(out_dir, exist_ok=True)

    from cdc_realtime_pipeline_spark.plans.registry import all_queries
    from cdc_realtime_pipeline_spark.session import get_spark

    spark = get_spark("dump_r13_plans")
    queries = all_queries()
    for name in names:
        buf = io.StringIO()
        with redirect_stdout(buf):
            queries[name](spark, sf_dir).explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
