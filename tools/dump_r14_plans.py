"""Dump plans/r14/<query>_{before,after}.txt for round-14 claims.

"before" = HEAD~N checkout semantics are impractical mid-session, so
the convention (as in r13) is: run this script on the PRE-change tree
with `before` and on the post-change tree with `after`. Queries are
built at the given sf and explained formatted; forced-path variants
(env-gated) are dumped under a suffixed name.

    python tools/dump_r14_plans.py <before|after> <query>[,<query>...] [sf_dir]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from cdc_realtime_pipeline_spark.plans.registry import all_queries
    from cdc_realtime_pipeline_spark.session import get_spark

    spark = get_spark("dump_r14_plans")
    queries = all_queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = queries[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} chars)")


if __name__ == "__main__":
    main()
