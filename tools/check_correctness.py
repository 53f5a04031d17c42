"""Local differential harness — mimics the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB at the given sf dir, comparing row count, schema (normalized),
and an order-insensitive value hash. Use while iterating so driver
rounds never surprise us.

    python tools/check_correctness.py [sf_dir] [name_filter[,name_filter...]]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_value(v) -> str:
    """TYPE-FAITHFUL normalization (VERDICT r5 #2/#3).

    Three rounds of driver hash-reds were typed-output divergences
    (DuckDB HUGEINT / DECIMAL vs Spark BIGINT) that this harness used
    to mask by collapsing every numeric to ``round(float(v), 9)``.
    Now int / float / Decimal-with-scale hash DISTINCTLY, so a query
    whose oracle emits decimal128 where Spark emits long goes red
    locally — local red must predict driver red.
    """
    import datetime
    import decimal
    import math

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "b:" + str(int(v))
    if isinstance(v, int):
        return "i:" + str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "f:NaN"
        return "f:" + repr(round(v, 9))
    if isinstance(v, decimal.Decimal):
        return "d:" + str(v)  # scale-preserving: 3.00 != 3.0000
    if isinstance(v, datetime.datetime):
        return "ts:" + v.replace(tzinfo=None).isoformat()
    return str(v)


def value_hash(rows, colnames) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "|".join(_norm_value(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


# Zero-crossing signed columns that already carry the `+ 0.0` IEEE
# negative-zero guard on both engines — audited, warning suppressed.
_TIE_AUDITED = {
    "scalar_functions.m_sign",
    "stats_functions.corr_vk",
    "stats_functions.covar_s",
    "stats_functions.covar_p",
    "embedding_label_stats.avg_first_dim",
    "label_centroids.centroid",
    "tpch_q9_like.sum_profit",
    "corpus_dsir_importance.dsir_score",
    # guards added with the operators; surfaced at sf0.1 volume
    "embeddings_dim_stats.mean_x",
    "embeddings_dim_stats.min_x",
    "embeddings_pca_power.loading",
    "dp_noised_release.n_noised",
    "dp_noised_release.sum_noised",
    # audited round 11 (warned only at sf0.001, where negative
    # correlations/residuals appear): r is round(_AC_R + 1e-9, 6) + 0.0
    # in scored on BOTH engines (r_best copies it through the pinned
    # struct-min); resid is _r4(...) + 0.0 / round(...+1e-9, 4) + 0.0
    "events_cross_correlation.r_best",
    "events_cross_correlation.r_lag0",
    "events_stl_decompose.resid",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

    import __spark_entry__ as entrymod

    if os.environ.get("CHECK_VANILLA_SESSION"):
        # driver simulation: a bare session with none of our configs —
        # the engine must self-configure (session.ensure_engine_conf)
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[*]").appName("vanilla").getOrCreate()
    else:
        from cdc_realtime_pipeline_spark.session import get_spark

        spark = get_spark("correctness_check")
    con = duckdb.connect()
    # Record the oracle environment (VERDICT r5 #4): a dialect change
    # between local DuckDB and the driver's is a diagnosis headache
    # unless both versions are on the record.
    import pyspark

    print(f"# engines: duckdb {duckdb.__version__}, pyspark {pyspark.__version__}")
    try:
        ieee = con.execute(
            "SELECT current_setting('ieee_floating_point_ops')"
        ).fetchone()[0]
        print(f"# duckdb ieee_floating_point_ops={ieee}")
    except Exception:
        print("# duckdb ieee_floating_point_ops: setting absent (pre-1.1 dialect)")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    from cdc_realtime_pipeline_spark.session import release_caches

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # Untimed memo prewarm on full sweeps (VERDICT r10 #2 — the bench
    # discipline, bench.py:283-291): without it every sweep session
    # re-pays each session-memo build inside whichever consumer runs
    # first (`similarity_recall_report_full` read 50.3 s cold, 6.9 s
    # warm). Cost is printed separately so the per-query lines below
    # measure steady-state consumption. Filtered runs skip it — a
    # single-query debug loop should pay only its own builds.
    if not name_filter:
        from cdc_realtime_pipeline_spark.plans.prewarm import prewarm_memos

        t0 = time.time()
        per_slot = prewarm_memos(spark, sf_dir)
        print(
            f"# memo_prewarm_sec total={time.time() - t0:.1f} "
            + " ".join(f"{k}={v:.1f}" for k, v in per_slot.items())
        )
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if name_filter and not any(f in name for f in name_filter.split(",")):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
            sdtypes = dict(sdf.dtypes)
        except Exception:
            print(f"FAIL {name}: spark error\n{traceback.format_exc()}")
            n_fail += 1
            continue
        finally:
            release_caches()  # per-query scratch caches must not accumulate
        # The driver canonicalizes via pandas sort_values, which throws
        # "unhashable type" on array/map/struct-typed columns — even for
        # rows-only checks. Flag those here so they can't pass locally
        # and crash at the driver (CORRECTNESS_r01: array_functions,
        # value_quantiles_approx).
        bad_cols = [
            c for c, t in sdtypes.items()
            if t.startswith(("array<", "map<", "struct<"))
        ]
        if bad_cols:
            print(
                f"FAIL {name}: non-scalar output columns {bad_cols} would "
                f"crash the driver canonicalizer — serialize them"
            )
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows  [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            # Fetch via Arrow to mirror the driver's path: HUGEINT
            # arrives as decimal128→Decimal (not a silently-widened
            # Python int like .fetchall() gives), so oracle typing
            # divergences surface locally.
            tbl = con.execute(oracles[name]).fetch_arrow_table()
            dcols = list(tbl.column_names)
            _dcolumns = [c.to_pylist() for c in tbl.columns]
            drows = list(zip(*_dcolumns)) if tbl.num_rows else []
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns spark={sorted(scols)} duckdb={sorted(dcols)}")
        else:
            sh = value_hash([r[:] for r in srows], scols)
            dh = value_hash(drows, dcols)
            if sh != dh:
                problems.append(f"value hash spark={sh} duckdb={dh}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}  [{time.time()-t0:.1f}s]")
            # show first diffs for debugging
            s_set = {tuple(_norm_value(v) for v in r) for r in srows}
            d_set = {tuple(_norm_value(v) for v in r) for r in drows}
            only_s = list(s_set - d_set)[:3]
            only_d = list(d_set - s_set)[:3]
            if only_s:
                print(f"   spark-only: {only_s}")
            if only_d:
                print(f"   duckdb-only (cols {dcols}): {only_d}")
            n_fail += 1
        else:
            # a 0==0 match proves nothing — flag it (this fixture has
            # produced vacuous passes three separate times)
            vacuous = "  [VACUOUS: 0 rows]" if not srows else ""
            print(f"PASS {name}: {len(srows)} rows  [{time.time()-t0:.1f}s]{vacuous}")
            n_pass += 1
            # Fixture-sensitivity probe (VERDICT r3 #3 / the -0.0
            # class corpus_dsir_importance hit): a PASS today can flip
            # on a regenerated fixture if either engine emits IEEE
            # -0.0 (DuckDB round keeps the sign, Spark HALF_UP does
            # not — add `+ 0.0` after the round on both engines), or
            # if a signed rounded column crosses zero (the next
            # fixture may land a cell in the -0.0 window). WARN-only.
            import math as _math

            def _negzero(rows):
                return any(
                    isinstance(v, float) and v == 0.0 and _math.copysign(1, v) < 0
                    for r in rows for v in r
                )

            if _negzero(srows) or _negzero(drows):
                print(f"   TIEWARN {name}: emits IEEE -0.0 — add '+ 0.0' after the round")
            else:
                for ci in range(len(dcols)):
                    if f"{name}.{dcols[ci]}" in _TIE_AUDITED:
                        continue  # already carries the + 0.0 guard
                    vals = [r[ci] for r in drows if isinstance(r[ci], float)]
                    if vals and any(v < 0 for v in vals) and any(
                        v == 0.0 for v in vals
                    ):
                        print(
                            f"   TIEWARN {name}.{dcols[ci]}: signed column "
                            f"crosses zero — guard with '+ 0.0' on both engines"
                        )
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
