"""Measure the `linkage_fellegi_sunter` MAX_SHINGLE_DF lever
(VERDICT r11 next-round #2) instead of citing it.

For each candidate df-cap (16 = the shipped default, 8, 4):

  * RECALL — the verified J ≥ 0.6 pair set of `dedup_docs_jaccard`
    at the probe's m1 (= sf0.1) fixture vs the cap-16 truth set
    (cap 16 is the oracle-exact operating point: every green gate
    run differentially proves it equals DuckDB's all-pairs answer).
  * CONTAINMENT RECALL (round 13, VERDICT r12 #3) — the
    `dedup_docs_containment` pair set (C ≥ 0.9; these are the sub-τ
    consumers whose symmetric Jaccard sits at ~0.2-0.5, BELOW the
    MinHash backstop's τ=0.6 design point) vs the cap-16 truth set,
    completing the round-12 table's one asserted cell. The probe
    also reports the min/median symmetric Jaccard of the truth
    containment pairs to show they really live in the sub-τ band.
  * CANDIDATE MASS — the verified-candidate count (the memoized
    candidates-then-verify table linkage consumes), i.e. the cost
    the cap actually controls.
  * α — the 1×/3×/10× scale exponent of `linkage_fellegi_sunter`
    on the scale_probe fixture variants, same methodology as
    tools/scale_probe.py (cold memos inside every timed point,
    one untimed seam warm-up first).

Prints one JSON line per cap plus a markdown table for SCALING.md.

`--containment-band f` (e.g. 0.25) adds an ENGINEERED sub-τ leg: the
fixture's own containment pairs turn out to be supra-τ (its planted
copies keep 400 of ~500 chars → symmetric J ≈ 0.7-1.0, measured min
0.694), so this leg builds a probe-only corpus whose excerpts keep
only fraction f of each source doc (J ≈ f at containment ≈ 1) and
measures, per cap, the recall of the df-capped + band-backstop
candidate generator against the UNCAPPED exact candidate join — with
a rare-path vs band-path provenance decomposition, so the shipped
default's sub-τ story is measured, not asserted (VERDICT r12 #3).

Usage: python3 tools/fs_lever_probe.py [--caps 16,8,4]
       [--multipliers 1,3,10] [--containment-band 0.25]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def containment_band_leg(spark, src_dir: str, frac: float, caps: list[int]) -> None:
    """Measured sub-τ containment recall (VERDICT r12 #3).

    Builds a probe-only corpus: base documents ∪ excerpts keeping the
    first ``frac`` of every 3rd doc's characters (symmetric Jaccard of
    a (source, excerpt) pair ≈ frac; containment ≈ 1, i.e. exactly the
    band below the backstop's τ = 0.6 design point). Truth = the
    UNCAPPED exact shingle join's containment pairs (C ≥ 0.9,
    inter ≥ 5 — any such pair shares ≥ 5 shingles, so the uncapped
    equi-join with min_rare_shared=1 is exhaustive, no LSH involved).
    Per cap, the SHIPPED generator (df-capped rare path ∪ MinHash band
    backstop, provenance-tagged) is scored against that truth, with
    the rare/band decomposition showing which generator carries the
    sub-τ family.
    """
    from pyspark.sql import functions as F

    from cdc_realtime_pipeline_spark.operators import dedup
    from cdc_realtime_pipeline_spark.session import (
        load_table,
        release_caches,
        tracked_persist,
    )

    docs = load_table(spark, src_dir, "documents").select("doc_id", "text")
    excerpts = docs.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 500000).alias("doc_id"),
        F.expr(
            f"substring(text, 1, cast(length(text) * {frac} as int))"
        ).alias("text"),
    )
    corpus = docs.unionByName(excerpts).repartition(
        spark.sparkContext.defaultParallelism
    )
    sh = tracked_persist(dedup._word_shingles(corpus))
    # the SHIPPED containment decision, imported — never re-inlined
    contain_pairs = dedup.containment_filter

    # exhaustive truth: uncapped join, no rare-shared bar, bands moot
    truth_ver = contain_pairs(
        dedup._shingle_candidates(sh, max_df=1 << 30, min_rare_shared=1)
    ).withColumn(
        "jaccard",
        F.round(
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4
        ),
    )
    truth_rows = truth_ver.select("doc_a", "doc_b", "jaccard").collect()
    release_caches()
    sh = tracked_persist(dedup._word_shingles(corpus))
    truth = {(r.doc_a, r.doc_b) for r in truth_rows}
    if not truth:
        print(
            f"engineered containment band (frac={frac}): EMPTY truth set — "
            f"excerpts too short to clear the inter >= "
            f"{dedup.CONTAINMENT_MIN_INTER} floor; raise frac",
            flush=True,
        )
        release_caches()
        return
    js = sorted(r.jaccard for r in truth_rows)
    print(
        f"engineered containment band (frac={frac}): {len(truth)} truth "
        f"pairs, symmetric Jaccard min {js[0]:.3f} / median "
        f"{js[len(js) // 2]:.3f} / max {js[-1]:.3f}",
        flush=True,
    )

    rows = []
    for cap in caps:
        found = {
            (r.doc_a, r.doc_b): (r.from_rare, r.from_band)
            for r in contain_pairs(
                dedup._shingle_candidates(sh, max_df=cap, provenance=True)
            ).collect()
        }
        release_caches()
        sh = tracked_persist(dedup._word_shingles(corpus))
        hit = truth & set(found)
        row = {
            "frac": frac,
            "cap": cap,
            "truth_pairs": len(truth),
            "recall": round(len(hit) / len(truth), 6) if truth else 1.0,
            "rare_only": sum(
                1 for p in hit if found[p][0] and not found[p][1]
            ),
            "band_only": sum(
                1 for p in hit if found[p][1] and not found[p][0]
            ),
            "both": sum(1 for p in hit if found[p][0] and found[p][1]),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    release_caches()

    print(
        f"\n| cap | recall@C>=0.9 (J≈{frac} band) | rare-only | band-only | both |"
    )
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['cap']} | {r['recall']} | {r['rare_only']} | "
            f"{r['band_only']} | {r['both']} |"
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--caps", default="16,8,4")
    ap.add_argument("--multipliers", default="1,3,10")
    ap.add_argument(
        "--containment-band",
        type=float,
        default=None,
        help="run ONLY the engineered sub-τ containment recall leg at "
        "this excerpt fraction (e.g. 0.25)",
    )
    args = ap.parse_args()
    caps = [int(c) for c in args.caps.split(",")]
    ms = [int(m) for m in args.multipliers.split(",")]

    if args.containment_band is not None:
        from cdc_realtime_pipeline_spark.session import get_spark

        spark = get_spark("fs_lever_probe_containment")
        containment_band_leg(
            spark,
            os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
            args.containment_band,
            caps,
        )
        return

    from scale_probe import _build

    from cdc_realtime_pipeline_spark.operators import dedup
    from cdc_realtime_pipeline_spark.session import (
        get_spark,
        release_caches,
        release_memos,
    )

    spark = get_spark("fs_lever_probe")
    dirs = {m: _build(spark, m) for m in ms}

    # untimed seam warm-up (scale_probe discipline): JVM codegen +
    # Python-worker/Arrow cold start must not land in the first point
    spark.read.parquet(os.path.join(dirs[ms[0]], "lineitem.parquet")).groupBy(
        "l_returnflag"
    ).count().write.mode("overwrite").format("noop").save()
    spark.range(100000).mapInPandas(lambda it: it, "id long").write.mode(
        "overwrite"
    ).format("noop").save()

    default_cap = dedup.MAX_SHINGLE_DF
    truth: set[tuple[int, int]] | None = None
    c_truth: set[tuple[int, int]] | None = None
    c_truth_j: list[float] = []
    truth_cap = caps[0]  # first cap listed is the truth set — name it
    m_base = ms[0]  # recall/candidate-mass measured at the base volume
    rows = []
    try:
        for cap in caps:
            dedup.MAX_SHINGLE_DF = cap
            release_memos()
            release_caches()
            pairs = {
                (r.doc_a, r.doc_b)
                for r in dedup.dedup_docs_jaccard(spark, dirs[m_base]).collect()
            }
            # containment consumes the same memoized candidate table,
            # so this leg re-times nothing — it reads the cap's effect
            # on the sub-τ (J ≈ 0.2-0.5) pair family (VERDICT r12 #3)
            cpairs = {
                (r.doc_a, r.doc_b)
                for r in dedup.dedup_docs_containment(
                    spark, dirs[m_base]
                ).collect()
            }
            n_cand = dedup._verified_candidates(spark, dirs[m_base]).count()
            if truth is None:
                truth = pairs
                c_truth = cpairs
                # symmetric Jaccard of the truth containment pairs —
                # proves the containment family really sits below τ
                ver = dedup._verified_candidates(spark, dirs[m_base])
                jmap = {
                    (r.doc_a, r.doc_b): r.inter / (r.sz_a + r.sz_b - r.inter)
                    for r in ver.collect()
                    if (r.doc_a, r.doc_b) in cpairs
                }
                c_truth_j = sorted(jmap.values())
            recall = len(pairs & truth) / len(truth) if truth else 1.0
            c_recall = (
                len(cpairs & c_truth) / len(c_truth) if c_truth else 1.0
            )
            times: dict[int, float] = {}
            for m in ms:
                release_memos()
                release_caches()
                t0 = time.time()
                dedup.QUERIES["linkage_fellegi_sunter"](
                    spark, dirs[m]
                ).write.mode("overwrite").format("noop").save()
                times[m] = round(time.time() - t0, 2)
                release_caches()
            lo, hi = min(ms), max(ms)
            # recall-only runs (--multipliers 1) skip the scale exponent
            alpha = (
                round(math.log(times[hi] / times[lo]) / math.log(hi / lo), 2)
                if hi > lo
                else None
            )
            row = {
                "cap": cap,
                "true_pairs": len(truth),
                f"recall_vs_cap{truth_cap}": round(recall, 6),
                "containment_true_pairs": len(c_truth),
                f"containment_recall_vs_cap{truth_cap}": round(c_recall, 6),
                f"verified_candidates_m{m_base}": n_cand,
                "times_sec": times,
                "alpha": alpha,
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
    finally:
        dedup.MAX_SHINGLE_DF = default_cap
        release_memos()

    if c_truth_j:
        med = c_truth_j[len(c_truth_j) // 2]
        print(
            f"\ncontainment truth-pair symmetric Jaccard: min {c_truth_j[0]:.3f}, "
            f"median {med:.3f}, max {c_truth_j[-1]:.3f} "
            f"(n={len(c_truth_j)}) — the sub-τ band the cap must not starve"
        )
    print(f"\n| cap | recall@J>=0.6 (vs cap {truth_cap}) | containment recall@C>=0.9 | "
          f"verified candidates (m{m_base}) | "
          + " / ".join(f"{m}x" for m in ms) + " | alpha |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        t = " / ".join(f"{r['times_sec'][m]}" for m in ms)
        alpha_cell = "-" if r["alpha"] is None else r["alpha"]
        print(f"| {r['cap']} | {r[f'recall_vs_cap{truth_cap}']} | "
              f"{r[f'containment_recall_vs_cap{truth_cap}']} | "
              f"{r[f'verified_candidates_m{m_base}']} | {t} | {alpha_cell} |")


if __name__ == "__main__":
    raise SystemExit(main())
