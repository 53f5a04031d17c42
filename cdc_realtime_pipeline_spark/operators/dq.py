"""Data-quality monitoring: per-column audit profile + PSI drift.

Two operators a 100 TB ingest pipeline runs on every batch before the
data is allowed downstream — the observability layer next to the
curation funnel's filter stages (curation.py):

* **column profile** — per-column null count and exact distinct count
  over a table, emitted as audit rows. ONE aggregate statement for all
  columns (Catalyst plans the multi-distinct via Expand: one scan
  multiplied per column, instead of one scan per column) unpivoted
  with ``stack``. All outputs are integers — exactly portable, no
  float discipline needed.
* **PSI drift** — Population Stability Index of the `value`
  distribution, first half of the time range vs second half, per
  event_type: ``Σ (p_i − q_i) ln(p_i / q_i)`` over 10 equal-width
  bins. The midpoint/bin-edge arithmetic is the identical IEEE double
  expression on both engines, so binning is deterministic; ε-smoothing
  keeps empty bins finite. PSI ≥ 0.2 is the conventional "investigate"
  threshold — emitted as a flag, not a filter, so the gate row pins
  the full per-type report. One scan → one (type, bin) agg → one
  (type) agg: bounded-key shuffles only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdc_realtime_pipeline_spark.session import load_table, tracked_persist

_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


def orders_dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column DQ audit over ``orders``: rows of
    (column, n_rows, n_null, n_distinct).

    ONE statement — all six columns' null counts and exact distincts
    in a single agg (Catalyst plans the multi-distinct via Expand:
    one table scan multiplied 6×, instead of six scans; scan IO
    dominates at 100 TB so Expand wins), then a ``stack`` unpivot to
    audit rows. The exact twin of the approx-sketch profile
    (``dash_approx_distinct_users`` holds the sketch side). Integer
    outputs only.
    """
    orders = load_table(spark, sf_dir, "orders")
    aggs = [F.count("*").alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"null_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"dist_{c}"))
    wide = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', null_{c}, dist_{c}" for c in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) AS (column, n_null, n_distinct)"
        ),
        "n_rows",
    ).select("column", "n_rows", "n_null", "n_distinct")


ORDERS_DQ_PROFILE_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS "column", count(*) AS n_rows,
       count(CASE WHEN {c} IS NULL THEN 1 END) AS n_null,
       count(DISTINCT {c}) AS n_distinct FROM orders"""
    for c in _PROFILE_COLS
)

_PSI_BINS = 10
_PSI_EPS = 1e-6


def value_distribution_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI of the events ``value`` distribution, first half vs second
    half of the observed time range, per event_type.

    The classic deploy-time drift monitor: p = early share per bin,
    q = late share per bin, PSI = Σ (p−q)·ln(p/q) with ε-smoothed
    shares. Bin edges span the global [min, max] — computed once,
    broadcast as a 1-row join (no collect), identical double
    arithmetic on both engines.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value", F.unix_micros("ts").alias("us")
    )
    bounds = ev.agg(
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.min("us").alias("tmin"),
        F.max("us").alias("tmax"),
    )
    # 1-row bounds side: broadcast cross join, never a driver collect
    j = ev.crossJoin(F.broadcast(bounds))
    binned = j.select(
        "event_type",
        # bin width floored at 1e-12 so a constant column degenerates
        # to "everything in bin 0, PSI 0" instead of engine-specific
        # NaN/inf handling on a zero-width division
        F.least(
            F.lit(_PSI_BINS - 1),
            F.floor(
                (F.col("value") - F.col("vmin"))
                / F.greatest(
                    (F.col("vmax") - F.col("vmin")) / _PSI_BINS, F.lit(1e-12)
                )
            ).cast("int"),
        ).alias("bin"),
        # strictly-before-midpoint ⇒ early half; integer µs arithmetic
        # so the split point is exact on both engines
        (F.col("us") * 2 < F.col("tmin") + F.col("tmax")).alias("early"),
    )
    counts = binned.groupBy("event_type", "bin").agg(
        F.count(F.when(F.col("early"), 1)).alias("n_early"),
        F.count(F.when(~F.col("early"), 1)).alias("n_late"),
    )
    totals = counts.groupBy("event_type").agg(
        F.sum("n_early").alias("tot_early"),
        F.sum("n_late").alias("tot_late"),
    )
    # eps only inside the ln ratio; the difference term is written as
    # plain p - q on BOTH engines ((p+eps)-(q+eps) associates
    # differently in IEEE despite being mathematically equal — ADVICE
    # r3 #2), and drift_flag maps a NULL psi (an empty time half) to 0
    # exactly like the oracle's CASE (ADVICE r3 #1).
    diff = F.col("n_early") / F.col("tot_early") - F.col("n_late") / F.col("tot_late")
    p = F.col("n_early") / F.col("tot_early") + _PSI_EPS
    q = F.col("n_late") / F.col("tot_late") + _PSI_EPS
    psi = (
        counts.join(totals, "event_type")
        .select("event_type", (diff * F.log(p / q)).alias("term"))
        .groupBy("event_type")
        .agg(F.round(F.sum("term") + 1e-9, 6).alias("psi"))
    )
    return psi.select(
        "event_type",
        "psi",
        F.when(F.col("psi") >= 0.2, 1).otherwise(0).alias("drift_flag"),
    )


VALUE_DISTRIBUTION_PSI_SQL = f"""
WITH ev AS (
  SELECT event_type, value, epoch_us(ts) AS us FROM events
),
bounds AS (
  SELECT min(value) AS vmin, max(value) AS vmax,
         min(us) AS tmin, max(us) AS tmax FROM ev
),
binned AS (
  SELECT event_type,
         least({_PSI_BINS - 1},
               CAST(floor((value - vmin)
                          / greatest((vmax - vmin) / {_PSI_BINS}, 1e-12)) AS INT)) AS bin,
         us * 2 < tmin + tmax AS early
  FROM ev CROSS JOIN bounds
),
counts AS (
  SELECT event_type, bin,
         count(CASE WHEN early THEN 1 END) AS n_early,
         count(CASE WHEN NOT early THEN 1 END) AS n_late
  FROM binned GROUP BY 1, 2
),
totals AS (
  SELECT event_type, sum(n_early) AS tot_early, sum(n_late) AS tot_late
  FROM counts GROUP BY 1
),
psi AS (
  SELECT c.event_type,
         round(sum((n_early / tot_early - n_late / tot_late)
                   * ln((n_early / tot_early + {_PSI_EPS})
                        / (n_late / tot_late + {_PSI_EPS}))) + 1e-9, 6) AS psi
  FROM counts c JOIN totals t ON c.event_type = t.event_type
  GROUP BY 1
)
SELECT event_type, psi, CASE WHEN psi >= 0.2 THEN 1 ELSE 0 END AS drift_flag
FROM psi
"""


def daily_users_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: per-day HLL user sketches union into a
    global distinct estimate — the pattern that makes count-distinct
    re-aggregable at 100 TB (daily partials persist; any date-range
    distinct is a union of sketches, never a re-scan; the same
    contract the MV analog pins for sum/count partials).

    ``hll_sketch_agg`` per day, ``hll_union_agg`` across days
    (DataSketches HLL — actual mergeable binary sketches, not the
    HyperLogLog++ scalar of ``approx_count_distinct``). Self-checking
    (VERDICT r2 #6 pattern): emits the exact distinct alongside, the
    relative error, and a bound flag at 3× the configured sketch's
    standard error — a rows-only gate row that still carries a
    machine-checkable invariant. No SQL oracle: sketch internals are
    engine-specific by nature.
    """
    lg_k = 12  # 2^12 buckets → ~1.04/sqrt(2^12) ≈ 1.6% standard error
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    )
    daily = ev.groupBy("day").agg(
        F.hll_sketch_agg("user_id", F.lit(lg_k)).alias("sketch"),
        F.count_distinct("user_id").alias("exact_daily"),
    )
    merged = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_users"),
        F.count("*").alias("n_days"),
    )
    exact = load_table(spark, sf_dir, "events").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    out = merged.crossJoin(F.broadcast(exact))
    rel_err = F.abs(F.col("approx_users") - F.col("exact_users")) / F.col(
        "exact_users"
    )
    return out.select(
        "n_days",
        F.col("approx_users").cast("long").alias("approx_users"),
        "exact_users",
        F.round(rel_err + 1e-9, 6).alias("rel_err"),
        (rel_err <= 3 * 1.04 / (2 ** (lg_k / 2))).cast("int").alias("within_bound"),
    )


def value_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust preprocessing stats: per event_type, winsorize ``value``
    at [p1, p99] and emit clipped vs raw mean/stddev plus the clip
    counts — the outlier-robust normalization step a feature pipeline
    runs before scaling, with the audit columns that make silent
    heavy-tail damage visible.

    Two aggregates over one key: exact p1/p99 per type (bounded
    groups), broadcast back by key join, then the clipped re-agg.
    Percentile interpolation is the continuous definition both engines
    share (see ``hourly_median_iqr``); clip boundaries are compared on
    identically-rounded values.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    pct = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.01)") + 1e-9, 6).alias("p01"),
        F.round(F.expr("percentile(value, 0.99)") + 1e-9, 6).alias("p99"),
    )
    clipped = ev.join(F.broadcast(pct), "event_type").select(
        "event_type",
        "value",
        F.least(F.greatest(F.col("value"), F.col("p01")), F.col("p99")).alias(
            "winsorized"
        ),
        (F.col("value") < F.col("p01")).cast("int").alias("clip_lo"),
        (F.col("value") > F.col("p99")).cast("int").alias("clip_hi"),
    )
    return clipped.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("clip_lo").alias("n_clipped_low"),
        F.sum("clip_hi").alias("n_clipped_high"),
        F.round(F.avg("value") + 1e-9, 4).alias("raw_mean"),
        F.round(F.stddev_samp("value") + 1e-9, 4).alias("raw_std"),
        F.round(F.avg("winsorized") + 1e-9, 4).alias("wins_mean"),
        F.round(F.stddev_samp("winsorized") + 1e-9, 4).alias("wins_std"),
    )


VALUE_WINSORIZED_STATS_SQL = """
WITH pct AS (
  SELECT event_type,
         round(quantile_cont(value, 0.01) + 1e-9, 6) AS p01,
         round(quantile_cont(value, 0.99) + 1e-9, 6) AS p99
  FROM events GROUP BY 1
),
clipped AS (
  SELECT e.event_type,
         value,
         least(greatest(value, p01), p99) AS winsorized,
         CASE WHEN value < p01 THEN 1 ELSE 0 END AS clip_lo,
         CASE WHEN value > p99 THEN 1 ELSE 0 END AS clip_hi
  FROM events e JOIN pct USING (event_type)
)
SELECT event_type,
       count(*) AS n,
       CAST(sum(clip_lo) AS BIGINT) AS n_clipped_low,
       CAST(sum(clip_hi) AS BIGINT) AS n_clipped_high,
       round(avg(value) + 1e-9, 4) AS raw_mean,
       round(stddev_samp(value) + 1e-9, 4) AS raw_std,
       round(avg(winsorized) + 1e-9, 4) AS wins_mean,
       round(stddev_samp(winsorized) + 1e-9, 4) AS wins_std
FROM clipped GROUP BY 1
"""


def events_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift detector over the semi-structured ``props`` column:
    per (day, json key) event counts, with keys whose first appearance
    is after the stream's first day flagged ``is_new`` — the monitor
    that catches an upstream producer quietly adding fields (the
    reference's Debezium schema-change topic has no downstream
    consumer; this is the idiomatic Spark-side answer: detect drift
    from the data itself).

    The fixture's props carry a single stable key, so drift is PLANTED
    deterministically (the ``null_semantics_conformance`` pattern):
    events with ``event_id % 13 == 0`` on/after 2024-01-16 gain a
    ``beta_field`` key via engine-portable string surgery.

    Scale: keys explode map-side (bounded: keys per event, not values),
    one (day,key) hash-agg, then window mins over the tiny aggregate —
    never over raw events.
    """
    drifted = F.col("event_id") % 13 == 0
    after = F.col("ts") >= F.lit("2024-01-16 00:00:00").cast("timestamp")
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.when(
            drifted & after,
            F.replace(F.col("props"), F.lit("}"), F.lit(',"beta_field":1}')),
        )
        .otherwise(F.col("props"))
        .alias("props"),
    )
    keyed = ev.select("day", F.explode(F.json_object_keys("props")).alias("key"))
    counts = keyed.groupBy("day", "key").agg(F.count("*").alias("n_events"))
    w_key = Window.partitionBy("key")
    w_all = Window.partitionBy()
    return (
        counts.withColumn("first_day", F.min("day").over(w_key))
        .withColumn("corpus_day0", F.min("day").over(w_all))
        .select(
            "day",
            "key",
            "n_events",
            (F.col("first_day") > F.col("corpus_day0")).cast("int").alias("is_new"),
        )
        .orderBy("day", "key")
    )


EVENTS_SCHEMA_DRIFT_SQL = """
WITH ev AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CASE WHEN event_id % 13 = 0 AND ts >= TIMESTAMP '2024-01-16'
              THEN replace(props, '}', ',"beta_field":1}')
              ELSE props END AS props
  FROM events
),
keyed AS (
  SELECT day, unnest(json_keys(props)) AS key FROM ev
),
counts AS (
  SELECT day, key, count(*) AS n_events FROM keyed GROUP BY 1, 2
)
SELECT day, key, n_events,
       CASE WHEN min(day) OVER (PARTITION BY key) > min(day) OVER ()
            THEN 1 ELSE 0 END AS is_new
FROM counts ORDER BY day, key
"""


def value_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (NTILE) histogram of ``value``: 10 deciles with
    exact bucket counts and boundaries — the profile a feature-scaling
    step reads, and the conformance row pinning NTILE's remainder
    semantics (first ``N mod k`` buckets get the extra row) across
    engines. Total order is (value, event_id) so ties are
    deterministic.

    Scale note: exact global NTILE is a total sort — correct as a
    conformance row, but at 100 TB the production path for decile
    boundaries is ``approx_percentile`` (see ``value_quantiles_approx``)
    or the per-key exact percentiles (bounded groups) elsewhere in this
    module; this operator's job is to pin the exact semantics those
    approximations are judged against.
    """
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    w = Window.orderBy("value", "event_id")
    return (
        ev.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("value") + 1e-9, 4).alias("lo"),
            F.round(F.max("value") + 1e-9, 4).alias("hi"),
        )
        .orderBy("decile")
    )


VALUE_EQUIDEPTH_HISTOGRAM_SQL = """
SELECT decile, count(*) AS n,
       round(min(value) + 1e-9, 4) AS lo,
       round(max(value) + 1e-9, 4) AS hi
FROM (
  SELECT value, ntile(10) OVER (ORDER BY value, event_id) AS decile
  FROM events
)
GROUP BY decile ORDER BY decile
"""


_EQD_BUCKETS = 10


def value_equidepth_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram WITHOUT the global sort — the production
    re-shape the NTILE conformance row's scale note promises: this is
    how an engine's ANALYZE actually builds equi-height statistics.
    Values round to 4dp, the DISTINCT-value relation (domain-bounded,
    never corpus-sized — the ``events_kruskal_wallis`` construction)
    gets cumulative counts, and a distinct value lands in bucket
    ⌊cum_before · B / N⌋ — whole values never split across buckets,
    so bucket depths are equal UP TO the largest tied value (the
    real-world equi-depth contract; exact NTILE tie-splitting is the
    conformance row's job). Corpus cost: ONE keyed aggregate; the
    only ordered pass runs on the distinct-value relation.

    Emits per bucket: row count, lo/hi boundaries, and n_distinct —
    the stats a selectivity estimator reads off the histogram.
    """
    ev = load_table(spark, sf_dir, "events").select(
        (F.round(F.col("value") + 1e-9, 4) + 0.0).alias("v")
    )
    per_v = ev.groupBy("v").agg(F.count("*").cast("long").alias("n_v"))
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    tot = per_v.agg(F.sum("n_v").alias("n_total"))
    binned = (
        per_v.withColumn("cum_before", F.coalesce(F.sum("n_v").over(wv), F.lit(0)))
        .crossJoin(F.broadcast(tot))
        .select(
            "v",
            "n_v",
            F.floor(
                F.col("cum_before") * _EQD_BUCKETS / F.col("n_total")
            )
            .cast("int")
            .alias("bucket"),
        )
    )
    return (
        binned.groupBy("bucket")
        .agg(
            F.sum("n_v").alias("n"),
            F.count("*").alias("n_distinct"),
            (F.round(F.min("v") + 1e-9, 4) + 0.0).alias("lo"),
            (F.round(F.max("v") + 1e-9, 4) + 0.0).alias("hi"),
        )
        .orderBy("bucket")
    )


VALUE_EQUIDEPTH_SCALABLE_SQL = f"""
WITH per_v AS (
  SELECT round(value + 1e-9, 4) + 0.0 AS v, CAST(count(*) AS BIGINT) AS n_v
  FROM events GROUP BY 1
),
tot AS (SELECT sum(n_v) AS n_total FROM per_v),
binned AS (
  SELECT v, n_v,
         CAST(floor(coalesce(sum(n_v) OVER (ORDER BY v ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    * {_EQD_BUCKETS} / tot.n_total) AS INT) AS bucket
  FROM per_v CROSS JOIN tot
)
SELECT bucket, CAST(sum(n_v) AS BIGINT) AS n,
       count(*) AS n_distinct,
       round(min(v) + 1e-9, 4) + 0.0 AS lo,
       round(max(v) + 1e-9, 4) + 0.0 AS hi
FROM binned GROUP BY bucket ORDER BY bucket
"""


def value_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via MAD (median absolute deviation):
    per event_type, flag values whose deviation from the median
    exceeds 3·1.4826·MAD — the robust z-score that, unlike the
    mean/σ bands elsewhere in this repo, a single extreme value
    cannot inflate (σ-based thresholds famously mask the very
    outliers they hunt). The 1.4826 factor makes MAD consistent with
    σ under normality.

    Two percentile passes over the same key (median, then median of
    deviations), each a bounded-group exact percentile broadcast back
    by key join; the flag compares identically-rounded operands so a
    boundary value cannot flip engines.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)") + 1e-9, 6).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med",
        F.round(F.abs(F.col("value") - F.col("med")) + 1e-9, 6).alias("dev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.round(F.expr("percentile(dev, 0.5)") + 1e-9, 6).alias("mad")
    )
    flagged = dev.join(F.broadcast(mad), "event_type").select(
        "event_type",
        "med",
        "mad",
        (F.col("dev") > F.round(3 * 1.4826 * F.col("mad") + 1e-9, 6)).cast(
            "long"
        ).alias("is_out"),
    )
    return (
        flagged.groupBy("event_type", "med", "mad")
        .agg(
            F.count("*").alias("n"),
            F.sum("is_out").alias("n_outliers"),
        )
        .select(
            "event_type",
            "n",
            "med",
            "mad",
            "n_outliers",
            F.round(F.col("n_outliers") / F.col("n") + 1e-9, 6).alias("outlier_frac"),
        )
        .orderBy("event_type")
    )


VALUE_MAD_OUTLIERS_SQL = """
WITH med AS (
  SELECT event_type, round(quantile_cont(value, 0.5) + 1e-9, 6) AS med
  FROM events GROUP BY 1
),
dev AS (
  SELECT e.event_type, med,
         round(abs(value - med) + 1e-9, 6) AS dev
  FROM events e JOIN med USING (event_type)
),
mad AS (
  SELECT event_type, round(quantile_cont(dev, 0.5) + 1e-9, 6) AS mad
  FROM dev GROUP BY 1
),
flagged AS (
  SELECT d.event_type, d.med, m.mad,
         CASE WHEN dev > round(3 * 1.4826 * mad + 1e-9, 6)
              THEN 1 ELSE 0 END AS is_out
  FROM dev d JOIN mad m USING (event_type)
)
SELECT event_type, count(*) AS n, med, mad,
       CAST(sum(is_out) AS BIGINT) AS n_outliers,
       round(sum(is_out) / CAST(count(*) AS DOUBLE) + 1e-9, 6) AS outlier_frac
FROM flagged GROUP BY event_type, med, mad ORDER BY event_type
"""


def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-skew diagnostics for the shuffle key — the profile a
    100 TB operator reads BEFORE choosing a join/agg strategy on that
    key (broadcast vs shuffle, salt factor, AQE skew threshold). The
    reference's analog is its hot-market concern (SURVEY.md §7: "salted
    keys documented for hot markets"); this makes the decision
    data-driven instead of folklore.

    Per-key counts (one keyed shuffle, map-side combinable) reduce to
    one diagnostic row: key cardinality, max/avg per-key rows,
    ``skew_ratio`` = max/avg (AQE's skewedPartitionFactor analog on
    the KEY level — the number that says whether the hottest key alone
    overflows an executor partition), top-1 and top-10 key share of all
    rows, and exact p50/p99 of the per-key distribution
    (``percentile`` ≡ DuckDB ``quantile_cont``). The second stage
    aggregates a key-cardinality-sized input down to a scalar —
    at 100 TB that intermediate is ~n_keys rows, never the fact table,
    and the top-10 share comes from a rank window over that same
    bounded relation, not a global sort of the data.
    """
    counts = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("user_id"))
    ranked = counts.withColumn("rk", F.row_number().over(w))
    return ranked.agg(
        F.count("*").alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_key_rows"),
        F.round(F.avg("cnt") + 1e-9, 4).alias("avg_key_rows"),
        F.round(F.max("cnt") / F.avg("cnt") + 1e-9, 4).alias("skew_ratio"),
        F.round(F.max("cnt") / F.sum("cnt") + 1e-9, 6).alias("top1_share"),
        F.round(
            F.sum(F.when(F.col("rk") <= 10, F.col("cnt")).otherwise(0))
            / F.sum("cnt")
            + 1e-9,
            6,
        ).alias("top10_share"),
        F.round(F.expr("percentile(cnt, 0.5)") + 1e-9, 4).alias("p50_key_rows"),
        F.round(F.expr("percentile(cnt, 0.99)") + 1e-9, 4).alias("p99_key_rows"),
    )


KEY_SKEW_PROFILE_SQL = """
WITH counts AS (
  SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
),
ranked AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, user_id ASC) AS rk
  FROM counts
)
SELECT count(*) AS n_keys,
       CAST(sum(cnt) AS BIGINT) AS n_rows,
       CAST(max(cnt) AS BIGINT) AS max_key_rows,
       round(avg(cnt) + 1e-9, 4) AS avg_key_rows,
       round(max(cnt) / avg(cnt) + 1e-9, 4) AS skew_ratio,
       round(max(cnt) / CAST(sum(cnt) AS DOUBLE) + 1e-9, 6) AS top1_share,
       round(sum(CASE WHEN rk <= 10 THEN cnt ELSE 0 END)
             / CAST(sum(cnt) AS DOUBLE) + 1e-9, 6) AS top10_share,
       round(quantile_cont(cnt, 0.5) + 1e-9, 4) AS p50_key_rows,
       round(quantile_cont(cnt, 0.99) + 1e-9, 4) AS p99_key_rows
FROM ranked
"""


def daily_users_bitmap_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct rollup via bitmaps — the exact twin of
    `daily_users_hll_rollup`: per (day, bucket) the engine stores a
    32 Ki-bit bitmap of user ids (``bitmap_construct_agg``), and any
    coarser distinct count is a lossless ``bitmap_or_agg`` +
    ``bitmap_count`` over the stored partials — never a re-scan of the
    fact data. This is the Snowflake/ClickHouse bitmap-distinct
    pattern: exact where HLL is approximate, at bitmap-size cost
    (fine for dense integer keys like user ids; HLL remains the
    arbitrary-key fallback).

    Output per ISO week: the exact WAU from OR-ing the daily bitmaps,
    Σ daily DAU (same partials, bucket-summed per day first), and the
    revisit ratio between them. Oracle recomputes both from raw rows —
    the bitmaps must be information-lossless for the hashes to match.
    ``user_id+1`` keeps ids on the function family's 1-based grid.
    Partial relation is (days × buckets) rows — at 100 TB the rollup
    reads partials only, and daily partials merge map-side.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("day"),
        (F.col("user_id") + 1).alias("uid"),
    )
    daily = ev.groupBy(
        "day", F.expr("bitmap_bucket_number(uid)").alias("bkt")
    ).agg(F.expr("bitmap_construct_agg(bitmap_bit_position(uid))").alias("bm"))
    week = F.date_trunc("week", F.col("day")).alias("week_start")
    dau = (
        daily.groupBy("day")
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("dau"))
        .groupBy(week)
        .agg(F.sum("dau").alias("sum_daily_dau"))
    )
    wau = (
        daily.groupBy(week, F.col("bkt"))
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        .groupBy("week_start")
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("wau_exact"))
    )
    return (
        wau.join(dau, "week_start")
        .select(
            "week_start",
            "wau_exact",
            "sum_daily_dau",
            F.round(F.col("sum_daily_dau") / F.col("wau_exact") + 1e-9, 4).alias(
                "revisit_ratio"
            ),
        )
        .orderBy("week_start")
    )


DAILY_USERS_BITMAP_ROLLUP_SQL = """
WITH d AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(date_trunc('week', ts) AS TIMESTAMP) AS week_start,
         user_id
  FROM events
),
dau AS (
  SELECT week_start, day, count(DISTINCT user_id) AS dau
  FROM d GROUP BY 1, 2
),
wk AS (
  SELECT week_start, count(DISTINCT user_id) AS wau_exact
  FROM d GROUP BY 1
)
SELECT w.week_start, w.wau_exact,
       CAST(sum(dau.dau) AS BIGINT) AS sum_daily_dau,
       round(sum(dau.dau) / CAST(w.wau_exact AS DOUBLE) + 1e-9, 4)
         AS revisit_ratio
FROM wk w JOIN dau ON dau.week_start = w.week_start
GROUP BY w.week_start, w.wau_exact
ORDER BY w.week_start
"""


_OVERLAP_PAIRS = [("click", "purchase"), ("view", "click"), ("view", "purchase")]


def audience_overlap_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact audience-overlap via bitmap inclusion-exclusion — "how
    many users did A AND B" for event-type pairs, computed from the
    SAME per-(type, bucket) bitmap partials the distinct-rollup family
    stores. Spark ships no bitmap AND aggregate, so the intersection
    is |A| + |B| − |A∪B| with the union from ``bitmap_or_agg`` —
    every term lossless, never a fact re-scan (the Theta-sketch
    set-operation workload, exact on dense integer keys). Emits per
    pair: both audience sizes, union, overlap, and Jaccard.

    Scale shape: ONE events scan builds the persisted (3 × buckets)
    bitmap relation; the three pair plans re-aggregate those partials
    (bucket-keyed OR then a scalar sum each). The tracked persist is
    released by the harness's ``release_caches`` after the query.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin([a for p in _OVERLAP_PAIRS for a in p])
    )
    per = tracked_persist(
        ev.select("event_type", (F.col("user_id") + 1).alias("uid"))
        .groupBy("event_type", F.expr("bitmap_bucket_number(uid)").alias("bkt"))
        .agg(F.expr("bitmap_construct_agg(bitmap_bit_position(uid))").alias("bm"))
    )
    counts = per.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("n")
    )
    pair_rows = []
    for a, b in _OVERLAP_PAIRS:
        uni = (
            per.filter(F.col("event_type").isin([a, b]))
            .groupBy("bkt")
            .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
            .agg(F.sum(F.expr("bitmap_count(bm)")).alias("n_union"))
            .select(
                F.lit(a).alias("type_a"), F.lit(b).alias("type_b"), "n_union"
            )
        )
        pair_rows.append(uni)
    pairs = pair_rows[0]
    for p in pair_rows[1:]:
        pairs = pairs.unionByName(p)
    ca = counts.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    cb = counts.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    out = (
        pairs.join(F.broadcast(ca), "type_a")
        .join(F.broadcast(cb), "type_b")
        .withColumn("n_overlap", F.col("n_a") + F.col("n_b") - F.col("n_union"))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_overlap").cast("double") / F.col("n_union").cast("double")
                + 1e-9,
                4,
            ),
        )
    )
    return out.select(
        "type_a", "type_b", "n_a", "n_b", "n_union", "n_overlap", "jaccard"
    ).orderBy("type_a", "type_b")


AUDIENCE_OVERLAP_BITMAP_SQL = """
WITH pairs(type_a, type_b) AS (
  VALUES ('click', 'purchase'), ('view', 'click'), ('view', 'purchase')
),
u AS (SELECT DISTINCT event_type, user_id FROM events
      WHERE event_type IN ('view', 'click', 'purchase'))
SELECT type_a, type_b,
       (SELECT count(*) FROM u WHERE event_type = type_a) AS n_a,
       (SELECT count(*) FROM u WHERE event_type = type_b) AS n_b,
       (SELECT count(DISTINCT user_id) FROM u
         WHERE event_type IN (type_a, type_b)) AS n_union,
       (SELECT count(*) FROM
          (SELECT user_id FROM u WHERE event_type = type_a
           INTERSECT
           SELECT user_id FROM u WHERE event_type = type_b)) AS n_overlap,
       round(
         CAST((SELECT count(*) FROM
                (SELECT user_id FROM u WHERE event_type = type_a
                 INTERSECT
                 SELECT user_id FROM u WHERE event_type = type_b)) AS DOUBLE)
         / CAST((SELECT count(DISTINCT user_id) FROM u
                  WHERE event_type IN (type_a, type_b)) AS DOUBLE)
         + 1e-9, 4) AS jaccard
FROM pairs
ORDER BY type_a, type_b
"""


_MG_K = 25  # Misra-Gries counters per partition; hitter threshold n/K


def heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via Misra-Gries candidate pruning + exact verify —
    the sketch path for "which keys exceed a 1/K share" when the key
    cardinality is too large for a full groupBy (billions of
    distinct URLs/sessions at 100 TB, where the keyed shuffle itself
    is the bottleneck).

    Two passes, candidates-then-verify like the dedup family:

    1. **Per-partition MG sketch** (``mapInPandas``, K counters,
       batch-merged: add a batch's exact ``value_counts`` into the
       sketch, then subtract the (K+1)-th largest count and drop
       non-positives — the mergeable-summaries merge of Agarwal,
       Cormode, Huang, Phillips, Wei, Yi, "Mergeable Summaries",
       PODS 2012). Guarantee: if a key's GLOBAL count exceeds n/K,
       then on at least one partition its local count exceeds
       n_p/K (pigeonhole over Σn_p = n), and MG with K counters
       never evicts a key whose local count exceeds n_p/K — so the
       union of per-partition survivors is a SUPERSET of every true
       heavy hitter. Output of pass 1 is ≤ K·num_partitions keys.
    2. **Exact verify**: broadcast the candidate set back over the
       fact scan, count exactly, keep ``cnt·K > n`` (pure integer
       compare — no float share). The emitted counts are exact, so
       the oracle is the plain groupBy-HAVING — the sketch must be
       lossless w.r.t. the final answer for the hash to match.

    The key reuses the repo's deterministic hot-key idiom
    (``skewed_join_salted``): ``event_id%10`` maps 30% of rows to
    key 0 and 10% each to keys 1 and 2, the rest spread over
    ~uniform user ids (share ≤0.9% at every SF) — so exactly keys
    {0,1,2} clear the 1/25 = 4% bar at every SF, while the tail
    gives MG real eviction work. Native-fixture twin: on raw
    ``user_id`` the per-key share shrinks as cardinality grows with
    n (key_skew_profile pins that), which is exactly why share
    thresholds at scale are paired with a synthetic-skew proof here.

    Scale posture: pass 1 is one scan, no shuffle, O(K) state per
    partition; pass 2 is one scan + map-side broadcast semijoin and
    a groupBy over only the candidate keys (≤ K·partitions distinct)
    — the full key cardinality never shuffles.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.when(F.col("event_id") % 10 < 3, F.lit(0))
        .when(F.col("event_id") % 10 == 3, F.lit(1))
        .when(F.col("event_id") % 10 == 4, F.lit(2))
        .otherwise(F.col("user_id") + 1000)
        .alias("hkey")
    )
    k = _MG_K

    def mg(batches):
        import pandas as pd

        counters: dict[int, int] = {}
        for pdf in batches:
            for key, c in pdf["hkey"].value_counts().items():
                counters[key] = counters.get(key, 0) + int(c)
            if len(counters) > k:
                thr = sorted(counters.values(), reverse=True)[k]
                counters = {
                    kk: v - thr for kk, v in counters.items() if v > thr
                }
        if counters:
            yield pd.DataFrame({"hkey": list(counters.keys())})

    cand = ev.mapInPandas(mg, "hkey long").distinct()
    total = ev.agg(F.count("*").alias("n_total"))
    return (
        ev.join(F.broadcast(cand), "hkey")
        .groupBy("hkey")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * k > F.col("n_total"))
        .select(
            "hkey",
            "cnt",
            F.round(F.col("cnt") / F.col("n_total") + 1e-9, 6).alias("share"),
        )
        .orderBy(F.desc("cnt"), "hkey")
    )


HEAVY_HITTERS_MG_SQL = f"""
WITH keyed AS (
  SELECT CASE WHEN event_id % 10 < 3 THEN 0
              WHEN event_id % 10 = 3 THEN 1
              WHEN event_id % 10 = 4 THEN 2
              ELSE user_id + 1000 END AS hkey
  FROM events
),
c AS (SELECT hkey, count(*) AS cnt FROM keyed GROUP BY hkey),
t AS (SELECT count(*) AS n_total FROM keyed)
SELECT c.hkey, c.cnt,
       round(c.cnt / CAST(t.n_total AS DOUBLE) + 1e-9, 6) AS share
FROM c, t
WHERE c.cnt * {_MG_K} > t.n_total
ORDER BY c.cnt DESC, c.hkey
"""


_Z_BITS = 8  # bits per dimension in the interleave; z is 16 bits
_Z_BUCKET_SHIFT = 2 * _Z_BITS - 6  # keep the top 6 z-bits → 64 buckets
_EPOCH_2024 = 1704067200  # 2024-01-01 00:00:00 UTC


def _zvalue_spark(x, y):
    """Bit-interleaved Morton/Z-value of two 16-bit dimensions."""
    z = F.lit(0).cast("long")
    for i in range(_Z_BITS):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def _zvalue_sql(x: str, y: str) -> str:
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def zorder_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) multi-dimensional clustering — the data-layout
    operator behind Delta/Iceberg ``ZORDER BY``: interleave the bits
    of two scan dimensions (user id × minute-of-range) so that a
    range-partition on the z-value bounds BOTH dimensions within each
    file, and min/max footer pruning works for predicates on either
    column. A single-column sort bounds one dimension and leaves the
    other spanning the full domain in every file; the z-curve bounds
    each z-bucket to a ~2^(bits-k/2) × 2^(bits-k/2) rectangle.

    Both dimensions are first normalized to the observed 0..255 grid
    with pure integer arithmetic (``(v−min)·256 div (max−min+1)`` —
    bit-identical cross-engine, and the reason the curve stays square
    at every SF even though raw user-id and minute ranges differ by
    orders of magnitude; un-normalized Morton degenerates to a sort
    on the wider dimension). The query emits per-z-bucket stats (row
    count + integer min/max spans of both normalized dims — exactly
    portable, no float discipline): the oracle recomputes the
    identical interleave (both expression trees are generated from
    the same Python loop, `_zvalue_spark` / `_zvalue_sql`), so a
    wrong bit anywhere flips the hash. Each of the 64 buckets is a
    ≤32×32 rectangle of the 256×256 grid — a single-column sort
    would bound one dim and span ~256 on the other.
    ``test_round4b_ops.py`` additionally proves the layout property
    on real parquet files: `repartitionByRange(z)` + write, then
    per-file spans of BOTH dims ≪ the domain.

    Scale: the z-value is a codegen'd projection over broadcast
    1-row bounds (the PSI pattern — no collect); the production
    write path is one `repartitionByRange` on z — the same single
    exchange a plain sorted write costs.
    """
    raw = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("u"),
        ((F.col("ts").cast("long") - F.lit(_EPOCH_2024)) / F.lit(60))
        .cast("long")
        .alias("m"),
    )
    bounds = raw.agg(
        F.min("u").alias("u_lo"),
        F.max("u").alias("u_hi"),
        F.min("m").alias("m_lo"),
        F.max("m").alias("m_hi"),
    )
    grid = 1 << _Z_BITS
    # integer DIV on both engines — never a float transit
    ev = raw.crossJoin(F.broadcast(bounds)).select(
        F.expr(f"((u - u_lo) * {grid}) DIV (u_hi - u_lo + 1)").alias("xu"),
        F.expr(f"((m - m_lo) * {grid}) DIV (m_hi - m_lo + 1)").alias("ym"),
    )
    z = _zvalue_spark(F.col("xu"), F.col("ym"))
    return (
        ev.withColumn("bucket", F.shiftright(z, _Z_BUCKET_SHIFT))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            (F.max("xu") - F.min("xu") + 1).alias("span_user"),
            (F.max("ym") - F.min("ym") + 1).alias("span_minute"),
            F.min("xu").alias("min_user"),
            F.min("ym").alias("min_minute"),
        )
        .orderBy("bucket")
    )


ZORDER_LAYOUT_STATS_SQL = f"""
WITH raw AS (
  SELECT user_id AS u,
         (CAST(floor(epoch(ts)) AS BIGINT) - {_EPOCH_2024}) // 60 AS m
  FROM events
),
bounds AS (
  SELECT min(u) AS u_lo, max(u) AS u_hi, min(m) AS m_lo, max(m) AS m_hi
  FROM raw
),
dims AS (
  SELECT ((u - u_lo) * {1 << _Z_BITS}) // (u_hi - u_lo + 1) AS xu,
         ((m - m_lo) * {1 << _Z_BITS}) // (m_hi - m_lo + 1) AS ym
  FROM raw, bounds
),
zed AS (
  SELECT xu, ym, ({_zvalue_sql("xu", "ym")}) >> {_Z_BUCKET_SHIFT} AS bucket
  FROM dims
)
SELECT bucket,
       count(*) AS n,
       max(xu) - min(xu) + 1 AS span_user,
       max(ym) - min(ym) + 1 AS span_minute,
       min(xu) AS min_user,
       min(ym) AS min_minute
FROM zed GROUP BY bucket ORDER BY bucket
"""


def dq_rule_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectation suite (the dbt-test / Great-Expectations
    workload): six rule KINDS — not-null, uniqueness, accepted values,
    numeric range, regex format, freshness — evaluated over orders in
    ONE aggregate pass, emitting per-rule (checked, failed, passed)
    audit rows.

    Violations are PLANTED so every rule kind is exercised non-
    vacuously (the norm-outlier precedent): every 997th order re-enters
    once with a NULL custkey, its own orderkey (a duplicate), status
    'X', price ×1000 and priority '9-BOGUS' — one corrupted row trips
    five rules at once; freshness compares max(o_orderdate) against a
    fixed anchor and passes.

    Scale: all six rules fold into one scan + one aggregate —
    conditional counts combine map-side, uniqueness rides the same
    Expand as the DQ profile's exact distinct, and the result is six
    constant-size audit rows via ``stack``. Adding a rule adds a
    column, never a scan.
    """
    orders = load_table(spark, sf_dir, "orders")
    corrupt = orders.filter(F.col("o_orderkey") % 997 == 0).select(
        "o_orderkey",
        F.lit(None).cast("long").alias("o_custkey"),
        F.lit("X").alias("o_orderstatus"),
        (F.col("o_totalprice") * 1000).alias("o_totalprice"),
        "o_orderdate",
        F.lit("9-BOGUS").alias("o_orderpriority"),
    )
    full = orders.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    ).unionByName(corrupt)
    anchor = F.lit("2001-09-01").cast("date")
    wide = full.agg(
        F.count("*").alias("n"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("f_notnull"),
        (F.count("*") - F.count_distinct("o_orderkey")).alias("f_unique"),
        F.count(
            F.when(~F.col("o_orderstatus").isin("P", "O", "F"), 1)
        ).alias("f_accepted"),
        F.count(
            F.when(
                (F.col("o_totalprice") <= 0) | (F.col("o_totalprice") > 500000), 1
            )
        ).alias("f_range"),
        F.count(
            F.when(~F.col("o_orderpriority").rlike("^[1-5]-"), 1)
        ).alias("f_format"),
        F.when(
            F.datediff(anchor, F.max(F.col("o_orderdate").cast("date"))) > 60, 1
        )
        .otherwise(0)
        .cast("long")
        .alias("f_fresh"),
    )
    rules = wide.select(
        F.expr(
            "stack(6,"
            " 'not_null_custkey', n, f_notnull,"
            " 'unique_orderkey', n, f_unique,"
            " 'accepted_status', n, f_accepted,"
            " 'price_in_range', n, f_range,"
            " 'priority_format', n, f_format,"
            " 'orders_fresh_60d', CAST(1 AS BIGINT), f_fresh"
            ") AS (rule, n_checked, n_failed)"
        )
    )
    return rules.select(
        "rule", "n_checked", "n_failed", (F.col("n_failed") == 0).alias("passed")
    ).orderBy("rule")


DQ_RULE_ENGINE_SQL = """
WITH full_rel AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders
  UNION ALL
  SELECT o_orderkey, NULL AS o_custkey, 'X' AS o_orderstatus,
         o_totalprice * 1000 AS o_totalprice, o_orderdate,
         '9-BOGUS' AS o_orderpriority
  FROM orders WHERE o_orderkey % 997 = 0
),
wide AS (
  SELECT count(*) AS n,
         count(CASE WHEN o_custkey IS NULL THEN 1 END) AS f_notnull,
         count(*) - count(DISTINCT o_orderkey) AS f_unique,
         count(CASE WHEN o_orderstatus NOT IN ('P','O','F') THEN 1 END) AS f_accepted,
         count(CASE WHEN o_totalprice <= 0 OR o_totalprice > 500000 THEN 1 END) AS f_range,
         count(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-') THEN 1 END) AS f_format,
         CAST(CASE WHEN date_diff('day', CAST(max(o_orderdate) AS DATE),
                                  DATE '2001-09-01') > 60
                   THEN 1 ELSE 0 END AS BIGINT) AS f_fresh
  FROM full_rel
)
SELECT rule, n_checked, n_failed, n_failed = 0 AS passed FROM (
  SELECT 'not_null_custkey' AS rule, n AS n_checked, f_notnull AS n_failed FROM wide
  UNION ALL SELECT 'unique_orderkey', n, f_unique FROM wide
  UNION ALL SELECT 'accepted_status', n, f_accepted FROM wide
  UNION ALL SELECT 'price_in_range', n, f_range FROM wide
  UNION ALL SELECT 'priority_format', n, f_format FROM wide
  UNION ALL SELECT 'orders_fresh_60d', CAST(1 AS BIGINT), f_fresh FROM wide
)
ORDER BY rule
"""


def _hex_uniform(prefix: str, key_col: str):
    """Deterministic uniform in [0,1) from md5(prefix || key) — the
    seeded-noise idiom: the first 8 hex nibbles become an exact dyadic
    rational (each term is a ≤32-bit dyadic fraction, so the sum is
    EXACT in double — no accumulation-order sensitivity), and the same
    expression tree evaluates bit-identically in the oracle dialect
    (strpos on the same nibble alphabet)."""
    m = F.md5(F.concat(F.lit(prefix), F.col(key_col)))
    # round 13 (guide §1.2 "per-task work"): one conv() parse of the
    # 8-digit prefix replaces the former 8×(substring+instr)+7-add
    # chain. BIT-IDENTICAL to that chain AND to the oracle's strpos
    # sum: Σ digit_i·16^-i = V·2^-32 with V the 8-hex-digit integer —
    # every partial sum is an exact ≤32-bit dyadic fraction, and so is
    # V·2^-32 (verified equal over 2M keys before landing).
    return F.conv(F.substring(m, 1, 8), 16, 10).cast("double") * F.lit(2.0 ** -32)


def _hex_uniform_sql(prefix: str, key_expr: str) -> str:
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5('{prefix}' || {key_expr}), {i}, 1)) - 1) * {16.0 ** -i!r}"
        for i in range(1, 9)
    )
    return f"({terms})"


def value_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit test over the value measure —
    the classic forensic DQ screen (fabricated or unit-mangled data
    drifts from the log distribution; a uniform simulated measure like
    this fixture's deliberately FAILS it, which the χ² column shows).
    Per digit d∈1..9: observed count/share, the Benford expectation
    log₁₀(1+1/d) (Python-computed literal — identical constant both
    engines), and the χ² contribution n·(obs−exp)²/exp.

    The first digit comes from an explicit magnitude LADDER
    (CASE on [0.001,1000) decade ranges, floor division only) — never
    ``floor(log10(v))``, whose libm ULP at exact powers of ten can
    flip the decade cross-engine, and never string formatting, whose
    scientific-notation thresholds differ by dialect.

    Scale: one conditional projection + one 9-key hash aggregate —
    map-side combined, shuffle carries 9 partials per partition.
    """
    import math as _math

    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0.001)
    v = F.col("value")
    digit = (
        F.when(v >= 100.0, F.floor(v / 100.0))
        .when(v >= 10.0, F.floor(v / 10.0))
        .when(v >= 1.0, F.floor(v))
        .when(v >= 0.1, F.floor(v * 10.0))
        .when(v >= 0.01, F.floor(v * 100.0))
        .otherwise(F.floor(v * 1000.0))
    )
    obs = ev.select(digit.cast("int").alias("digit")).filter(
        F.col("digit").between(1, 9)
    )
    total = obs.agg(F.count("*").alias("tot"))
    exp_share = F.array(
        *[F.lit(_math.log10(1.0 + 1.0 / d)) for d in range(1, 10)]
    )
    return (
        obs.groupBy("digit")
        .agg(F.count("*").alias("n_obs"))
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n_obs",
            (F.round(F.col("n_obs") / F.col("tot") + 1e-9, 6) + 0.0).alias(
                "obs_share"
            ),
            F.round(F.element_at(exp_share, F.col("digit")), 6).alias("exp_share"),
            (
                F.round(
                    F.col("tot")
                    * F.pow(
                        F.col("n_obs") / F.col("tot")
                        - F.element_at(exp_share, F.col("digit")),
                        2,
                    )
                    / F.element_at(exp_share, F.col("digit"))
                    + 1e-9,
                    4,
                )
                + 0.0
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


def _benford_sql() -> str:
    import math as _math

    shares = ", ".join(repr(_math.log10(1.0 + 1.0 / d)) for d in range(1, 10))
    return f"""
WITH obs AS (
  SELECT CAST(CASE WHEN value >= 100.0 THEN floor(value / 100.0)
              WHEN value >= 10.0 THEN floor(value / 10.0)
              WHEN value >= 1.0 THEN floor(value)
              WHEN value >= 0.1 THEN floor(value * 10.0)
              WHEN value >= 0.01 THEN floor(value * 100.0)
              ELSE floor(value * 1000.0) END AS INT) AS digit
  FROM events WHERE value > 0.001
),
kept AS (SELECT digit FROM obs WHERE digit BETWEEN 1 AND 9),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS tot FROM kept),
exp AS (SELECT digit, CAST(exp_share AS DOUBLE) AS exp_share
        FROM (VALUES {", ".join(f"({d}, {repr(_math.log10(1.0 + 1.0 / d))})" for d in range(1, 10))}) e(digit, exp_share))
SELECT k.digit,
       count(*) AS n_obs,
       round(count(*) / t.tot + 1e-9, 6) + 0.0 AS obs_share,
       round(e.exp_share, 6) AS exp_share,
       round(t.tot * pow(count(*) / t.tot - e.exp_share, 2) / e.exp_share
             + 1e-9, 4) + 0.0 AS chi2_term
FROM kept k CROSS JOIN tot t JOIN exp e ON k.digit = e.digit
GROUP BY k.digit, t.tot, e.exp_share
ORDER BY k.digit
"""


VALUE_BENFORD_DIGITS_SQL = _benford_sql()


def dp_noised_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private-style aggregate release with SEEDED
    Laplace noise — the publishable-stats pass a training-data
    pipeline runs before sharing corpus composition externally
    (Dwork-McSherry-Nissim-Smith 2006: calibrate noise to sensitivity/ε).
    Per event_type: a noised count (sensitivity 1, ε=1 ⇒ b=1) and a
    noised sum of value CLAMPED to [0,100] (clamping bounds the
    per-row contribution, so sensitivity=100, b=100/ε) — clamp-then-
    noise is the standard bounded-contribution recipe.

    The noise is deterministic: u = md5(tag‖group-key) → exact dyadic
    uniform (no float-order sensitivity), Laplace via inverse CDF
    −b·sign(u−½)·ln(1−2|u−½|). Seeded noise is how production DP
    releases stay auditable/reproducible across reruns — the privacy
    accounting treats the seed as the mechanism's randomness. Both
    engines evaluate the identical expression tree, so this is also a
    conformance row for md5/strpos/ln parity.

    Scale: ONE hash aggregate (counts + clamped sums combine
    map-side); the noise is a per-group scalar expression on the
    5-row aggregate — cost is independent of corpus size.
    """
    ev = load_table(spark, sf_dir, "events")
    eps = 1.0
    agg = ev.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n_true"),
        F.sum(F.greatest(F.lit(0.0), F.least(F.lit(100.0), F.col("value")))).alias(
            "sum_clamped"
        ),
    )
    def lap(u, b):
        t = F.greatest(F.lit(1e-12), F.lit(1.0) - 2.0 * F.abs(u - 0.5))
        return -F.lit(b) * F.signum(u - 0.5) * F.log(t)

    u_c = _hex_uniform("ct|", "event_type")
    u_s = _hex_uniform("sm|", "event_type")
    return agg.select(
        "event_type",
        F.lit(eps).alias("eps"),
        (F.round(F.col("n_true") + lap(u_c, 1.0 / eps) + 1e-9, 4) + 0.0).alias(
            "n_noised"
        ),
        (
            F.round(F.col("sum_clamped") + lap(u_s, 100.0 / eps) + 1e-9, 4) + 0.0
        ).alias("sum_noised"),
    ).orderBy("event_type")


DP_NOISED_RELEASE_SQL = f"""
WITH agg AS (
  SELECT event_type,
         CAST(count(*) AS DOUBLE) AS n_true,
         sum(greatest(0.0, least(100.0, value))) AS sum_clamped
  FROM events GROUP BY event_type
),
seeded AS (
  SELECT *,
         {_hex_uniform_sql("ct|", "event_type")} AS u_c,
         {_hex_uniform_sql("sm|", "event_type")} AS u_s
  FROM agg
)
SELECT event_type,
       CAST(1.0 AS DOUBLE) AS eps,
       round(n_true
             + (-1.0) * sign(u_c - 0.5)
               * ln(greatest(1e-12, 1.0 - 2.0 * abs(u_c - 0.5)))
             + 1e-9, 4) + 0.0 AS n_noised,
       round(sum_clamped
             + (-100.0) * sign(u_s - 0.5)
               * ln(greatest(1e-12, 1.0 - 2.0 * abs(u_s - 0.5)))
             + 1e-9, 4) + 0.0 AS sum_noised
FROM seeded
ORDER BY event_type
"""


def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over a quasi-identifier tuple — the privacy
    review a dataset gets before release (Sweeney 2002): group by the
    QI (event_type × value decile band × day-of-week), measure each
    equivalence class's size k, and report how many classes/rows sit
    in each re-identification risk band (k=1 unique → directly
    re-identifiable; k<5 the conventional release floor). The
    actionable output is the % of ROWS below the floor — the mass that
    must be generalized or suppressed.

    Scale: two hash aggregates — corpus → QI classes (map-side
    combine), classes → 4 risk bands. The QI-class relation is the
    only shuffle and is bounded by the QI domain, not the corpus.
    """
    ev = load_table(spark, sf_dir, "events")
    # dow via epoch days (1970-01-01 = Thursday = 4): engine-proof —
    # dayofweek() numbering differs across dialects
    dow = F.pmod(F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01")) + 4, F.lit(7))
    qi = ev.groupBy(
        "event_type",
        F.floor(F.col("value") / 10).alias("value_band"),
        dow.alias("dow"),
    ).agg(F.count("*").alias("k"))
    band = (
        F.when(F.col("k") == 1, "1_unique")
        .when(F.col("k") < 5, "2_under_floor")
        .when(F.col("k") < 10, "3_small")
        .otherwise("4_safe")
    )
    total = qi.agg(F.sum("k").alias("tot"))
    return (
        qi.select(band.alias("risk_band"), "k")
        .groupBy("risk_band")
        .agg(F.count("*").alias("n_classes"), F.sum("k").alias("n_rows"))
        .crossJoin(F.broadcast(total))
        .select(
            "risk_band",
            "n_classes",
            "n_rows",
            (F.round(F.col("n_rows") / F.col("tot") + 1e-9, 4) + 0.0).alias(
                "pct_rows"
            ),
        )
        .orderBy("risk_band")
    )


K_ANONYMITY_AUDIT_SQL = """
WITH qi AS (
  SELECT event_type,
         CAST(floor(value / 10) AS BIGINT) AS value_band,
         (CAST(ts AS DATE) - DATE '1970-01-01' + 4) % 7 AS dow,
         count(*) AS k
  FROM events GROUP BY 1, 2, 3
),
banded AS (
  SELECT CASE WHEN k = 1 THEN '1_unique'
              WHEN k < 5 THEN '2_under_floor'
              WHEN k < 10 THEN '3_small'
              ELSE '4_safe' END AS risk_band,
         k
  FROM qi
)
SELECT risk_band,
       count(*) AS n_classes,
       CAST(sum(k) AS BIGINT) AS n_rows,
       round(sum(k) / (SELECT CAST(sum(k) AS DOUBLE) FROM qi) + 1e-9, 4) + 0.0
         AS pct_rows
FROM banded
GROUP BY risk_band
ORDER BY risk_band
"""


# --------------------------------------------------------------------------
# Count–min sketch error audit (Cormode–Muthukrishnan 2005)
# --------------------------------------------------------------------------

_CMS_D = 4  # hash rows
_CMS_W = 256  # buckets per row
_CMS_TOP = 20


def events_countmin_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count–min sketch frequency estimates audited against exact
    counts for the heaviest user_ids — the sketch that answers "how
    often did key X occur?" in {D}×{W} integers no matter how large
    the stream, completing the sketch shelf next to heavy_hitters_mg
    (which finds WHO is heavy; CMS answers arbitrary point queries,
    including keys never kept in the MG summary).

    The sketch builds on the per-user count relation (one map-side-
    combinable hash agg over the corpus), then fans {D}× over DISTINCT
    users only — the md5 work is {D}·n_users, not {D}·n_events, and the
    (d, bucket) re-agg sums the per-user counts into the same
    {D}·{W}-row relation — at 100 TB the shuffle carries 1024 integers
    and the corpus is scanned once. Hashing is the repo's md5
    dyadic-uniform idiom: bucket = floor(u·{W}) is EXACTLY the first
    two hex nibbles (dyadic rationals are exact in double), so both
    engines bucket bit-identically. The audit joins the exact top-{T}
    (a TakeOrdered) against the broadcast sketch and reports est −
    exact, which the CMS one-sided guarantee keeps ≥ 0 — pinned in
    pytest; the oracle pins the exact estimates.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id")
    # round 13 (guide §2.3 "aggregate before you shuffle" / §1.2): the
    # CMS bucket is a pure function of (d, user_id), so collapse events
    # to per-user counts FIRST (one map-side-combinable hash agg), then
    # fan out and hash over the DISTINCT-user relation — D·n_users md5
    # evaluations instead of D·n_events, and the explode no longer
    # multiplies the corpus. sum(per-user count) per (d, bucket) is
    # definitionally the former count(*) per (d, bucket); the exact
    # top-{T} reads the same per-user relation instead of re-scanning.
    per_user = ev.groupBy("user_id").agg(F.count("*").alias("exact_cnt"))
    fan = per_user.withColumn(
        "d", F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1)))
    ).withColumn(
        "hkey",
        F.concat(
            F.lit("cms"),
            F.col("d").cast("string"),
            F.lit("|"),
            F.col("user_id").cast("string"),
        ),
    )
    sketch = (
        fan.withColumn(
            "bucket",
            F.floor(_hex_uniform("", "hkey") * _CMS_W).cast("long"),
        )
        .groupBy("d", "bucket")
        .agg(F.sum("exact_cnt").alias("c"))
    )
    top = per_user.orderBy(F.desc("exact_cnt"), "user_id").limit(_CMS_TOP)
    probes = (
        top.withColumn(
            "d", F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1)))
        )
        .withColumn(
            "hkey",
            F.concat(
                F.lit("cms"),
                F.col("d").cast("string"),
                F.lit("|"),
                F.col("user_id").cast("string"),
            ),
        )
        .withColumn(
            "bucket", F.floor(_hex_uniform("", "hkey") * _CMS_W).cast("long")
        )
    )
    est = (
        probes.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("user_id", "exact_cnt")
        .agg(F.min("c").alias("cms_est"))
    )
    return est.select(
        "user_id",
        "exact_cnt",
        "cms_est",
        (F.col("cms_est") - F.col("exact_cnt")).alias("overestimate"),
    ).orderBy(F.desc("exact_cnt"), "user_id")


events_countmin_audit.__doc__ = events_countmin_audit.__doc__.format(
    D=_CMS_D, W=_CMS_W, T=_CMS_TOP
)


def _cms_bucket_sql(key_expr: str) -> str:
    return (
        f"CAST(floor({_hex_uniform_sql('', key_expr)} * {_CMS_W}) AS BIGINT)"
    )


_CMS_KEY = (
    "'cms' || CAST(t.d AS VARCHAR) || '|' || CAST(user_id AS VARCHAR)"
)

EVENTS_COUNTMIN_AUDIT_SQL = f"""
WITH fan AS (
  SELECT e.user_id, t.d,
         {_cms_bucket_sql(_CMS_KEY)} AS bucket
  FROM events e CROSS JOIN (SELECT unnest(range({_CMS_D})) AS d) t
),
sketch AS (
  SELECT d, bucket, count(*) AS c FROM fan GROUP BY d, bucket
),
top_keys AS (
  SELECT user_id, count(*) AS exact_cnt
  FROM events GROUP BY user_id
  ORDER BY exact_cnt DESC, user_id
  LIMIT {_CMS_TOP}
),
probes AS (
  SELECT k.user_id, k.exact_cnt, t.d,
         {_cms_bucket_sql(_CMS_KEY)} AS bucket
  FROM top_keys k CROSS JOIN (SELECT unnest(range({_CMS_D})) AS d) t
),
est AS (
  SELECT p.user_id, p.exact_cnt, min(s.c) AS cms_est
  FROM probes p JOIN sketch s ON p.d = s.d AND p.bucket = s.bucket
  GROUP BY p.user_id, p.exact_cnt
)
SELECT user_id,
       CAST(exact_cnt AS BIGINT) AS exact_cnt,
       CAST(cms_est AS BIGINT) AS cms_est,
       CAST(cms_est - exact_cnt AS BIGINT) AS overestimate
FROM est ORDER BY exact_cnt DESC, user_id
"""


def docs_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the reference corpus half
    (even doc_id — the "training snapshot") and the incoming half (odd
    doc_id) over fixed-width document-length bins — THE standard
    drift monitor a training-data pipeline runs before admitting a new
    crawl batch (PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25 break).

    Determinism: fixed-width bins (n_chars // 100 — no quantile
    estimation), Laplace-smoothed shares over the observed-bin count B
    (p = (cnt+1)/(N+B), exact rationals), one ln() per bin rounded 6dp
    under the shared nudge. Output: per-bin counts + PSI term + the
    total PSI repeated (window sum over the bounded bin relation).

    Scale: one corpus pass to (side, bin) integer counts (map-side
    combinable), everything after is bin-bounded.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        (F.col("doc_id") % 2 == 0).cast("int").alias("is_ref"),
        (F.col("n_chars") / 100).cast("long").alias("bin"),
    )
    counts = docs.groupBy("bin").agg(
        F.sum("is_ref").alias("n_ref"),
        F.sum(1 - F.col("is_ref")).alias("n_cur"),
    )
    tot = counts.agg(
        F.sum("n_ref").alias("t_ref"),
        F.sum("n_cur").alias("t_cur"),
        F.count("*").alias("b"),
    )
    terms = counts.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_ref",
        "n_cur",
        (
            F.round(
                (
                    (F.col("n_cur") + 1) / (F.col("t_cur") + F.col("b"))
                    - (F.col("n_ref") + 1) / (F.col("t_ref") + F.col("b"))
                )
                * F.log(
                    ((F.col("n_cur") + 1) / (F.col("t_cur") + F.col("b")))
                    / ((F.col("n_ref") + 1) / (F.col("t_ref") + F.col("b")))
                )
                + 1e-9,
                6,
            )
            + 0.0
        ).alias("psi_term"),
    )
    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        terms.withColumn(
            "psi_total", (F.round(F.sum("psi_term").over(w) + 1e-9, 6) + 0.0)
        )
        .orderBy("bin")
    )


DOCS_PSI_DRIFT_SQL = """
WITH counts AS (
  SELECT CAST(n_chars // 100 AS BIGINT) AS bin,
         count(CASE WHEN doc_id % 2 = 0 THEN 1 END) AS n_ref,
         count(CASE WHEN doc_id % 2 <> 0 THEN 1 END) AS n_cur
  FROM documents GROUP BY 1
),
tot AS (
  SELECT CAST(sum(n_ref) AS BIGINT) AS t_ref,
         CAST(sum(n_cur) AS BIGINT) AS t_cur,
         count(*) AS b
  FROM counts
),
terms AS (
  SELECT bin, n_ref, n_cur,
         round(
           ((n_cur + 1) / CAST(t_cur + b AS DOUBLE)
            - (n_ref + 1) / CAST(t_ref + b AS DOUBLE))
           * ln(((n_cur + 1) / CAST(t_cur + b AS DOUBLE))
                / ((n_ref + 1) / CAST(t_ref + b AS DOUBLE)))
           + 1e-9, 6) + 0.0 AS psi_term
  FROM counts CROSS JOIN tot
)
SELECT bin, n_ref, n_cur, psi_term,
       round(sum(psi_term) OVER () + 1e-9, 6) + 0.0 AS psi_total
FROM terms ORDER BY bin
"""



_RI_ORPHAN_MOD = 97  # every 97th child key is planted as an orphan


def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over the warehouse FK graph — the
    expectations-suite check every ingest gate runs (orphaned facts
    silently vanish from inner joins; this table is how you notice
    BEFORE the revenue report is wrong). One row per FK edge:
    child cardinality, orphan count, orphan rate.

    The fixture is referentially clean, so each child leg PLANTS
    deterministic orphans (key negated where key % {M} == 0 — the
    planted-fixture discipline of the null/near-dup conformance rows)
    to prove the counting machinery; an all-zero audit proves nothing.

    Shape per leg: child keys aggregate FIRST (distinct-key relation,
    domain-bounded), then anti-join the parent key set — the orphan
    check never shuffles the fact table against the parent, and the
    nation/region parents broadcast. Orphan counts are weighted back
    by per-key child multiplicity so the rate is row-accurate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    def plant(df: DataFrame, key: str) -> DataFrame:
        return df.withColumn(
            key,
            F.when(
                F.col(key) % _RI_ORPHAN_MOD == 0, -F.col(key) - 1
            ).otherwise(F.col(key)),
        )

    def leg(
        name: str, child: DataFrame, ckey: str, parent: DataFrame, pkey: str
    ) -> DataFrame:
        ckeys = (
            plant(child.select(F.col(ckey).cast("long").alias("k")), "k")
            .groupBy("k")
            .agg(F.count("*").alias("n_rows"))
        )
        pkeys = parent.select(F.col(pkey).cast("long").alias("k")).distinct()
        orphans = ckeys.join(pkeys, "k", "left_anti").agg(
            F.coalesce(F.sum("n_rows"), F.lit(0)).alias("n_orphans")
        )
        totals = ckeys.agg(F.sum("n_rows").alias("n_child"))
        return totals.crossJoin(orphans).select(
            F.lit(name).alias("fk"),
            F.col("n_child").cast("long").alias("n_child"),
            F.col("n_orphans").cast("long").alias("n_orphans"),
            (
                F.round(F.col("n_orphans") / F.col("n_child") + 1e-9, 6)
                + 0.0
            ).alias("orphan_rate"),
        )

    legs = [
        leg("lineitem.orderkey->orders", li, "l_orderkey", orders, "o_orderkey"),
        leg("lineitem.partkey->part", li, "l_partkey", part, "p_partkey"),
        leg("lineitem.suppkey->supplier", li, "l_suppkey", supp, "s_suppkey"),
        leg("orders.custkey->customer", orders, "o_custkey", cust, "c_custkey"),
        leg("customer.nationkey->nation", cust, "c_nationkey", nation, "n_nationkey"),
        leg("supplier.nationkey->nation", supp, "s_nationkey", nation, "n_nationkey"),
        leg("nation.regionkey->region", nation, "n_regionkey", region, "r_regionkey"),
    ]
    out = legs[0]
    for l in legs[1:]:
        out = out.unionByName(l)
    return out.orderBy("fk")


referential_integrity_audit.__doc__ = referential_integrity_audit.__doc__.format(
    M=_RI_ORPHAN_MOD
)


def _ri_leg_sql(name, child, ckey, parent, pkey):
    return f"""
SELECT '{name}' AS fk,
       CAST(sum(n_rows) AS BIGINT) AS n_child,
       CAST(coalesce(sum(CASE WHEN p.k IS NULL THEN n_rows END), 0) AS BIGINT)
         AS n_orphans,
       round(coalesce(sum(CASE WHEN p.k IS NULL THEN n_rows END), 0)
             / CAST(sum(n_rows) AS DOUBLE) + 1e-9, 6) + 0.0 AS orphan_rate
FROM (
  SELECT CASE WHEN CAST({ckey} AS BIGINT) % {_RI_ORPHAN_MOD} = 0
              THEN -CAST({ckey} AS BIGINT) - 1
              ELSE CAST({ckey} AS BIGINT) END AS k,
         count(*) AS n_rows
  FROM {child} GROUP BY 1
) c
LEFT JOIN (SELECT DISTINCT CAST({pkey} AS BIGINT) AS k FROM {parent}) p
  USING (k)"""


REFERENTIAL_INTEGRITY_AUDIT_SQL = (
    _ri_leg_sql("lineitem.orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey")
    + " UNION ALL "
    + _ri_leg_sql("lineitem.partkey->part", "lineitem", "l_partkey", "part", "p_partkey")
    + " UNION ALL "
    + _ri_leg_sql("lineitem.suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey")
    + " UNION ALL "
    + _ri_leg_sql("orders.custkey->customer", "orders", "o_custkey", "customer", "c_custkey")
    + " UNION ALL "
    + _ri_leg_sql("customer.nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey")
    + " UNION ALL "
    + _ri_leg_sql("supplier.nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey")
    + " UNION ALL "
    + _ri_leg_sql("nation.regionkey->region", "nation", "n_regionkey", "region", "r_regionkey")
    + " ORDER BY fk"
)



def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — k-anonymity's mandatory companion
    (Machanavajjhala et al. 2007): a k-safe equivalence class whose
    SENSITIVE attribute is homogeneous still discloses it (everyone
    in the class did the same thing). Over the (value band x
    day-of-week) quasi-identifier classes, l = distinct sensitive
    values (event_type) per class; report the class/row mass per
    diversity band — l=1 is attribute disclosure outright, l<3 the
    conventional floor.

    Same two-hash-aggregate shape as ``k_anonymity_audit``: corpus →
    QI classes (the only corpus shuffle, bounded by the QI domain),
    classes → 3 diversity bands.
    """
    ev = load_table(spark, sf_dir, "events")
    dow = F.pmod(
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01")) + 4,
        F.lit(7),
    )
    qi = ev.groupBy(
        F.floor(F.col("value") / 10).alias("value_band"),
        dow.alias("dow"),
    ).agg(
        F.count("*").alias("k"),
        F.countDistinct("event_type").alias("l"),
    )
    band = (
        F.when(F.col("l") == 1, "1_homogeneous")
        .when(F.col("l") < 3, "2_under_floor")
        .otherwise("3_diverse")
    )
    total = qi.agg(F.sum("k").alias("tot"))
    return (
        qi.select(band.alias("diversity_band"), "k", "l")
        .groupBy("diversity_band")
        .agg(
            F.count("*").alias("n_classes"),
            F.sum("k").alias("n_rows"),
            F.min("l").cast("long").alias("min_l"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "diversity_band",
            "n_classes",
            "n_rows",
            "min_l",
            (F.round(F.col("n_rows") / F.col("tot") + 1e-9, 4) + 0.0).alias(
                "pct_rows"
            ),
        )
        .orderBy("diversity_band")
    )


L_DIVERSITY_AUDIT_SQL = """
WITH qi AS (
  SELECT CAST(floor(value / 10) AS BIGINT) AS value_band,
         (CAST(ts AS DATE) - DATE '1970-01-01' + 4) % 7 AS dow,
         count(*) AS k,
         count(DISTINCT event_type) AS l
  FROM events GROUP BY 1, 2
),
banded AS (
  SELECT CASE WHEN l = 1 THEN '1_homogeneous'
              WHEN l < 3 THEN '2_under_floor'
              ELSE '3_diverse' END AS diversity_band,
         k, l
  FROM qi
)
SELECT diversity_band,
       count(*) AS n_classes,
       CAST(sum(k) AS BIGINT) AS n_rows,
       CAST(min(l) AS BIGINT) AS min_l,
       round(sum(k) / (SELECT CAST(sum(k) AS DOUBLE) FROM qi) + 1e-9, 4) + 0.0
         AS pct_rows
FROM banded
GROUP BY diversity_band
ORDER BY diversity_band
"""


def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the third leg of the release-privacy triad
    (Li, Li & Venkatasubramanian 2007) next to ``k_anonymity_audit``
    and ``l_diversity_audit``: a class can be k-large AND l-diverse
    yet still leak if its sensitive-value DISTRIBUTION differs sharply
    from the global one (skewness attack — "3 distinct diagnoses" is
    no comfort when 90% of the class is the rare one). Per QI class
    (value band × day-of-week), t = total-variation distance between
    the class's event_type distribution and the corpus-wide one (EMD
    with the categorical ground distance collapses to TVD).

    Exact-integer band algebra (the Gopher-gate discipline): with
    k_c = |class|, G = |corpus|, the un-normalized mass
    num_c = Σ_types |cnt_ct·G − g_t·k_c| (absent types contribute
    g_t·k_c, folded in via G − Σ_present g_t) gives
    t_c = num_c / (2·k_c·G), so the band cuts t ≤ 0.15 / ≤ 0.35
    become the INTEGER comparisons 10·num ≤ 3·kG / 10·num ≤ 7·kG —
    no float boundary can flip a class across engines; the displayed
    t is a 6dp-rounded ratio of exact integers.

    Scale: one corpus shuffle to the (class × type) counts (bounded
    by the QI×type domain, map-side combinable); the global type
    vector and the scalar G are broadcast 1-row/bounded joins.
    Overflow note: the integer products are O(cnt·G) ≤ G², which
    fits int64 through ~3×10⁹ rows; a 100 TB deployment (10¹²-row G)
    promotes the band comparisons to decimal(38,0) — same algebra,
    still exact — or divides both sides by gcd(k, G) first.
    """
    ev = load_table(spark, sf_dir, "events")
    dow = F.pmod(
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01")) + 4,
        F.lit(7),
    )
    ct = ev.groupBy(
        F.floor(F.col("value") / 10).alias("value_band"),
        dow.alias("dow"),
        "event_type",
    ).agg(F.count("*").alias("cnt"))
    g = ct.groupBy("event_type").agg(F.sum("cnt").alias("g"))
    big_g = g.agg(F.sum("g").cast("long").alias("big_g"))
    kc = ct.groupBy("value_band", "dow").agg(
        F.sum("cnt").cast("long").alias("k")
    )
    per_class = (
        ct.join(kc, ["value_band", "dow"])
        .join(F.broadcast(g), "event_type")
        .crossJoin(F.broadcast(big_g))
        .groupBy("value_band", "dow")
        .agg(
            F.max("k").alias("k"),
            F.max("big_g").alias("big_g"),
            F.sum(
                F.abs(F.col("cnt") * F.col("big_g") - F.col("g") * F.col("k"))
            ).alias("present_mass"),
            F.sum("g").alias("g_present"),
        )
        .select(
            "k",
            "big_g",
            (
                F.col("present_mass")
                + (F.col("big_g") - F.col("g_present")) * F.col("k")
            ).alias("num"),
        )
    )
    # t = num/(2kG), so t <= 0.15 <=> num <= 0.3*k*G <=> 10*num <= 3*k*G
    band = (
        F.when(F.lit(10) * F.col("num") <= 3 * F.col("k") * F.col("big_g"), "1_close")
        .when(F.lit(10) * F.col("num") <= 7 * F.col("k") * F.col("big_g"), "2_moderate")
        .otherwise("3_distant")
    )
    total = per_class.agg(F.sum("k").alias("tot"))
    return (
        per_class.select(
            band.alias("closeness_band"),
            "k",
            (F.col("num") / (F.lit(2.0) * F.col("k") * F.col("big_g"))).alias(
                "t"
            ),
        )
        .groupBy("closeness_band")
        .agg(
            F.count("*").alias("n_classes"),
            F.sum("k").alias("n_rows"),
            (F.round(F.max("t") + 1e-9, 6) + 0.0).alias("max_t"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "closeness_band",
            "n_classes",
            "n_rows",
            "max_t",
            (F.round(F.col("n_rows") / F.col("tot") + 1e-9, 4) + 0.0).alias(
                "pct_rows"
            ),
        )
        .orderBy("closeness_band")
    )


T_CLOSENESS_AUDIT_SQL = """
WITH ct AS (
  SELECT CAST(floor(value / 10) AS BIGINT) AS value_band,
         (CAST(ts AS DATE) - DATE '1970-01-01' + 4) % 7 AS dow,
         event_type,
         count(*) AS cnt
  FROM events GROUP BY 1, 2, 3
),
g AS (SELECT event_type, sum(cnt) AS g FROM ct GROUP BY event_type),
big_g AS (SELECT CAST(sum(g) AS BIGINT) AS big_g FROM g),
kc AS (
  SELECT value_band, dow, CAST(sum(cnt) AS BIGINT) AS k
  FROM ct GROUP BY value_band, dow
),
per_class AS (
  SELECT max(kc.k) AS k,
         max(big_g.big_g) AS big_g,
         sum(abs(ct.cnt * big_g.big_g - g.g * kc.k))
           + (max(big_g.big_g) - sum(g.g)) * max(kc.k) AS num
  FROM ct
  JOIN kc ON ct.value_band = kc.value_band AND ct.dow = kc.dow
  JOIN g ON ct.event_type = g.event_type
  CROSS JOIN big_g
  GROUP BY ct.value_band, ct.dow
),
banded AS (
  SELECT CASE WHEN 10 * num <= 3 * k * big_g THEN '1_close'
              WHEN 10 * num <= 7 * k * big_g THEN '2_moderate'
              ELSE '3_distant' END AS closeness_band,
         k,
         num / (2.0 * k * big_g) AS t
  FROM per_class
)
SELECT closeness_band,
       count(*) AS n_classes,
       CAST(sum(k) AS BIGINT) AS n_rows,
       round(max(t) + 1e-9, 6) + 0.0 AS max_t,
       round(sum(k) / (SELECT CAST(sum(k) AS DOUBLE) FROM per_class)
             + 1e-9, 4) + 0.0 AS pct_rows
FROM banded
GROUP BY closeness_band
ORDER BY closeness_band
"""


QUERIES = {
    "referential_integrity_audit": referential_integrity_audit,
    "t_closeness_audit": t_closeness_audit,
    "l_diversity_audit": l_diversity_audit,
    "docs_psi_drift": docs_psi_drift,
    "dq_rule_engine": dq_rule_engine,
    "events_countmin_audit": events_countmin_audit,
    "dp_noised_release": dp_noised_release,
    "k_anonymity_audit": k_anonymity_audit,
    "value_benford_digits": value_benford_digits,
    "audience_overlap_bitmap": audience_overlap_bitmap,
    "orders_dq_profile": orders_dq_profile,
    "heavy_hitters_mg": heavy_hitters_mg,
    "zorder_layout_stats": zorder_layout_stats,
    "key_skew_profile": key_skew_profile,
    "daily_users_bitmap_rollup": daily_users_bitmap_rollup,
    "value_mad_outliers": value_mad_outliers,
    "value_winsorized_stats": value_winsorized_stats,
    "value_distribution_psi": value_distribution_psi,
    "events_schema_drift": events_schema_drift,
    "value_equidepth_histogram": value_equidepth_histogram,
    "value_equidepth_scalable": value_equidepth_scalable,
    # rows-only by design: sketch binaries are engine-specific; the
    # within_bound self-check column carries the invariant instead
    "daily_users_hll_rollup": daily_users_hll_rollup,
}

ORACLES = {
    "referential_integrity_audit": REFERENTIAL_INTEGRITY_AUDIT_SQL,
    "t_closeness_audit": T_CLOSENESS_AUDIT_SQL,
    "l_diversity_audit": L_DIVERSITY_AUDIT_SQL,
    "docs_psi_drift": DOCS_PSI_DRIFT_SQL,
    "events_countmin_audit": EVENTS_COUNTMIN_AUDIT_SQL,
    "dp_noised_release": DP_NOISED_RELEASE_SQL,
    "k_anonymity_audit": K_ANONYMITY_AUDIT_SQL,
    "value_benford_digits": VALUE_BENFORD_DIGITS_SQL,
    "dq_rule_engine": DQ_RULE_ENGINE_SQL,
    "audience_overlap_bitmap": AUDIENCE_OVERLAP_BITMAP_SQL,
    "orders_dq_profile": ORDERS_DQ_PROFILE_SQL,
    "heavy_hitters_mg": HEAVY_HITTERS_MG_SQL,
    "zorder_layout_stats": ZORDER_LAYOUT_STATS_SQL,
    "key_skew_profile": KEY_SKEW_PROFILE_SQL,
    "daily_users_bitmap_rollup": DAILY_USERS_BITMAP_ROLLUP_SQL,
    "value_mad_outliers": VALUE_MAD_OUTLIERS_SQL,
    "value_distribution_psi": VALUE_DISTRIBUTION_PSI_SQL,
    "value_winsorized_stats": VALUE_WINSORIZED_STATS_SQL,
    "events_schema_drift": EVENTS_SCHEMA_DRIFT_SQL,
    "value_equidepth_histogram": VALUE_EQUIDEPTH_HISTOGRAM_SQL,
    "value_equidepth_scalable": VALUE_EQUIDEPTH_SCALABLE_SQL,
}
