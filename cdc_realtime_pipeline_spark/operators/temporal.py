"""Temporal joins Spark has no native operator for: as-of and range.

Both follow the composition strategy (SURVEY/guide: "compose existing
DataFrame ops if semantics allow" before reaching for pandas):

* **as-of join** — union the two sides with a tag, one window pass
  carrying the last reference row forward per key. One shuffle on
  (key), no per-row probing, no ``merge_asof`` Python loop — the
  partition-parallel formulation that survives 100 TB. (A
  ``pd.merge_asof``-per-group ``applyInPandas`` fallback exists for
  semantics the window form can't express, e.g. nearest-not-backward.)
* **range join** — non-equi predicate against a tiny bands relation;
  broadcast nested-loop on the broadcast side only. For fact×fact
  ranges, bucketize the range key and equi-join on bucket first (the
  standard pruning), which `bucketized_range_join` demonstrates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdc_realtime_pipeline_spark.session import load_table


def asof_join_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase event: the user's most recent click at-or-
    before it (classic trades⟕quotes as-of shape).

    Union-and-carry-forward: tag rows, sort per key by (ts, tiebreak),
    ``last(struct, ignorenulls)`` over the preceding frame. The carried
    value rides inside a struct keyed on *click rows* (not on non-null
    values), so a most-recent click whose value is NULL correctly
    yields NULL instead of falling back to an older click's value —
    the oracle's LIMIT-1 subquery semantics.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        "event_id",
        F.struct(F.col("value").alias("v")).alias("click"),
        F.lit(0).alias("is_p"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("struct<v:double>").alias("click"),
        F.lit(1).alias("is_p"),
    )
    unioned = clicks.unionByName(purchases)
    # clicks sort before purchases at identical ts (is_p ASC) so a
    # click at the same instant is visible to the purchase — match the
    # oracle's `<=` semantics
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "last_click", F.last("click", ignorenulls=True).over(w)
    )
    return (
        carried.filter(F.col("is_p") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.round(F.col("last_click.v"), 4).alias("last_click_value"),
        )
    )


ASOF_JOIN_LAST_CLICK_SQL = """
SELECT p.user_id,
       p.event_id AS purchase_id,
       round((SELECT c.value FROM events c
              WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
              ORDER BY c.ts DESC, c.event_id DESC LIMIT 1), 4) AS last_click_value
FROM events p
WHERE p.event_type = 'purchase'
"""


def quantity_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: lineitems classified into quantity bands via a
    non-equi join against a 4-row bands dimension (broadcast)."""
    bands = spark.createDataFrame(
        [("tiny", 0.0, 10.0), ("small", 10.0, 25.0), ("mid", 25.0, 40.0), ("large", 40.0, 1e9)],
        "band string, lo double, hi double",
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(
            F.broadcast(bands),
            (li.l_quantity >= bands.lo) & (li.l_quantity < bands.hi),
        )
        .groupBy("band")
        .agg(F.count("*").alias("n"), F.round(F.avg("l_extendedprice"), 4).alias("avg_price"))
    )


QUANTITY_BAND_JOIN_SQL = """
WITH bands(band, lo, hi) AS (
  VALUES ('tiny', CAST(0 AS DOUBLE), CAST(10 AS DOUBLE)),
         ('small', CAST(10 AS DOUBLE), CAST(25 AS DOUBLE)),
         ('mid', CAST(25 AS DOUBLE), CAST(40 AS DOUBLE)),
         ('large', CAST(40 AS DOUBLE), CAST(1e9 AS DOUBLE))
)
SELECT band, count(*) AS n, round(avg(l_extendedprice), 4) AS avg_price
FROM lineitem JOIN bands ON l_quantity >= lo AND l_quantity < hi
GROUP BY band
"""


def bucketized_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fact×fact range-join pruning pattern: equi-join on a
    coarsened bucket of the range key, then filter the exact predicate.

    Joins each event to *other* events of the same user within ±30
    minutes (a self interval join). Buckets of 30 min mean a pair can
    only match inside the same or adjacent buckets — the explode is 3
    bucket keys per left row, turning an O(n²) time-range probe into an
    equi-join with bounded fan-out.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    bucket = 30 * 60 * 1_000_000
    left = ev.withColumn(
        "bkt", F.explode(F.array(*[(F.col("us") / bucket).cast("long") + i for i in (-1, 0, 1)]))
    )
    right = ev.withColumn("r_bkt", (F.col("us") / bucket).cast("long")).select(
        F.col("user_id").alias("r_user"),
        F.col("event_id").alias("r_id"),
        F.col("us").alias("r_us"),
        "r_bkt",
    )
    pairs = left.join(
        right,
        (F.col("bkt") == F.col("r_bkt"))
        & (F.col("user_id") == F.col("r_user"))
        & (F.col("event_id") != F.col("r_id"))
        & (F.abs(F.col("us") - F.col("r_us")) <= bucket),
        "inner",
    )
    return pairs.groupBy("user_id").agg(
        F.count("*").alias("n_pairs"),
    )


BUCKETIZED_RANGE_JOIN_SQL = """
SELECT a.user_id, count(*) AS n_pairs
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_id != b.event_id
 AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 30 * 60 * 1000000
GROUP BY a.user_id
"""


_ASOF_TOL_MS = 30 * 60 * 1000


def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-as-of join with tolerance — ``pd.merge_asof(...,
    direction='nearest', tolerance=30min)`` semantics, but as TWO
    window carries over ONE sort instead of a per-group Python loop:
    for each purchase, the closest click within ±30 min in either
    direction (tie → the earlier / backward click).

    Union-and-carry both ways: the backward candidate is the standard
    last-non-null over the preceding frame; the forward candidate is
    first-non-null over the following frame. Both windows share
    partitioning (user) AND ordering, so Catalyst plans one Exchange +
    one Sort feeding two Window nodes — the whole bidirectional
    nearest join costs the same shuffle as the backward-only as-of.
    Equal-timestamp clicks sort before the purchase (is_p ASC) and are
    therefore backward candidates at distance 0, matching the oracle's
    ``<=`` / ``>`` split.
    """
    ev = load_table(spark, sf_dir, "events")
    click_struct = F.struct(
        F.col("ts").alias("cts"), F.col("event_id").alias("cid"),
        F.col("value").alias("v"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id",
        click_struct.alias("click"), F.lit(0).alias("is_p"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id",
        F.lit(None).cast("struct<cts:timestamp,cid:bigint,v:double>").alias("click"),
        F.lit(1).alias("is_p"),
    )
    unioned = clicks.unionByName(purchases)
    order = [F.col("ts"), F.col("is_p"), F.col("event_id")]
    w_b = (
        Window.partitionBy("user_id").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_f = (
        Window.partitionBy("user_id").orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    carried = unioned.select(
        "user_id", "ts", "event_id", "is_p",
        F.last("click", ignorenulls=True).over(w_b).alias("bwd"),
        F.first("click", ignorenulls=True).over(w_f).alias("fwd"),
    )
    p = carried.filter(F.col("is_p") == 1)
    bwd_diff = F.unix_millis("ts") - F.unix_millis("bwd.cts")
    fwd_diff = F.unix_millis("fwd.cts") - F.unix_millis("ts")
    b_ok = F.col("bwd").isNotNull() & (bwd_diff <= _ASOF_TOL_MS)
    f_ok = F.col("fwd").isNotNull() & (fwd_diff <= _ASOF_TOL_MS)
    use_b = b_ok & (~f_ok | (bwd_diff <= fwd_diff))
    use_f = f_ok & ~use_b
    return p.select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.when(use_b, F.lit("b")).when(use_f, F.lit("f")).alias("direction"),
        F.when(use_b, F.col("bwd.cid")).when(use_f, F.col("fwd.cid")).alias(
            "click_id"
        ),
        F.when(use_b, bwd_diff).when(use_f, fwd_diff).alias("gap_ms"),
        F.round(
            F.when(use_b, F.col("bwd.v")).when(use_f, F.col("fwd.v")), 4
        ).alias("click_value"),
    )


ASOF_JOIN_NEAREST_SQL = """
WITH p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
cand AS (
  SELECT p.user_id, p.event_id AS purchase_id,
         (SELECT {'cid': c.event_id, 'gap': epoch_ms(p.ts) - epoch_ms(c.ts), 'v': c.value}
          FROM events c
          WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
          ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS b,
         (SELECT {'cid': c.event_id, 'gap': epoch_ms(c.ts) - epoch_ms(p.ts), 'v': c.value}
          FROM events c
          WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts > p.ts
          ORDER BY c.ts ASC, c.event_id ASC LIMIT 1) AS f
  FROM p
),
flags AS (
  SELECT user_id, purchase_id, b, f,
         b IS NOT NULL AND b['gap'] <= __TOL__ AS b_ok,
         f IS NOT NULL AND f['gap'] <= __TOL__ AS f_ok
  FROM cand
),
chosen AS (
  SELECT user_id, purchase_id, b, f, b_ok, f_ok,
         b_ok AND (NOT f_ok OR b['gap'] <= f['gap']) AS use_b,
         f_ok AND NOT (b_ok AND (NOT f_ok OR b['gap'] <= f['gap'])) AS use_f
  FROM flags
)
SELECT user_id, purchase_id,
       CASE WHEN use_b THEN 'b' WHEN use_f THEN 'f' END AS direction,
       CASE WHEN use_b THEN b['cid'] WHEN use_f THEN f['cid'] END AS click_id,
       CASE WHEN use_b THEN b['gap'] WHEN use_f THEN f['gap'] END AS gap_ms,
       round(CASE WHEN use_b THEN b['v'] WHEN use_f THEN f['v'] END, 4)
         AS click_value
FROM chosen
""".replace("__TOL__", str(_ASOF_TOL_MS))


def allen_interval_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allen's interval algebra conformance sweep (Allen 1983 — the
    closed set of 13 mutually exclusive relations two intervals can
    stand in): per user, each event type's activity interval is
    [min ts, max ts]; every within-user type pair (a < b lexically) is
    classified into exactly one relation and the corpus-wide counts
    per relation are reported. Completes the temporal-join family
    (as-of, range/bucketized, point-in-time): those operators each
    IMPLEMENT one or two of these relations — this row pins the full
    taxonomy's decision logic on both engines.

    Determinism: timestamps compare as exact epoch-micros integers; a
    single ORDERED CASE (equals → meets → met_by → starts →
    started_by → finishes → finished_by → during → contains →
    overlaps → overlapped_by → before → after) classifies each pair,
    identical text on both engines, so degenerate (point) intervals —
    where Allen's proper-interval conditions can coincide — resolve to
    the same branch everywhere.

    Scale: one corpus pass to (user, type) min/max intervals
    (map-side combinable), then a per-user type-pair self-join —
    bounded by |types|² per user, never corpus² — and a 13-key count.
    """
    ev = load_table(spark, sf_dir, "events")
    iv = ev.groupBy("user_id", "event_type").agg(
        F.min(F.unix_micros("ts")).alias("s"),
        F.max(F.unix_micros("ts")).alias("e"),
    )
    a = iv.select(
        "user_id",
        F.col("event_type").alias("ta"),
        F.col("s").alias("s1"),
        F.col("e").alias("e1"),
    )
    b = iv.select(
        "user_id",
        F.col("event_type").alias("tb"),
        F.col("s").alias("s2"),
        F.col("e").alias("e2"),
    )
    pairs = a.join(b, "user_id").filter(F.col("ta") < F.col("tb"))
    rel = F.expr(
        """CASE
             WHEN s1 = s2 AND e1 = e2 THEN 'equals'
             WHEN e1 = s2 THEN 'meets'
             WHEN e2 = s1 THEN 'met_by'
             WHEN s1 = s2 AND e1 < e2 THEN 'starts'
             WHEN s1 = s2 AND e1 > e2 THEN 'started_by'
             WHEN e1 = e2 AND s1 > s2 THEN 'finishes'
             WHEN e1 = e2 AND s1 < s2 THEN 'finished_by'
             WHEN s1 > s2 AND e1 < e2 THEN 'during'
             WHEN s1 < s2 AND e1 > e2 THEN 'contains'
             WHEN s1 < s2 AND e1 > s2 AND e1 < e2 THEN 'overlaps'
             WHEN s2 < s1 AND e2 > s1 AND e2 < e1 THEN 'overlapped_by'
             WHEN e1 < s2 THEN 'before'
             ELSE 'after'
           END"""
    )
    return (
        pairs.select(rel.alias("relation"))
        .groupBy("relation")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("relation")
    )


ALLEN_INTERVAL_RELATIONS_SQL = """
WITH iv AS (
  SELECT user_id, event_type,
         min(epoch_us(ts)) AS s, max(epoch_us(ts)) AS e
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.s AS s1, a.e AS e1, b.s AS s2, b.e AS e2
  FROM iv a JOIN iv b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
)
SELECT CASE
         WHEN s1 = s2 AND e1 = e2 THEN 'equals'
         WHEN e1 = s2 THEN 'meets'
         WHEN e2 = s1 THEN 'met_by'
         WHEN s1 = s2 AND e1 < e2 THEN 'starts'
         WHEN s1 = s2 AND e1 > e2 THEN 'started_by'
         WHEN e1 = e2 AND s1 > s2 THEN 'finishes'
         WHEN e1 = e2 AND s1 < s2 THEN 'finished_by'
         WHEN s1 > s2 AND e1 < e2 THEN 'during'
         WHEN s1 < s2 AND e1 > e2 THEN 'contains'
         WHEN s1 < s2 AND e1 > s2 AND e1 < e2 THEN 'overlaps'
         WHEN s2 < s1 AND e2 > s1 AND e2 < e1 THEN 'overlapped_by'
         WHEN e1 < s2 THEN 'before'
         ELSE 'after'
       END AS relation,
       count(*) AS n_pairs
FROM pairs GROUP BY 1 ORDER BY 1
"""




_ASOF_TOL_MIN = 30  # tolerance window, minutes


def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH a staleness tolerance — pandas'
    ``merge_asof(tolerance=...)`` / kdb's windowed aj: the most recent
    click at-or-before each purchase counts ONLY if it is at most
    {T} minutes old; anything staler is no match (NULL), because a
    feature computed from an hour-old click is a training-serving
    skew bug, not a feature. Same union-and-carry plan as
    ``asof_join_last_click`` with the click timestamp carried inside
    the struct, so the tolerance test happens AFTER the carry — one
    sort, no extra shuffle, and the carried-NULL semantics are
    preserved exactly.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        "event_id",
        F.struct(
            F.col("value").alias("v"), F.col("ts").alias("cts")
        ).alias("click"),
        F.lit(0).alias("is_p"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("struct<v:double,cts:timestamp>").alias("click"),
        F.lit(1).alias("is_p"),
    )
    unioned = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "last_click", F.last("click", ignorenulls=True).over(w)
    )
    within = F.col("last_click.cts") >= F.col("ts") - F.expr(
        f"INTERVAL {_ASOF_TOL_MIN} MINUTES"
    )
    return carried.filter(F.col("is_p") == 1).select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.round(
            F.when(within, F.col("last_click.v")), 4
        ).alias("click_value_within_tol"),
        F.when(within, F.lit(1)).otherwise(F.lit(0)).alias("fresh"),
    )


asof_join_tolerance.__doc__ = asof_join_tolerance.__doc__.format(
    T=_ASOF_TOL_MIN
)


ASOF_JOIN_TOLERANCE_SQL = f"""
SELECT p.user_id,
       p.event_id AS purchase_id,
       round((SELECT c.value FROM events c
              WHERE c.user_id = p.user_id AND c.event_type = 'click'
                AND c.ts <= p.ts
                AND c.ts >= p.ts - INTERVAL {_ASOF_TOL_MIN} MINUTES
              ORDER BY c.ts DESC, c.event_id DESC LIMIT 1), 4)
         AS click_value_within_tol,
       CASE WHEN EXISTS (SELECT 1 FROM events c
              WHERE c.user_id = p.user_id AND c.event_type = 'click'
                AND c.ts <= p.ts
                AND c.ts >= p.ts - INTERVAL {_ASOF_TOL_MIN} MINUTES)
            THEN 1 ELSE 0 END AS fresh
FROM events p
WHERE p.event_type = 'purchase'
"""


def orders_open_interval_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line interval concurrency — the "how many are open RIGHT
    NOW" analytic (concurrent sessions, open orders, room occupancy)
    that naive approaches answer with an interval×timestamp join:
    each order opens at its order date and closes
    (o_orderkey % 30 + 1) days later; the sweep turns every interval
    into a +1/−1 delta, collapses deltas per DAY (the only
    corpus-sized aggregate, map-side combinable, key domain = the
    date span), and a date-ordered cumulative window over that
    BOUNDED daily relation yields the exact open-interval depth.
    Per month: the peak depth, its first day, depth at month end, and
    the net open/close flow — integers everywhere.

    This is the canonical O(n) alternative to the O(n·days)
    expand-per-day join; the unpartitioned cumulative window is fine
    because its input is calendar-sized, not corpus-sized.
    """
    deltas = interval_deltas(load_table(spark, sf_dir, "orders")).groupBy(
        "d"
    ).agg(
        F.sum("delta").cast("long").alias("net"),
        F.count_if(F.col("delta") == 1).cast("long").alias("n_opened"),
    )
    return depth_from_daily(deltas)


def interval_deltas(orders: DataFrame) -> DataFrame:
    """(d, delta) sweep events for the open-interval analytic — a
    stateless per-row projection (each order emits its +1 open and −1
    close), shared by the batch operator and the streaming twin's
    pre-aggregation."""
    iv = orders.select(
        F.col("o_orderdate").cast("date").alias("open_d"),
        F.date_add(
            F.col("o_orderdate").cast("date"),
            (F.col("o_orderkey") % 30 + 1).cast("int"),
        ).alias("close_d"),
    )
    return iv.select(
        F.explode(
            F.array(
                F.struct(F.col("open_d").alias("d"), F.lit(1).alias("delta")),
                F.struct(
                    F.col("close_d").alias("d"), F.lit(-1).alias("delta")
                ),
            )
        ).alias("e")
    ).select("e.d", "e.delta")


def depth_from_daily(deltas: DataFrame) -> DataFrame:
    """The sweep-line fold over a (d, net, n_opened) daily-delta
    relation — factored so ``stream_open_interval_depth`` (which
    maintains the daily deltas as complete-mode streaming state)
    finalizes through the identical code path and shares the batch
    oracle."""
    wcum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    daily = deltas.select(
        "d",
        "net",
        "n_opened",
        F.sum("net").over(wcum).alias("depth"),
    )
    monthly = daily.select(
        F.date_format("d", "yyyy-MM").alias("month"),
        "d",
        "net",
        "n_opened",
        "depth",
    ).withColumn(
        "mx", F.max("depth").over(Window.partitionBy("month"))
    )
    return (
        monthly.groupBy("month")
        .agg(
            F.count("*").alias("n_change_days"),
            F.sum("n_opened").alias("n_opened"),
            F.max("depth").alias("peak_depth"),
            F.min(
                F.when(F.col("depth") == F.col("mx"), F.col("d"))
            ).alias("peak_day"),
            F.expr("max_by(depth, d)").alias("depth_at_month_end"),
            F.sum("net").cast("long").alias("net_flow"),
        )
        .orderBy("month")
    )


ORDERS_OPEN_INTERVAL_DEPTH_SQL = """
WITH iv AS (
  SELECT CAST(o_orderdate AS DATE) AS open_d,
         CAST(o_orderdate AS DATE)
           + CAST((o_orderkey % 30 + 1) AS INT) AS close_d
  FROM orders
),
deltas AS (
  SELECT d,
         CAST(sum(delta) AS BIGINT) AS net,
         CAST(count(CASE WHEN delta = 1 THEN 1 END) AS BIGINT) AS n_opened
  FROM (
    SELECT open_d AS d, 1 AS delta FROM iv
    UNION ALL
    SELECT close_d, -1 FROM iv
  ) x
  GROUP BY d
),
daily AS (
  SELECT d, net, n_opened,
         sum(net) OVER (ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS depth
  FROM deltas
),
monthly AS (
  SELECT strftime(d, '%Y-%m') AS month, d, net, n_opened, depth,
         max(depth) OVER (PARTITION BY strftime(d, '%Y-%m')) AS mx
  FROM daily
)
SELECT month,
       count(*) AS n_change_days,
       CAST(sum(n_opened) AS BIGINT) AS n_opened,
       CAST(max(depth) AS BIGINT) AS peak_depth,
       min(CASE WHEN depth = mx THEN d END) AS peak_day,
       CAST(max_by(depth, d) AS BIGINT) AS depth_at_month_end,
       CAST(sum(net) AS BIGINT) AS net_flow
FROM monthly
GROUP BY month
ORDER BY month
"""


QUERIES = {
    "asof_join_tolerance": asof_join_tolerance,
    "orders_open_interval_depth": orders_open_interval_depth,
    "allen_interval_relations": allen_interval_relations,
    "asof_join_last_click": asof_join_last_click,
    "asof_join_nearest": asof_join_nearest,
    "quantity_band_join": quantity_band_join,
    "bucketized_range_join": bucketized_range_join,
}

ORACLES = {
    "asof_join_tolerance": ASOF_JOIN_TOLERANCE_SQL,
    "orders_open_interval_depth": ORDERS_OPEN_INTERVAL_DEPTH_SQL,
    "allen_interval_relations": ALLEN_INTERVAL_RELATIONS_SQL,
    "asof_join_last_click": ASOF_JOIN_LAST_CLICK_SQL,
    "asof_join_nearest": ASOF_JOIN_NEAREST_SQL,
    "quantity_band_join": QUANTITY_BAND_JOIN_SQL,
    "bucketized_range_join": BUCKETIZED_RANGE_JOIN_SQL,
}
