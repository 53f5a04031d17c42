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


QUERIES = {
    "asof_join_last_click": asof_join_last_click,
    "quantity_band_join": quantity_band_join,
    "bucketized_range_join": bucketized_range_join,
}

ORACLES = {
    "asof_join_last_click": ASOF_JOIN_LAST_CLICK_SQL,
    "quantity_band_join": QUANTITY_BAND_JOIN_SQL,
    "bucketized_range_join": BUCKETIZED_RANGE_JOIN_SQL,
}
