"""5-minute keyed tumbling-window aggregate — the reference's core operator.

Re-expresses TradeAggregator.java:23-91 + WindowEnricher
(TradeAggregator.java:97-107) as one declarative
``groupBy(window(ts, '5 minutes'), key).agg(...)``:

* trade_count, conditional bid_count/ask_count (TradeAggregator.java:43-61)
* total_amount, total_volume, avg/min/max price (…:63-77)
* vwap = Σamount/Σvolume guarded against zero (…:75)
* zeros (not nulls) on degenerate groups (…:72-74)
* window start/end attached from the ``window`` struct — replaces the
  ProcessWindowFunction metadata step

Spark's HashAggregateExec runs the same partial→merge→final phases the
reference hand-codes as accumulator add/merge/getResult (SURVEY.md §4),
with map-side combine before the key shuffle — the property that makes
this one-shuffle at any scale. The same expression runs unchanged under
Structured Streaming (streaming/job.py) — reference divergence note:
Flink used *processing time* with no watermarks (CdcPipelineJob.java:62,70);
we use event time + watermark, the Spark idiom (SURVEY.md §2.4 W1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_realtime_pipeline_spark.session import load_table


def trade_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "market",
    price_col: str = "price",
    volume_col: str = "volume",
    amount_col: str = "amount",
    bid_col: str = "is_bid",
    window_duration: str = "5 minutes",
) -> DataFrame:
    """Generic keyed tumbling-window trade aggregate (A1-A3).

    Works on any DataFrame exposing the trade shape; batch or streaming.
    """
    bid = F.sum(F.when(F.col(bid_col), 1).otherwise(0))
    vol_sum = F.sum(volume_col)
    amt_sum = F.sum(amount_col)
    return (
        df.groupBy(F.window(F.col(ts_col), window_duration).alias("w"), F.col(key_col))
        .agg(
            F.count("*").alias("trade_count"),
            bid.alias("bid_count"),
            (F.count("*") - bid).alias("ask_count"),
            amt_sum.alias("total_amount"),
            vol_sum.alias("total_volume"),
            F.coalesce(F.avg(price_col), F.lit(0.0)).alias("avg_price"),
            F.coalesce(F.min(price_col), F.lit(0.0)).alias("min_price"),
            F.coalesce(F.max(price_col), F.lit(0.0)).alias("max_price"),
        )
        .select(
            F.col(key_col),
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "trade_count",
            "bid_count",
            "ask_count",
            "total_amount",
            "total_volume",
            "avg_price",
            "min_price",
            "max_price",
            # vwap guarded against zero volume (TradeAggregator.java:75)
            F.when(F.col("total_volume") > 0, F.col("total_amount") / F.col("total_volume"))
            .otherwise(F.lit(0.0))
            .alias("vwap"),
        )
    )


def events_window_agg_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-A3 over the driver ``events`` fixture (FIXTURES.md §B mapping).

    price ≙ value, volume ≙ props.k (exercises JSON extraction,
    SURVEY §1.2's nested-JSON row), amount ≙ price×volume, BID ≙
    click/purchase. Doubles rounded for oracle comparison.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "ts",
        F.col("user_id").alias("market"),
        F.col("value").alias("price"),
        F.get_json_object("props", "$.k").cast("double").alias("volume"),
        F.col("event_type").isin("click", "purchase").alias("is_bid"),
    )
    ev = ev.withColumn("amount", F.col("price") * F.col("volume"))
    out = trade_window_agg(ev, key_col="market")
    # Cross-engine float discipline (caught by the sf0.1 sweep, not
    # sf0.01): Σ-order differs between engines, so a ratio of raw sums
    # can straddle a round-4 boundary (one window's vwap read .55375±ε
    # from opposite sides). vwap is therefore finalized from the
    # ROUNDED sums — both engines then divide identical inputs — and
    # every rounded double carries the shared +1e-9 tie nudge.
    ra, rv = F.round(F.col("total_amount") + 1e-9, 4), F.round(
        F.col("total_volume") + 1e-9, 4
    )
    return out.select(
        "market",
        "window_start",
        "window_end",
        "trade_count",
        "bid_count",
        "ask_count",
        ra.alias("total_amount"),
        rv.alias("total_volume"),
        F.round(F.col("avg_price") + 1e-9, 4).alias("avg_price"),
        F.round(F.col("min_price") + 1e-9, 4).alias("min_price"),
        F.round(F.col("max_price") + 1e-9, 4).alias("max_price"),
        F.round(
            F.when(rv > 0, ra / rv).otherwise(F.lit(0.0)) + 1e-9, 4
        ).alias("vwap"),
    )


# Spark tumbling windows are epoch-aligned; floor(epoch/300)*300 is the
# identical bucketing in portable SQL.
EVENTS_WINDOW_AGG_5M_SQL = """
WITH ev AS (
  SELECT ts,
         user_id AS market,
         value AS price,
         CAST(json_extract_string(props, '$.k') AS DOUBLE) AS volume,
         event_type IN ('click','purchase') AS is_bid,
         value * CAST(json_extract_string(props, '$.k') AS DOUBLE) AS amount
  FROM events
)
SELECT market,
       make_timestamp(CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) * 1000000) AS window_start,
       make_timestamp((CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) + 300) * 1000000) AS window_end,
       count(*) AS trade_count,
       count(CASE WHEN is_bid THEN 1 END) AS bid_count,
       count(*) - count(CASE WHEN is_bid THEN 1 END) AS ask_count,
       round(sum(amount) + 1e-9, 4) AS total_amount,
       round(sum(volume) + 1e-9, 4) AS total_volume,
       round(coalesce(avg(price), 0.0) + 1e-9, 4) AS avg_price,
       round(coalesce(min(price), 0.0) + 1e-9, 4) AS min_price,
       round(coalesce(max(price), 0.0) + 1e-9, 4) AS max_price,
       round(CASE WHEN round(sum(volume) + 1e-9, 4) > 0
                  THEN round(sum(amount) + 1e-9, 4) / round(sum(volume) + 1e-9, 4)
                  ELSE 0.0 END + 1e-9, 4) AS vwap
FROM ev
GROUP BY 1, 2, 3
"""


def events_window_agg_5m_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same A1-A3 aggregate under hot-key salting (SURVEY §7 "salted
    keys documented for hot markets").

    Phase 1 aggregates on (window, key, salt) — a hot key's rows spread
    over SALT_BUCKETS reducers; phase 2 merges the salt partials. All
    aggregates are re-aggregable (counts/sums/min/max; avg carried as
    sum+count; vwap finalized from merged sums), so the result is
    bit-identical to the unsalted plan — it shares the same oracle.
    The fixture's 150 uniform keys don't *need* salting; this is the
    pattern proof for the BTC/ETH-dominated distribution the reference
    ingests (FIXTURES.md §A1 "few hot keys").
    """
    salt_buckets = 8
    ev = load_table(spark, sf_dir, "events").select(
        "ts",
        F.col("user_id").alias("market"),
        F.col("value").alias("price"),
        F.get_json_object("props", "$.k").cast("double").alias("volume"),
        F.col("event_type").isin("click", "purchase").alias("is_bid"),
        (F.col("event_id") % salt_buckets).alias("salt"),
    ).withColumn("amount", F.col("price") * F.col("volume"))
    bid = F.sum(F.when(F.col("is_bid"), 1).otherwise(0))
    phase1 = (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "market", "salt")
        .agg(
            F.count("*").alias("cnt"),
            bid.alias("bids"),
            F.sum("amount").alias("amt"),
            F.sum("volume").alias("vol"),
            F.sum("price").alias("price_sum"),
            F.min("price").alias("min_p"),
            F.max("price").alias("max_p"),
        )
    )
    merged = phase1.groupBy("w", "market").agg(
        F.sum("cnt").alias("trade_count"),
        F.sum("bids").alias("bid_count"),
        F.sum("amt").alias("total_amount"),
        F.sum("vol").alias("total_volume"),
        F.sum("price_sum").alias("price_sum"),
        F.min("min_p").alias("min_price"),
        F.max("max_p").alias("max_price"),
    )
    # same tie discipline as the unsalted finalize: rounded-sum ratio
    # + shared 1e-9 nudge (see events_window_agg_5m)
    ra, rv = F.round(F.col("total_amount") + 1e-9, 4), F.round(
        F.col("total_volume") + 1e-9, 4
    )
    return merged.select(
        "market",
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "trade_count",
        "bid_count",
        (F.col("trade_count") - F.col("bid_count")).alias("ask_count"),
        ra.alias("total_amount"),
        rv.alias("total_volume"),
        F.round(F.col("price_sum") / F.col("trade_count") + 1e-9, 4).alias("avg_price"),
        F.round(F.col("min_price") + 1e-9, 4).alias("min_price"),
        F.round(F.col("max_price") + 1e-9, 4).alias("max_price"),
        F.round(
            F.when(rv > 0, ra / rv).otherwise(0.0) + 1e-9,
            4,
        ).alias("vwap"),
    )


def events_window_agg_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) window: 10-minute windows every 5 minutes —
    each event lands in exactly two windows. ``F.window(ts, size,
    slide)`` plans an explode over the overlapping windows then the
    same partial+final hash aggregate; the oracle reproduces it with a
    2-row bucket union.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"),
            F.col("user_id").alias("market"),
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select(
            "market",
            F.col("w.start").alias("window_start"),
            "n",
            "total",
        )
    )


EVENTS_WINDOW_AGG_SLIDING_SQL = """
WITH buckets AS (
  SELECT user_id AS market, value,
         CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) - off AS win_start_s
  FROM events, (SELECT unnest([0, 300]) AS off)
)
SELECT market,
       make_timestamp(win_start_s * 1000000) AS window_start,
       count(*) AS n,
       round(sum(value), 4) AS total
FROM buckets
GROUP BY market, win_start_s
"""


def events_window_agg_1h_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly aggregate rolled up FROM the 5-minute partials — the
    continuous-aggregate / hypertable-rollup pattern: coarser grains
    re-aggregate finer partials instead of re-scanning raw ticks,
    which at 100 TB is the difference between touching 12 rows per
    market-hour and touching every tick again. Composition rules:
    count/sum/min/max merge directly; avg finalizes from price_sum ÷
    count; vwap from the merged rounded sums (the shared discipline).
    The oracle aggregates the RAW table at 1 h directly — proving the
    two-level rollup is exactly the single-level answer.

    Same re-aggregability contract the MV analog (streaming/mv.py)
    and the salted variant rely on; this query pins it across a grain
    change.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "ts",
        F.col("user_id").alias("market"),
        F.col("value").alias("price"),
        F.get_json_object("props", "$.k").cast("double").alias("volume"),
        F.col("event_type").isin("click", "purchase").alias("is_bid"),
    ).withColumn("amount", F.col("price") * F.col("volume"))
    bid = F.sum(F.when(F.col("is_bid"), 1).otherwise(0))
    partials_5m = ev.groupBy(
        F.window("ts", "5 minutes").alias("w"), "market"
    ).agg(
        F.count("*").alias("cnt"),
        bid.alias("bids"),
        F.sum("amount").alias("amt"),
        F.sum("volume").alias("vol"),
        F.sum("price").alias("price_sum"),
        F.min("price").alias("min_p"),
        F.max("price").alias("max_p"),
    )
    # 5-min windows are epoch-aligned, so flooring the window START to
    # the hour assigns each partial to exactly one parent window
    hour = F.timestamp_seconds(
        (F.unix_micros(F.col("w.start")) / 1_000_000).cast("long")
        - ((F.unix_micros(F.col("w.start")) / 1_000_000).cast("long") % 3600)
    )
    merged = partials_5m.groupBy(hour.alias("hour_start"), F.col("market")).agg(
        F.sum("cnt").alias("trade_count"),
        F.sum("bids").alias("bid_count"),
        F.sum("amt").alias("total_amount"),
        F.sum("vol").alias("total_volume"),
        F.sum("price_sum").alias("price_sum"),
        F.min("min_p").alias("min_price"),
        F.max("max_p").alias("max_price"),
    )
    ra, rv = F.round(F.col("total_amount") + 1e-9, 4), F.round(
        F.col("total_volume") + 1e-9, 4
    )
    return merged.select(
        "market",
        "hour_start",
        "trade_count",
        "bid_count",
        (F.col("trade_count") - F.col("bid_count")).alias("ask_count"),
        ra.alias("total_amount"),
        rv.alias("total_volume"),
        F.round(F.col("price_sum") / F.col("trade_count") + 1e-9, 4).alias("avg_price"),
        F.round(F.col("min_price") + 1e-9, 4).alias("min_price"),
        F.round(F.col("max_price") + 1e-9, 4).alias("max_price"),
        F.round(F.when(rv > 0, ra / rv).otherwise(0.0) + 1e-9, 4).alias("vwap"),
    )


EVENTS_WINDOW_AGG_1H_SQL = """
WITH ev AS (
  SELECT ts,
         user_id AS market,
         value AS price,
         CAST(json_extract_string(props, '$.k') AS DOUBLE) AS volume,
         event_type IN ('click','purchase') AS is_bid,
         value * CAST(json_extract_string(props, '$.k') AS DOUBLE) AS amount
  FROM events
)
SELECT market,
       make_timestamp(CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) * 1000000) AS hour_start,
       count(*) AS trade_count,
       count(CASE WHEN is_bid THEN 1 END) AS bid_count,
       count(*) - count(CASE WHEN is_bid THEN 1 END) AS ask_count,
       round(sum(amount) + 1e-9, 4) AS total_amount,
       round(sum(volume) + 1e-9, 4) AS total_volume,
       round(sum(price) / count(*) + 1e-9, 4) AS avg_price,
       round(min(price) + 1e-9, 4) AS min_price,
       round(max(price) + 1e-9, 4) AS max_price,
       round(CASE WHEN round(sum(volume) + 1e-9, 4) > 0
                  THEN round(sum(amount) + 1e-9, 4) / round(sum(volume) + 1e-9, 4)
                  ELSE 0.0 END + 1e-9, 4) AS vwap
FROM ev
GROUP BY 1, 2
"""


QUERIES = {
    "window_agg_5m": events_window_agg_5m,
    "window_agg_5m_salted": events_window_agg_5m_salted,
    "window_agg_sliding": events_window_agg_sliding,
    "window_agg_1h_rollup": events_window_agg_1h_rollup,
}
ORACLES = {
    "window_agg_5m": EVENTS_WINDOW_AGG_5M_SQL,
    # salting must not change the answer — same oracle as the unsalted plan
    "window_agg_5m_salted": EVENTS_WINDOW_AGG_5M_SQL,
    "window_agg_sliding": EVENTS_WINDOW_AGG_SLIDING_SQL,
    # the rollup must equal the direct 1 h aggregate over raw rows
    "window_agg_1h_rollup": EVENTS_WINDOW_AGG_1H_SQL,
}
