"""Driver-facing streaming queries — run a real streaming query
synchronously and return its result as a DataFrame.

Each entry materializes fixture data as a file-backed CDC stream (or
file stream), runs Structured Streaming to completion
(``availableNow`` trigger), and returns the sink contents. Because the
input is finite and deterministic, two of them are *oracle-gated
streaming queries*: the streaming windowed aggregate must equal the
batch answer DuckDB computes — the strongest cross-engine check the
streaming runtime can get.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_realtime_pipeline_spark.cdc.envelope import (
    parse_cdc_events,
    synthesize_cdc_json_from_events,
)
from cdc_realtime_pipeline_spark.session import convert_ns_timestamps, load_table, raw_schema
from cdc_realtime_pipeline_spark.sources.cdc_file_source import write_cdc_json_files
from cdc_realtime_pipeline_spark.streaming.anomaly_stateful import apply_anomaly_detector


def _memory_sink(df: DataFrame, output_mode: str) -> DataFrame:
    name = "q_" + uuid.uuid4().hex[:12]
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = df.sparkSession
    return spark.table(name)


def stream_window_agg_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The A1-A3 window aggregate under Structured Streaming.

    Same expression as the batch ``window_agg_5m`` (one groupBy over
    ``window(ts, '5 min')``), fed by a parquet file *stream*, complete
    output mode — the result must match the batch/DuckDB answer
    exactly, which is this query's oracle.
    """
    events_stream = convert_ns_timestamps(
        spark.readStream.schema(raw_schema(spark, sf_dir, "events"))
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ev = events_stream.select(
        "ts",
        F.col("user_id").alias("market"),
        F.col("value").alias("price"),
        F.get_json_object("props", "$.k").cast("double").alias("volume"),
        F.col("event_type").isin("click", "purchase").alias("is_bid"),
    ).withColumn("amount", F.col("price") * F.col("volume"))
    bid = F.sum(F.when(F.col("is_bid"), 1).otherwise(0))
    agg = (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "market")
        .agg(
            F.count("*").alias("trade_count"),
            bid.alias("bid_count"),
            (F.count("*") - bid).alias("ask_count"),
            F.sum("amount").alias("total_amount"),
            F.sum("volume").alias("total_volume"),
            F.avg("price").alias("avg_price"),
            F.min("price").alias("min_price"),
            F.max("price").alias("max_price"),
        )
    )
    res = _memory_sink(agg, "complete")
    return res.select(
        "market",
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "trade_count",
        "bid_count",
        "ask_count",
        F.round("total_amount", 4).alias("total_amount"),
        F.round("total_volume", 4).alias("total_volume"),
        F.round(F.coalesce("avg_price", F.lit(0.0)), 4).alias("avg_price"),
        F.round(F.coalesce("min_price", F.lit(0.0)), 4).alias("min_price"),
        F.round(F.coalesce("max_price", F.lit(0.0)), 4).alias("max_price"),
        F.round(
            F.when(F.col("total_volume") > 0, F.col("total_amount") / F.col("total_volume"))
            .otherwise(0.0),
            4,
        ).alias("vwap"),
    )


def stream_cdc_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC envelope parse running as a stream over JSON files.

    Oracle-gated: the streamed parse must equal the batch round-trip
    (same projection as ``cdc_roundtrip``).
    """
    events = load_table(spark, sf_dir, "events")
    stream_dir = tempfile.mkdtemp(prefix="cdc_stream_")
    write_cdc_json_files(synthesize_cdc_json_from_events(events), stream_dir)
    raw = spark.readStream.format("text").load(stream_dir)
    parsed = parse_cdc_events(raw)
    res = _memory_sink(parsed, "append")
    return res.select(
        "trade_id",
        "market",
        F.round("trade_price", 4).alias("trade_price"),
        F.round("trade_volume", 4).alias("trade_volume"),
        F.round("trade_amount", 4).alias("trade_amount"),
        "ask_bid",
        "upbit_timestamp",
        "sequential_id",
        "op",
        "cdc_latency_ms",
    )


def stream_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup on the natural key (W10, the INSERT IGNORE
    analog): a CDC stream carrying ~10% re-delivered events is
    deduplicated with streaming ``dropDuplicates`` state.

    Oracle-gated: per-op counts after dedup must equal the batch
    distinct counts DuckDB computes. (Production note: unbounded-key
    streams bound the state with ``dropDuplicatesWithinWatermark``;
    the fixture replay has no event-time watermark column ordering
    guarantee, so the exact-state form is used here.)
    """
    events = load_table(spark, sf_dir, "events")
    with_dupes = events.unionAll(events.filter(F.col("event_id") % 10 == 0))
    stream_dir = tempfile.mkdtemp(prefix="cdc_dedup_")
    write_cdc_json_files(synthesize_cdc_json_from_events(with_dupes), stream_dir)
    raw = spark.readStream.format("text").load(stream_dir)
    deduped = parse_cdc_events(raw).dropDuplicates(["sequential_id"])
    res = _memory_sink(deduped, "append")
    return res.groupBy("op").agg(F.count("*").alias("n"))


STREAM_DEDUP_COUNTS_SQL = """
SELECT CASE WHEN event_type = 'error' THEN 'd' ELSE 'c' END AS op,
       count(DISTINCT event_id) AS n
FROM events
GROUP BY 1
"""


def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization under Structured Streaming:
    ``session_window`` with watermark, complete output — merged session
    windows must equal the batch answer, which is this query's oracle
    (same as ``sessionize_native``)."""
    from cdc_realtime_pipeline_spark.operators.extended import SESSION_GAP_MIN
    from cdc_realtime_pipeline_spark.session import convert_ns_timestamps, raw_schema

    events_stream = convert_ns_timestamps(
        spark.readStream.schema(raw_schema(spark, sf_dir, "events"))
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    agg = (
        events_stream.withWatermark("ts", "10 minutes")
        .groupBy(
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"), "user_id"
        )
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("session_value"))
    )
    res = _memory_sink(agg, "complete")
    return res.select(
        "user_id",
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "n_events",
        F.round("session_value", 4).alias("session_value"),
    )


def stream_merged_trade_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The read-once multi-sink fan-out, end-to-end and oracle-gated
    (W7 + A8): synthesized CDC stream → ``run_cdc_fanout`` (raw sink +
    per-batch window-agg partial sink via one foreachBatch) → merge-at-
    read of the partials. The merged aggregate must equal the batch
    window aggregate DuckDB computes directly from ``events`` — partials
    are re-mergeable (sums/counts/min/max; avg from sum+count), so
    batch boundaries can't change the answer.

    Event time rides ``timestamp_millis(upbit_timestamp)`` (ms
    precision), so the oracle buckets on ms-truncated epoch too.
    """
    import os
    import tempfile

    from cdc_realtime_pipeline_spark.streaming.job import (
        read_merged_trade_agg,
        run_cdc_fanout,
    )

    events = load_table(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix="cdc_fanout_q_")
    stream_dir = os.path.join(base, "in")
    write_cdc_json_files(synthesize_cdc_json_from_events(events), stream_dir)
    run_cdc_fanout(
        spark,
        stream_dir,
        os.path.join(base, "out"),
        os.path.join(base, "ckpt"),
        synchronous=True,
    )
    merged = read_merged_trade_agg(spark, os.path.join(base, "out"))
    return merged.select(
        "market",
        "window_start",
        "window_end",
        "trade_count",
        "bid_count",
        "ask_count",
        F.round("total_amount", 4).alias("total_amount"),
        F.round("total_volume", 4).alias("total_volume"),
        F.round("avg_price", 4).alias("avg_price"),
        F.round("min_price", 4).alias("min_price"),
        F.round("max_price", 4).alias("max_price"),
        F.round("vwap", 4).alias("vwap"),
    )


STREAM_MERGED_TRADE_AGG_SQL = """
WITH ev AS (
  SELECT 'M-' || CAST(user_id AS VARCHAR) AS market,
         CAST(floor(epoch_ms(ts) / 300000) * 300 AS BIGINT) AS ws,
         value AS price,
         CAST(json_extract_string(props, '$.k') AS DOUBLE) AS volume,
         event_type IN ('click','purchase') AS is_bid,
         value * CAST(json_extract_string(props, '$.k') AS DOUBLE) AS amount
  FROM events
)
SELECT market,
       make_timestamp(ws * 1000000) AS window_start,
       make_timestamp((ws + 300) * 1000000) AS window_end,
       count(*) AS trade_count,
       count(CASE WHEN is_bid THEN 1 END) AS bid_count,
       count(*) - count(CASE WHEN is_bid THEN 1 END) AS ask_count,
       round(sum(amount), 4) AS total_amount,
       round(sum(volume), 4) AS total_volume,
       round(sum(price) / count(*), 4) AS avg_price,
       round(min(price), 4) AS min_price,
       round(max(price), 4) AS max_price,
       round(CASE WHEN sum(volume) > 0 THEN sum(amount) / sum(volume) ELSE 0.0 END, 4) AS vwap
FROM ev
GROUP BY market, ws
"""


def stream_anomaly_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful anomaly detector over the synthesized CDC stream.

    Rows-only driver check (per-key sequential state semantics are not
    SQL-expressible); tests/test_streaming.py asserts rule-level
    equivalence against hand-computed fixtures.
    """
    events = load_table(spark, sf_dir, "events")
    stream_dir = tempfile.mkdtemp(prefix="cdc_alerts_")
    write_cdc_json_files(synthesize_cdc_json_from_events(events), stream_dir)
    raw = spark.readStream.format("text").load(stream_dir)
    parsed = parse_cdc_events(raw)
    alerts = apply_anomaly_detector(parsed)
    res = _memory_sink(alerts, "append")
    return res


# stream_window_agg_5m shares the batch window-agg oracle;
# stream_cdc_parse shares the batch round-trip oracle.
from cdc_realtime_pipeline_spark.operators.cdc_ops import CDC_ROUNDTRIP_SQL  # noqa: E402
from cdc_realtime_pipeline_spark.operators.extended import SESSIONIZE_NATIVE_SQL  # noqa: E402
from cdc_realtime_pipeline_spark.operators.window_agg import (  # noqa: E402
    EVENTS_WINDOW_AGG_5M_SQL,
)

QUERIES = {
    "stream_window_agg_5m": stream_window_agg_5m,
    "stream_cdc_parse": stream_cdc_parse,
    "stream_dedup_counts": stream_dedup_counts,
    "stream_sessionize": stream_sessionize,
    "stream_merged_trade_agg": stream_merged_trade_agg,
    "stream_anomaly_alerts": stream_anomaly_alerts,  # rows-only
}

ORACLES = {
    "stream_window_agg_5m": EVENTS_WINDOW_AGG_5M_SQL,
    "stream_cdc_parse": CDC_ROUNDTRIP_SQL,
    "stream_dedup_counts": STREAM_DEDUP_COUNTS_SQL,
    "stream_sessionize": SESSIONIZE_NATIVE_SQL,
    "stream_merged_trade_agg": STREAM_MERGED_TRADE_AGG_SQL,
}
