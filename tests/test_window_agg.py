"""Window-aggregate math against the reference's hand-checked golden
(docs/04-flink-streaming.md:304-318): 3 trades for one key →
count=3, bid=2, ask=1, total=84,850,000, avg=73,000, min=72,000,
max=74,000.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from cdc_realtime_pipeline_spark.operators.window_agg import trade_window_agg


def _trades_df(spark):
    base = datetime.datetime(2024, 1, 1, 9, 0, 30)
    rows = [
        # (ts, market, price, volume, is_bid)  — the 005930 example
        (base, "005930", 72000.0, 100.0, True),
        (base + datetime.timedelta(seconds=10), "005930", 73000.0, 50.0, True),
        (base + datetime.timedelta(seconds=20), "005930", 74000.0, 1000.0, False),
    ]
    df = spark.createDataFrame(
        rows, "ts timestamp, market string, price double, volume double, is_bid boolean"
    )
    return df.withColumn("amount", F.col("price") * F.col("volume"))


def test_golden_aggregate(spark):
    out = trade_window_agg(_trades_df(spark)).collect()
    assert len(out) == 1
    r = out[0].asDict()
    assert r["trade_count"] == 3
    assert r["bid_count"] == 2
    assert r["ask_count"] == 1
    assert r["total_amount"] == 84_850_000.0
    assert r["avg_price"] == 73_000.0
    assert r["min_price"] == 72_000.0
    assert r["max_price"] == 74_000.0
    # vwap = 84,850,000 / 1,150
    assert abs(r["vwap"] - 84_850_000.0 / 1150.0) < 1e-9
    # window metadata attached (WindowEnricher parity)
    assert r["window_start"] == datetime.datetime(2024, 1, 1, 9, 0, 0)
    assert r["window_end"] == datetime.datetime(2024, 1, 1, 9, 5, 0)


def test_windows_split_on_boundaries(spark):
    import datetime as dt

    rows = [
        (dt.datetime(2024, 1, 1, 9, 4, 59), "m", 10.0, 1.0, True),
        (dt.datetime(2024, 1, 1, 9, 5, 0), "m", 20.0, 1.0, True),
    ]
    df = spark.createDataFrame(
        rows, "ts timestamp, market string, price double, volume double, is_bid boolean"
    ).withColumn("amount", F.col("price") * F.col("volume"))
    out = {r["window_start"]: r for r in trade_window_agg(df).collect()}
    assert len(out) == 2  # tumbling boundary is exclusive on the right


def test_vwap_zero_volume_guard(spark):
    import datetime as dt

    rows = [(dt.datetime(2024, 1, 1), "m", 10.0, 0.0, True)]
    df = spark.createDataFrame(
        rows, "ts timestamp, market string, price double, volume double, is_bid boolean"
    ).withColumn("amount", F.col("price") * F.col("volume"))
    r = trade_window_agg(df).collect()[0]
    assert r["vwap"] == 0.0  # TradeAggregator.java:75 zero-division guard
