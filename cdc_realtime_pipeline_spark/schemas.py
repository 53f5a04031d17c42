"""Explicit schemas for the reference data model (SURVEY.md §1).

The reference declares fixed schemas at every layer (MySQL DDL
mysql/init.sql:28-43, ClickHouse DDL clickhouse/init.sql:7-94, POJOs
model/CryptoTradeEvent.java:14-25); we do the same — no inference.

Decimal handling parity: Debezium ships decimals as strings
(``decimal.handling.mode=string`` — debezium/connector-config.json:29)
and the reference downcasts to double during processing
(CdcEventParser.java:104-115), storing Float64 at rest
(clickhouse/init.sql:12-14). So the envelope carries strings, the
source table keeps DecimalType, and all processing/at-rest schemas use
DoubleType.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- source table: crypto_trades (mysql/init.sql:28-43) -------------------
TRADE_SCHEMA = T.StructType(
    [
        T.StructField("trade_id", T.LongType(), False),
        T.StructField("market", T.StringType(), False),
        T.StructField("trade_price", T.DecimalType(20, 8), True),
        T.StructField("trade_volume", T.DecimalType(20, 8), True),
        T.StructField("trade_amount", T.DecimalType(20, 4), True),
        T.StructField("ask_bid", T.StringType(), True),  # 'ASK' | 'BID'
        T.StructField("upbit_timestamp", T.LongType(), True),  # Unix ms
        T.StructField("sequential_id", T.LongType(), True),  # unique natural key
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

# --- Debezium envelope (CdcEventParser.java:14-34; decimals as strings) ---
_ROW_IMAGE = T.StructType(
    [
        T.StructField("trade_id", T.LongType(), True),
        T.StructField("market", T.StringType(), True),
        T.StructField("trade_price", T.StringType(), True),
        T.StructField("trade_volume", T.StringType(), True),
        T.StructField("trade_amount", T.StringType(), True),
        T.StructField("ask_bid", T.StringType(), True),
        T.StructField("upbit_timestamp", T.LongType(), True),
        T.StructField("sequential_id", T.LongType(), True),
        T.StructField("created_at", T.StringType(), True),
    ]
)

_SOURCE = T.StructType(
    [
        T.StructField("ts_ms", T.LongType(), True),  # MySQL commit time
        T.StructField("db", T.StringType(), True),
        T.StructField("table", T.StringType(), True),
    ]
)

PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("before", _ROW_IMAGE, True),
        T.StructField("after", _ROW_IMAGE, True),
        T.StructField("source", _SOURCE, True),
        T.StructField("op", T.StringType(), True),  # 'r' | 'c' | 'u' | 'd'
        T.StructField("ts_ms", T.LongType(), True),  # Debezium processing time
    ]
)

# Kafka messages may be enveloped ({"payload": {...}}) or bare
# (CdcEventParser.java:51) — the parser handles both.
ENVELOPE_SCHEMA = T.StructType(
    [T.StructField("payload", PAYLOAD_SCHEMA, True)] + list(PAYLOAD_SCHEMA.fields)
)

# --- parsed event (model/CryptoTradeEvent.java:14-25) ---------------------
CRYPTO_TRADE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("trade_id", T.LongType(), True),
        T.StructField("market", T.StringType(), True),
        T.StructField("trade_price", T.DoubleType(), True),
        T.StructField("trade_volume", T.DoubleType(), True),
        T.StructField("trade_amount", T.DoubleType(), True),
        T.StructField("ask_bid", T.StringType(), True),
        T.StructField("upbit_timestamp", T.LongType(), True),
        T.StructField("sequential_id", T.LongType(), True),
        T.StructField("op", T.StringType(), True),
        T.StructField("source_ts", T.LongType(), True),
        T.StructField("cdc_ts", T.LongType(), True),
        T.StructField("cdc_latency_ms", T.LongType(), True),
    ]
)

# --- outputs (clickhouse/init.sql:34-54, 60-75) ---------------------------
TRADE_AGG_SCHEMA = T.StructType(
    [
        T.StructField("market", T.StringType(), False),
        T.StructField("window_start", T.TimestampType(), False),
        T.StructField("window_end", T.TimestampType(), False),
        T.StructField("trade_count", T.LongType(), False),
        T.StructField("bid_count", T.LongType(), False),
        T.StructField("ask_count", T.LongType(), False),
        T.StructField("total_amount", T.DoubleType(), False),
        T.StructField("total_volume", T.DoubleType(), False),
        T.StructField("avg_price", T.DoubleType(), False),
        T.StructField("min_price", T.DoubleType(), False),
        T.StructField("max_price", T.DoubleType(), False),
        T.StructField("vwap", T.DoubleType(), False),
    ]
)

ANOMALY_ALERT_SCHEMA = T.StructType(
    [
        T.StructField("alert_type", T.StringType(), False),
        T.StructField("market", T.StringType(), False),
        T.StructField("trade_id", T.LongType(), True),
        T.StructField("message", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("threshold", T.DoubleType(), True),
        T.StructField("detected_at", T.TimestampType(), True),
    ]
)

# --- driver fixture: events table (FIXTURES.md §B) ------------------------
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)
