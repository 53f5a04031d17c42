"""Kafka CDC source — the production transport (S1), gated on the
kafka connector jars being present.

The reference consumes topic ``cdc.crypto_db.crypto_trades`` with group
``flink-cdc-consumer`` from earliest (CdcPipelineJob.java:52-58). This
container ships no Kafka broker or spark-sql-kafka jars, so the engine
tests against the file-based source (``cdc_file_source.py``) which
honors the same contract: a replayable, per-partition-ordered stream of
envelope JSON strings. Swapping transports changes nothing downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TOPIC = "cdc.crypto_db.crypto_trades"


def kafka_available(spark: SparkSession) -> bool:
    """True when the spark-sql-kafka connector is on the classpath."""
    try:
        spark.readStream.format("kafka").option("subscribe", "probe").option(
            "kafka.bootstrap.servers", "localhost:9092"
        ).load()
        return True
    except Exception as e:  # noqa: BLE001 — classifying the failure mode
        return "Failed to find data source" not in str(e)


def read_kafka_cdc_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = DEFAULT_TOPIC,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Streaming DataFrame of envelope JSON strings from Kafka —
    drop-in replacement for ``read_cdc_stream`` where brokers exist.
    """
    from pyspark.sql import functions as F

    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    # value-only string deserialization (the reference's
    # SimpleStringSchema); key/partition/offset kept for audit.
    return raw.select(
        F.col("value").cast("string").alias("value"),
        F.col("partition"),
        F.col("offset"),
    )
