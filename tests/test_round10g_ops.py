"""Round-10 wave 10: streaming SPRT twin, sweep-line interval depth."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_stream_sprt_equals_batch(spark, sf_dir):
    """The streaming monitor's final table equals the batch operator's
    over the same finite input — the shared-fold guarantee."""
    from cdc_realtime_pipeline_spark.operators.inference import (
        events_sprt_monitor,
    )
    from cdc_realtime_pipeline_spark.streaming.stream_queries import (
        stream_sprt_alarm,
    )

    batch = {tuple(r) for r in events_sprt_monitor(spark, sf_dir).collect()}
    stream = {tuple(r) for r in stream_sprt_alarm(spark, sf_dir).collect()}
    assert stream == batch


def test_interval_depth_conservation(spark, sf_dir):
    """Sweep-line identities: total opens equal the order count, the
    global net flow telescopes to zero (every interval closes), depth
    peaks are positive, and each month's peak day belongs to it."""
    from cdc_realtime_pipeline_spark.operators.temporal import (
        orders_open_interval_depth,
    )

    rows = orders_open_interval_depth(spark, sf_dir).collect()
    assert rows
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert sum(r["n_opened"] for r in rows) == n_orders
    assert sum(r["net_flow"] for r in rows) == 0
    for r in rows:
        assert r["peak_depth"] >= 1
        assert r["peak_depth"] >= r["depth_at_month_end"] >= 0
        assert r["peak_day"].strftime("%Y-%m") == r["month"]
    months = [r["month"] for r in rows]
    assert months == sorted(months)


def test_stream_interval_depth_equals_batch(spark, sf_dir):
    """The streaming sweep-line table equals the batch operator's
    over the same finite input — the shared-fold guarantee, on the
    second streaming source table (orders)."""
    from cdc_realtime_pipeline_spark.operators.temporal import (
        orders_open_interval_depth,
    )
    from cdc_realtime_pipeline_spark.streaming.stream_queries import (
        stream_open_interval_depth,
    )

    batch = {
        tuple(r) for r in orders_open_interval_depth(spark, sf_dir).collect()
    }
    stream = {
        tuple(r) for r in stream_open_interval_depth(spark, sf_dir).collect()
    }
    assert stream == batch
