"""Invariant tests for the round-4 third-wave operators: Misra-Gries
heavy hitters, the lambda-HOF conformance row, and the watermarked
left-outer stream-stream join. The oracle harness checks cross-engine
equality; these pin the semantic claims the docstrings make, on the
sf0.001 fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_realtime_pipeline_spark.operators.dq import _MG_K, heavy_hitters_mg
from cdc_realtime_pipeline_spark.operators.extended import (
    higher_order_functions_conformance,
)
from cdc_realtime_pipeline_spark.session import load_table
from cdc_realtime_pipeline_spark.streaming.stream_queries import (
    stream_stream_join,
    stream_stream_left_outer,
)


def _exact_hitters(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        F.when(F.col("event_id") % 10 < 3, F.lit(0))
        .when(F.col("event_id") % 10 == 3, F.lit(1))
        .when(F.col("event_id") % 10 == 4, F.lit(2))
        .otherwise(F.col("user_id") + 1000)
        .alias("hkey")
    )
    n = ev.count()
    return {
        r.hkey: r.cnt
        for r in ev.groupBy("hkey").agg(F.count("*").alias("cnt")).collect()
        if r.cnt * _MG_K > n
    }


def test_heavy_hitters_exact_and_complete(spark, sf_dir):
    # the sketch path must return EXACTLY the true heavy-hitter set
    # with exact counts (candidates are a superset; verify prunes)
    got = {r.hkey: r.cnt for r in heavy_hitters_mg(spark, sf_dir).collect()}
    assert got == _exact_hitters(spark, sf_dir)
    # the synthetic hot keys are always present
    assert {0, 1, 2} <= set(got)


def test_mg_kernel_superset_guarantee():
    # adversarial single-partition stream: uniform tail large enough to
    # force constant eviction; the true heavy key must still survive
    import pandas as pd

    from cdc_realtime_pipeline_spark.operators import dq

    k = dq._MG_K
    # 1000 tail keys once each + one hot key 60 times (n=1060, n/k=42.4)
    vals = list(range(10_000, 11_000)) + [7] * 60
    counters: dict[int, int] = {}
    for start in range(0, len(vals), 97):  # odd batch size vs value runs
        pdf = pd.DataFrame({"hkey": vals[start : start + 97]})
        for key, c in pdf["hkey"].value_counts().items():
            counters[key] = counters.get(key, 0) + int(c)
        if len(counters) > k:
            thr = sorted(counters.values(), reverse=True)[k]
            counters = {kk: v - thr for kk, v in counters.items() if v > thr}
    assert 7 in counters
    assert len(counters) <= k
    # undercount bounded by n/(K+1)
    assert counters[7] >= 60 - len(vals) // (k + 1)


def test_hof_identities(spark, sf_dir):
    # aggregate∘transform(×2) ≡ 2·Σ, zip_with(arr,arr,·) fold ≡ Σv²,
    # map routes ≡ column arithmetic — checked against direct plans
    res = higher_order_functions_conformance(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.col("value") * 100).cast("long").alias("v"),
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )
    direct = ev.groupBy("user_id").agg(
        (2 * F.sum("v")).alias("sum2"),
        F.sum(F.col("v") * F.col("v")).alias("sumsq"),
        F.sum("k").alias("sum_k"),
    )
    j = res.join(direct, "user_id", "full")
    assert (
        j.filter(
            (res.sum2 != direct.sum2)
            | (res.sumsq != direct.sumsq)
            | (res.sum_k != direct.sum_k)
            | (res.sum_k3 != 3 * direct.sum_k)
            | (res.sum_k_upper != direct.sum_k)
        ).count()
        == 0
    )


def test_left_outer_extends_inner_with_watermark_gated_nulls(spark, sf_dir):
    inner = stream_stream_join(spark, sf_dir).collect()
    outer = stream_stream_left_outer(spark, sf_dir).collect()
    matched = [r for r in outer if r.click_id is not None]
    nulls = [r for r in outer if r.click_id is None]
    # matched rows are exactly the inner join
    assert sorted((r.purchase_id, r.click_id) for r in matched) == sorted(
        (r.purchase_id, r.click_id) for r in inner
    )
    # null rows: gap is null too, and only for purchases with no click
    matched_p = {r.purchase_id for r in matched}
    assert all(r.gap_s is None for r in nulls)
    assert all(r.purchase_id not in matched_p for r in nulls)
    # watermark gate: no null row may carry an event time inside the
    # final watermark window (min-policy watermark, 10 min delay)
    ev = load_table(spark, sf_dir, "events")
    wm = ev.groupBy().agg(
        F.least(
            F.max(F.when(F.col("event_type") == "click", F.col("ts"))),
            F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))),
        ).alias("m")
    ).collect()[0].m
    late_purchases = {
        r.event_id
        for r in ev.filter(
            (F.col("event_type") == "purchase")
            & (F.col("ts") >= F.lit(wm) - F.expr("INTERVAL 10 MINUTES"))
        ).collect()
    }
    assert all(r.purchase_id not in late_purchases for r in nulls)


def test_zorder_layout_bounds_both_dims(spark, sf_dir, tmp_path):
    # write events repartitionByRange on the z-value; every parquet
    # file must bound BOTH normalized dims well below the 256 domain
    # (a single-column sort bounds one and spans ~256 on the other)
    from pyspark.sql import functions as F

    from cdc_realtime_pipeline_spark.operators.dq import (
        _EPOCH_2024,
        _zvalue_spark,
    )

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
    dims = raw.crossJoin(F.broadcast(bounds)).select(
        F.expr("((u - u_lo) * 256) DIV (u_hi - u_lo + 1)").alias("xu"),
        F.expr("((m - m_lo) * 256) DIV (m_hi - m_lo + 1)").alias("ym"),
    )
    # tile-aligned buckets: 2^12 consecutive z-values = one 64x64
    # Morton tile (power-of-4 blocks are contiguous on the z-curve);
    # 32 range partitions over 16 distinct bucket values gives each
    # occupied tile its own file — arbitrary range cuts on raw z may
    # straddle quadrant boundaries and span wide in one dim
    zed = dims.withColumn(
        "zb", F.shiftright(_zvalue_spark(F.col("xu"), F.col("ym")), 12)
    )
    out = str(tmp_path / "zorder")
    zed.repartitionByRange(32, "zb").write.parquet(out)
    per_file = (
        spark.read.parquet(out)
        .groupBy(F.input_file_name())
        .agg(
            (F.max("xu") - F.min("xu")).alias("span_u"),
            (F.max("ym") - F.min("ym")).alias("span_m"),
        )
        .collect()
    )
    assert len(per_file) >= 8
    # both dims bounded: every file stays inside one 64x64 tile
    assert all(r.span_u <= 64 and r.span_m <= 64 for r in per_file)
    # and the layout is genuinely 2-D: total area covered is far less
    # than files x full-domain
    assert sum((r.span_u + 1) * (r.span_m + 1) for r in per_file) < len(
        per_file
    ) * 256 * 256 / 4
