"""TTL retention + compaction over the month-partitioned layout."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from cdc_realtime_pipeline_spark.operators.maintenance import (
    compact_partition,
    drop_expired_partitions,
    list_month_partitions,
    retention_horizon,
)
from cdc_realtime_pipeline_spark.session import load_table


def _partitioned_table(spark, sf_dir):
    out = tempfile.mkdtemp(prefix="ttl_") + "/t"
    ev = load_table(spark, sf_dir, "events").withColumn(
        # spread fixture data over 3 synthetic months
        "month", F.concat(F.lit("2024"), F.lpad((F.col("event_id") % 3 + 1).cast("string"), 2, "0"))
    )
    ev.write.partitionBy("month").parquet(out)
    return out


def test_ttl_drops_only_expired_months(spark, sf_dir):
    out = _partitioned_table(spark, sf_dir)
    months = list_month_partitions(out)
    assert months == ["202401", "202402", "202403"]
    keep = retention_horizon(months, keep_last=2)
    dropped = drop_expired_partitions(out, keep)
    assert dropped == ["202401"]
    assert list_month_partitions(out) == ["202402", "202403"]
    # remaining data intact and readable
    left = spark.read.parquet(out)
    assert left.select("month").distinct().count() == 2


def test_ttl_idempotent(spark, sf_dir):
    out = _partitioned_table(spark, sf_dir)
    keep = retention_horizon(list_month_partitions(out), keep_last=2)
    drop_expired_partitions(out, keep)
    assert drop_expired_partitions(out, keep) == []  # second run: no-op


def test_compaction_preserves_rows(spark, sf_dir):
    out = _partitioned_table(spark, sf_dir)
    part = os.path.join(out, "month=202401")
    before = spark.read.parquet(part).count()
    n_files = compact_partition(spark, out, "202401", target_files=1)
    assert n_files >= 1
    after_files = [f for f in os.listdir(part) if f.endswith(".parquet")]
    assert len(after_files) == 1
    assert spark.read.parquet(part).count() == before


def test_backfill_replaces_one_month_only(spark, tmp_path):
    from cdc_realtime_pipeline_spark.operators.maintenance import (
        backfill_partition,
    )

    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "202401"), (2, "202401"), (3, "202402")], "id long, month string"
    )
    df.write.partitionBy("month").parquet(t)

    fixed = spark.createDataFrame([(20, "202401"), (21, "202401"), (22, "202401")],
                                  "id long, month string").drop("month")
    n = backfill_partition(spark, t, "202401", fixed)
    assert n == 3

    out = spark.read.parquet(t)
    jan = {r["id"] for r in out.filter("month = '202401'").collect()}
    feb = {r["id"] for r in out.filter("month = '202402'").collect()}
    assert jan == {20, 21, 22}  # replaced
    assert feb == {3}  # untouched

    # idempotent: running the same backfill again yields the same state
    backfill_partition(spark, t, "202401", fixed)
    out2 = spark.read.parquet(t)
    assert {r["id"] for r in out2.filter("month = '202401'").collect()} == {20, 21, 22}


def test_schema_evolution_read_merges_and_nullfills(spark, tmp_path):
    from cdc_realtime_pipeline_spark.operators.maintenance import (
        read_with_schema_evolution,
    )

    t = str(tmp_path / "evo")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(
        t + "/batch=1"
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.parquet(t + "/batch=2")

    out = read_with_schema_evolution(spark, t)
    assert set(out.columns) >= {"id", "name", "score"}
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["score"] is None  # null-filled for the old file
    assert rows[2]["score"] == 9.5


def test_wap_publishes_only_after_audits_pass(spark, tmp_path):
    import pytest

    from cdc_realtime_pipeline_spark.operators.maintenance import (
        AuditFailure,
        write_audit_publish,
    )

    t = str(tmp_path / "wap")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    n = write_audit_publish(
        spark, v1, t, [lambda d: d.count() == 2, lambda d: d.filter("id is null").count() == 0]
    )
    assert n == 2

    # a failing audit must leave v1 live and readable
    v2_bad = spark.createDataFrame([(3, None)], "id long, name string")

    def no_null_names(d):
        return d.filter("name is null").count() == 0

    with pytest.raises(AuditFailure):
        write_audit_publish(spark, v2_bad, t, [no_null_names])
    live = {r["id"] for r in spark.read.parquet(t).collect()}
    assert live == {1, 2}

    # a passing second version promotes
    v2 = spark.createDataFrame([(3, "c")], "id long, name string")
    assert write_audit_publish(spark, v2, t, [no_null_names]) == 1
    assert {r["id"] for r in spark.read.parquet(t).collect()} == {3}
