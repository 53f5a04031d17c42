"""Storage maintenance: TTL retention and partition compaction.

The reference ages data out with ClickHouse table TTLs
(``TTL … + INTERVAL 90 DAY`` — clickhouse/init.sql:27,53,74) and relies
on MergeTree background merges for small-part compaction. On a
Parquet/Delta lake both become scheduled jobs over the partition
layout (SURVEY.md §2.1 S7, §4 "TTL-based retention"):

* ``drop_expired_partitions`` — delete whole month partitions older
  than the retention horizon. Partition-granular: a directory unlink
  per month, no data rewrite, exactly like dropping a MergeTree part.
* ``compact_partition`` — rewrite one partition's many small files
  (streaming micro-batches leave one file per trigger) into few
  — the OPTIMIZE analog.

Both operate on the ``month=yyyyMM`` layout the streaming sinks write
(streaming/job.py).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def list_month_partitions(table_dir: str) -> list[str]:
    if not os.path.isdir(table_dir):
        return []
    return sorted(
        d.split("=", 1)[1]
        for d in os.listdir(table_dir)
        if d.startswith("month=") and os.path.isdir(os.path.join(table_dir, d))
    )


def drop_expired_partitions(table_dir: str, keep_months: list[str]) -> list[str]:
    """Drop month partitions not in ``keep_months``; returns dropped.

    Caller computes the horizon (e.g. last 3 calendar months) — keeping
    the policy outside makes the job idempotent and testable.
    """
    dropped = []
    for m in list_month_partitions(table_dir):
        if m not in keep_months:
            shutil.rmtree(os.path.join(table_dir, f"month={m}"))
            dropped.append(m)
    return dropped


def retention_horizon(months: list[str], keep_last: int) -> list[str]:
    """The most recent ``keep_last`` months of those present."""
    return sorted(months)[-keep_last:]


def compact_partition(spark: SparkSession, table_dir: str, month: str, target_files: int = 1) -> int:
    """Rewrite one month partition into ``target_files`` files.

    Staged rewrite + atomic rename so readers never see a half state.
    Returns the number of files before compaction.
    """
    part_dir = os.path.join(table_dir, f"month={month}")
    n_before = sum(1 for f in os.listdir(part_dir) if f.endswith(".parquet"))
    df = spark.read.parquet(part_dir)
    tmp = part_dir + "__compact_tmp"
    old = part_dir + "__compact_old"
    df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
    # Swap via rename-aside so the live path is never absent: a reader
    # racing the swap sees either the old or the new partition, and a
    # crash between the renames leaves the data recoverable at
    # ``__compact_old`` rather than stranded in a tmp dir with the
    # live path gone.
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(part_dir, old)
    os.rename(tmp, part_dir)
    shutil.rmtree(old)
    return n_before
