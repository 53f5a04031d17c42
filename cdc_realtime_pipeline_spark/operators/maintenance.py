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

    Staged rewrite + rename-aside swap: readers see complete-old,
    complete-new, or a retryable path-not-found during the brief
    between-renames window — never a PARTIAL partition (caveats on the
    swap below). Returns the number of files before compaction.
    """
    part_dir = os.path.join(table_dir, f"month={month}")
    n_before = sum(1 for f in os.listdir(part_dir) if f.endswith(".parquet"))
    df = spark.read.parquet(part_dir)
    tmp = part_dir + "__compact_tmp"
    old = part_dir + "__compact_old"
    df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
    # Swap via rename-aside: crash-recoverable (a failure between the
    # renames leaves the data intact at ``__compact_old`` rather than
    # stranded in a tmp dir), at the cost of a BRIEF read-unavailability
    # window — between the two renames the live path does not exist, so
    # a reader racing the swap can fail with path-not-found and must
    # retry. Directory rename is also only atomic within one POSIX
    # filesystem; on an object store use a manifest/symlink swap or a
    # table format's metadata commit (Delta/Iceberg) instead.
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(part_dir, old)
    os.rename(tmp, part_dir)
    shutil.rmtree(old)
    return n_before


def backfill_partition(spark: SparkSession, table_dir: str, month: str, df) -> int:
    """Idempotent single-partition backfill — the reprocessing job that
    recomputes ONE month and swaps it in without touching neighbors
    (the lake analog of `INSERT OVERWRITE ... PARTITION (month=m)`;
    on Spark-managed tables the same contract is
    ``spark.sql.sources.partitionOverwriteMode=dynamic``).

    Uses the identical staged-rename protocol as ``compact_partition``:
    crash-recoverable (never a PARTIAL partition on the live path —
    a reader sees complete-old, complete-new, or a retryable
    path-not-found during the brief between-renames window; see the
    atomicity caveats noted there). Returns the row count written.

    ``df`` must contain exactly the recomputed rows for ``month`` —
    the caller filters; keeping the horizon outside makes the job
    re-runnable (same input → same bytes, safe under scheduler
    retries).
    """
    import shutil

    part_dir = os.path.join(table_dir, f"month={month}")
    tmp = part_dir + "__backfill_tmp"
    old = part_dir + "__backfill_old"
    n = df.count()
    df.write.mode("overwrite").parquet(tmp)
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(part_dir):
        os.rename(part_dir, old)
    os.rename(tmp, part_dir)
    shutil.rmtree(old, ignore_errors=True)
    return n


def read_with_schema_evolution(spark: SparkSession, table_dir: str):
    """Read a directory whose parquet files carry EVOLVED schemas
    (columns added over time — the normal life of a 100 TB lake table)
    into one unified DataFrame: ``mergeSchema`` unions the file
    footers' schemas and null-fills columns absent from older files.

    The read-side contract that lets writers add columns without a
    table-wide rewrite; pair with events_schema_drift (detection) and
    the CDC envelope's unknown-field tolerance (ingest side).
    """
    return spark.read.option("mergeSchema", "true").parquet(table_dir)


class AuditFailure(Exception):
    """Raised by write_audit_publish when an audit rejects the staged
    data; the live table is untouched."""


def write_audit_publish(spark: SparkSession, df, table_dir: str, audits) -> int:
    """Write-Audit-Publish — the staged-promotion protocol (Netflix's
    WAP / Iceberg branch-commit pattern): materialize the new table
    version to a staging path, run every audit callable against the
    STAGED data, and only then promote it over the live path (same
    rename-aside protocol as compaction/backfill — crash-recoverable
    with a brief read-unavailability window between the renames; see
    ``compact_partition`` for the POSIX/object-store caveats). A
    failing audit raises :class:`AuditFailure` and leaves the live
    table byte-identical — bad data is never readable, which is the
    entire point versus validate-after-write.

    ``audits`` is an iterable of callables ``(DataFrame) -> bool``
    over the staged read; returns the published row count. At scale
    the staging write is the same cost as the direct write — WAP buys
    the gate for free modulo one rename.
    """
    import shutil

    tmp = table_dir + "__wap_stage"
    old = table_dir + "__wap_old"
    df.write.mode("overwrite").parquet(tmp)
    staged = spark.read.parquet(tmp)
    for audit in audits:
        if not audit(staged):
            shutil.rmtree(tmp, ignore_errors=True)
            raise AuditFailure(f"audit {getattr(audit, '__name__', audit)!r} rejected staged data")
    n = staged.count()
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(table_dir):
        os.rename(table_dir, old)
    os.rename(tmp, table_dir)
    shutil.rmtree(old, ignore_errors=True)
    return n
