"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 (plus the
LLM-data-pipeline extensions), as (spark, sf_dir) → DataFrame.
``oracle_sql()`` — DuckDB-equivalent SQL per query; names without an
oracle are approximate or non-SQL-expressible operators (each
documents why at its definition site) and get rows-only checks.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdc_realtime_pipeline_spark.plans.registry import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's core
    operator — the 5-minute keyed window aggregate with vwap and
    bid/ask split (SURVEY.md §2.3 A1-A3)."""
    from cdc_realtime_pipeline_spark.operators.window_agg import events_window_agg_5m

    return events_window_agg_5m(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
