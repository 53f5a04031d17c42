"""Cross-engine conformance pins for the decimal arithmetic row.

VERDICT r3 #1 follow-up: ``decimal_arithmetic_conformance`` hash-failed
at the round-3 gate because the oracle's ``avg(DECIMAL)`` transits
DOUBLE in DuckDB. These tests pin, with planted literals, every tie
class the fixed query (operators/extended.py) relies on:

* decimal ``round(x, 2)`` at an exact ``.xx5`` tie is half-AWAY-FROM-
  ZERO on BOTH engines (Spark HALF_UP == DuckDB decimal round);
* the integer half-up average formula ``sign(su)·((2|su|+n) div (2n))``
  agrees between Spark's ``div`` and DuckDB's ``//`` including the
  exact ``.5`` tie and negative sums;
* the double→decimal cast tie class that CAN diverge (DuckDB rounds
  the binary expansion, Spark the shortest repr) is proven neutralized
  by the 4dp nudge-round-first discipline.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


def test_decimal_round_half_ties(spark):
    # planted ties: 2.005 and -2.005 at scale 4 → round to 2 decimals
    ties = [("2.0050",), ("-2.0050",), ("0.0050",), ("1.1250",)]
    df = spark.createDataFrame(ties, ["s"]).select(
        F.col("s").cast("decimal(18,4)").alias("dv")
    )
    got = sorted(
        str(r[0]) for r in df.select(F.round("dv", 2).alias("r")).collect()
    )
    oracle = sorted(
        str(r[0])
        for r in duckdb.sql(
            "SELECT round(CAST(s AS DECIMAL(18,4)), 2) FROM (VALUES"
            " ('2.0050'), ('-2.0050'), ('0.0050'), ('1.1250')) t(s)"
        ).fetchall()
    )
    assert got == oracle == ["-2.01", "0.01", "1.13", "2.01"]


@pytest.mark.parametrize(
    "su,n,expect",
    [
        (5, 2, 3),  # 2.5 → 3 (half up)
        (-5, 2, -3),  # -2.5 → -3 (half away from zero)
        (7, 2, 4),  # 3.5 → 4
        (20050, 10000, 2),  # 2.005 → 2
        (0, 3, 0),
        (1, 3, 0),  # 0.333 → 0
        (2, 3, 1),  # 0.667 → 1
    ],
)
def test_integer_half_up_avg_formula(spark, su, n, expect):
    df = spark.createDataFrame([(su, n)], ["su", "n"])
    got = df.select(
        (
            F.signum("su").cast("long")
            * F.expr("(2 * abs(su) + n) div (2 * n)")
        ).alias("au")
    ).collect()[0][0]
    oracle = duckdb.sql(
        f"SELECT CAST(sign(su) AS BIGINT) * ((2*abs(su) + n) // (2*n)) "
        f"FROM (VALUES (CAST({su} AS BIGINT), CAST({n} AS BIGINT))) t(su, n)"
    ).fetchall()[0][0]
    assert got == oracle == expect


def test_double_to_decimal_cast_ties(spark):
    # DuckDB decimal→decimal DOWNSCALE truncates (2.00005 @ scale 5 →
    # 2.0000 @ scale 4) — a trap for probes written with bare SQL
    # literals, which DuckDB types as DECIMAL, not DOUBLE.
    assert (
        str(
            duckdb.sql(
                "SELECT CAST(CAST('2.00005' AS DECIMAL(18,5)) AS DECIMAL(18,4))"
            ).fetchall()[0][0]
        )
        == "2.0000"
    )
    # The actual query path (parquet DOUBLE column → decimal cast) uses
    # shortest-repr half-up on BOTH engines; pin that, and pin that the
    # belt-and-braces nudge-round-first path agrees too.
    ties = [2.00005, 2.00015, 0.00005, 123.45675, 0.99995, 55.55555]
    duck_raw = duckdb.sql(
        "SELECT " + ", ".join(f"CAST({v!r}::DOUBLE AS DECIMAL(18,4))" for v in ties)
    ).fetchall()[0]
    duck_fixed = duckdb.sql(
        "SELECT "
        + ", ".join(
            f"CAST(round({v!r}::DOUBLE + 1e-9, 4) AS DECIMAL(18,4))" for v in ties
        )
    ).fetchall()[0]
    df = spark.createDataFrame([(v,) for v in ties], ["v"])
    spark_raw = [
        str(r[0]) for r in df.select(F.col("v").cast("decimal(18,4)")).collect()
    ]
    spark_fixed = [
        str(r[0])
        for r in df.select(
            F.round(F.col("v") + 1e-9, 4).cast("decimal(18,4)")
        ).collect()
    ]
    assert spark_raw == [str(x) for x in duck_raw]
    assert spark_fixed == [str(x) for x in duck_fixed]


def test_decimal_floor_grid_bit_identical(spark):
    """VERDICT r4 #1: the nudge-round form ``round(v + 1e-9, 4)`` still
    diverges on doubles shaped ``gridpoint + 0.00005 − 1e-9`` (the nudge
    lands the value exactly on a .00005 tie, where Spark's shortest-repr
    HALF_UP and DuckDB's scaled-float round disagree in BOTH
    directions). The round-5 derivation
    ``u = CAST(floor(v*1e4 + 0.5 + 1e-6) AS BIGINT)`` uses only single
    correctly-rounded IEEE primitives, so it is bit-identical by
    construction — pinned here on the judge's planted boundary doubles
    plus the previous tie classes.
    """
    planted = [
        304.382349999,  # judge-planted: nudge lands on 304.38235 tie
        484.039749999,  # judge-planted: engines disagreed in the other direction
        2.00005,
        2.000049999,
        0.00005,
        123.45675,
        0.99995,
        55.55555,
        -2.00005,  # negative side of the grid (floor half-up toward +inf,
        -0.000049999,  # but identically so on both engines)
    ]
    duck_u = list(
        duckdb.sql(
            "SELECT "
            + ", ".join(
                f"CAST(floor({v!r}::DOUBLE * CAST(10000 AS DOUBLE)"
                f" + CAST(0.5 AS DOUBLE) + 1e-6) AS BIGINT)"
                for v in planted
            )
        ).fetchall()[0]
    )
    df = spark.createDataFrame([(v,) for v in planted], ["v"])
    spark_u = [
        r[0]
        for r in df.select(
            F.floor(F.col("v") * 10000.0 + 0.5 + 1e-6).cast("long").alias("u")
        ).collect()
    ]
    assert spark_u == duck_u
    # and the exact integer→decimal scaling step agrees too
    duck_dv = [
        str(x)
        for x in duckdb.sql(
            "SELECT "
            + ", ".join(
                f"CAST(CAST({u} AS DECIMAL(18,0)) * CAST('0.0001' AS DECIMAL(5,4))"
                f" AS DECIMAL(18,4))"
                for u in duck_u
            )
        ).fetchall()[0]
    ]
    unit = F.lit("0.0001").cast("decimal(5,4)")
    spark_dv = [
        str(r[0])
        for r in spark.createDataFrame([(u,) for u in spark_u], ["u"])
        .select((F.col("u").cast("decimal(18,0)") * unit).cast("decimal(18,4)"))
        .collect()
    ]
    assert spark_dv == duck_dv
