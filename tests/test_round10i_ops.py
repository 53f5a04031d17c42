"""Round-10 wave 12: Theil decomposition, boilerplate n-grams."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_theil_decomposition_identity(spark, sf_dir):
    """The decomposition identity holds: T_total ≈ T_between +
    Σ contribution; weights sum to 1; every component is
    non-negative (Theil-T over positive values)."""
    from cdc_realtime_pipeline_spark.operators.inference import (
        customer_theil_decomposition,
    )

    rows = customer_theil_decomposition(spark, sf_dir).collect()
    assert rows
    t_total = rows[0]["t_total"]
    t_between = rows[0]["t_between"]
    contrib = sum(r["contribution"] for r in rows)
    assert abs(t_total - (t_between + contrib)) < 1e-3
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-3
    assert t_total >= 0.0 and t_between >= -1e-9
    for r in rows:
        assert r["t_within"] >= -1e-9
        assert r["n_customers"] >= 1
        assert r["mean_value"] > 0
        assert r["t_total"] == t_total and r["t_between"] == t_between


def test_boilerplate_planted_positive(spark, sf_dir):
    """Per-source top grams come ranked 1..3, coverage is a valid
    share, the flag matches its integer definition, and the top
    gram's coverage dominates its source's other reported grams."""
    from cdc_realtime_pipeline_spark.operators.text_ops import (
        _BP_TOP,
        docs_boilerplate_ngrams,
    )

    rows = docs_boilerplate_ngrams(spark, sf_dir).collect()
    assert rows
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= _BP_TOP
        dfs = [r["df"] for r in rs]
        assert dfs == sorted(dfs, reverse=True)
        for r in rs:
            assert 0.0 < r["coverage"] <= 1.0
            assert r["is_boilerplate"] == int(2 * r["df"] >= r["n_docs"])
            assert len(r["gram"].split(" ")) == 5


def test_logrank_risk_set_identities(spark, sf_dir):
    """Arm sizes partition the customer base, the statistic is
    non-negative with positive variance, and O-E squared over V
    reproduces chi2."""
    from cdc_realtime_pipeline_spark.operators.inference import (
        orders_logrank_test,
    )

    r = orders_logrank_test(spark, sf_dir).collect()[0]
    n_cust = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert r["n_arm0"] + r["n_arm1"] == n_cust
    assert r["variance"] > 0
    assert r["chi2"] >= 0
    assert abs(r["chi2"] - r["o_minus_e"] ** 2 / r["variance"]) < 1e-2
    assert r["n_event_times"] >= 1
