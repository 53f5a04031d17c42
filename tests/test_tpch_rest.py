"""Plan + semantics pins for the TPC-H shape-completion block
(relational_tpch.py): the properties that make each shape scale, and
the semantic edges the oracle hash can't isolate on its own.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from cdc_realtime_pipeline_spark.operators import relational_tpch as rt


def _plan(spark, name, sf_dir) -> str:
    df = rt.QUERIES[name](spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q7_dims_broadcast_no_cartesian(spark, sf_dir):
    plan = _plan(spark, "tpch_q7_like", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the fact side shuffles once for li ⋈ orders; the bloc dims never
    # force a SortMergeJoin of the fact against a dim
    assert plan.count("SortMergeJoin") <= 1


def test_q10_aggregates_before_dim_join(spark, sf_dir):
    # revenue is grouped per customer BEFORE the customer/nation join —
    # the dim join input is customer-sized, so the plan must place a
    # HashAggregate below the BroadcastHashJoin, and the top-20 must be
    # TakeOrderedAndProject, not a global sort.
    plan = _plan(spark, "tpch_q10_like", sf_dir)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    agg_pos = plan.index("HashAggregate")
    join_pos = plan.index("BroadcastHashJoin")
    assert agg_pos > join_pos or "Exchange hashpartitioning(o_custkey" in plan


def test_q13_left_outer_counts_zero_order_customers(spark, sf_dir):
    # every customer appears in the inner aggregate, including those
    # whose only orders are urgent (they count 0) — total custdist
    # must equal the customer count.
    out = rt.QUERIES["tpch_q13_like"](spark, sf_dir)
    from cdc_realtime_pipeline_spark.session import load_table

    n_cust = load_table(spark, sf_dir, "customer").count()
    assert out.agg(F.sum("custdist")).collect()[0][0] == n_cust


def test_q15_max_via_broadcast_scalar_not_global_window(spark, sf_dir):
    plan = _plan(spark, "tpch_q15_like", sf_dir)
    # no Window operator over an empty partition spec (single-task
    # funnel); the max arrives as a broadcast join against a 1-row
    # aggregate (Catalyst renders the crossJoin as either a broadcast
    # NLJ or a degenerate BroadcastHashJoin Cross)
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin Cross" in plan


def test_q16_not_in_is_anti_join(spark, sf_dir):
    plan = _plan(spark, "tpch_q16_like", sf_dir)
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_q20_reuses_pair_aggregate_for_part_totals(spark, sf_dir):
    # the per-part total re-aggregates per-pair partials: the plan has
    # ≥2 aggregate pairs but only ONE lineitem scan
    plan = _plan(spark, "tpch_q20_like", sf_dir)
    # the scan's Location line names the file once per scan subtree
    assert plan.count("lineitem.parquet") == 1


def test_q22_anti_join_and_broadcast_threshold(spark, sf_dir):
    plan = _plan(spark, "tpch_q22_like", sf_dir)
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row avg threshold


def test_q22_threshold_strictly_filters(spark, sf_dir):
    # every surviving group's balances exceed the global positive avg
    from cdc_realtime_pipeline_spark.session import load_table

    cust = load_table(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal")).collect()[0][0]
    out = rt.QUERIES["tpch_q22_like"](spark, sf_dir)
    rows = out.collect()
    for r in rows:
        # min possible balance in the group is > avg_bal ⇒ the summed
        # balance must exceed numcust × avg_bal
        assert r["totacctbal"] > r["numcust"] * avg_bal
