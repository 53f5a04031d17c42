"""Invariant tests for the round-6 statistical-inference operators.

The oracle harness checks cross-engine equality; these pin the
STATISTICAL claims against independent numpy recomputations on the
sf0.001 fixture — the oracle can't catch a formula that is identically
wrong on both engines.
"""

from __future__ import annotations

import json
import math

import numpy as np
from pyspark.sql import functions as F

from cdc_realtime_pipeline_spark.operators.inference import (
    events_autocorr_lag1,
    events_ols_two_factor,
    market_basket_rules,
    mi_event_value_bands,
    source_welch_ttest,
    value_ks_grid,
)
from cdc_realtime_pipeline_spark.session import load_table


def _events_np(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value", "props", "ts", "user_id")
        .collect()
    )
    return rows


def test_ols_matches_numpy_lstsq(spark, sf_dir):
    got = {r.event_type: r for r in events_ols_two_factor(spark, sf_dir).collect()}
    rows = _events_np(spark, sf_dir)
    by_type: dict[str, list] = {}
    for r in rows:
        k = json.loads(r.props).get("k") if r.props else None
        if k is None:
            continue
        by_type.setdefault(r.event_type, []).append(
            (float(k), float(r.ts.hour), float(r.value))
        )
    for et, triples in by_type.items():
        a = np.array(triples)
        X = np.column_stack([np.ones(len(a)), a[:, 0], a[:, 1]])
        beta, *_ = np.linalg.lstsq(X, a[:, 2], rcond=None)
        assert got[et].n_rows == len(triples)
        assert math.isclose(got[et].b0, beta[0], rel_tol=1e-3, abs_tol=1e-4)
        assert math.isclose(got[et].b_k, beta[1], rel_tol=1e-3, abs_tol=1e-4)
        assert math.isclose(got[et].b_hour, beta[2], rel_tol=1e-3, abs_tol=1e-4)
        # R² in [0, 1] and matches the residual definition
        pred = X @ beta
        ss_res = float(np.sum((a[:, 2] - pred) ** 2))
        ss_tot = float(np.sum((a[:, 2] - a[:, 2].mean()) ** 2))
        assert math.isclose(got[et].r2, 1 - ss_res / ss_tot, abs_tol=1e-4)


def test_welch_matches_numpy(spark, sf_dir):
    got = {r.source: r for r in source_welch_ttest(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars").collect()
    xs: dict[str, list] = {}
    for r in docs:
        xs.setdefault(r.source, []).append(float(r.n_chars))
    all_x = np.array([x for v in xs.values() for x in v])
    for src, v in xs.items():
        a = np.array(v)
        b = np.array([x for s2, v2 in xs.items() if s2 != src for x in v2])
        v1, v2 = a.var(ddof=1), b.var(ddof=1)
        se2 = v1 / len(a) + v2 / len(b)
        t = (a.mean() - b.mean()) / math.sqrt(se2)
        df = se2**2 / (
            (v1 / len(a)) ** 2 / (len(a) - 1) + (v2 / len(b)) ** 2 / (len(b) - 1)
        )
        assert got[src].n_docs == len(v)
        assert math.isclose(got[src].mean_chars, a.mean(), rel_tol=1e-6, abs_tol=1e-3)
        assert math.isclose(got[src].t_stat, t, rel_tol=1e-3, abs_tol=1e-3)
        assert math.isclose(got[src].welch_df, df, rel_tol=1e-3, abs_tol=0.05)
    assert len(all_x) == sum(len(v) for v in xs.values())


def test_mi_nonnegative_and_matches_numpy(spark, sf_dir):
    got = {r.event_type: r for r in mi_event_value_bands(spark, sf_dir).collect()}
    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.floor(F.col("value") / 10).cast("long").alias("band"))
        .collect()
    )
    joint: dict[tuple, int] = {}
    for r in rows:
        joint[(r.event_type, r.band)] = joint.get((r.event_type, r.band), 0) + 1
    n = sum(joint.values())
    cx: dict[str, int] = {}
    cy: dict[int, int] = {}
    for (x, y), c in joint.items():
        cx[x] = cx.get(x, 0) + c
        cy[y] = cy.get(y, 0) + c
    mi_by_x: dict[str, float] = {}
    for (x, y), c in joint.items():
        mi_by_x[x] = mi_by_x.get(x, 0.0) + (c / n) * math.log2(c * n / (cx[x] * cy[y]))
    for et, mi in mi_by_x.items():
        assert math.isclose(got[et].mi_contrib, mi, rel_tol=1e-4, abs_tol=1e-5)
        assert got[et].n_rows == cx[et]
    # plug-in MI of the full joint is non-negative (up to 4dp rounding)
    assert sum(r.mi_contrib for r in got.values()) >= -1e-5


def test_ks_grid_matches_numpy(spark, sf_dir):
    row = value_ks_grid(spark, sf_dir).collect()[0]
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "purchase"))
        .select("event_type", "value")
        .collect()
    )
    a = np.array([r.value for r in ev if r.event_type == "view"])
    b = np.array([r.value for r in ev if r.event_type == "purchase"])
    cells = sorted({math.floor(v / 10.0) for v in np.concatenate([a, b])})
    d = 0.0
    for c in cells:
        ca = float(np.sum(np.floor(a / 10.0) <= c)) / len(a)
        cb = float(np.sum(np.floor(b / 10.0) <= c)) / len(b)
        d = max(d, abs(ca - cb))
    assert row.n_a == len(a) and row.n_b == len(b)
    assert 0.0 <= row.ks_d <= 1.0
    assert math.isclose(row.ks_d, d, abs_tol=1e-5)


def test_autocorr_matches_numpy(spark, sf_dir):
    got = {r.event_type: r for r in events_autocorr_lag1(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value").collect()
    series: dict[str, dict[int, float]] = {}
    for r in ev:
        bkt = int(r.ts.timestamp() // 300)
        series.setdefault(r.event_type, {})
        series[r.event_type][bkt] = series[r.event_type].get(bkt, 0.0) + r.value
    for et, s in series.items():
        vals = np.array([s[k] for k in sorted(s)])
        a, b = vals[1:], vals[:-1]
        r_np = float(np.corrcoef(a, b)[0, 1])
        assert got[et].n_pairs == len(a)
        assert -1.0 - 1e-9 <= got[et].acf1 <= 1.0 + 1e-9
        assert math.isclose(got[et].acf1, r_np, rel_tol=1e-4, abs_tol=1e-5)


def test_basket_rules_internally_consistent(spark, sf_dir):
    rows = market_basket_rules(spark, sf_dir).collect()
    assert rows, "top pairs expected on the fixture"
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    n_orders = len({r.l_orderkey for r in li})
    item_n: dict[int, int] = {}
    for r in li:
        item_n[r.l_partkey] = item_n.get(r.l_partkey, 0) + 1
    for r in rows:
        assert r.p_a < r.p_b
        assert r.c_ab >= 2
        # support = c_ab / N, conf = c_ab / c_item, lift = conf / P(b)
        assert math.isclose(r.support, r.c_ab / n_orders, abs_tol=1e-5)
        assert math.isclose(r.conf_a_b, r.c_ab / item_n[r.p_a], abs_tol=1e-5)
        assert math.isclose(r.conf_b_a, r.c_ab / item_n[r.p_b], abs_tol=1e-5)
        assert math.isclose(
            r.lift,
            r.c_ab * n_orders / (item_n[r.p_a] * item_n[r.p_b]),
            rel_tol=1e-3,
            abs_tol=1e-3,
        )
    # ranked by lift desc (ties by c_ab desc then pair)
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)
