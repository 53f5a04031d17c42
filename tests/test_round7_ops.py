"""Invariant tests for the round-7 wave: PQ asymmetric-distance
search, classical STL decomposition, BH-FDR over hourly z-tests, and
the deterministic epoch-shuffle audit."""

from __future__ import annotations

import hashlib
import math

import numpy as np
from pyspark.sql import functions as F

from cdc_realtime_pipeline_spark.operators.corpus_ops import (
    corpus_epoch_shuffle_audit,
)
from cdc_realtime_pipeline_spark.operators.inference import hourly_value_fdr_bh
from cdc_realtime_pipeline_spark.operators.similarity import (
    _ADC_K,
    _PQ_CODES,
    _PQ_SUBDIM,
    _PQ_SUBS,
    N_QUERIES,
    similarity_pq_adc_topk,
)
from cdc_realtime_pipeline_spark.operators.timeseries import events_stl_decompose
from cdc_realtime_pipeline_spark.session import load_table


def _md5_uniform(key: str) -> float:
    h = hashlib.md5(key.encode()).hexdigest()
    return sum(int(h[i], 16) * 16.0 ** -(i + 1) for i in range(8))


def _pq_centroid(sub: int, code: int, sdim: int) -> float:
    return _md5_uniform(f"pq|{sub}|{code}|{sdim}") - 0.5


def test_pq_adc_topk_matches_numpy_replica(spark, sf_dir):
    got = similarity_pq_adc_topk(spark, sf_dir).collect()
    assert len(got) == N_QUERIES * _ADC_K
    # python replica: codebook, codes (8dp-round-then-argmin), LUT, ADC
    cb = np.array(
        [
            [[_pq_centroid(s, c, d) for d in range(_PQ_SUBDIM)]
             for c in range(_PQ_CODES)]
            for s in range(_PQ_SUBS)
        ]
    )  # (S, C, D)
    vecs = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    codes = {}
    luts = {}
    for vid, v in vecs.items():
        subs = v.reshape(_PQ_SUBS, _PQ_SUBDIM)
        d2 = np.round(((subs[:, None, :] - cb) ** 2).sum(axis=2) + 1e-9, 8)
        if vid < N_QUERIES:
            luts[vid] = d2  # full (S, C) table
        else:
            codes[vid] = d2.argmin(axis=1)  # ties: argmin -> lowest code
    for q in range(N_QUERIES):
        adc = {
            vid: round(sum(luts[q][s, c] for s, c in enumerate(cd)) + 1e-9, 6)
            for vid, cd in codes.items()
        }
        want = sorted(adc.items(), key=lambda kv: (kv[1], kv[0]))[:_ADC_K]
        rows = sorted((r for r in got if r.query_id == q), key=lambda r: r.rank)
        assert [(r.vec_id, r.adc_dist) for r in rows] == [
            (vid, d) for vid, d in want
        ]


def test_stl_decompose_identity_and_trend_frame(spark, sf_dir):
    rows = events_stl_decompose(spark, sf_dir).collect()
    assert rows
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for et, series in by_type.items():
        series.sort(key=lambda r: r.ts_hour)
        ys = [r.y for r in series]
        # trend: centered 25-row moving average, full frames only
        for i, r in enumerate(series):
            lo, hi = max(0, i - 12), min(len(series), i + 13)
            if hi - lo == 25:
                want = round(sum(ys[lo:hi]) / 25.0 + 1e-9, 4)
                assert r.trend is not None and math.isclose(
                    r.trend, want, abs_tol=5e-5
                )
            else:
                assert r.trend is None
        # seasonal: hour-of-day mean of detrended; additive identity
        detr: dict[int, list[float]] = {}
        for r in series:
            if r.trend is not None:
                hod = int(r.ts_hour.timestamp() // 3600) % 24
                detr.setdefault(hod, []).append(r.y - r.trend)
        for r in series:
            hod = int(r.ts_hour.timestamp() // 3600) % 24
            if r.trend is None or hod not in detr:
                continue
            want_seas = round(sum(detr[hod]) / len(detr[hod]) + 1e-9, 4)
            assert math.isclose(r.seasonal, want_seas, abs_tol=5e-4)
            assert math.isclose(
                r.resid, round(r.y - r.trend - r.seasonal + 1e-9, 4), abs_tol=5e-5
            )


def test_fdr_bh_matches_python_and_is_monotone(spark, sf_dir):
    got = {r.hour: r for r in hourly_value_fdr_bh(spark, sf_dir).collect()}
    assert len(got) == 24
    ev = load_table(spark, sf_dir, "events").select("ts", "value").collect()
    per: dict[int, list[float]] = {}
    for r in ev:
        per.setdefault(int(r.ts.timestamp() // 3600) % 24, []).append(
            float(r.value)
        )
    # exact z via Welch one-vs-rest, exact p via erfc; ours is the A&S
    # polynomial (|err| < 1.5e-7 two-sided) on the 4dp-rounded z
    allv = [v for vs in per.values() for v in vs]
    gn, gs, gss = len(allv), sum(allv), sum(v * v for v in allv)
    ps = {}
    for h, vs in per.items():
        n, s, ss = len(vs), sum(vs), sum(v * v for v in vs)
        nr, sr, ssr = gn - n, gs - s, gss - ss
        m, mr = s / n, sr / nr
        var = (ss - s * s / n) / (n - 1)
        varr = (ssr - sr * sr / nr) / (nr - 1)
        z = (m - mr) / math.sqrt(var / n + varr / nr)
        assert math.isclose(got[h].z_score, z, abs_tol=2e-4)
        p_exact = math.erfc(abs(round(z + 1e-9, 4)) / math.sqrt(2.0))
        assert abs(got[h].p_value - p_exact) < 2e-6
        ps[h] = got[h].p_value
    # BH step-up on the emitted (rounded) p-values
    order = sorted(ps, key=lambda h: (ps[h], h))
    m_hyp = len(order)
    tail_min = 1.0
    adj = {}
    for rk in range(m_hyp, 0, -1):
        h = order[rk - 1]
        tail_min = min(tail_min, ps[h] * m_hyp / rk)
        adj[h] = round(min(1.0, tail_min) + 1e-9, 6)
    for h in ps:
        assert math.isclose(got[h].p_bh, adj[h], abs_tol=2e-6)
        assert got[h].p_bh >= got[h].p_value - 1e-9
        assert got[h].significant == int(got[h].p_bh <= 0.10)


def test_epoch_shuffle_audit_independence(spark, sf_dir):
    rows = corpus_epoch_shuffle_audit(spark, sf_dir).collect()
    assert [(r.epoch_a, r.epoch_b) for r in rows] == [(0, 1), (0, 2), (1, 2)]
    doc_ids = [
        r.doc_id for r in load_table(spark, sf_dir, "documents")
        .select("doc_id").collect()
    ]
    n = len(doc_ids)
    u = {
        e: np.array([_md5_uniform(f"ep{e}|{d}") for d in doc_ids])
        for e in range(3)
    }
    for r in rows:
        assert r.n_docs == n
        want = round(float(np.corrcoef(u[r.epoch_a], u[r.epoch_b])[0, 1]) + 1e-9, 6)
        assert math.isclose(r.rho_u, want, abs_tol=2e-6)
        # independence: |rho| within ~4 standard errors of 0
        assert abs(r.rho_u) < 4.0 / math.sqrt(n)
        # 16x16 contingency chi-square ~ chi2(255): mean 255, sd ~22.6
        assert 120.0 < r.chisq_256 < 420.0


def _norm(text: str) -> list[str]:
    import re

    t = re.sub(r"[^a-z0-9\s]", " ", text.lower())
    t = re.sub(r"\s+", " ", t).strip()
    return [w for w in t.split(" ") if w]


def test_kn_perplexity_bands_matches_python(spark, sf_dir):
    from collections import Counter

    from cdc_realtime_pipeline_spark.operators.curation import (
        _KN_D,
        text_kn_perplexity_bands,
    )

    got = {(r.source, r.ce_band): r for r in
           text_kn_perplexity_bands(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    pairs_by_doc = {}
    cnt: Counter = Counter()
    for d in docs:
        ws = _norm(d.text)
        if len(ws) < 2:
            continue
        bgs = list(zip(ws[:-1], ws[1:]))
        pairs_by_doc[(d.doc_id, d.source)] = bgs
        cnt.update(bgs)
    c1: Counter = Counter()
    n1f: Counter = Counter()
    n1p: Counter = Counter()
    for (w1, w2), c in cnt.items():
        c1[w1] += c
        n1f[w1] += 1
        n1p[w2] += 1
    tt = float(len(cnt))
    lp = {
        bg: math.log2(
            max(c - _KN_D, 0.0) / c1[bg[0]]
            + _KN_D * n1f[bg[0]] / c1[bg[0]] * (n1p[bg[1]] / tt)
        )
        for bg, c in cnt.items()
    }
    want: dict = {}
    for (doc_id, source), bgs in pairs_by_doc.items():
        ce = round(-sum(lp[b] for b in bgs) / len(bgs) + 1e-9, 4)
        key = (source, int(math.floor(ce)))
        want.setdefault(key, []).append((ce, len(bgs)))
    assert set(got) == set(want)
    for key, entries in want.items():
        r = got[key]
        assert r.n_docs == len(entries)
        assert r.n_bigrams == sum(nb for _, nb in entries)
        avg_ce = round(sum(ce for ce, _ in entries) / len(entries) + 1e-9, 4)
        assert math.isclose(r.avg_ce, avg_ce, abs_tol=5e-4)
        # band edges honored on the rounded per-doc CE
        assert all(key[1] <= ce < key[1] + 1 for ce, _ in entries)


def test_quality_logistic_gate_matches_numpy_irls(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.curation import (
        _QLG_CAP,
        _QLG_ITERS,
        docs_quality_logistic_gate,
    )

    got = docs_quality_logistic_gate(spark, sf_dir).collect()[0]
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "text", "n_chars"
    ).collect()
    rows = []
    for d in docs:
        nt = float(len(_norm(d.text)))
        rows.append(
            (
                1.0 if d.lang == "en" else 0.0,
                math.log(1.0 + nt),
                float(d.n_chars) / (1.0 + nt),
            )
        )
    y = np.array([r[0] for r in rows])
    X = np.column_stack(
        [np.ones(len(rows)), [r[1] for r in rows], [r[2] for r in rows]]
    )
    b = np.array([round(math.log(y.mean() / (1 - y.mean())) + 1e-12, 8), 0.0, 0.0])
    for _ in range(_QLG_ITERS):
        eta = np.clip(X @ b, -_QLG_CAP, _QLG_CAP)
        mu = 1.0 / (1.0 + np.exp(-eta))
        w = mu * (1.0 - mu)
        z = eta + (y - mu) / w
        A = X.T @ (w[:, None] * X)
        r = X.T @ (w * z)
        b = np.round(np.linalg.solve(A, r) + 1e-12, 8)
    assert got.n_docs == len(rows)
    assert math.isclose(got.b0, b[0], abs_tol=2e-5)
    assert math.isclose(got.b_logtok, b[1], abs_tol=2e-5)
    assert math.isclose(got.b_wlen, b[2], abs_tol=2e-5)
    eta = np.clip(X @ b, -_QLG_CAP, _QLG_CAP)
    pred = (eta > 0).astype(float)
    assert got.n_correct_at_half == int((pred == y).sum())
    assert got.n_kept == int(pred.sum())
    assert math.isclose(got.base_rate, round(y.mean() + 1e-9, 4), abs_tol=1e-9)


def test_ivfpq_topk_is_cell_restricted_adc(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.similarity import (
        similarity_ivfpq_topk,
    )

    got = similarity_ivfpq_topk(spark, sf_dir).collect()
    assert len(got) == N_QUERIES * _ADC_K
    cb = np.array(
        [
            [[_pq_centroid(s, c, d) for d in range(_PQ_SUBDIM)]
             for c in range(_PQ_CODES)]
            for s in range(_PQ_SUBS)
        ]
    )
    vecs = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    cents = {cid: vecs[cid] for cid in range(4)}

    def cell_of(v):
        cos = {
            cid: float(v @ c) / (np.linalg.norm(v) * np.linalg.norm(c))
            for cid, c in cents.items()
        }
        return max(cos, key=lambda cid: (cos[cid], -cid))

    cells = {vid: cell_of(v) for vid, v in vecs.items()}
    codes, luts = {}, {}
    for vid, v in vecs.items():
        d2 = np.round(
            ((v.reshape(_PQ_SUBS, _PQ_SUBDIM)[:, None, :] - cb) ** 2).sum(axis=2)
            + 1e-9, 8,
        )
        if vid < N_QUERIES:
            luts[vid] = d2
        else:
            codes[vid] = d2.argmin(axis=1)
    for q in range(N_QUERIES):
        cand = {
            vid: round(sum(luts[q][s, c] for s, c in enumerate(cd)) + 1e-9, 6)
            for vid, cd in codes.items()
            if cells[vid] == cells[q]
        }
        want = sorted(cand.items(), key=lambda kv: (kv[1], kv[0]))[:_ADC_K]
        rows = sorted((r for r in got if r.query_id == q), key=lambda r: r.rank)
        assert [(r.vec_id, r.adc_dist) for r in rows] == want
        assert all(r.cell_id == cells[q] for r in rows)


def test_pot_gpd_fit_matches_python_pwm(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.inference import value_pot_gpd_fit

    got = {r.event_type: r for r in value_pot_gpd_fit(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select("event_type", "value").collect()
    per: dict[str, list[float]] = {}
    for r in ev:
        per.setdefault(r.event_type, []).append(float(r.value))
    for et, vs in per.items():
        vs.sort()
        # exact continuous-interpolation p95 (the percentile/quantile_cont
        # definition), rounded 6dp as the operator does
        pos = 0.95 * (len(vs) - 1)
        lo = int(math.floor(pos))
        u = round(vs[lo] + (pos - lo) * (vs[min(lo + 1, len(vs) - 1)] - vs[lo])
                  + 1e-9, 6)
        y = sorted(v - u for v in vs if v > u)
        n = len(y)
        a0 = sum(y) / n
        a1 = sum(
            yi * (1.0 - (i + 1 - 0.35) / n) for i, yi in enumerate(y)
        ) / n
        r_ = a0 / (2.0 * a1)
        xi = (r_ - 2.0) / (r_ - 1.0)
        sigma = a0 * (1.0 - xi)
        g = got[et]
        assert g.n_exceed == n
        assert math.isclose(g.threshold, round(u, 4), abs_tol=1e-9)
        assert math.isclose(g.mean_excess, a0, abs_tol=2e-4)
        assert math.isclose(g.gpd_xi, xi, abs_tol=2e-5)
        assert math.isclose(g.gpd_sigma, sigma, abs_tol=2e-4)
        q = (sigma / xi * (0.01 ** -xi - 1.0)) if abs(xi) >= 1e-9 \
            else sigma * math.log(100.0)
        # emitted q01 is computed from the ROUNDED xi/sigma
        q_emitted = (
            g.gpd_sigma / g.gpd_xi * (0.01 ** -g.gpd_xi - 1.0)
            if abs(g.gpd_xi) >= 1e-9 else g.gpd_sigma * math.log(100.0)
        )
        assert math.isclose(g.tail_q01_excess, round(q_emitted + 1e-9, 4),
                            abs_tol=1e-9)
        assert math.isclose(q, q_emitted, rel_tol=1e-2)
        # sanity: the within-tail 1% quantile exceeds the mean excess
        assert g.tail_q01_excess > g.mean_excess
