"""Property-based tests (hypothesis) for the late-round-5 operators'
pure kernels — the invariants that must hold on ANY input, not just
the fixtures: CEP batch-split equivalence, skyline sweep ≡ quadratic
definition, windowFunnel greedy ≡ existential chain, Benford ladder ≡
normalize loop, seeded-uniform exactness."""

from __future__ import annotations

import hashlib
import math

import pandas as pd
from hypothesis import given, settings, strategies as st


# --- CEP: splitting the stream at any batch boundary never changes
# the match set (the state-carry contract of stream_cep_funnel) ---

_etypes = st.sampled_from(["view", "click", "purchase", "other"])


def _events(n):
    return st.lists(
        st.tuples(_etypes, st.integers(0, 200_000)), min_size=0, max_size=n
    )


def _run_cep(seq, split_at):
    from cdc_realtime_pipeline_spark.streaming.stream_queries import (
        cep_triples_of_key,
    )

    rows = [
        dict(user_id=1, event_id=i, event_type=t, ts_s=ts)
        for i, (t, ts) in enumerate(seq)
    ]
    out, st_ = [], {}
    for chunk in (rows[:split_at], rows[split_at:]):
        m, st_ = cep_triples_of_key(
            pd.DataFrame(chunk, columns=["user_id", "event_id", "event_type", "ts_s"]),
            st_,
        )
        out.extend(m)
    return out


@settings(max_examples=60, deadline=None)
@given(_events(30), st.integers(0, 30))
def test_cep_split_invariance_and_brute_force(seq, split):
    # the operator sorts by (ts, event_id); a batch split must respect
    # stream order, so split the SORTED sequence
    seq = sorted(enumerate(seq), key=lambda p: (p[1][1], p[0]))
    seq = [t for _, t in seq]
    split = min(split, len(seq))
    whole = _run_cep(seq, len(seq))
    parts = _run_cep(seq, split)
    assert whole == parts
    # brute-force reference: strictly consecutive triple within 24h
    expected = [
        dict(user_id=1, view_id=i, purchase_id=i + 2, span_s=seq[i + 2][1] - seq[i][1])
        for i in range(len(seq) - 2)
        if seq[i][0] == "view"
        and seq[i + 1][0] == "click"
        and seq[i + 2][0] == "purchase"
        and seq[i + 2][1] - seq[i][1] <= 86400
    ]
    assert whole == expected


# --- Pareto skyline: the sort-sweep formulation equals the quadratic
# dominance definition on any point set (ties and duplicates incl.) ---


def _sweep(points):
    grp_max: dict = {}
    for rev, cnt in points:
        grp_max[rev] = max(grp_max.get(rev, cnt), cnt)
    hmax: dict = {}
    run = None
    for rev in sorted(grp_max, reverse=True):
        hmax[rev] = run
        run = grp_max[rev] if run is None else max(run, grp_max[rev])
    return sorted(
        p
        for p in points
        if (hmax[p[0]] is None or hmax[p[0]] < p[1]) and grp_max[p[0]] == p[1]
    )


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)), min_size=1, max_size=40
    )
)
def test_skyline_sweep_equals_quadratic_definition(points):
    def dominated(a):
        return any(
            b[0] >= a[0] and b[1] >= a[1] and (b[0] > a[0] or b[1] > a[1])
            for b in points
        )

    assert _sweep(points) == sorted(p for p in points if not dominated(p))


# --- windowFunnel: greedy earliest-next reaches depth 3 exactly when
# an in-window ordered chain exists (greedy dominance, both ways) ---


def _greedy_depth(seq, window=100):
    # mirror of the operator algebra on a tie-free (t, id) axis
    evs = sorted(
        [(ts, i, t) for i, (t, ts) in enumerate(seq)], key=lambda e: (e[0], e[1])
    )
    best = 0
    for k, (t1, i1, ty) in enumerate(evs):
        if ty != "view":
            continue
        depth = 1
        clicks = [e for e in evs[k + 1 :] if e[2] == "click" and e[0] - t1 <= window]
        if clicks:
            c = min(clicks)
            purchases = [
                e
                for e in evs
                if e[2] == "purchase" and (e[0], e[1]) > (c[0], c[1])
                and e[0] - t1 <= window
            ]
            depth = 3 if purchases else 2
        best = max(best, depth)
    return best


@settings(max_examples=100, deadline=None)
@given(_events(25))
def test_window_funnel_greedy_equals_existential_chain(seq):
    if not any(t == "view" for t, _ in seq):
        return
    evs = sorted(
        [(ts, i, t) for i, (t, ts) in enumerate(seq)], key=lambda e: (e[0], e[1])
    )
    exists_chain = any(
        v[2] == "view"
        and c[2] == "click"
        and p[2] == "purchase"
        and (v[0], v[1]) < (c[0], c[1]) < (p[0], p[1])
        and p[0] - v[0] <= 100
        for v in evs
        for c in evs
        for p in evs
    )
    assert (_greedy_depth(seq) == 3) == exists_chain


# --- Benford ladder: decade-range CASE ≡ normalize loop on any double ---


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=0.0011, max_value=999.999, allow_nan=False))
def test_benford_ladder_equals_normalize_loop(v):
    if v >= 100.0:
        d = math.floor(v / 100.0)
    elif v >= 10.0:
        d = math.floor(v / 10.0)
    elif v >= 1.0:
        d = math.floor(v)
    elif v >= 0.1:
        d = math.floor(v * 10.0)
    elif v >= 0.01:
        d = math.floor(v * 100.0)
    else:
        d = math.floor(v * 1000.0)
    w = v
    while w >= 10.0:
        w /= 10.0
    while w < 1.0:
        w *= 10.0
    # the loop divides repeatedly (accumulating ulp error), the ladder
    # divides once — they may only disagree where the loop's drift
    # crosses an integer boundary, which the single-division ladder
    # defines as truth; assert agreement away from exact boundaries
    if abs(w - round(w)) > 1e-9:
        assert d == int(w)


# --- dp seeded uniform: the 8-nibble dyadic sum is EXACT (no float
# order sensitivity) and equals the integer interpretation ---


@settings(max_examples=200, deadline=None)
@given(st.text(min_size=0, max_size=30))
def test_hex_uniform_is_exact_dyadic(s):
    m = hashlib.md5(("ct|" + s).encode()).hexdigest()
    digits = [int(c, 16) for c in m[:8]]
    u = 0.0
    for i, d in enumerate(digits, start=1):
        u += d * 16.0**-i
    assert u == int(m[:8], 16) / 16**8  # exact, any summation order
    assert 0.0 <= u < 1.0
