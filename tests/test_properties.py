"""Property-based tests (hypothesis) for the invariants that must hold
on any input, not just fixtures: dedup idempotence, EMA closed-form ≡
recurrence, window-aggregate arithmetic invariants, parser totality.
"""

from __future__ import annotations

import json
import math

import pandas as pd
from hypothesis import given, settings, strategies as st

from cdc_realtime_pipeline_spark.operators.anomaly import _EMA_ALPHA
from cdc_realtime_pipeline_spark.streaming.anomaly_stateful import (
    detect_anomalies_batch_of_key,
)

finite = st.floats(min_value=0.001, max_value=1e6, allow_nan=False, allow_infinity=False)


@settings(max_examples=50, deadline=None)
@given(st.lists(finite, min_size=1, max_size=200))
def test_ema_recurrence_matches_closed_form(vols):
    """Closed form used by the SQL batch analog ≡ the iterative
    recurrence the stateful detector runs."""
    a = _EMA_ALPHA
    # iterative (the detector's path)
    e = vols[0]
    for v in vols[1:]:
        e = (1 - a) * e + a * v
    # closed form (the oracle's path):
    # e_k = (1-a)^(k-1) v_1 + a Σ_{i=2..k} (1-a)^(k-i) v_i
    k = len(vols)
    closed = (1 - a) ** (k - 1) * vols[0] + a * sum(
        (1 - a) ** (k - i) * vols[i - 1] for i in range(2, k + 1)
    )
    assert math.isclose(e, closed, rel_tol=1e-9)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 1000), finite, finite, st.integers(0, 10_000_000)),
        min_size=1,
        max_size=100,
        unique_by=lambda t: t[0],
    )
)
def test_detector_is_deterministic_and_total(rows):
    """Any per-key batch: the detector never throws, emits each
    (rule, trade) at most once, and is order-insensitive in its input
    (it re-sorts by sequential_id)."""
    pdf = pd.DataFrame(
        [
            dict(
                sequential_id=sid,
                trade_id=sid,
                trade_price=p,
                trade_volume=v,
                trade_amount=p * v,
                upbit_timestamp=ts,
            )
            for sid, p, v, ts in rows
        ]
    )
    a1, s1 = detect_anomalies_batch_of_key("M-1", pdf, {})
    a2, s2 = detect_anomalies_batch_of_key("M-1", pdf.iloc[::-1], {})
    key = lambda a: (a["alert_type"], a["trade_id"])
    assert sorted(map(key, a1)) == sorted(map(key, a2))
    assert len({key(x) for x in a1}) == len(a1)
    assert s1 == s2


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.integers(0, 50), min_size=1, max_size=60),
    st.integers(2, 5),
)
def test_spark_dedup_equals_set_semantics(spark, ids, dup_factor):
    """dedup_keep_min over arbitrarily re-delivered rows ≡ set-distinct
    on the key, and the survivor is deterministic."""
    from cdc_realtime_pipeline_spark.operators.dedup import dedup_keep_min

    rows = [(i, f"p{i}-{c}") for i in ids for c in range(dup_factor)]
    df = spark.createDataFrame(rows, "k long, payload string")
    out = dedup_keep_min(df, ["k"], "payload").collect()
    assert sorted(r["k"] for r in out) == sorted(set(ids))
    for r in out:
        assert r["payload"] == f"p{r['k']}-0"  # min payload always wins


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["c", "u", "d", "r", None, "garbage"]),
            st.booleans(),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_parser_totality_0_or_1_rows_per_input(spark, cases):
    """P1 contract: every input yields 0 or 1 output rows, never more,
    never an exception — for ops, tombstones, and malformed JSON."""
    from cdc_realtime_pipeline_spark.cdc.envelope import parse_cdc_events

    payloads = []
    expected = 0
    for i, (op, broken) in enumerate(cases):
        if broken:
            payloads.append("{broken json" + str(i))
            continue
        if op is None:
            payloads.append(None)  # tombstone
            continue
        image = {"trade_id": i, "market": "m"}
        payloads.append(
            json.dumps(
                {
                    "payload": {
                        "before": image if op == "d" else None,
                        "after": None if op == "d" else image,
                        "op": op,
                        "ts_ms": 1,
                        "source": {"ts_ms": 0},
                    }
                }
            )
        )
        expected += 1
    df = spark.createDataFrame([(p,) for p in payloads], "value string")
    assert parse_cdc_events(df).count() == expected


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-10**15, max_value=10**15), st.integers(min_value=1, max_value=10**9))
def test_integer_half_up_avg_formula_property(su, n):
    """The decimal-conformance integer formula ≡ Python's exact
    round-half-away-from-zero of su/n (Fraction arithmetic)."""
    from fractions import Fraction

    got = (1 if su >= 0 else -1) * ((2 * abs(su) + n) // (2 * n)) if su != 0 else 0
    x = Fraction(su, n)
    frac = abs(x) - abs(x).numerator // abs(x).denominator  # fractional part
    base = abs(x).numerator // abs(x).denominator
    expect = base + (1 if frac >= Fraction(1, 2) else 0)
    expect = expect if x >= 0 else -expect
    assert got == expect


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=100000))
def test_chunk_count_formula_property(n_words):
    """docs_chunked's closed-form chunk count ≡ the procedural
    stride walk, for any document length."""
    from cdc_realtime_pipeline_spark.operators.curation import (
        _CHUNK_STRIDE,
        _CHUNK_TOKENS,
    )

    c, stride = _CHUNK_TOKENS, _CHUNK_STRIDE
    # closed form used by both engines
    n_chunks = 1 + (max(n_words - c, 0) + stride - 1) // stride
    # procedural reference: starts at 0, stride apart; a start is valid
    # if it's 0 or begins before the previous chunk's end
    starts = [0]
    while starts[-1] + c < n_words:
        starts.append(starts[-1] + stride)
    assert n_chunks == len(starts)
    # every token is covered and consecutive chunks overlap by c-stride
    if n_words:
        assert starts[-1] + c >= n_words


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=1, max_value=10**12))
def test_log2_bucket_nudge_property(df):
    """shingle_df_histogram's floor(log2(df)+1e-9) equals the exact
    integer bit-length bucket for every df (the nudge absorbs IEEE
    log2 landing just under an integer at exact powers of two)."""
    assert math.floor(math.log2(df) + 1e-9) == df.bit_length() - 1
