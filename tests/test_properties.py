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


@given(
    st.lists(
        st.text(alphabet="abcdef", min_size=2, max_size=8),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=50, deadline=None)
def test_bpe_pair_count_formula_property(words):
    """Pure-Python twin of the BPE pair statistic: summing per-word
    pair multisets weighted by word frequency equals counting pairs
    over the raw token stream — the vocabulary-aggregation rewrite
    the operator relies on for corpus-size independence."""
    from collections import Counter

    stream_counts = Counter()
    for w in words:  # token-stream form
        for i in range(len(w) - 1):
            stream_counts[w[i : i + 2]] += 1

    vocab = Counter(words)  # vocabulary form
    vocab_counts = Counter()
    for w, wc in vocab.items():
        for i in range(len(w) - 1):
            vocab_counts[w[i : i + 2]] += wc

    assert stream_counts == vocab_counts


@given(st.integers(min_value=0, max_value=63), st.integers(min_value=0, max_value=15))
@settings(max_examples=100, deadline=None)
def test_jl_sign_is_deterministic_and_balanced(i, j):
    """The derived Rademacher matrix: same (i,j) → same sign on every
    call (executor-independence), and values are exactly ±1."""
    from cdc_realtime_pipeline_spark.operators.training_data import _jl_sign

    s1, s2 = _jl_sign(i, j), _jl_sign(i, j)
    assert s1 == s2
    assert s1 in (-1, 1)


def test_jl_matrix_roughly_balanced():
    """A Rademacher matrix whose signs are heavily imbalanced is a
    broken hash, not a projection: each output dim's 64 signs should
    be within a generous binomial band around 32/32."""
    from cdc_realtime_pipeline_spark.operators.training_data import _jl_matrix

    for row in _jl_matrix():
        pos = sum(1 for s in row if s == 1)
        assert 16 <= pos <= 48, pos


@given(
    st.lists(st.integers(min_value=0, max_value=255), min_size=1, max_size=40),
    st.lists(st.integers(min_value=0, max_value=255), min_size=1, max_size=5),
)
@settings(max_examples=50, deadline=None)
def test_dsir_log_ratio_sums_to_kl_sign_property(raw_buckets, tgt_buckets):
    """DSIR smoke property on the smoothed models: the expected
    log-ratio under the TARGET bucket distribution is ≥ the expected
    log-ratio under the RAW distribution (Gibbs' inequality applied
    to the two smoothed models) — the ordering that makes importance
    resampling select target-like data."""
    from collections import Counter

    B = 256
    rc, tc = Counter(raw_buckets), Counter(tgt_buckets)
    r_tot, t_tot = len(raw_buckets), len(tgt_buckets)

    def lam_t(b):
        return (tc.get(b, 0) + 1) / (t_tot + B)

    def lam_r(b):
        return (rc.get(b, 0) + 1) / (r_tot + B)

    def expect_under(dist_counts, tot):
        return sum(
            c / tot * math.log(lam_t(b) / lam_r(b)) for b, c in dist_counts.items()
        )

    e_t = expect_under(tc, t_tot)
    e_r = expect_under(rc, r_tot)
    assert e_t >= e_r - 1e-9
