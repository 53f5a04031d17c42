"""Debezium-envelope parser semantics (FIXTURES.md §A2 cases).

Each case is a reference-verified behavior of CdcEventParser.java:
op routing, delete-reads-before, tombstone/malformed drop, lenient
defaults, decimal-as-string and bare-number tolerance.
"""

from __future__ import annotations

import json

from cdc_realtime_pipeline_spark.cdc.envelope import parse_cdc_events


def _parse(spark, payloads: list[str]):
    df = spark.createDataFrame([(p,) for p in payloads], "value string")
    return {r["trade_id"]: r.asDict() for r in parse_cdc_events(df).collect()}


def _event(op="c", trade_id=1, wrap=True, **overrides):
    image = {
        "trade_id": trade_id,
        "market": "KRW-BTC",
        "trade_price": "97000000.00000000",
        "trade_volume": "0.5",
        "trade_amount": "48500000.0000",
        "ask_bid": "BID",
        "upbit_timestamp": 1700000000000,
        "sequential_id": trade_id * 10,
        "created_at": "2024-01-01 00:00:00.000",
    }
    image.update(overrides)
    payload = {
        "before": image if op in ("u", "d") else None,
        "after": image if op != "d" else None,
        "source": {"ts_ms": 1700000000100, "db": "crypto_db", "table": "crypto_trades"},
        "op": op,
        "ts_ms": 1700000000105,
    }
    return json.dumps({"payload": payload} if wrap else payload)


def test_insert_update_snapshot_ops(spark):
    rows = _parse(spark, [_event("c", 1), _event("u", 2), _event("r", 3)])
    assert set(rows) == {1, 2, 3}
    assert rows[1]["op"] == "c"
    assert rows[2]["op"] == "u"
    assert rows[3]["op"] == "r"
    assert rows[1]["trade_price"] == 97000000.0
    assert rows[1]["cdc_latency_ms"] == 5  # ts_ms − source.ts_ms


def test_delete_reads_before_image(spark):
    # CdcEventParser.java:58-62 — op='d' has after=null, row image in before
    rows = _parse(spark, [_event("d", 7)])
    assert rows[7]["op"] == "d"
    assert rows[7]["market"] == "KRW-BTC"
    assert rows[7]["sequential_id"] == 70


def test_tombstone_and_malformed_dropped(spark):
    # tombstone (null value) and broken JSON are dropped; stream continues
    df = spark.createDataFrame(
        [(None,), ("{not json",), (_event("c", 1),)], "value string"
    )
    out = parse_cdc_events(df).collect()
    assert len(out) == 1 and out[0]["trade_id"] == 1


def test_bare_payload_without_wrapper(spark):
    # CdcEventParser.java:51 — events may arrive without the payload wrapper
    rows = _parse(spark, [_event("c", 9, wrap=False)])
    assert rows[9]["market"] == "KRW-BTC"


def test_missing_fields_get_defaults(spark):
    # CdcEventParser.java:76-86 — UNKNOWN / 0 / 0.0 defaults
    rows = _parse(
        spark,
        [_event("c", 4, market=None, trade_price=None, ask_bid=None, upbit_timestamp=None)],
    )
    assert rows[4]["market"] == "UNKNOWN"
    assert rows[4]["trade_price"] == 0.0
    assert rows[4]["ask_bid"] == "UNKNOWN"
    assert rows[4]["upbit_timestamp"] == 0


def test_decimal_string_and_bare_number_and_garbage(spark):
    # CdcEventParser.java:104-115 — strings and numbers both accepted,
    # unparseable → 0.0
    good_str = _event("c", 1, trade_price="123.456")
    garbage = _event("c", 3, trade_price="not-a-number")
    rows = _parse(spark, [good_str, garbage])
    assert rows[1]["trade_price"] == 123.456
    assert rows[3]["trade_price"] == 0.0


def test_bare_numeric_decimal(spark):
    # bare JSON numbers in the decimal fields (schema declares string →
    # from_json coerces or nulls; parser must still produce a value)
    raw = json.dumps(
        {
            "payload": {
                "after": {"trade_id": 5, "market": "KRW-ETH", "trade_price": 42.5},
                "op": "c",
                "ts_ms": 10,
                "source": {"ts_ms": 4},
            }
        }
    )
    rows = _parse(spark, [raw])
    assert rows[5]["trade_price"] == 42.5
    assert rows[5]["cdc_latency_ms"] == 6


def test_envelope_tolerates_unknown_extra_fields(spark):
    """Schema evolution at the source: a producer that adds NEW fields
    to the envelope/payload/row image must not break the parser —
    from_json with an explicit StructType ignores unknown fields
    (PERMISSIVE), so known columns extract unchanged. The inverse
    (missing known fields) is the defaults contract already covered
    above."""
    from cdc_realtime_pipeline_spark.cdc.envelope import parse_cdc_events

    msg = (
        '{"payload": {"op": "c", "ts_ms": 1700000001000,'
        ' "brand_new_top_level": {"x": 1},'
        ' "source": {"ts_ms": 1700000000000, "db": "crypto_db", "new_src_field": 7},'
        ' "after": {"trade_id": 42, "market": "KRW-BTC", "trade_price": "100.5",'
        '           "trade_volume": "2.0", "trade_amount": "201.0", "ask_bid": "BID",'
        '           "upbit_timestamp": 1700000000500, "sequential_id": 9000001,'
        '           "brand_new_row_field": "ignored"}}}'
    )
    df = spark.createDataFrame([(msg,)], "value string")
    [row] = parse_cdc_events(df).collect()
    assert row["trade_id"] == 42
    assert row["market"] == "KRW-BTC"
    assert row["trade_price"] == 100.5
    assert row["op"] == "c"
    assert row["cdc_latency_ms"] == 1000


def test_scd2_intervals_chain_per_key(spark, sf_dir):
    """SCD2 contract: per key, version intervals CHAIN - each version's
    valid_to equals the next change's cdc_ts, at most one current
    version per key, and a key whose last change is a delete has no
    current version."""
    from collections import defaultdict

    from cdc_realtime_pipeline_spark.operators.cdc_ops import cdc_scd2_history

    rows = cdc_scd2_history(spark, sf_dir).collect()
    assert rows
    by_key = defaultdict(list)
    for r in rows:
        by_key[r["trade_id"]].append(r)
    n_current = 0
    for key, versions in by_key.items():
        versions.sort(key=lambda r: r["valid_from_ms"])
        currents = [v for v in versions if v["is_current"]]
        assert len(currents) <= 1, key
        n_current += len(currents)
        for a, b in zip(versions, versions[1:]):
            # chained: a's validity ends no later than b begins, and
            # when both are versions of consecutive changes they touch
            assert a["valid_to_ms"] is not None and a["valid_to_ms"] <= b["valid_from_ms"], key
        for v in versions[:-1]:
            assert not v["is_current"], key
    assert n_current > 0  # the fixture has live keys
