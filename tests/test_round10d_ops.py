"""Round-10 wave 7: framed audio energy, Good-Turing table."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_audio_energy_recompute_one_doc(spark, sf_dir):
    """Frame accounting matches the formula and a pure-Python
    recompute of one doc's framed energies; only audio-typed rows
    appear."""
    from cdc_realtime_pipeline_spark.operators.multimodal import (
        _AE_HOP,
        _AE_WIN,
        media_audio_energy,
    )

    rows = media_audio_energy(spark, sf_dir).collect()
    assert rows
    assert all(r["doc_id"] % 3 == 1 for r in rows)
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") % 3 == 1)
        .collect()
    }
    assert {r["doc_id"] for r in rows} == set(docs)
    probe = rows[0]
    b = docs[probe["doc_id"]].encode("utf-8")
    n = len(b)
    nf = (n - _AE_WIN) // _AE_HOP + 1 if n >= _AE_WIN else 0
    assert probe["n_frames"] == nf
    energies = [
        sum(x * x for x in b[i * _AE_HOP : i * _AE_HOP + _AE_WIN])
        for i in range(nf)
    ]
    assert probe["total_energy"] == sum(energies)
    assert probe["peak_energy"] == max(energies)
    assert probe["peak_frame"] == energies.index(max(energies))
    for r in rows:
        assert 0 <= r["peak_energy"] <= r["total_energy"]


def test_good_turing_band_identities(spark, sf_dir):
    """Bands are the lowest frequencies in increasing order, r* is
    present exactly when the next band is adjacent and matches the GT
    formula, and band masses are valid shares."""
    from cdc_realtime_pipeline_spark.operators.text_ops import (
        _GT_MAX_R,
        text_good_turing,
    )

    rows = text_good_turing(spark, sf_dir).collect()
    assert 0 < len(rows) <= _GT_MAX_R
    rs = [r["r"] for r in rows]
    assert rs == sorted(rs) and len(set(rs)) == len(rs)
    for r in rows:
        assert r["n_r"] >= 1
        assert 0.0 < r["band_mass"] <= 1.0
        if r["n_r_next"] is not None:
            expect = (r["r"] + 1) * r["n_r_next"] / r["n_r"]
            assert abs(r["r_star"] - expect) < 1e-5
        else:
            assert r["r_star"] is None
    assert sum(r["band_mass"] for r in rows) <= 1.0 + 1e-6
