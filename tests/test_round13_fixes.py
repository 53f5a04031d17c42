"""Round-13 regression tests.

ADVICE r12 hardening:
1. `lsh_band_geometry` rejects non-positive bits overrides (a
   zero-width signature collides universally — silent all-pairs join).
2. The derived band count is capped at `_LSH_MAX_BANDS`: the clamped
   low-τ endpoint degrades to a practical geometry instead of a
   ~6e12-band plane allocation.
3. A bits-only `dedup_embeddings_cosine` override skips the corpus
   count() job entirely — plan construction stays fully lazy.

VERDICT r12 #2 — the MinHash backstop geometry is now DERIVED
(`minhash_band_geometry`), mirroring the round-12 cosine treatment:
formula pins, partial-override re-derivation, endpoint degradation,
and an end-to-end differential of a non-default geometry against an
independently computed exact all-pairs Jaccard.
"""

from __future__ import annotations

import pytest


def test_lsh_band_geometry_rejects_nonpositive_bits():
    from cdc_realtime_pipeline_spark.operators.similarity import (
        lsh_band_geometry,
    )

    for bad in (0, -1, -8):
        with pytest.raises(ValueError, match="bits override"):
            lsh_band_geometry(65536, bits=bad)


def test_lsh_band_cap_keeps_geometry_practical():
    """At the clamped τ lower bound the closed form wants ~6e12 bands;
    the cap must hold the total plane count to something broadcastable
    (bits × bands ≤ 32 × 4096 = 131072 planes)."""
    from cdc_realtime_pipeline_spark.operators.similarity import (
        _LSH_MAX_BANDS,
        lsh_band_geometry,
    )

    bits, bands = lsh_band_geometry(65536, tau=-1.0)
    assert bands == _LSH_MAX_BANDS
    assert bits * bands <= 32 * 4096
    # the cap must never fire in the supported regime (τ = 0.95
    # default at any corpus size up to 10^12)
    for n in (10**3, 10**6, 10**9, 10**12):
        _, b = lsh_band_geometry(n, tau=0.95)
        assert b < _LSH_MAX_BANDS


def test_bits_only_cosine_override_skips_corpus_count(spark, sf_dir, monkeypatch):
    """ADVICE r12: pinning only `bits` must not run the corpus count()
    job — lsh_band_geometry ignores n_vectors when bits is given, so
    plan construction stays fully lazy for bits-only callers."""
    from cdc_realtime_pipeline_spark.operators import similarity

    def boom(*a, **k):
        raise AssertionError("corpus count must not run for bits-only override")

    monkeypatch.setattr(similarity, "_corpus_count", boom)
    # plan BUILD must succeed without the count job
    df = similarity.dedup_embeddings_cosine(spark, sf_dir, bits=10)
    assert "vec_a" in df.columns
    # the default path (bits unset) still derives from the corpus count
    with pytest.raises(AssertionError, match="corpus count"):
        similarity.dedup_embeddings_cosine(spark, sf_dir)


def test_minhash_band_geometry_formula_pins():
    """Pin the derived MinHash-backstop formula (VERDICT r12 #2):
    test-SF corpora keep the historical (2, 16); R widens with corpus
    count to hold false band collisions; and every derived geometry
    keeps the analytic miss bound at the J-threshold under target."""
    from cdc_realtime_pipeline_spark.operators.dedup import (
        _MH_BACKGROUND_J,
        _MH_MISS_TARGET,
        _MH_TARGET_BUCKET,
        minhash_band_geometry,
    )

    # every fixture scale derives the historical geometry -> backstop
    # band keys (salt indices) are bit-identical to rounds 2-12
    for n in (0, 250, 2500, 25000, 70000):
        assert minhash_band_geometry(n) == (2, 16)

    tau = 0.6
    prev_r = 0
    for n in (10**6, 10**7, 10**8, 10**9, 10**12):
        r, bands = minhash_band_geometry(n, tau)
        # false collisions bounded: n * j_bg^R <= target bucket
        assert n * _MH_BACKGROUND_J**r <= _MH_TARGET_BUCKET
        # recall holds AT the decision threshold: miss(tau) <= target
        assert (1.0 - tau**r) ** bands <= _MH_MISS_TARGET
        assert r >= prev_r
        prev_r = r


def test_minhash_band_geometry_override_rederives_bands():
    """The round-12 lesson applied here from day one: a caller pinning
    only rows_per_band gets a band count derived from the EFFECTIVE R,
    keeping the miss bound."""
    from cdc_realtime_pipeline_spark.operators.dedup import (
        _MH_MISS_TARGET,
        minhash_band_geometry,
    )

    tau = 0.6
    for forced_r in (1, 3, 4, 6):
        r, bands = minhash_band_geometry(0, tau, rows_per_band=forced_r)
        assert r == forced_r
        assert (1.0 - tau**r) ** bands <= _MH_MISS_TARGET


def test_minhash_band_geometry_rejects_nonpositive_rows():
    from cdc_realtime_pipeline_spark.operators.dedup import (
        minhash_band_geometry,
    )

    for bad in (0, -1):
        with pytest.raises(ValueError, match="rows_per_band override"):
            minhash_band_geometry(1000, rows_per_band=bad)


def test_minhash_band_geometry_endpoints_degrade_capped():
    """J-threshold endpoints must not crash (log(0)/div-zero) and must
    return a practical, capped geometry."""
    from cdc_realtime_pipeline_spark.operators.dedup import (
        _MH_MAX_BANDS,
        minhash_band_geometry,
    )

    for tau in (1.0, 0.0, 1e-9):
        r, bands = minhash_band_geometry(10**9, tau)
        assert r >= 2 and 4 <= bands <= _MH_MAX_BANDS
    # the cap never fires in the supported regime (tau=0.6 default)
    for n in (10**3, 10**9, 10**12):
        _, bands = minhash_band_geometry(n, 0.6)
        assert bands < _MH_MAX_BANDS


def _exact_jaccard_pairs(spark, sf_dir, tau):
    """Independent exact oracle: all-pairs Jaccard >= tau computed in
    plain Python from the full per-doc shingle sets (fine at sf0.001:
    ~300 docs)."""
    from cdc_realtime_pipeline_spark.operators.dedup import (
        _shared_shingles,
    )

    rows = _shared_shingles(spark, sf_dir).collect()
    sets: dict[int, set] = {}
    for row in rows:
        sets.setdefault(row.doc_id, set()).add(row.shingle)
    ids = sorted(sets)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            j = inter / (len(sets[a]) + len(sets[b]) - inter)
            if round(j, 4) >= tau:
                out.add((a, b, round(j, 4)))
    return out


@pytest.mark.slow
def test_nondefault_minhash_geometry_matches_exact_jaccard(spark, sf_dir):
    """End-to-end differential (VERDICT r12 #2): the candidates-then-
    verify pair set at a NON-default backstop geometry — both an
    explicit rows_per_band=3 (bands re-derived) and a geometry derived
    for a 10^7-doc corpus — must equal the exact all-pairs Jaccard
    result. The banded path is a candidate generator, never a decision
    maker, at any geometry whose miss bound holds."""
    from pyspark.sql import functions as F

    from cdc_realtime_pipeline_spark.operators.dedup import (
        _docs_count,
        _shared_shingles,
        _shingle_candidates,
        minhash_band_geometry,
    )

    tau = 0.6
    exact = _exact_jaccard_pairs(spark, sf_dir, tau)
    assert exact, "fixture must contain planted near-dups"

    sh = _shared_shingles(spark, sf_dir)

    def banded_pairs(**geo):
        ver = _shingle_candidates(sh, **geo).withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                4,
            ),
        )
        return {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in ver.filter(F.col("jaccard") >= tau).collect()
        }

    # explicit R override, bands re-derived from the effective R
    assert banded_pairs(rows_per_band=3) == exact
    # geometry derived for a large corpus (R=4 regime at n=10^7)
    r_large, b_large = minhash_band_geometry(10**7)
    assert (r_large, b_large) != (2, 16)
    assert banded_pairs(rows_per_band=r_large, bands=b_large) == exact
    # and the default derived path (n_docs from the fixture) matches too
    assert banded_pairs(n_docs=_docs_count(spark, sf_dir)) == exact
