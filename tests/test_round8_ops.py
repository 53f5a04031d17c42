"""Invariant tests for the round-8 wave: the exact re-rank refine
stage after the PQ-ADC scan (the third leg of the FAISS-style
coarse → scan → refine pipeline)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from cdc_realtime_pipeline_spark.operators.similarity import (
    _ADC_K,
    _NPROBE,
    _RERANK_R,
    _RRF_C,
    _RRF_K,
    N_QUERIES,
    TOP_K,
    similarity_pq_adc_rerank,
    similarity_pq_adc_topk,
    similarity_rrf_fusion,
    similarity_topk_bruteforce,
    similarity_topk_ivf,
    similarity_topk_ivf_multiprobe,
)
from cdc_realtime_pipeline_spark.session import load_table


def test_rerank_rows_and_ordering(spark, sf_dir):
    got = similarity_pq_adc_rerank(spark, sf_dir).collect()
    assert len(got) == N_QUERIES * _ADC_K
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, _ADC_K + 1))
        # exact-cosine order, ties by vec_id — and every row came from
        # the ADC candidate pool
        for a, b in zip(rows, rows[1:]):
            assert (a.cos, -a.vec_id) >= (b.cos, -b.vec_id)
        for r in rows:
            assert 1 <= r.adc_rank <= _RERANK_R


def test_rerank_cos_is_exact_cosine(spark, sf_dir):
    """The refine stage's cos column must be the full-precision cosine
    of the fetched vectors, not anything ADC-derived."""
    got = similarity_pq_adc_rerank(spark, sf_dir).collect()
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    for r in got:
        q, v = emb[r.query_id], emb[r.vec_id]
        want = float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v)))
        assert abs(r.cos - want) < 2e-6, (r.query_id, r.vec_id)


def test_rerank_recall_dominates_adc_topk(spark, sf_dir):
    """Refining the top-R ADC pool by exact distance can only improve
    (never hurt) recall vs taking the ADC top-K directly: any true
    top-K member inside the pool outranks every non-member exactly."""
    bf = {
        (r.query_id, r.vec_id)
        for r in similarity_topk_bruteforce(spark, sf_dir).collect()
    }
    adc = similarity_pq_adc_topk(spark, sf_dir).collect()
    rr = similarity_pq_adc_rerank(spark, sf_dir).collect()
    adc_hits = sum((r.query_id, r.vec_id) in bf for r in adc)
    rr_hits = sum((r.query_id, r.vec_id) in bf for r in rr)
    assert rr_hits >= adc_hits
    # hit_exact column agrees with the recomputed membership
    for r in rr:
        assert r.hit_exact == int((r.query_id, r.vec_id) in bf)


def test_multiprobe_recall_dominates_single_probe(spark, sf_dir):
    """nprobe=2's candidate set is a superset of nprobe=1's (same
    corpus assignment, strictly more probed cells), and both rerank by
    exact cosine — so multiprobe recall vs brute force can only be >=."""
    bf = {
        (r.query_id, r.vec_id)
        for r in similarity_topk_bruteforce(spark, sf_dir).collect()
    }
    single = similarity_topk_ivf(spark, sf_dir).collect()
    multi = similarity_topk_ivf_multiprobe(spark, sf_dir).collect()
    assert len(multi) == N_QUERIES * TOP_K
    s_hits = sum((r.query_id, r.vec_id) in bf for r in single)
    m_hits = sum((r.query_id, r.vec_id) in bf for r in multi)
    assert m_hits >= s_hits
    for r in multi:
        assert 1 <= r.from_probe <= _NPROBE
    # every single-probe result not displaced by a better candidate is
    # still reachable: the probe-1 subset of multiprobe == single probe
    # candidates, so probe-1 rows' cosines appear in the single results
    single_set = {(r.query_id, r.vec_id) for r in single}
    for r in multi:
        if r.from_probe == 1 and (r.query_id, r.vec_id) not in single_set:
            # only possible if a probe-2 candidate pushed it out of the
            # single-probe top-K — impossible for probe-1 members, which
            # rank at least as high there
            raise AssertionError((r.query_id, r.vec_id))


def test_rrf_scores_recompute_from_ranks(spark, sf_dir):
    rows = similarity_rrf_fusion(spark, sf_dir).collect()
    assert 0 < len(rows) <= _RRF_K
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    prev = None
    for r in rows:
        want = 0.0
        if r.bm25_rank is not None:
            want += 1.0 / (_RRF_C + r.bm25_rank)
        if r.cos_rank is not None:
            want += 1.0 / (_RRF_C + r.cos_rank)
        assert r.bm25_rank is not None or r.cos_rank is not None
        assert abs(r.rrf_score - want) < 1e-6
        if prev is not None:
            assert (prev.rrf_score, -prev.doc_id) >= (r.rrf_score, -r.doc_id)
        prev = r


def test_bpe_encode_consistent_with_train(spark, sf_dir):
    """The encode leg's corpus-wide BPE token total must equal the
    train leg's step-K corpus_tokens plus one token per sub-2-char
    word occurrence (those never enter training and encode as
    themselves)."""
    from pyspark.sql import functions as F

    from cdc_realtime_pipeline_spark.operators.corpus_ops import (
        BPE_TRAIN_STEPS,
        tokenizer_bpe_encode,
        tokenizer_bpe_train_merges,
    )
    from cdc_realtime_pipeline_spark.operators.dedup import normalize_text

    enc = tokenizer_bpe_encode(spark, sf_dir)
    total = enc.agg(F.sum("n_bpe_tokens")).collect()[0][0]
    train = {
        r.step: r.corpus_tokens
        for r in tokenizer_bpe_train_merges(spark, sf_dir).collect()
    }
    short = (
        load_table(spark, sf_dir, "documents")
        .select(
            F.explode(F.split(normalize_text(F.col("text")), " ")).alias("w")
        )
        .filter((F.length("w") == 1))
        .count()
    )
    assert total == train[BPE_TRAIN_STEPS] + short
    for r in enc.collect():
        assert r.n_words <= r.n_bpe_tokens <= r.n_word_chars


def test_mann_kendall_matches_numpy(spark, sf_dir):
    from pyspark.sql import functions as F

    from cdc_realtime_pipeline_spark.operators.inference import (
        events_mann_kendall,
    )

    got = {r.event_type: r for r in events_mann_kendall(spark, sf_dir).collect()}
    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.expr("unix_micros(ts) div 3600000000").alias("hb"))
        .agg((F.round(F.avg("value") + 1e-9, 6) + 0.0).alias("x"))
        .collect()
    )
    series = {}
    for r in hourly:
        series.setdefault(r.event_type, []).append((r.hb, r.x))
    for et, pts in series.items():
        pts.sort()
        n = len(pts)
        s = 0
        slopes = []
        for i in range(n):
            for j in range(i + 1, n):
                d = pts[j][1] - pts[i][1]
                s += (d > 0) - (d < 0)
                slopes.append(d / (pts[j][0] - pts[i][0]))
        from collections import Counter

        ties = Counter(x for _, x in pts)
        tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
        var_s = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
        r = got[et]
        assert r.s_stat == s
        assert abs(r.var_s - var_s) < 1e-3
        if var_s > 0 and s != 0:
            z = (s - (s > 0) + (s < 0)) / var_s**0.5
            assert abs(r.z_mk - z) < 1e-3
        assert abs(r.sen_slope - float(np.median(slopes))) < 1e-5
        assert r.trend == (
            "increasing"
            if r.z_mk > 1.959964
            else "decreasing" if r.z_mk < -1.959964 else "no_trend"
        )


def test_truncated_dim_recall_matches_numpy(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.similarity import (
        _TRUNC_DIMS,
        similarity_truncated_dim_recall,
    )

    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }

    def topk(d):
        out = set()
        for q in range(N_QUERIES):
            qv = emb[q][:d] if d else emb[q]
            scored = []
            for v, e in emb.items():
                if v == q:
                    continue
                ev = e[:d] if d else e
                c = round(qv @ ev / (np.linalg.norm(qv) * np.linalg.norm(ev)), 6)
                scored.append((-c, v))
            for _, v in sorted(scored)[:TOP_K]:
                out.add((q, v))
        return out

    bf = topk(None)
    got = {r.dim_budget: r for r in similarity_truncated_dim_recall(spark, sf_dir).collect()}
    for d in _TRUNC_DIMS:
        want_hits = len(topk(d) & bf)
        assert got[d].n_hit == want_hits
        assert got[d].n_full == len(bf)
        assert abs(got[d].recall - round(want_hits / len(bf) + 1e-9, 4)) < 1e-9


def test_kruskal_wallis_matches_midrank_replica(spark, sf_dir):
    """Recompute H with the classic sort-everything midrank method and
    check the distinct-value-relation construction agrees."""
    from pyspark.sql import functions as F

    from cdc_realtime_pipeline_spark.operators.inference import (
        events_kruskal_wallis,
    )

    rows = events_kruskal_wallis(spark, sf_dir).collect()
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", (F.round(F.col("value") + 1e-9, 4) + 0.0).alias("v"))
        .collect()
    )
    vals = sorted((r.v, r.event_type) for r in ev)
    n = len(vals)
    ranks = {}
    i = 0
    while i < n:
        j = i
        while j < n and vals[j][0] == vals[i][0]:
            j += 1
        mid = (i + 1 + j) / 2.0  # average of ranks i+1 .. j
        ranks[vals[i][0]] = mid
        i = j
    from collections import defaultdict

    rs, ng = defaultdict(float), defaultdict(int)
    for v, et in vals:
        rs[et] += ranks[v]
        ng[et] += 1
    h = 12.0 / (n * (n + 1)) * sum(r * r / ng[g] for g, r in rs.items()) - 3 * (
        n + 1
    )
    from collections import Counter

    tc = Counter(v for v, _ in vals)
    h /= 1 - sum(t**3 - t for t in tc.values()) / (n**3 - n)
    for r in rows:
        assert abs(r.h_stat - h) < 1e-3
        assert abs(r.rank_sum - rs[r.event_type]) < 0.5
        assert r.n == ng[r.event_type]
        assert r.significant == int(r.p_value <= 0.05)


def test_pettitt_matches_bruteforce_u(spark, sf_dir):
    """Recompute U_t directly from the pairwise definition and check
    the recurrence-based construction picks the same K and boundary."""
    from pyspark.sql import functions as F

    from cdc_realtime_pipeline_spark.operators.inference import (
        events_pettitt_changepoint,
    )

    got = {
        r.event_type: r
        for r in events_pettitt_changepoint(spark, sf_dir).collect()
    }
    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.expr("unix_micros(ts) div 3600000000").alias("hb"))
        .agg((F.round(F.avg("value") + 1e-9, 6) + 0.0).alias("x"))
        .collect()
    )
    series = {}
    for r in hourly:
        series.setdefault(r.event_type, []).append((r.hb, r.x))
    import math

    for et, pts in series.items():
        pts.sort()
        T = len(pts)
        best_k, best_h = -1, None
        for t in range(T):
            u = sum(
                (pts[j][1] > pts[i][1]) - (pts[j][1] < pts[i][1])
                for i in range(t + 1)
                for j in range(t + 1, T)
            )
            if abs(u) > best_k:
                best_k, best_h = abs(u), pts[t][0]
        r = got[et]
        assert r.k_stat == best_k
        assert r.cp_hour == best_h
        assert r.n_hours == T
        p = min(1.0, 2.0 * math.exp(-6.0 * best_k**2 / (T**3 + T**2)))
        assert abs(r.p_value - p) < 1e-6


def test_adc_kernel_identical_to_declarative(spark, sf_dir):
    """The packed-codes mapInPandas kernel must be bit-identical to the
    declarative explode-join ADC form — same distances, ranks, ties."""
    a = [tuple(r) for r in similarity_pq_adc_topk(spark, sf_dir).collect()]
    from cdc_realtime_pipeline_spark.operators.similarity import (
        similarity_pq_adc_topk_kernel,
    )

    b = [tuple(r) for r in similarity_pq_adc_topk_kernel(spark, sf_dir).collect()]
    assert a == b


def test_filtered_topk_respects_predicate(spark, sf_dir):
    """Every filtered result must share the query's label, and must be
    the best K among exactly that label subset (numpy replica)."""
    from cdc_realtime_pipeline_spark.operators.similarity import (
        similarity_topk_filtered,
    )

    rows = similarity_topk_filtered(spark, sf_dir).collect()
    emb = {
        r.vec_id: (np.array(r.embedding, dtype=np.float64), r.label)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, got in by_q.items():
        qv, qlabel = emb[q]
        scored = []
        for v, (e, lab) in emb.items():
            if v == q or lab != qlabel:
                continue
            c = round(float(qv @ e / (np.linalg.norm(qv) * np.linalg.norm(e))), 6)
            scored.append((-c, v))
        want = [v for _, v in sorted(scored)[: len(got)]]
        got.sort(key=lambda r: r.rk)
        assert [r.vec_id for r in got] == want
        assert all(emb[r.vec_id][1] == qlabel for r in got)


def test_ljung_box_matches_numpy(spark, sf_dir):
    from pyspark.sql import functions as F

    from cdc_realtime_pipeline_spark.operators.inference import (
        _LB_LAGS,
        events_ljung_box,
    )

    got = {}
    for r in events_ljung_box(spark, sf_dir).collect():
        got.setdefault(r.event_type, {})[r.lag] = r
    buckets = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.floor(F.unix_timestamp("ts") / 300).cast("long").alias("bucket"),
        )
        .agg(F.sum("value").alias("vol"))
        .collect()
    )
    series = {}
    for r in buckets:
        series.setdefault(r.event_type, []).append((r.bucket, r.vol))
    for et, pts in series.items():
        pts.sort()
        x = np.array([v for _, v in pts])
        c = x - x.mean()
        s0 = (c * c).sum()
        T = len(x)
        q = 0.0
        for k in range(1, _LB_LAGS + 1):
            r_k = round((c[k:] * c[:-k]).sum() / s0 + 1e-9, 6)
            assert abs(got[et][k].r_k - r_k) < 1e-5, (et, k)
            q += r_k * r_k / (T - k)
        q *= T * (T + 2)
        assert abs(got[et][1].q_lb - q) < 1e-2


def test_target_encoding_oof_excludes_own_fold(spark, sf_dir):
    """Recompute fold assignment (md5 dyadic uniform) and per-fold OOF
    means in pure Python; the encoding must never include its own fold."""
    import hashlib

    from cdc_realtime_pipeline_spark.operators.inference import (
        _TE_FOLDS,
        _TE_PRIOR,
        events_target_encoding_oof,
    )

    got = {
        (r.event_type, r.fold): r
        for r in events_target_encoding_oof(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    ).collect()
    from collections import defaultdict

    s = defaultdict(float)
    n = defaultdict(int)
    for r in ev:
        h = hashlib.md5(f"te|{r.event_id}".encode()).hexdigest()
        u = sum(int(h[i], 16) * 16.0 ** -(i + 1) for i in range(8))
        fold = int(u * _TE_FOLDS)
        s[(r.event_type, fold)] += r.value
        n[(r.event_type, fold)] += 1
    cats = {c for c, _ in s}
    g = sum(s.values()) / sum(n.values())
    for c in cats:
        sc = sum(s[(c, f)] for f in range(_TE_FOLDS) if (c, f) in s)
        nc = sum(n[(c, f)] for f in range(_TE_FOLDS) if (c, f) in s)
        for f in range(_TE_FOLDS):
            if (c, f) not in s:
                continue
            r = got[(c, f)]
            oof = (sc - s[(c, f)]) / (nc - n[(c, f)])
            sm = (sc - s[(c, f)] + _TE_PRIOR * g) / (nc - n[(c, f)] + _TE_PRIOR)
            assert r.n_rows == n[(c, f)]
            assert abs(r.oof_mean - oof) < 1e-5
            assert abs(r.encoded_smoothed - sm) < 1e-5


def test_calibration_iso_is_pava(spark, sf_dir):
    """The max-min closed form must equal sequential pool-adjacent-
    violators over the bins, and be monotone non-decreasing."""
    from cdc_realtime_pipeline_spark.operators.inference import (
        user_quality_calibration,
    )

    rows = sorted(
        user_quality_calibration(spark, sf_dir).collect(), key=lambda r: r.bin
    )
    # sequential PAVA on (acc, n)
    blocks = []  # (sum_w*y, sum_w, count_bins)
    for r in rows:
        blocks.append([r.acc * r.n_users, float(r.n_users), 1])
        while len(blocks) > 1 and (
            blocks[-2][0] / blocks[-2][1] > blocks[-1][0] / blocks[-1][1]
        ):
            b2 = blocks.pop()
            blocks[-1][0] += b2[0]
            blocks[-1][1] += b2[1]
            blocks[-1][2] += b2[2]
    pava = []
    for s, w, k in blocks:
        pava.extend([s / w] * k)
    prev = None
    n_total = sum(r.n_users for r in rows)
    ece = sum(r.n_users * abs(r.acc - r.conf) for r in rows) / n_total
    for r, want in zip(rows, pava):
        assert abs(r.iso_cal - want) < 1e-4, (r.bin, r.iso_cal, want)
        if prev is not None:
            assert r.iso_cal >= prev - 1e-9
        prev = r.iso_cal
        assert abs(r.ece - ece) < 1e-5


def test_equidepth_scalable_depth_balance(spark, sf_dir):
    """Bucket depths must be balanced up to the largest tie group, the
    boundaries non-overlapping and ordered, and counts total N."""
    from cdc_realtime_pipeline_spark.operators.dq import (
        _EQD_BUCKETS,
        value_equidepth_scalable,
    )

    rows = sorted(
        value_equidepth_scalable(spark, sf_dir).collect(), key=lambda r: r.bucket
    )
    n_total = sum(r.n for r in rows)
    n_events = load_table(spark, sf_dir, "events").count()
    assert n_total == n_events
    target = n_total / _EQD_BUCKETS
    max_tie = max(r.n for r in rows)  # upper bound on any tie group
    prev_hi = None
    for r in rows:
        assert r.lo <= r.hi
        if prev_hi is not None:
            assert r.lo > prev_hi
        prev_hi = r.hi
        # depth within one tie-group width of the target
        assert r.n <= target + max_tie
