"""Invariant tests for the round-6 second wave: chained streaming
windows, GROUP BY ALL sugar, and MMR re-ranking."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from cdc_realtime_pipeline_spark.operators.extended import group_by_all_conformance
from cdc_realtime_pipeline_spark.operators.similarity import (
    _MMR_K,
    _MMR_LAMBDA,
    _MMR_POOL,
    N_QUERIES,
    similarity_mmr_rerank,
    similarity_topk_bruteforce,
)
from cdc_realtime_pipeline_spark.session import load_table
from cdc_realtime_pipeline_spark.streaming.stream_queries import stream_window_chain


def test_stream_window_chain_matches_batch_rollup(spark, sf_dir):
    got = stream_window_chain(spark, sf_dir).collect()
    assert got, "finalized windows expected"
    # every 5-min window aggregates 1..5 non-empty 1-min sub-windows
    assert all(1 <= r.n_subwindows <= 5 for r in got)
    # the emitted set is exactly the final-watermark gate: 5-min
    # windows whose end <= max(ts) - 10 min, and counts match batch
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts")).collect()[0][0]
    batch = {
        (r.event_type, r.w5): r.n
        for r in ev.groupBy(
            "event_type",
            F.window("ts", "5 minutes").getField("start").alias("w5"),
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    import datetime

    for r in got:
        assert r.window_start + datetime.timedelta(minutes=5) <= mx - datetime.timedelta(
            minutes=10
        )
        assert batch[(r.event_type, r.window_start)] == r.n_events
    # nothing eligible is missing
    eligible = {
        k
        for k in batch
        if k[1] + datetime.timedelta(minutes=5) <= mx - datetime.timedelta(minutes=10)
    }
    assert {(r.event_type, r.window_start) for r in got} == eligible


def test_group_by_all_equals_explicit_grouping(spark, sf_dir):
    sugar = group_by_all_conformance(spark, sf_dir).collect()
    load_table(spark, sf_dir, "events").createOrReplaceTempView("_gba2")
    explicit = spark.sql(
        """
        SELECT event_type,
               CASE WHEN value >= 500 THEN 'hi' ELSE 'lo' END AS band,
               CAST(floor(unix_timestamp(ts) / 3600) % 24 AS BIGINT) AS hour_slot,
               count(*) AS n,
               round(sum(value) + 1e-9, 4) AS sum_value
        FROM _gba2
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3, 4, 5
        """
    ).collect()
    assert sugar == explicit


def test_mmr_greedy_invariants(spark, sf_dir):
    got = similarity_mmr_rerank(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(range(N_QUERIES))
    top = {
        (r.query_id, r.rk): r.vec_id
        for r in similarity_topk_bruteforce(spark, sf_dir).collect()
    }
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }

    def cos(a, b):
        va, vb = emb[a], emb[b]
        return float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))

    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.mmr_rank)
        assert [r.mmr_rank for r in rows] == list(range(1, _MMR_K + 1))
        ids = [r.vec_id for r in rows]
        assert len(set(ids)) == _MMR_K  # no repeats
        # rank 1 is the pure-relevance top-1 (penalty is empty-set 0)
        assert ids[0] == top[(qid, 1)]
        # each score equals lambda*rel - (1-lambda)*max-sim-to-prior,
        # recomputed independently from the raw embeddings
        for i, r in enumerate(rows):
            pen = max((cos(r.vec_id, s) for s in ids[:i]), default=0.0)
            want = _MMR_LAMBDA * r.rel_cos - (1.0 - _MMR_LAMBDA) * pen
            assert math.isclose(r.mmr_score, want, abs_tol=5e-6)
        # every selection comes from the top-POOL relevance pool,
        # recomputed independently from the raw embeddings
        scores = sorted(
            ((round(cos(qid, v), 6), -v) for v in emb if v != qid), reverse=True
        )[:_MMR_POOL]
        pool = {-nv for _, nv in scores}
        assert set(ids) <= pool
        assert _MMR_POOL >= _MMR_K


def test_bpe_train_matches_reference_implementation(spark, sf_dir):
    """The distributed trainer must reproduce a from-scratch pure-
    Python BPE reference (Sennrich 2016 semantics: most-frequent
    adjacent pair, count desc / pair asc tie-break, leftmost
    non-overlapping re-tokenization) run on the same word counts."""
    from collections import Counter

    from cdc_realtime_pipeline_spark.operators.corpus_ops import (
        BPE_TRAIN_STEPS,
        tokenizer_bpe_train_merges,
    )
    from cdc_realtime_pipeline_spark.operators.dedup import normalize_text

    got = tokenizer_bpe_train_merges(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split(normalize_text(F.col("text")), " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count("*").alias("wc"))
        .collect()
    )
    vocab = {tuple(r.w): r.wc for r in words}
    expect = []
    for step in range(1, BPE_TRAIN_STEPS + 1):
        pc: Counter = Counter()
        for syms, wc in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wc
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merged = a + b
        new_vocab: dict[tuple, int] = {}
        for syms, wc in vocab.items():
            out: list = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = merged
                else:
                    out.append(s)
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + wc
        vocab = new_vocab
        n_tokens = sum(len(k) * v for k, v in vocab.items())
        expect.append((step, f"{a} {b}", cnt, n_tokens))
    assert [(r.step, r.merged_pair, r.pair_count, r.corpus_tokens) for r in got] == expect


def test_cusum_matches_numpy(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.timeseries import value_cusum_drift

    got = {r.event_type: r for r in value_cusum_drift(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value").collect()
    series: dict[str, dict[int, list]] = {}
    for r in ev:
        b = int(r.ts.timestamp() // 300)
        series.setdefault(r.event_type, {}).setdefault(b, []).append(r.value)
    for et, sd in series.items():
        buckets = sorted(sd)
        xs = np.array([float(np.mean(sd[b])) for b in buckets])
        mu = xs.mean()
        c = np.cumsum(xs - mu)
        absc = np.round(np.abs(c) + 1e-9, 6)
        peak_i = int(np.lexsort((buckets, -absc))[0])
        assert got[et].n_buckets == len(buckets)
        assert got[et].peak_bucket == buckets[peak_i]
        assert math.isclose(got[et].cusum_peak, absc[peak_i], abs_tol=1e-4)
        sdev = xs.std(ddof=1)
        assert math.isclose(
            got[et].bridge_stat,
            absc[peak_i] / (sdev * math.sqrt(len(buckets))),
            rel_tol=1e-4,
        )


def test_seasonal_backtest_matches_reference(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.timeseries import events_seasonal_backtest

    got = {r.event_type: r for r in events_seasonal_backtest(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value").collect()
    series: dict[str, dict[int, float]] = {}
    for r in ev:
        b = int(r.ts.timestamp() // 300)
        series.setdefault(r.event_type, {})
        series[r.event_type][b] = series[r.event_type].get(b, 0.0) + r.value
    for et, sd in series.items():
        pairs = [(a, sd[b - 288]) for b, a in sd.items() if b - 288 in sd]
        if et not in got:
            assert not pairs
            continue
        a = np.array([p[0] for p in pairs])
        p = np.array([p[1] for p in pairs])
        assert got[et].n_eval == len(pairs)
        assert math.isclose(got[et].mae, float(np.mean(np.abs(a - p))), abs_tol=1e-3)
        assert math.isclose(
            got[et].smape,
            float(np.mean(2.0 * np.abs(a - p) / (np.abs(a) + np.abs(p)))),
            abs_tol=1e-5,
        )
        assert math.isclose(got[et].bias, float(np.mean(a - p)), abs_tol=1e-3)


def test_vocab_coverage_curve_properties(spark, sf_dir):
    from collections import Counter

    from cdc_realtime_pipeline_spark.operators.corpus_ops import (
        corpus_vocab_coverage_curve,
    )
    from cdc_realtime_pipeline_spark.operators.dedup import normalize_text

    got = sorted(
        corpus_vocab_coverage_curve(spark, sf_dir).collect(), key=lambda r: r.cutoff
    )
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(F.explode(F.split(normalize_text(F.col("text")), " ")).alias("t"))
        .filter(F.length("t") > 0)
        .collect()
    )
    counts = Counter(r.t for r in toks)
    total = sum(counts.values())
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    prev = 0
    for r in got:
        covered = sum(c for _, c in ranked[: r.cutoff])
        assert r.tokens_covered == covered
        assert r.total_tokens == total
        assert r.vocab_size == len(counts)
        assert math.isclose(r.coverage, covered / total, abs_tol=1e-5)
        assert r.tokens_covered >= prev  # curve is monotone
        prev = r.tokens_covered
        assert r.coverage <= 1.0 + 1e-9


def test_cohort_ltv_curve_properties(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.extended import orders_cohort_ltv_curve

    rows = orders_cohort_ltv_curve(spark, sf_dir).collect()
    assert rows
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).collect()
    first: dict[int, int] = {}
    for r in orders:
        mi = r.o_orderdate.year * 12 + r.o_orderdate.month
        first[r.o_custkey] = min(first.get(r.o_custkey, mi), mi)
    # cohort sizes match, per-customer LTV is non-decreasing in age
    sizes: dict[int, int] = {}
    for mi in first.values():
        sizes[mi] = sizes.get(mi, 0) + 1
    by_cohort: dict[int, list] = {}
    for r in rows:
        assert r.n_customers == sizes[r.cohort_month_index]
        by_cohort.setdefault(r.cohort_month_index, []).append(r)
    for cm, rs in by_cohort.items():
        rs.sort(key=lambda r: r.age_months)
        ltvs = [r.ltv_per_customer for r in rs]
        assert all(b >= a - 1e-9 for a, b in zip(ltvs, ltvs[1:]))
        assert rs[0].age_months == 0  # every cohort starts at its birth month
    # total revenue reconciles: sum of monthly cells == sum of order prices
    total_cells = sum(r.rev_month for r in rows)
    total_orders = sum(r.o_totalprice for r in orders)
    assert math.isclose(total_cells, total_orders, rel_tol=1e-6)


def test_common_neighbors_matches_reference(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.corpus_ops import (
        dup_graph_common_neighbors,
    )
    from cdc_realtime_pipeline_spark.operators.dedup import dedup_docs_jaccard

    got = dup_graph_common_neighbors(spark, sf_dir).collect()
    pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup_docs_jaccard(spark, sf_dir).select("doc_a", "doc_b").collect()
    }
    nbrs: dict[int, set] = {}
    for a, b in pairs:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    for r in got:
        cn = len(nbrs[r.a] & nbrs[r.b])
        assert r.cn == cn and cn >= 1
        assert r.is_edge == (1 if (r.a, r.b) in pairs else 0)
        assert math.isclose(
            r.nbr_jaccard, cn / len(nbrs[r.a] | nbrs[r.b]), abs_tol=1e-5
        )


def test_rake_keywords_reference(spark, sf_dir):
    from collections import Counter

    from cdc_realtime_pipeline_spark.operators.dedup import normalize_text
    from cdc_realtime_pipeline_spark.operators.text_ops import (
        RAKE_MAX_PHRASE,
        RAKE_STOPWORDS,
        text_rake_keywords,
    )

    got = text_rake_keywords(spark, sf_dir).collect()
    assert len(got) > 0
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", normalize_text(F.col("text")).alias("norm"))
        .collect()
    )
    stop = set(RAKE_STOPWORDS)
    phrases = []  # (phrase tuple)
    for d in docs:
        cur: list = []
        for t in d.norm.split(" "):
            if not t:
                continue
            if t in stop:
                if cur:
                    phrases.append(tuple(cur))
                cur = []
            else:
                cur.append(t)
        if cur:
            phrases.append(tuple(cur))
    freq: Counter = Counter()
    deg: Counter = Counter()
    for ph in phrases:
        for w in ph:
            freq[w] += 1
            deg[w] += len(ph)
    phrase_count = Counter(ph for ph in phrases if len(ph) <= RAKE_MAX_PHRASE)
    scores = {
        ph: round(sum(deg[w] / freq[w] for w in ph) + 1e-9, 4)
        for ph in phrase_count
    }
    top = sorted(scores.items(), key=lambda kv: (-kv[1], " ".join(kv[0])))[: len(got)]
    for r, (ph, sc) in zip(got, top):
        assert r.phrase == " ".join(ph)
        assert math.isclose(r.score, sc, abs_tol=2e-4)
        assert r.n_occurrences == phrase_count[ph]
        assert r.n_words == len(ph)


def test_pq_assign_matches_numpy(spark, sf_dir):
    import hashlib

    from cdc_realtime_pipeline_spark.operators.similarity import (
        _PQ_CODES,
        _PQ_SUBDIM,
        _PQ_SUBS,
        embeddings_pq_assign,
    )

    got = {(r.sub, r.code): r for r in embeddings_pq_assign(spark, sf_dir).collect()}

    def uniform(key: str) -> float:
        h = hashlib.md5(key.encode()).hexdigest()
        return sum(int(h[i], 16) * 16.0 ** -(i + 1) for i in range(8))

    cb = np.zeros((_PQ_SUBS, _PQ_CODES, _PQ_SUBDIM))
    for s_ in range(_PQ_SUBS):
        for c in range(_PQ_CODES):
            for d in range(_PQ_SUBDIM):
                cb[s_, c, d] = uniform(f"pq|{s_}|{c}|{d}") - 0.5
    emb = load_table(spark, sf_dir, "embeddings").collect()
    occ: dict[tuple, list] = {}
    for r in emb:
        x = np.array(r.embedding, dtype=np.float64).reshape(_PQ_SUBS, _PQ_SUBDIM)
        for s_ in range(_PQ_SUBS):
            d2 = np.round(((x[s_] - cb[s_]) ** 2).sum(axis=1) + 1e-9, 8)
            code = int(np.lexsort((np.arange(_PQ_CODES), d2))[0])
            occ.setdefault((s_, code), []).append(d2[code])
    assert set(got) == set(occ)
    for k, ds in occ.items():
        assert got[k].n_assigned == len(ds)
        assert math.isclose(
            got[k].avg_distortion, float(np.mean(ds)), abs_tol=5e-5
        )
    # every (vec, sub) assigned exactly once -> occupancy sums to N*S
    assert sum(r.n_assigned for r in got.values()) == len(emb) * _PQ_SUBS


def test_mannwhitney_grid_matches_reference(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.inference import (
        _MW_GRID,
        _MW_GROUP_A,
        _MW_GROUP_B,
        value_mannwhitney_grid,
    )

    got = value_mannwhitney_grid(spark, sf_dir).collect()[0]
    rows = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(_MW_GROUP_A, _MW_GROUP_B))
        .select("event_type", "value")
        .collect()
    )
    cells: dict[int, list[int]] = {}
    for r in rows:
        c = cells.setdefault(int(math.floor(r.value / _MW_GRID)), [0, 0])
        c[0 if r.event_type == _MW_GROUP_A else 1] += 1
    # midrank rank-sum over sorted cells
    cum = 0
    r_a = n_a = n_b = tie = 0.0
    for cell in sorted(cells):
        ca, cb = cells[cell]
        t = ca + cb
        r_a += ca * (cum + (t + 1) / 2.0)
        cum += t
        n_a += ca
        n_b += cb
        tie += t**3 - t
    u = r_a - n_a * (n_a + 1) / 2.0
    nt = n_a + n_b
    var = (n_a * n_b / 12.0) * ((nt + 1.0) - tie / (nt * (nt - 1.0)))
    z = (u - n_a * n_b / 2.0) / math.sqrt(var)
    assert got.n_a == n_a and got.n_b == n_b
    assert got.n_cells == len(cells)
    assert math.isclose(got.u_stat, u, abs_tol=0.02)
    assert math.isclose(got.z_score, z, abs_tol=2e-4)


def test_lang_source_chisq_matches_reference(spark, sf_dir):
    from collections import Counter

    from cdc_realtime_pipeline_spark.operators.inference import lang_source_chisq

    got = {r.lang: r for r in lang_source_chisq(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select("lang", "source").collect()
    joint = Counter((r.lang, r.source) for r in docs)
    cx = Counter(r.lang for r in docs)
    cy = Counter(r.source for r in docs)
    n = len(docs)
    assert set(got) == set(cx)
    total_chi2 = 0.0
    for lang in cx:
        contrib = 0.0
        for src in cy:
            e = cx[lang] * cy[src] / n
            o = joint.get((lang, src), 0)
            contrib += (o - e) ** 2 / e
        total_chi2 += contrib
        assert got[lang].n_docs == cx[lang]
        assert math.isclose(got[lang].chisq_contrib, contrib, abs_tol=2e-3)
        assert got[lang].dof_per_row == len(cy) - 1
    # full-table dof recoverable: rows x dof_per_row with one row slack
    assert sum(r.dof_per_row for r in got.values()) == len(cx) * (len(cy) - 1)
    assert total_chi2 >= 0.0


def test_spearman_banded_matches_reference(spark, sf_dir):
    import json
    from collections import Counter

    from cdc_realtime_pipeline_spark.operators.inference import (
        _SP_XW,
        _SP_YW,
        value_spearman_banded,
    )

    got = {r.event_type: r for r in value_spearman_banded(spark, sf_dir).collect()}
    rows = load_table(spark, sf_dir, "events").select(
        "event_type", "value", "props"
    ).collect()
    per_type: dict[str, list[tuple[int, int]]] = {}
    for r in rows:
        k = json.loads(r.props).get("k")
        if k is None:
            continue
        per_type.setdefault(r.event_type, []).append(
            (int(math.floor(r.value / _SP_XW)), int(math.floor(float(k) / _SP_YW)))
        )
    for et, pts in per_type.items():
        # midranks per axis with ties
        def midranks(vals: list[int]) -> dict[int, float]:
            cnt = Counter(vals)
            out, cum = {}, 0
            for v in sorted(cnt):
                out[v] = cum + (cnt[v] + 1) / 2.0
                cum += cnt[v]
            return out

        rx = midranks([p[0] for p in pts])
        ry = midranks([p[1] for p in pts])
        xs = np.array([rx[p[0]] for p in pts])
        ys = np.array([ry[p[1]] for p in pts])
        rho = float(np.corrcoef(xs, ys)[0, 1])
        assert got[et].n_rows == len(pts)
        assert math.isclose(got[et].spearman_rho, rho, abs_tol=2e-5)


def test_bootstrap_ci_deterministic_and_ordered(spark, sf_dir):
    import hashlib

    from cdc_realtime_pipeline_spark.operators.inference import (
        _BOOT_B,
        _POIS_T,
        events_bootstrap_ci,
    )

    got = events_bootstrap_ci(spark, sf_dir).collect()
    assert all(r.n_reps == _BOOT_B for r in got)
    assert all(r.ci_lo <= r.boot_mean <= r.ci_hi for r in got)
    # rerun is bit-identical (hash-seeded, no RNG state)
    again = events_bootstrap_ci(spark, sf_dir).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in again]

    # one replicate recomputed host-side from the same md5 draws
    rows = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    ).collect()
    thresholds = [float(t) for t in _POIS_T]

    def w(eid: int, b: int) -> int:
        h = hashlib.md5(f"boot|{eid}|{b}".encode()).hexdigest()
        u = sum(int(h[i], 16) * 16.0 ** -(i + 1) for i in range(8))
        for k, t in enumerate(thresholds):
            if u < t:
                return k
        return 6

    et = rows[0].event_type
    reps = []
    for b in range(_BOOT_B):
        sw = swx = 0.0
        for r in rows:
            if r.event_type != et:
                continue
            wi = w(r.event_id, b)
            sw += wi
            swx += wi * r.value
        reps.append(swx / sw)
    reps.sort()
    row = next(r for r in got if r.event_type == et)
    assert math.isclose(row.boot_mean, sum(reps) / len(reps), abs_tol=2e-4)
    assert math.isclose(row.ci_lo, reps[1], abs_tol=2e-4)
    assert math.isclose(row.ci_hi, reps[_BOOT_B - 2], abs_tol=2e-4)


def test_countmin_overestimates_and_exact_counts(spark, sf_dir):
    from collections import Counter

    from cdc_realtime_pipeline_spark.operators.dq import (
        _CMS_TOP,
        events_countmin_audit,
    )

    got = events_countmin_audit(spark, sf_dir).collect()
    exact = Counter(
        r.user_id for r in load_table(spark, sf_dir, "events").select("user_id").collect()
    )
    assert len(got) == min(_CMS_TOP, len(exact))
    # CMS one-sided guarantee: never underestimates
    assert all(r.overestimate >= 0 for r in got)
    assert all(r.cms_est == r.exact_cnt + r.overestimate for r in got)
    top = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[: len(got)]
    assert [(r.user_id, r.exact_cnt) for r in got] == top


def test_periodogram_matches_numpy(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.timeseries import (
        _PERIODOGRAM_P,
        events_periodogram,
    )

    got = {
        (r.event_type, r.period_hours): r
        for r in events_periodogram(spark, sf_dir).collect()
    }
    rows = load_table(spark, sf_dir, "events").select("event_type", "ts", "value").collect()
    series: dict[str, dict[int, float]] = {}
    for r in rows:
        b = int(r.ts.timestamp() // 300)
        series.setdefault(r.event_type, {}).setdefault(b, 0.0)
        series[r.event_type][b] += r.value
    for et, sd in series.items():
        buckets = np.array(sorted(sd))
        vols = np.array([sd[b] for b in buckets])
        vc = vols - vols.mean()
        for p in _PERIODOGRAM_P:
            phase = 2.0 * np.pi * (buckets % p) / p
            power = (
                (vc * np.cos(phase)).sum() ** 2 + (vc * np.sin(phase)).sum() ** 2
            ) / len(buckets)
            key = (et, round(p * 300.0 / 3600.0, 2))
            assert math.isclose(got[key].spec_power, power, rel_tol=1e-6, abs_tol=2e-3)
            assert got[key].n_buckets == len(buckets)


def test_hampel_matches_numpy_rolling(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.timeseries import (
        _HAMPEL_C,
        _HAMPEL_HALF,
        _HAMPEL_K,
        value_hampel_filter,
    )

    got = {r.event_type: r for r in value_hampel_filter(spark, sf_dir).collect()}
    rows = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value"
    ).collect()
    per: dict[str, list] = {}
    for r in rows:
        per.setdefault(r.event_type, []).append((r.ts, r.event_id, r.value))
    for et, pts in per.items():
        pts.sort()
        vals = np.array([p[2] for p in pts])
        n_out = n_zero = 0
        max_score = -np.inf
        for i in range(len(vals)):
            lo, hi = max(0, i - _HAMPEL_HALF), min(len(vals), i + _HAMPEL_HALF + 1)
            wnd = vals[lo:hi]
            med = float(np.median(wnd))
            mad = float(np.median(np.abs(wnd - med)))
            if mad <= 0:
                n_zero += 1
                continue
            score = abs(vals[i] - med) / (_HAMPEL_C * mad)
            max_score = max(max_score, score)
            if score > _HAMPEL_K:
                n_out += 1
        assert got[et].n_rows == len(vals)
        assert got[et].n_outliers == n_out
        assert got[et].n_zero_mad == n_zero
        assert math.isclose(got[et].max_score, max_score, abs_tol=2e-4)


def test_bucketed_join_plan_is_shuffle_free_below_join(spark, sf_dir):
    import re

    from cdc_realtime_pipeline_spark.operators.extended import bucketed_join_colocated

    df = bucketed_join_colocated(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert plan.count("Bucketed: true") == 2
    # every Exchange sits ABOVE the join: nothing between the SMJ and
    # the bucketed scans re-shuffles
    below = plan[plan.index("SortMergeJoin"):]
    assert "Exchange" not in below
    # and the scans select all declared buckets
    assert len(re.findall(r"SelectedBucketsCount: 8 out of 8", plan)) == 2


def test_holt_matches_python_fold(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.timeseries import (
        _HOLT_ALPHA,
        _HOLT_BETA,
        events_holt_linear,
    )

    got = {r.event_type: r for r in events_holt_linear(spark, sf_dir).collect()}
    rows = load_table(spark, sf_dir, "events").select("event_type", "ts", "value").collect()
    series: dict[str, dict[int, list]] = {}
    for r in rows:
        b = int(r.ts.timestamp() // 300)
        series.setdefault(r.event_type, {}).setdefault(b, []).append(r.value)
    for et, sd in series.items():
        xs = [float(np.mean(sd[b])) for b in sorted(sd)]
        l, tr, sae = xs[0], 0.0, 0.0
        for x in xs[1:]:
            pred = l + tr
            sae += abs(x - pred)
            l2 = round(_HOLT_ALPHA * x + (1 - _HOLT_ALPHA) * pred + 1e-9, 6)
            tr = round(_HOLT_BETA * (l2 - l) + (1 - _HOLT_BETA) * tr + 1e-9, 6)
            l = l2
        assert got[et].n_buckets == len(xs)
        assert math.isclose(got[et].level, l, abs_tol=2e-4)
        assert math.isclose(got[et].trend, tr, abs_tol=2e-4)
        assert math.isclose(got[et].one_step_mae, sae / (len(xs) - 1), abs_tol=2e-4)


def test_holt_duckdb_list_reduce_struct_quirk():
    """Documents WHY the Holt oracle folds over a list accumulator:
    DuckDB 1.0 list_reduce evaluates struct_pack fields against a
    mutating accumulator (field 2 sees field 1's new value), while
    list construction sees one consistent accumulator. If this test
    ever fails, the installed DuckDB fixed the quirk and the oracle
    may return to the struct form."""
    import duckdb

    con = duckdb.connect()
    struct_res = con.execute(
        """
        SELECT list_reduce(
          [struct_pack(p := CAST(1 AS INT), q := CAST(100 AS INT)),
           struct_pack(p := CAST(2 AS INT), q := CAST(200 AS INT)),
           struct_pack(p := CAST(3 AS INT), q := CAST(300 AS INT))],
          (acc, e) -> struct_pack(p := acc.p + e.p, q := acc.q + acc.p))
        """
    ).fetchone()[0]
    list_res = con.execute(
        """
        SELECT list_reduce(
          [[CAST(1 AS INT), CAST(100 AS INT)],
           [CAST(2 AS INT), CAST(200 AS INT)],
           [CAST(3 AS INT), CAST(300 AS INT)]],
          (acc, e) -> [acc[1] + e[1], acc[2] + acc[1]])
        """
    ).fetchone()[0]
    assert list_res == [6, 104]  # consistent-accumulator semantics
    assert struct_res == {"p": 6, "q": 107}  # the mutating quirk


def test_kcore_matches_python_peel(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.corpus_ops import (
        _KCORE_ORACLE_PASSES,
        dup_graph_kcore,
    )
    from cdc_realtime_pipeline_spark.operators.dedup import dedup_docs_jaccard

    got = {r.doc_id: r for r in dup_graph_kcore(spark, sf_dir).collect()}
    pairs = dedup_docs_jaccard(spark, sf_dir).select("doc_a", "doc_b").collect()
    adj: dict[int, set] = {}
    for p in pairs:
        adj.setdefault(p.doc_a, set()).add(p.doc_b)
        adj.setdefault(p.doc_b, set()).add(p.doc_a)

    def peel(k: int):
        alive = set(adj)
        passes = 0
        while True:
            deg = {
                u: sum(1 for v in adj[u] if v in alive) for u in alive
            }
            nxt = {u for u in alive if deg[u] >= k}
            passes += 1
            if nxt == alive:
                return alive, deg, passes
            alive = nxt

    core2, deg2, p2 = peel(2)
    core3, _, p3 = peel(3)
    assert p2 <= _KCORE_ORACLE_PASSES and p3 <= _KCORE_ORACLE_PASSES
    assert set(got) == core2
    for u in core2:
        assert got[u].core2_degree == deg2[u]
        assert got[u].degree == len(adj[u])
        assert got[u].in_3core == (1 if u in core3 else 0)
    # structural sanity: every 3-core member is a 2-core member with
    # residual degree >= 2
    assert all(r.core2_degree >= 2 for r in got.values())


def test_anova_matches_numpy(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.inference import events_anova_oneway

    got = events_anova_oneway(spark, sf_dir).collect()[0]
    rows = load_table(spark, sf_dir, "events").select("event_type", "value").collect()
    groups: dict[str, list] = {}
    for r in rows:
        groups.setdefault(r.event_type, []).append(r.value)
    xs = [np.array(v) for v in groups.values()]
    grand = np.concatenate(xs).mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in xs)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in xs)
    k, n = len(xs), sum(len(g) for g in xs)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert got.k_groups == k and got.n_rows == n
    assert math.isclose(got.ss_between, ssb, rel_tol=1e-6, abs_tol=1e-3)
    assert math.isclose(got.ss_within, ssw, rel_tol=1e-6, abs_tol=1e-3)
    assert math.isclose(got.f_stat, f, rel_tol=1e-5)


def test_dpp_plan_prunes_fact_partitions(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.extended import (
        dynamic_partition_pruning_join,
    )

    df = dynamic_partition_pruning_join(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the fact scan receives its day list at runtime from the dim side
    assert "dynamicpruning" in plan
    got = {r.day: (r.n_events, r.day_value) for r in df.collect()}
    # cross-check against a direct filter on the raw table
    import datetime

    ev = load_table(spark, sf_dir, "events").select("ts", "value").collect()
    monday0 = datetime.date(2024, 1, 1)
    want: dict = {}
    for r in ev:
        d = r.ts.date()
        if (d - monday0).days % 7 == 0:
            n, s = want.get(d, (0, 0.0))
            want[d] = (n + 1, s + r.value)
    assert set(got) == set(want)
    for d, (n, s) in want.items():
        assert got[d][0] == n
        assert math.isclose(got[d][1], s, abs_tol=2e-3)


def test_kneser_ney_matches_python_reference(spark, sf_dir):
    from collections import Counter

    from cdc_realtime_pipeline_spark.operators.curation import (
        _KN_D,
        _KN_TOP,
        text_bigram_kneser_ney,
    )
    from cdc_realtime_pipeline_spark.operators.dedup import normalize_text

    got = text_bigram_kneser_ney(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    toks = [
        [w for w in r.norm.split(" ") if w]
        for r in docs.select(normalize_text(F.col("text")).alias("norm")).collect()
    ]
    c: Counter = Counter()
    for ws in toks:
        for i in range(len(ws) - 1):
            c[(ws[i], ws[i + 1])] += 1
    c1: Counter = Counter()
    n1f: Counter = Counter()
    n1p: Counter = Counter()
    for (w1, w2), cnt in c.items():
        c1[w1] += cnt
        n1f[w1] += 1
        n1p[w2] += 1
    tt = float(len(c))
    scored = []
    for (w1, w2), cnt in c.items():
        p = max(cnt - _KN_D, 0.0) / c1[w1] + _KN_D * n1f[w1] / c1[w1] * (
            n1p[w2] / tt
        )
        scored.append((round(p + 1e-9, 6), w1, w2, cnt))
    scored.sort(key=lambda s: (-s[0], s[1], s[2]))
    want = scored[:_KN_TOP]
    assert [(r.w1, r.w2, r.c_bigram) for r in got] == [
        (w1, w2, cnt) for _, w1, w2, cnt in want
    ]
    for r, (p, _, _, _) in zip(got, want):
        assert math.isclose(r.p_kn, p, abs_tol=2e-6)
    # KN sanity: probabilities normalize per left context (checked on
    # the highest-frequency w1)
    top_w1 = max(c1, key=lambda w: c1[w])
    mass = sum(
        max(cnt - _KN_D, 0.0) / c1[top_w1]
        + _KN_D * n1f[top_w1] / c1[top_w1] * (n1p[w2] / tt)
        for (w1, w2), cnt in c.items()
        if w1 == top_w1
    )
    lam = _KN_D * n1f[top_w1] / c1[top_w1]
    covered = sum(n1p[w2] / tt for (w1, w2) in c if w1 == top_w1)
    assert math.isclose(mass, 1.0 - lam * (1.0 - covered), abs_tol=1e-9)


def test_km_matches_python_reference(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.inference import orders_survival_km

    got = orders_survival_km(spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    ).collect()
    per: dict[int, list] = {}
    horizon = max(r.o_orderdate for r in orders)
    for r in orders:
        per.setdefault(r.o_custkey, []).append((r.o_orderdate, r.o_orderkey))
    spans = []
    for ds in per.values():
        ds.sort()
        d1 = ds[0][0]
        if len(ds) > 1:
            spans.append(((ds[1][0].date() - d1.date()).days, 1))
        else:
            spans.append(((horizon.date() - d1.date()).days, 0))
    from collections import Counter

    d_at = Counter(t for t, e in spans if e)
    c_at = Counter(t for t, e in spans if not e)
    times = sorted(set(d_at) | set(c_at))
    n = len(spans)
    s = 1.0
    want = []
    for t in times:
        d, c = d_at.get(t, 0), c_at.get(t, 0)
        if d > 0:
            s *= 1.0 - d / n
            want.append((t, n, d, c, s))
        n -= d + c
    assert [(r.t_days, r.n_risk, r.n_events, r.n_censored) for r in got] == [
        (t, nr, d, c) for t, nr, d, c, _ in want
    ]
    for r, (_, _, _, _, sv) in zip(got, want):
        assert math.isclose(r.survival, sv, abs_tol=5e-5)
    # survival is monotone nonincreasing and within [0, 1]
    vals = [r.survival for r in got]
    assert all(0.0 <= v <= 1.0 for v in vals)
    assert all(a >= b - 1e-12 for a, b in zip(vals, vals[1:]))


def test_gini_matches_numpy(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.inference import customer_value_gini

    got = customer_value_gini(spark, sf_dir).collect()[0]
    per: dict[int, float] = {}
    for r in load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    ).collect():
        per[r.o_custkey] = per.get(r.o_custkey, 0.0) + r.o_totalprice
    xs = np.sort(np.array(list(per.values())))
    n = len(xs)
    gini = 2.0 * (np.arange(1, n + 1) * xs).sum() / (n * xs.sum()) - (n + 1) / n
    assert got.n_customers == n
    assert math.isclose(got.gini, gini, abs_tol=2e-6)
    assert 0.0 <= got.gini < 1.0


def test_knn_loo_matches_numpy(spark, sf_dir):
    from collections import Counter

    from cdc_realtime_pipeline_spark.operators.similarity import (
        _KNN_EVAL_N,
        _KNN_K,
        label_knn_loo_eval,
    )

    got = {r.true_label: r for r in label_knn_loo_eval(spark, sf_dir).collect()}
    rows = load_table(spark, sf_dir, "embeddings").collect()
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    ids = np.array([r.vec_id for r in rows])
    labels = {r.vec_id: r.label for r in rows}
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    per_true: dict[int, list] = {}
    for r in rows:
        if r.vec_id >= _KNN_EVAL_N:
            continue
        qi = int(np.where(ids == r.vec_id)[0][0])
        cos = np.round(Xn @ Xn[qi], 6)
        order = sorted(
            (i for i in range(len(ids)) if ids[i] != r.vec_id),
            key=lambda i: (-cos[i], ids[i]),
        )[:_KNN_K]
        vote = Counter(labels[ids[i]] for i in order)
        pred = min(vote.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        per_true.setdefault(r.label, []).append(pred == r.label)
    assert set(got) == set(per_true)
    for lab, oks in per_true.items():
        assert got[lab].n_eval == len(oks)
        assert got[lab].n_correct == sum(oks)
        assert math.isclose(got[lab].accuracy, sum(oks) / len(oks), abs_tol=2e-4)
    assert sum(r.n_eval for r in got.values()) == min(
        _KNN_EVAL_N, len(rows)
    )


def test_markov_stationary_matches_numpy(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.extended import (
        _MARKOV_ITERS,
        events_markov_stationary,
    )

    got = {r.event_type: r.stationary_p for r in events_markov_stationary(spark, sf_dir).collect()}
    rows = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    ).collect()
    per: dict[int, list] = {}
    for r in rows:
        per.setdefault(r.user_id, []).append((r.ts, r.event_id, r.event_type))
    from collections import Counter

    trans: Counter = Counter()
    for seq in per.values():
        seq.sort()
        for a, b in zip(seq, seq[1:]):
            trans[(a[2], b[2])] += 1
    states = sorted({s for pair in trans for s in pair})
    idx = {s: i for i, s in enumerate(states)}
    P = np.zeros((len(states), len(states)))
    for (a, b), n in trans.items():
        P[idx[a], idx[b]] = n
    P = P / P.sum(axis=1, keepdims=True)
    pi = np.full(len(states), 1.0 / len(states))
    for _ in range(_MARKOV_ITERS):
        pi = np.round(pi @ P + 1e-12, 8)
    assert set(got) == set(states)
    for s in states:
        assert math.isclose(got[s], pi[idx[s]], abs_tol=2e-6)
    # a stationary vector sums to ~1
    assert math.isclose(sum(got.values()), 1.0, abs_tol=1e-4)


def test_hill_matches_numpy(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.inference import (
        _HILL_K,
        value_hill_tail_index,
    )

    got = value_hill_tail_index(spark, sf_dir).collect()[0]
    xs = np.sort(
        np.array(
            [
                r.value
                for r in load_table(spark, sf_dir, "events").select("value").collect()
                if r.value > 0
            ]
        )
    )[::-1][: _HILL_K + 1]
    thr = xs[-1]
    gamma = float(np.log(xs[:-1] / thr).mean())
    assert got.k == _HILL_K
    assert math.isclose(got.threshold, thr, abs_tol=1e-3)
    assert math.isclose(got.hill_gamma, gamma, abs_tol=2e-5)
    assert math.isclose(got.tail_alpha, 1.0 / gamma, rel_tol=1e-3)


def test_stream_countmin_equals_batch_sketch(spark, sf_dir):
    """The streaming sketch must be BIT-IDENTICAL to the batch build:
    integer counters under identical md5 bucketing."""
    from cdc_realtime_pipeline_spark.operators.dq import _CMS_D, _CMS_W, _hex_uniform
    from cdc_realtime_pipeline_spark.streaming.stream_queries import (
        stream_countmin_sketch,
    )

    got = stream_countmin_sketch(spark, sf_dir).collect()
    batch = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .withColumn("d", F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))))
        .withColumn(
            "hkey",
            F.concat(
                F.lit("cms"),
                F.col("d").cast("string"),
                F.lit("|"),
                F.col("user_id").cast("string"),
            ),
        )
        .withColumn("bucket", F.floor(_hex_uniform("", "hkey") * _CMS_W).cast("long"))
        .groupBy(F.col("d").cast("long").alias("d"), "bucket")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    assert {(r.d, r.bucket): r.c for r in got} == {
        (r.d, r.bucket): r.c for r in batch
    }
    # total mass per hash row is the event count (each row sees all)
    n = load_table(spark, sf_dir, "events").count()
    from collections import Counter

    per_row = Counter()
    for r in got:
        per_row[r.d] += r.c
    assert all(per_row[d] == n for d in range(_CMS_D))


def test_stylometry_delta_matches_python(spark, sf_dir):
    from collections import Counter

    from cdc_realtime_pipeline_spark.operators.dedup import normalize_text
    from cdc_realtime_pipeline_spark.operators.text_ops import (
        _STYLO_M,
        _STYLO_TOP,
        source_stylometry_delta,
    )

    got = source_stylometry_delta(spark, sf_dir).collect()
    rows = load_table(spark, sf_dir, "documents").select(
        "source", normalize_text(F.col("text")).alias("norm")
    ).collect()
    per_src: dict[str, Counter] = {}
    corpus: Counter = Counter()
    for r in rows:
        ws = [w for w in r.norm.split(" ") if w]
        per_src.setdefault(r.source, Counter()).update(ws)
        corpus.update(ws)
    markers = [w for w, _ in sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[:_STYLO_M]]
    sources = sorted(per_src)
    f = {
        (s, w): per_src[s][w] / sum(per_src[s].values())
        for s in sources
        for w in markers
    }
    import statistics

    z = {}
    for w in markers:
        vals = [f[(s, w)] for s in sources]
        mu, sd = statistics.mean(vals), statistics.stdev(vals)
        for s in sources:
            z[(s, w)] = round((f[(s, w)] - mu) / sd + 1e-12, 8)
    deltas = []
    for i, a in enumerate(sources):
        for b in sources[i + 1 :]:
            d = sum(abs(z[(a, w)] - z[(b, w)]) for w in markers) / len(markers)
            deltas.append((round(d + 1e-9, 6), a, b))
    deltas.sort()
    want = deltas[:_STYLO_TOP]
    assert [(r.s_a, r.s_b) for r in got] == [(a, b) for _, a, b in want]
    for r, (d, _, _) in zip(got, want):
        assert math.isclose(r.delta, d, abs_tol=2e-5)
        assert r.n_markers == len(markers)


def test_silhouette_matches_numpy(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.similarity import (
        label_silhouette_centroid,
    )

    got = {r.label: r for r in label_silhouette_centroid(spark, sf_dir).collect()}
    rows = load_table(spark, sf_dir, "embeddings").collect()
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    labs = np.array([r.label for r in rows])
    cents = {l: X[labs == l].mean(axis=0) for l in set(labs)}

    def cosd(u, v):
        return round(
            1.0 - float(u @ v / (np.linalg.norm(u) * np.linalg.norm(v))), 8
        )

    per: dict[int, list] = {}
    for i in range(len(rows)):
        a = cosd(X[i], cents[labs[i]])
        b = min(cosd(X[i], c) for l, c in cents.items() if l != labs[i])
        s = round((b - a) / max(a, b) + 1e-12, 6)
        per.setdefault(int(labs[i]), []).append(s)
    assert set(got) == set(per)
    for l, ss in per.items():
        assert got[l].n_vecs == len(ss)
        assert got[l].n_negative == sum(1 for s in ss if s < 0)
        assert math.isclose(got[l].avg_silhouette, sum(ss) / len(ss), abs_tol=2e-4)


def test_abc_classification_matches_python(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.inference import (
        _ABC_A,
        _ABC_B,
        parts_abc_classification,
    )

    got = {r.abc: r for r in parts_abc_classification(spark, sf_dir).collect()}
    per: dict[int, float] = {}
    for r in load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    ).collect():
        per[r.l_partkey] = per.get(r.l_partkey, 0.0) + r.l_extendedprice * (
            1 - r.l_discount
        )
    rev = sorted(
        ((round(v + 1e-9, 2), k) for k, v in per.items()),
        key=lambda t: (-t[0], t[1]),
    )
    tot = sum(v for v, _ in rev)
    cum = 0.0
    want: dict[str, list] = {}
    for v, k in rev:
        cum += v
        share = cum / tot
        cls = "A" if share <= _ABC_A + 1e-12 else ("B" if share <= _ABC_B + 1e-12 else "C")
        want.setdefault(cls, []).append(v)
    assert set(got) == set(want)
    for cls, vs in want.items():
        assert got[cls].n_parts == len(vs)
        assert math.isclose(got[cls].class_revenue, sum(vs), abs_tol=0.5)
        assert math.isclose(got[cls].revenue_share, sum(vs) / tot, abs_tol=1e-4)
    # the defining property: A is the minimal prefix covering ~80%
    assert want["A"] and sum(want["A"]) / tot <= _ABC_A + 1e-9
    assert (sum(want["A"]) + (want["B"][0] if want.get("B") else 0)) / tot > _ABC_A


def test_assortativity_matches_numpy(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.corpus_ops import (
        dup_graph_assortativity,
    )
    from cdc_realtime_pipeline_spark.operators.dedup import dedup_docs_jaccard

    got = dup_graph_assortativity(spark, sf_dir).collect()[0]
    pairs = dedup_docs_jaccard(spark, sf_dir).select("doc_a", "doc_b").collect()
    from collections import Counter

    deg: Counter = Counter()
    for p in pairs:
        deg[p.doc_a] += 1
        deg[p.doc_b] += 1
    du, dv = [], []
    for p in pairs:
        du += [deg[p.doc_a], deg[p.doc_b]]
        dv += [deg[p.doc_b], deg[p.doc_a]]
    r = float(np.corrcoef(np.array(du, float), np.array(dv, float))[0, 1])
    assert got.n_edges == len(pairs)
    assert math.isclose(got.assortativity, r, abs_tol=2e-5)
    assert -1.0 <= got.assortativity <= 1.0


def test_weighted_median_matches_python(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.inference import (
        lineitem_weighted_median,
    )

    got = {r.l_returnflag: r for r in lineitem_weighted_median(spark, sf_dir).collect()}
    per: dict[str, list] = {}
    for r in load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    ).collect():
        per.setdefault(r.l_returnflag, []).append((r.l_extendedprice, r.l_quantity))
    for flag, rows in per.items():
        rows.sort()
        tw = sum(w for _, w in rows)
        cw = 0.0
        wm = None
        for x, w in rows:
            cw += w
            if cw >= tw / 2.0:
                wm = x
                break
        assert got[flag].n_rows == len(rows)
        assert math.isclose(got[flag].total_weight, tw, abs_tol=0.5)
        assert math.isclose(got[flag].weighted_median, wm, abs_tol=0.02)
        # defining property: weight below the median is < half total
        below = sum(w for x, w in rows if x < wm)
        assert below < tw / 2.0 + 1e-9


def test_two_proportion_ztest_matches_python(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.inference import (
        events_two_proportion_ztest,
    )

    got = events_two_proportion_ztest(spark, sf_dir).collect()[0]
    rows = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    ).select("user_id", "event_type").collect()
    # unit of analysis is the USER (ADVICE r6): one trial per user,
    # success = strictly more purchases than views
    per: dict[int, list[int]] = {}
    for r in rows:
        vp = per.setdefault(r.user_id, [0, 0])
        vp[0 if r.event_type == "view" else 1] += 1
    n = [0, 0]
    c = [0, 0]
    for uid, (views, purch) in per.items():
        arm = uid % 2
        n[arm] += 1
        if purch > views:
            c[arm] += 1
    p1, p2 = c[0] / n[0], c[1] / n[1]
    pp = (c[0] + c[1]) / (n[0] + n[1])
    z = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1 / n[0] + 1 / n[1]))
    assert (got.n_arm_a, got.n_arm_b) == (n[0], n[1])
    assert math.isclose(got.rate_a, p1, abs_tol=2e-6)
    assert math.isclose(got.rate_b, p2, abs_tol=2e-6)
    assert math.isclose(got.z_score, z, abs_tol=2e-4)


def test_poisson_regression_matches_numpy_irls(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.inference import (
        _IRLS_CAP,
        _IRLS_ITERS,
        user_poisson_regression,
    )

    got = user_poisson_regression(spark, sf_dir).collect()[0]
    rows = load_table(spark, sf_dir, "events").select("user_id", "event_type").collect()
    per: dict[int, list] = {}
    for r in rows:
        c = per.setdefault(r.user_id, [0, 0])
        if r.event_type == "view":
            c[0] += 1
        elif r.event_type == "purchase":
            c[1] += 1
    x = np.array([v[0] for v in per.values()], float)
    y = np.array([v[1] for v in per.values()], float)
    b0, b1 = round(math.log(y.mean()) + 1e-12, 8), 0.0
    for _ in range(_IRLS_ITERS):
        eta = np.minimum(b0 + b1 * x, _IRLS_CAP)
        mu = np.exp(eta)
        z = eta + (y - mu) / mu
        sw, swx = mu.sum(), (mu * x).sum()
        swxx, swz, swxz = (mu * x * x).sum(), (mu * z).sum(), (mu * x * z).sum()
        b1 = round((sw * swxz - swx * swz) / (sw * swxx - swx * swx) + 1e-12, 8)
        b0 = round((swz - b1 * swx) / sw + 1e-12, 8)
    assert got.n_users == len(per)
    assert math.isclose(got.b0, b0, abs_tol=2e-5)
    assert math.isclose(got.b_views, b1, abs_tol=2e-5)
    # fitted mean tracks the observed mean (IRLS mean-matching)
    assert math.isclose(got.avg_fitted_rate, got.avg_observed, rel_tol=0.05)


def test_logistic_regression_matches_numpy_irls(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.inference import (
        _LOGIT_CAP,
        _LOGIT_ITERS,
        user_logistic_regression,
    )

    got = user_logistic_regression(spark, sf_dir).collect()[0]
    rows = load_table(spark, sf_dir, "events").select("user_id", "event_type").collect()
    per: dict[int, list] = {}
    for r in rows:
        c = per.setdefault(r.user_id, [0, 0])
        if r.event_type == "view":
            c[0] += 1
        elif r.event_type == "purchase":
            c[1] += 1
    x = np.array([v[0] for v in per.values()], float)
    y = np.array([1.0 if v[1] > v[0] else 0.0 for v in per.values()])
    p = y.mean()
    b0, b1 = round(math.log(p / (1 - p)) + 1e-12, 8), 0.0
    for _ in range(_LOGIT_ITERS):
        eta = np.clip(b0 + b1 * x, -_LOGIT_CAP, _LOGIT_CAP)
        mu = 1.0 / (1.0 + np.exp(-eta))
        w = mu * (1 - mu)
        z = eta + (y - mu) / w
        sw, swx = w.sum(), (w * x).sum()
        swxx, swz, swxz = (w * x * x).sum(), (w * z).sum(), (w * x * z).sum()
        b1 = round((sw * swxz - swx * swz) / (sw * swxx - swx * swx) + 1e-12, 8)
        b0 = round((swz - b1 * swx) / sw + 1e-12, 8)
    assert got.n_users == len(per)
    assert math.isclose(got.b0, b0, abs_tol=2e-5)
    assert math.isclose(got.b_views, b1, abs_tol=2e-5)
    eta = np.clip(b0 + b1 * x, -_LOGIT_CAP, _LOGIT_CAP)
    correct = int((((eta > 0) & (y == 1)) | ((eta <= 0) & (y == 0))).sum())
    assert got.n_correct_at_half == correct


def test_conformal_interval_matches_python(spark, sf_dir):
    import hashlib

    from cdc_realtime_pipeline_spark.operators.inference import (
        _CONF_ALPHA,
        _CONF_CELL,
        value_conformal_interval,
    )

    got = {r.event_type: r for r in value_conformal_interval(spark, sf_dir).collect()}
    rows = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    ).collect()

    def split(eid: int) -> int:
        h = hashlib.md5(f"conf|{eid}".encode()).hexdigest()
        u = sum(int(h[i], 16) * 16.0 ** -(i + 1) for i in range(8))
        return int(u * 3)

    per: dict[str, dict[int, list]] = {}
    for r in rows:
        per.setdefault(r.event_type, {0: [], 1: [], 2: []})[split(r.event_id)].append(
            r.value
        )
    for et, sp in per.items():
        yhat = round(sum(sp[0]) / len(sp[0]) + 1e-9, 6)
        cells = sorted(
            __import__("collections").Counter(
                int(abs(y - yhat) // _CONF_CELL) for y in sp[1]
            ).items()
        )
        n1 = len(sp[1])
        need = math.ceil((n1 + 1) * (1 - _CONF_ALPHA))
        cum = 0
        qcell = None
        for cell, c in cells:
            cum += c
            if cum >= need:
                qcell = cell
                break
        q = (qcell + 1) * _CONF_CELL
        cov = sum(1 for y in sp[2] if abs(y - yhat) <= q) / len(sp[2])
        assert got[et].n_cal == n1
        assert math.isclose(got[et].q_hat, q, abs_tol=1e-6)
        assert got[et].n_test == len(sp[2])
        assert math.isclose(got[et].coverage, cov, abs_tol=2e-4)
        # the conformal guarantee (conservative grid rounding): the
        # coverage should sit at or above the nominal level, within
        # binomial noise of the test-split size
        assert got[et].coverage >= (1 - _CONF_ALPHA) - 3.0 / math.sqrt(len(sp[2]))


def test_pmi_collocations_matches_python(spark, sf_dir):
    from collections import Counter

    from cdc_realtime_pipeline_spark.operators.curation import (
        _PMI_MIN_COUNT,
        _PMI_TOP,
        text_pmi_collocations,
    )
    from cdc_realtime_pipeline_spark.operators.dedup import normalize_text

    got = text_pmi_collocations(spark, sf_dir).collect()
    rows = load_table(spark, sf_dir, "documents").select(
        normalize_text(F.col("text")).alias("norm")
    ).collect()
    uni: Counter = Counter()
    bi: Counter = Counter()
    for r in rows:
        ws = [w for w in r.norm.split(" ") if w]
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    nu = sum(uni.values())
    kept = {p: c for p, c in bi.items() if c >= _PMI_MIN_COUNT}
    nb = sum(kept.values())
    scored = sorted(
        (
            (
                round(
                    math.log((c / nb) / ((uni[a] / nu) * (uni[b] / nu))) + 1e-9, 6
                ),
                a,
                b,
                c,
            )
            for (a, b), c in kept.items()
        ),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:_PMI_TOP]
    assert [(r.w1, r.w2, r.c_bigram) for r in got] == [
        (a, b, c) for _, a, b, c in scored
    ]
    for r, (p, _, _, _) in zip(got, scored):
        assert math.isclose(r.pmi, p, abs_tol=2e-6)


def test_overdispersion_matches_numpy(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.inference import (
        user_overdispersion_check,
    )

    got = {r.event_type: r for r in user_overdispersion_check(spark, sf_dir).collect()}
    rows = load_table(spark, sf_dir, "events").select("user_id", "event_type").collect()
    users = sorted({r.user_id for r in rows})
    types = sorted({r.event_type for r in rows})
    from collections import Counter

    c = Counter((r.user_id, r.event_type) for r in rows)
    for t in types:
        ys = np.array([c.get((u, t), 0) for u in users], float)
        vmr = ys.var(ddof=1) / ys.mean()
        z = (vmr - 1.0) * math.sqrt((len(ys) - 1) / 2.0)
        assert got[t].n_users == len(users)
        assert math.isclose(got[t].mean_count, ys.mean(), abs_tol=2e-4)
        assert math.isclose(got[t].vmr, vmr, rel_tol=1e-4)
        assert math.isclose(got[t].z_score, z, rel_tol=1e-3, abs_tol=2e-3)


def test_tercile_migration_matches_python(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.inference import (
        customer_tercile_migration,
    )

    got = {(r.seg_h1, r.seg_h2): r for r in customer_tercile_migration(spark, sf_dir).collect()}
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).collect()
    d0 = min(r.o_orderdate for r in orders)
    d1 = max(r.o_orderdate for r in orders)
    mid = (d0.timestamp() + d1.timestamp()) / 2
    spend: dict[tuple, float] = {}
    for r in orders:
        h = 1 if r.o_orderdate.timestamp() > mid else 0
        spend[(r.o_custkey, h)] = spend.get((r.o_custkey, h), 0.0) + r.o_totalprice

    def terciles(h):
        rows = sorted(
            ((round(v + 1e-9, 2), k) for (k, hh), v in spend.items() if hh == h),
        )
        n = len(rows)
        out = {}
        # ntile(3) semantics: first (n mod 3) buckets get the extra row
        base, extra = divmod(n, 3)
        i = 0
        for seg in (1, 2, 3):
            size = base + (1 if seg <= extra else 0)
            for _, k in rows[i : i + size]:
                out[k] = seg
            i += size
        return out

    t1, t2 = terciles(0), terciles(1)
    from collections import Counter

    mat = Counter()
    for k in set(t1) | set(t2):
        mat[(t1.get(k, 0), t2.get(k, 0))] += 1
    tot = sum(mat.values())
    assert set(got) == set(mat)
    for cell, n in mat.items():
        assert got[cell].n_customers == n
        assert math.isclose(got[cell].share, n / tot, abs_tol=2e-6)
    # no (0,0) cell can exist: every customer is active in some half
    assert (0, 0) not in got


def test_cohens_kappa_matches_python(spark, sf_dir):
    from collections import Counter

    from cdc_realtime_pipeline_spark.functions import text as TX
    from cdc_realtime_pipeline_spark.operators.text_ops import lang_id_cohens_kappa

    got = lang_id_cohens_kappa(spark, sf_dir).collect()[0]
    docs = load_table(spark, sf_dir, "documents")
    pred = docs.select(
        F.col("lang").alias("d"), TX.lang_id(F.col("text")).alias("p")
    ).collect()
    n = len(pred)
    po = sum(1 for r in pred if r.d == r.p) / n
    rows = Counter(r.d for r in pred)
    cols = Counter(r.p for r in pred)
    pe = sum(rows[l] * cols.get(l, 0) for l in rows) / (n * n)
    kappa = (po - pe) / (1 - pe)
    assert got.n_docs == n
    assert math.isclose(got.p_observed, po, abs_tol=2e-6)
    assert math.isclose(got.p_expected, pe, abs_tol=2e-6)
    assert math.isclose(got.kappa, kappa, abs_tol=2e-5)
    # kappa must be <= raw agreement (chance correction only subtracts)
    assert got.kappa <= got.p_observed + 1e-9


def test_ari_matches_python(spark, sf_dir):
    from collections import Counter

    from cdc_realtime_pipeline_spark.operators.similarity import (
        _KMEANS_K,
        _KMEANS_SEED_MOD,
        kmeans_label_ari,
        dot,
    )

    got = kmeans_label_ari(spark, sf_dir).collect()[0]
    rows = load_table(spark, sf_dir, "embeddings").collect()
    rows.sort(key=lambda r: r.vec_id)
    seeds = [np.array(r.embedding, float) for r in rows if r.vec_id % _KMEANS_SEED_MOD == 0][:_KMEANS_K]
    cells: Counter = Counter()
    for r in rows:
        v = np.array(r.embedding, float)
        best = None
        for i, s in enumerate(seeds):
            d2 = round(float(v @ v - 2 * v @ s + s @ s), 6)
            k = int(math.floor(d2 * 1000000 + 0.5)) * _KMEANS_K + i
            if best is None or k < best:
                best = k
        cells[(best % _KMEANS_K, r.label)] += 1
    n = sum(cells.values())

    def c2(x):
        return x * (x - 1) / 2

    sij = sum(c2(v) for v in cells.values())
    a = Counter(); b = Counter()
    for (cl, lb), v in cells.items():
        a[cl] += v
        b[lb] += v
    sa, sb = sum(c2(v) for v in a.values()), sum(c2(v) for v in b.values())
    e = sa * sb / c2(n)
    ari = (sij - e) / ((sa + sb) / 2 - e)
    assert got.n_vectors == n
    assert got.k_clusters == len(a) and got.l_labels == len(b)
    assert math.isclose(got.ari, ari, abs_tol=2e-5)


def test_flesch_matches_python(spark, sf_dir):
    import re

    from cdc_realtime_pipeline_spark.operators.text_ops import (
        text_readability_flesch,
    )

    got = {r.source: r for r in text_readability_flesch(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select("source", "text").collect()
    per: dict[str, list] = {}
    for r in docs:
        t = r.text.lower()
        words = max(len(re.split(r"\s+", t.strip())), 1)
        sents = max(len(re.findall(r"[.!?]", t)), 1)
        sylls = max(len(re.findall(r"[aeiouy]+", t)), 1)
        f = round(206.835 - 1.015 * (words / sents) - 84.6 * (sylls / words) + 1e-9, 6)
        per.setdefault(r.source, []).append(f)
    for src, fs in per.items():
        assert got[src].n_docs == len(fs)
        assert math.isclose(got[src].avg_flesch, sum(fs) / len(fs), abs_tol=2e-3)
        assert math.isclose(got[src].min_flesch, min(fs), abs_tol=2e-3)


def test_stickiness_matches_python(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.extended import (
        events_dau_wau_stickiness,
    )

    got = {r.week: r for r in events_dau_wau_stickiness(spark, sf_dir).collect()}
    rows = load_table(spark, sf_dir, "events").select("ts", "user_id").collect()
    per: dict = {}
    for r in rows:
        d = r.ts.date()
        week = d - __import__("datetime").timedelta(days=d.weekday())
        per.setdefault(week, {}).setdefault(d, set()).add(r.user_id)
    import datetime

    for week, days in per.items():
        wk = datetime.datetime.combine(week, datetime.time())
        wau = len(set().union(*days.values()))
        avg_dau = sum(len(u) for u in days.values()) / len(days)
        assert got[wk].n_days == len(days)
        assert got[wk].wau == wau
        assert math.isclose(got[wk].avg_dau, avg_dau, abs_tol=2e-3)
        assert math.isclose(got[wk].stickiness, avg_dau / wau, abs_tol=2e-5)
        # bounds: 1/7 <= stickiness <= 1 for a full week
        assert got[wk].stickiness <= 1.0 + 1e-9


def test_lorenz_matches_python(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.inference import (
        customer_lorenz_curve,
        customer_value_gini,
    )

    got = customer_lorenz_curve(spark, sf_dir).collect()
    per: dict[int, float] = {}
    for r in load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    ).collect():
        per[r.o_custkey] = per.get(r.o_custkey, 0.0) + r.o_totalprice
    rows = sorted((round(v + 1e-9, 2), k) for k, v in per.items())
    n = len(rows)
    base, extra = divmod(n, 10)
    tot = sum(v for v, _ in rows)
    i = 0
    cum = 0.0
    for d in range(1, 11):
        size = base + (1 if d <= extra else 0)
        cum += sum(v for v, _ in rows[i : i + size])
        i += size
        r = got[d - 1]
        assert r.decile == d and r.n_customers == size
        assert math.isclose(r.cum_share, cum / tot, abs_tol=2e-6)
        assert math.isclose(r.diagonal_gap, d / 10.0 - cum / tot, abs_tol=2e-6)
    # curve invariants: monotone, ends at 1, gap reconstructs ~Gini
    assert math.isclose(got[-1].cum_share, 1.0, abs_tol=1e-9)
    gini = customer_value_gini(spark, sf_dir).collect()[0].gini
    approx_gini = 2.0 * sum(r.diagonal_gap for r in got) / 10.0
    assert abs(approx_gini - gini) < 0.05  # decile discretization error


def test_anisotropy_matches_numpy(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.similarity import (
        embeddings_anisotropy_audit,
    )

    got = embeddings_anisotropy_audit(spark, sf_dir).collect()[0]
    X = np.array(
        [r.embedding for r in load_table(spark, sf_dir, "embeddings").collect()],
        dtype=np.float64,
    )
    mv = X.mean(axis=0)
    c = np.round(
        X @ mv / (np.linalg.norm(X, axis=1) * np.linalg.norm(mv)), 8
    )
    assert got.n_vectors == len(X)
    assert math.isclose(got.avg_cos_to_mean, c.mean(), abs_tol=2e-5)
    assert math.isclose(got.frac_above_half, (c > 0.5).mean(), abs_tol=2e-6)
    assert math.isclose(got.min_cos, c.min(), abs_tol=2e-6)


def test_mtld_matches_python_walk(spark, sf_dir):
    from cdc_realtime_pipeline_spark.operators.curation import (
        _MTLD_T100,
        text_mtld_diversity,
    )
    from cdc_realtime_pipeline_spark.operators.dedup import normalize_text

    got = {r.source: r for r in text_mtld_diversity(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select(
        "source", normalize_text(F.col("text")).alias("norm")
    ).collect()

    def mtld(ws: list[str]) -> float:
        factors, c, types = 0, 0, set()
        for w in ws:
            types.add(w)
            c += 1
            if 100 * len(types) < _MTLD_T100 * c:
                factors += 1
                c, types = 0, set()
        partial = (
            (1.0 - len(types) / c) / (1.0 - _MTLD_T100 / 100.0) if c > 0 else 0.0
        )
        denom = factors + partial
        return round((len(ws) / denom if denom > 1e-12 else float(len(ws))) + 1e-9, 4)

    per: dict[str, list] = {}
    for r in docs:
        ws = [w for w in r.norm.split(" ") if w]
        if ws:
            per.setdefault(r.source, []).append(mtld(ws))
    assert set(got) == set(per)
    for src, ms in per.items():
        assert got[src].n_docs == len(ms)
        assert math.isclose(got[src].avg_mtld, sum(ms) / len(ms), abs_tol=2e-3)
        assert math.isclose(got[src].min_mtld, min(ms), abs_tol=2e-3)
