"""Statistical-inference & association operators — round 6.

The reference's analytics surface stops at descriptive aggregates
(counts, sums, window stats); a training-data / experimentation
pipeline additionally needs the INFERENTIAL layer: closed-form
regression beyond one feature, two-sample tests (Welch t, KS),
dependence measures (mutual information, lag autocorrelation), and
association rules with marginal-corrected strength (lift).

Every operator here is algebraic-moment shaped: one scan, a
map-side-combinable aggregate over a bounded key space, then a
closed-form scalar expression over the moments. The closed forms are
written ONCE as shared SQL fragments evaluated verbatim by BOTH
engines (Spark ``F.expr`` and the DuckDB oracle), so the float paths
are literally the same arithmetic — the only cross-engine freedom
left is partial-sum ordering inside the moment sums, absorbed by the
repo's shared round-with-nudge discipline.

Scale posture: no operator shuffles more than (small key space ×
moment tuple); the only self-join (market basket) fans out by basket
size, never corpus size; the one ordered cumulative (KS) runs over a
FIXED value grid (bounded rows by construction), not the raw corpus.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cdc_realtime_pipeline_spark.operators.dq import _hex_uniform, _hex_uniform_sql
from cdc_realtime_pipeline_spark.session import load_table, tracked_persist

# --------------------------------------------------------------------------
# 2-factor OLS via normal equations (Cramer's rule over moments)
# --------------------------------------------------------------------------

# Shared closed forms over the moment columns (nn, sx1, sx2, sy, s11,
# s22, s12, s1y, s2y, syy) — identical text runs on both engines.
_OLS_DET = (
    "(nn * (s11 * s22 - s12 * s12) - sx1 * (sx1 * s22 - s12 * sx2)"
    " + sx2 * (sx1 * s12 - s11 * sx2))"
)
_OLS_DET0 = (
    "(sy * (s11 * s22 - s12 * s12) - sx1 * (s1y * s22 - s12 * s2y)"
    " + sx2 * (s1y * s12 - s11 * s2y))"
)
_OLS_DET1 = (
    "(nn * (s1y * s22 - s12 * s2y) - sy * (sx1 * s22 - s12 * sx2)"
    " + sx2 * (sx1 * s2y - s1y * sx2))"
)
_OLS_DET2 = (
    "(nn * (s11 * s2y - s1y * s12) - sx1 * (sx1 * s2y - s1y * sx2)"
    " + sy * (sx1 * s12 - s11 * sx2))"
)
_OLS_B0 = f"{_OLS_DET0} / {_OLS_DET}"
_OLS_B1 = f"{_OLS_DET1} / {_OLS_DET}"
_OLS_B2 = f"{_OLS_DET2} / {_OLS_DET}"
# SSE = Syy − b0·Sy − b1·S1y − b2·S2y; SST = Syy − Sy²/n
_OLS_R2 = (
    f"1.0 - (syy - ({_OLS_B0}) * sy - ({_OLS_B1}) * s1y - ({_OLS_B2}) * s2y)"
    f" / (syy - sy * sy / nn)"
)


def events_ols_two_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature linear regression per event_type, solved in closed
    form: value ~ b0 + b1·k + b2·hour, where k is the ``props.$.k``
    JSON field and hour the event's hour-of-day. The multivariate
    step past the built-in single-feature ``regr_*`` surface
    (regr_aggregates_conformance): 3×3 normal equations solved by
    Cramer's rule over ten algebraic moments.

    Scale: the ENTIRE regression is one hash aggregate — every moment
    (Σx, Σx², Σxy …) is map-side combinable, so the shuffle carries
    5 keys × 10 doubles regardless of corpus size; the solve itself
    is a scalar expression on the reduced row. This is why normal
    equations (not gradient descent) are the distributed answer for
    low-dimensional OLS.

    Cross-engine: the Cramer determinants are shared SQL fragments
    evaluated verbatim by both engines; moments differ only in
    partial-sum order, absorbed by round(·+1e-9, 6) + 0.0.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.col("value").alias("y"),
        F.get_json_object("props", "$.k").cast("double").alias("x1"),
        F.hour("ts").cast("double").alias("x2"),
    ).filter(F.col("x1").isNotNull())
    m = ev.groupBy("event_type").agg(
        F.count("*").cast("double").alias("nn"),
        F.sum("x1").alias("sx1"),
        F.sum("x2").alias("sx2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    return m.select(
        "event_type",
        F.col("nn").cast("long").alias("n_rows"),
        F.expr(f"round({_OLS_B0} + 1e-9, 6) + 0.0").alias("b0"),
        F.expr(f"round({_OLS_B1} + 1e-9, 6) + 0.0").alias("b_k"),
        F.expr(f"round({_OLS_B2} + 1e-9, 6) + 0.0").alias("b_hour"),
        F.expr(f"round({_OLS_R2} + 1e-9, 6) + 0.0").alias("r2"),
    ).orderBy("event_type")


EVENTS_OLS_TWO_FACTOR_SQL = f"""
WITH base AS (
  SELECT event_type, value AS y,
         CAST(json_extract_string(props, '$.k') AS DOUBLE) AS x1,
         CAST(extract(hour FROM ts) AS DOUBLE) AS x2
  FROM events
),
m AS (
  SELECT event_type,
         CAST(count(*) AS DOUBLE) AS nn,
         sum(x1) AS sx1, sum(x2) AS sx2, sum(y) AS sy,
         sum(x1 * x1) AS s11, sum(x2 * x2) AS s22, sum(x1 * x2) AS s12,
         sum(x1 * y) AS s1y, sum(x2 * y) AS s2y, sum(y * y) AS syy
  FROM base WHERE x1 IS NOT NULL
  GROUP BY event_type
)
SELECT event_type,
       CAST(nn AS BIGINT) AS n_rows,
       round({_OLS_B0} + 1e-9, 6) + 0.0 AS b0,
       round({_OLS_B1} + 1e-9, 6) + 0.0 AS b_k,
       round({_OLS_B2} + 1e-9, 6) + 0.0 AS b_hour,
       round({_OLS_R2} + 1e-9, 6) + 0.0 AS r2
FROM m ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Welch two-sample t-test: each source vs the rest of the corpus
# --------------------------------------------------------------------------

# shared forms over (n1, s1, q1, n2, s2, q2): means, sample variances,
# Welch t and Welch–Satterthwaite df
_W_M1 = "(s1 / n1)"
_W_M2 = "(s2 / n2)"
_W_V1 = "((q1 - s1 * s1 / n1) / (n1 - 1.0))"
_W_V2 = "((q2 - s2 * s2 / n2) / (n2 - 1.0))"
_W_SE2 = f"({_W_V1} / n1 + {_W_V2} / n2)"
_W_T = f"(({_W_M1} - {_W_M2}) / sqrt({_W_SE2}))"
_W_DF = (
    f"({_W_SE2} * {_W_SE2} / "
    f"(({_W_V1} / n1) * ({_W_V1} / n1) / (n1 - 1.0)"
    f" + ({_W_V2} / n2) * ({_W_V2} / n2) / (n2 - 1.0)))"
)


def source_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test of each source's document
    length (n_chars) against the REST of the corpus — the "is this
    crawl's length distribution shifted?" screen run before mixing a
    new source into a training corpus (a shifted mean with a huge t
    usually means truncation or boilerplate, not content).

    One-vs-rest needs no second scan: the complement's moments are
    total − group (sums and sums-of-squares are subtractable), so the
    plan is one grouped aggregate + one broadcast scalar row. t and
    the Welch–Satterthwaite df are shared closed forms over those six
    moments, evaluated verbatim by both engines.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").cast("double").alias("x")
    )
    g = docs.groupBy("source").agg(
        F.count("*").cast("double").alias("n1"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("q1"),
    )
    tot = docs.agg(
        F.count("*").cast("double").alias("nt"),
        F.sum("x").alias("st"),
        F.sum(F.col("x") * F.col("x")).alias("qt"),
    )
    j = g.crossJoin(F.broadcast(tot)).select(
        "source",
        "n1",
        "s1",
        "q1",
        (F.col("nt") - F.col("n1")).alias("n2"),
        (F.col("st") - F.col("s1")).alias("s2"),
        (F.col("qt") - F.col("q1")).alias("q2"),
    )
    return j.select(
        "source",
        F.col("n1").cast("long").alias("n_docs"),
        F.expr(f"round({_W_M1} + 1e-9, 4) + 0.0").alias("mean_chars"),
        F.expr(f"round({_W_T} + 1e-9, 4) + 0.0").alias("t_stat"),
        F.expr(f"round({_W_DF} + 1e-9, 2) + 0.0").alias("welch_df"),
    ).orderBy("source")


SOURCE_WELCH_TTEST_SQL = f"""
WITH d AS (SELECT source, CAST(n_chars AS DOUBLE) AS x FROM documents),
g AS (
  SELECT source, CAST(count(*) AS DOUBLE) AS n1,
         sum(x) AS s1, sum(x * x) AS q1
  FROM d GROUP BY source
),
t AS (
  SELECT CAST(count(*) AS DOUBLE) AS nt, sum(x) AS st, sum(x * x) AS qt
  FROM d
),
j AS (
  SELECT source, n1, s1, q1,
         nt - n1 AS n2, st - s1 AS s2, qt - q1 AS q2
  FROM g CROSS JOIN t
)
SELECT source,
       CAST(n1 AS BIGINT) AS n_docs,
       round({_W_M1} + 1e-9, 4) + 0.0 AS mean_chars,
       round({_W_T} + 1e-9, 4) + 0.0 AS t_stat,
       round({_W_DF} + 1e-9, 2) + 0.0 AS welch_df
FROM j ORDER BY source
"""


# --------------------------------------------------------------------------
# Mutual information between event_type and a fixed value band
# --------------------------------------------------------------------------


def mi_event_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(event_type; floor(value/10)) reported as
    per-event-type contributions — the dependence screen behind
    "does this categorical actually carry signal about this metric?"
    (near-zero MI → the column is noise for stratification; high MI →
    band composition differs per type and stratified sampling must
    key on both).

    Plug-in estimator on integer counts: joint counts per (type,
    band), marginals re-aggregated FROM the joint (no second scan),
    scalar N broadcast; each term (c_xy/N)·log2(c_xy·N/(c_x·c_y)) is
    exact-integer-derived, summed per type. All key spaces are tiny
    (types × bands), every aggregate map-side combinable.

    The marginal product c_x·c_y is computed in DOUBLE (ADVICE r6):
    long·long wraps silently at the marginal sizes the 100 TB target
    implies (~1e10–1e11 each) while DuckDB would error — the engines
    would diverge exactly where the oracle no longer runs. The
    factors are exact-integer-derived and far below 2^53 in that
    regime, so the double product is exact and the emitted values are
    bit-identical to the integer form at any testable scale.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.floor(F.col("value") / 10).cast("long").alias("band")
    )
    joint = tracked_persist(
        ev.groupBy("event_type", "band").agg(F.count("*").alias("c_xy"))
    )
    cx = joint.groupBy("event_type").agg(F.sum("c_xy").alias("c_x"))
    cy = joint.groupBy("band").agg(F.sum("c_xy").alias("c_y"))
    n = joint.agg(F.sum("c_xy").cast("double").alias("nn"))
    terms = (
        joint.join(F.broadcast(cx), "event_type")
        .join(F.broadcast(cy), "band")
        .crossJoin(F.broadcast(n))
        .select(
            "event_type",
            "c_xy",
            F.expr(
                "(c_xy / nn) * log2(c_xy * nn /"
                " (cast(c_x as double) * cast(c_y as double)))"
            ).alias("term"),
        )
    )
    return (
        terms.groupBy("event_type")
        .agg(
            F.sum("c_xy").cast("long").alias("n_rows"),
            F.expr("round(sum(term) + 1e-9, 6) + 0.0").alias("mi_contrib"),
        )
        .orderBy("event_type")
    )


MI_EVENT_VALUE_BANDS_SQL = """
WITH ev AS (
  SELECT event_type, CAST(floor(value / 10) AS BIGINT) AS band FROM events
),
joint AS (
  SELECT event_type, band, count(*) AS c_xy FROM ev GROUP BY event_type, band
),
cx AS (SELECT event_type, CAST(sum(c_xy) AS BIGINT) AS c_x FROM joint GROUP BY event_type),
cy AS (SELECT band, CAST(sum(c_xy) AS BIGINT) AS c_y FROM joint GROUP BY band),
n AS (SELECT CAST(sum(c_xy) AS DOUBLE) AS nn FROM joint)
SELECT j.event_type,
       CAST(sum(j.c_xy) AS BIGINT) AS n_rows,
       round(sum((j.c_xy / n.nn) * log2(j.c_xy * n.nn /
                 (CAST(cx.c_x AS DOUBLE) * CAST(cy.c_y AS DOUBLE))))
             + 1e-9, 6) + 0.0 AS mi_contrib
FROM joint j
JOIN cx ON j.event_type = cx.event_type
JOIN cy ON j.band = cy.band
CROSS JOIN n
GROUP BY j.event_type
ORDER BY j.event_type
"""


# --------------------------------------------------------------------------
# Two-sample Kolmogorov–Smirnov on a fixed value grid
# --------------------------------------------------------------------------

_KS_GROUP_A = "view"
_KS_GROUP_B = "purchase"
_KS_GRID = 10.0  # value-band width → bounded grid cardinality


def value_ks_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between the value
    distributions of '{A}' and '{B}' events, evaluated on a fixed
    grid (bands of width {W}) — the distribution-shift test behind
    drift gates (value_distribution_psi is the binned-likelihood
    variant; KS is the sup-norm variant regulators and A/B harnesses
    quote).

    The textbook exact KS sorts the pooled sample — a global sort of
    the corpus, with nearly-all-distinct doubles, that cannot shrink
    before the cumulative pass. The GRID form fixes the evaluation
    points up front: counts per (grid cell, group) reduce the corpus
    to a BOUNDED relation (cells ∝ value range / width, independent
    of row count), and the cumulative ECDF walk is a window over that
    bounded relation — the single-partition window is fine precisely
    because its input is grid-sized, not corpus-sized. D_grid equals
    exact D whenever both ECDFs are compared at cell boundaries;
    max-over-grid underestimates by at most the largest within-cell
    mass (reported as n_cells context).

    Integer counts → the ECDF ratios are exact-integer-derived
    doubles; round 6dp shared-nudge.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_KS_GROUP_A, _KS_GROUP_B)
    )
    cells = (
        ev.select(
            F.floor(F.col("value") / _KS_GRID).cast("long").alias("cell"),
            (F.col("event_type") == _KS_GROUP_A).cast("long").alias("is_a"),
        )
        .groupBy("cell")
        .agg(
            F.sum("is_a").alias("c_a"),
            F.sum(1 - F.col("is_a")).alias("c_b"),
        )
    )
    w = Window.orderBy("cell").rowsBetween(Window.unboundedPreceding, 0)
    walked = cells.select(
        "cell",
        F.sum("c_a").over(w).alias("cum_a"),
        F.sum("c_b").over(w).alias("cum_b"),
    )
    totals = cells.agg(
        F.sum("c_a").cast("double").alias("n_a"),
        F.sum("c_b").cast("double").alias("n_b"),
        F.count("*").cast("long").alias("n_cells"),
    )
    return (
        walked.crossJoin(F.broadcast(totals))
        .agg(
            F.max("n_a").cast("long").alias("n_a"),
            F.max("n_b").cast("long").alias("n_b"),
            F.max("n_cells").alias("n_cells"),
            F.expr(
                "round(max(abs(cum_a / n_a - cum_b / n_b)) + 1e-9, 6) + 0.0"
            ).alias("ks_d"),
        )
    )


value_ks_grid.__doc__ = value_ks_grid.__doc__.format(
    A=_KS_GROUP_A, B=_KS_GROUP_B, W=_KS_GRID
)

VALUE_KS_GRID_SQL = f"""
WITH ev AS (
  SELECT CAST(floor(value / {_KS_GRID}) AS BIGINT) AS cell,
         CASE WHEN event_type = '{_KS_GROUP_A}' THEN 1 ELSE 0 END AS is_a
  FROM events
  WHERE event_type IN ('{_KS_GROUP_A}', '{_KS_GROUP_B}')
),
cells AS (
  SELECT cell,
         CAST(sum(is_a) AS BIGINT) AS c_a,
         CAST(sum(1 - is_a) AS BIGINT) AS c_b
  FROM ev GROUP BY cell
),
walked AS (
  SELECT cell,
         sum(c_a) OVER (ORDER BY cell ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS cum_a,
         sum(c_b) OVER (ORDER BY cell ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS cum_b
  FROM cells
),
totals AS (
  SELECT CAST(sum(c_a) AS DOUBLE) AS n_a, CAST(sum(c_b) AS DOUBLE) AS n_b,
         count(*) AS n_cells
  FROM cells
)
SELECT CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b,
       n_cells,
       round(max(abs(cum_a / n_a - cum_b / n_b)) + 1e-9, 6) + 0.0 AS ks_d
FROM walked CROSS JOIN totals
GROUP BY n_a, n_b, n_cells
"""


# --------------------------------------------------------------------------
# Lag-1 autocorrelation of the 5-minute volume series per event type
# --------------------------------------------------------------------------

# Pearson r over (a=current, b=previous) pairs from shared moments
# nullif on the denominator (round 11): a zero-variance series makes
# sqrt(...) exactly 0.0 — the moments are integer-valued doubles, so
# the cancellation is exact, never a tiny negative — and under Spark 4
# ANSI (this session's default) a bare /0.0 RAISES DIVIDE_BY_ZERO
# while DuckDB yields NULL (<=1.0) or Inf (>=1.1 ieee ops). nullif
# pins r to NULL on BOTH engines regardless of version; the argmax
# NULLS-LAST/coalesce(+inf) pins downstream then agree. Identical
# syntax parses in both dialects.
_AC_R = (
    "((np * sab - sa * sb) /"
    " nullif(sqrt((np * saa - sa * sa) * (np * sbb - sb * sb)), 0.0))"
)


def events_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each event type's 5-minute volume
    series — the "is this metric bursty or memoryless?" statistic
    that sizes anomaly-detector smoothing windows (high r → EMA-style
    rules like VOLUME_SURGE are meaningful; r ≈ 0 → they just chase
    noise).

    Two bounded stages: bucket sums (keyed time-window aggregate —
    the series length grows with the time span, not the row count),
    then a per-type lag window and one Pearson-moment aggregate over
    the paired series. The correlation closed form is a shared SQL
    fragment evaluated by both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    buckets = (
        ev.groupBy(
            "event_type",
            F.floor(F.unix_timestamp("ts") / 300).cast("long").alias("bucket"),
        )
        .agg(F.sum("value").alias("vol"))
    )
    lagw = Window.partitionBy("event_type").orderBy("bucket")
    paired = buckets.select(
        "event_type",
        F.col("vol").alias("a"),
        F.lag("vol", 1).over(lagw).alias("b"),
    ).filter(F.col("b").isNotNull())
    m = paired.groupBy("event_type").agg(
        F.count("*").cast("double").alias("np"),
        F.sum("a").alias("sa"),
        F.sum("b").alias("sb"),
        F.sum(F.col("a") * F.col("b")).alias("sab"),
        F.sum(F.col("a") * F.col("a")).alias("saa"),
        F.sum(F.col("b") * F.col("b")).alias("sbb"),
    )
    return m.select(
        "event_type",
        F.col("np").cast("long").alias("n_pairs"),
        F.expr(f"round({_AC_R} + 1e-9, 6) + 0.0").alias("acf1"),
    ).orderBy("event_type")


EVENTS_AUTOCORR_LAG1_SQL = f"""
WITH buckets AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 300) AS BIGINT) AS bucket,
         sum(value) AS vol
  FROM events GROUP BY event_type, bucket
),
paired AS (
  SELECT event_type, vol AS a,
         lag(vol, 1) OVER (PARTITION BY event_type ORDER BY bucket) AS b
  FROM buckets
),
m AS (
  SELECT event_type,
         CAST(count(*) AS DOUBLE) AS np,
         sum(a) AS sa, sum(b) AS sb, sum(a * b) AS sab,
         sum(a * a) AS saa, sum(b * b) AS sbb
  FROM paired WHERE b IS NOT NULL
  GROUP BY event_type
)
SELECT event_type,
       CAST(np AS BIGINT) AS n_pairs,
       round({_AC_R} + 1e-9, 6) + 0.0 AS acf1
FROM m ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Association rules (support / confidence / lift) over order baskets
# --------------------------------------------------------------------------

_BASKET_TOP = 25


def market_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over order baskets: for the strongest part
    pairs, the full rule statistics — support, both directional
    confidences, and lift — ranked by lift. Extends the raw
    co-occurrence count (copurchase_pairs_topk, extended.py:1741)
    with the MARGINAL correction: a pair can co-occur often merely
    because both parts are popular; lift = P(ab)/(P(a)P(b)) divides
    that out, which is why recommenders rank on it rather than raw
    counts.

    Scale shape: distinct parts per order first, pair fan-out bounded
    by basket size (Σ items²/order, never corpus²); item marginals
    come from the SAME distinct relation; the pair→marginal joins key
    on partkey (plain shuffle joins — the marginal relation is
    part-cardinality, too big to assume broadcast at 100 TB, and AQE
    will broadcast it anyway when it's small). Lift needs a minimum
    co-occurrence floor (≥ 2 here) so single-co-occurrence pairs of
    rare items don't dominate the ranking with huge noisy lifts.
    """
    # the distinct-items and pair-count stages are session memos shared
    # with copurchase_pairs_topk (round 13, guide §5) — identical
    # relations, built once per (session, fixture); marginals are one
    # cheap aggregate over the memoized items
    from cdc_realtime_pipeline_spark.operators.extended import (
        _basket_items,
        _basket_pair_counts,
    )

    items = _basket_items(spark, sf_dir)
    n_orders = items.select("l_orderkey").distinct().agg(
        F.count("*").cast("double").alias("n_orders")
    )
    item_n = items.groupBy("l_partkey").agg(F.count("*").alias("c_item"))
    pairs = _basket_pair_counts(spark, sf_dir).filter(F.col("c_ab") >= 2)
    j = (
        pairs.join(item_n.withColumnRenamed("l_partkey", "p_a").withColumnRenamed("c_item", "c_a"), "p_a")
        .join(item_n.withColumnRenamed("l_partkey", "p_b").withColumnRenamed("c_item", "c_b"), "p_b")
        .crossJoin(F.broadcast(n_orders))
    )
    return (
        j.select(
            "p_a",
            "p_b",
            "c_ab",
            F.expr("round(c_ab / n_orders + 1e-9, 6) + 0.0").alias("support"),
            F.expr("round(c_ab / c_a + 1e-9, 6) + 0.0").alias("conf_a_b"),
            F.expr("round(c_ab / c_b + 1e-9, 6) + 0.0").alias("conf_b_a"),
            F.expr("round(c_ab * n_orders / (c_a * c_b) + 1e-9, 4) + 0.0").alias(
                "lift"
            ),
        )
        .orderBy(F.desc("lift"), F.desc("c_ab"), "p_a", "p_b")
        .limit(_BASKET_TOP)
    )


MARKET_BASKET_RULES_SQL = f"""
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n_orders FROM items),
item_n AS (SELECT l_partkey, count(*) AS c_item FROM items GROUP BY l_partkey),
pairs AS (
  SELECT a.l_partkey AS p_a, b.l_partkey AS p_b, count(*) AS c_ab
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY p_a, p_b
  HAVING count(*) >= 2
)
SELECT p.p_a, p.p_b,
       CAST(p.c_ab AS BIGINT) AS c_ab,
       round(p.c_ab / n.n_orders + 1e-9, 6) + 0.0 AS support,
       round(p.c_ab / ia.c_item + 1e-9, 6) + 0.0 AS conf_a_b,
       round(p.c_ab / ib.c_item + 1e-9, 6) + 0.0 AS conf_b_a,
       round(p.c_ab * n.n_orders / (ia.c_item * ib.c_item) + 1e-9, 4) + 0.0
         AS lift
FROM pairs p
JOIN item_n ia ON p.p_a = ia.l_partkey
JOIN item_n ib ON p.p_b = ib.l_partkey
CROSS JOIN n
ORDER BY lift DESC, c_ab DESC, p_a, p_b
LIMIT {_BASKET_TOP}
"""


# --------------------------------------------------------------------------
# Mann–Whitney U (rank-sum) on a fixed value grid — midranks with ties
# --------------------------------------------------------------------------

_MW_GROUP_A = "view"
_MW_GROUP_B = "purchase"
_MW_GRID = 10.0

# shared closed forms over (u_a, n_a, n_b, nt, tie_sum):
# mean, tie-corrected variance, z. tie_sum = Σ(t³ − t) over cells.
_MW_MU = "(n_a * n_b / 2.0)"
_MW_VAR = (
    "((n_a * n_b / 12.0) *"
    " ((nt + 1.0) - tie_sum / (nt * (nt - 1.0))))"
)
_MW_Z = f"((u_a - {_MW_MU}) / sqrt({_MW_VAR}))"


def value_mannwhitney_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U test (Wilcoxon rank-sum) between the value
    distributions of '{A}' and '{B}' events — the NON-PARAMETRIC
    companion to source_welch_ttest (location shift without the
    normality assumption) and the rank-based sibling of value_ks_grid.

    The textbook test ranks the pooled sample — a global sort with
    mostly-distinct doubles. The grid form quantizes to fixed cells
    (width {W}) FIRST, making every within-cell group a tie handled
    by the standard midrank rule: cell counts reduce the corpus to a
    bounded relation, cumulative counts over that relation give each
    cell's midrank (c_prev + (t+1)/2), and U, the tie-corrected
    variance and z are closed forms over five scalars. The bounded
    single-partition window is fine precisely because its input is
    grid-sized. Integer counts throughout → the only float freedom is
    the final closed form, absorbed by the shared round discipline.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_MW_GROUP_A, _MW_GROUP_B)
    )
    cells = (
        ev.select(
            F.floor(F.col("value") / _MW_GRID).cast("long").alias("cell"),
            (F.col("event_type") == _MW_GROUP_A).cast("long").alias("is_a"),
        )
        .groupBy("cell")
        .agg(
            F.sum("is_a").alias("c_a"),
            F.sum(1 - F.col("is_a")).alias("c_b"),
        )
    )
    w = Window.orderBy("cell").rowsBetween(Window.unboundedPreceding, -1)
    ranked = cells.select(
        "cell",
        "c_a",
        (F.col("c_a") + F.col("c_b")).alias("t"),
        F.coalesce(
            F.sum(F.col("c_a") + F.col("c_b")).over(w), F.lit(0)
        ).alias("c_prev"),
    ).select(
        "c_a",
        "t",
        (F.col("c_prev").cast("double") + (F.col("t") + 1.0) / 2.0).alias(
            "midrank"
        ),
    )
    m = ranked.agg(
        F.sum(F.col("c_a") * F.col("midrank")).alias("r_a"),
        F.sum("c_a").cast("double").alias("n_a"),
        F.sum(F.col("t") - F.col("c_a")).cast("double").alias("n_b"),
        F.sum("t").cast("double").alias("nt"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("double")
        .alias("tie_sum"),
        F.count("*").cast("long").alias("n_cells"),
    ).withColumn("u_a", F.expr("r_a - n_a * (n_a + 1.0) / 2.0"))
    return m.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        "n_cells",
        F.expr("round(u_a + 1e-9, 2) + 0.0").alias("u_stat"),
        F.expr(f"round({_MW_Z} + 1e-9, 4) + 0.0").alias("z_score"),
    )


value_mannwhitney_grid.__doc__ = value_mannwhitney_grid.__doc__.format(
    A=_MW_GROUP_A, B=_MW_GROUP_B, W=_MW_GRID
)

VALUE_MANNWHITNEY_GRID_SQL = f"""
WITH ev AS (
  SELECT CAST(floor(value / {_MW_GRID}) AS BIGINT) AS cell,
         CASE WHEN event_type = '{_MW_GROUP_A}' THEN 1 ELSE 0 END AS is_a
  FROM events
  WHERE event_type IN ('{_MW_GROUP_A}', '{_MW_GROUP_B}')
),
cells AS (
  SELECT cell,
         CAST(sum(is_a) AS BIGINT) AS c_a,
         CAST(sum(1 - is_a) AS BIGINT) AS c_b
  FROM ev GROUP BY cell
),
ranked AS (
  SELECT c_a, c_a + c_b AS t,
         CAST(coalesce(sum(c_a + c_b) OVER (ORDER BY cell
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS DOUBLE)
           + (c_a + c_b + 1.0) / 2.0 AS midrank
  FROM cells
),
m AS (
  SELECT sum(c_a * midrank) AS r_a,
         CAST(sum(c_a) AS DOUBLE) AS n_a,
         CAST(sum(t - c_a) AS DOUBLE) AS n_b,
         CAST(sum(t) AS DOUBLE) AS nt,
         CAST(sum(t * t * t - t) AS DOUBLE) AS tie_sum,
         count(*) AS n_cells
  FROM ranked
),
u AS (SELECT *, r_a - n_a * (n_a + 1.0) / 2.0 AS u_a FROM m)
SELECT CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b,
       n_cells,
       round(u_a + 1e-9, 2) + 0.0 AS u_stat,
       round({_MW_Z} + 1e-9, 4) + 0.0 AS z_score
FROM u
"""


# --------------------------------------------------------------------------
# Chi-square independence: documents lang × source contingency table
# --------------------------------------------------------------------------


def lang_source_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between document
    language and source, reported as per-language contributions plus
    the degrees of freedom — the categorical-dependence screen
    next to mi_event_value_bands (MI measures the dependence in bits;
    chi-square is the calibrated test statisticians quote, and a
    per-language breakdown localizes WHICH language's source mix is
    skewed — the "this crawl is 90% of our German" red flag before
    mixing corpus shards).

    The subtlety empty cells: chi-square sums (o−e)²/e over the FULL
    R×C cross — cells the joint counts never saw still contribute e.
    The plan therefore crosses the two marginal relations (tiny × tiny
    by construction: languages × sources, independent of corpus size)
    and left-joins the observed joint onto it; everything upstream is
    one map-side-combinable count aggregate.

    Degrees-of-freedom columns (ADVICE r6): ``dof_per_row`` is each
    language row's contribution (C−1) — summing it over rows gives
    R·(C−1), NOT the test's dof, so it must not be summed into a
    p-value. ``dof_global`` is the true independence-test dof
    (R−1)·(C−1), repeated on every row; pair it with
    sum(chisq_contrib) for the calibrated test.
    """
    docs = load_table(spark, sf_dir, "documents").select("lang", "source")
    joint = tracked_persist(
        docs.groupBy("lang", "source").agg(F.count("*").alias("o"))
    )
    cx = joint.groupBy("lang").agg(F.sum("o").alias("c_x"))
    cy = joint.groupBy("source").agg(F.sum("o").alias("c_y"))
    n = joint.agg(
        F.sum("o").cast("double").alias("nn"),
        F.count_distinct("source").alias("n_src"),
        F.count_distinct("lang").alias("n_lang"),
    )
    grid = (
        cx.crossJoin(F.broadcast(cy))
        .join(joint, ["lang", "source"], "left")
        .crossJoin(F.broadcast(n))
        .select(
            "lang",
            F.coalesce(F.col("o"), F.lit(0)).alias("o"),
            # cast-before-multiply: long*long wraps silently at the
            # marginal sizes the 100 TB docstring targets (ADVICE r6 on
            # the MI twin); the factors are exact-integer-derived well
            # below 2^53, so the double product is exact at any
            # realistic fixture scale
            F.expr("cast(c_x as double) * cast(c_y as double) / nn").alias("e"),
            "n_src",
            "n_lang",
        )
    )
    return (
        grid.groupBy("lang")
        .agg(
            F.sum("o").cast("long").alias("n_docs"),
            F.expr(
                "round(sum((o - e) * (o - e) / e) + 1e-9, 4) + 0.0"
            ).alias("chisq_contrib"),
            (F.max("n_src") - F.lit(1)).cast("long").alias("dof_per_row"),
            F.expr("cast((max(n_lang) - 1) * (max(n_src) - 1) as bigint)").alias(
                "dof_global"
            ),
        )
        .orderBy("lang")
    )


LANG_SOURCE_CHISQ_SQL = """
WITH joint AS (
  SELECT lang, source, count(*) AS o FROM documents GROUP BY lang, source
),
cx AS (SELECT lang, CAST(sum(o) AS BIGINT) AS c_x FROM joint GROUP BY lang),
cy AS (SELECT source, CAST(sum(o) AS BIGINT) AS c_y FROM joint GROUP BY source),
n AS (
  SELECT CAST(sum(o) AS DOUBLE) AS nn,
         count(DISTINCT source) AS n_src,
         count(DISTINCT lang) AS n_lang
  FROM joint
),
grid AS (
  SELECT cx.lang,
         coalesce(j.o, 0) AS o,
         CAST(cx.c_x AS DOUBLE) * CAST(cy.c_y AS DOUBLE) / n.nn AS e,
         n.n_src,
         n.n_lang
  FROM cx CROSS JOIN cy
  LEFT JOIN joint j ON cx.lang = j.lang AND cy.source = j.source
  CROSS JOIN n
)
SELECT lang,
       CAST(sum(o) AS BIGINT) AS n_docs,
       round(sum((o - e) * (o - e) / e) + 1e-9, 4) + 0.0 AS chisq_contrib,
       CAST(max(n_src) - 1 AS BIGINT) AS dof_per_row,
       CAST((max(n_lang) - 1) * (max(n_src) - 1) AS BIGINT) AS dof_global
FROM grid GROUP BY lang ORDER BY lang
"""


# --------------------------------------------------------------------------
# Spearman rank correlation on banded pairs (per event type)
# --------------------------------------------------------------------------

_SP_XW = 10.0  # value band width
_SP_YW = 5.0  # props.$.k band width

# weighted-Pearson-over-midranks closed form over
# (nn, sx, sy, sxy, sxx, syy)
_SP_RHO = (
    "((nn * sxy - sx * sy) /"
    " sqrt((nn * sxx - sx * sx) * (nn * syy - sy * sy)))"
)


def value_spearman_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between event value and the
    ``props.$.k`` feature, per event type — the monotone-dependence
    screen that catches what Pearson (events_ols_two_factor's r²)
    misses: a nonlinear but monotone relation still scores |rho| ≈ 1.

    Exact Spearman ranks the corpus per key — a per-key global sort.
    The banded form quantizes both axes first ({XW}-wide value bands ×
    {YW}-wide k bands), then applies the standard tied-rank treatment:
    midranks per band from cumulative counts over the BOUNDED band
    relation (two tiny windows, one per axis), and rho = Pearson over
    the count-weighted (midrank_x, midrank_y) pairs — a closed form
    over six moments shared verbatim by both engines. The joint
    relation is bands×bands per type, independent of corpus size.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") / _SP_XW).cast("long").alias("bx"),
        F.floor(
            F.get_json_object("props", "$.k").cast("double") / _SP_YW
        ).cast("long").alias("bk"),
    ).filter(F.col("bk").isNotNull())
    joint = tracked_persist(
        ev.groupBy("event_type", "bx", "bk").agg(F.count("*").alias("c"))
    )
    wx = (
        Window.partitionBy("event_type")
        .orderBy("bx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    mx = (
        joint.groupBy("event_type", "bx")
        .agg(F.sum("c").alias("t"))
        .select(
            "event_type",
            "bx",
            (
                F.coalesce(F.sum("t").over(wx), F.lit(0)).cast("double")
                + (F.col("t") + 1.0) / 2.0
            ).alias("rx"),
        )
    )
    wy = (
        Window.partitionBy("event_type")
        .orderBy("bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    my = (
        joint.groupBy("event_type", "bk")
        .agg(F.sum("c").alias("t"))
        .select(
            "event_type",
            "bk",
            (
                F.coalesce(F.sum("t").over(wy), F.lit(0)).cast("double")
                + (F.col("t") + 1.0) / 2.0
            ).alias("ry"),
        )
    )
    pairs = joint.join(mx, ["event_type", "bx"]).join(my, ["event_type", "bk"])
    m = pairs.groupBy("event_type").agg(
        F.sum("c").cast("double").alias("nn"),
        F.sum(F.col("c") * F.col("rx")).alias("sx"),
        F.sum(F.col("c") * F.col("ry")).alias("sy"),
        F.sum(F.col("c") * F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(F.col("c") * F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("c") * F.col("ry") * F.col("ry")).alias("syy"),
    )
    return m.select(
        "event_type",
        F.col("nn").cast("long").alias("n_rows"),
        F.expr(f"round({_SP_RHO} + 1e-9, 6) + 0.0").alias("spearman_rho"),
    ).orderBy("event_type")


value_spearman_banded.__doc__ = value_spearman_banded.__doc__.format(
    XW=_SP_XW, YW=_SP_YW
)

VALUE_SPEARMAN_BANDED_SQL = f"""
WITH ev AS (
  SELECT event_type,
         CAST(floor(value / {_SP_XW}) AS BIGINT) AS bx,
         CAST(floor(CAST(json_extract_string(props, '$.k') AS DOUBLE)
                    / {_SP_YW}) AS BIGINT) AS bk
  FROM events
),
joint AS (
  SELECT event_type, bx, bk, count(*) AS c
  FROM ev WHERE bk IS NOT NULL
  GROUP BY event_type, bx, bk
),
mx AS (
  SELECT event_type, bx,
         CAST(coalesce(sum(t) OVER (PARTITION BY event_type ORDER BY bx
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS DOUBLE) + (t + 1.0) / 2.0 AS rx
  FROM (SELECT event_type, bx, CAST(sum(c) AS BIGINT) AS t
        FROM joint GROUP BY event_type, bx) sub_x
),
my AS (
  SELECT event_type, bk,
         CAST(coalesce(sum(t) OVER (PARTITION BY event_type ORDER BY bk
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS DOUBLE) + (t + 1.0) / 2.0 AS ry
  FROM (SELECT event_type, bk, CAST(sum(c) AS BIGINT) AS t
        FROM joint GROUP BY event_type, bk) sub_y
),
m AS (
  SELECT j.event_type,
         CAST(sum(j.c) AS DOUBLE) AS nn,
         sum(j.c * mx.rx) AS sx, sum(j.c * my.ry) AS sy,
         sum(j.c * mx.rx * my.ry) AS sxy,
         sum(j.c * mx.rx * mx.rx) AS sxx,
         sum(j.c * my.ry * my.ry) AS syy
  FROM joint j
  JOIN mx ON j.event_type = mx.event_type AND j.bx = mx.bx
  JOIN my ON j.event_type = my.event_type AND j.bk = my.bk
  GROUP BY j.event_type
)
SELECT event_type,
       CAST(nn AS BIGINT) AS n_rows,
       round({_SP_RHO} + 1e-9, 6) + 0.0 AS spearman_rho
FROM m ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Poisson-bootstrap confidence intervals (deterministic, hash-seeded)
# --------------------------------------------------------------------------

_BOOT_B = 32

# Cumulative Poisson(1) thresholds for the inverse-CDF draw — written
# as shared 16-digit literals so both engines compare against the
# exact same constants.
_POIS_T = [
    "0.3678794411714423",
    "0.7357588823428846",
    "0.9196986029286058",
    "0.9810118431238462",
    "0.9963401531726563",
    "0.9994058151824183",
]


def _boot_w(u_expr: str) -> str:
    """Shared CASE ladder: dyadic uniform → Poisson(1) weight 0..6."""
    cases = " ".join(
        f"WHEN {u_expr} < {t} THEN {k}" for k, t in enumerate(_POIS_T)
    )
    return f"(CASE {cases} ELSE 6 END)"


def events_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for each event type's
    mean value — THE scale idiom for uncertainty on massive data:
    classical bootstrap resamples the corpus B times (B full shuffles
    of a 100 TB table); the Poisson bootstrap (Chamandy 2012) instead
    gives every row an independent Poisson(1) replicate weight, so all
    B replicates stream past in ONE scan and reduce map-side to
    B×key-space moment rows.

    Determinism: the weight for (event, replicate) is the inverse-CDF
    Poisson(1) draw from the md5-derived dyadic uniform (the
    dp_noised_release idiom), so both engines draw bit-identical
    weights. The replicate fan-out is a {B}-element sequence explode
    collapsed immediately by the grouped aggregate — the shuffle
    carries event_types × {B} rows regardless of corpus size. The CI
    is order-statistic: ranks 2 and {B1} of the {B} sorted replicate
    means (≈ 94% coverage), a bounded per-type window.
    """
    # dyadic uniform from the first 8 md5 hex digits. Round 13 (guide
    # §1.2 "per-task work"): one conv() parse of the 8-digit prefix
    # replaces the former 8×(substring+instr+multiply)+7-add chain —
    # BIT-IDENTICAL: Σ digit_i·16^-i = V·2^-32 where V is the 8-digit
    # integer; every partial sum of the old chain and V·2^-32 are
    # exact binary fractions (≤32 mantissa bits), verified equal over
    # 2M keys before landing.
    u = F.conv(F.substring(F.col("m"), 1, 8), 16, 10).cast("double") * F.lit(
        2.0 ** -32
    )
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "event_type", "value")
        .withColumn("b", F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))))
        .withColumn(
            "m",
            F.md5(
                F.concat(
                    F.lit("boot|"),
                    F.col("event_id").cast("string"),
                    F.lit("|"),
                    F.col("b").cast("string"),
                )
            ),
        )
        .withColumn("u", u)
        .withColumn("w", F.expr(_boot_w("u")).cast("double"))
    )
    reps = ev.groupBy("event_type", "b").agg(
        (F.sum(F.col("w") * F.col("value")) / F.sum("w")).alias("rep_mean")
    )
    # NULLS LAST pins a latent cross-engine divergence (ADVICE r6): a
    # (type, replicate) group that drew all-zero Poisson weights would
    # yield NULL rep_mean, which Spark sorts first and DuckDB last —
    # shifting the rank-2/rank-(B-1) CI rows differently per engine.
    # Unreachable at fixture sizes (P ~ e^-n per group), but the
    # ordering contract should not depend on that.
    wrk = Window.partitionBy("event_type").orderBy(
        F.col("rep_mean").asc_nulls_last()
    )
    ranked = reps.withColumn("rk", F.row_number().over(wrk))
    return (
        ranked.groupBy("event_type")
        .agg(
            F.expr("round(avg(rep_mean) + 1e-9, 4) + 0.0").alias("boot_mean"),
            F.expr(
                "round(max(CASE WHEN rk = 2 THEN rep_mean END) + 1e-9, 4)"
                " + 0.0"
            ).alias("ci_lo"),
            F.expr(
                f"round(max(CASE WHEN rk = {_BOOT_B - 1} THEN rep_mean END)"
                " + 1e-9, 4) + 0.0"
            ).alias("ci_hi"),
            F.count("*").cast("long").alias("n_reps"),
        )
        .orderBy("event_type")
    )


events_bootstrap_ci.__doc__ = events_bootstrap_ci.__doc__.format(
    B=_BOOT_B, B1=_BOOT_B - 1
)


def _boot_u_sql(key_expr: str) -> str:
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5({key_expr}), {i}, 1)) - 1)"
        f" * {16.0 ** -i!r}"
        for i in range(1, 9)
    )
    return f"({terms})"


EVENTS_BOOTSTRAP_CI_SQL = f"""
WITH ev AS (
  SELECT e.event_type, e.value, t.b,
         CAST({_boot_w(_boot_u_sql("'boot|' || CAST(e.event_id AS VARCHAR) || '|' || CAST(t.b AS VARCHAR)"))}
              AS DOUBLE) AS w
  FROM events e
  CROSS JOIN (SELECT unnest(range({_BOOT_B})) AS b) t
),
reps AS (
  SELECT event_type, b, sum(w * value) / sum(w) AS rep_mean
  FROM ev GROUP BY event_type, b
),
ranked AS (
  SELECT event_type, rep_mean,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY rep_mean NULLS LAST) AS rk
  FROM reps
)
SELECT event_type,
       round(avg(rep_mean) + 1e-9, 4) + 0.0 AS boot_mean,
       round(max(CASE WHEN rk = 2 THEN rep_mean END) + 1e-9, 4) + 0.0
         AS ci_lo,
       round(max(CASE WHEN rk = {_BOOT_B - 1} THEN rep_mean END) + 1e-9, 4)
         + 0.0 AS ci_hi,
       count(*) AS n_reps
FROM ranked GROUP BY event_type ORDER BY event_type
"""


# --------------------------------------------------------------------------
# One-way ANOVA across event types
# --------------------------------------------------------------------------

# shared closed forms over per-group moments joined with grand totals
_AOV_SSB = "sum(ng * (sg / ng - st / nt) * (sg / ng - st / nt))"
_AOV_SSW = "sum(qg - sg * sg / ng)"


def events_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of value across event types — the k-group
    generalization of source_welch_ttest's two-sample question: does
    the mean differ ANYWHERE across the categorical? (The F-stat is
    the gatekeeper run before k·(k−1)/2 pairwise tests.) Emits the
    full decomposition (SS between / within, dofs, F) so the
    eta-squared effect size is recoverable.

    Same algebraic-moment shape as the rest of the module: one
    grouped aggregate (k × 3 moments), grand totals re-aggregated
    from the group moments (no second scan), closed forms shared
    verbatim by both engines.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("value").alias("x")
    )
    g = ev.groupBy("event_type").agg(
        F.count("*").cast("double").alias("ng"),
        F.sum("x").alias("sg"),
        F.sum(F.col("x") * F.col("x")).alias("qg"),
    )
    tot = g.agg(
        F.sum("ng").alias("nt"),
        F.sum("sg").alias("st"),
        F.count("*").cast("double").alias("k"),
    )
    m = g.crossJoin(F.broadcast(tot)).agg(
        F.max("k").alias("k"),
        F.max("nt").alias("nt"),
        F.expr(_AOV_SSB).alias("ssb"),
        F.expr(_AOV_SSW).alias("ssw"),
    )
    return m.select(
        F.col("k").cast("long").alias("k_groups"),
        F.col("nt").cast("long").alias("n_rows"),
        F.expr("round(ssb + 1e-9, 4) + 0.0").alias("ss_between"),
        F.expr("round(ssw + 1e-9, 4) + 0.0").alias("ss_within"),
        F.expr(
            "round((ssb / (k - 1.0)) / (ssw / (nt - k)) + 1e-9, 6) + 0.0"
        ).alias("f_stat"),
    )


EVENTS_ANOVA_ONEWAY_SQL = f"""
WITH g AS (
  SELECT event_type,
         CAST(count(*) AS DOUBLE) AS ng,
         sum(value) AS sg,
         sum(value * value) AS qg
  FROM events GROUP BY event_type
),
tot AS (
  SELECT sum(ng) AS nt, sum(sg) AS st, CAST(count(*) AS DOUBLE) AS k FROM g
),
m AS (
  SELECT max(k) AS k, max(nt) AS nt,
         {_AOV_SSB} AS ssb,
         {_AOV_SSW} AS ssw
  FROM g CROSS JOIN tot
)
SELECT CAST(k AS BIGINT) AS k_groups,
       CAST(nt AS BIGINT) AS n_rows,
       round(ssb + 1e-9, 4) + 0.0 AS ss_between,
       round(ssw + 1e-9, 4) + 0.0 AS ss_within,
       round((ssb / (k - 1.0)) / (ssw / (nt - k)) + 1e-9, 6) + 0.0 AS f_stat
FROM m
"""


# --------------------------------------------------------------------------
# Kaplan–Meier survival curve: time to repeat purchase
# --------------------------------------------------------------------------


def orders_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier estimate of the time-to-repeat-purchase curve:
    per customer, the days from first to second order; customers who
    never reorder are RIGHT-CENSORED at the end of the observation
    window — the survival machinery (risk sets, censoring) that naive
    "average days between orders" gets wrong by silently dropping
    exactly the customers who churned.

    S(t) = Π_{u≤t} (1 − d_u/n_u) over event times u; the product is
    exp of a cumulative sum of logs — a window over the DAY-keyed
    aggregate, which is calendar-bounded regardless of customer
    count. Upstream: one per-customer two-order window (first/second
    order date via min + conditional min), one day-keyed aggregate.
    Per-day log terms are exact-integer-derived, rounded 8dp before
    the cumulative sum.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate"
    )
    horizon = orders.agg(F.max("o_orderdate").alias("h"))
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    firsts = (
        load_table(spark, sf_dir, "orders")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .groupBy("o_custkey")
        .agg(
            F.min(F.when(F.col("rk") == 1, F.col("o_orderdate"))).alias("d1"),
            F.min(F.when(F.col("rk") == 2, F.col("o_orderdate"))).alias("d2"),
        )
    )
    spans = firsts.crossJoin(F.broadcast(horizon)).select(
        F.when(
            F.col("d2").isNotNull(), F.datediff("d2", "d1")
        ).otherwise(F.datediff("h", "d1")).cast("long").alias("t"),
        F.col("d2").isNotNull().cast("long").alias("is_event"),
    )
    days = spans.groupBy("t").agg(
        F.sum("is_event").alias("d"),
        F.sum(1 - F.col("is_event")).alias("c"),
    )
    n_tot = days.agg(F.sum(F.col("d") + F.col("c")).alias("nn"))
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    wlog = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    risk = (
        days.crossJoin(F.broadcast(n_tot))
        .withColumn(
            "n_risk",
            F.col("nn")
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(wcum), F.lit(0)),
        )
        .withColumn(
            # d == n_risk (everyone remaining fails) sends S to exactly
            # 0: the -1e6 sentinel underflows exp() to 0.0 identically
            # on both engines, avoiding ln(0)
            "logterm",
            F.when(
                (F.col("d") > 0) & (F.col("d") < F.col("n_risk")),
                F.round(
                    F.log(1.0 - F.col("d") / F.col("n_risk")) + 1e-12, 8
                ),
            )
            .when(F.col("d") == F.col("n_risk"), F.lit(-1e6))
            .otherwise(F.lit(0.0)),
        )
        .withColumn("logs", F.sum("logterm").over(wlog))
    )
    return (
        risk.filter(F.col("d") > 0)
        .select(
            F.col("t").alias("t_days"),
            F.col("n_risk").cast("long").alias("n_risk"),
            F.col("d").cast("long").alias("n_events"),
            F.col("c").cast("long").alias("n_censored"),
            F.expr("round(exp(logs) + 1e-9, 6) + 0.0").alias("survival"),
        )
        .orderBy("t_days")
    )


ORDERS_SURVIVAL_KM_SQL = """
WITH ranked AS (
  SELECT o_custkey, o_orderdate,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rk
  FROM orders
),
firsts AS (
  SELECT o_custkey,
         min(CASE WHEN rk = 1 THEN o_orderdate END) AS d1,
         min(CASE WHEN rk = 2 THEN o_orderdate END) AS d2
  FROM ranked WHERE rk <= 2 GROUP BY o_custkey
),
horizon AS (SELECT max(o_orderdate) AS h FROM orders),
spans AS (
  SELECT CASE WHEN d2 IS NOT NULL
              THEN CAST(date_diff('day', d1, d2) AS BIGINT)
              ELSE CAST(date_diff('day', d1, h) AS BIGINT) END AS t,
         CASE WHEN d2 IS NOT NULL THEN 1 ELSE 0 END AS is_event
  FROM firsts CROSS JOIN horizon
),
days AS (
  SELECT t, CAST(sum(is_event) AS BIGINT) AS d,
         CAST(sum(1 - is_event) AS BIGINT) AS c
  FROM spans GROUP BY t
),
n_tot AS (SELECT CAST(sum(d + c) AS BIGINT) AS nn FROM days),
risk AS (
  SELECT t, d, c,
         nn - coalesce(sum(d + c) OVER (ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS n_risk
  FROM days CROSS JOIN n_tot
),
logged AS (
  SELECT t, d, c, n_risk,
         sum(CASE WHEN d > 0 AND d < n_risk
                  THEN round(ln(1.0 - CAST(d AS DOUBLE) / n_risk) + 1e-12, 8)
                  WHEN d = n_risk THEN -1e6
                  ELSE 0.0 END)
           OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS logs
  FROM risk
)
SELECT t AS t_days,
       CAST(n_risk AS BIGINT) AS n_risk,
       d AS n_events,
       c AS n_censored,
       round(exp(logs) + 1e-9, 6) + 0.0 AS survival
FROM logged WHERE d > 0 ORDER BY t_days
"""


# --------------------------------------------------------------------------
# Poisson regression (log link) via unrolled IRLS
# --------------------------------------------------------------------------

_IRLS_ITERS = 3
_IRLS_CAP = 20.0  # eta cap: exp overflow guard, identical both engines


def _irls_pass(base, b, it: int):
    """One IRLS step: weighted-least-squares moments under the current
    coefficients, closed-form 2×2 solve, coefficients rounded 8dp."""
    j = base.crossJoin(F.broadcast(b))
    m = j.select(
        F.expr(f"least(b0 + b1 * x, {_IRLS_CAP})").alias("eta"),
        "x",
        "y",
    ).select(
        "x",
        "y",
        "eta",
        F.expr("exp(eta)").alias("mu"),
    ).select(
        F.expr("mu").alias("w"),
        "x",
        F.expr("eta + (y - mu) / mu").alias("z"),
    ).agg(
        F.sum("w").alias("sw"),
        F.sum(F.col("w") * F.col("x")).alias("swx"),
        F.sum(F.col("w") * F.col("x") * F.col("x")).alias("swxx"),
        F.sum(F.col("w") * F.col("z")).alias("swz"),
        F.sum(F.col("w") * F.col("x") * F.col("z")).alias("swxz"),
    )
    return m.select(
        F.expr(
            "round((sw * swxz - swx * swz) / (sw * swxx - swx * swx)"
            " + 1e-12, 8)"
        ).alias("b1"),
        F.expr(
            "round((swz - ((sw * swxz - swx * swz) / (sw * swxx - swx * swx))"
            " * swx) / sw + 1e-12, 8)"
        ).alias("b0"),
    )


def user_poisson_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson regression with log link — purchases-per-user modeled
    as y ~ Poisson(exp(b0 + b1·views)) — the GLM step past the
    Gaussian OLS family (events_ols_two_factor): count outcomes need
    a multiplicative rate model, and IRLS is how every GLM library
    fits one. Three unrolled IRLS iterations: each is ONE aggregate
    over the user-sized relation (five weighted moments) + a scalar
    2×2 weighted-least-squares solve — the moment-aggregate
    discipline extended to an iteratively-reweighted objective, with
    the same "driver never loops over data" property as pagerank
    (iteration count fixed, coefficients live in a broadcast 1-row
    relation).

    Cross-engine: η capped at {C} (identical overflow guard),
    coefficients rounded 8dp per iteration so exp() drift cannot
    compound. Init: b0 = ln(ȳ), b1 = 0 — the canonical null start.
    """
    ev = load_table(spark, sf_dir, "events")
    base = tracked_persist(
        ev.groupBy("user_id").agg(
            F.count_if(F.col("event_type") == "view")
            .cast("double")
            .alias("x"),
            F.count_if(F.col("event_type") == "purchase")
            .cast("double")
            .alias("y"),
        )
    )
    b = base.agg(
        F.expr("round(ln(avg(y)) + 1e-12, 8)").alias("b0"),
        F.lit(0.0).alias("b1"),
    )
    for it in range(_IRLS_ITERS):
        b = _irls_pass(base, b, it)
    final = base.crossJoin(F.broadcast(b))
    return final.agg(
        F.count("*").cast("long").alias("n_users"),
        F.expr("round(max(b0) + 1e-9, 6) + 0.0").alias("b0"),
        F.expr("round(max(b1) + 1e-9, 6) + 0.0").alias("b_views"),
        F.expr(
            f"round(avg(exp(least(b0 + b1 * x, {_IRLS_CAP}))) + 1e-9, 4)"
            " + 0.0"
        ).alias("avg_fitted_rate"),
        F.expr("round(avg(y) + 1e-9, 4) + 0.0").alias("avg_observed"),
    )


user_poisson_regression.__doc__ = user_poisson_regression.__doc__.format(
    C=_IRLS_CAP
)


def _irls_pass_sql(prev: str, out: str) -> str:
    return f"""
m_{out} AS (
  SELECT sum(mu) AS sw,
         sum(mu * x) AS swx,
         sum(mu * x * x) AS swxx,
         sum(mu * (eta + (y - mu) / mu)) AS swz,
         sum(mu * x * (eta + (y - mu) / mu)) AS swxz
  FROM (
    SELECT x, y, eta, exp(eta) AS mu
    FROM (SELECT x, y, least({prev}.b0 + {prev}.b1 * x, {_IRLS_CAP}) AS eta
          FROM base CROSS JOIN {prev}) i
  ) s
),
{out} AS (
  SELECT round((sw * swxz - swx * swz) / (sw * swxx - swx * swx)
               + 1e-12, 8) AS b1,
         round((swz - ((sw * swxz - swx * swz) / (sw * swxx - swx * swx))
                * swx) / sw + 1e-12, 8) AS b0
  FROM m_{out}
)"""


USER_POISSON_REGRESSION_SQL = (
    """
WITH base AS MATERIALIZED (
  SELECT user_id,
         CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS DOUBLE)
           AS x,
         CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS DOUBLE)
           AS y
  FROM events GROUP BY user_id
),
b_init AS (
  SELECT round(ln(avg(y)) + 1e-12, 8) AS b0, CAST(0.0 AS DOUBLE) AS b1
  FROM base
),"""
    + ",".join(
        _irls_pass_sql("b_init" if i == 0 else f"b_{i}", f"b_{i + 1}")
        for i in range(_IRLS_ITERS)
    )
    + f"""
SELECT CAST(count(*) AS BIGINT) AS n_users,
       round(max(b.b0) + 1e-9, 6) + 0.0 AS b0,
       round(max(b.b1) + 1e-9, 6) + 0.0 AS b_views,
       round(avg(exp(least(b.b0 + b.b1 * base.x, {_IRLS_CAP}))) + 1e-9, 4)
         + 0.0 AS avg_fitted_rate,
       round(avg(base.y) + 1e-9, 4) + 0.0 AS avg_observed
FROM base CROSS JOIN b_{_IRLS_ITERS} b
"""
)


# --------------------------------------------------------------------------
# Logistic regression (binomial GLM) via unrolled IRLS
# --------------------------------------------------------------------------

_LOGIT_ITERS = 4
_LOGIT_CAP = 15.0


def user_logistic_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression — is-the-user-a-buyer (more purchases
    than views) ~ sigmoid(b0 + b1·views) — completing the GLM family
    next to the Gaussian
    (events_ols_two_factor) and Poisson (user_poisson_regression)
    members: binary outcomes need the binomial link, and the same
    IRLS shape fits it — {I} unrolled iterations, each one weighted
    five-moment aggregate over the user-sized relation (w = μ(1−μ),
    z = η + (y−μ)/w) + a scalar 2×2 solve.

    Cross-engine: η capped at ±{C} (sigmoid saturates; the cap also
    bounds 1/w), coefficients rounded 8dp per iteration. Init: b0 =
    logit(ȳ), b1 = 0. Output includes training accuracy at the 0.5
    threshold — exact-integer-derived.
    """
    base, b, eta = _logistic_fit(spark, sf_dir)
    final = base.crossJoin(F.broadcast(b)).withColumn("eta", F.expr(eta))
    return final.agg(
        F.count("*").cast("long").alias("n_users"),
        F.expr("round(max(b0) + 1e-9, 6) + 0.0").alias("b0"),
        F.expr("round(max(b1) + 1e-9, 6) + 0.0").alias("b_views"),
        F.count_if(
            ((F.expr("eta") > 0) & (F.col("y") == 1.0))
            | ((F.expr("eta") <= 0) & (F.col("y") == 0.0))
        )
        .cast("long")
        .alias("n_correct_at_half"),
        F.expr("round(avg(y) + 1e-9, 4) + 0.0").alias("base_rate"),
    )


def _logistic_fit(spark: SparkSession, sf_dir: str):
    """The {I}-iteration IRLS fit (see ``user_logistic_regression``) —
    factored so the calibration audit reuses the identical coefficient
    path. Returns (base, b, eta_expr): the persisted per-user (x, y)
    relation, the 1-row coefficient frame, and the capped-link SQL
    expression text."""
    ev = load_table(spark, sf_dir, "events")
    base = tracked_persist(
        ev.groupBy("user_id").agg(
            F.count_if(F.col("event_type") == "view")
            .cast("double")
            .alias("x"),
            (
                F.count_if(F.col("event_type") == "purchase")
                > F.count_if(F.col("event_type") == "view")
            )
            .cast("double")
            .alias("y"),
        )
    )
    b = base.agg(
        F.expr("round(ln(avg(y) / (1.0 - avg(y))) + 1e-12, 8)").alias("b0"),
        F.lit(0.0).alias("b1"),
    )
    eta = f"greatest(least(b0 + b1 * x, {_LOGIT_CAP}), -{_LOGIT_CAP})"
    for _ in range(_LOGIT_ITERS):
        j = base.crossJoin(F.broadcast(b))
        m = (
            j.select(
                "x",
                "y",
                F.expr(eta).alias("eta"),
            )
            .select(
                "x",
                "y",
                "eta",
                F.expr("1.0 / (1.0 + exp(-eta))").alias("mu"),
            )
            .select(
                "x",
                F.expr("mu * (1.0 - mu)").alias("w"),
                F.expr("eta + (y - mu) / (mu * (1.0 - mu))").alias("z"),
            )
            .agg(
                F.sum("w").alias("sw"),
                F.sum(F.col("w") * F.col("x")).alias("swx"),
                F.sum(F.col("w") * F.col("x") * F.col("x")).alias("swxx"),
                F.sum(F.col("w") * F.col("z")).alias("swz"),
                F.sum(F.col("w") * F.col("x") * F.col("z")).alias("swxz"),
            )
        )
        b = m.select(
            F.expr(
                "round((sw * swxz - swx * swz) / (sw * swxx - swx * swx)"
                " + 1e-12, 8)"
            ).alias("b1"),
            F.expr(
                "round((swz - ((sw * swxz - swx * swz) /"
                " (sw * swxx - swx * swx)) * swx) / sw + 1e-12, 8)"
            ).alias("b0"),
        )
    return base, b, eta


_logistic_fit.__doc__ = _logistic_fit.__doc__.format(I=_LOGIT_ITERS)

user_logistic_regression.__doc__ = user_logistic_regression.__doc__.format(
    I=_LOGIT_ITERS, C=_LOGIT_CAP
)


def _logit_pass_sql(prev: str, out: str) -> str:
    eta = (
        f"greatest(least({prev}.b0 + {prev}.b1 * x, {_LOGIT_CAP}),"
        f" -{_LOGIT_CAP})"
    )
    return f"""
m_{out} AS (
  SELECT sum(w) AS sw, sum(w * x) AS swx, sum(w * x * x) AS swxx,
         sum(w * z) AS swz, sum(w * x * z) AS swxz
  FROM (
    SELECT x, mu * (1.0 - mu) AS w,
           eta + (y - mu) / (mu * (1.0 - mu)) AS z
    FROM (
      SELECT x, y, eta, 1.0 / (1.0 + exp(-eta)) AS mu
      FROM (SELECT x, y, {eta} AS eta
            FROM lbase CROSS JOIN {prev}) i
    ) s
  ) t
),
{out} AS (
  SELECT round((sw * swxz - swx * swz) / (sw * swxx - swx * swx)
               + 1e-12, 8) AS b1,
         round((swz - ((sw * swxz - swx * swz) / (sw * swxx - swx * swx))
                * swx) / sw + 1e-12, 8) AS b0
  FROM m_{out}
)"""


def _logit_ctes() -> str:
    """The WITH body through the final coefficient CTE lb_{ITERS} —
    ONE SQL construction of the IRLS path, shared by the regression
    row and the calibration audit (mirrors ``_logistic_fit``)."""
    return (
        """lbase AS MATERIALIZED (
  SELECT user_id,
         CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS DOUBLE)
           AS x,
         CASE WHEN count(CASE WHEN event_type = 'purchase' THEN 1 END)
                   > count(CASE WHEN event_type = 'view' THEN 1 END)
              THEN 1.0 ELSE 0.0 END AS y
  FROM events GROUP BY user_id
),
lb_init AS (
  SELECT round(ln(avg(y) / (1.0 - avg(y))) + 1e-12, 8) AS b0,
         CAST(0.0 AS DOUBLE) AS b1
  FROM lbase
),"""
        + ",".join(
            _logit_pass_sql("lb_init" if i == 0 else f"lb_{i}", f"lb_{i + 1}")
            for i in range(_LOGIT_ITERS)
        )
    )


USER_LOGISTIC_REGRESSION_SQL = (
    "WITH "
    + _logit_ctes()
    + f"""
SELECT CAST(count(*) AS BIGINT) AS n_users,
       round(max(b.b0) + 1e-9, 6) + 0.0 AS b0,
       round(max(b.b1) + 1e-9, 6) + 0.0 AS b_views,
       CAST(count(CASE WHEN (greatest(least(b.b0 + b.b1 * lbase.x,
                    {_LOGIT_CAP}), -{_LOGIT_CAP}) > 0 AND lbase.y = 1.0)
                    OR (greatest(least(b.b0 + b.b1 * lbase.x,
                    {_LOGIT_CAP}), -{_LOGIT_CAP}) <= 0 AND lbase.y = 0.0)
                  THEN 1 END) AS BIGINT) AS n_correct_at_half,
       round(avg(lbase.y) + 1e-9, 4) + 0.0 AS base_rate
FROM lbase CROSS JOIN lb_{_LOGIT_ITERS} b
"""
)


def user_logistic_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-free evaluation of the fitted logistic model — the
    table a model-selection step actually reads: accuracy-at-0.5
    (already on the regression row) hides everything about ranking
    quality, so this emits ROC-AUC (tie-corrected rank statistic),
    average precision (the PR-curve integral — the metric that
    matters under class imbalance, and buyers ARE rare here), and the
    Brier score, all over the SAME IRLS coefficient path as
    ``user_logistic_regression`` (`_logistic_fit` — train and eval
    cannot drift apart).

    Shapes: scores collapse to the per-distinct-score (n_pos, n_neg)
    relation — bounded by the distinct view-count domain, NOT the
    user count — then AUC = Σ np·(nn_below + nn/2) / (P·N) and
    AP = Σ (np/P)·precision@block via two cumulative windows over
    that bounded relation (unpartitioned-window-above-aggregate, the
    lint-sanctioned shape). μ is rounded 8dp before the Brier sum so
    both engines square identical doubles; finals get the shared
    round-with-nudge.
    """
    base, b, eta = _logistic_fit(spark, sf_dir)
    scored = base.crossJoin(F.broadcast(b)).select(
        "y", F.expr(eta).alias("s")
    )
    byscore = scored.groupBy("s").agg(
        F.count_if(F.col("y") == 1.0).cast("long").alias("np"),
        F.count_if(F.col("y") == 0.0).cast("long").alias("nn"),
    )
    w_below = Window.orderBy("s").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_desc = Window.orderBy(F.col("s").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = byscore.select(
        "np",
        "nn",
        F.coalesce(F.sum("nn").over(w_below), F.lit(0)).alias("nn_below"),
        F.sum("np").over(w_desc).alias("cum_tp"),
        (F.sum("np").over(w_desc) + F.sum("nn").over(w_desc)).alias(
            "cum_pred"
        ),
    )
    rank_side = cum.agg(
        F.sum("np").cast("long").alias("n_pos"),
        F.sum("nn").cast("long").alias("n_neg"),
        (
            F.round(
                F.sum(
                    F.col("np")
                    * (F.col("nn_below") + F.col("nn") / 2.0)
                )
                / (
                    F.sum("np")
                    * F.sum("nn").cast("double")
                )
                + 1e-9,
                6,
            )
            + 0.0
        ).alias("roc_auc"),
        (
            F.round(
                F.sum(
                    F.col("np")
                    * (F.col("cum_tp") / F.col("cum_pred").cast("double"))
                )
                / F.sum("np")
                + 1e-9,
                6,
            )
            + 0.0
        ).alias("avg_precision"),
    )
    mu = "round(1.0 / (1.0 + exp(-s)), 8)"
    loss_side = scored.agg(
        F.count("*").cast("long").alias("n_users"),
        (
            F.round(
                F.avg(F.expr(f"({mu} - y) * ({mu} - y)")) + 1e-9, 6
            )
            + 0.0
        ).alias("brier"),
    )
    return loss_side.crossJoin(F.broadcast(rank_side)).select(
        "n_users", "n_pos", "n_neg", "roc_auc", "avg_precision", "brier"
    )


USER_LOGISTIC_ROC_AUC_SQL = (
    "WITH "
    + _logit_ctes()
    + f""",
scored AS (
  SELECT y, greatest(least(b.b0 + b.b1 * lbase.x, {_LOGIT_CAP}),
                     -{_LOGIT_CAP}) AS s
  FROM lbase CROSS JOIN lb_{_LOGIT_ITERS} b
),
byscore AS (
  SELECT s,
         CAST(count(CASE WHEN y = 1.0 THEN 1 END) AS BIGINT) AS np,
         CAST(count(CASE WHEN y = 0.0 THEN 1 END) AS BIGINT) AS nn
  FROM scored GROUP BY s
),
cum AS (
  SELECT np, nn,
         coalesce(sum(nn) OVER (ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS nn_below,
         sum(np) OVER (ORDER BY s DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tp,
         sum(np + nn) OVER (ORDER BY s DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pred
  FROM byscore
),
rank_side AS (
  SELECT CAST(sum(np) AS BIGINT) AS n_pos,
         CAST(sum(nn) AS BIGINT) AS n_neg,
         round(sum(np * (nn_below + nn / 2.0))
               / (sum(np) * CAST(sum(nn) AS DOUBLE)) + 1e-9, 6) + 0.0
           AS roc_auc,
         round(sum(np * (cum_tp / CAST(cum_pred AS DOUBLE))) / sum(np)
               + 1e-9, 6) + 0.0 AS avg_precision
  FROM cum
),
loss_side AS (
  SELECT CAST(count(*) AS BIGINT) AS n_users,
         round(avg((round(1.0 / (1.0 + exp(-s)), 8) - y)
                   * (round(1.0 / (1.0 + exp(-s)), 8) - y)) + 1e-9, 6)
           + 0.0 AS brier
  FROM scored
)
SELECT n_users, n_pos, n_neg, roc_auc, avg_precision, brier
FROM loss_side CROSS JOIN rank_side
"""
)


_XC_MAX_LAG = 6  # cross-correlation lag search window (hours)


def events_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation between event types' hourly volumes —
    the LEAD/LAG discovery next to `events_autocorr_lag1`'s memory
    measure: for every ordered type pair (a → b), the Pearson
    correlation of a's hourly count with b's count {L} hours later,
    for lags 0..{M}, reporting lag-0 and the best lag (argmax r, ties
    to the smallest lag). "Errors lead purchases by 2 hours" is an
    alerting rule; this is the table that finds it.

    Shape: one corpus scan to (type, hour) counts; the lag fan-out is
    an explode of the {N}-lag array on the a-side followed by an
    equi-join on the shifted hour — pairs × lags × hours rows, all
    bounded by the time span, never the corpus. The correlation
    closed form is the module's shared `_AC_R` fragment; argmax via
    struct-min with the lag tie-break.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hr"),
    ).agg(F.count("*").cast("double").alias("n"))
    a = hourly.select(
        F.col("event_type").alias("type_a"),
        "hr",
        F.col("n").alias("a"),
        F.explode(
            F.array(*[F.lit(k) for k in range(_XC_MAX_LAG + 1)])
        ).alias("lag"),
    )
    b = hourly.select(
        F.col("event_type").alias("type_b"),
        F.col("hr").alias("hr_b"),
        F.col("n").alias("b"),
    )
    m = (
        a.join(b, a.hr + a.lag == b.hr_b)
        .filter(F.col("type_a") != F.col("type_b"))
        .groupBy("type_a", "type_b", "lag")
        .agg(
            F.count("*").cast("double").alias("np"),
            F.sum("a").alias("sa"),
            F.sum("b").alias("sb"),
            F.sum(F.col("a") * F.col("b")).alias("sab"),
            F.sum(F.col("a") * F.col("a")).alias("saa"),
            F.sum(F.col("b") * F.col("b")).alias("sbb"),
        )
    )
    scored = m.select(
        "type_a",
        "type_b",
        "lag",
        F.col("np").cast("long").alias("n_points"),
        F.expr(f"round({_AC_R} + 1e-9, 6) + 0.0").alias("r"),
    )
    return (
        scored.groupBy("type_a", "type_b")
        .agg(
            F.max(F.when(F.col("lag") == 0, F.col("r"))).alias("r_lag0"),
            # NULL r (zero-variance series) is pinned to LOSE the
            # argmax in BOTH engines: here via coalesce(+inf) in the
            # struct-min sort key, in the oracle via an explicit
            # NULLS LAST — otherwise Spark's nulls-first struct order
            # and DuckDB's nulls-last default would pick different
            # winners on degenerate pairs (ADVICE r10). The raw r
            # rides along so r_best stays NULL when every lag is
            # degenerate.
            F.min(
                F.struct(
                    F.coalesce(-F.col("r"), F.lit(float("inf"))).alias("nr"),
                    F.col("lag"),
                    F.col("r"),
                )
            ).alias("win"),
            F.min("n_points").cast("long").alias("min_points"),
        )
        .select(
            "type_a",
            "type_b",
            "r_lag0",
            F.col("win.lag").cast("long").alias("best_lag"),
            F.col("win.r").alias("r_best"),
            "min_points",
        )
        .orderBy("type_a", "type_b")
    )


events_cross_correlation.__doc__ = events_cross_correlation.__doc__.format(
    L="k", M=_XC_MAX_LAG, N=_XC_MAX_LAG + 1
)

EVENTS_CROSS_CORRELATION_SQL = f"""
WITH hourly AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
         CAST(count(*) AS DOUBLE) AS n
  FROM events GROUP BY event_type, hr
),
lags AS (SELECT unnest(range(0, {_XC_MAX_LAG + 1})) AS lag),
m AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, l.lag,
         CAST(count(*) AS DOUBLE) AS np,
         sum(a.n) AS sa, sum(b.n) AS sb, sum(a.n * b.n) AS sab,
         sum(a.n * a.n) AS saa, sum(b.n * b.n) AS sbb
  FROM hourly a
  CROSS JOIN lags l
  JOIN hourly b ON a.hr + l.lag = b.hr
  WHERE a.event_type != b.event_type
  GROUP BY 1, 2, 3
),
scored AS (
  SELECT type_a, type_b, lag, CAST(np AS BIGINT) AS n_points,
         round({_AC_R} + 1e-9, 6) + 0.0 AS r
  FROM m
),
best AS (
  -- NULLS LAST pinned explicitly: NULL r (zero-variance) must LOSE
  -- the argmax in both engines (the Spark side pins via
  -- coalesce(+inf) in its struct-min key)
  SELECT type_a, type_b, lag AS best_lag, r AS r_best
  FROM scored
  QUALIFY row_number() OVER (PARTITION BY type_a, type_b
                             ORDER BY r DESC NULLS LAST, lag ASC) = 1
),
lag0 AS (
  SELECT type_a, type_b, r AS r_lag0 FROM scored WHERE lag = 0
),
minp AS (
  SELECT type_a, type_b, CAST(min(n_points) AS BIGINT) AS min_points
  FROM scored GROUP BY 1, 2
)
-- LEFT joins: a pair with no lag-0 hourly overlap must keep its row
-- (NULL r_lag0) exactly as the Spark max(when(lag=0)) does, instead
-- of being dropped by an inner join (ADVICE r10)
SELECT b.type_a, b.type_b, l.r_lag0,
       CAST(b.best_lag AS BIGINT) AS best_lag, b.r_best, m.min_points
FROM best b
LEFT JOIN lag0 l ON b.type_a = l.type_a AND b.type_b = l.type_b
LEFT JOIN minp m ON b.type_a = m.type_a AND b.type_b = m.type_b
ORDER BY b.type_a, b.type_b
"""


def events_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences — the causal-inference primitive the
    test shelf was missing (z/Welch/MW compare GROUPS, DiD compares
    group TRENDS, differencing out both the group baseline and the
    common time shock): treatment = odd user_id (the deterministic
    assignment stand-in), periods split at the epoch midpoint (the
    BH/backtest convention), outcome = event value. Emits the 2×2
    cell table, the DiD estimate
    (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre), its large-sample
    SE = sqrt(Σ s²_c/n_c) over the four cells, and t = DiD/SE.

    One corpus scan to 4 cells (bounded hash agg with map-side
    combine), then shared closed forms over the 4×(n, Σy, Σy²)
    moments; means/variances are rounded 6dp before the composite so
    both engines difference identical doubles.
    """
    ev = load_table(spark, sf_dir, "events")
    # microsecond epoch on BOTH engines (Spark unix_micros / DuckDB
    # epoch_us): unix_timestamp truncates to whole seconds while
    # epoch() is fractional, so the two midpoints would differ by up
    # to ~0.5 s and any event landing in that sliver would flip cells
    # between engines (the ADVICE r10 flake class). The micros sum
    # (~3.5e15) is exact in a double, so /2.0 is engine-identical.
    mid = ev.agg(
        (
            (
                F.min(F.expr("unix_micros(ts)"))
                + F.max(F.expr("unix_micros(ts)"))
            )
            / 2.0
        ).alias("mid")
    )
    cells = (
        ev.crossJoin(F.broadcast(mid))
        .select(
            (F.col("user_id") % 2 == 1).cast("int").alias("treated"),
            (F.expr("unix_micros(ts)") > F.col("mid")).cast("int").alias("post"),
            "value",
        )
        .groupBy("treated", "post")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("sy"),
            F.sum(F.col("value") * F.col("value")).alias("syy"),
        )
        .select(
            "treated",
            "post",
            "n",
            F.expr("round(sy / n + 1e-9, 6)").alias("mean"),
            F.expr(
                "round((syy - sy * sy / n) / (n - 1) + 1e-9, 6)"
            ).alias("var"),
        )
    )
    wide = cells.agg(
        *[
            F.max(
                F.when(
                    (F.col("treated") == t) & (F.col("post") == p), F.col(c)
                )
            ).alias(f"{c}_{t}{p}")
            for t in (0, 1)
            for p in (0, 1)
            for c in ("n", "mean", "var")
        ]
    )
    return wide.select(
        F.col("n_00").alias("n_ctrl_pre"),
        F.col("n_01").alias("n_ctrl_post"),
        F.col("n_10").alias("n_treat_pre"),
        F.col("n_11").alias("n_treat_post"),
        F.col("mean_00").alias("mean_ctrl_pre"),
        F.col("mean_01").alias("mean_ctrl_post"),
        F.col("mean_10").alias("mean_treat_pre"),
        F.col("mean_11").alias("mean_treat_post"),
        F.expr(
            "round((mean_11 - mean_10) - (mean_01 - mean_00) + 1e-9, 6)"
        ).alias("did"),
        F.expr(
            "round(sqrt(var_00 / n_00 + var_01 / n_01 + var_10 / n_10"
            " + var_11 / n_11) + 1e-9, 6)"
        ).alias("se"),
        F.expr(
            "round(((mean_11 - mean_10) - (mean_01 - mean_00))"
            " / sqrt(var_00 / n_00 + var_01 / n_01 + var_10 / n_10"
            " + var_11 / n_11) + 1e-9, 4)"
        ).alias("t_stat"),
    )


EVENTS_DIFF_IN_DIFF_SQL = """
WITH mid AS (
  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) / 2.0 AS mid FROM events
),
cells AS (
  SELECT treated, post, n,
         round(sy / n + 1e-9, 6) AS mean,
         round((syy - sy * sy / n) / (n - 1) + 1e-9, 6) AS var
  FROM (
    SELECT CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS treated,
           CASE WHEN epoch_us(ts) > mid.mid THEN 1 ELSE 0 END AS post,
           count(*) AS n,
           sum(value) AS sy,
           sum(value * value) AS syy
    FROM events CROSS JOIN mid
    GROUP BY 1, 2
  ) m
),
wide AS (
  SELECT
    max(CASE WHEN treated = 0 AND post = 0 THEN n END) AS n_00,
    max(CASE WHEN treated = 0 AND post = 1 THEN n END) AS n_01,
    max(CASE WHEN treated = 1 AND post = 0 THEN n END) AS n_10,
    max(CASE WHEN treated = 1 AND post = 1 THEN n END) AS n_11,
    max(CASE WHEN treated = 0 AND post = 0 THEN mean END) AS mean_00,
    max(CASE WHEN treated = 0 AND post = 1 THEN mean END) AS mean_01,
    max(CASE WHEN treated = 1 AND post = 0 THEN mean END) AS mean_10,
    max(CASE WHEN treated = 1 AND post = 1 THEN mean END) AS mean_11,
    max(CASE WHEN treated = 0 AND post = 0 THEN var END) AS var_00,
    max(CASE WHEN treated = 0 AND post = 1 THEN var END) AS var_01,
    max(CASE WHEN treated = 1 AND post = 0 THEN var END) AS var_10,
    max(CASE WHEN treated = 1 AND post = 1 THEN var END) AS var_11
  FROM cells
)
SELECT n_00 AS n_ctrl_pre, n_01 AS n_ctrl_post,
       n_10 AS n_treat_pre, n_11 AS n_treat_post,
       mean_00 AS mean_ctrl_pre, mean_01 AS mean_ctrl_post,
       mean_10 AS mean_treat_pre, mean_11 AS mean_treat_post,
       round((mean_11 - mean_10) - (mean_01 - mean_00) + 1e-9, 6) AS did,
       round(sqrt(var_00 / n_00 + var_01 / n_01 + var_10 / n_10
                  + var_11 / n_11) + 1e-9, 6) AS se,
       round(((mean_11 - mean_10) - (mean_01 - mean_00))
             / sqrt(var_00 / n_00 + var_01 / n_01 + var_10 / n_10
                    + var_11 / n_11) + 1e-9, 4) AS t_stat
FROM wide
"""


_SPRT_LIFT = 1.5  # H1: the type's share is 1.5x its day-1 baseline
_SPRT_A = 2.94443898  # ln((1-beta)/alpha) at alpha=beta=0.05, 8dp
_SPRT_TRAIN_H = 24  # baseline window (hours)


def events_sprt_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test per event type — the
    SEQUENTIAL member of the testing shelf (z/Welch/BH decide once on
    the full sample; SPRT walks the stream and stops at the first
    hour the evidence crosses a boundary, the monitoring semantics an
    on-call alert actually needs). H0: the type's share of events
    equals its first-{TH}-hours baseline p0; H1: it is {L}× that.
    The per-hour log-likelihood-ratio increment is
    n_t·ln({L}) + (n_hour − n_t)·ln((1−p1)/(1−p0)), accumulated over
    post-baseline hours; the walk stops at ±ln((1−β)/α) (α=β=0.05).

    Determinism: increments are integer counts × 8dp-rounded lns,
    accumulated by an hour-ORDERED window — both engines add the same
    doubles in the same order, so every boundary comparison is
    bit-identical. Everything after the one corpus scan is the
    bounded (type × hour) relation. The walk visits the hours where
    the type OCCURS (an absent hour contributes no increment) — dense
    on this fixture, where every type fires every hour; a sparse
    deployment would left-join the hour spine first.
    """
    ev = load_table(spark, sf_dir, "events")
    hours = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000").alias("hb"),
    ).agg(F.count("*").alias("n_t"))
    return sprt_from_hourly(hours)


def sprt_from_hourly(hours: DataFrame) -> DataFrame:
    """The SPRT fold over an (event_type, hb, n_t) hourly relation —
    factored so the batch operator and ``stream_sprt_alarm`` (which
    maintains the hourly counts as streaming state) finalize through
    the IDENTICAL code path and share one oracle. ``hb`` is the
    ABSOLUTE hour bucket (unix div 3600); the training window is the
    first {TH} buckets observed, and reported hours are relative to
    the first bucket."""
    h0 = hours.agg(F.min("hb").alias("h0"))
    hrs = hours.crossJoin(F.broadcast(h0)).select(
        "event_type",
        (F.col("hb") - F.col("h0")).alias("hr"),
        "n_t",
    )
    totals = hrs.groupBy("hr").agg(F.sum("n_t").alias("n_hr"))
    base = (
        hrs.filter(F.col("hr") < _SPRT_TRAIN_H)
        .groupBy("event_type")
        .agg(F.sum("n_t").alias("b_t"))
        .crossJoin(
            F.broadcast(
                totals.filter(F.col("hr") < _SPRT_TRAIN_H).agg(
                    F.sum("n_hr").alias("b_n")
                )
            )
        )
        .select(
            "event_type",
            F.expr("round(b_t / CAST(b_n AS DOUBLE), 8)").alias("p0"),
        )
        .select(
            "event_type",
            "p0",
            # BOTH increments derive from the SAME capped
            # p1 = min(lift·p0, 0.99) — if only the non-event term
            # used the cap the walk would mix two different p1 values
            # in the degenerate p0 > 0.66 regime and stop being a
            # valid likelihood ratio (ADVICE r10). The CASE form keeps
            # the non-degenerate value EXACTLY ln(lift) (no p0/p0
            # round-trip), so fixture values are unchanged; both
            # engines evaluate the identical expression.
            F.expr(
                f"round(ln(CASE WHEN {_SPRT_LIFT}D * p0 > 0.99D"
                f" THEN 0.99D / p0 ELSE {_SPRT_LIFT}D END), 8)"
            ).alias("llr_e"),
            F.expr(
                f"round(ln((1.0D - least({_SPRT_LIFT}D * p0, 0.99D))"
                f" / (1.0D - p0)), 8)"
            ).alias("llr_o"),
        )
    )
    walk = (
        hrs.filter(F.col("hr") >= _SPRT_TRAIN_H)
        .join(totals, "hr")
        .join(F.broadcast(base), "event_type")
        .select(
            "event_type",
            "hr",
            "p0",
            (
                F.col("n_t") * F.col("llr_e")
                + (F.col("n_hr") - F.col("n_t")) * F.col("llr_o")
            ).alias("inc"),
        )
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = walk.select(
        "event_type", "hr", "p0", F.sum("inc").over(wcum).alias("cum")
    )
    return (
        cum.groupBy("event_type")
        .agg(
            F.max("p0").alias("p0"),
            F.min(
                F.when(F.col("cum") >= _SPRT_A, F.col("hr"))
            ).alias("h1_hour"),
            F.min(
                F.when(F.col("cum") <= -_SPRT_A, F.col("hr"))
            ).alias("h0_hour"),
            F.expr("round(max_by(cum, hr) + 1e-9, 6) + 0.0").alias(
                "final_llr"
            ),
            F.count("*").cast("long").alias("n_hours"),
        )
        .select(
            "event_type",
            "p0",
            "h1_hour",
            "h0_hour",
            F.when(
                F.col("h1_hour").isNotNull()
                & (
                    F.col("h0_hour").isNull()
                    | (F.col("h1_hour") <= F.col("h0_hour"))
                ),
                F.lit("accept_h1"),
            )
            .when(F.col("h0_hour").isNotNull(), F.lit("accept_h0"))
            .otherwise(F.lit("continue"))
            .alias("decision"),
            "final_llr",
            "n_hours",
        )
        .orderBy("event_type")
    )


events_sprt_monitor.__doc__ = events_sprt_monitor.__doc__.format(
    TH=_SPRT_TRAIN_H, L=_SPRT_LIFT
)

sprt_from_hourly.__doc__ = sprt_from_hourly.__doc__.format(TH=_SPRT_TRAIN_H)

# shared by events_sprt_monitor and stream_sprt_alarm (one fold, one
# oracle — the cusum pair discipline)
EVENTS_SPRT_MONITOR_SQL = f"""
WITH hours AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hb,
         count(*) AS n_t
  FROM events
  GROUP BY 1, 2
),
h0 AS (SELECT min(hb) AS h0 FROM hours),
hrs AS (
  SELECT event_type, hb - h0.h0 AS hr, n_t FROM hours CROSS JOIN h0
),
totals AS (SELECT hr, sum(n_t) AS n_hr FROM hrs GROUP BY hr),
base AS (
  SELECT event_type,
         round(sum(n_t) / (SELECT CAST(sum(n_hr) AS DOUBLE) FROM totals
                           WHERE hr < {_SPRT_TRAIN_H}), 8) AS p0
  FROM hrs WHERE hr < {_SPRT_TRAIN_H} GROUP BY event_type
),
basellr AS (
  SELECT event_type, p0,
         round(ln(CASE WHEN {_SPRT_LIFT} * p0 > 0.99
                       THEN 0.99 / p0 ELSE {_SPRT_LIFT} END), 8) AS llr_e,
         round(ln((1.0 - least({_SPRT_LIFT} * p0, 0.99)) / (1.0 - p0)), 8)
           AS llr_o
  FROM base
),
walk AS (
  SELECT h.event_type, h.hr, b.p0,
         h.n_t * b.llr_e + (t.n_hr - h.n_t) * b.llr_o AS inc
  FROM hrs h
  JOIN totals t ON h.hr = t.hr
  JOIN basellr b ON h.event_type = b.event_type
  WHERE h.hr >= {_SPRT_TRAIN_H}
),
cum AS (
  SELECT event_type, hr, p0,
         sum(inc) OVER (PARTITION BY event_type ORDER BY hr
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM walk
),
agg AS (
  SELECT event_type,
         max(p0) AS p0,
         min(CASE WHEN cum >= {_SPRT_A} THEN hr END) AS h1_hour,
         min(CASE WHEN cum <= -{_SPRT_A} THEN hr END) AS h0_hour,
         round(max_by(cum, hr) + 1e-9, 6) + 0.0 AS final_llr,
         count(*) AS n_hours
  FROM cum GROUP BY event_type
)
SELECT event_type, p0, h1_hour, h0_hour,
       CASE WHEN h1_hour IS NOT NULL
                 AND (h0_hour IS NULL OR h1_hour <= h0_hour)
            THEN 'accept_h1'
            WHEN h0_hour IS NOT NULL THEN 'accept_h0'
            ELSE 'continue' END AS decision,
       final_llr, n_hours
FROM agg
ORDER BY event_type
"""


_STUMP_VALUE_BAND = 20.0  # candidate value thresholds every 20 units


def _entropy_sql(p: str) -> str:
    """Binary Shannon entropy of probability expression ``p`` — the
    shared fragment both engines evaluate verbatim (0 at the
    degenerate endpoints, where the limit is 0 but log2 is not)."""
    return (
        f"CASE WHEN ({p}) <= 0.0 OR ({p}) >= 1.0 THEN 0.0"
        f" ELSE -({p}) * log2({p}) - (1.0 - ({p})) * log2(1.0 - ({p})) END"
    )


def events_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump split search — the inner loop of every tree
    learner (CART/XGBoost histogram mode), run as ONE declarative
    plan: for the binary target is-this-an-error, score every
    candidate split "value ≤ t" (t on the {VB}-unit histogram grid)
    and "hour ≤ h" by information gain, and rank them. The histogram
    trick is the scale story: the corpus reduces to per-(feature,
    bin) counts in one map-combinable aggregate, and EVERY candidate
    threshold's left/right counts are a cumulative window over that
    BOUNDED relation — the exact-greedy sort over raw values that
    single-node learners do never happens (this is precisely
    XGBoost's approx/hist algorithm shape).

    Floats: gains derive from exact integer counts through the shared
    entropy fragment (identical text both engines), rounded 6dp under
    the nudge; ranking ties break on (feature, bin).
    """
    ev = load_table(spark, sf_dir, "events").select(
        (F.col("event_type") == "error").cast("long").alias("y"),
        F.floor(F.col("value") / _STUMP_VALUE_BAND).cast("long").alias("vbin"),
        F.hour("ts").cast("long").alias("hbin"),
    )
    vb = ev.groupBy(F.col("vbin").alias("bin")).agg(
        F.count("*").alias("n"), F.sum("y").alias("npos")
    ).select(F.lit("value").alias("feature"), "bin", "n", "npos")
    hb = ev.groupBy(F.col("hbin").alias("bin")).agg(
        F.count("*").alias("n"), F.sum("y").alias("npos")
    ).select(F.lit("hour").alias("feature"), "bin", "n", "npos")
    bins = vb.unionByName(hb)
    wcum = (
        Window.partitionBy("feature")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy("feature")
    cum = bins.select(
        "feature",
        "bin",
        F.sum("n").over(wcum).alias("nl"),
        F.sum("npos").over(wcum).alias("nposl"),
        F.sum("n").over(wtot).alias("nt"),
        F.sum("npos").over(wtot).alias("npost"),
    ).filter(F.col("nl") < F.col("nt"))
    h_root = _entropy_sql("CAST(npost AS DOUBLE) / nt")
    h_l = _entropy_sql("CAST(nposl AS DOUBLE) / nl")
    h_r = _entropy_sql("CAST(npost - nposl AS DOUBLE) / (nt - nl)")
    gain = (
        f"round(({h_root}) - (CAST(nl AS DOUBLE) / nt) * ({h_l})"
        f" - (CAST(nt - nl AS DOUBLE) / nt) * ({h_r}) + 1e-9, 6)"
    )
    scored = cum.select(
        "feature",
        F.when(
            F.col("feature") == "value",
            (F.col("bin") + 1) * _STUMP_VALUE_BAND,
        )
        .otherwise(F.col("bin").cast("double"))
        .alias("threshold"),
        "bin",
        F.col("nl").alias("n_left"),
        F.col("nposl").alias("n_pos_left"),
        (F.col("nt") - F.col("nl")).alias("n_right"),
        (F.col("npost") - F.col("nposl")).alias("n_pos_right"),
        F.expr(gain).alias("gain"),
    )
    wrank = Window.orderBy(
        F.desc("gain"), F.asc("feature"), F.asc("bin")
    )
    return (
        scored.select(
            F.row_number().over(wrank).alias("rank"),
            "feature",
            "threshold",
            "n_left",
            "n_pos_left",
            "n_right",
            "n_pos_right",
            "gain",
        )
        .orderBy("rank")
    )


events_decision_stump.__doc__ = events_decision_stump.__doc__.format(
    VB=int(_STUMP_VALUE_BAND)
)

_STUMP_H_ROOT = _entropy_sql("CAST(npost AS DOUBLE) / nt")
_STUMP_H_L = _entropy_sql("CAST(nposl AS DOUBLE) / nl")
_STUMP_H_R = _entropy_sql("CAST(npost - nposl AS DOUBLE) / (nt - nl)")

EVENTS_DECISION_STUMP_SQL = f"""
WITH ev AS (
  SELECT CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS y,
         CAST(floor(value / {_STUMP_VALUE_BAND}) AS BIGINT) AS vbin,
         CAST(extract(hour FROM ts) AS BIGINT) AS hbin
  FROM events
),
bins AS (
  SELECT 'value' AS feature, vbin AS bin, count(*) AS n,
         CAST(sum(y) AS BIGINT) AS npos
  FROM ev GROUP BY vbin
  UNION ALL
  SELECT 'hour', hbin, count(*), CAST(sum(y) AS BIGINT)
  FROM ev GROUP BY hbin
),
cum AS (
  SELECT feature, bin,
         sum(n) OVER (PARTITION BY feature ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nl,
         sum(npos) OVER (PARTITION BY feature ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nposl,
         sum(n) OVER (PARTITION BY feature) AS nt,
         sum(npos) OVER (PARTITION BY feature) AS npost
  FROM bins
),
scored AS (
  SELECT feature,
         CASE WHEN feature = 'value'
              THEN (bin + 1) * {_STUMP_VALUE_BAND}
              ELSE CAST(bin AS DOUBLE) END AS threshold,
         bin,
         CAST(nl AS BIGINT) AS n_left,
         CAST(nposl AS BIGINT) AS n_pos_left,
         CAST(nt - nl AS BIGINT) AS n_right,
         CAST(npost - nposl AS BIGINT) AS n_pos_right,
         round(({_STUMP_H_ROOT})
               - (CAST(nl AS DOUBLE) / nt) * ({_STUMP_H_L})
               - (CAST(nt - nl AS DOUBLE) / nt) * ({_STUMP_H_R})
               + 1e-9, 6) AS gain
  FROM cum WHERE nl < nt
)
SELECT row_number() OVER (ORDER BY gain DESC, feature ASC, bin ASC)
         AS rank,
       feature, threshold, n_left, n_pos_left, n_right, n_pos_right, gain
FROM scored
ORDER BY rank
"""


# --------------------------------------------------------------------------
# Overdispersion check (variance-to-mean ratio per event type)
# --------------------------------------------------------------------------

# z approximation for VMR under Poisson: (vmr − 1)·sqrt((n−1)/2)
_VMR_Z = "((vv / mm - 1.0) * sqrt((nn - 1.0) / 2.0))"


def user_overdispersion_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-to-mean ratio of per-user event counts, per type —
    the dispersion test run BEFORE trusting a Poisson model
    (user_poisson_regression): VMR ≈ 1 is Poisson; VMR ≫ 1 means
    overdispersion (negative-binomial territory — bursty users) and
    the GLM's standard errors are lies. The zero cells matter: a user
    who never fired this type IS an observation of 0, so the relation
    crosses users × types (users-bounded, never event-bounded) and
    zero-fills before the moments.

    One fan-out aggregate + closed forms over three moments; the z
    approximation (vmr−1)·√((n−1)/2) is the standard normal test for
    the Poisson dispersion statistic.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("c")
    )
    users = ev.select("user_id").distinct()
    types = ev.select("event_type").distinct()
    grid = (
        users.crossJoin(F.broadcast(types))
        .join(counts, ["user_id", "event_type"], "left")
        .select(
            "event_type",
            F.coalesce(F.col("c"), F.lit(0)).cast("double").alias("y"),
        )
    )
    m = grid.groupBy("event_type").agg(
        F.count("*").cast("double").alias("nn"),
        F.avg("y").alias("mm"),
        F.var_samp("y").alias("vv"),
    )
    return m.select(
        "event_type",
        F.col("nn").cast("long").alias("n_users"),
        F.expr("round(mm + 1e-9, 4) + 0.0").alias("mean_count"),
        F.expr("round(vv / mm + 1e-9, 4) + 0.0").alias("vmr"),
        F.expr(f"round({_VMR_Z} + 1e-9, 4) + 0.0").alias("z_score"),
    ).orderBy("event_type")


USER_OVERDISPERSION_CHECK_SQL = f"""
WITH counts AS (
  SELECT user_id, event_type, count(*) AS c
  FROM events GROUP BY user_id, event_type
),
users AS (SELECT DISTINCT user_id FROM events),
types AS (SELECT DISTINCT event_type FROM events),
grid AS (
  SELECT t.event_type,
         CAST(coalesce(c.c, 0) AS DOUBLE) AS y
  FROM users u CROSS JOIN types t
  LEFT JOIN counts c ON u.user_id = c.user_id AND t.event_type = c.event_type
),
m AS (
  SELECT event_type, CAST(count(*) AS DOUBLE) AS nn,
         avg(y) AS mm, var_samp(y) AS vv
  FROM grid GROUP BY event_type
)
SELECT event_type,
       CAST(nn AS BIGINT) AS n_users,
       round(mm + 1e-9, 4) + 0.0 AS mean_count,
       round(vv / mm + 1e-9, 4) + 0.0 AS vmr,
       round({_VMR_Z} + 1e-9, 4) + 0.0 AS z_score
FROM m ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Customer monetary-tercile migration (half-over-half)
# --------------------------------------------------------------------------


def customer_tercile_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-value migration matrix: spend terciles in the FIRST
    half of the observation window vs the SECOND, including the
    'absent' state (0 = inactive that half) — the cohort-dynamics
    view behind "are our top customers churning or compounding?",
    extending the static RFM grid (customer_rfm_segments) with the
    between-period transition structure (the same matrix a Markov
    LTV model is fit on).

    Midpoint split from the broadcast min/max dates; per-(customer,
    half) spend aggregates; terciles rank WITHIN each half over the
    customers active in it (ntile with custkey tiebreak — the RFM
    determinism discipline; customer-sized sorts, documented
    equidepth posture); the matrix is a full outer join of the two
    half-relations with absent→0.
    """
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min("o_orderdate").alias("d0"), F.max("o_orderdate").alias("d1")
    )
    halves = orders.crossJoin(F.broadcast(bounds)).select(
        "o_custkey",
        "o_totalprice",
        (
            F.unix_timestamp("o_orderdate")
            > (F.unix_timestamp("d0") + F.unix_timestamp("d1")) / 2
        )
        .cast("int")
        .alias("half"),
    )
    spend = halves.groupBy("o_custkey", "half").agg(
        F.round(F.sum("o_totalprice") + 1e-9, 2).alias("spend")
    )
    wt = Window.partitionBy("half").orderBy("spend", "o_custkey")
    terc = spend.withColumn("seg", F.ntile(3).over(wt))
    t1 = terc.filter(F.col("half") == 0).select(
        "o_custkey", F.col("seg").alias("seg_h1")
    )
    t2 = terc.filter(F.col("half") == 1).select(
        "o_custkey", F.col("seg").alias("seg_h2")
    )
    matrix = t1.join(t2, "o_custkey", "full_outer").select(
        F.coalesce(F.col("seg_h1"), F.lit(0)).cast("long").alias("seg_h1"),
        F.coalesce(F.col("seg_h2"), F.lit(0)).cast("long").alias("seg_h2"),
    )
    cells = matrix.groupBy("seg_h1", "seg_h2").agg(
        F.count("*").cast("long").alias("n_customers")
    )
    # share denominator via a window over the ≤16-cell matrix — no
    # driver action, stays one declarative plan
    return (
        cells.withColumn(
            "tot", F.sum("n_customers").over(Window.partitionBy()).cast("double")
        )
        .select(
            "seg_h1",
            "seg_h2",
            "n_customers",
            F.expr("round(n_customers / tot + 1e-9, 6) + 0.0").alias("share"),
        )
        .orderBy("seg_h1", "seg_h2")
    )


CUSTOMER_TERCILE_MIGRATION_SQL = """
WITH bounds AS (
  SELECT min(o_orderdate) AS d0, max(o_orderdate) AS d1 FROM orders
),
halves AS (
  SELECT o_custkey, o_totalprice,
         CASE WHEN epoch(o_orderdate) > (epoch(b.d0) + epoch(b.d1)) / 2.0
              THEN 1 ELSE 0 END AS half
  FROM orders CROSS JOIN bounds b
),
spend AS (
  SELECT o_custkey, half, round(sum(o_totalprice) + 1e-9, 2) AS spend
  FROM halves GROUP BY o_custkey, half
),
terc AS (
  SELECT o_custkey, half,
         ntile(3) OVER (PARTITION BY half ORDER BY spend, o_custkey) AS seg
  FROM spend
),
matrix AS (
  SELECT coalesce(a.seg, 0) AS seg_h1, coalesce(b.seg, 0) AS seg_h2
  FROM (SELECT o_custkey, seg FROM terc WHERE half = 0) a
  FULL OUTER JOIN (SELECT o_custkey, seg FROM terc WHERE half = 1) b
    ON a.o_custkey = b.o_custkey
),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM matrix)
SELECT CAST(seg_h1 AS BIGINT) AS seg_h1,
       CAST(seg_h2 AS BIGINT) AS seg_h2,
       count(*) AS n_customers,
       round(count(*) / max(tot.n) + 1e-9, 6) + 0.0 AS share
FROM matrix CROSS JOIN tot
GROUP BY seg_h1, seg_h2 ORDER BY seg_h1, seg_h2
"""


# --------------------------------------------------------------------------
# Split-conformal prediction interval audit
# --------------------------------------------------------------------------

_CONF_ALPHA = 0.1  # 90% target coverage
_CONF_CELL = 1.0  # residual grid width


def value_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals (Vovk; Lei 2018) for the
    per-type mean-value predictor, audited on a held-out split — the
    distribution-free uncertainty machinery modern ML pipelines wrap
    around ANY point model: fit on split 0, take the ⌈(n+1)(1−α)⌉-th
    smallest absolute residual on calibration split 1 as the interval
    half-width q̂, then MEASURE coverage on test split 2 (guaranteed
    ≥ {COV:.0%} marginally, finite-sample, no distributional
    assumptions — the audit shows it holding).

    Scale: splits are an md5 projection; the model is a broadcast
    per-type mean; the calibration quantile uses the GRID form (the
    value_ks_grid discipline) — residual cells of width {W} reduce
    the calibration set to a bounded relation, the rank walk is a
    window over it, and q̂ is the selected cell's UPPER edge:
    conservative rounding, so the finite-sample guarantee survives
    the discretization (coverage can only increase). Integer counts
    end-to-end until the final ratios.
    """
    u = _hex_uniform("conf|", "uid_str")
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.col("value").alias("y"),
            F.col("event_id").cast("string").alias("uid_str"),
        )
        .withColumn("split", F.floor(u * 3).cast("long"))
    )
    ev = tracked_persist(ev)
    model = (
        ev.filter(F.col("split") == 0)
        .groupBy("event_type")
        .agg(F.round(F.avg("y") + 1e-9, 6).alias("yhat"))
    )
    cal = (
        ev.filter(F.col("split") == 1)
        .join(F.broadcast(model), "event_type")
        .select(
            "event_type",
            F.floor(F.abs(F.col("y") - F.col("yhat")) / _CONF_CELL)
            .cast("long")
            .alias("cell"),
        )
    )
    cells = cal.groupBy("event_type", "cell").agg(F.count("*").alias("c"))
    n_cal = cells.groupBy("event_type").agg(F.sum("c").alias("n1"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("cell")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # rank threshold: ceil((n+1)(1-alpha)); q = upper edge of the
    # first cell whose cumulative count reaches it
    walked = (
        cells.join(n_cal, "event_type")
        .withColumn("cum", F.sum("c").over(wcum))
        .withColumn(
            "need",
            F.ceil((F.col("n1") + 1) * (1.0 - _CONF_ALPHA)).cast("long"),
        )
    )
    qhat = (
        walked.filter(F.col("cum") >= F.col("need"))
        .groupBy("event_type")
        .agg(
            F.max("n1").cast("long").alias("n_cal"),
            ((F.min("cell") + 1) * F.lit(_CONF_CELL)).alias("q_hat"),
        )
    )
    test = ev.filter(F.col("split") == 2).join(
        F.broadcast(model), "event_type"
    ).join(F.broadcast(qhat), "event_type")
    return (
        test.groupBy("event_type")
        .agg(
            F.max("n_cal").alias("n_cal"),
            F.expr("round(max(q_hat) + 1e-9, 2) + 0.0").alias("q_hat"),
            F.count("*").cast("long").alias("n_test"),
            F.expr(
                "round(count_if(abs(y - yhat) <= q_hat) /"
                " CAST(count(*) AS DOUBLE) + 1e-9, 4) + 0.0"
            ).alias("coverage"),
        )
        .orderBy("event_type")
    )


value_conformal_interval.__doc__ = value_conformal_interval.__doc__.format(
    COV=1 - _CONF_ALPHA, W=_CONF_CELL
)

VALUE_CONFORMAL_INTERVAL_SQL = f"""
WITH ev AS MATERIALIZED (
  SELECT event_type, value AS y,
         CAST(floor({_hex_uniform_sql("conf|", "CAST(event_id AS VARCHAR)")}
              * 3) AS BIGINT) AS split
  FROM events
),
model AS (
  SELECT event_type, round(avg(y) + 1e-9, 6) AS yhat
  FROM ev WHERE split = 0 GROUP BY event_type
),
cal AS (
  SELECT e.event_type,
         CAST(floor(abs(e.y - m.yhat) / {_CONF_CELL}) AS BIGINT) AS cell
  FROM ev e JOIN model m ON e.event_type = m.event_type
  WHERE e.split = 1
),
cells AS (
  SELECT event_type, cell, count(*) AS c FROM cal GROUP BY event_type, cell
),
n_cal AS (
  SELECT event_type, CAST(sum(c) AS BIGINT) AS n1 FROM cells GROUP BY event_type
),
walked AS (
  SELECT cells.event_type, cells.cell, n_cal.n1,
         sum(cells.c) OVER (PARTITION BY cells.event_type ORDER BY cells.cell
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         CAST(ceil((n_cal.n1 + 1) * {1.0 - _CONF_ALPHA}) AS BIGINT) AS need
  FROM cells JOIN n_cal ON cells.event_type = n_cal.event_type
),
qhat AS (
  SELECT event_type, max(n1) AS n_cal,
         (min(cell) + 1) * {_CONF_CELL} AS q_hat
  FROM walked WHERE cum >= need GROUP BY event_type
)
SELECT e.event_type,
       CAST(max(q.n_cal) AS BIGINT) AS n_cal,
       round(max(q.q_hat) + 1e-9, 2) + 0.0 AS q_hat,
       count(*) AS n_test,
       round(count(CASE WHEN abs(e.y - m.yhat) <= q.q_hat THEN 1 END)
             / CAST(count(*) AS DOUBLE) + 1e-9, 4) + 0.0 AS coverage
FROM ev e
JOIN model m ON e.event_type = m.event_type
JOIN qhat q ON e.event_type = q.event_type
WHERE e.split = 2
GROUP BY e.event_type ORDER BY e.event_type
"""


# --------------------------------------------------------------------------
# Weighted median (quantity-weighted price per return flag)
# --------------------------------------------------------------------------


def lineitem_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median of the extended price per return flag
    — the weighted-quantile machinery the unweighted percentile
    family (value_quantiles, hourly_median_iqr) doesn't cover: when
    each row carries a weight (units, bytes, tokens), the median of
    ROW VALUES misrepresents the median UNIT. Lower weighted median
    (type-1): the smallest x whose cumulative weight reaches half the
    group total.

    Shape: per-group sort + cumulative-weight window + one
    conditional min — the same per-key ordered-walk posture as the
    exact NTILE row (value_equidepth_histogram): kept exact here
    (groups are few, per-group sorts parallel across flags); at
    extreme per-group cardinality the documented substitution is the
    banded cumulative walk (value_mannwhitney_grid's grid trick).
    Ties on x are resolved by the (x, orderkey, linenumber) sort key
    — but the SELECTED x is tie-invariant (any tied row yields the
    same median value).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").alias("x"),
        F.col("l_quantity").alias("wt"),
        "l_orderkey",
        "l_linenumber",
    )
    tot = li.groupBy("l_returnflag").agg(F.sum("wt").alias("tw"))
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("x", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    walked = li.join(tot, "l_returnflag").withColumn(
        "cw", F.sum("wt").over(w)
    )
    return (
        walked.groupBy("l_returnflag")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.expr("round(max(tw) + 1e-9, 2) + 0.0").alias("total_weight"),
            F.expr(
                "round(min(CASE WHEN cw >= tw / 2.0 THEN x END) + 1e-9, 2)"
                " + 0.0"
            ).alias("weighted_median"),
        )
        .orderBy("l_returnflag")
    )


LINEITEM_WEIGHTED_MEDIAN_SQL = """
WITH li AS (
  SELECT l_returnflag, l_extendedprice AS x, l_quantity AS wt,
         l_orderkey, l_linenumber
  FROM lineitem
),
tot AS (SELECT l_returnflag, sum(wt) AS tw FROM li GROUP BY l_returnflag),
walked AS (
  SELECT li.l_returnflag, li.x, tot.tw,
         sum(li.wt) OVER (PARTITION BY li.l_returnflag
                          ORDER BY li.x, li.l_orderkey, li.l_linenumber
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cw
  FROM li JOIN tot ON li.l_returnflag = tot.l_returnflag
)
SELECT l_returnflag,
       count(*) AS n_rows,
       round(max(tw) + 1e-9, 2) + 0.0 AS total_weight,
       round(min(CASE WHEN cw >= tw / 2.0 THEN x END) + 1e-9, 2) + 0.0
         AS weighted_median
FROM walked GROUP BY l_returnflag ORDER BY l_returnflag
"""


# --------------------------------------------------------------------------
# Two-proportion z-test (A/B conversion primitive)
# --------------------------------------------------------------------------

_ZTEST_Z = (
    "((p1 - p2) / sqrt(pp * (1.0 - pp) * (1.0 / n1 + 1.0 / n2)))"
)


def events_two_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled two-proportion z-test of user-level view→purchase
    conversion between two deterministic user arms (user_id parity —
    the stand-in for an experiment assignment column): THE A/B-testing
    primitive, complementing the continuous-outcome tests (Welch,
    Mann–Whitney) with the binary-outcome one. Emits both arms'
    user counts, conversion rates, and z.

    THE UNIT OF ANALYSIS IS THE USER, NOT THE EVENT (ADVICE r6):
    events sharing a user are correlated, so an event-level Bernoulli
    treats n as far larger than the number of independent trials and
    understates the z variance. Each user with ≥1 view-or-purchase
    event is one trial; success = that user is PURCHASE-DOMINANT
    (strictly more purchases than views) — the randomization unit and
    the analysis unit now agree. ("Any purchase" is degenerate on
    this fixture: every user has ~26 view/purchase events, so
    P(no purchase) ≈ 2⁻¹³ and the pooled variance collapses to 0.)

    One scan → per-user (arm, converted) flags (user-keyed hash agg,
    map-side combinable) → per-arm (n, conversions) counts (2-row
    result); rates and the pooled z are shared closed forms over four
    integers — exact-integer-derived, so the only rounding is the
    final display round.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    users = ev.groupBy("user_id").agg(
        (
            F.count_if(F.col("event_type") == "purchase")
            > F.count_if(F.col("event_type") == "view")
        ).cast("int").alias("converted")
    )
    arms = users.groupBy((F.col("user_id") % 2).alias("arm")).agg(
        F.count("*").alias("n"),
        F.sum("converted").alias("conv"),
    )
    a = arms.filter(F.col("arm") == 0).select(
        F.col("n").alias("na"), F.col("conv").alias("ca")
    )
    b = arms.filter(F.col("arm") == 1).select(
        F.col("n").alias("nb"), F.col("conv").alias("cb")
    )
    m = a.crossJoin(F.broadcast(b)).select(
        F.col("na").cast("double").alias("n1"),
        F.col("nb").cast("double").alias("n2"),
        F.col("ca").cast("double").alias("c1"),
        F.col("cb").cast("double").alias("c2"),
    ).withColumn("p1", F.expr("c1 / n1")).withColumn(
        "p2", F.expr("c2 / n2")
    ).withColumn("pp", F.expr("(c1 + c2) / (n1 + n2)"))
    return m.select(
        F.col("n1").cast("long").alias("n_arm_a"),
        F.col("n2").cast("long").alias("n_arm_b"),
        F.expr("round(p1 + 1e-9, 6) + 0.0").alias("rate_a"),
        F.expr("round(p2 + 1e-9, 6) + 0.0").alias("rate_b"),
        F.expr(f"round({_ZTEST_Z} + 1e-9, 4) + 0.0").alias("z_score"),
    )


EVENTS_TWO_PROPORTION_ZTEST_SQL = f"""
WITH users AS (
  SELECT user_id,
         CASE WHEN count(CASE WHEN event_type = 'purchase' THEN 1 END)
                 > count(CASE WHEN event_type = 'view' THEN 1 END)
              THEN 1 ELSE 0 END AS converted
  FROM events
  WHERE event_type IN ('view', 'purchase')
  GROUP BY user_id
),
arms AS (
  SELECT user_id % 2 AS arm,
         count(*) AS n,
         sum(converted) AS conv
  FROM users
  GROUP BY arm
),
m AS (
  SELECT CAST(a.n AS DOUBLE) AS n1,
         CAST(b.n AS DOUBLE) AS n2,
         CAST(a.conv AS DOUBLE) AS c1,
         CAST(b.conv AS DOUBLE) AS c2
  FROM (SELECT * FROM arms WHERE arm = 0) a
  CROSS JOIN (SELECT * FROM arms WHERE arm = 1) b
),
r AS (
  SELECT n1, n2, c1 / n1 AS p1, c2 / n2 AS p2,
         (c1 + c2) / (n1 + n2) AS pp
  FROM m
)
SELECT CAST(n1 AS BIGINT) AS n_arm_a,
       CAST(n2 AS BIGINT) AS n_arm_b,
       round(p1 + 1e-9, 6) + 0.0 AS rate_a,
       round(p2 + 1e-9, 6) + 0.0 AS rate_b,
       round({_ZTEST_Z} + 1e-9, 4) + 0.0 AS z_score
FROM r
"""


# --------------------------------------------------------------------------
# ABC revenue classification (Pareto / 80-15-5 inventory analysis)
# --------------------------------------------------------------------------

_ABC_A = 0.80
_ABC_B = 0.95  # cumulative boundary: A ≤ 0.80 < B ≤ 0.95 < C


def parts_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification of parts by revenue: rank parts by
    revenue, walk the cumulative share, and split at {A:.0%}/{B:.0%}
    — the inventory-analytics classic ("A-parts get daily attention,
    C-parts get annual"), and the DISCRETE companion to
    customer_value_gini's concentration scalar. A part is classed by
    the cumulative share INCLUDING itself, so the A class is the
    minimal prefix covering {A:.0%} of revenue (boundary part
    included — the textbook convention).

    One fact shuffle (part revenue agg); ranking and the cumulative
    walk run over the part-sized relation. Deterministic order:
    revenue rounded 2dp first, ties → part key.
    """
    rev = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.expr(
                "round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 2)"
            ).alias("rev")
        )
    )
    tot = rev.agg(F.sum("rev").alias("tr"))
    w = Window.orderBy(F.desc("rev"), "l_partkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    walked = rev.crossJoin(F.broadcast(tot)).withColumn(
        "cum_share", F.sum("rev").over(w) / F.col("tr")
    )
    classed = walked.withColumn(
        "abc",
        F.when(F.col("cum_share") <= _ABC_A + 1e-12, F.lit("A"))
        .when(F.col("cum_share") <= _ABC_B + 1e-12, F.lit("B"))
        .otherwise(F.lit("C")),
    )
    return (
        classed.groupBy("abc")
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            F.expr("round(sum(rev) + 1e-9, 2) + 0.0").alias("class_revenue"),
            F.expr("round(sum(rev) / max(tr) + 1e-9, 6) + 0.0").alias(
                "revenue_share"
            ),
        )
        .orderBy("abc")
    )


parts_abc_classification.__doc__ = parts_abc_classification.__doc__.format(
    A=_ABC_A, B=_ABC_B
)

PARTS_ABC_CLASSIFICATION_SQL = f"""
WITH rev AS (
  SELECT l_partkey,
         round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 2) AS rev
  FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT sum(rev) AS tr FROM rev),
walked AS (
  SELECT rev.l_partkey, rev.rev, tot.tr,
         sum(rev.rev) OVER (ORDER BY rev.rev DESC, rev.l_partkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           / tot.tr AS cum_share
  FROM rev CROSS JOIN tot
),
classed AS (
  SELECT *,
         CASE WHEN cum_share <= {_ABC_A} + 1e-12 THEN 'A'
              WHEN cum_share <= {_ABC_B} + 1e-12 THEN 'B'
              ELSE 'C' END AS abc
  FROM walked
)
SELECT abc,
       count(*) AS n_parts,
       round(sum(rev) + 1e-9, 2) + 0.0 AS class_revenue,
       round(sum(rev) / max(tr) + 1e-9, 6) + 0.0 AS revenue_share
FROM classed GROUP BY abc ORDER BY abc
"""


# --------------------------------------------------------------------------
# Lorenz curve points (decile coordinates of value concentration)
# --------------------------------------------------------------------------


def customer_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of customer value in decile coordinates: for each
    population decile (poorest→richest), the cumulative share of
    total revenue it holds — the PLOTTABLE companion to
    customer_value_gini's scalar (the curve shows WHERE the
    concentration lives: a curve hugging the diagonal until the last
    decile is a whale problem, a uniformly bowed one is broad
    inequality).

    ntile(10) with the custkey tiebreak over the customer-sized
    aggregate (the RFM/equidepth documented posture), then one
    10-row cumulative walk. cum_share is exact-integer-derived after
    the 2dp revenue rounding; the diagonal gap column makes the Gini
    reconstruction (2·Σgap/10) visible.
    """
    per = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice") + 1e-9, 2).alias("x"))
    )
    wd = Window.orderBy("x", "o_custkey")
    deciled = per.withColumn("decile", F.ntile(10).over(wd))
    agg = deciled.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("x").alias("rev"),
    )
    tot = agg.agg(F.sum("rev").alias("tr"))
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        agg.crossJoin(F.broadcast(tot))
        .withColumn("cum", F.sum("rev").over(wcum))
        .select(
            F.col("decile").cast("long").alias("decile"),
            "n_customers",
            F.expr("round(cum / tr + 1e-9, 6) + 0.0").alias("cum_share"),
            F.expr(
                "round(decile / 10.0 - cum / tr + 1e-9, 6) + 0.0"
            ).alias("diagonal_gap"),
        )
        .orderBy("decile")
    )


CUSTOMER_LORENZ_CURVE_SQL = """
WITH per AS (
  SELECT o_custkey, round(sum(o_totalprice) + 1e-9, 2) AS x
  FROM orders GROUP BY o_custkey
),
deciled AS (
  SELECT x, ntile(10) OVER (ORDER BY x, o_custkey) AS decile FROM per
),
agg AS (
  SELECT decile, count(*) AS n_customers, sum(x) AS rev
  FROM deciled GROUP BY decile
),
tot AS (SELECT sum(rev) AS tr FROM agg),
walked AS (
  SELECT agg.decile, agg.n_customers, tot.tr,
         sum(agg.rev) OVER (ORDER BY agg.decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM agg CROSS JOIN tot
)
SELECT CAST(decile AS BIGINT) AS decile,
       n_customers,
       round(cum / tr + 1e-9, 6) + 0.0 AS cum_share,
       round(decile / 10.0 - cum / tr + 1e-9, 6) + 0.0 AS diagonal_gap
FROM walked ORDER BY decile
"""


# --------------------------------------------------------------------------
# Hill estimator: tail index of the value distribution
# --------------------------------------------------------------------------

_HILL_K = 100


def value_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the value distribution's tail index from the
    top {K} order statistics: γ̂ = (1/k)·Σ ln(x₍ᵢ₎/x₍ₖ₊₁₎), tail
    exponent α = 1/γ̂ — the heavy-tail screen behind "is a mean even
    finite here?" (α ≤ 1: no mean; α ≤ 2: no variance — the regimes
    where value_mad_outliers' robust stats are mandatory, not
    optional). On this fixture's bounded-uniform value the estimator
    reads a large α (thin tail) — the point is the machinery.

    Scale shape: top-(k+1) is a TakeOrdered (per-partition heaps, k+1
    rows to the driver-side limit — never a global sort), then one
    scalar aggregate. Boundary ties are a non-issue by construction:
    tied rows at the threshold contribute ln(x/x)=0, so which tied
    row is "the (k+1)-th" cannot change the sum.
    """
    top = (
        load_table(spark, sf_dir, "events")
        .select(F.col("value").cast("double").alias("x"))
        .filter(F.col("x") > 0)
        .orderBy(F.desc("x"))
        .limit(_HILL_K + 1)
    )
    m = top.agg(
        F.min("x").alias("thr"),
        F.count("*").cast("long").alias("k1"),
        F.sum(F.log(F.col("x"))).alias("slog"),
    )
    return m.select(
        (F.col("k1") - 1).alias("k"),
        F.expr("round(thr + 1e-9, 4) + 0.0").alias("threshold"),
        F.expr(
            "round((slog - k1 * ln(thr)) / (k1 - 1.0) + 1e-9, 6) + 0.0"
        ).alias("hill_gamma"),
        F.expr(
            "round((k1 - 1.0) / (slog - k1 * ln(thr)) + 1e-9, 4) + 0.0"
        ).alias("tail_alpha"),
    )


value_hill_tail_index.__doc__ = value_hill_tail_index.__doc__.format(K=_HILL_K)

VALUE_HILL_TAIL_INDEX_SQL = f"""
WITH top_vals AS (
  SELECT CAST(value AS DOUBLE) AS x FROM events
  WHERE value > 0
  ORDER BY x DESC LIMIT {_HILL_K + 1}
),
m AS (
  SELECT min(x) AS thr, CAST(count(*) AS BIGINT) AS k1,
         sum(ln(x)) AS slog
  FROM top_vals
)
SELECT k1 - 1 AS k,
       round(thr + 1e-9, 4) + 0.0 AS threshold,
       round((slog - k1 * ln(thr)) / (k1 - 1.0) + 1e-9, 6) + 0.0
         AS hill_gamma,
       round((k1 - 1.0) / (slog - k1 * ln(thr)) + 1e-9, 4) + 0.0
         AS tail_alpha
FROM m
"""


# --------------------------------------------------------------------------
# Gini coefficient of customer value concentration
# --------------------------------------------------------------------------


def orders_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank (Mantel–Cox) two-sample survival test — the
    significance companion to `orders_survival_km`'s curve: do
    odd-keyed and even-keyed customers have the SAME
    time-to-repeat-purchase distribution? Censoring makes every naive
    comparison wrong (a t-test on observed gaps drops the churned);
    the log-rank compares OBSERVED vs EXPECTED events inside each
    event-time's risk set: E_1t = d_t·n_1t/n_t, hypergeometric
    variance V_t, χ² = (Σ(d_1t − E_1t))²/ΣV_t.

    The risk-set mechanics need a DENSE (time × arm) spine — an arm
    with no event at t still sits in t's risk set — built as the
    distinct-time relation crossJoined with the 2-row arm table
    (BroadcastNestedLoop over 2 rows), then per-arm cumulative
    windows. Everything after the per-customer span window is
    calendar-bounded; per-t terms are exact-integer-derived, rounded
    8dp before their sums.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    )
    horizon = orders.agg(F.max("o_orderdate").alias("h"))
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    firsts = (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .groupBy("o_custkey")
        .agg(
            F.min(F.when(F.col("rk") == 1, F.col("o_orderdate"))).alias("d1"),
            F.min(F.when(F.col("rk") == 2, F.col("o_orderdate"))).alias("d2"),
        )
    )
    spans = firsts.crossJoin(F.broadcast(horizon)).select(
        (F.col("o_custkey") % 2).cast("int").alias("arm"),
        F.when(F.col("d2").isNotNull(), F.datediff("d2", "d1"))
        .otherwise(F.datediff("h", "d1"))
        .cast("long")
        .alias("t"),
        F.col("d2").isNotNull().cast("long").alias("is_event"),
    )
    days = spans.groupBy("t", "arm").agg(
        F.sum("is_event").alias("d"),
        F.sum(1 - F.col("is_event")).alias("c"),
    )
    days = tracked_persist(days)
    spine = (
        days.select("t")
        .distinct()
        .crossJoin(
            F.broadcast(
                days.select("arm").distinct()
            )
        )
    )
    dense = spine.join(days, ["t", "arm"], "left").select(
        "t",
        "arm",
        F.coalesce(F.col("d"), F.lit(0)).alias("d"),
        F.coalesce(F.col("c"), F.lit(0)).alias("c"),
    )
    n_arm = dense.groupBy("arm").agg(
        F.sum(F.col("d") + F.col("c")).cast("long").alias("n_a")
    )
    wcum = (
        Window.partitionBy("arm")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    at_risk = (
        dense.join(F.broadcast(n_arm), "arm")
        .select(
            "t",
            "arm",
            "d",
            (
                F.col("n_a")
                - F.coalesce(
                    F.sum(F.col("d") + F.col("c")).over(wcum), F.lit(0)
                )
            ).alias("n_at"),
        )
    )
    per_t = at_risk.groupBy("t").agg(
        F.sum(F.when(F.col("arm") == 1, F.col("d"))).alias("d1"),
        F.sum(F.when(F.col("arm") == 1, F.col("n_at"))).alias("n1"),
        F.sum("d").alias("dt"),
        F.sum("n_at").alias("nt"),
    )
    terms = per_t.filter((F.col("dt") >= 1) & (F.col("nt") > 1)).select(
        F.expr(
            "round(d1 - dt * (CAST(n1 AS DOUBLE) / nt), 8)"
        ).alias("ome"),
        F.expr(
            "round(dt * (CAST(n1 AS DOUBLE) / nt)"
            " * (1.0D - CAST(n1 AS DOUBLE) / nt)"
            " * (nt - dt) / (nt - 1.0D), 8)"
        ).alias("v"),
    )
    arms = n_arm.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n_a"))).alias("n_arm0"),
        F.max(F.when(F.col("arm") == 1, F.col("n_a"))).alias("n_arm1"),
    )
    return (
        terms.agg(
            F.count("*").cast("long").alias("n_event_times"),
            F.expr("round(sum(ome) + 1e-9, 4) + 0.0").alias("o_minus_e"),
            F.expr("round(sum(v) + 1e-9, 4) + 0.0").alias("variance"),
            F.expr(
                "round(sum(ome) * sum(ome) / sum(v) + 1e-9, 4) + 0.0"
            ).alias("chi2"),
        )
        .crossJoin(F.broadcast(arms))
        .select(
            "n_arm0",
            "n_arm1",
            "n_event_times",
            "o_minus_e",
            "variance",
            "chi2",
        )
    )


ORDERS_LOGRANK_TEST_SQL = """
WITH o AS (
  SELECT o_custkey, o_orderdate, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rk
  FROM orders
),
horizon AS (SELECT max(o_orderdate) AS h FROM orders),
firsts AS (
  SELECT o_custkey,
         min(CASE WHEN rk = 1 THEN o_orderdate END) AS d1,
         min(CASE WHEN rk = 2 THEN o_orderdate END) AS d2
  FROM o WHERE rk <= 2 GROUP BY o_custkey
),
spans AS (
  SELECT CAST(o_custkey % 2 AS INT) AS arm,
         CAST(CASE WHEN d2 IS NOT NULL
                   THEN date_diff('day', CAST(d1 AS DATE), CAST(d2 AS DATE))
                   ELSE date_diff('day', CAST(d1 AS DATE), CAST(h AS DATE))
              END AS BIGINT) AS t,
         CASE WHEN d2 IS NOT NULL THEN 1 ELSE 0 END AS is_event
  FROM firsts CROSS JOIN horizon
),
days AS (
  SELECT t, arm, CAST(sum(is_event) AS BIGINT) AS d,
         CAST(sum(1 - is_event) AS BIGINT) AS c
  FROM spans GROUP BY t, arm
),
spine AS (
  SELECT ts.t, a.arm
  FROM (SELECT DISTINCT t FROM days) ts
  CROSS JOIN (SELECT DISTINCT arm FROM days) a
),
dense AS (
  SELECT s.t, s.arm, coalesce(d.d, 0) AS d, coalesce(d.c, 0) AS c
  FROM spine s LEFT JOIN days d ON s.t = d.t AND s.arm = d.arm
),
n_arm AS (
  SELECT arm, CAST(sum(d + c) AS BIGINT) AS n_a FROM dense GROUP BY arm
),
at_risk AS (
  SELECT dn.t, dn.arm, dn.d,
         na.n_a - coalesce(sum(dn.d + dn.c) OVER (PARTITION BY dn.arm
           ORDER BY dn.t ROWS BETWEEN UNBOUNDED PRECEDING
           AND 1 PRECEDING), 0) AS n_at
  FROM dense dn JOIN n_arm na ON dn.arm = na.arm
),
per_t AS (
  SELECT t,
         sum(CASE WHEN arm = 1 THEN d END) AS d1,
         sum(CASE WHEN arm = 1 THEN n_at END) AS n1,
         sum(d) AS dt,
         sum(n_at) AS nt
  FROM at_risk GROUP BY t
),
terms AS (
  SELECT round(d1 - dt * (CAST(n1 AS DOUBLE) / nt), 8) AS ome,
         round(dt * (CAST(n1 AS DOUBLE) / nt)
               * (1.0 - CAST(n1 AS DOUBLE) / nt)
               * (nt - dt) / (nt - 1.0), 8) AS v
  FROM per_t WHERE dt >= 1 AND nt > 1
),
arms AS (
  SELECT max(CASE WHEN arm = 0 THEN n_a END) AS n_arm0,
         max(CASE WHEN arm = 1 THEN n_a END) AS n_arm1
  FROM n_arm
)
SELECT arms.n_arm0, arms.n_arm1,
       CAST(count(*) AS BIGINT) AS n_event_times,
       round(sum(ome) + 1e-9, 4) + 0.0 AS o_minus_e,
       round(sum(v) + 1e-9, 4) + 0.0 AS variance,
       round(sum(ome) * sum(ome) / sum(v) + 1e-9, 4) + 0.0 AS chi2
FROM terms CROSS JOIN arms
GROUP BY arms.n_arm0, arms.n_arm1
"""


def customer_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T inequality with the between/within decomposition Gini
    cannot do (Theil is the additively decomposable index): customer
    order value grouped by nation, T_total = T_between +
    Σ_g w_g·T_within,g with w_g = (N_g/N)·(μ_g/μ) — the table that
    answers "is revenue concentration a cross-market story or an
    inside-market story?".

    Exact-ratio float discipline: per-customer values collapse to
    integer CENTS (2dp money is exact in cents), so every μ is a
    ratio of exact integers and every ln argument x/μ =
    x_cents·N/S_cents is an integer-derived double both engines
    compute bit-identically; ln terms are rounded 8dp BEFORE their
    map-combinable sums (the unigram-LM discipline), finals 6dp.

    Shape: one order-fact shuffle to per-customer cents; nation
    mapping is a broadcast dim; group stats are a bounded aggregate;
    the term pass re-joins the customer relation to its bounded group
    stats — no sort anywhere (contrast `customer_value_gini`'s exact
    rank, which needs one).
    """
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    per = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.round(F.sum("o_totalprice") * 100).cast("long").alias("x_c")
        )
        .filter(F.col("x_c") > 0)
        .join(cust, "o_custkey")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("o_custkey", F.col("n_name").alias("nation"), "x_c")
    )
    per = tracked_persist(per)
    grp = per.groupBy("nation").agg(
        F.count("*").cast("long").alias("n_g"),
        F.sum("x_c").alias("s_g"),
    )
    tot = grp.agg(
        F.sum("n_g").cast("long").alias("n"),
        F.sum("s_g").cast("long").alias("s"),
    )
    within = (
        per.join(F.broadcast(grp), "nation")
        .select(
            "nation",
            F.expr(
                "round((CAST(x_c AS DOUBLE) * n_g / s_g)"
                " * ln(CAST(x_c AS DOUBLE) * n_g / s_g), 8)"
            ).alias("term_g"),
        )
        .groupBy("nation")
        .agg(
            F.expr("round(avg(term_g) + 1e-9, 6) + 0.0").alias("t_within")
        )
    )
    total_terms = (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.expr(
                "round((CAST(x_c AS DOUBLE) * n / s)"
                " * ln(CAST(x_c AS DOUBLE) * n / s), 8)"
            ).alias("term")
        )
        .agg(F.expr("round(avg(term) + 1e-9, 6) + 0.0").alias("t_total"))
    )
    between = (
        grp.crossJoin(F.broadcast(tot))
        .select(
            F.expr(
                "round((CAST(s_g AS DOUBLE) / s)"
                " * ln((CAST(s_g AS DOUBLE) / s) / (CAST(n_g AS DOUBLE) / n)),"
                " 8)"
            ).alias("bterm")
        )
        .agg(F.expr("round(sum(bterm) + 1e-9, 6) + 0.0").alias("t_between"))
    )
    return (
        grp.crossJoin(F.broadcast(tot))
        .join(within, "nation")
        .crossJoin(F.broadcast(between))
        .crossJoin(F.broadcast(total_terms))
        .select(
            "nation",
            F.col("n_g").alias("n_customers"),
            F.expr("round(s_g / (n_g * 100.0) + 1e-9, 2) + 0.0").alias(
                "mean_value"
            ),
            "t_within",
            F.expr(
                "round((CAST(n_g AS DOUBLE) / n) * (CAST(s_g AS DOUBLE) / s)"
                " / (CAST(n_g AS DOUBLE) / n) + 1e-9, 6) + 0.0"
            ).alias("weight"),
            F.expr(
                "round((CAST(s_g AS DOUBLE) / s) * t_within + 1e-9, 6)"
                " + 0.0"
            ).alias("contribution"),
            "t_between",
            "t_total",
        )
        .orderBy("nation")
    )


CUSTOMER_THEIL_DECOMPOSITION_SQL = """
WITH per AS (
  SELECT o.o_custkey, n.n_name AS nation,
         CAST(round(sum(o.o_totalprice) * 100) AS BIGINT) AS x_c
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY o.o_custkey, n.n_name
  HAVING CAST(round(sum(o.o_totalprice) * 100) AS BIGINT) > 0
),
grp AS (
  SELECT nation, CAST(count(*) AS BIGINT) AS n_g,
         CAST(sum(x_c) AS BIGINT) AS s_g
  FROM per GROUP BY nation
),
tot AS (
  SELECT CAST(sum(n_g) AS BIGINT) AS n, CAST(sum(s_g) AS BIGINT) AS s
  FROM grp
),
within AS (
  SELECT p.nation,
         round(avg(round((CAST(p.x_c AS DOUBLE) * g.n_g / g.s_g)
               * ln(CAST(p.x_c AS DOUBLE) * g.n_g / g.s_g), 8))
               + 1e-9, 6) + 0.0 AS t_within
  FROM per p JOIN grp g ON p.nation = g.nation
  GROUP BY p.nation
),
total_terms AS (
  SELECT round(avg(round((CAST(p.x_c AS DOUBLE) * t.n / t.s)
               * ln(CAST(p.x_c AS DOUBLE) * t.n / t.s), 8))
               + 1e-9, 6) + 0.0 AS t_total
  FROM per p CROSS JOIN tot t
),
between_t AS (
  SELECT round(sum(round((CAST(g.s_g AS DOUBLE) / t.s)
               * ln((CAST(g.s_g AS DOUBLE) / t.s)
                    / (CAST(g.n_g AS DOUBLE) / t.n)), 8)) + 1e-9, 6)
           + 0.0 AS t_between
  FROM grp g CROSS JOIN tot t
)
SELECT g.nation,
       g.n_g AS n_customers,
       round(g.s_g / (g.n_g * 100.0) + 1e-9, 2) + 0.0 AS mean_value,
       w.t_within,
       round((CAST(g.n_g AS DOUBLE) / t.n) * (CAST(g.s_g AS DOUBLE) / t.s)
             / (CAST(g.n_g AS DOUBLE) / t.n) + 1e-9, 6) + 0.0 AS weight,
       round((CAST(g.s_g AS DOUBLE) / t.s) * w.t_within + 1e-9, 6) + 0.0
         AS contribution,
       b.t_between,
       tt.t_total
FROM grp g
CROSS JOIN tot t
JOIN within w ON g.nation = w.nation
CROSS JOIN between_t b
CROSS JOIN total_terms tt
ORDER BY g.nation
"""


def customer_value_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer total order value — the
    concentration scalar behind "do 20% of customers carry 80% of
    revenue?", the continuous companion to key_skew_profile's top-K
    shares and pareto_frontier_customers' skyline. G = 2·Σ(i·xᵢ)/
    (n·Σx) − (n+1)/n over ascending-sorted per-customer totals.

    The rank window runs over the CUSTOMER-sized aggregate, never the
    order fact table; rank ties among equal values cannot change
    Σ i·xᵢ (exchanging ranks between equal x's is invariant), so the
    statistic is deterministic without a tie-break column.

    Scale posture: the global rank is an exact total sort of the
    customer relation — the value_equidepth_histogram posture: kept
    exact as the conformance row, with the documented 100 TB path
    being the banded-midrank form (quantize value to fixed cells, the
    value_mannwhitney_grid trick — Σi·xᵢ over cell midranks off a
    bounded cumulative window; error bounded by within-cell spread).
    """
    per = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("x"))
    )
    wr = Window.orderBy("x", "o_custkey")
    ranked = per.withColumn("i", F.row_number().over(wr))
    m = ranked.agg(
        F.count("*").cast("double").alias("nn"),
        F.sum("x").alias("sx"),
        F.sum(F.col("i") * F.col("x")).alias("six"),
    )
    return m.select(
        F.col("nn").cast("long").alias("n_customers"),
        F.expr("round(sx + 1e-9, 2) + 0.0").alias("total_value"),
        F.expr(
            "round(2.0 * six / (nn * sx) - (nn + 1.0) / nn + 1e-9, 6) + 0.0"
        ).alias("gini"),
    )


CUSTOMER_VALUE_GINI_SQL = """
WITH per AS (
  SELECT o_custkey, sum(o_totalprice) AS x FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT x, row_number() OVER (ORDER BY x, o_custkey) AS i FROM per
),
m AS (
  SELECT CAST(count(*) AS DOUBLE) AS nn, sum(x) AS sx, sum(i * x) AS six
  FROM ranked
)
SELECT CAST(nn AS BIGINT) AS n_customers,
       round(sx + 1e-9, 2) + 0.0 AS total_value,
       round(2.0 * six / (nn * sx) - (nn + 1.0) / nn + 1e-9, 6) + 0.0 AS gini
FROM m
"""


def value_pot_gpd_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peaks-over-threshold GPD tail fit per event type (Pickands
    1975; Hosking & Wallis 1987 PWM estimators) — the extreme-value
    companion to `value_hill_tail_index`: Hill reads the tail index
    from the top-k order statistics of the GLOBAL distribution; POT
    models everything past a high threshold as Generalized Pareto and
    yields the operational numbers (shape ξ, scale σ, and a
    within-tail quantile — the VaR-style "what does a 1-in-1000
    exceedance look like" a capacity/risk dashboard quotes).

    Estimators: threshold u = per-type exact p95 (rounded 6dp BEFORE
    the strict exceedance filter so the exceedance SET is
    cross-engine identical); over y = value−u, probability-weighted
    moments a₀ = ȳ and a₁ = avg(y·(1−pᵢ)) with Landwehr plotting
    position pᵢ = (i−0.35)/n — the rank weighting is invariant to
    tie order among equal y, so row_number needs no value tiebreak.
    With r = a₀/(2a₁): ξ = (r−2)/(r−1), σ = a₀(1−ξ) (exact from
    α_s = σ/((s+1)(s+1−ξ))), and the within-tail q=0.01 quantile
    σ/ξ·(q^{−ξ}−1) with the ξ→0 limit σ·ln(1/q) guarded at |ξ|<1e-9.

    Scale shape: the only per-row work past the scan is the
    exceedance filter (~5% survive); the rank pass sorts ONLY the
    exceedance set per type (at 100 TB the threshold rises with the
    quantile target, keeping the sorted set a fixed small fraction —
    and the sketch-percentile swap for u is a one-line change). One
    grouped percentile, one windowed rank over exceedances, one
    moment aggregate, closed forms after.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("double").alias("v")
    )
    thr = ev.groupBy("event_type").agg(
        F.expr("round(percentile(v, 0.95) + 1e-9, 6)").alias("u")
    )
    exc = (
        ev.join(F.broadcast(thr), "event_type")
        .filter(F.col("v") > F.col("u"))
        .select("event_type", "u", (F.col("v") - F.col("u")).alias("y"))
    )
    wr = Window.partitionBy("event_type").orderBy("y")
    wn = Window.partitionBy("event_type")
    pw = (
        exc.withColumn("rk", F.row_number().over(wr))
        .withColumn("n", F.count("*").over(wn))
        .groupBy("event_type")
        .agg(
            F.max("u").alias("u"),
            F.count("*").cast("long").alias("n_exceed"),
            F.avg("y").alias("a0"),
            F.avg(F.expr("y * (1.0 - (rk - 0.35) / n)")).alias("a1"),
        )
    )
    fit = pw.select(
        "event_type",
        (F.round(F.col("u") + 1e-9, 4) + 0.0).alias("threshold"),
        "n_exceed",
        F.expr("round(a0 + 1e-9, 4) + 0.0").alias("mean_excess"),
        F.expr(
            "round((a0 / (2.0 * a1) - 2.0) / (a0 / (2.0 * a1) - 1.0)"
            " + 1e-9, 6) + 0.0"
        ).alias("gpd_xi"),
        F.expr(
            "round(a0 * (1.0 - (a0 / (2.0 * a1) - 2.0)"
            " / (a0 / (2.0 * a1) - 1.0)) + 1e-9, 4) + 0.0"
        ).alias("gpd_sigma"),
    )
    return fit.select(
        "event_type",
        "threshold",
        "n_exceed",
        "mean_excess",
        "gpd_xi",
        "gpd_sigma",
        F.expr(
            "round(CASE WHEN abs(gpd_xi) < 1e-9"
            " THEN gpd_sigma * ln(100.0)"
            " ELSE gpd_sigma / gpd_xi * (power(0.01, -gpd_xi) - 1.0) END"
            " + 1e-9, 4) + 0.0"
        ).alias("tail_q01_excess"),
    ).orderBy("event_type")


VALUE_POT_GPD_FIT_SQL = """
WITH ev AS (
  SELECT event_type, CAST(value AS DOUBLE) AS v FROM events
),
thr AS (
  SELECT event_type, round(quantile_cont(v, 0.95) + 1e-9, 6) AS u
  FROM ev GROUP BY event_type
),
exc AS (
  SELECT ev.event_type, thr.u, ev.v - thr.u AS y
  FROM ev JOIN thr ON ev.event_type = thr.event_type
  WHERE ev.v > thr.u
),
ranked AS (
  SELECT event_type, u, y,
         row_number() OVER (PARTITION BY event_type ORDER BY y) AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM exc
),
pw AS (
  SELECT event_type,
         max(u) AS u,
         CAST(count(*) AS BIGINT) AS n_exceed,
         avg(y) AS a0,
         avg(y * (1.0 - (rk - 0.35) / n)) AS a1
  FROM ranked GROUP BY event_type
),
fit AS (
  SELECT event_type,
         round(u + 1e-9, 4) + 0.0 AS threshold,
         n_exceed,
         round(a0 + 1e-9, 4) + 0.0 AS mean_excess,
         round((a0 / (2.0 * a1) - 2.0) / (a0 / (2.0 * a1) - 1.0)
               + 1e-9, 6) + 0.0 AS gpd_xi,
         round(a0 * (1.0 - (a0 / (2.0 * a1) - 2.0)
               / (a0 / (2.0 * a1) - 1.0)) + 1e-9, 4) + 0.0 AS gpd_sigma
  FROM pw
)
SELECT event_type, threshold, n_exceed, mean_excess, gpd_xi, gpd_sigma,
       round(CASE WHEN abs(gpd_xi) < 1e-9
             THEN gpd_sigma * ln(100.0)
             ELSE gpd_sigma / gpd_xi * (power(0.01, -gpd_xi) - 1.0) END
             + 1e-9, 4) + 0.0 AS tail_q01_excess
FROM fit
ORDER BY event_type
"""


def _pnorm2_sql(z: str) -> str:
    """Two-sided normal p-value 2·(1−Φ(|z|)) as a SHARED closed form
    (Abramowitz & Stegun 26.2.17, |err| < 7.5e-8): one SQL expression
    string evaluated verbatim by both Spark and DuckDB — polynomial in
    t = 1/(1+0.2316419|z|) times the standard-normal pdf, with
    1/√(2π) inlined as a literal so neither engine's pi() enters.
    Feed it an ALREADY-ROUNDED z so both engines evaluate identical
    doubles; the caller rounds the result to 6dp under the shared
    nudge, giving the 1-ulp libm exp() divergence a 1e-9 margin."""
    az = f"abs({z})"
    t = f"(1.0 / (1.0 + 0.2316419 * {az}))"
    poly = (
        f"({t} * (0.319381530 + {t} * (-0.356563782 + {t} * "
        f"(1.781477937 + {t} * (-1.821255978 + {t} * 1.330274429)))))"
    )
    return (
        f"least(1.0, 2.0 * 0.3989422804014327 "
        f"* exp(-({az} * {az}) / 2.0) * {poly})"
    )


def hourly_value_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day effect screen with Benjamini–Hochberg FDR control:
    24 simultaneous one-vs-rest Welch z-tests ("is hour h's mean event
    value different from the rest of the day?"), each converted to a
    two-sided p-value via the shared closed-form normal CDF, then
    BH-adjusted — the multiple-comparisons discipline every per-group
    test family in this module implicitly needs (24 hypotheses at
    α=0.1 expect ~2.4 false flags uncorrected; BH caps the false
    discovery RATE instead). Emits per hour: moments, z, raw p,
    step-up adjusted p, and the q≤0.10 decision.

    Shape: ONE corpus scan → per-hour (n, Σ, Σ²) — map-side
    combinable, 24-row result; the complement ("rest") moments are
    the broadcast global row minus the hour's, so no second scan and
    no self-join. Everything after the scan — Welch z, the A&S
    polynomial, the BH step-up (a 24-row cumulative min over the
    p-ascending order) — is arithmetic on a fixed-size relation,
    volume-independent. Cross-engine: z is rounded 4dp BEFORE the
    p-value polynomial (identical doubles into exp), p rounded 6dp,
    and the BH cascade runs on the rounded p with hour as the
    deterministic tiebreak.
    """
    ev = load_table(spark, sf_dir, "events").select(
        ((F.unix_micros(F.col("ts")) / 1_000_000).cast("long") / F.lit(3600))
        .cast("long")
        .alias("hb"),
        F.col("value").cast("double").alias("v"),
    )
    hod = ev.groupBy((F.col("hb") % 24).alias("hour")).agg(
        F.count("*").cast("double").alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("ss"),
    )
    glob = hod.agg(
        F.sum("n").alias("gn"), F.sum("s").alias("gs"), F.sum("ss").alias("gss")
    )
    z4 = (
        hod.crossJoin(F.broadcast(glob))
        .withColumn("nr", F.col("gn") - F.col("n"))
        .withColumn("m", F.expr("s / n"))
        .withColumn("mr", F.expr("(gs - s) / nr"))
        .withColumn("var", F.expr("(ss - s * s / n) / (n - 1.0)"))
        .withColumn("varr", F.expr("((gss - ss) - (gs - s) * (gs - s) / nr) / (nr - 1.0)"))
        .withColumn(
            "z",
            F.expr("round((m - mr) / sqrt(var / n + varr / nr) + 1e-9, 4)"),
        )
        .withColumn("p", F.expr(f"round({_pnorm2_sql('z')} + 1e-9, 6)"))
    )
    wrank = Window.orderBy(F.asc("p"), F.asc("hour"))
    ranked = (
        z4.withColumn("rk", F.row_number().over(wrank))
        .withColumn("m_hyp", F.count("*").over(Window.partitionBy()))
        .withColumn(
            "p_bh",
            F.expr("round(least(1.0, min(p * m_hyp / rk) OVER "
                   "(ORDER BY p ASC, hour ASC ROWS BETWEEN CURRENT ROW AND "
                   "UNBOUNDED FOLLOWING)) + 1e-9, 6)"),
        )
    )
    return ranked.select(
        "hour",
        F.col("n").cast("long").alias("n_events"),
        (F.round(F.col("m") + 1e-9, 4) + 0.0).alias("mean_hour"),
        (F.round(F.col("mr") + 1e-9, 4) + 0.0).alias("mean_rest"),
        (F.col("z") + 0.0).alias("z_score"),
        (F.col("p") + 0.0).alias("p_value"),
        (F.col("p_bh") + 0.0).alias("p_bh"),
        (F.col("p_bh") <= 0.10).cast("int").alias("significant"),
    ).orderBy("hour")


HOURLY_VALUE_FDR_BH_SQL = f"""
WITH hod AS (
  SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) % 24 AS hour,
         CAST(count(*) AS DOUBLE) AS n,
         sum(CAST(value AS DOUBLE)) AS s,
         sum(CAST(value AS DOUBLE) * CAST(value AS DOUBLE)) AS ss
  FROM events GROUP BY 1
),
gtot AS (SELECT sum(n) AS gn, sum(s) AS gs, sum(ss) AS gss FROM hod),
z4 AS (
  SELECT hour, n,
         s / n AS m,
         (gs - s) / (gn - n) AS mr,
         round((s / n - (gs - s) / (gn - n))
               / sqrt(((ss - s * s / n) / (n - 1.0)) / n
                      + (((gss - ss) - (gs - s) * (gs - s) / (gn - n))
                         / ((gn - n) - 1.0)) / (gn - n))
               + 1e-9, 4) AS z
  FROM hod CROSS JOIN gtot
),
p AS (
  SELECT *, round({_pnorm2_sql('z')} + 1e-9, 6) AS p FROM z4
),
bh AS (
  SELECT *,
         row_number() OVER (ORDER BY p ASC, hour ASC) AS rk,
         count(*) OVER () AS m_hyp
  FROM p
)
SELECT hour,
       CAST(n AS BIGINT) AS n_events,
       round(m + 1e-9, 4) + 0.0 AS mean_hour,
       round(mr + 1e-9, 4) + 0.0 AS mean_rest,
       z + 0.0 AS z_score,
       p + 0.0 AS p_value,
       round(least(1.0, min(p * m_hyp / rk) OVER
             (ORDER BY p ASC, hour ASC ROWS BETWEEN CURRENT ROW AND
              UNBOUNDED FOLLOWING)) + 1e-9, 6) + 0.0 AS p_bh,
       CAST(round(least(1.0, min(p * m_hyp / rk) OVER
             (ORDER BY p ASC, hour ASC ROWS BETWEEN CURRENT ROW AND
              UNBOUNDED FOLLOWING)) + 1e-9, 6) <= 0.10 AS INT)
         AS significant
FROM bh
ORDER BY hour
"""


def events_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend test + Theil–Sen slope per event type over
    the hourly mean-value series — the standard NONPARAMETRIC trend
    pair (monotone trend without assuming linearity or normal errors;
    the Sen slope is the median of all pairwise slopes, robust to
    ~29% outliers) that a monitoring pipeline runs where OLS-on-time
    would be fooled by heavy tails. S = Σ_{i<j} sign(x_j − x_i);
    Var(S) carries the tie correction Σ t(t−1)(2t+5)/18;
    z = (S ∓ 1)/√Var with continuity correction; |z| > 1.96 flags the
    trend at α=0.05.

    Shape: one corpus scan → (type, hour) means (map-side
    combinable), then the exact pairwise i<j self-join of the HOURLY
    series — T² on a relation that is hours-sized, not corpus-sized
    (the fixture's span is a few hundred hours; a 100 TB deployment
    caps T by windowing the trend test — 90-day lookback — before
    the pairwise term, or swaps in the O(T log T) merge-count form;
    this exact form is its oracle-matched reference). Cross-engine:
    hourly means rounded 6dp BEFORE pairwise signs/slopes (ties →
    sign 0 consistently), Sen slope is the shared continuous-median
    idiom, z rounded 4dp, trend label decided on the rounded z.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = tracked_persist(
        ev.groupBy(
            "event_type",
            F.expr("unix_micros(ts) div 3600000000").alias("hb"),
        ).agg((F.round(F.avg("value") + 1e-9, 6) + 0.0).alias("x"))
    )
    a = hourly.select(
        "event_type", F.col("hb").alias("hi"), F.col("x").alias("xi")
    )
    b = hourly.select(
        "event_type", F.col("hb").alias("hj"), F.col("x").alias("xj")
    )
    pw = a.join(b, "event_type").filter(F.col("hi") < F.col("hj"))
    pair_stats = pw.groupBy("event_type").agg(
        F.sum(
            F.when(F.col("xj") > F.col("xi"), 1)
            .when(F.col("xj") < F.col("xi"), -1)
            .otherwise(0)
        )
        .cast("long")
        .alias("s_stat"),
        F.expr(
            "round(percentile((xj - xi) / (hj - hi), 0.5) + 1e-9, 6) + 0.0"
        ).alias("sen_slope"),
    )
    nh = hourly.groupBy("event_type").agg(F.count("*").cast("double").alias("n"))
    ties = (
        hourly.groupBy("event_type", "x")
        .agg(F.count("*").cast("double").alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)).alias(
                "tie_term"
            )
        )
    )
    out = (
        pair_stats.join(nh, "event_type")
        .join(ties, "event_type")
        .withColumn(
            "var_s",
            (
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.col("tie_term")
            )
            / 18.0,
        )
        .withColumn(
            "z",
            F.when(
                (F.col("var_s") > 0) & (F.col("s_stat") != 0),
                F.round(
                    (F.col("s_stat") - F.signum("s_stat"))
                    / F.sqrt("var_s")
                    + 1e-9,
                    4,
                )
                + 0.0,
            ).otherwise(F.lit(0.0)),
        )
    )
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n_hours"),
        "s_stat",
        (F.round(F.col("var_s") + 1e-9, 4) + 0.0).alias("var_s"),
        F.col("z").alias("z_mk"),
        "sen_slope",
        F.when(F.col("z") > 1.959964, F.lit("increasing"))
        .when(F.col("z") < -1.959964, F.lit("decreasing"))
        .otherwise(F.lit("no_trend"))
        .alias("trend"),
    ).orderBy("event_type")


EVENTS_MANN_KENDALL_SQL = """
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hb,
         round(avg(value) + 1e-9, 6) + 0.0 AS x
  FROM events GROUP BY 1, 2
),
pw AS (
  SELECT a.event_type,
         CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END AS sgn,
         (b.x - a.x) / (b.hb - a.hb) AS slope
  FROM hourly a JOIN hourly b
    ON a.event_type = b.event_type AND a.hb < b.hb
),
pair_stats AS (
  SELECT event_type, CAST(sum(sgn) AS BIGINT) AS s_stat,
         round(quantile_cont(slope, 0.5) + 1e-9, 6) + 0.0 AS sen_slope
  FROM pw GROUP BY 1
),
nh AS (
  SELECT event_type, CAST(count(*) AS DOUBLE) AS n FROM hourly GROUP BY 1
),
ties AS (
  SELECT event_type, sum(t * (t - 1) * (2 * t + 5)) AS tie_term
  FROM (SELECT event_type, x, CAST(count(*) AS DOUBLE) AS t
        FROM hourly GROUP BY 1, 2)
  GROUP BY 1
),
j AS (
  SELECT p.event_type, p.s_stat, p.sen_slope, nh.n,
         (nh.n * (nh.n - 1) * (2 * nh.n + 5) - ties.tie_term) / 18.0 AS var_s
  FROM pair_stats p JOIN nh USING (event_type) JOIN ties USING (event_type)
),
zed AS (
  SELECT *,
         CASE WHEN var_s > 0 AND s_stat != 0
              THEN round((s_stat - sign(s_stat)) / sqrt(var_s) + 1e-9, 4) + 0.0
              ELSE 0.0 END AS z
  FROM j
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_hours,
       s_stat,
       round(var_s + 1e-9, 4) + 0.0 AS var_s,
       z AS z_mk,
       sen_slope,
       CASE WHEN z > 1.959964 THEN 'increasing'
            WHEN z < -1.959964 THEN 'decreasing'
            ELSE 'no_trend' END AS trend
FROM zed ORDER BY event_type
"""


def events_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis H test across event types — the nonparametric
    one-way ANOVA (`events_anova_oneway`'s rank-based twin, the pairing
    ``events_mann_kendall`` gives OLS trend): do the k value
    distributions share a location, judged on ranks so heavy tails and
    skew can't fake or mask an effect? Tie-corrected H, Wilson–Hilferty
    cube-root normal approximation for the p-value (k−1 df), per-group
    rank sums alongside the shared verdict columns.

    THE distributed trick: mid-ranks never touch the corpus sort.
    Values round to 4dp, so the DISTINCT-value relation is bounded by
    the value domain (not corpus size); the global mid-rank of value v
    is C(v) + (n_v+1)/2 with C(v) the cumulative count of smaller
    values — one window over that bounded distinct relation — and
    per-group rank SUMS are then Σ n_{{g,v}}·R(v), a broadcast-sized
    join + map-side agg. Corpus-side work is exactly two keyed
    aggregates; the only ordered pass runs on the distinct-value
    relation (the same bounded-sort contract the value-histogram rows
    pin, with the scale note attached).

    Cross-engine: values rounded 4dp before grouping (ties decided on
    identical doubles), H rounded 4dp BEFORE the WH transform, p via
    the shared A&S polynomial rounded 6dp.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.round(F.col("value") + 1e-9, 4) + 0.0).alias("v"),
    )
    per_gv = ev.groupBy("event_type", "v").agg(
        F.count("*").cast("double").alias("n_gv")
    )
    per_v = per_gv.groupBy("v").agg(F.sum("n_gv").alias("n_v"))
    # bounded ordered pass: cumulative count over DISTINCT rounded
    # values only (domain-sized, never corpus-sized)
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranks = per_v.select(
        "v",
        "n_v",
        (
            F.coalesce(F.sum("n_v").over(wv), F.lit(0.0))
            + (F.col("n_v") + 1) / 2.0
        ).alias("r_mid"),
    )
    grp = (
        per_gv.join(ranks.select("v", "r_mid"), "v")
        .groupBy("event_type")
        .agg(
            F.sum("n_gv").alias("n_g"),
            F.sum(F.col("n_gv") * F.col("r_mid")).alias("rank_sum"),
        )
    )
    tot = grp.agg(
        F.sum("n_g").alias("nn"),
        F.count("*").cast("double").alias("k"),
        F.sum(F.col("rank_sum") * F.col("rank_sum") / F.col("n_g")).alias("rr"),
    )
    tie = per_v.agg(
        F.sum(F.col("n_v") * F.col("n_v") * F.col("n_v") - F.col("n_v")).alias(
            "tie_term"
        )
    )
    h4 = (
        tot.crossJoin(F.broadcast(tie))
        .withColumn(
            "h_raw",
            (12.0 / (F.col("nn") * (F.col("nn") + 1)) * F.col("rr"))
            - 3.0 * (F.col("nn") + 1),
        )
        .withColumn(
            "h",
            F.round(
                F.col("h_raw")
                / (
                    1.0
                    - F.col("tie_term")
                    / (F.col("nn") * F.col("nn") * F.col("nn") - F.col("nn"))
                )
                + 1e-9,
                4,
            )
            + 0.0,
        )
        .withColumn("df", F.col("k") - 1)
        # Wilson–Hilferty: (H/df)^(1/3) ~ N(1 − 2/(9df), 2/(9df))
        .withColumn(
            "z_wh",
            F.round(
                (
                    F.pow(F.col("h") / F.col("df"), 1.0 / 3.0)
                    - (1.0 - 2.0 / (9.0 * F.col("df")))
                )
                / F.sqrt(2.0 / (9.0 * F.col("df")))
                + 1e-9,
                4,
            )
            + 0.0,
        )
        .withColumn(
            "p_value",
            F.expr(
                f"round(CASE WHEN z_wh >= 0 THEN {_pnorm2_sql('z_wh')} / 2.0 "
                f"ELSE 1.0 - {_pnorm2_sql('z_wh')} / 2.0 END + 1e-9, 6) + 0.0"
            ),
        )
    )
    return (
        grp.crossJoin(
            F.broadcast(
                h4.select("h", F.col("df").cast("int").alias("df"), "z_wh", "p_value")
            )
        )
        .select(
            "event_type",
            F.col("n_g").cast("long").alias("n"),
            (F.round(F.col("rank_sum") + 1e-9, 2) + 0.0).alias("rank_sum"),
            (F.round(F.col("rank_sum") / F.col("n_g") + 1e-9, 4) + 0.0).alias(
                "mean_rank"
            ),
            F.col("h").alias("h_stat"),
            "df",
            "z_wh",
            "p_value",
            (F.col("p_value") <= 0.05).cast("int").alias("significant"),
        )
        .orderBy("event_type")
    )


EVENTS_KRUSKAL_WALLIS_SQL = f"""
WITH ev AS (
  SELECT event_type, round(value + 1e-9, 4) + 0.0 AS v FROM events
),
per_gv AS (
  SELECT event_type, v, CAST(count(*) AS DOUBLE) AS n_gv
  FROM ev GROUP BY 1, 2
),
per_v AS (
  SELECT v, sum(n_gv) AS n_v FROM per_gv GROUP BY 1
),
ranks AS (
  SELECT v, n_v,
         coalesce(sum(n_v) OVER (ORDER BY v ASC
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0.0)
           + (n_v + 1) / 2.0 AS r_mid
  FROM per_v
),
grp AS (
  SELECT g.event_type, sum(g.n_gv) AS n_g,
         sum(g.n_gv * r.r_mid) AS rank_sum
  FROM per_gv g JOIN ranks r ON g.v = r.v
  GROUP BY 1
),
tot AS (
  SELECT sum(n_g) AS nn, CAST(count(*) AS DOUBLE) AS k,
         sum(rank_sum * rank_sum / n_g) AS rr
  FROM grp
),
tie AS (SELECT sum(n_v * n_v * n_v - n_v) AS tie_term FROM per_v),
h4 AS (
  SELECT round(((12.0 / (nn * (nn + 1)) * rr) - 3.0 * (nn + 1))
               / (1.0 - tie_term / (nn * nn * nn - nn)) + 1e-9, 4) + 0.0 AS h,
         k - 1 AS df
  FROM tot CROSS JOIN tie
),
zed AS (
  SELECT h, df,
         round((pow(h / df, 1.0 / 3.0) - (1.0 - 2.0 / (9.0 * df)))
               / sqrt(2.0 / (9.0 * df)) + 1e-9, 4) + 0.0 AS z_wh
  FROM h4
),
verdict AS (
  SELECT h, CAST(df AS INT) AS df, z_wh,
         round(CASE WHEN z_wh >= 0 THEN {_pnorm2_sql('z_wh')} / 2.0
               ELSE 1.0 - {_pnorm2_sql('z_wh')} / 2.0 END + 1e-9, 6) + 0.0
           AS p_value
  FROM zed
)
SELECT g.event_type,
       CAST(g.n_g AS BIGINT) AS n,
       round(g.rank_sum + 1e-9, 2) + 0.0 AS rank_sum,
       round(g.rank_sum / g.n_g + 1e-9, 4) + 0.0 AS mean_rank,
       v.h AS h_stat, v.df, v.z_wh, v.p_value,
       CAST(v.p_value <= 0.05 AS INT) AS significant
FROM grp g CROSS JOIN verdict v
ORDER BY g.event_type
"""


def events_pettitt_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt change-point test per event type over the hourly mean
    series — the rank-based "did the level shift, and when?" question
    that completes this module's nonparametric family (Mann–Kendall
    answers "is there a monotone trend", Kruskal–Wallis "do groups
    differ"; Pettitt localizes a single abrupt shift without assuming
    a distribution). K = max_t |U_t| with
    U_t = Σ_{i≤t, j>t} sign(x_j − x_i); the approximate significance
    is p ≈ 2·exp(−6K²/(T³+T²)) (Pettitt 1979).

    Shape: U_t is NOT materialized pairwise-per-boundary — the
    recurrence U_t = Σ_{s≤t} W_s with W_s = Σ_{j≠s} sign(x_j − x_s)
    turns it into ONE pairwise aggregate keyed on the anchor hour
    (the same hours-sized T² term Mann–Kendall prices, map-side
    combinable) plus one cumulative window over the bounded hourly
    series. Cross-engine: hourly means rounded 6dp before signs, the
    argmax boundary is decided on integer U with min-hour tie-break,
    p rounded 6dp under the shared nudge.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = tracked_persist(
        ev.groupBy(
            "event_type",
            F.expr("unix_micros(ts) div 3600000000").alias("hb"),
        ).agg((F.round(F.avg("value") + 1e-9, 6) + 0.0).alias("x"))
    )
    a = hourly.select("event_type", F.col("hb").alias("ht"), F.col("x").alias("xt"))
    b = hourly.select("event_type", F.col("hb").alias("hj"), F.col("x").alias("xj"))
    w_t = (
        a.join(b, "event_type")
        .filter(F.col("ht") != F.col("hj"))
        .groupBy("event_type", "ht")
        .agg(
            F.sum(
                F.when(F.col("xj") > F.col("xt"), 1)
                .when(F.col("xj") < F.col("xt"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("w")
        )
    )
    wc = Window.partitionBy("event_type").orderBy("ht")
    u_t = w_t.withColumn("u", F.sum("w").over(wc))
    # the degenerate t = T boundary has U_T = 0 by antisymmetry, so it
    # can never win the |U| argmax against a real shift; no explicit
    # exclusion needed (all-zero series tie-break to the min hour on
    # both engines)
    wmax = Window.partitionBy("event_type").orderBy(
        F.desc(F.abs(F.col("u"))), F.asc("ht")
    )
    best = (
        u_t.withColumn("rn", F.row_number().over(wmax))
        .filter(F.col("rn") == 1)
        .select("event_type", F.col("ht").alias("cp_hour"), F.abs("u").alias("k"))
    )
    nh = hourly.groupBy("event_type").agg(F.count("*").cast("double").alias("t"))
    return (
        best.join(nh, "event_type")
        .select(
            "event_type",
            F.col("t").cast("long").alias("n_hours"),
            F.col("k").cast("long").alias("k_stat"),
            "cp_hour",
            F.expr(
                "round(least(1.0, 2.0 * exp(-6.0 * k * k / (t * t * t + t * t)))"
                " + 1e-9, 6) + 0.0"
            ).alias("p_value"),
        )
        .withColumn("significant", (F.col("p_value") <= 0.05).cast("int"))
        .orderBy("event_type")
    )


EVENTS_PETTITT_CHANGEPOINT_SQL = """
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hb,
         round(avg(value) + 1e-9, 6) + 0.0 AS x
  FROM events GROUP BY 1, 2
),
w_t AS (
  SELECT a.event_type, a.hb AS ht,
         CAST(sum(CASE WHEN b.x > a.x THEN 1
                       WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS w
  FROM hourly a JOIN hourly b
    ON a.event_type = b.event_type AND a.hb != b.hb
  GROUP BY 1, 2
),
u_t AS (
  SELECT event_type, ht,
         sum(w) OVER (PARTITION BY event_type ORDER BY ht) AS u
  FROM w_t
),
best AS (
  SELECT event_type, ht AS cp_hour, abs(u) AS k FROM (
    SELECT *, row_number() OVER (PARTITION BY event_type
                                 ORDER BY abs(u) DESC, ht ASC) AS rn
    FROM u_t
  ) WHERE rn = 1
),
nh AS (
  SELECT event_type, CAST(count(*) AS DOUBLE) AS t FROM hourly GROUP BY 1
)
SELECT b.event_type,
       CAST(nh.t AS BIGINT) AS n_hours,
       CAST(b.k AS BIGINT) AS k_stat,
       b.cp_hour,
       round(least(1.0, 2.0 * exp(-6.0 * b.k * b.k / (nh.t * nh.t * nh.t + nh.t * nh.t)))
             + 1e-9, 6) + 0.0 AS p_value,
       CAST(round(least(1.0, 2.0 * exp(-6.0 * b.k * b.k / (nh.t * nh.t * nh.t + nh.t * nh.t)))
             + 1e-9, 6) + 0.0 <= 0.05 AS INT) AS significant
FROM best b JOIN nh USING (event_type)
ORDER BY b.event_type
"""


_LB_LAGS = 8


def events_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung–Box portmanteau test per event type over the 5-minute
    volume series — "is there ANY autocorrelation in the first {M}
    lags?", the whiteness check run on monitoring residuals before
    trusting an anomaly threshold (``events_autocorr_lag1`` reads one
    lag; Q aggregates them with small-sample weighting):
    Q = T(T+2)·Σ_k r_k²/(T−k), χ²({M}) under the null, p via the
    Wilson–Hilferty cube-root normal approximation (the
    ``events_kruskal_wallis`` idiom). One row per (type, lag) with
    its ACF coefficient, the shared Q/p verdict columns alongside.

    Shape: bucket sums (series length grows with time span, not row
    count), per-type moment agg for mean and s0, ONE ordered window
    pass materializing all {M} lagged copies (row-based lag, both
    engines), a stack/UNION melt to (type, lag) pairs, then keyed
    aggregates — everything after the bucket agg is series-sized.
    Cross-engine: r_k rounded 6dp before Q, Q rounded 4dp before WH,
    p rounded 6dp, all under the shared nudge.
    """
    ev = load_table(spark, sf_dir, "events")
    buckets = ev.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 300).cast("long").alias("bucket"),
    ).agg(F.sum("value").alias("vol"))
    stats = buckets.groupBy("event_type").agg(
        F.count("*").cast("double").alias("t_len"), F.avg("vol").alias("mu")
    )
    cen = buckets.join(F.broadcast(stats), "event_type").select(
        "event_type", "bucket", "t_len", (F.col("vol") - F.col("mu")).alias("c")
    )
    wb = Window.partitionBy("event_type").orderBy("bucket")
    lagged = cen.select(
        "event_type",
        "t_len",
        "c",
        *[F.lag("c", k).over(wb).alias(f"c{k}") for k in range(1, _LB_LAGS + 1)],
    )
    s0 = lagged.groupBy("event_type").agg(
        F.sum(F.col("c") * F.col("c")).alias("s0")
    )
    stack_expr = "stack({}, {}) as (lag, c_lag)".format(
        _LB_LAGS, ", ".join(f"{k}, c{k}" for k in range(1, _LB_LAGS + 1))
    )
    melted = lagged.select("event_type", "t_len", "c", F.expr(stack_expr)).filter(
        F.col("c_lag").isNotNull()
    )
    acf = (
        melted.groupBy("event_type", "lag")
        .agg(
            F.first("t_len").alias("t_len"),
            F.sum(F.col("c") * F.col("c_lag")).alias("num"),
        )
        .join(F.broadcast(s0), "event_type")
        .select(
            "event_type",
            "lag",
            "t_len",
            (F.round(F.col("num") / F.col("s0") + 1e-9, 6) + 0.0).alias("r_k"),
        )
    )
    q = acf.groupBy("event_type").agg(
        F.round(
            F.first("t_len")
            * (F.first("t_len") + 2)
            * F.sum(F.col("r_k") * F.col("r_k") / (F.col("t_len") - F.col("lag")))
            + 1e-9,
            4,
        ).alias("q_lb")
    )
    df = float(_LB_LAGS)
    verdict = q.select(
        "event_type",
        (F.col("q_lb") + 0.0).alias("q_lb"),
        (
            F.round(
                (
                    F.pow(F.col("q_lb") / df, 1.0 / 3.0)
                    - (1.0 - 2.0 / (9.0 * df))
                )
                / math.sqrt(2.0 / (9.0 * df))
                + 1e-9,
                4,
            )
            + 0.0
        ).alias("z_wh"),
    ).withColumn(
        "p_value",
        F.expr(
            f"round(CASE WHEN z_wh >= 0 THEN {_pnorm2_sql('z_wh')} / 2.0 "
            f"ELSE 1.0 - {_pnorm2_sql('z_wh')} / 2.0 END + 1e-9, 6) + 0.0"
        ),
    )
    return (
        acf.join(F.broadcast(verdict), "event_type")
        .select(
            "event_type",
            F.col("lag").cast("int").alias("lag"),
            "r_k",
            "q_lb",
            "z_wh",
            "p_value",
            (F.col("p_value") <= 0.05).cast("int").alias("autocorrelated"),
        )
        .orderBy("event_type", "lag")
    )


events_ljung_box.__doc__ = events_ljung_box.__doc__.format(M=_LB_LAGS)


def _ljung_box_oracle_sql() -> str:
    lag_cols = ",\n         ".join(
        f"lag(c, {k}) OVER (PARTITION BY event_type ORDER BY bucket) AS c{k}"
        for k in range(1, _LB_LAGS + 1)
    )
    melt = "\nUNION ALL\n".join(
        f"SELECT event_type, t_len, c, {k} AS lag, c{k} AS c_lag FROM lagged"
        for k in range(1, _LB_LAGS + 1)
    )
    df = float(_LB_LAGS)
    return f"""
WITH buckets AS (
  SELECT event_type, CAST(floor(epoch(ts) / 300) AS BIGINT) AS bucket,
         sum(value) AS vol
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, CAST(count(*) AS DOUBLE) AS t_len, avg(vol) AS mu
  FROM buckets GROUP BY 1
),
cen AS (
  SELECT b.event_type, b.bucket, s.t_len, b.vol - s.mu AS c
  FROM buckets b JOIN stats s USING (event_type)
),
lagged AS (
  SELECT event_type, bucket, t_len, c,
         {lag_cols}
  FROM cen
),
s0 AS (
  SELECT event_type, sum(c * c) AS s0 FROM lagged GROUP BY 1
),
melted AS (
  SELECT * FROM ({melt}) WHERE c_lag IS NOT NULL
),
acf AS (
  SELECT m.event_type, m.lag, any_value(m.t_len) AS t_len,
         round(sum(m.c * m.c_lag) / any_value(s0.s0) + 1e-9, 6) + 0.0 AS r_k
  FROM melted m JOIN s0 ON m.event_type = s0.event_type
  GROUP BY 1, 2
),
q AS (
  SELECT event_type,
         round(any_value(t_len) * (any_value(t_len) + 2)
               * sum(r_k * r_k / (t_len - lag)) + 1e-9, 4) + 0.0 AS q_lb
  FROM acf GROUP BY 1
),
verdict AS (
  SELECT event_type, q_lb,
         round((pow(q_lb / {df}, 1.0 / 3.0) - (1.0 - 2.0 / (9.0 * {df})))
               / sqrt(2.0 / (9.0 * {df})) + 1e-9, 4) + 0.0 AS z_wh
  FROM q
),
pv AS (
  SELECT event_type, q_lb, z_wh,
         round(CASE WHEN z_wh >= 0 THEN {_pnorm2_sql('z_wh')} / 2.0
               ELSE 1.0 - {_pnorm2_sql('z_wh')} / 2.0 END + 1e-9, 6) + 0.0
           AS p_value
  FROM verdict
)
SELECT a.event_type, CAST(a.lag AS INT) AS lag, a.r_k,
       p.q_lb, p.z_wh, p.p_value,
       CAST(p.p_value <= 0.05 AS INT) AS autocorrelated
FROM acf a JOIN pv p USING (event_type)
ORDER BY a.event_type, a.lag
"""


EVENTS_LJUNG_BOX_SQL = _ljung_box_oracle_sql()


_TE_FOLDS = 5
_TE_PRIOR = 100.0  # smoothing pseudo-count toward the global mean


def events_target_encoding_oof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-fold target encoding of event_type against the value
    target — THE leakage-safe way to turn a categorical into a model
    feature (each row's encoding averages the target over OTHER folds
    only, so a row never sees its own label; in-fold means are the
    classic leak that inflates validation scores), with pseudo-count
    smoothing toward the global mean (m={M}) so rare categories don't
    memorize. Emits per (category, fold): the raw OOF mean and the
    smoothed encoding a feature store would persist.

    Shape: fold = ⌊5u⌋ from the md5-derived dyadic uniform on
    event_id (bit-identical cross-engine, the seeded-noise idiom) —
    then ONE (category, fold) aggregate; OOF = (category totals −
    fold totals) needs no second scan because category totals are the
    fold totals re-aggregated (two map-side-combinable aggs total,
    broadcast-joined back; global mean is a 1-row broadcast).
    Nothing scales beyond categories × folds after the scan.
    """
    u = _hex_uniform("te|", "event_id_s")
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.col("event_id").cast("string").alias("event_id_s"),
        F.col("value").cast("double").alias("y"),
    )
    folds = ev.select(
        "event_type", "y", F.floor(u * _TE_FOLDS).cast("int").alias("fold")
    )
    per_cf = folds.groupBy("event_type", "fold").agg(
        F.count("*").cast("double").alias("n_f"), F.sum("y").alias("s_f")
    )
    per_c = per_cf.groupBy("event_type").agg(
        F.sum("n_f").alias("n_c"), F.sum("s_f").alias("s_c")
    )
    glob = per_c.agg((F.sum("s_c") / F.sum("n_c")).alias("g"))
    return (
        per_cf.join(F.broadcast(per_c), "event_type")
        .crossJoin(F.broadcast(glob))
        .select(
            "event_type",
            "fold",
            F.col("n_f").cast("long").alias("n_rows"),
            (
                F.round(
                    (F.col("s_c") - F.col("s_f")) / (F.col("n_c") - F.col("n_f"))
                    + 1e-9,
                    6,
                )
                + 0.0
            ).alias("oof_mean"),
            (
                F.round(
                    (F.col("s_c") - F.col("s_f") + _TE_PRIOR * F.col("g"))
                    / (F.col("n_c") - F.col("n_f") + _TE_PRIOR)
                    + 1e-9,
                    6,
                )
                + 0.0
            ).alias("encoded_smoothed"),
        )
        .orderBy("event_type", "fold")
    )


events_target_encoding_oof.__doc__ = events_target_encoding_oof.__doc__.format(
    M=int(_TE_PRIOR)
)


EVENTS_TARGET_ENCODING_OOF_SQL = f"""
WITH folds AS (
  SELECT event_type, CAST(value AS DOUBLE) AS y,
         CAST(floor({_hex_uniform_sql("te|", "CAST(event_id AS VARCHAR)")} * {_TE_FOLDS}) AS INT) AS fold
  FROM events
),
per_cf AS (
  SELECT event_type, fold, CAST(count(*) AS DOUBLE) AS n_f, sum(y) AS s_f
  FROM folds GROUP BY 1, 2
),
per_c AS (
  SELECT event_type, sum(n_f) AS n_c, sum(s_f) AS s_c FROM per_cf GROUP BY 1
),
gm AS (SELECT sum(s_c) / sum(n_c) AS g FROM per_c)
SELECT f.event_type, f.fold,
       CAST(f.n_f AS BIGINT) AS n_rows,
       round((c.s_c - f.s_f) / (c.n_c - f.n_f) + 1e-9, 6) + 0.0 AS oof_mean,
       round((c.s_c - f.s_f + {_TE_PRIOR} * gm.g)
             / (c.n_c - f.n_f + {_TE_PRIOR}) + 1e-9, 6) + 0.0
         AS encoded_smoothed
FROM per_cf f JOIN per_c c USING (event_type) CROSS JOIN gm
ORDER BY f.event_type, f.fold
"""


_CAL_BINS = 10


def user_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + isotonic recalibration + ECE for the
    logistic buyer model — the calibration audit every scored-model
    deployment runs before its probabilities feed a downstream
    threshold: per equal-width probability bin, average confidence vs
    empirical rate; the Expected Calibration Error Σ (n_b/N)·|acc−conf|;
    and the ISOTONIC fit (pool-adjacent-violators) of the bin curve —
    the monotone recalibration map production stacks (sklearn
    ``CalibratedClassifierCV``) apply. PAVA is usually presented as a
    sequential pool loop; over BINNED data it is the closed form
    iso(t) = max_{{i≤t}} min_{{j≥t}} wmean(i..j) — three tiny joins on
    the {B}-row bin relation, fully declarative.

    Shape: the shared ``_logistic_fit`` IRLS path scores each user
    (one broadcast of 2 coefficients), probabilities round 6dp BEFORE
    binning (the only cross-engine exp() surface), then everything —
    prefix sums, the (i,j) pair means, the max-min, ECE — runs on the
    {B}-row bin relation. Corpus cost = the regression row's cost.
    """
    base, b, eta = _logistic_fit(spark, sf_dir)
    scored = base.crossJoin(F.broadcast(b)).select(
        "y",
        F.expr(
            f"round(1.0 / (1.0 + exp(-({eta}))) + 1e-9, 6) + 0.0"
        ).alias("mu6"),
    )
    bins = scored.groupBy(
        F.least(
            F.floor(F.col("mu6") * _CAL_BINS).cast("int"), F.lit(_CAL_BINS - 1)
        ).alias("bin")
    ).agg(
        F.count("*").cast("double").alias("n"),
        (F.round(F.avg("mu6") + 1e-9, 6) + 0.0).alias("conf"),
        (F.round(F.avg("y") + 1e-9, 6) + 0.0).alias("acc"),
    )
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = tracked_persist(
        bins.select(
            "bin",
            "n",
            "conf",
            "acc",
            F.sum("n").over(wcum).alias("cn"),
            F.sum(F.col("n") * F.col("acc")).over(wcum).alias("cs"),
        )
    )
    lo = cum.select(
        F.col("bin").alias("i"),
        (F.col("cn") - F.col("n")).alias("cn_lo"),
        (F.col("cs") - F.col("n") * F.col("acc")).alias("cs_lo"),
    )
    hi = cum.select(
        F.col("bin").alias("j"), F.col("cn").alias("cn_hi"), F.col("cs").alias("cs_hi")
    )
    pair_means = (
        lo.join(hi, F.col("i") <= F.col("j"))
        .select(
            "i",
            "j",
            (
                F.round(
                    (F.col("cs_hi") - F.col("cs_lo"))
                    / (F.col("cn_hi") - F.col("cn_lo"))
                    + 1e-9,
                    6,
                )
                + 0.0
            ).alias("wm"),
        )
    )
    t_rel = cum.select(F.col("bin").alias("t"))
    inner = (
        t_rel.join(pair_means, (F.col("i") <= F.col("t")) & (F.col("j") >= F.col("t")))
        .groupBy("t", "i")
        .agg(F.min("wm").alias("min_j"))
        .groupBy("t")
        .agg(F.max("min_j").alias("iso_cal"))
    )
    ece = bins.agg(
        (
            F.round(
                F.sum(F.col("n") * F.abs(F.col("acc") - F.col("conf")))
                / F.sum("n")
                + 1e-9,
                6,
            )
            + 0.0
        ).alias("ece")
    )
    return (
        cum.join(inner, cum.bin == inner.t)
        .crossJoin(F.broadcast(ece))
        .select(
            "bin",
            F.col("n").cast("long").alias("n_users"),
            "conf",
            "acc",
            "iso_cal",
            "ece",
        )
        .orderBy("bin")
    )


user_quality_calibration.__doc__ = user_quality_calibration.__doc__.format(
    B=_CAL_BINS
)


def _calibration_oracle_sql() -> str:
    eta = (
        f"greatest(least(b.b0 + b.b1 * lbase.x, {_LOGIT_CAP}), -{_LOGIT_CAP})"
    )
    return (
        "WITH "
        + _logit_ctes()
        + f""",
scored AS (
  SELECT lbase.y,
         round(1.0 / (1.0 + exp(-({eta}))) + 1e-9, 6) + 0.0 AS mu6
  FROM lbase CROSS JOIN lb_{_LOGIT_ITERS} b
),
bins AS (
  SELECT least(CAST(floor(mu6 * {_CAL_BINS}) AS INT), {_CAL_BINS - 1}) AS bin,
         CAST(count(*) AS DOUBLE) AS n,
         round(avg(mu6) + 1e-9, 6) + 0.0 AS conf,
         round(avg(y) + 1e-9, 6) + 0.0 AS acc
  FROM scored GROUP BY 1
),
cum AS (
  SELECT bin, n, conf, acc,
         sum(n) OVER (ORDER BY bin) AS cn,
         sum(n * acc) OVER (ORDER BY bin) AS cs
  FROM bins
),
pair_means AS (
  SELECT lo.bin AS i, hi.bin AS j,
         round((hi.cs - (lo.cn - lo.n) * 0 - (lo.cs - lo.n * lo.acc))
               / (hi.cn - (lo.cn - lo.n)) + 1e-9, 6) + 0.0 AS wm
  FROM cum lo JOIN cum hi ON lo.bin <= hi.bin
),
inner_min AS (
  SELECT t.bin AS t, p.i, min(p.wm) AS min_j
  FROM cum t JOIN pair_means p ON p.i <= t.bin AND p.j >= t.bin
  GROUP BY 1, 2
),
iso AS (
  SELECT t, max(min_j) AS iso_cal FROM inner_min GROUP BY 1
),
e AS (
  SELECT round(sum(n * abs(acc - conf)) / sum(n) + 1e-9, 6) + 0.0 AS ece
  FROM bins
)
SELECT c.bin, CAST(c.n AS BIGINT) AS n_users, c.conf, c.acc,
       i.iso_cal, e.ece
FROM cum c JOIN iso i ON c.bin = i.t CROSS JOIN e
ORDER BY c.bin
"""
    )


USER_QUALITY_CALIBRATION_SQL = _calibration_oracle_sql()



_BH_Q = 0.10


def events_benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control over the per-type drift tests —
    the multiple-comparisons step every metrics/experimentation stack
    bolts onto its per-segment z-tests (test m segments at q=10% FDR
    instead of m uncorrected alpha=5% tests). Each event type gets the
    two-proportion z for its share of FIRST-half vs SECOND-half
    traffic (midpoint of the corpus time range), a normal-tail
    p-value, and the BH step-up verdict: order p ascending, reject
    every rank <= the largest i with p_(i) <= i*q/m.

    The p-value uses the Lin (1989) logistic approximation of the
    normal upper tail, exp(-0.717|z| - 0.416 z^2) — closed-form in
    both engines (neither dialect ships an erf the other matches
    bit-for-bit; the approximation IS the declared test statistic,
    computed from the 6dp-rounded z so both engines exponentiate
    identical inputs). All ordered logic runs on the bounded
    event-type relation (window above an Aggregate).
    """
    # microsecond epoch on BOTH engines (unix_micros / epoch_us) so
    # midpoint and comparison use identical values — unix_timestamp
    # truncates to seconds while the oracle's epoch() is fractional
    # (the ADVICE r10 flake class, same fix as events_diff_in_diff)
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr("unix_micros(ts)").alias("us")
    )
    bounds = ev.agg(
        ((F.min("us") + F.max("us")) / 2.0).alias("mid")
    )
    halved = ev.crossJoin(F.broadcast(bounds)).select(
        "event_type", (F.col("us") <= F.col("mid")).alias("first_half")
    )
    per_type = halved.groupBy("event_type").agg(
        F.count(F.when(F.col("first_half"), 1)).alias("n_first"),
        F.count(F.when(~F.col("first_half"), 1)).alias("n_second"),
    )
    tot = per_type.agg(
        F.sum("n_first").alias("t1"), F.sum("n_second").alias("t2")
    )
    z = per_type.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n_first",
        "n_second",
        F.round(
            (
                (F.col("n_first") / F.col("t1"))
                - (F.col("n_second") / F.col("t2"))
            )
            / F.sqrt(
                ((F.col("n_first") + F.col("n_second"))
                 / (F.col("t1") + F.col("t2")))
                * (1.0 - (F.col("n_first") + F.col("n_second"))
                   / (F.col("t1") + F.col("t2")))
                * (1.0 / F.col("t1") + 1.0 / F.col("t2"))
            )
            + 1e-9,
            6,
        ).alias("z"),
    )
    p = z.select(
        "event_type",
        "n_first",
        "n_second",
        "z",
        (
            F.round(
                F.least(
                    F.lit(1.0),
                    2.0
                    * F.exp(
                        -0.717 * F.abs(F.col("z"))
                        - 0.416 * F.col("z") * F.col("z")
                    ),
                )
                + 1e-9,
                8,
            )
            + 0.0
        ).alias("p_value"),
    )
    wr = Window.orderBy(F.asc("p_value"), F.asc("event_type"))
    ranked = p.withColumn("p_rank", F.row_number().over(wr))
    m = ranked.agg(F.count("*").alias("m"))
    thresh = ranked.crossJoin(F.broadcast(m)).withColumn(
        "bh_threshold",
        F.round(F.col("p_rank") * _BH_Q / F.col("m") + 1e-9, 8) + 0.0,
    )
    kmax = thresh.agg(
        F.max(
            F.when(
                F.col("p_value") <= F.col("bh_threshold"), F.col("p_rank")
            ).otherwise(F.lit(0))
        ).alias("k")
    )
    return (
        thresh.crossJoin(F.broadcast(kmax))
        .select(
            "event_type",
            "n_first",
            "n_second",
            "z",
            "p_value",
            F.col("p_rank").cast("long").alias("p_rank"),
            "bh_threshold",
            (F.col("p_rank") <= F.col("k")).cast("int").alias("rejected"),
        )
        .orderBy("p_rank")
    )


EVENTS_BENJAMINI_HOCHBERG_SQL = f"""
WITH ev AS (
  SELECT event_type, epoch_us(ts) AS us FROM events
),
halved AS (
  SELECT event_type,
         us <= (SELECT (min(us) + max(us)) / 2.0 FROM ev) AS first_half
  FROM ev
),
per_type AS (
  SELECT event_type,
         count(CASE WHEN first_half THEN 1 END) AS n_first,
         count(CASE WHEN NOT first_half THEN 1 END) AS n_second
  FROM halved GROUP BY event_type
),
tot AS (
  SELECT CAST(sum(n_first) AS DOUBLE) AS t1,
         CAST(sum(n_second) AS DOUBLE) AS t2
  FROM per_type
),
zed AS (
  SELECT event_type, n_first, n_second,
         round(((n_first / t1) - (n_second / t2))
               / sqrt(((n_first + n_second) / (t1 + t2))
                      * (1.0 - (n_first + n_second) / (t1 + t2))
                      * (1.0 / t1 + 1.0 / t2)) + 1e-9, 6) AS z
  FROM per_type CROSS JOIN tot
),
pv AS (
  SELECT event_type, n_first, n_second, z,
         round(least(1.0, 2.0 * exp(-0.717 * abs(z) - 0.416 * z * z))
               + 1e-9, 8) + 0.0 AS p_value
  FROM zed
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY p_value ASC, event_type ASC)
           AS p_rank,
         (SELECT count(*) FROM pv) AS m
  FROM pv
),
thresh AS (
  SELECT *, round(p_rank * {_BH_Q} / m + 1e-9, 8) + 0.0 AS bh_threshold
  FROM ranked
)
SELECT event_type, n_first, n_second, z, p_value,
       CAST(p_rank AS BIGINT) AS p_rank, bh_threshold,
       CAST(p_rank <= (SELECT max(CASE WHEN p_value <= bh_threshold
                                       THEN p_rank ELSE 0 END) FROM thresh)
            AS INT) AS rejected
FROM thresh ORDER BY p_rank
"""


def user_time_decay_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential time-decay engagement features — the recency-
    weighted activity score feature stores compute per entity (7-day
    half-life: yesterday's event counts ~0.91x, last month's ~0.05x):
    per user, sum of value * 0.5^(days_ago / 7) plus supporting
    recency stats. One corpus pass, one user-keyed aggregate; the
    anchor date is a broadcast scalar.

    Cross-engine: days_ago is an exact integer date diff; each decay
    term rounds 6dp before the sum and the sum rounds 4dp (last-ulp
    pow() differences cannot reach either boundary past the nudge).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d"), "value"
    )
    maxd = ev.agg(F.max("d").alias("dmax"))
    terms = (
        ev.crossJoin(F.broadcast(maxd))
        .select(
            "user_id",
            "value",
            F.datediff("dmax", "d").cast("long").alias("days_ago"),
        )
        .select(
            "user_id",
            "days_ago",
            F.round(
                F.col("value") * F.pow(F.lit(0.5), F.col("days_ago") / 7.0)
                + 1e-9,
                6,
            ).alias("term"),
        )
    )
    return (
        terms.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            (F.round(F.sum("term") + 1e-9, 4) + 0.0).alias("decayed_value"),
            F.min("days_ago").alias("last_seen_days"),
        )
        .orderBy("user_id")
    )


USER_TIME_DECAY_FEATURES_SQL = """
WITH ev AS (
  SELECT user_id, CAST(ts AS DATE) AS d, value FROM events
),
terms AS (
  SELECT user_id,
         CAST(date_diff('day', d, (SELECT max(d) FROM ev)) AS BIGINT)
           AS days_ago,
         round(value * pow(0.5,
               CAST(date_diff('day', d, (SELECT max(d) FROM ev)) AS BIGINT)
               / 7.0) + 1e-9, 6) AS term
  FROM ev
)
SELECT user_id, count(*) AS n_events,
       round(sum(term) + 1e-9, 4) + 0.0 AS decayed_value,
       min(days_ago) AS last_seen_days
FROM terms GROUP BY user_id ORDER BY user_id
"""


QUERIES = {
    "events_benjamini_hochberg": events_benjamini_hochberg,
    "user_time_decay_features": user_time_decay_features,
    "events_mann_kendall": events_mann_kendall,
    "events_kruskal_wallis": events_kruskal_wallis,
    "events_pettitt_changepoint": events_pettitt_changepoint,
    "events_ljung_box": events_ljung_box,
    "events_target_encoding_oof": events_target_encoding_oof,
    "user_quality_calibration": user_quality_calibration,
    "events_ols_two_factor": events_ols_two_factor,
    "hourly_value_fdr_bh": hourly_value_fdr_bh,
    "value_pot_gpd_fit": value_pot_gpd_fit,
    "events_anova_oneway": events_anova_oneway,
    "orders_survival_km": orders_survival_km,
    "customer_value_gini": customer_value_gini,
    "customer_lorenz_curve": customer_lorenz_curve,
    "value_hill_tail_index": value_hill_tail_index,
    "parts_abc_classification": parts_abc_classification,
    "lineitem_weighted_median": lineitem_weighted_median,
    "events_two_proportion_ztest": events_two_proportion_ztest,
    "user_poisson_regression": user_poisson_regression,
    "user_logistic_regression": user_logistic_regression,
    "user_logistic_roc_auc": user_logistic_roc_auc,
    "events_decision_stump": events_decision_stump,
    "events_diff_in_diff": events_diff_in_diff,
    "events_sprt_monitor": events_sprt_monitor,
    "events_cross_correlation": events_cross_correlation,
    "customer_theil_decomposition": customer_theil_decomposition,
    "orders_logrank_test": orders_logrank_test,
    "value_conformal_interval": value_conformal_interval,
    "user_overdispersion_check": user_overdispersion_check,
    "customer_tercile_migration": customer_tercile_migration,
    "source_welch_ttest": source_welch_ttest,
    "mi_event_value_bands": mi_event_value_bands,
    "value_ks_grid": value_ks_grid,
    "events_autocorr_lag1": events_autocorr_lag1,
    "market_basket_rules": market_basket_rules,
    "value_mannwhitney_grid": value_mannwhitney_grid,
    "lang_source_chisq": lang_source_chisq,
    "value_spearman_banded": value_spearman_banded,
    "events_bootstrap_ci": events_bootstrap_ci,
}

ORACLES = {
    "events_benjamini_hochberg": EVENTS_BENJAMINI_HOCHBERG_SQL,
    "user_time_decay_features": USER_TIME_DECAY_FEATURES_SQL,
    "events_mann_kendall": EVENTS_MANN_KENDALL_SQL,
    "events_kruskal_wallis": EVENTS_KRUSKAL_WALLIS_SQL,
    "events_pettitt_changepoint": EVENTS_PETTITT_CHANGEPOINT_SQL,
    "events_ljung_box": EVENTS_LJUNG_BOX_SQL,
    "events_target_encoding_oof": EVENTS_TARGET_ENCODING_OOF_SQL,
    "user_quality_calibration": USER_QUALITY_CALIBRATION_SQL,
    "events_ols_two_factor": EVENTS_OLS_TWO_FACTOR_SQL,
    "hourly_value_fdr_bh": HOURLY_VALUE_FDR_BH_SQL,
    "value_pot_gpd_fit": VALUE_POT_GPD_FIT_SQL,
    "events_anova_oneway": EVENTS_ANOVA_ONEWAY_SQL,
    "orders_survival_km": ORDERS_SURVIVAL_KM_SQL,
    "customer_value_gini": CUSTOMER_VALUE_GINI_SQL,
    "customer_lorenz_curve": CUSTOMER_LORENZ_CURVE_SQL,
    "value_hill_tail_index": VALUE_HILL_TAIL_INDEX_SQL,
    "parts_abc_classification": PARTS_ABC_CLASSIFICATION_SQL,
    "lineitem_weighted_median": LINEITEM_WEIGHTED_MEDIAN_SQL,
    "events_two_proportion_ztest": EVENTS_TWO_PROPORTION_ZTEST_SQL,
    "user_poisson_regression": USER_POISSON_REGRESSION_SQL,
    "user_logistic_regression": USER_LOGISTIC_REGRESSION_SQL,
    "user_logistic_roc_auc": USER_LOGISTIC_ROC_AUC_SQL,
    "events_decision_stump": EVENTS_DECISION_STUMP_SQL,
    "events_diff_in_diff": EVENTS_DIFF_IN_DIFF_SQL,
    "events_sprt_monitor": EVENTS_SPRT_MONITOR_SQL,
    "events_cross_correlation": EVENTS_CROSS_CORRELATION_SQL,
    "customer_theil_decomposition": CUSTOMER_THEIL_DECOMPOSITION_SQL,
    "orders_logrank_test": ORDERS_LOGRANK_TEST_SQL,
    "value_conformal_interval": VALUE_CONFORMAL_INTERVAL_SQL,
    "user_overdispersion_check": USER_OVERDISPERSION_CHECK_SQL,
    "customer_tercile_migration": CUSTOMER_TERCILE_MIGRATION_SQL,
    "source_welch_ttest": SOURCE_WELCH_TTEST_SQL,
    "mi_event_value_bands": MI_EVENT_VALUE_BANDS_SQL,
    "value_ks_grid": VALUE_KS_GRID_SQL,
    "events_autocorr_lag1": EVENTS_AUTOCORR_LAG1_SQL,
    "market_basket_rules": MARKET_BASKET_RULES_SQL,
    "value_mannwhitney_grid": VALUE_MANNWHITNEY_GRID_SQL,
    "lang_source_chisq": LANG_SOURCE_CHISQ_SQL,
    "value_spearman_banded": VALUE_SPEARMAN_BANDED_SQL,
    "events_bootstrap_ci": EVENTS_BOOTSTRAP_CI_SQL,
}
