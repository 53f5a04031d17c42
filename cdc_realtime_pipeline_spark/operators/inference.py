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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

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
                "(c_xy / nn) * log2(c_xy * nn / (c_x * c_y))"
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
       round(sum((j.c_xy / n.nn) * log2(j.c_xy * n.nn / (cx.c_x * cy.c_y)))
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
_AC_R = (
    "((np * sab - sa * sb) /"
    " sqrt((np * saa - sa * sa) * (np * sbb - sb * sb)))"
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
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    tracked_persist(items)
    n_orders = items.select("l_orderkey").distinct().agg(
        F.count("*").cast("double").alias("n_orders")
    )
    item_n = items.groupBy("l_partkey").agg(F.count("*").alias("c_item"))
    a = items.select("l_orderkey", F.col("l_partkey").alias("p_a"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("p_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("p_a") < F.col("p_b"))
        .groupBy("p_a", "p_b")
        .agg(F.count("*").alias("c_ab"))
        .filter(F.col("c_ab") >= 2)
    )
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


QUERIES = {
    "events_ols_two_factor": events_ols_two_factor,
    "source_welch_ttest": source_welch_ttest,
    "mi_event_value_bands": mi_event_value_bands,
    "value_ks_grid": value_ks_grid,
    "events_autocorr_lag1": events_autocorr_lag1,
    "market_basket_rules": market_basket_rules,
}

ORACLES = {
    "events_ols_two_factor": EVENTS_OLS_TWO_FACTOR_SQL,
    "source_welch_ttest": SOURCE_WELCH_TTEST_SQL,
    "mi_event_value_bands": MI_EVENT_VALUE_BANDS_SQL,
    "value_ks_grid": VALUE_KS_GRID_SQL,
    "events_autocorr_lag1": EVENTS_AUTOCORR_LAG1_SQL,
    "market_basket_rules": MARKET_BASKET_RULES_SQL,
}
