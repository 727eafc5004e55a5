"""Statistical gates: KS/CUSUM/OLS/covariance, robust stats, histograms, quantiles, anomaly and distribution checks.

Split out of the former monolithic queries.py; see package __init__ for
the assembled QUERIES/ORACLES registry (order preserved exactly).
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ip_filter_spark.functions.text import (
    LANG_MARKERS,
    MOD,
    fingerprint_expr,
    lang_id_expr,
    ngrams_expr,
    token_count_expr,
    tokens_expr,
)

from ip_filter_spark.queries._shared import (
    QS,
    _t,
    _epoch_us,
    _ensure_shipped,
)

# =====================================================================
# Quantiles (exact rank formulation — oracle-safe)
# =====================================================================
def quantiles_exact(spark, sf_dir):
    from ip_filter_spark.operators.quantiles import exact_quantiles

    return exact_quantiles(_t(spark, sf_dir, "lineitem"), "l_extendedprice", QS)


QUANTILES_SQL = f"""
WITH sorted AS (
  SELECT l_extendedprice AS value, ROW_NUMBER() OVER (ORDER BY l_extendedprice) AS rn
  FROM lineitem),
n AS (SELECT COUNT(*) AS c FROM lineitem),
qs(q) AS (VALUES {', '.join(f'({q})' for q in QS)})
SELECT CAST(q AS DOUBLE) AS q, value
FROM qs, n JOIN sorted ON sorted.rn = CAST(FLOOR((n.c - 1) * qs.q) AS BIGINT) + 1
ORDER BY q
"""


def weighted_median_price(spark, sf_dir):
    """EXACT weighted median (l_extendedprice weighted by l_quantity)
    with no single-partition window: pre-aggregate weight per distinct
    price (unique order keys — the prefix-sum contract), run the
    boundary-literal ``distributed_prefix_sum`` over the price order,
    and pick the first price whose inclusive cumulative weight crosses
    half the total. Everything is parallel in buckets; the only global
    ordering artifact is the O(buckets)-row offset table. Weights are
    integer-valued doubles, so every sum is exact in IEEE double in any
    summation order — both engines produce the identical crossing
    point (the determinism rule the repo's float-avoidance convention
    is about). The same machinery that packs training shards by token
    budget answers weighted-quantile analytics."""
    _ensure_shipped(spark)
    from ip_filter_spark.operators.aggregates import distributed_prefix_sum

    li = _t(spark, sf_dir, "lineitem")
    g = li.groupBy(F.col("l_extendedprice").alias("v")).agg(F.sum("l_quantity").alias("w"))
    ps = distributed_prefix_sum(g, "v", "w", out_col="cw", num_buckets=16)
    tw = float(g.agg(F.sum("w")).first()[0])
    return ps.where(F.col("cw") >= tw / 2).agg(
        F.lit(tw).alias("total_weight"),
        F.min("v").alias("weighted_median"),
    )


WEIGHTED_MEDIAN_SQL = """
WITH g AS (
  SELECT l_extendedprice AS v, SUM(l_quantity) AS w FROM lineitem GROUP BY v),
o AS (
  SELECT v, SUM(w) OVER (ORDER BY v) AS cw, SUM(w) OVER () AS tw FROM g)
SELECT CAST(MAX(tw) AS DOUBLE) AS total_weight,
       MIN(CASE WHEN cw >= tw / 2 THEN v END) AS weighted_median
FROM o
"""


def histogram_equi_depth_events(spark, sf_dir):
    """Exact 8-bucket equi-depth histogram of events.value — the
    optimizer-statistics histogram (uniform bucket COUNTS keep
    selectivity resolution where equi-width collapses). Formulated
    without a global-sort window: range-partition on (value, event_id)
    — a total order, so bucket assignment is engine-portable — then
    global rank = partition-local row_number + broadcast cumulative
    offsets, then NTILE's fencepost arithmetic inverted by floor; no
    single-task stage anywhere (operators/quantiles.py::
    equi_depth_histogram). Oracle: DuckDB NTILE over the same total
    order."""
    from ip_filter_spark.operators.quantiles import equi_depth_histogram

    ev = _t(spark, sf_dir, "events").select("value", "event_id")
    return equi_depth_histogram(ev, "value", 8, tie_col="event_id")


HISTOGRAM_EQUI_DEPTH_SQL = """
SELECT bucket, COUNT(*) AS cnt, MIN(value) AS lo, MAX(value) AS hi
FROM (SELECT CAST(NTILE(8) OVER (ORDER BY value, event_id) AS INT) AS bucket, value
      FROM events)
GROUP BY bucket
"""


def outliers_orders(spark, sf_dir):
    """Integer-exact z-score outlier counts per order priority — no
    float ever enters the comparison: with cents c (exact from the
    2-decimal source), n, S=Σc, Q=Σc², the test |c-μ| > kσ is the
    integer cross-product (n·c - S)² > k²·(n·Q - S²), at k = 1 and
    k = 3/2 (4·dev² > 9·var_n2 — the source distribution is
    near-uniform, whose max deviation is √3·σ ≈ 1.73σ, so 2σ+ cuts are
    vacuously zero). Decimal(38,0) arithmetic on the Spark side, HUGEINT
    in DuckDB — both exact at any SF that fits 38 digits (Q ~ 5.6e31 at
    sf100). The 5-row stats side is broadcast; one scan + one tiny
    shuffle."""
    o = _t(spark, sf_dir, "orders")
    c = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("decimal(20,0)")
    cents = o.select(F.col("o_orderpriority").alias("priority"), c.alias("c"))
    stats = cents.groupBy("priority").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("q"),
    )
    j = cents.join(F.broadcast(stats), "priority")
    nn = F.col("n").cast("decimal(38,0)")
    dev = nn * F.col("c") - F.col("s")
    dev2 = dev * dev
    var_n2 = nn * F.col("q") - F.col("s") * F.col("s")
    return (
        j.groupBy("priority", "n")
        .agg(
            F.sum((dev2 * 4 > var_n2 * 9).cast("long")).alias("n_outliers_k15"),
            F.sum((dev2 > var_n2).cast("long")).alias("n_outliers_k1"),
        )
        .select(
            "priority",
            F.col("n").alias("n_orders"),
            "n_outliers_k15",
            "n_outliers_k1",
        )
    )


OUTLIERS_SQL = """
WITH cents AS (
  SELECT o_orderpriority AS priority,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS HUGEINT) AS c
  FROM orders),
stats AS (
  SELECT priority, COUNT(*) AS n, SUM(c) AS s, SUM(c*c) AS q
  FROM cents GROUP BY priority)
SELECT priority, n AS n_orders,
       CAST(SUM(CASE WHEN 4 * (n*c - s)*(n*c - s) > 9 * (n*q - s*s) THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers_k15,
       CAST(SUM(CASE WHEN (n*c - s)*(n*c - s) > n*q - s*s THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers_k1
FROM cents JOIN stats USING (priority)
GROUP BY priority, n
"""


def covariance_exact_lineitem(spark, sf_dir):
    """Exact second-moment cross-statistics: per return flag, the
    covariance NUMERATOR n·Σxy − Σx·Σy for (quantity, price-cents) and
    (quantity, discount-percent) — pure integer arithmetic (quantity is
    integer-valued, money/rates are 2-decimal), so the result is exact
    at any SF. The numerator outgrows BIGINT around sf0.1, so it is
    emitted as a STRING of the exact integer (decimal(38,0) in Spark,
    HUGEINT in DuckDB — both print canonically). One scan, one 3-group
    aggregate; the cross-products fold map-side."""
    li = _t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(20,0)")
    p = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("decimal(20,0)")
    d = (F.col("l_discount").cast("decimal(18,2)") * 100).cast("decimal(20,0)")
    agg = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_items"),
        F.sum(q).alias("sq"),
        F.sum(p).alias("sp"),
        F.sum(d).alias("sd"),
        F.sum(q * p).alias("sqp"),
        F.sum(q * d).alias("sqd"),
    )
    nn = F.col("n_items").cast("decimal(38,0)")
    return agg.select(
        "l_returnflag",
        "n_items",
        (nn * F.col("sqp") - F.col("sq") * F.col("sp")).cast("string").alias("cov_qty_price_num"),
        (nn * F.col("sqd") - F.col("sq") * F.col("sd")).cast("string").alias("cov_qty_disc_num"),
    )


COVARIANCE_SQL = """
WITH c AS (
  SELECT l_returnflag,
         CAST(l_quantity AS HUGEINT) AS q,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS HUGEINT) AS p,
         CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS HUGEINT) AS d
  FROM lineitem),
agg AS (
  SELECT l_returnflag, COUNT(*) AS n_items,
         SUM(q) AS sq, SUM(p) AS sp, SUM(d) AS sd,
         SUM(q*p) AS sqp, SUM(q*d) AS sqd
  FROM c GROUP BY l_returnflag)
SELECT l_returnflag, n_items,
       CAST(n_items * sqp - sq * sp AS VARCHAR) AS cov_qty_price_num,
       CAST(n_items * sqd - sq * sd AS VARCHAR) AS cov_qty_disc_num
FROM agg
"""


def twap_value_by_type(spark, sf_dir):
    """Time-weighted value aggregation (the TWAP/observability shape):
    each event's value is weighted by the MICROSECONDS until the same
    user's next event (the interval the reading was 'current'; last
    reading weighs zero), then rolled up per event type. The weight
    comes from one lead window over the (user_id) sort. Precision
    discipline: value fits decimal(10,4) and a per-user gap fits
    decimal(14,0) (~116 days in micros), so the product is decimal(25,4)
    — EXACT; declaring the defaults (18,4)x(20,0) would push the product
    past precision 38 and Spark would silently round the SCALE
    (allowPrecisionLoss). The weighted sum carries ~20 significant
    digits — past double's 17 — so it surfaces as the exact decimal's
    STRING (both engines print plain fixed-scale decimals canonically);
    a double cast would differ in the last ulp between engines."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", "value", _epoch_us("ts").alias("t_us")
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    dt = (F.coalesce(F.lead("t_us").over(w), F.col("t_us")) - F.col("t_us")).alias("dt_us")
    weighted = ev.select("event_type", "value", dt)
    return weighted.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("dt_us").alias("total_dt_us"),
        F.sum(F.col("value").cast("decimal(10,4)") * F.col("dt_us").cast("decimal(14,0)"))
        .cast("string")
        .alias("value_time_product"),
    )


TWAP_SQL = """
WITH ev AS (
  SELECT user_id, event_type, event_id, value, epoch_us(ts) AS t_us FROM events),
dt AS (
  SELECT event_type, value,
         COALESCE(LEAD(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id), t_us) - t_us AS dt_us
  FROM ev)
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(dt_us) AS BIGINT) AS total_dt_us,
       CAST(SUM(CAST(value AS DECIMAL(10,4)) * CAST(dt_us AS DECIMAL(14,0))) AS VARCHAR) AS value_time_product
FROM dt GROUP BY event_type
"""


def daily_anomalies_events(spark, sf_dir):
    """Integer-exact sliding anomaly detection on the per-(type, day)
    count series: a day is anomalous when its count deviates from the
    TRAILING 7-day window by more than 2 trailing sigmas — tested as the
    integer cross-product (n·x − S)² > 4·(n·Q − S²) in decimal/HUGEINT,
    so no float enters the verdict (the sliding twin of
    outliers_orders). Scale shape: the window partitions by event_type
    over the DAY series — time-dimension cardinality (thousands of rows
    per type regardless of data volume), so the per-type sort is trivial
    by construction; the heavy lifting is the one groupBy producing the
    daily counts."""
    ev = _t(spark, sf_dir, "events").select(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("day"), "event_type"
    )
    daily = ev.groupBy("event_type", "day").agg(F.count("*").alias("x"))
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-7, -1)
    xd = F.col("x").cast("decimal(20,0)")
    stats = daily.select(
        "event_type",
        "day",
        "x",
        F.count("x").over(w).alias("n7"),
        F.sum(xd).over(w).alias("s7"),
        F.sum(xd * xd).over(w).alias("q7"),
    )
    n7d = F.col("n7").cast("decimal(38,0)")
    dev = n7d * xd - F.col("s7")
    var_n2 = n7d * F.col("q7") - F.col("s7") * F.col("s7")
    return stats.select(
        "event_type",
        "day",
        "x",
        "n7",
        F.col("s7").cast("long").alias("sum7"),
        ((F.col("n7") == 7) & (dev * dev > var_n2 * 4)).alias("is_anomaly"),
    )


DAILY_ANOMALIES_SQL = """
WITH daily AS (
  SELECT event_type, DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
         COUNT(*) AS x
  FROM events GROUP BY 1, 2),
stats AS (
  SELECT event_type, day, x,
         COUNT(x) OVER w AS n7,
         SUM(CAST(x AS HUGEINT)) OVER w AS s7,
         SUM(CAST(x AS HUGEINT) * x) OVER w AS q7
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
SELECT event_type, day, x, n7, CAST(s7 AS BIGINT) AS sum7,
       n7 = 7 AND (n7*x - s7)*(n7*x - s7) > 4 * (n7*q7 - s7*s7) AS is_anomaly
FROM stats
"""


def histogram_equi_width_events(spark, sf_dir):
    """Equi-WIDTH histogram (the fixed-bucket complement of the
    equi-depth gate): literal integer bounds from the known value
    domain, bucket = floor((v - lo) / w) clamped to [0, b-1] — a pure
    map-side expression + one tiny groupBy; the bucket arithmetic runs
    on CENTS (exact integers), so bucket assignment is bit-identical
    across engines with no float boundary ambiguity."""
    b, lo_c, hi_c = 20, 0, 100_000  # cents domain [0, 1000.00)
    width = (hi_c - lo_c) // b
    ev = _t(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    bucket = F.least(
        F.floor(F.greatest(cents - lo_c, F.lit(0)) / width), F.lit(b - 1)
    ).cast("int")
    return (
        ev.select(bucket.alias("bucket"), cents.alias("c"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("c").alias("min_cents"),
            F.max("c").alias("max_cents"),
        )
    )


HISTOGRAM_EQUI_WIDTH_SQL = """
WITH cents AS (
  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c FROM events),
b AS (
  SELECT c, LEAST(GREATEST(c - 0, 0) // 5000, 19) AS bucket FROM cents)
SELECT CAST(bucket AS INT) AS bucket, COUNT(*) AS n,
       MIN(c) AS min_cents, MAX(c) AS max_cents
FROM b GROUP BY bucket
"""


def percentile_cont_events(spark, sf_dir):
    """Interpolated (continuous) percentiles — the PERCENTILE_CONT
    convention both ANSI engines implement as rank (n-1)p with linear
    interpolation. Cross-engine float safety: values become integer
    CENTS first, so every interpolated result is a + (b-a)*frac with
    integer a,b and frac in {0, .25, .5, .75} — exactly representable,
    bit-identical in any IEEE engine. One grouped aggregate."""
    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    cents = F.round(F.col("value") * 100).cast("long")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.percentile(cents, F.lit(0.25)).alias("p25_cents"),
        F.percentile(cents, F.lit(0.5)).alias("p50_cents"),
        F.percentile(cents, F.lit(0.75)).alias("p75_cents"),
    )


PERCENTILE_CONT_SQL = """
SELECT event_type, COUNT(*) AS n,
       quantile_cont(CAST(ROUND(value * 100) AS BIGINT), 0.25) AS p25_cents,
       quantile_cont(CAST(ROUND(value * 100) AS BIGINT), 0.5) AS p50_cents,
       quantile_cont(CAST(ROUND(value * 100) AS BIGINT), 0.75) AS p75_cents
FROM events WHERE value IS NOT NULL GROUP BY event_type
"""


def mad_outliers_orders(spark, sf_dir):
    """Robust outlier detection by Median Absolute Deviation — the
    median-based companion to the z-score gate (immune to the outliers
    it hunts). Exactness: prices become integer cents, so the median is
    integer-or-half and every |cents − med| is exact in IEEE doubles;
    the MAD (a median of those) lands on quarters — all bit-identical
    across engines under the shared PERCENTILE_CONT convention. The
    plan is three passes over ONE pruned column with the two scalar
    medians broadcast back in-plan (no driver round-trip of data).
    Flag: deviation > 1.5 × MAD (the corpus prices are near-uniform,
    so max_dev ≈ 2·MAD — a 1.5 cut flags a real ~25% tail)."""
    orders = _t(spark, sf_dir, "orders")
    cents = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    med = cents.agg(F.percentile("cents", F.lit(0.5)).alias("med_cents"))
    dev = cents.crossJoin(F.broadcast(med)).select(
        "cents", "med_cents", F.abs(F.col("cents") - F.col("med_cents")).alias("dev")
    )
    mad = dev.groupBy("med_cents").agg(
        F.percentile("dev", F.lit(0.5)).alias("mad_cents"),
        F.count("*").alias("n"),
    )
    return (
        dev.crossJoin(F.broadcast(mad.select("mad_cents", "n")))
        .agg(
            F.first("n").alias("n"),
            F.first("med_cents").alias("med_cents"),
            F.first("mad_cents").alias("mad_cents"),
            F.sum((F.col("dev") > 1.5 * F.col("mad_cents")).cast("long")).alias(
                "n_outliers"
            ),
            F.max("dev").alias("max_dev"),
        )
    )


MAD_OUTLIERS_SQL = """
WITH cents AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
med AS (SELECT quantile_cont(cents, 0.5) AS med_cents FROM cents),
dev AS (
  SELECT cents, med_cents, ABS(cents - med_cents) AS dev
  FROM cents CROSS JOIN med),
mad AS (
  SELECT med_cents, quantile_cont(dev, 0.5) AS mad_cents, COUNT(*) AS n
  FROM dev GROUP BY med_cents)
SELECT mad.n AS n, mad.med_cents AS med_cents, mad.mad_cents AS mad_cents,
       CAST(SUM(CASE WHEN dev > 1.5 * mad.mad_cents THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers,
       MAX(dev) AS max_dev
FROM dev CROSS JOIN mad
GROUP BY mad.n, mad.med_cents, mad.mad_cents
"""


def interarrival_median_events(spark, sf_dir):
    """Per-user inter-arrival-time profile: exact median gap (µs)
    between a user's consecutive events, then the distribution of those
    medians across users. Ordering inside a user is total
    ((t_us, event_id)), so LAG is engine-independent; gaps are exact
    integer microseconds, medians land on halves, and the
    median-of-medians on quarters — all IEEE-exact. The per-user window
    shuffles once on user_id (parallel across users, no global
    window); the second aggregate runs over the users dimension."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", _epoch_us("ts").alias("t_us")
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    gaps = ev.withColumn("gap_us", F.col("t_us") - F.lag("t_us").over(w)).where(
        F.col("gap_us").isNotNull()
    )
    per_user = gaps.groupBy("user_id").agg(
        F.percentile("gap_us", F.lit(0.5)).alias("med_gap_us"),
        F.count("*").alias("n_gaps"),
    )
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.sum("n_gaps").alias("n_gaps_total"),
        F.min("med_gap_us").alias("min_med_us"),
        F.max("med_gap_us").alias("max_med_us"),
        F.percentile("med_gap_us", F.lit(0.5)).alias("p50_med_us"),
    )


INTERARRIVAL_MEDIAN_SQL = """
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t_us FROM events),
gaps AS (
  SELECT user_id,
         t_us - LAG(t_us) OVER (PARTITION BY user_id
                                ORDER BY t_us, event_id) AS gap_us
  FROM e),
per_user AS (
  SELECT user_id, quantile_cont(gap_us, 0.5) AS med_gap_us,
         COUNT(*) AS n_gaps
  FROM gaps WHERE gap_us IS NOT NULL GROUP BY user_id)
SELECT COUNT(*) AS n_users, CAST(SUM(n_gaps) AS BIGINT) AS n_gaps_total,
       MIN(med_gap_us) AS min_med_us, MAX(med_gap_us) AS max_med_us,
       quantile_cont(med_gap_us, 0.5) AS p50_med_us
FROM per_user
"""


def ols_exact_lineitem(spark, sf_dir):
    """Closed-form OLS (regression of discount on quantity per return
    flag) carried as EXACT integer cross-moments: slope = num/den with
    num = n*Sxy - Sx*Sy, den = n*Sxx - Sx^2 over integer-valued
    quantity and discount-in-cents — BIGINT-exact in both engines, no
    float fold-order anywhere in the gated values. The one float, each
    engine's NATIVE regr_slope aggregate, is checked against num/den to
    1e-9 inside that engine and shipped only as a boolean. One scan,
    map-side partial aggregation, no joins — the normal-equations shape
    that fits any X^T X at 100 TB (Frequent Directions' exact cousin,
    fd_embedding_gram)."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_quantity")).cast("long").alias("x"),
        F.round(F.col("l_discount") * 100).cast("long").alias("y"),
    )
    agg = li.groupBy("flag").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.regr_slope(F.col("y").cast("double"), F.col("x").cast("double")).alias("slope"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return agg.select(
        "flag",
        "n",
        num.alias("slope_num"),
        den.alias("slope_den"),
        (F.abs(F.col("slope") - num.cast("double") / den.cast("double")) < 1e-9).alias(
            "native_regr_agrees"
        ),
    )


OLS_EXACT_SQL = """
WITH xy AS (
  SELECT l_returnflag AS flag,
         CAST(ROUND(l_quantity) AS BIGINT) AS x,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS y
  FROM lineitem),
m AS (
  SELECT flag, CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x*y) AS sxy, SUM(x*x) AS sxx,
         regr_slope(CAST(y AS DOUBLE), CAST(x AS DOUBLE)) AS slope
  FROM xy GROUP BY flag)
SELECT flag, n,
       CAST(n*sxy - sx*sy AS BIGINT) AS slope_num,
       CAST(n*sxx - sx*sx AS BIGINT) AS slope_den,
       ABS(slope - CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)) < 1e-9
         AS native_regr_agrees
FROM m
"""


def benford_first_digit_orders(spark, sf_dir):
    """Benford first-significant-digit audit — the data-quality /
    fraud-screening profile: distribution of the leading digit of each
    order's exact cent value. The digit comes from the BIGINT's decimal
    string (first char), so both engines extract it from the identical
    integer — no float log10 tricks; the per-digit cent sum is the
    full-value checksum."""
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return (
        o.select(cents.alias("cents"))
        .withColumn("digit", F.substring(F.col("cents").cast("string"), 1, 1))
        .groupBy("digit")
        .agg(F.count("*").alias("n_orders"), F.sum("cents").alias("cents_sum"))
    )


BENFORD_SQL = """
SELECT substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
         AS digit,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents_sum
FROM orders GROUP BY 1
"""


def contingency_type_parity_events(spark, sf_dir):
    """Chi-square contingency sufficient statistics for independence of
    event_type x user-parity — the feature-selection / drift-detection
    primitive. Every gated value is an exact integer: per-cell observed
    count, row/column marginals, grand total, and the chi numerator root
    diff_num = O*N - row_total*col_total (the quantity whose square over
    N*E is the cell's chi-square term) — BIGINT-exact, so the gate needs
    no float tolerance. One scan builds the cells; marginals are
    broadcast back (cells <= |types| x 2 rows)."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 2).alias("parity")
    )
    cells = ev.groupBy("event_type", "parity").agg(F.count("*").alias("observed"))
    rows_t = cells.groupBy("event_type").agg(F.sum("observed").alias("row_total"))
    cols_t = cells.groupBy("parity").agg(F.sum("observed").alias("col_total"))
    n = cells.agg(F.sum("observed").alias("n"))
    return (
        cells.join(F.broadcast(rows_t), "event_type")
        .join(F.broadcast(cols_t), "parity")
        .crossJoin(F.broadcast(n))
        .select(
            "event_type",
            "parity",
            "observed",
            "row_total",
            "col_total",
            "n",
            (
                F.col("observed") * F.col("n")
                - F.col("row_total") * F.col("col_total")
            ).alias("diff_num"),
        )
    )


CONTINGENCY_SQL = """
WITH cells AS (SELECT event_type, user_id % 2 AS parity, COUNT(*) AS observed
               FROM events GROUP BY 1, 2),
rt AS (SELECT event_type, SUM(observed) AS row_total FROM cells GROUP BY 1),
ct AS (SELECT parity, SUM(observed) AS col_total FROM cells GROUP BY 1),
tot AS (SELECT SUM(observed) AS n FROM cells)
SELECT c.event_type, c.parity, c.observed,
       CAST(rt.row_total AS BIGINT) AS row_total,
       CAST(ct.col_total AS BIGINT) AS col_total,
       CAST(tot.n AS BIGINT) AS n,
       CAST(c.observed * tot.n - rt.row_total * ct.col_total AS BIGINT)
         AS diff_num
FROM cells c JOIN rt USING (event_type) JOIN ct USING (parity) CROSS JOIN tot
"""


def trimmed_mean_orders(spark, sf_dir):
    """Global 5%-trimmed statistics of order value — the robust-mean
    primitive (drop the k smallest and k largest, k = floor(0.05 n),
    then aggregate the middle). Needs every row's GLOBAL rank, which is
    ``distributed_prefix_sum`` counting 1s in (cents, o_orderkey) order
    (its fifth consumer) — never the single-partition ROW_NUMBER()
    OVER (ORDER BY ...) the oracle uses. All gated values are exact
    BIGINTs (kept count, kept cent sum, the trim bound k), so the
    trimmed mean is recoverable to full precision as sum/n by any
    consumer without a float ever deciding the gate."""
    from ip_filter_spark.operators.aggregates import distributed_prefix_sum

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    ranked = distributed_prefix_sum(
        o.withColumn("one", F.lit(1)),
        ["cents", "o_orderkey"],
        "one",
        out_col="rnk",
    )
    n = ranked.count()
    k = n * 5 // 100
    kept = ranked.where((F.col("rnk") > k) & (F.col("rnk") <= n - k))
    return kept.agg(
        F.count("*").alias("kept_n"),
        F.sum("cents").alias("kept_cents"),
        F.lit(k).cast("long").alias("trim_k"),
        F.min("cents").alias("lo_cents"),
        F.max("cents").alias("hi_cents"),
    )


TRIMMED_MEAN_SQL = """
WITH o AS (SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT)
             AS cents FROM orders),
r AS (SELECT cents, ROW_NUMBER() OVER (ORDER BY cents, o_orderkey) AS rnk,
             COUNT(*) OVER () AS n
      FROM o)
SELECT COUNT(*) AS kept_n, CAST(SUM(cents) AS BIGINT) AS kept_cents,
       CAST(MIN(n) * 5 // 100 AS BIGINT) AS trim_k,
       MIN(cents) AS lo_cents, MAX(cents) AS hi_cents
FROM r WHERE rnk > n * 5 // 100 AND rnk <= n - n * 5 // 100
"""


def decayed_type_counts_events(spark, sf_dir):
    """Time-decayed heavy hitters with EXACT integer arithmetic — the
    recency-weighted leaderboard (trending topics / hot keys) that rand
    or float-decay implementations can only approximate reproducibly.
    The decay is a power of two per whole day of age relative to the
    corpus max timestamp: weight(age_days) = 2^(H-1-age_days), H = 35 —
    so every weight is a BIGINT, the per-type decayed mass is an
    order-independent integer SUM, and both engines agree bit-for-bit
    (no float decay, no fold-order). age_days comes from integer
    microsecond division (DIV / //), so day boundaries can't ever
    round differently across engines.

    Shape at 100 TB: one scan + one groupBy over |event_type| keys —
    partial aggregation map-side, O(types) shuffle. Headroom: weights
    <= 2^(H-1); int64 overflows past ~2^63/2^34 = 2^29 rows per type at
    H = 35 — for larger corpora either raise the day granularity, lower
    H (older rows saturate to weight 0), or widen to DECIMAL(38,0); the
    gate documents the bound rather than silently wrapping."""
    H = 35
    ev = _t(spark, sf_dir, "events").select(
        "event_type", _epoch_us("ts").alias("us")
    )
    mx = ev.agg(F.max("us").alias("us_max"))
    # floor() pins the out-of-horizon semantics: age_days >= H gives a
    # fractional 2^negative that must become weight 0 in BOTH engines
    # (DuckDB CAST alone would round-half-even, Spark's would truncate)
    w = F.floor(
        F.pow(
            F.lit(2.0),
            (F.lit(H - 1) - F.expr("(us_max - us) div 86400000000")).cast(
                "double"
            ),
        )
    ).cast("long")
    per_type = (
        ev.crossJoin(F.broadcast(mx))
        .withColumn("w", w)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("w").alias("decayed_mass"),
        )
    )
    win = Window.orderBy(F.col("decayed_mass").desc(), F.col("event_type"))
    return per_type.select(
        "event_type",
        "n_events",
        "decayed_mass",
        F.row_number().over(win).cast("int").alias("rank"),
    )


DECAYED_COUNTS_SQL = """
WITH e AS (SELECT event_type, epoch_us(ts) AS us FROM events),
m AS (SELECT MAX(us) AS us_max FROM e),
w AS (SELECT event_type,
             CAST(floor(power(2, 34 - ((m.us_max - e.us) // 86400000000)))
                  AS BIGINT) AS w
      FROM e, m),
t AS (SELECT event_type, COUNT(*) AS n_events, SUM(w) AS decayed_mass
      FROM w GROUP BY 1)
SELECT event_type, CAST(n_events AS BIGINT) AS n_events,
       CAST(decayed_mass AS BIGINT) AS decayed_mass,
       CAST(ROW_NUMBER() OVER (ORDER BY decayed_mass DESC, event_type) AS INT)
         AS rank
FROM t
"""


def ks_statistic_events(spark, sf_dir):
    """Two-sample Kolmogorov–Smirnov statistic between the value
    distributions of 'click' and 'purchase' events — the
    distribution-drift / A-B-shift detector — in EXACT integer
    arithmetic: with cumulative counts C1, C2 and sizes n1, n2, the KS
    distance is max|C1/n1 − C2/n2| = max|C1·n2 − C2·n1| / (n1·n2), and
    the numerator is a BIGINT both engines compute bit-identically
    (values quantized to cents first; no float ECDFs anywhere). The
    gate also pins WHERE the max is attained (smallest cents at ties).

    Shape at 100 TB: one scan groups to the distinct-cents grid
    (bounded by the price grid, not row count), the two ECDFs are
    ``distributed_prefix_sum`` runs over that grid (no single-partition
    global window), and the argmax is a 1-row TakeOrdered. Overflow
    bound: C·n <= n1·n2 needs n1, n2 below ~3·10⁹ in int64 — past that,
    widen to DECIMAL(38,0) or compute per-stratum."""
    from ip_filter_spark.operators.aggregates import distributed_prefix_sum

    ev = _t(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    g = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    ).groupBy("cents").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
            "d1"
        ),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("d2"),
    )
    c = distributed_prefix_sum(g, "cents", "d1", out_col="c1")
    c = distributed_prefix_sum(c, "cents", "d2", out_col="c2")
    n = g.agg(
        F.sum("d1").cast("long").alias("n1"), F.sum("d2").cast("long").alias("n2")
    )
    scored = c.crossJoin(F.broadcast(n)).select(
        "n1",
        "n2",
        F.abs(
            F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1")
        ).alias("ks_num"),
        "cents",
    )
    return (
        scored.orderBy(F.col("ks_num").desc(), F.col("cents"))
        .limit(1)
        .select("n1", "n2", "ks_num", F.col("cents").alias("at_cents"))
    )


KS_STATISTIC_SQL = """
WITH e AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
           FROM events WHERE event_type IN ('click', 'purchase')),
g AS (SELECT cents,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS d1,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS d2
      FROM e GROUP BY 1),
c AS (SELECT cents, SUM(d1) OVER (ORDER BY cents) AS c1,
             SUM(d2) OVER (ORDER BY cents) AS c2
      FROM g),
t AS (SELECT SUM(d1) AS n1, SUM(d2) AS n2 FROM g)
SELECT CAST(t.n1 AS BIGINT) AS n1, CAST(t.n2 AS BIGINT) AS n2,
       CAST(ABS(c.c1 * t.n2 - c.c2 * t.n1) AS BIGINT) AS ks_num,
       c.cents AS at_cents
FROM c, t
ORDER BY ks_num DESC, at_cents
LIMIT 1
"""


def cusum_change_point_events(spark, sf_dir):
    """CUSUM change-point detection over the daily event-rate series of
    each event type — INTEGER-exact: the deviation of day d is scaled to
    x_d = c_d * D - T (count times #days minus total — an exact integer
    with mean exactly 0), and the one-sided CUSUM recursion
    S_d = max(0, S_{d-1} + x_d) is rewritten to its closed form
    S_d = P_d - min(0, min_{j<=d} P_j) over the running sum P — two
    window functions instead of an unexpressible recursion, identical in
    Spark and ANSI SQL. Output: per type, the argmax day (earliest on
    ties), the peak statistic, and the exact integer evidence (D, T).
    At 100 TB the daily pre-aggregation collapses the scan to O(types x
    days) rows before any window sees them — windows never run over raw
    events."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count("*").alias("c"))
    wt = Window.partitionBy("event_type")
    wo = Window.partitionBy("event_type").orderBy("day")
    daily = (
        daily.withColumn("D", F.count("*").over(wt))
        .withColumn("T", F.sum("c").over(wt))
        .withColumn("P", F.sum(F.col("c") * F.col("D") - F.col("T")).over(wo))
    )
    daily = daily.withColumn("S", F.col("P") - F.least(F.lit(0), F.min("P").over(wo)))
    pick = Window.partitionBy("event_type").orderBy(F.col("S").desc(), F.col("day").asc())
    return (
        daily.withColumn("__rn", F.row_number().over(pick))
        .where(F.col("__rn") == 1)
        .select(
            "event_type",
            F.col("day").alias("change_day"),
            F.col("S").cast("long").alias("cusum_peak"),
            F.col("D").cast("long").alias("n_days"),
            F.col("T").cast("long").alias("n_events"),
        )
    )


CUSUM_CHANGE_POINT_SQL = """
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS c
  FROM events GROUP BY 1, 2),
s AS (
  SELECT event_type, day,
         COUNT(*) OVER (PARTITION BY event_type) AS D,
         SUM(c) OVER (PARTITION BY event_type) AS T, c
  FROM daily),
p AS (
  SELECT event_type, day, D, T,
         SUM(c * D - T) OVER (PARTITION BY event_type ORDER BY day) AS P
  FROM s),
cu AS (
  SELECT event_type, day, D, T,
         P - LEAST(0, MIN(P) OVER (PARTITION BY event_type ORDER BY day)) AS S
  FROM p),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY S DESC, day ASC) AS rn
  FROM cu)
SELECT event_type, day AS change_day, CAST(S AS BIGINT) AS cusum_peak,
       CAST(D AS BIGINT) AS n_days, CAST(T AS BIGINT) AS n_events
FROM r WHERE rn = 1
"""


__all__ = [
    "quantiles_exact",
    "QUANTILES_SQL",
    "weighted_median_price",
    "WEIGHTED_MEDIAN_SQL",
    "histogram_equi_depth_events",
    "HISTOGRAM_EQUI_DEPTH_SQL",
    "outliers_orders",
    "OUTLIERS_SQL",
    "covariance_exact_lineitem",
    "COVARIANCE_SQL",
    "twap_value_by_type",
    "TWAP_SQL",
    "daily_anomalies_events",
    "DAILY_ANOMALIES_SQL",
    "histogram_equi_width_events",
    "HISTOGRAM_EQUI_WIDTH_SQL",
    "percentile_cont_events",
    "PERCENTILE_CONT_SQL",
    "mad_outliers_orders",
    "MAD_OUTLIERS_SQL",
    "interarrival_median_events",
    "INTERARRIVAL_MEDIAN_SQL",
    "ols_exact_lineitem",
    "OLS_EXACT_SQL",
    "benford_first_digit_orders",
    "BENFORD_SQL",
    "contingency_type_parity_events",
    "CONTINGENCY_SQL",
    "trimmed_mean_orders",
    "TRIMMED_MEAN_SQL",
    "decayed_type_counts_events",
    "DECAYED_COUNTS_SQL",
    "ks_statistic_events",
    "KS_STATISTIC_SQL",
    "cusum_change_point_events",
    "CUSUM_CHANGE_POINT_SQL",
]
