"""Behavioral event analytics gates: sessions, funnels, retention, as-of/range joins, set algebra, window shapes over events/orders/users.

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
    _t,
    _dec_sum,
    _epoch_us,
    _ensure_shipped,
)

# =====================================================================
# Events: heavy hitters, windows, distincts
# =====================================================================
def events_topk_exact(spark, sf_dir):
    from ip_filter_spark.operators.topk import exact_topk

    return exact_topk(_t(spark, sf_dir, "events"), "event_type", k=5)


EVENTS_TOPK_SQL = """
SELECT * FROM (
  SELECT event_type AS key, COUNT(*) AS cnt,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, event_type) AS rank
  FROM events GROUP BY event_type) WHERE rank <= 5
"""


def events_daily_counts(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type")
        .agg(F.count("*").alias("n"), _dec_sum(F.col("value"), "total_value"))
    )


EVENTS_DAILY_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
"""


def session_window_events(spark, sf_dir):
    """Spark's NATIVE gap-based session operator (F.session_window) —
    the streaming-capable form of operators/sessions.py: groupBy(key,
    session_window) merges events closer than the gap, window end =
    last event + gap. One shuffle; identical plan shape batch or
    streaming. Boundary differs from sessionize(): native merges iff
    strictly < gap (a gap of exactly 30 min starts a NEW session) —
    the oracle mirrors with >= at microsecond precision."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _t(spark, sf_dir, "events")
    g = ev.groupBy(
        "user_id", F.session_window(F.col("ts").cast("timestamp"), "30 minutes")
    ).agg(F.count("*").alias("n_events"))
    return g.select(
        "user_id",
        F.col("session_window.start").cast("long").alias("start_s"),
        F.col("session_window.end").cast("long").alias("end_s"),
        "n_events",
    )


def user_session_stats(spark, sf_dir):
    """Window-function coverage: per-user event ordering + gaps."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")  # NTZ→epoch must match duckdb's UTC epoch()
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = lambda c: F.col(c).cast("timestamp").cast("long")  # NTZ → epoch seconds
    gaps = ev.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "gap_s", F.when(F.col("prev_ts").isNotNull(), epoch("ts") - epoch("prev_ts"))
    )
    return gaps.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum("gap_s").alias("total_gap_s"),
        F.max("gap_s").alias("max_gap_s"),
    )


USER_SESSION_SQL = """
WITH g AS (
  SELECT user_id,
         CAST(FLOOR(epoch(ts)) AS BIGINT) - CAST(FLOOR(epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) AS gap_s
  FROM events)
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(gap_s) AS BIGINT) AS total_gap_s, MAX(gap_s) AS max_gap_s
FROM g GROUP BY user_id
"""


def session_stats_events(spark, sf_dir):
    """Gap-threshold sessionization (operators/sessions.py): new session
    after a >30 min gap; one window shuffle + one same-key aggregate."""
    from ip_filter_spark.operators.sessions import session_stats

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return session_stats(_t(spark, sf_dir, "events"), gap_s=1800)


SESSION_STATS_SQL = """
WITH e AS (
  SELECT user_id, event_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS t FROM events),
g AS (
  SELECT user_id, t,
         CASE WHEN t - LAG(t) OVER w IS NULL OR t - LAG(t) OVER w > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
s AS (
  SELECT user_id, t,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY t
                          ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM g)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       COUNT(*) AS n_events, MIN(t) AS start_s, MAX(t) AS end_s,
       MAX(t) - MIN(t) AS duration_s
FROM s GROUP BY user_id, session_idx
"""


def asof_join_events_orders(spark, sf_dir):
    """Backward as-of join (operators/joins.py::asof_join): each event
    matched to the user's latest order at or before the event. Union-scan
    form — |L|+|R| shuffle rows, one sort, three window expressions, no
    UDF. Right side pre-aggregated to one row per (custkey, orderdate)
    with max_by (as-of requires unique right (key, time))."""
    from ip_filter_spark.operators.joins import asof_join

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    od = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(
            F.max("o_orderkey").alias("o_orderkey"),
            F.max_by("o_totalprice", "o_orderkey").alias("o_totalprice"),
        )
    )
    j = asof_join(
        ev, od, "user_id", "o_custkey", "ts", "o_orderdate",
        ["o_orderkey", "o_totalprice"], matched_time_col="order_t",
    )
    ts_s = F.col("ts").cast("timestamp").cast("long")
    return j.select(
        "event_id", "user_id", ts_s.alias("ts_s"), "o_orderkey", "o_totalprice",
        (ts_s - F.col("order_t")).alias("age_s"),
    )


ASOF_SQL = """
WITH r AS (
  SELECT o_custkey, CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) AS ot,
         MAX(o_orderkey) AS o_orderkey,
         MAX_BY(o_totalprice, o_orderkey) AS o_totalprice
  FROM orders GROUP BY o_custkey, o_orderdate),
l AS (SELECT event_id, user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS t FROM events)
SELECT l.event_id, l.user_id, l.t AS ts_s, r.o_orderkey, r.o_totalprice,
       l.t - r.ot AS age_s
FROM l ASOF LEFT JOIN r ON l.user_id = r.o_custkey AND l.t >= r.ot
"""


def range_join_purchase_windows(spark, sf_dir):
    """Point-in-interval join (operators/joins.py::range_join): clicks
    and views landing within one hour after the same user's purchase.
    Bucketed equi-join rewrite — intervals explode to the coarse hour
    buckets they overlap, the join is a plain equi-join on
    (user, bucket), exact containment filtered post-join. No
    BroadcastNestedLoopJoin, partitioned by key AND time."""
    from ip_filter_spark.operators.joins import range_join

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type").isin("click", "view")).select(
        "event_id", "user_id", "ts", "event_type"
    )
    p_epoch = F.col("ts").cast("timestamp").cast("long")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        p_epoch.alias("p_start"),
        (p_epoch + 3600).alias("p_end"),
    )
    j = range_join(clicks, purchases, "user_id", "p_user", "ts", "p_start", "p_end", bucket_s=3600)
    ts_s = F.col("ts").cast("timestamp").cast("long")
    return j.select(
        "event_id", "user_id", ts_s.alias("ts_s"), "event_type", "purchase_id",
        F.col("p_start").alias("purchase_s"), (ts_s - F.col("p_start")).alias("delay_s"),
    )


def multimodal_features(spark, sf_dir):
    """Binary payload → Arrow feature extraction; the integer byte-bucket
    fold is exact, so DuckDB replicates it from sha256 hex pairs."""
    _ensure_shipped(spark)
    from ip_filter_spark.operators.multimodal import attach_fake_media, extract_features

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    feats = extract_features(attach_fake_media(d, "doc_id", kind="image"), dim=16)
    return feats.select("media_id", "kind", "n_bytes", F.element_at("raw_fold", 1).alias("fold0"))


MULTIMODAL_SQL = """
SELECT doc_id AS media_id, 'image' AS kind, CAST(32 AS INTEGER) AS n_bytes,
       CAST('0x' || substr(sha256('image' || CAST(doc_id AS VARCHAR)), 1, 2) AS BIGINT)
       + CAST('0x' || substr(sha256('image' || CAST(doc_id AS VARCHAR)), 3, 2) AS BIGINT) AS fold0
FROM documents WHERE doc_id < 100
"""


def funnel_conversion_events(spark, sf_dir):
    """Ordered conversion funnel (view -> click -> purchase) as an exact
    operator: per user, the first view, the first click strictly after
    that view, and the first purchase strictly after that click —
    FULL-VALUE per-user milestone timestamps vs a recursive-CTE-free SQL
    replica (each step is a join + min against the previous milestone,
    the same plan family both engines). Users that stall mid-funnel
    carry nulls from that step on."""
    _ensure_shipped(spark)
    from ip_filter_spark.operators.sessions import funnel_milestones

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _t(spark, sf_dir, "events")
    return funnel_milestones(ev, ["view", "click", "purchase"])


FUNNEL_SQL = """
WITH a AS (
  SELECT user_id, MIN(ts) AS t0 FROM events WHERE event_type = 'view' GROUP BY user_id),
b AS (
  SELECT e.user_id, MIN(e.ts) AS t1 FROM events e JOIN a ON e.user_id = a.user_id
  WHERE e.event_type = 'click' AND e.ts > a.t0 GROUP BY e.user_id),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN b ON e.user_id = b.user_id
  WHERE e.event_type = 'purchase' AND e.ts > b.t1 GROUP BY e.user_id)
SELECT u.user_id, a.t0, b.t1, c.t2
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN a ON u.user_id = a.user_id
LEFT JOIN b ON u.user_id = b.user_id
LEFT JOIN c ON u.user_id = c.user_id
"""


def sliding_quantiles_events(spark, sf_dir):
    """Rolling 7-day median of events.value — the quantile twin of
    ``sliding_distinct_users``, in pure SQL: ONE daily t-digest blob per
    day (one scan), then ``tds_merge OVER (ORDER BY day RANGE 6
    PRECEDING)`` slides the MERGE over the daily blobs and reads the
    median. Exact rolling quantiles are non-decomposable (each window
    must re-sort its rows); the sketch version touches each row once and
    each window merges ≤7 KB-sized blobs. The exact side (7× window
    replication + per-window order statistic) is ORACLE-TIER
    verification; the deployable operator is the daily-blob scan +
    windowed merge. Verified per window against the exact median and a
    0.01 + 1.5/c normalized-rank bound (sketch error + rank granularity
    — ramp-up windows are small), both computed distributedly."""
    _ensure_shipped(spark)
    from ip_filter_spark.functions.udaf import register_value_sketch_udafs

    register_value_sketch_udafs(spark, "tds", "tdigest", q=0.5, delta=200.0)
    ev = _t(spark, sf_dir, "events").withColumn(
        "day", F.datediff(F.to_date("ts"), F.lit("2024-01-01"))
    )
    ev.createOrReplaceTempView("udaf_ev_slq")
    est = spark.sql("""
      WITH daily AS (
        SELECT day, tds_agg(CAST(value AS DOUBLE)) AS blob
        FROM udaf_ev_slq GROUP BY day
      )
      SELECT day, tds_quantile(tds_merge(blob) OVER
               (ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)) AS est
      FROM daily
    """)
    # window membership: each row belongs to windows day..day+6 that EXIST
    days = ev.select("day").distinct()
    exploded = ev.select("day", "value").withColumn(
        "wday", F.explode(F.sequence(F.col("day"), F.col("day") + F.lit(6)))
    ).join(days.withColumnRenamed("day", "wday"), "wday", "left_semi")
    joined = exploded.select("wday", "value").join(
        F.broadcast(est.withColumnRenamed("day", "eday")), F.col("wday") == F.col("eday")
    )
    ranked = joined.groupBy("wday").agg(
        F.count("*").alias("c"),
        F.sum((F.col("value") <= F.col("est")).cast("long")).alias("r"),
    )
    w = Window.partitionBy("wday")
    exact = (
        exploded.select(
            "wday",
            F.col("value").alias("v"),
            F.row_number().over(w.orderBy("value")).alias("rn"),
            F.count("*").over(w).alias("c"),
        )
        .where(F.col("rn") == (F.floor((F.col("c") - 1) * 0.5) + 1))
        .select(F.col("wday").alias("day"), F.col("v").alias("exact_median"))
    )
    # 0.01 sketch bound + 1.5/c rank granularity: a PERFECT median sits
    # at |r/c - 0.5| = 1/(2c), which alone exceeds 0.01 for the small
    # ramp-up windows (day 0 holds one day's rows)
    bound = F.lit(0.01) + F.lit(1.5) / F.col("c")
    return (
        ranked.select(
            F.col("wday").alias("day"),
            (F.abs(F.col("r") / F.col("c") - 0.5) <= bound).alias("within_rank_bound"),
        )
        .join(exact, "day")
        .select("day", "exact_median", "within_rank_bound")
    )


SLIDING_QUANTILES_SQL = """
WITH evd AS (
  SELECT DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day, value
  FROM events
),
w AS (
  SELECT a.day AS day, b.value AS v
  FROM (SELECT DISTINCT day FROM evd) a
  JOIN evd b ON b.day BETWEEN a.day - 6 AND a.day
),
s AS (
  SELECT day, v, ROW_NUMBER() OVER (PARTITION BY day ORDER BY v) AS rn,
         COUNT(*) OVER (PARTITION BY day) AS c
  FROM w)
SELECT day, v AS exact_median, TRUE AS within_rank_bound
FROM s WHERE rn = CAST(FLOOR((c - 1) * 0.5) AS BIGINT) + 1
"""


def topk_per_group_events(spark, sf_dir):
    """Top-3 users per event_type by event count (ties by user_id) —
    the grouped top-k every analytics user writes weekly. The
    row_number()<=k form plans as WindowGroupLimit in Spark 4: each map
    task keeps only k rows per group BEFORE the exchange (a partial
    top-k, the same map-side-combine shape as Misra–Gries partials), so
    the shuffle carries O(groups x k) rows, not O(groups x users) —
    pinned in tests/test_plans.py."""
    counts = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("n"), F.asc("user_id"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("event_type", "user_id", "n", "rk")
    )


TOPK_PER_GROUP_SQL = """
WITH c AS (
  SELECT event_type, user_id, COUNT(*) AS n FROM events GROUP BY event_type, user_id
)
SELECT event_type, user_id, n,
       ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n DESC, user_id) AS rk
FROM c QUALIFY rk <= 3
"""


def retention_cohorts_events(spark, sf_dir):
    """Weekly cohort retention matrix — (cohort_week, week_offset,
    n_users) where cohort = the week of a user's FIRST event and a user
    counts toward offset k if active in cohort_week + k. The canonical
    product-analytics rollup. Scale shape: the first-event aggregate,
    the distinct-activity projection, and their join all key on user_id,
    so Catalyst reuses ONE hash partitioning across the three (no extra
    exchange for the join); rows after the join are already distinct per
    (user, week), so the final matrix is a plain count, not a
    count-distinct. Everything integer → hash-stable across engines."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("day")
    )
    first = ev.groupBy("user_id").agg(F.floor(F.min("day") / 7).alias("cohort_week"))
    active = ev.select("user_id", F.floor(F.col("day") / 7).alias("week")).distinct()
    return (
        active.join(first, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count("*").alias("n_users"))
    )


RETENTION_COHORTS_SQL = """
WITH ev AS (
  SELECT user_id, DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day
  FROM events),
first AS (SELECT user_id, MIN(day) // 7 AS cohort_week FROM ev GROUP BY user_id),
active AS (SELECT DISTINCT user_id, day // 7 AS week FROM ev)
SELECT cohort_week, week - cohort_week AS week_offset, COUNT(*) AS n_users
FROM active JOIN first USING (user_id)
GROUP BY cohort_week, week_offset
"""


def streaks_user_events(spark, sf_dir):
    """Gaps-and-islands: per-user longest consecutive-day activity
    streak, streak count, active-day count — all exact integers via the
    day - row_number() island id. One Exchange on user_id; every later
    stage reuses it."""
    from ip_filter_spark.operators.sequences import activity_islands

    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("day")
    )
    return activity_islands(ev, key="user_id", day_col="day")


STREAKS_SQL = """
WITH days AS (
  SELECT DISTINCT user_id,
         DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day
  FROM events),
isl AS (
  SELECT user_id, day,
         day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM days),
per_isl AS (SELECT user_id, grp, COUNT(*) AS len FROM isl GROUP BY 1, 2)
SELECT user_id, MAX(len) AS longest_streak, COUNT(*) AS n_streaks,
       CAST(SUM(len) AS BIGINT) AS n_active_days
FROM per_isl GROUP BY user_id
"""


def event_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences (lag window, deterministic event_id tie-break): transition
    counts + distinct users per transition. |types|² output — the final
    aggregate collapses map-side."""
    from ip_filter_spark.operators.sequences import transition_counts

    return transition_counts(_t(spark, sf_dir, "events"))


EVENT_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_state
  FROM events)
SELECT prev_state, event_type AS next_state, COUNT(*) AS n_transitions,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM seq WHERE prev_state IS NOT NULL
GROUP BY 1, 2
"""


def scd2_user_state_events(spark, sf_dir):
    """Slowly-changing-dimension Type 2 history build from a change log:
    collapse each user's consecutive identical event_type states, emit
    one row per state RUN with [valid_from, valid_to) micros and an
    is_current flag — the dimension-table twin of the CDC snapshot
    operators (operators/cdc.py). Two windows over ONE (user_id) sort
    order (lag to detect changes, lead for the closing edge), so
    Catalyst plans a single Exchange + sort. Timestamps surface as
    epoch MICROS (exact integers in both engines; second-truncation
    differs, micros never do)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", _epoch_us("ts").alias("t_us")
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    changes = ev.withColumn("prev_state", F.lag("event_type").over(w)).where(
        F.col("prev_state").isNull() | (F.col("prev_state") != F.col("event_type"))
    )
    w2 = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("t_us").alias("valid_from_us"),
        F.lead("t_us").over(w2).alias("valid_to_us"),
        F.lead("t_us").over(w2).isNull().alias("is_current"),
    )


SCD2_SQL = """
WITH ev AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS t_us FROM events),
changes AS (
  SELECT * FROM (
    SELECT user_id, event_type, event_id, t_us,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY t_us, event_id) AS prev_state
    FROM ev)
  WHERE prev_state IS NULL OR prev_state <> event_type)
SELECT user_id, event_type AS state, t_us AS valid_from_us,
       LEAD(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id) AS valid_to_us,
       LEAD(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id) IS NULL AS is_current
FROM changes
"""


def user_set_algebra_events(spark, sf_dir):
    """Exact set algebra over behavioral cohorts — the exact companion
    to kmv_user_overlap: |click|, |purchase|, intersection, differences,
    union, all from ONE per-user flag aggregate (no self-join, no
    distinct-of-distinct): groupBy(user) computes two 0/1 flags, the
    single-row rollup sums their products. Two Exchanges total, the
    second over 150-odd rows per partition of partials."""
    ev = _t(spark, sf_dir, "events")
    flags = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("c"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("p"),
    )
    return flags.agg(
        F.sum("c").alias("n_click"),
        F.sum("p").alias("n_purchase"),
        F.sum(F.col("c") * F.col("p")).alias("n_both"),
        F.sum(F.col("c") * (1 - F.col("p"))).alias("n_click_only"),
        F.sum(F.col("p") * (1 - F.col("c"))).alias("n_purchase_only"),
        F.sum(F.greatest("c", "p")).alias("n_either"),
    )


USER_SET_ALGEBRA_SQL = """
WITH flags AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
  FROM events GROUP BY user_id)
SELECT CAST(SUM(c) AS BIGINT) AS n_click,
       CAST(SUM(p) AS BIGINT) AS n_purchase,
       CAST(SUM(c * p) AS BIGINT) AS n_both,
       CAST(SUM(c * (1 - p)) AS BIGINT) AS n_click_only,
       CAST(SUM(p * (1 - c)) AS BIGINT) AS n_purchase_only,
       CAST(SUM(GREATEST(c, p)) AS BIGINT) AS n_either
FROM flags
"""


def mode_event_type_per_user(spark, sf_dir):
    """Exact per-group mode with a deterministic tie-break: each user's
    most frequent event type (count desc, then type asc), plus its count
    and the user's type diversity. The rank-1 filter plans as
    WindowGroupLimit — Spark pushes the k=1 limit into the sort, so no
    group ever materializes fully sorted output. The diversity count
    rides the SAME window partitioning (unbounded count over user_id),
    so the whole query is the counts groupBy + one window Exchange —
    no join."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    w = Window.partitionBy("user_id").orderBy(F.col("c").desc(), "event_type")
    wu = Window.partitionBy("user_id")
    ranked = counts.select(
        "user_id",
        "event_type",
        "c",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wu).alias("n_types"),
    )
    return ranked.where(F.col("rn") == 1).select(
        "user_id",
        F.col("event_type").alias("top_type"),
        F.col("c").alias("top_count"),
        "n_types",
    )


MODE_PER_USER_SQL = """
WITH counts AS (
  SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY 1, 2),
ranked AS (
  SELECT user_id, event_type, c,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY c DESC, event_type) AS rn
  FROM counts),
nt AS (SELECT user_id, COUNT(*) AS n_types FROM counts GROUP BY user_id)
SELECT r.user_id, r.event_type AS top_type, r.c AS top_count, nt.n_types
FROM ranked r JOIN nt USING (user_id) WHERE r.rn = 1
"""


def attribution_last_touch_events(spark, sf_dir):
    """Last-touch marketing attribution: each purchase is credited to
    the user's most recent NON-purchase event within a 7-day lookback
    ('none' otherwise), rolled up per channel with exact counts and a
    decimal-exact value sum. The credit comes from ONE pass — a
    last(..., ignorenulls=True) over the unbounded-preceding frame of
    the (user_id) sort (both engines implement IGNORE NULLS windows
    identically; verified) — no self-join, no as-of shuffle: the same
    user_id Exchange serves the window and nothing else moves."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", "value", _epoch_us("ts").alias("t_us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    non_purchase = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    np_ts = F.when(F.col("event_type") != "purchase", F.col("t_us"))
    attributed = ev.select(
        "user_id",
        "event_type",
        "value",
        "t_us",
        F.last(non_purchase, ignorenulls=True).over(w).alias("prev_type"),
        F.last(np_ts, ignorenulls=True).over(w).alias("prev_t_us"),
    ).where(F.col("event_type") == "purchase")
    lookback_us = 7 * 24 * 3600 * 1_000_000
    channel = F.when(
        F.col("prev_t_us").isNotNull()
        & (F.col("t_us") - F.col("prev_t_us") <= lookback_us),
        F.col("prev_type"),
    ).otherwise(F.lit("none"))
    return attributed.groupBy(channel.alias("channel")).agg(
        F.count("*").alias("n_purchases"),
        F.countDistinct("user_id").alias("n_users"),
        _dec_sum(F.col("value"), "total_value"),
    )


ATTRIBUTION_SQL = """
WITH ev AS (
  SELECT user_id, event_type, event_id, value, epoch_us(ts) AS t_us FROM events),
att AS (
  SELECT user_id, event_type, value, t_us,
         LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY t_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_type,
         LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN t_us END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY t_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_t_us
  FROM ev)
SELECT CASE WHEN prev_t_us IS NOT NULL AND t_us - prev_t_us <= CAST(604800000000 AS BIGINT)
            THEN prev_type ELSE 'none' END AS channel,
       COUNT(*) AS n_purchases,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM att WHERE event_type = 'purchase'
GROUP BY 1
"""


def full_outer_user_reconcile(spark, sf_dir):
    """FULL OUTER reconciliation — the one join type no other gate
    exercises: per-user click stats vs purchase stats, keeping users who
    only ever did one of the two (NULL-filled side), with presence flags
    and zero-coalesced counts. Both inputs aggregate on user_id first,
    so the outer join joins two already-partitioned inputs on their own
    keys — Catalyst reuses one hash partitioning, no extra Exchange."""
    ev = _t(spark, sf_dir, "events")
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_clicks"))
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_purchases"), _dec_sum(F.col("value"), "purchase_value"))
    )
    j = clicks.join(purchases, "user_id", "full_outer")
    return j.select(
        "user_id",
        F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
        F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
        F.col("n_clicks").isNotNull().alias("has_clicks"),
        F.col("n_purchases").isNotNull().alias("has_purchases"),
        F.coalesce("purchase_value", F.lit(0.0)).alias("purchase_value"),
    )


FULL_OUTER_SQL = """
WITH c AS (
  SELECT user_id, COUNT(*) AS n_clicks FROM events
  WHERE event_type = 'click' GROUP BY user_id),
p AS (
  SELECT user_id, COUNT(*) AS n_purchases,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id)
SELECT COALESCE(c.user_id, p.user_id) AS user_id,
       COALESCE(n_clicks, 0) AS n_clicks,
       COALESCE(n_purchases, 0) AS n_purchases,
       n_clicks IS NOT NULL AS has_clicks,
       n_purchases IS NOT NULL AS has_purchases,
       COALESCE(purchase_value, 0.0) AS purchase_value
FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
"""


def price_range_window_orders(spark, sf_dir):
    """RANGE-frame window on a VALUE ordering (every other window gate
    frames on rows or on time): for each order, how many same-priority
    orders fall within ±$100 of its price — the literal RANGE BETWEEN
    10000 PRECEDING AND 10000 FOLLOWING over exact cents. Price ties get
    identical frames by definition of RANGE (peer rows), which is why
    the frame must be value-based, not ROWS. One Exchange on priority;
    the in-partition frame scan is the two-pointer sweep both engines
    implement."""
    o = _t(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    w = Window.partitionBy("priority").orderBy("cents").rangeBetween(-10_000, 10_000)
    return o.select(
        F.col("o_orderkey"),
        F.col("o_orderpriority").alias("priority"),
        cents.alias("cents"),
    ).withColumn("n_within_100", F.count("*").over(w))


PRICE_RANGE_WINDOW_SQL = """
WITH c AS (
  SELECT o_orderkey, o_orderpriority AS priority,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders)
SELECT o_orderkey, priority, cents,
       COUNT(*) OVER (PARTITION BY priority ORDER BY cents
                      RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING) AS n_within_100
FROM c
"""


def user_event_type_sets(spark, sf_dir):
    """Set-valued aggregation surface: per-user DISTINCT event-type set.
    ``collect_set`` returns in arbitrary (partition-dependent) order, so
    the gate pins the determinism discipline: ``array_sort`` before
    ``array_join`` — the sorted-CSV form is stable across engines,
    partitionings, and cluster sizes. One groupBy; the set is bounded by
    |event types|."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("types_csv"),
        F.countDistinct("event_type").alias("n_types"),
    )


USER_EVENT_TYPE_SETS_SQL = """
SELECT user_id,
       array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_csv,
       COUNT(DISTINCT event_type) AS n_types
FROM events GROUP BY user_id
"""


def wow_change_events(spark, sf_dir):
    """Period-over-period reporting: weekly event counts per type with
    the previous week's count and the integer delta (LAG over an
    aggregated series — the window runs over the TINY weeks x types
    dimension, after the one heavy groupBy collapses map-side).
    date_trunc('week') is ISO-Monday in both engines; weeks surface as
    date strings and deltas as exact integers."""
    ev = _t(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts")).cast("date").cast("string")
    weekly = ev.groupBy(F.col("event_type"), week.alias("week")).agg(
        F.count("*").alias("n_events")
    )
    w = Window.partitionBy("event_type").orderBy("week")
    return weekly.select(
        "event_type",
        "week",
        "n_events",
        F.lag("n_events").over(w).alias("prev_week_events"),
        (F.col("n_events") - F.coalesce(F.lag("n_events").over(w), F.lit(0))).alias(
            "delta"
        ),
    )


WOW_CHANGE_SQL = """
WITH weekly AS (
  SELECT event_type,
         CAST(CAST(date_trunc('week', ts) AS DATE) AS VARCHAR) AS week,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2)
SELECT event_type, week, n_events,
       LAG(n_events) OVER w AS prev_week_events,
       n_events - COALESCE(LAG(n_events) OVER w, 0) AS delta
FROM weekly WINDOW w AS (PARTITION BY event_type ORDER BY week)
"""


def ntile_user_activity(spark, sf_dir):
    """Equal-frequency user segmentation: NTILE(10) deciles over
    per-user event counts (total order: count desc, user_id — NTILE's
    larger-buckets-first semantics is identical in both engines only
    under a total order). Returns per-decile population and exact
    activity bounds; the window runs over the already-aggregated
    user dimension, not raw events."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count("*").alias("n_events"))
    w = Window.orderBy(F.desc("n_events"), F.asc("user_id"))
    return (
        per_user.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("n_events").alias("sum_events"),
            F.min("n_events").alias("min_events"),
            F.max("n_events").alias("max_events"),
        )
        .orderBy("decile")
    )


NTILE_USER_ACTIVITY_SQL = """
WITH per_user AS (
  SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id),
deciled AS (
  SELECT *, NTILE(10) OVER (ORDER BY n_events DESC, user_id ASC) AS decile
  FROM per_user)
SELECT CAST(decile AS INTEGER) AS decile, COUNT(*) AS n_users,
       CAST(SUM(n_events) AS BIGINT) AS sum_events,
       MIN(n_events) AS min_events, MAX(n_events) AS max_events
FROM deciled GROUP BY decile ORDER BY decile
"""


def basket_pairs_lineitem(spark, sf_dir):
    """Market-basket mining (frequent co-purchased part pairs) with the
    apriori prune that makes it survive 100x: items are deduped per
    basket, infrequent items (support < 5 baskets) are dropped BEFORE
    the pair join — the frequent-item list is tiny and broadcast, so the
    only shuffle is the per-basket self-join, and TPC-H baskets are <= 7
    items so its fanout is bounded per row. Lift is reported in exact
    integer millionths via floor division (identical in both engines);
    top-25 is fully tie-broken (count desc, p1, p2)."""
    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = items.select("l_orderkey").distinct().count()
    freq = (
        items.groupBy("l_partkey")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= 5)
    )
    i1 = items.join(F.broadcast(freq), "l_partkey").select(
        "l_orderkey", F.col("l_partkey").alias("p1"), F.col("c").alias("c1")
    )
    i2 = items.join(F.broadcast(freq), "l_partkey").select(
        "l_orderkey", F.col("l_partkey").alias("p2"), F.col("c").alias("c2")
    )
    pairs = (
        i1.join(i2, "l_orderkey")
        .where(F.col("p1") < F.col("p2"))
        .groupBy("p1", "c1", "p2", "c2")
        .agg(F.count("*").alias("pair_count"))
        .where(F.col("pair_count") >= 2)
    )
    return (
        pairs.select(
            "p1",
            "p2",
            "pair_count",
            F.expr(f"(1000000 * pair_count * {int(n_orders)}) div (c1 * c2)").alias(
                "lift_ppm"
            ),
        )
        .orderBy(F.desc("pair_count"), F.asc("p1"), F.asc("p2"))
        .limit(25)
    )


BASKET_PAIRS_SQL = """
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM items),
freq AS (SELECT l_partkey, COUNT(*) AS c FROM items GROUP BY 1 HAVING COUNT(*) >= 5),
pairs AS (
  SELECT i1.l_partkey AS p1, f1.c AS c1, i2.l_partkey AS p2, f2.c AS c2,
         COUNT(*) AS pair_count
  FROM items i1
  JOIN items i2 ON i1.l_orderkey = i2.l_orderkey AND i1.l_partkey < i2.l_partkey
  JOIN freq f1 ON f1.l_partkey = i1.l_partkey
  JOIN freq f2 ON f2.l_partkey = i2.l_partkey
  GROUP BY 1, 2, 3, 4 HAVING COUNT(*) >= 2)
SELECT p1, p2, CAST(pair_count AS BIGINT) AS pair_count,
       (1000000 * pair_count * (SELECT n_orders FROM n)) // (c1 * c2) AS lift_ppm
FROM pairs ORDER BY pair_count DESC, p1, p2 LIMIT 25
"""


def cumulative_new_users_daily(spark, sf_dir):
    """User-acquisition curve: first-seen day per user, daily new-user
    counts, and the running cumulative total. Two shuffles (per-user min,
    per-day count); the cumulative window runs over the O(days) daily
    rollup, so its single-partition sort is bounded by the calendar, not
    the data. events.ts is TIMESTAMP_NTZ — ``to_date`` is
    timezone-independent on it in both engines."""
    ev = _t(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("day"))
    daily = first.groupBy("day").agg(F.count("*").alias("new_users"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        F.col("day").cast("string").alias("day"),
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
    )


CUMULATIVE_NEW_USERS_SQL = """
WITH first AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS day FROM events GROUP BY 1),
daily AS (SELECT day, COUNT(*) AS new_users FROM first GROUP BY 1)
SELECT STRFTIME(day, '%Y-%m-%d') AS day, new_users,
       CAST(SUM(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_users
FROM daily
"""


def densify_daily_counts_events(spark, sf_dir):
    """Calendar gap-filling (time-series densification) — the reporting
    op every dashboard needs: a day with zero events must appear as an
    explicit zero row, and any trailing-window aggregate computed over
    the SPARSE series is silently wrong wherever gaps exist (6 physical
    predecessor rows are not 6 calendar days). Dense calendar = distinct
    types × explode(sequence(lo, hi)) — both sides post-aggregation
    tiny, so the cross join and the left join back onto the daily
    series broadcast; the heavy input is touched once by the groupBy.
    Over the dense series ROWS BETWEEN 6 PRECEDING equals the 7-day
    trailing calendar sum, exactly (BIGINT counts)."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n")
    )
    bounds = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    cal = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("day"),
        )
    )
    dense = cal.join(F.broadcast(daily), ["event_type", "day"], "left").withColumn(
        "n", F.coalesce("n", F.lit(0))
    )
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    return dense.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        F.sum("n").over(w).cast("long").alias("trailing_7d"),
    )


DENSIFY_DAILY_SQL = """
WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
               FROM events GROUP BY 1, 2),
b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
cal AS (SELECT t.event_type, CAST(gs.g AS DATE) AS day
        FROM (SELECT DISTINCT event_type FROM events) t,
             (SELECT unnest(generate_series(lo::TIMESTAMP, hi::TIMESTAMP,
                                            INTERVAL 1 DAY)) AS g FROM b) gs),
dense AS (SELECT c.event_type, c.day, COALESCE(d.n, 0) AS n
          FROM cal c LEFT JOIN daily d USING (event_type, day))
SELECT strftime(day, '%Y-%m-%d') AS day, event_type, CAST(n AS BIGINT) AS n_events,
       CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY day
                         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS trailing_7d
FROM dense
"""


def rfm_segments_orders(spark, sf_dir):
    """RFM customer segmentation (recency / frequency / monetary
    quartiles) — the classic marketing-analytics cube — with every
    NTILE computed by ``distributed_ntile``: ANSI NTILE's exact
    first-tiles-larger size discipline derived from a two-phase
    distributed rank, never Spark's single-partition global window
    (three of those here would funnel the customer roster through one
    task three times). The oracle uses DuckDB's NATIVE NTILE, so the
    gate proves the distributed formula ≡ the ANSI function row for
    row. Money is exact cents (round-then-cast, engine-matched);
    tie-breaks on o_custkey make each ordering total, which NTILE
    reproducibility requires in any engine."""
    from ip_filter_spark.operators.aggregates import distributed_ntile

    o = _t(spark, sf_dir, "orders")
    ref = F.broadcast(o.agg(F.max(F.to_date("o_orderdate")).alias("refd")))
    c = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("last_d"),
            F.count("*").alias("freq"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
        )
        .crossJoin(ref)
        .withColumn("rec_days", F.datediff("refd", "last_d"))
        .withColumn("neg_freq", -F.col("freq"))
        .withColumn("neg_cents", -F.col("cents"))
    )
    c = distributed_ntile(c, ["rec_days", "o_custkey"], 4, out_col="r")
    c = distributed_ntile(c, ["neg_freq", "o_custkey"], 4, out_col="f")
    c = distributed_ntile(c, ["neg_cents", "o_custkey"], 4, out_col="m")
    return c.groupBy("r", "f", "m").agg(
        F.count("*").alias("n_customers"),
        F.sum("cents").alias("total_cents"),
    )


RFM_SEGMENTS_SQL = """
WITH ref AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS refd FROM orders),
c AS (SELECT o_custkey,
        date_diff('day', MAX(CAST(o_orderdate AS DATE)), (SELECT refd FROM ref))
          AS rec_days,
        COUNT(*) AS freq,
        CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1),
s AS (SELECT cents,
        NTILE(4) OVER (ORDER BY rec_days, o_custkey) AS r,
        NTILE(4) OVER (ORDER BY freq DESC, o_custkey) AS f,
        NTILE(4) OVER (ORDER BY cents DESC, o_custkey) AS m
      FROM c)
SELECT r, f, m, COUNT(*) AS n_customers, CAST(SUM(cents) AS BIGINT) AS total_cents
FROM s GROUP BY 1, 2, 3
"""


def bitmap_activity_users(spark, sf_dir):
    """Bitmap-index rollup — per-user day-of-month activity as one
    BIGINT bitmask folded with the ``bit_or`` aggregate (the roaring/
    bitmap-index pattern: set membership over a small ordinal domain
    becomes bitwise OR, associative + commutative so map-side partials
    and any merge tree give the identical mask), then ``bit_count``
    popcount buckets users by active-day count. Pure JVM integer ops,
    one shuffle on user_id; the mask SUM is an exact full-value
    checksum of every user's exact bitmap."""
    ev = _t(spark, sf_dir, "events")
    m = ev.groupBy("user_id").agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), dayofmonth(ts) - 1)")
        ).alias("mask")
    )
    return m.groupBy(F.bit_count("mask").alias("n_active_days")).agg(
        F.count("*").alias("n_users"),
        F.sum("mask").alias("mask_sum"),
    )


BITMAP_ACTIVITY_SQL = """
WITH m AS (SELECT user_id,
             bit_or(1::BIGINT << (CAST(strftime(ts, '%d') AS INT) - 1)) AS mask
           FROM events GROUP BY user_id)
SELECT CAST(bit_count(mask) AS INT) AS n_active_days, COUNT(*) AS n_users,
       CAST(SUM(mask) AS BIGINT) AS mask_sum
FROM m GROUP BY 1
"""


def collapse_consecutive_events(spark, sf_dir):
    """Consecutive-duplicate collapse — the ordered-stream compaction
    op (CDC echo suppression, sensor debounce): within each user's
    timeline drop every event whose type equals the immediately
    preceding one, keeping only state CHANGES. LAG over (user, ts,
    event_id) — partitioned by user, so the window is parallel, no
    global sort; (ts, event_id) makes the order total and both engines
    see the identical predecessor. Gated per event_type with an exact
    event_id checksum over the kept rows, so one mis-kept row anywhere
    flips the gate."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    kept = ev.withColumn("prev", F.lag("event_type").over(w)).where(
        F.col("prev").isNull() | (F.col("prev") != F.col("event_type"))
    )
    return kept.groupBy("event_type").agg(
        F.count("*").alias("n_kept"),
        F.sum("event_id").alias("id_checksum"),
    )


COLLAPSE_CONSECUTIVE_SQL = """
WITH o AS (SELECT event_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev
           FROM events)
SELECT event_type, COUNT(*) AS n_kept, CAST(SUM(event_id) AS BIGINT) AS id_checksum
FROM o WHERE prev IS NULL OR prev <> event_type GROUP BY 1
"""


def pareto_abc_customers(spark, sf_dir):
    """ABC / Pareto (80-15-5) classification — the inventory-analytics
    staple: customers ranked by revenue, class A while the running
    revenue share stays ≤ 80%, B ≤ 95%, else C. The running share is a
    global cumulative sum in (revenue DESC, custkey) order — computed
    with ``distributed_prefix_sum`` on the composite key (its third
    consumer), never the single-partition global window; class
    boundaries compare exact BIGINTs (cum·100 vs total·80) so no float
    share ever decides a class. The oracle replays the identical window
    algebra with native SUM() OVER."""
    from ip_filter_spark.operators.aggregates import distributed_prefix_sum

    o = _t(spark, sf_dir, "orders")
    c = (
        o.groupBy("o_custkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
        .withColumn("neg_cents", -F.col("cents"))
    )
    cum = distributed_prefix_sum(c, ["neg_cents", "o_custkey"], "cents", out_col="cum")
    total = F.broadcast(c.agg(F.sum("cents").alias("total")))
    cls = (
        F.when(F.col("cum") * 100 <= F.col("total") * 80, "A")
        .when(F.col("cum") * 100 <= F.col("total") * 95, "B")
        .otherwise("C")
    )
    return (
        cum.crossJoin(total)
        .withColumn("abc", cls)
        .groupBy("abc")
        .agg(F.count("*").alias("n_customers"), F.sum("cents").alias("class_cents"))
    )


PARETO_ABC_SQL = """
WITH c AS (SELECT o_custkey,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
           FROM orders GROUP BY 1),
cum AS (SELECT cents,
          SUM(cents) OVER (ORDER BY cents DESC, o_custkey) AS cum,
          SUM(cents) OVER () AS total
        FROM c)
SELECT CASE WHEN cum * 100 <= total * 80 THEN 'A'
            WHEN cum * 100 <= total * 95 THEN 'B' ELSE 'C' END AS abc,
       COUNT(*) AS n_customers, CAST(SUM(cents) AS BIGINT) AS class_cents
FROM cum GROUP BY 1
"""


def max_concurrent_events(spark, sf_dir):
    """Global maximum concurrency of 30-minute event intervals — the
    sweep-line classic (peak concurrent sessions / connections / jobs):
    +1 at open, -1 at close, maximum of the GLOBAL running sum in
    (time, delta, id) order with closes sorting before opens at equal
    time (half-open [t, t+30m) semantics). The running sum is
    ``distributed_prefix_sum`` (its fourth consumer) — a two-phase scan
    with literal quantile boundaries, NOT the single-partition global
    window ``SUM() OVER (ORDER BY ...)`` that funnels every sweep point
    through one task; the oracle IS that native window form."""
    from ip_filter_spark.operators.aggregates import distributed_prefix_sum

    ev = _t(spark, sf_dir, "events").select(
        "event_id", _epoch_us("ts").alias("t_us")
    )
    opens = ev.select(
        F.col("t_us").alias("sweep_us"), F.lit(1).alias("delta"), "event_id"
    )
    closes = ev.select(
        (F.col("t_us") + 1_800_000_000).alias("sweep_us"),
        F.lit(-1).alias("delta"),
        "event_id",
    )
    cum = distributed_prefix_sum(
        opens.unionAll(closes), ["sweep_us", "delta", "event_id"], "delta",
        out_col="cum",
    )
    return cum.agg(
        F.max("cum").cast("long").alias("max_concurrent"),
        (F.count("*") / 2).cast("long").alias("n_intervals"),
    )


MAX_CONCURRENT_SQL = """
WITH iv AS (SELECT event_id, epoch_us(ts) AS o, epoch_us(ts) + 1800000000 AS c
            FROM events),
sw AS (SELECT o AS t, 1 AS d, event_id FROM iv
       UNION ALL SELECT c, -1, event_id FROM iv),
r AS (SELECT SUM(d) OVER (ORDER BY t, d, event_id) AS cum FROM sw)
SELECT CAST(MAX(cum) AS BIGINT) AS max_concurrent,
       CAST((SELECT COUNT(*) FROM iv) AS BIGINT) AS n_intervals
FROM r
"""


def argmax_daily_event_users(spark, sf_dir):
    """Per-(user, day) argmax — WHICH event carried the day's peak value
    (last-touch/peak-touch attribution at row grain). Engine shape is
    ``max(struct(cents, -event_id))``: an associative+commutative
    aggregate with map-side partials and NO per-group sort — at 100 TB
    this is one combine-enabled shuffle, where the window form
    (ROW_NUMBER ... ORDER BY value DESC) the oracle uses must fully sort
    every group. Ties on cents break to the SMALLEST event_id via the
    negated id in the struct, making the argmax total and both engines
    deterministic."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("day"),
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    best = ev.groupBy("user_id", "day").agg(
        F.max(F.struct(F.col("cents"), (-F.col("event_id")).alias("neg_id")))
        .alias("b"),
        F.count("*").alias("n_events"),
    )
    return best.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        (-F.col("b.neg_id")).alias("best_event_id"),
        F.col("b.cents").alias("best_cents"),
        "n_events",
    )


ARGMAX_DAILY_SQL = """
WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents FROM events),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, day
             ORDER BY cents DESC, event_id ASC) AS rn,
             COUNT(*) OVER (PARTITION BY user_id, day) AS n_events
      FROM e)
SELECT user_id, strftime(day, '%Y-%m-%d') AS day, event_id AS best_event_id,
       cents AS best_cents, CAST(n_events AS BIGINT) AS n_events
FROM r WHERE rn = 1
"""


def asof_forward_join_events_orders(spark, sf_dir):
    """FORWARD as-of join: each event matched to the user's NEXT order
    at or after the event (pandas merge_asof ``direction='forward'``) —
    the 'time to next conversion' attribution shape. Same union-scan
    operator as the backward gate (|L|+|R| shuffle rows, one Exchange,
    no join node) with the mirrored (currentRow, unboundedFollowing)
    frame and ``first(ignorenulls)`` carry. Oracle: DuckDB's native
    ASOF accepts the <= inequality and picks the smallest matching
    right time."""
    from ip_filter_spark.operators.joins import asof_join

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    od = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(
            F.max("o_orderkey").alias("o_orderkey"),
            F.max_by("o_totalprice", "o_orderkey").alias("o_totalprice"),
        )
    )
    j = asof_join(
        ev, od, "user_id", "o_custkey", "ts", "o_orderdate",
        ["o_orderkey", "o_totalprice"], matched_time_col="order_t",
        direction="forward",
    )
    ts_s = F.col("ts").cast("timestamp").cast("long")
    return j.select(
        "event_id", "user_id", ts_s.alias("ts_s"), "o_orderkey", "o_totalprice",
        (F.col("order_t") - ts_s).alias("lead_s"),
    )


ASOF_FORWARD_SQL = """
WITH r AS (
  SELECT o_custkey, CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) AS ot,
         MAX(o_orderkey) AS o_orderkey,
         MAX_BY(o_totalprice, o_orderkey) AS o_totalprice
  FROM orders GROUP BY o_custkey, o_orderdate),
l AS (SELECT event_id, user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS t FROM events)
SELECT l.event_id, l.user_id, l.t AS ts_s, r.o_orderkey, r.o_totalprice,
       r.ot - l.t AS lead_s
FROM l ASOF LEFT JOIN r ON l.user_id = r.o_custkey AND l.t <= r.ot
"""


__all__ = [
    "events_topk_exact",
    "EVENTS_TOPK_SQL",
    "events_daily_counts",
    "EVENTS_DAILY_SQL",
    "session_window_events",
    "user_session_stats",
    "USER_SESSION_SQL",
    "session_stats_events",
    "SESSION_STATS_SQL",
    "asof_join_events_orders",
    "ASOF_SQL",
    "range_join_purchase_windows",
    "multimodal_features",
    "MULTIMODAL_SQL",
    "funnel_conversion_events",
    "FUNNEL_SQL",
    "sliding_quantiles_events",
    "SLIDING_QUANTILES_SQL",
    "topk_per_group_events",
    "TOPK_PER_GROUP_SQL",
    "retention_cohorts_events",
    "RETENTION_COHORTS_SQL",
    "streaks_user_events",
    "STREAKS_SQL",
    "event_transitions",
    "EVENT_TRANSITIONS_SQL",
    "scd2_user_state_events",
    "SCD2_SQL",
    "user_set_algebra_events",
    "USER_SET_ALGEBRA_SQL",
    "mode_event_type_per_user",
    "MODE_PER_USER_SQL",
    "attribution_last_touch_events",
    "ATTRIBUTION_SQL",
    "full_outer_user_reconcile",
    "FULL_OUTER_SQL",
    "price_range_window_orders",
    "PRICE_RANGE_WINDOW_SQL",
    "user_event_type_sets",
    "USER_EVENT_TYPE_SETS_SQL",
    "wow_change_events",
    "WOW_CHANGE_SQL",
    "ntile_user_activity",
    "NTILE_USER_ACTIVITY_SQL",
    "basket_pairs_lineitem",
    "BASKET_PAIRS_SQL",
    "cumulative_new_users_daily",
    "CUMULATIVE_NEW_USERS_SQL",
    "densify_daily_counts_events",
    "DENSIFY_DAILY_SQL",
    "rfm_segments_orders",
    "RFM_SEGMENTS_SQL",
    "bitmap_activity_users",
    "BITMAP_ACTIVITY_SQL",
    "collapse_consecutive_events",
    "COLLAPSE_CONSECUTIVE_SQL",
    "pareto_abc_customers",
    "PARETO_ABC_SQL",
    "max_concurrent_events",
    "MAX_CONCURRENT_SQL",
    "argmax_daily_event_users",
    "ARGMAX_DAILY_SQL",
    "asof_forward_join_events_orders",
    "ASOF_FORWARD_SQL",
]
