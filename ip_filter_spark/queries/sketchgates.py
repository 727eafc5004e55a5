"""Sketch-backed gates: Bloom/CBF/cuckoo membership, HLL, CMS, KLL/t-digest, MG, KMV, DGIM, SQL UDAFs, skew/bucketed join strategies.

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
    _dec_sum,
    _ensure_shipped,
)

def salted_event_type_stats(spark, sf_dir):
    """Two-phase salted aggregation over a genuinely skewed key —
    event_type has only 5 values, so an unsalted shuffle lands ~20% of
    the table on single reducers. The salted plan's first exchange is on
    (event_type, salt): balanced; the second moves 32 partial rows per
    type. Decimal partials make the result bit-identical to the plain
    GROUP BY oracle."""
    from ip_filter_spark.operators.aggregates import salted_group_stats

    ev = _t(spark, sf_dir, "events")
    return salted_group_stats(
        ev, keys=["event_type"], entropy=["event_id"], value="value", n_salts=32
    )


SALTED_STATS_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events GROUP BY event_type
"""


def distinct_users_exact(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_users"))


DISTINCT_USERS_SQL = "SELECT event_type, COUNT(DISTINCT user_id) AS n_users FROM events GROUP BY event_type"


# =====================================================================
# Sketch queries — bound-column oracle pattern (VERDICT r1 "Next round"
# #2): every output column is either (a) exactly SQL-computable, or
# (b) a provable-by-construction / deterministic-seeded boolean that
# the oracle emits as literal TRUE. The estimates themselves stay
# visible through bench extras + pytest bound tests; the driver's
# value-hash gate checks the exact columns + the invariants.
# =====================================================================
def hll_distinct_users(spark, sf_dir):
    """HLL estimate must sit within the published 1.04/sqrt(m) relative
    error bound of the exact distinct count (deterministic: the sketch is
    seeded; measured rel_err <= 0.0047 at sf0.001-0.1 vs bound 0.0081)."""
    _ensure_shipped(spark)
    from ip_filter_spark.engine import SketchSpec, build_and_merge

    ev = _t(spark, sf_dir, "events")
    spec = SketchSpec("hll", {"p": 14})
    hll = build_and_merge(ev, [spec], key=F.col("user_id").cast("string"))[spec.key()]
    exact = ev.select(F.countDistinct("user_id")).first()[0]
    est = float(hll.estimate())
    within = abs(est - exact) / exact <= hll.rel_error_bound()
    return spark.createDataFrame(
        [(int(exact), bool(within))], "exact_distinct long, within_error_bound boolean"
    )


HLL_SQL = "SELECT COUNT(DISTINCT user_id) AS exact_distinct, TRUE AS within_error_bound FROM events"


def hll_users_by_type(spark, sf_dir):
    """Keyed sketches: one HLL per event_type (skew-safe two-level
    build). Bound-column oracle: exact per-type distincts + the per-key
    estimate sitting within the published error bound."""
    _ensure_shipped(spark)
    from ip_filter_spark.engine import SketchSpec, build_keyed_sketches
    from ip_filter_spark.sketches import from_bytes

    ev = _t(spark, sf_dir, "events")
    keyed = build_keyed_sketches(
        ev, SketchSpec("hll", {"p": 14}), "event_type", key=F.col("user_id").cast("string")
    ).collect()
    exact = {r.event_type: r.n for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()}
    rows = []
    for r in keyed:
        sk = from_bytes(bytes(r.payload))
        est = float(sk.estimate())
        ex = exact[r.group]
        rows.append((r.group, int(ex), bool(abs(est - ex) / ex <= sk.rel_error_bound())))
    return spark.createDataFrame(rows, "key string, exact_users long, within_error_bound boolean")


HLL_BY_TYPE_SQL = """
SELECT event_type AS key, COUNT(DISTINCT user_id) AS exact_users, TRUE AS within_error_bound
FROM events GROUP BY event_type
"""


def sql_udaf_users_by_type(spark, sf_dir):
    """The sketch algebra as REGISTERED SQL UDAFs (functions/udaf.py):
    per-type distinct users computed entirely in SQL text — level 1
    aggregates digests per (event_type, salt) into HLL blobs (a
    GROUPED_AGG pandas UDF, Arrow-vectorized), level 2 merges blobs per
    type — the skew-safe two-level shape as two GROUP BYs. Same
    bound-column oracle as the engine-path `hll_users_by_type`, so the
    two surfaces are held to the same invariant."""
    _ensure_shipped(spark)
    from ip_filter_spark.engine import sha256_digest
    from ip_filter_spark.functions.udaf import register_sketch_udafs
    from ip_filter_spark.sketches import make_sketch

    register_sketch_udafs(spark, "hll", "hll", p=14)
    ev = _t(spark, sf_dir, "events")
    ev.withColumn(
        "digest", sha256_digest(F.col("user_id").cast("string"))
    ).createOrReplaceTempView("udaf_ev_digest")
    bound = make_sketch("hll", p=14).rel_error_bound()
    return spark.sql(f"""
      WITH partials AS (
        SELECT event_type, pmod(xxhash64(event_id), 16) AS salt, hll_agg(digest) AS p
        FROM udaf_ev_digest GROUP BY event_type, salt
      ), merged AS (
        SELECT event_type, hll_estimate(hll_merge(p)) AS est
        FROM partials GROUP BY event_type
      )
      SELECT m.event_type AS key, e.exact_users,
             abs(m.est - e.exact_users) / e.exact_users <= {bound} AS within_error_bound
      FROM merged m
      JOIN (SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
            FROM udaf_ev_digest GROUP BY event_type) e USING (event_type)
    """)


SQL_UDAF_BY_TYPE_SQL = HLL_BY_TYPE_SQL


def sliding_distinct_users(spark, sf_dir):
    """Rolling 7-day distinct users — the sliding-window form of the
    sketch rollup, in pure SQL: ONE daily HLL blob per day (one scan),
    then `hll_merge OVER (ORDER BY day RANGE 6 PRECEDING)` slides the
    MERGE over 30 daily blobs. Exact rolling COUNT(DISTINCT) is
    non-decomposable (each window must re-deduplicate from rows); the
    sketch version touches each row once and each window merges ≤7
    KB-sized blobs — at 100 TB this is the difference between 30 scans
    and 1. The exact side (range self-join re-deduplicating every
    window) is ORACLE-TIER verification; the deployable operator is the
    daily-blob scan + windowed merge."""
    _ensure_shipped(spark)
    from ip_filter_spark.engine import sha256_digest
    from ip_filter_spark.functions.udaf import register_sketch_udafs
    from ip_filter_spark.sketches import make_sketch

    register_sketch_udafs(spark, "hll", "hll", p=14)
    ev = _t(spark, sf_dir, "events")
    ev.withColumn("digest", sha256_digest(F.col("user_id").cast("string"))).withColumn(
        "day", F.datediff(F.to_date("ts"), F.lit("2024-01-01"))
    ).createOrReplaceTempView("udaf_ev_sliding")
    bound = make_sketch("hll", p=14).rel_error_bound()
    est = spark.sql("""
      WITH daily AS (
        SELECT day, hll_agg(digest) AS blob FROM udaf_ev_sliding GROUP BY day
      )
      SELECT day, hll_estimate(hll_merge(blob) OVER
               (ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)) AS est
      FROM daily
    """)
    exact = spark.sql("""
      SELECT a.day, COUNT(DISTINCT b.user_id) AS exact_users
      FROM (SELECT DISTINCT day FROM udaf_ev_sliding) a
      JOIN udaf_ev_sliding b ON b.day BETWEEN a.day - 6 AND a.day
      GROUP BY a.day
    """)
    return est.join(exact, "day").select(
        "day",
        "exact_users",
        (F.abs(F.col("est") - F.col("exact_users")) / F.col("exact_users") <= bound).alias(
            "within_error_bound"
        ),
    )


SLIDING_DISTINCT_SQL = """
WITH evd AS (
  SELECT DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day, user_id
  FROM events
)
SELECT a.day, COUNT(DISTINCT b.user_id) AS exact_users, TRUE AS within_error_bound
FROM (SELECT DISTINCT day FROM evd) a
JOIN evd b ON b.day BETWEEN a.day - 6 AND a.day
GROUP BY a.day
"""


def hll_rollup_users(spark, sf_dir):
    """Hierarchical sketch rollup (the continuous-aggregate pattern): HLL
    distinct-user sketches are built ONCE at (event_type, day) granularity,
    then the (event_type) and grand-total levels are derived purely by
    merging the finer level's KB blobs — the input is never re-read. Gate
    invariants, one row per level:

    - ``rollup_eq_direct``: the rolled-up estimate at each coarser level is
      EXACTLY equal to the estimate of a sketch built directly at that
      granularity (HLL register-max is associative + lossless — this is the
      property that makes rollup reuse free);
    - ``all_within_bound``: every group estimate within
      3.5·(1.04/sqrt(m))·exact + 2 of the exact distinct. 3.5 sigma is the
      right envelope for a MAX over ~150 groups (expected max of 150
      Gaussian draws ≈ 2.6 sigma); the +2 covers the linear-counting
      collision quantum for small groups. Deterministic (seeded hashing):
      measured worst deviation is 0.06σ / 0.57σ / 1.55σ at sf0.001 / 0.01
      / 0.1 — ≥2.3x headroom.

    Scale: one pruned scan + salted fine-group partials; the pyramid above
    moves O(#groups) blobs; the verdict joins per-group exacts computed by
    ONE Spark rollup aggregate (group-count-bounded, never row-bounded).
    """
    _ensure_shipped(spark)
    from ip_filter_spark.engine import (
        SketchSpec,
        build_and_merge,
        build_keyed_sketches,
        rollup_keyed_sketches,
    )
    from ip_filter_spark.sketches import from_bytes

    ev = _t(spark, sf_dir, "events").withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
    spec = SketchSpec("hll", {"p": 14})
    ukey = F.col("user_id").cast("string")
    rolled = rollup_keyed_sketches(ev, spec, ["event_type", "day"], key=ukey).collect()
    # exact per-group distincts at all three levels in one rollup aggregate
    exact = {
        (r.event_type, r.day): r.n
        for r in ev.rollup("event_type", "day").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    # direct builds at the two coarser granularities (the equality witnesses)
    direct_type = {
        r.group: float(from_bytes(bytes(r.payload)).estimate())
        for r in build_keyed_sketches(ev, spec, "event_type", key=ukey).collect()
    }
    direct_glob = float(build_and_merge(ev, [spec], key=ukey)[spec.key()].estimate())
    per_level: dict[int, dict] = {
        lv: {"n": 0, "sum_exact": 0, "ok": True, "eq": True} for lv in (0, 1, 2)
    }
    for r in rolled:
        sk = from_bytes(bytes(r.payload))
        est = float(sk.estimate())
        ex = exact[(r.event_type, r.day)]
        st = per_level[r.level]
        st["n"] += 1
        st["sum_exact"] += int(ex)
        st["ok"] &= abs(est - ex) <= 3.5 * sk.rel_error_bound() * ex + 2.0
        if r.level == 1:
            st["eq"] &= est == direct_type[r.event_type]
        elif r.level == 0:
            st["eq"] &= est == direct_glob
    rows = [
        (lv, st["n"], st["sum_exact"], bool(st["ok"]), bool(st["eq"]))
        for lv, st in per_level.items()
    ]
    return spark.createDataFrame(
        rows,
        "level long, n_groups long, sum_exact_users long, "
        "all_within_bound boolean, rollup_eq_direct boolean",
    )


HLL_ROLLUP_SQL = """
WITH g AS (
  SELECT event_type, STRFTIME(ts, '%Y-%m-%d') AS day, COUNT(DISTINCT user_id) AS n
  FROM events GROUP BY 1, 2),
t AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS n FROM events GROUP BY 1)
SELECT 2 AS level, COUNT(*) AS n_groups, CAST(SUM(n) AS BIGINT) AS sum_exact_users,
       TRUE AS all_within_bound, TRUE AS rollup_eq_direct FROM g
UNION ALL
SELECT 1, COUNT(*), CAST(SUM(n) AS BIGINT), TRUE, TRUE FROM t
UNION ALL
SELECT 0, 1, COUNT(DISTINCT user_id), TRUE, TRUE FROM events
"""


def cms_event_counts(spark, sf_dir):
    """Count-min point estimates vs exact per-key counts: CMS provably
    never undercounts, and overshoot is bounded by eps * N."""
    _ensure_shipped(spark)
    from ip_filter_spark.engine import SketchSpec, build_and_merge
    from ip_filter_spark.sketches.hashing import digests_to_matrix, fnv1a64, key_digest

    ev = _t(spark, sf_dir, "events")
    eps = 1e-4
    spec = SketchSpec("cms", {"eps": eps, "delta": 1e-3})
    cms = build_and_merge(ev, [spec], key="event_type")[spec.key()]
    exact = {r.event_type: r["count"] for r in ev.groupBy("event_type").count().collect()}
    n_total = sum(exact.values())
    keys = sorted(exact)
    h = fnv1a64(digests_to_matrix([key_digest(k) for k in keys]))
    est = cms.query_hashes(h)
    rows = [
        (k, int(exact[k]), bool(int(e) >= exact[k]), bool(int(e) - exact[k] <= eps * n_total))
        for k, e in zip(keys, est.tolist())
    ]
    return spark.createDataFrame(rows, "key string, exact_count long, never_undercounts boolean, within_eps boolean")


CMS_SQL = """
SELECT event_type AS key, COUNT(*) AS exact_count,
       TRUE AS never_undercounts, TRUE AS within_eps
FROM events GROUP BY event_type
"""


def cms_join_size_events_orders(spark, sf_dir):
    """Join-cardinality estimation WITHOUT running the join: two CMS
    sketches built independently over events.user_id and orders.o_custkey
    (same params -> same hash family), inner product = row-wise dot
    products, min over rows (Cormode & Muthukrishnan SS4.2). The gate
    compares against the exact |events JOIN orders| computed by both
    engines (full-value column) and pins the published guarantees: the
    estimate never underestimates, and overshoots by at most
    (e/w)*N1*N2. At 100 TB this replaces a fact-fact shuffle with two
    independent scans + one KB-scale blob merge — the planner's
    join-size oracle."""
    _ensure_shipped(spark)
    from ip_filter_spark.engine import SketchSpec, build_and_merge

    eps, delta = 1e-4, 1e-3
    spec = SketchSpec("cms", {"eps": eps, "delta": delta})
    ev = _t(spark, sf_dir, "events")
    o = _t(spark, sf_dir, "orders")
    cms_e = build_and_merge(ev, [spec], key=F.col("user_id").cast("string"))[spec.key()]
    cms_o = build_and_merge(o, [spec], key=F.col("o_custkey").cast("string"))[spec.key()]
    est = cms_e.inner_product(cms_o)
    bound = cms_e.inner_product_bound(cms_o)
    exact = ev.join(o, ev.user_id == o.o_custkey).count()
    return spark.createDataFrame(
        [(int(exact), bool(est >= exact), bool(est - exact <= bound))],
        "exact_join_size long, never_underestimates boolean, within_bound boolean",
    )


CMS_JOIN_SIZE_SQL = """
SELECT (SELECT COUNT(*) FROM events JOIN orders ON user_id = o_custkey) AS exact_join_size,
       TRUE AS never_underestimates, TRUE AS within_bound
"""


def _quantile_sketch_query(spark, sf_dir, kind: str, rank_bound: float):
    """Shared shape for KLL / t-digest: exact quantile values (SQL twin)
    + a boolean that the sketch estimate's NORMALIZED RANK is within
    rank_bound of q — the published guarantee form for both sketches."""
    from ip_filter_spark.operators.quantiles import exact_quantiles, sketch_quantiles

    li = _t(spark, sf_dir, "lineitem")
    vals = sketch_quantiles(li, "l_extendedprice", QS, kind=kind)
    rank_aggs = [
        F.sum((F.col("l_extendedprice") <= float(v)).cast("long")).alias(f"r{i}")
        for i, (_, v) in enumerate(vals)
    ]
    # n rides the rank aggregate — one scan instead of a separate count()
    ranks = li.agg(*rank_aggs, F.count("*").alias("__n")).first()
    n = int(ranks["__n"])
    exact = {float(r.q): float(r.value) for r in exact_quantiles(li, "l_extendedprice", QS).collect()}
    rows = [
        (float(q), exact[float(q)], bool(abs(ranks[f"r{i}"] / n - q) <= rank_bound))
        for i, (q, _) in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "q double, exact_value double, within_rank_bound boolean")


def kll_price_quantiles(spark, sf_dir):
    # bound 2.3/k (k=200): measured max rank err 0.0046 at sf0.1
    _ensure_shipped(spark)
    return _quantile_sketch_query(spark, sf_dir, "kll", rank_bound=2.3 / 200)


def tdigest_price_quantiles(spark, sf_dir):
    # delta=200 t-digest: measured max rank err 0.0007; 0.01 is generous
    _ensure_shipped(spark)
    return _quantile_sketch_query(spark, sf_dir, "tdigest", rank_bound=0.01)


QUANTILE_BOUND_SQL = f"""
WITH sorted AS (
  SELECT l_extendedprice AS value, ROW_NUMBER() OVER (ORDER BY l_extendedprice) AS rn
  FROM lineitem),
n AS (SELECT COUNT(*) AS c FROM lineitem),
qs(q) AS (VALUES {", ".join(f"({q})" for q in QS)})
SELECT CAST(q AS DOUBLE) AS q, value AS exact_value, TRUE AS within_rank_bound
FROM qs, n JOIN sorted ON sorted.rn = CAST(FLOOR((n.c - 1) * qs.q) AS BIGINT) + 1
ORDER BY q
"""


def tdigest_by_priority(spark, sf_dir):
    """Keyed VALUE sketches: one t-digest per o_orderpriority via the
    skew-safe two-level ``build_keyed_sketches`` (the value-path twin of
    the keyed-HLL gate). Per group the gate emits the exact median (SQL
    twin) and a boolean that the sketch median's NORMALIZED RANK within
    its group is ≤ the published bound — rank is measured with one
    distributed pass (a per-group WHEN lookup of the 5 estimates), no
    per-group jobs. The exact-median side (full per-group sort) is
    ORACLE-TIER — it exists to verify; the deployable operator is the
    sketch build + rank check, both single-scan."""
    _ensure_shipped(spark)
    from ip_filter_spark.engine import SketchSpec, build_keyed_sketches
    from ip_filter_spark.sketches import from_bytes

    orders = _t(spark, sf_dir, "orders")
    keyed = build_keyed_sketches(
        orders, SketchSpec("tdigest", {"delta": 200.0}, on="value"),
        "o_orderpriority", value="o_totalprice",
    ).collect()
    est = {r.group: float(np.asarray(from_bytes(bytes(r.payload)).quantile(0.5)).item()) for r in keyed}
    est_col = F.lit(None).cast("double")
    for k, v in est.items():
        est_col = F.when(F.col("o_orderpriority") == k, F.lit(v)).otherwise(est_col)
    w = Window.partitionBy("o_orderpriority")
    ranked = (
        orders.withColumn("__est", est_col)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("c"),
            F.sum((F.col("o_totalprice") <= F.col("__est")).cast("long")).alias("r"),
        )
    )
    exact = (
        orders.select(
            "o_orderpriority",
            F.col("o_totalprice").alias("v"),
            F.row_number().over(w.orderBy("o_totalprice")).alias("rn"),
            F.count("*").over(w).alias("c"),
        )
        .where(F.col("rn") == (F.floor((F.col("c") - 1) * 0.5) + 1))
        .select(F.col("o_orderpriority").alias("key"), F.col("v").alias("exact_median"))
    )
    return (
        ranked.select(
            F.col("o_orderpriority").alias("key"),
            (F.abs(F.col("r") / F.col("c") - 0.5) <= 0.01).alias("within_rank_bound"),
        )
        .join(exact, "key")
        .select("key", "exact_median", "within_rank_bound")
    )


TDIGEST_BY_PRIORITY_SQL = """
WITH sorted AS (
  SELECT o_orderpriority AS key, o_totalprice AS v,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS c
  FROM orders)
SELECT key, v AS exact_median, TRUE AS within_rank_bound
FROM sorted WHERE rn = CAST(FLOOR((c - 1) * 0.5) AS BIGINT) + 1
"""


def sql_udaf_price_quantiles(spark, sf_dir):
    """The quantile algebra as REGISTERED SQL UDAFs (functions/udaf.py
    register_value_sketch_udafs): per-priority median t-digests computed
    entirely in SQL text — level 1 aggregates o_totalprice values per
    (priority, salt) into t-digest blobs (GROUPED_AGG pandas UDF), level
    2 merges blobs per priority and reads the median, the skew-safe
    two-level shape as two GROUP BYs. The gate then verifies the SQL
    median's NORMALIZED RANK within its group distributedly (one
    broadcast join + one aggregate — no per-group jobs, no driver rows
    beyond 5 estimates) against the same rank bound and exact-median
    oracle as the engine-path ``tdigest_by_priority``, so both surfaces
    are held to the same invariant."""
    _ensure_shipped(spark)
    from ip_filter_spark.functions.udaf import register_value_sketch_udafs

    register_value_sketch_udafs(spark, "td", "tdigest", q=0.5, delta=200.0)
    orders = _t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("udaf_orders")
    est = spark.sql("""
      WITH partials AS (
        SELECT o_orderpriority AS key, pmod(xxhash64(o_orderkey), 16) AS salt,
               td_agg(CAST(o_totalprice AS DOUBLE)) AS p
        FROM udaf_orders GROUP BY key, salt
      )
      SELECT key, td_quantile(td_merge(p)) AS est FROM partials GROUP BY key
    """)
    ranked = (
        orders.join(F.broadcast(est), orders.o_orderpriority == est.key)
        .groupBy("key")
        .agg(
            F.count("*").alias("c"),
            F.sum((F.col("o_totalprice") <= F.col("est")).cast("long")).alias("r"),
        )
        .select("key", (F.abs(F.col("r") / F.col("c") - 0.5) <= 0.01).alias("within_rank_bound"))
    )
    w = Window.partitionBy("o_orderpriority")
    exact = (
        orders.select(
            "o_orderpriority",
            F.col("o_totalprice").alias("v"),
            F.row_number().over(w.orderBy("o_totalprice")).alias("rn"),
            F.count("*").over(w).alias("c"),
        )
        .where(F.col("rn") == (F.floor((F.col("c") - 1) * 0.5) + 1))
        .select(F.col("o_orderpriority").alias("key"), F.col("v").alias("exact_median"))
    )
    return ranked.join(exact, "key").select("key", "exact_median", "within_rank_bound")


SQL_UDAF_PRICE_QUANTILES_SQL = TDIGEST_BY_PRIORITY_SQL


def bloom_membership(spark, sf_dir):
    """Bloom invariants: zero false negatives (provable by construction),
    empirical FPR on 10k absent keys within 10x the configured fpp
    (deterministic: seeded build; measured 0 false positives at all sfs)."""
    _ensure_shipped(spark)
    from ip_filter_spark.engine import SketchSpec, build_and_merge, probe_membership

    d = _t(spark, sf_dir, "documents")
    spec = SketchSpec("bloom", {"fpp": 1e-4, "n": 100_000})
    bf = build_and_merge(d, [spec], key="text")[spec.key()]
    present_found = probe_membership(d, "text", bf).where("bloom_hit").count()
    absent = spark.range(10_000).select(F.concat(F.lit("absent-key-"), F.col("id")).alias("text"))
    fp = probe_membership(absent, "text", bf).where("bloom_hit").count()
    n = d.count()
    return spark.createDataFrame(
        [(int(n), bool(present_found == n), bool(fp <= 10_000 * 10 * 1e-4))],
        "n_present long, no_false_negatives boolean, fpr_within_10x_fpp boolean",
    )


BLOOM_SQL = """
SELECT COUNT(*) AS n_present, TRUE AS no_false_negatives, TRUE AS fpr_within_10x_fpp
FROM documents
"""


def cbf_duplicate_counts(spark, sf_dir):
    """Counting-Bloom multiplicity estimates vs exact duplicate counts on
    the events event_type column: min-count provably never undercounts."""
    _ensure_shipped(spark)
    from ip_filter_spark.engine import SketchSpec, build_and_merge
    from ip_filter_spark.sketches.hashing import digests_to_matrix, fnv1a64, key_digest

    ev = _t(spark, sf_dir, "events")
    spec = SketchSpec("cbf", {"fpp": 1e-4, "n": 1_000_000})
    cbf = build_and_merge(ev, [spec], key="event_type")[spec.key()]
    exact = {r.event_type: r["count"] for r in ev.groupBy("event_type").count().collect()}
    keys = sorted(exact)
    h = fnv1a64(digests_to_matrix([key_digest(k) for k in keys]))
    est = cbf.min_count(h)
    rows = [(k, int(exact[k]), bool(int(e) >= exact[k])) for k, e in zip(keys, est.tolist())]
    return spark.createDataFrame(rows, "key string, exact_count long, cbf_never_undercounts boolean")


CBF_SQL = """
SELECT event_type AS key, COUNT(*) AS exact_count, TRUE AS cbf_never_undercounts
FROM events GROUP BY event_type
"""


def cbf_deletion_membership(spark, sf_dir):
    """Distributed deletion — the counting filter's reason to exist over
    plain Bloom. One CBF is built over every event's user_id, a second
    over just the 'error' events (the deletions) with the SAME
    scan→partials→merge pipeline, and the blobs are subtracted (counters
    are linear, so blob subtraction ≡ per-key removal — no replay). The
    remaining filter is probed DISTRIBUTEDLY (``probe_counts``: broadcast
    blob + Arrow gather; no keys to the driver). Deletion is exact
    multiset subtraction, so users who still have non-error events are
    always contained and ``min_count`` never undercounts their remaining
    multiplicity — both booleans provable, oracle is plain SQL."""
    _ensure_shipped(spark)
    from ip_filter_spark.engine import SketchSpec, build_and_merge, probe_counts

    ev = _t(spark, sf_dir, "events")
    # both booleans are one-sided bounds that hold for any params SHORT
    # OF COUNTER SATURATION (no false negatives / never undercounts are
    # structural; a uint16-clipped cell would break the bound, and
    # subtract() now raises in that case), so size the filter for the
    # workload instead of maximal: m tracks n linearly, and per-batch
    # update cost tracks m
    # r6: both filters come out of ONE scan — the deletions spec carries
    # a row predicate (SketchSpec.where) instead of a second
    # build_and_merge pass over the same events table (guide §1.2: the
    # two-pass form re-scanned + re-digested every event). Counters are
    # identical: each spec's kernel updates from exactly the rows its
    # predicate admits.
    spec = SketchSpec("cbf", {"fpp": 1e-3, "n": 100_000})
    spec_dele = SketchSpec(
        "cbf", {"fpp": 1e-3, "n": 100_000}, where=(F.col("event_type") == "error"), tag="dele"
    )
    got = build_and_merge(ev, [spec, spec_dele], key="user_id")
    full, dele = got[spec.key()], got[spec_dele.key()]
    remaining = full.subtract(dele)
    exact = (
        ev.where(F.col("event_type") != "error")
        .groupBy("user_id")
        .agg(F.count("*").alias("exact_remaining"))
    )
    probed = probe_counts(exact, "user_id", remaining, out_col="est")
    return probed.select(
        "user_id",
        "exact_remaining",
        (F.col("est") > 0).alias("still_contained"),
        (F.col("est") >= F.col("exact_remaining")).alias("never_undercounts"),
    )


CBF_DELETION_SQL = """
SELECT user_id, COUNT(*) AS exact_remaining,
       TRUE AS still_contained, TRUE AS never_undercounts
FROM events WHERE event_type <> 'error' GROUP BY user_id
"""


def cuckoo_deletion_membership(spark, sf_dir):
    """Cuckoo-filter key retraction (Fan et al. CoNEXT'14) — the third
    regime in the membership family beside Bloom (no deletes) and
    counting Bloom (counter blobs): fingerprint slots delete per key at
    roughly half CBF's space for the same FPR. A cuckoo filter stores
    SETS (a key has at most 2·bucket_size tabled copies — the structure
    is the wrong tool for heavy multisets, which is CBF's regime and is
    documented as such), so the gate models the north rule's "is this
    content hash still present": insert each DISTINCT user once, then
    retract a deterministic third of them (user_id % 3 == 0 — non-vacuous
    at every sf; "users whose events are ALL errors" is an empty set on
    this synthetic data). Unlike CBF, deletion
    is NOT blob subtraction — each delete must locate its fingerprint —
    so the distributed shape is ``engine.build_with_deletions``: inserts
    (+1) and deletes (−1) shuffle ONCE on a digest-hash shard, each
    shard task builds then deletes locally (a delete always lands in its
    insert's shard — same digest, same shard), and only O(shards) blobs
    leave the executors for the deterministic merge. A surviving user is
    never retracted, so ``still_contained`` is structural (zero false
    negatives under deletion ⊆ insertion — holds through the overflow
    path too), full-value per user; the in-query assert pins the exact
    post-retraction cardinality."""
    _ensure_shipped(spark)
    from ip_filter_spark.engine import SketchSpec, build_with_deletions, probe_membership

    ev = _t(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    n_users = users.count()  # size the table for the distinct-key set
    spec = SketchSpec("cuckoo", {"n": max(64, int(n_users)), "fp_bits": 16})
    cf = build_with_deletions(
        users,
        users.where(F.col("user_id") % 3 == 0),
        spec,
        key="user_id",
        shards=16,
    )
    remaining = (
        ev.where(F.col("user_id") % 3 != 0)
        .groupBy("user_id")
        .agg(F.count("*").alias("exact_remaining"))
    )
    # exact set accounting survived the sharded build+retract
    assert cf.n_items == remaining.count(), "cuckoo shard build/retract lost keys"
    probed = probe_membership(remaining, "user_id", cf, out_col="still_contained")
    return probed.select("user_id", "exact_remaining", "still_contained")


CUCKOO_DELETION_SQL = """
SELECT user_id, COUNT(*) AS exact_remaining, TRUE AS still_contained
FROM events WHERE user_id % 3 <> 0 GROUP BY user_id
"""


def mg_top_langs(spark, sf_dir):
    """Misra–Gries heavy hitters over documents.lang. The language domain
    is smaller than the summary capacity, so err stays 0 and the summary
    IS the exact per-language count table — a full-value DuckDB oracle,
    not just bound booleans (capacity-stressed behavior is pinned by
    ``mg_heavy_users`` and the adversarial pytest)."""
    _ensure_shipped(spark)
    from ip_filter_spark.operators.topk import mg_heavy_hitters

    d = _t(spark, sf_dir, "documents")
    sk = mg_heavy_hitters(d, "lang", capacity=64, num_partitions=8)
    assert sk.err == 0, "lang domain exceeded MG capacity; oracle form invalid"
    return spark.createDataFrame(
        [(k, e, u) for k, e, u in sk.items()], "lang string, est long, upper long"
    )


MG_TOP_LANGS_SQL = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS est, CAST(COUNT(*) AS BIGINT) AS upper
FROM documents GROUP BY lang
"""


def mg_heavy_users(spark, sf_dir):
    """Misra–Gries under capacity stress: user_id cardinality far exceeds
    the 32-counter summary. The deterministic guarantees — never
    overcounts, undercounts by at most err <= n/(capacity+1), and every
    (n/(capacity+1))-heavy key retained — are checked in-query against
    exact counts and emitted as provable-by-construction booleans."""
    _ensure_shipped(spark)
    from ip_filter_spark.operators.topk import mg_bounds_verdict, mg_heavy_hitters

    ev = _t(spark, sf_dir, "events")
    cap = 32
    sk = mg_heavy_hitters(ev, "user_id", capacity=cap, num_partitions=8)
    # distributed verification: the <=cap summary broadcast-joins the exact
    # counts and the booleans reduce in Spark — only scalars reach the
    # driver (no per-user collect; that was a 100x driver wall)
    n = ev.count()
    verdict = mg_bounds_verdict(ev, "user_id", sk, n).first()
    row = (
        int(n),
        bool(len(sk.items()) <= cap),
        bool(sk.err <= n // (cap + 1) + 1),
        bool(verdict.bounds_hold),
        bool(verdict.heavy_keys_kept),
    )
    return spark.createDataFrame(
        [row],
        "n_rows long, within_capacity boolean, err_within_bound boolean, bounds_hold boolean, heavy_keys_kept boolean",
    )


MG_HEAVY_USERS_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, TRUE AS within_capacity,
       TRUE AS err_within_bound, TRUE AS bounds_hold, TRUE AS heavy_keys_kept
FROM events
"""


def kmv_user_overlap(spark, sf_dir):
    """Distinct-user set algebra via KMV/theta sketches: |click ∩
    purchase| users from two independently-built sketches. The user
    domain sits below sketch capacity at every sf the gate runs, so the
    sketch algebra is exact (theta = 1, every hash retained) and the
    DuckDB INTERSECT is a full-value oracle; capacity-stressed accuracy
    is pinned by the pytest bound test."""
    _ensure_shipped(spark)
    from ip_filter_spark.engine import SketchSpec, build_and_merge

    ev = _t(spark, sf_dir, "events")
    spec = SketchSpec("kmv", {"k": 65536})
    sketches = {}
    for et in ("click", "purchase"):
        sketches[et] = build_and_merge(
            ev.where(F.col("event_type") == et), [spec], key=F.col("user_id").cast("string")
        )[spec.key()]
    a, b = sketches["click"], sketches["purchase"]
    assert a._theta() >= 1.0 and b._theta() >= 1.0, "user domain exceeded KMV capacity; oracle form invalid"
    # per-sketch theta=1 is not sufficient for the union/difference rows:
    # union_estimate truncates the COMBINED hash set to k, so the
    # combined distinct domain must also fit capacity for the exact
    # oracle form to be valid
    assert len(np.union1d(a.mins, b.mins)) < a.k, (
        "combined user domain exceeded KMV capacity; oracle form invalid"
    )
    row = (
        int(round(a.estimate())),
        int(round(b.estimate())),
        int(round(a.intersect_estimate(b))),
        int(round(a.union_estimate(b))),
        int(round(a.difference_estimate(b))),
    )
    return spark.createDataFrame(
        [row],
        "click_users long, purchase_users long, overlap_users long,"
        " either_users long, click_only_users long",
    )


KMV_OVERLAP_SQL = """
SELECT
  (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events WHERE event_type = 'click') AS click_users,
  (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events WHERE event_type = 'purchase') AS purchase_users,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM (
     SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
     INTERSECT
     SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')) AS overlap_users,
  (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events
     WHERE event_type IN ('click', 'purchase')) AS either_users,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM (
     SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
     EXCEPT
     SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')) AS click_only_users
"""


def bloom_semijoin_customers(spark, sf_dir):
    """Customers having at least one high-value order, executed as the
    runtime-filter pattern: Bloom over the build side's keys prunes the
    probe table before the exact semi-join. No false negatives → output
    is EXACTLY the plain semi-join, so the SQL oracle is a plain IN."""
    _ensure_shipped(spark)
    from ip_filter_spark.operators.joins import bloom_semi_join

    cust = _t(spark, sf_dir, "customer")
    big_orders = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 150000).select(
        F.col("o_custkey")
    )
    out = bloom_semi_join(cust, big_orders, probe_key="c_custkey", build_key="o_custkey")
    return out.select("c_custkey", "c_name")


BLOOM_SEMIJOIN_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 150000)
"""


def bucketed_join_segment_revenue(spark, sf_dir):
    """Co-located fact-fact join via bucketing: orders and customer are
    written as tables bucketed by custkey (the one-time shuffle), then
    the equi-join on custkey runs with ZERO Exchange — the plan property
    is asserted IN the gate, so a regression to a shuffling plan fails
    the driver run, not just pytest. At 100 TB this is the pattern for a
    fact-fact join repeated across queries: pay the partitioning once at
    ingest, never re-shuffle either table again. Values are the plain
    join aggregate, so the oracle is ordinary SQL."""
    _ensure_shipped(spark)
    import shutil
    import tempfile
    import uuid

    from ip_filter_spark.operators.joins import write_bucketed

    tag = uuid.uuid4().hex[:8]
    to, tc = f"b_orders_{tag}", f"b_cust_{tag}"
    work = tempfile.mkdtemp(prefix="ifs_bucketed_")
    try:
        # r6: bucket only the columns the join + aggregate read (guide
        # §2.3 'project before the exchange' — the bucketed write IS the
        # exchange here); the query result is identical and the one-time
        # partitioning write shrinks from 6 to 2 columns per table.
        write_bucketed(
            _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice"),
            to, "o_custkey", 8, path=f"{work}/orders"
        )
        write_bucketed(
            _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment"),
            tc, "c_custkey", 8, path=f"{work}/cust"
        )
        # merge hint: at gate SFs the planner would broadcast the small
        # side (its BroadcastExchange is not the shuffle being tested);
        # the 100 TB shape is the sort-merge join, which bucketing makes
        # Exchange-free.
        j = spark.table(to).hint("merge").join(
            spark.table(tc), F.col("o_custkey") == F.col("c_custkey")
        )
        plan = j._sc._jvm.PythonSQLUtils.explainString(j._jdf.queryExecution(), "formatted")
        if "Exchange" in plan:
            raise AssertionError(f"bucketed join must be Exchange-free:\n{plan}")
        rows = (
            j.groupBy("c_mktsegment")
            .agg(
                F.count("*").alias("n_orders"),
                _dec_sum(F.col("o_totalprice"), "total_price"),
            )
            .collect()
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {to}")
        spark.sql(f"DROP TABLE IF EXISTS {tc}")
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(rows, "c_mktsegment string, n_orders long, total_price double")


BUCKETED_JOIN_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def salted_join_event_enrichment(spark, sf_dir):
    """Skew-defused fact-to-dim shuffle join: events.event_type has 5
    values (~20% of the table each), so a plain shuffle join puts a
    fifth of the fact table on single reducers. ``salted_skew_join``
    salts the fact rows and replicates the dim per salt; the inline plan
    assert pins BOTH properties that make it the skew pattern — the join
    keys include the salt, and the dim side is NOT broadcast (a
    broadcast would hide the salt and is exactly what you can't do when
    the dim outgrows an executor at 100 TB). The output is row-for-row
    the plain join, so the oracle is ordinary SQL."""
    _ensure_shipped(spark)
    from ip_filter_spark.operators.joins import salted_skew_join

    ev = _t(spark, sf_dir, "events")
    dim = ev.groupBy(F.col("event_type").alias("et")).agg(
        F.count("*").alias("type_count"),
        F.min("value").alias("type_min"),
    )
    j = salted_skew_join(ev, dim, big_key="event_type", small_key="et", n_salts=16)
    plan = j._sc._jvm.PythonSQLUtils.explainString(j._jdf.queryExecution(), "formatted")
    if "__salt" not in plan:
        raise AssertionError(f"join keys must include the salt:\n{plan}")
    if "BroadcastHashJoin" in plan:
        raise AssertionError(f"salted join must not broadcast the dim:\n{plan}")
    return j.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.max("type_count").alias("type_count"),
        _dec_sum(F.col("value") - F.col("type_min"), "sum_over_min"),
    )


SALTED_JOIN_SQL = """
WITH dim AS (
  SELECT event_type AS et, COUNT(*) AS type_count, MIN(value) AS type_min
  FROM events GROUP BY event_type
)
SELECT e.event_type, COUNT(*) AS n_events, MAX(d.type_count) AS type_count,
       CAST(SUM(CAST(e.value - d.type_min AS DECIMAL(18,4))) AS DOUBLE) AS sum_over_min
FROM events e JOIN dim d ON e.event_type = d.et
GROUP BY e.event_type
"""


def cms_topk_users(spark, sf_dir):
    """Count-min-backed top-k as a FULL-VALUE gate: with the sketch sized
    so collisions are deterministically absent on this corpus (eps=1e-5 →
    272k cells/row vs ≤1.5k keys; verified at sf0.001-0.1), every CMS
    estimate equals the exact count and the ranked output is exactly the
    exact top-k — so the oracle is the plain exact-top-k SQL, and any
    sketch defect (hashing, merge, query) breaks the hash match.
    Candidate communication is O(P · candidates_per_partition), not key
    cardinality; capacity-stressed accuracy bounds live in pytest."""
    _ensure_shipped(spark)
    from ip_filter_spark.operators.topk import cms_topk

    ev = _t(spark, sf_dir, "events")
    ranked = cms_topk(ev, "user_id", k=10, eps=1e-5, delta=0.05, candidates_per_partition=1024)
    rows = [(int(key), int(cnt), i + 1) for i, (key, cnt) in enumerate(ranked)]
    return spark.createDataFrame(rows, "key long, cnt long, rank int")


CMS_TOPK_SQL = """
SELECT * FROM (
  SELECT user_id AS key, COUNT(*) AS cnt,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, user_id) AS rank
  FROM events GROUP BY user_id) WHERE rank <= 10
"""


def ams_f2_events(spark, sf_dir):
    """Second frequency moment F2 = Σ_user count(user)² of the events
    stream via the Count-Sketch / AMS tug-of-war estimator — the
    self-join-size statistic (F2 is exactly |events ⋈ events| on
    user_id) from one linear sketch instead of a fact-fact shuffle.
    Gate pins the exact F2 (full-value column, both engines) plus the
    published guarantee: the median-of-rows estimate lands within the
    per-row Chebyshev bound sqrt(8/w) relative error. Merge is
    elementwise sum, so the build is the standard scan-partitioned
    partials → tree merge — O(P·blob) traffic at any scale."""
    _ensure_shipped(spark)
    from ip_filter_spark.engine import SketchSpec, build_and_merge

    spec = SketchSpec("countsketch", {"width": 8192, "depth": 7})
    ev = _t(spark, sf_dir, "events")
    cs = build_and_merge(ev, [spec], key=F.col("user_id").cast("string"))[spec.key()]
    est = cs.f2_estimate()
    bound = cs.f2_rel_error_bound()
    exact = (
        ev.groupBy("user_id")
        .count()
        .agg(F.sum(F.col("count") * F.col("count")).alias("f2"))
        .first()["f2"]
    )
    return spark.createDataFrame(
        [(int(exact), bool(abs(est - exact) <= bound * exact))],
        "exact_f2 long, within_rel_bound boolean",
    )


AMS_F2_SQL = """
SELECT CAST(SUM(c * c) AS BIGINT) AS exact_f2, TRUE AS within_rel_bound
FROM (SELECT COUNT(*) AS c FROM events GROUP BY user_id)
"""


def bloom_anti_join_customers(spark, sf_dir):
    """Customers with NO high-value order — NOT EXISTS executed as the
    Bloom anti-join: bloom-NEGATIVE customers are emitted with zero
    join work (negatives are certain), only the ~|matches| + fpp·|probe|
    bloom-positives reach the exact anti-join confirm. Output is
    exactly the plain anti-join (no false negatives; confirm kills
    false positives), aggregated per market segment with decimal-exact
    balance sums."""
    _ensure_shipped(spark)
    from ip_filter_spark.operators.joins import bloom_anti_join

    cust = _t(spark, sf_dir, "customer")
    big_orders = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 150000).select(
        "o_custkey"
    )
    out = bloom_anti_join(cust, big_orders, probe_key="c_custkey", build_key="o_custkey")
    return out.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        _dec_sum(F.col("c_acctbal"), "total_acctbal"),
    )


BLOOM_ANTI_JOIN_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
GROUP BY c_mktsegment
"""


def sql_udaf_shipping_quantiles(spark, sf_dir):
    """The KLL quantile algebra as REGISTERED SQL UDAFs — the KLL twin
    of ``sql_udaf_price_quantiles`` (t-digest), completing the SQL
    surface for both quantile kernels: per-returnflag medians of
    l_extendedprice computed entirely in SQL text as the skew-safe
    two-level aggregate (values → per-(key, salt) KLL blobs → per-key
    blob merge → quantile read). Verified distributedly against the
    same normalized-rank bound (2.3/k with k=200; measured 0.0046 at
    sf0.1 — 0.02 is generous for the 16-way merged form) and the exact
    per-group median, one broadcast join + one aggregate."""
    _ensure_shipped(spark)
    from ip_filter_spark.functions.udaf import register_value_sketch_udafs

    register_value_sketch_udafs(spark, "kllq", "kll", q=0.5, k=200)
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("udaf_lineitem")
    est = spark.sql("""
      WITH partials AS (
        SELECT l_returnflag AS key, pmod(xxhash64(l_orderkey), 16) AS salt,
               kllq_agg(CAST(l_extendedprice AS DOUBLE)) AS p
        FROM udaf_lineitem GROUP BY key, salt
      )
      SELECT key, kllq_quantile(kllq_merge(p)) AS est FROM partials GROUP BY key
    """)
    ranked = (
        li.join(F.broadcast(est), li.l_returnflag == est.key)
        .groupBy("key")
        .agg(
            F.count("*").alias("c"),
            F.sum((F.col("l_extendedprice") <= F.col("est")).cast("long")).alias("r"),
        )
        .select("key", (F.abs(F.col("r") / F.col("c") - 0.5) <= 0.02).alias("within_rank_bound"))
    )
    w = Window.partitionBy("l_returnflag")
    exact = (
        li.select(
            "l_returnflag",
            F.col("l_extendedprice").alias("v"),
            F.row_number().over(w.orderBy("l_extendedprice")).alias("rn"),
            F.count("*").over(w).alias("c"),
        )
        .where(F.col("rn") == (F.floor((F.col("c") - 1) * 0.5) + 1))
        .select(F.col("l_returnflag").alias("key"), F.col("v").alias("exact_median"))
    )
    return ranked.join(exact, "key").select("key", "exact_median", "within_rank_bound")


SQL_UDAF_SHIPPING_QUANTILES_SQL = """
WITH sorted AS (
  SELECT l_returnflag AS key, l_extendedprice AS v,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS c
  FROM lineitem)
SELECT key, v AS exact_median, TRUE AS within_rank_bound
FROM sorted WHERE rn = CAST(FLOOR((c - 1) * 0.5) AS BIGINT) + 1
"""


def ddsketch_order_quantiles(spark, sf_dir):
    """DDSketch (Masson et al., VLDB 2019) VALUE-relative quantile gate
    over orders.o_totalprice: the sketch's deterministic guarantee is
    |est - exact_q| <= alpha * exact_q (alpha = 0.01) at every rank —
    unlike KLL/t-digest's RANK-error regime, so this completes the
    quantile family. Build is the engine's per-partition partial +
    exact-count merge (a linear sketch — byte-identical to single-pass);
    the gate emits the exact quantile (SQL twin, same floor((n-1)q)+1
    fencepost) and the relative-bound boolean, with a 5% float-rounding
    margin on the mathematically tight (gamma-1)/(gamma+1) = alpha
    bound."""
    _ensure_shipped(spark)
    from ip_filter_spark.operators.quantiles import exact_quantiles, sketch_quantiles

    ALPHA = 0.01
    orders = _t(spark, sf_dir, "orders").withColumn(
        "v", F.col("o_totalprice").cast("double")
    )
    est = dict(sketch_quantiles(orders, "v", QS, kind="ddsketch", alpha=ALPHA))
    exact = exact_quantiles(orders, "v", QS)
    est_col = F.lit(None).cast("double")
    for q, v in est.items():
        est_col = F.when(F.col("q") == float(q), F.lit(float(v))).otherwise(est_col)
    return exact.select(
        F.col("q"),
        F.col("value").alias("exact_value"),
        (F.abs(est_col - F.col("value")) <= F.lit(ALPHA * 1.05) * F.abs(F.col("value"))).alias(
            "within_rel_bound"
        ),
    ).orderBy("q")


DDSKETCH_ORDER_SQL = f"""
WITH sorted AS (
  SELECT CAST(o_totalprice AS DOUBLE) AS value,
         ROW_NUMBER() OVER (ORDER BY CAST(o_totalprice AS DOUBLE)) AS rn
  FROM orders),
n AS (SELECT COUNT(*) AS c FROM orders),
qs(q) AS (VALUES {", ".join(f"({q})" for q in QS)})
SELECT CAST(q AS DOUBLE) AS q, value AS exact_value, TRUE AS within_rel_bound
FROM qs, n JOIN sorted ON sorted.rn = CAST(FLOOR((n.c - 1) * qs.q) AS BIGINT) + 1
ORDER BY q
"""


def sql_udaf_order_value_medians(spark, sf_dir):
    """DDSketch exposed through the SQL UDAF surface (the VALUE-relative
    member of the quantile algebra, completing the per-sketch SQL parity
    kll/t-digest already have): per-priority medians computed entirely
    in SQL text via the skew-safe two-level shape — dd_agg per
    (priority, salt), dd_merge + dd_quantile per priority. The gate
    holds the SQL-path estimate to DDSketch's own deterministic
    guarantee, |est - exact_median| <= 1.05 * alpha * exact_median, with
    the exact median from the same window fencepost as the oracle."""
    _ensure_shipped(spark)
    from ip_filter_spark.functions.udaf import register_value_sketch_udafs

    ALPHA = 0.01
    register_value_sketch_udafs(spark, "dd", "ddsketch", q=0.5, alpha=ALPHA)
    orders = _t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("udaf_dd_orders")
    est = spark.sql("""
      WITH partials AS (
        SELECT o_orderpriority AS key, pmod(xxhash64(o_orderkey), 16) AS salt,
               dd_agg(CAST(o_totalprice AS DOUBLE)) AS p
        FROM udaf_dd_orders GROUP BY key, salt
      )
      SELECT key, dd_quantile(dd_merge(p)) AS est FROM partials GROUP BY key
    """)
    w = Window.partitionBy("o_orderpriority")
    exact = (
        orders.select(
            "o_orderpriority",
            F.col("o_totalprice").cast("double").alias("v"),
            F.row_number().over(w.orderBy(F.col("o_totalprice").cast("double"))).alias("rn"),
            F.count("*").over(w).alias("c"),
        )
        .where(F.col("rn") == (F.floor((F.col("c") - 1) * 0.5) + 1))
        .select(F.col("o_orderpriority").alias("key"), F.col("v").alias("exact_median"))
    )
    return (
        exact.join(F.broadcast(est), "key")
        .select(
            "key",
            "exact_median",
            (F.abs(F.col("est") - F.col("exact_median"))
             <= F.lit(ALPHA * 1.05) * F.col("exact_median")).alias("within_rel_bound"),
        )
    )


SQL_UDAF_ORDER_VALUE_SQL = """
WITH sorted AS (
  SELECT o_orderpriority AS key, CAST(o_totalprice AS DOUBLE) AS v,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY CAST(o_totalprice AS DOUBLE)) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS c
  FROM orders)
SELECT key, v AS exact_median, TRUE AS within_rel_bound
FROM sorted WHERE rn = CAST(FLOOR((c - 1) * 0.5) AS BIGINT) + 1
"""


def native_approx_distinct_events(spark, sf_dir):
    """Spark's BUILT-IN HLL++ (approx_count_distinct, rsd=0.05) held to
    the same bound-gate discipline as the repo's own HLL: per event_type
    the exact distinct-user count (oracle twin) plus a boolean that the
    native estimate is relatively within 3x rsd. Deterministic — HLL++
    has no seed; same input → same estimate on every run/engine
    version. Documents that the engine composes with Catalyst-native
    sketches, not only its own kernels."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact"),
        (
            F.abs(F.approx_count_distinct("user_id", 0.05) - F.countDistinct("user_id"))
            <= 0.15 * F.countDistinct("user_id")
        ).alias("within_bound"),
    )


NATIVE_APPROX_DISTINCT_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users_exact,
       TRUE AS within_bound
FROM events GROUP BY event_type
"""


def native_approx_quantiles_events(spark, sf_dir):
    """Spark's built-in percentile_approx (Greenwald–Khanna variant,
    accuracy=10000 → rank error <= 1e-4) bound-gated: the estimates'
    NORMALIZED RANKS among events.value must sit within 0.005 of each
    target q (50x the published bound — generous but far below any
    plausible regression). One scan for the estimates, one for the rank
    check."""
    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    est_row = ev.agg(
        F.percentile_approx("value", QS, 10000).alias("est"), F.count("*").alias("n")
    ).first()
    ests, n = est_row["est"], est_row["n"]
    rank_aggs = [
        F.sum((F.col("value") <= float(v)).cast("long")).alias(f"r{i}")
        for i, v in enumerate(ests)
    ]
    ranks = ev.agg(*rank_aggs).first()
    rows = [
        (float(q), int(n), bool(abs(ranks[f"r{i}"] / n - q) <= 0.005))
        for i, q in enumerate(QS)
    ]
    return spark.createDataFrame(rows, "q double, n bigint, within_rank_bound boolean")


NATIVE_APPROX_QUANTILES_SQL = f"""
WITH n AS (SELECT COUNT(*) AS c FROM events WHERE value IS NOT NULL),
qs(q) AS (VALUES {", ".join(f"({q})" for q in QS)})
SELECT CAST(q AS DOUBLE) AS q, CAST(n.c AS BIGINT) AS n, TRUE AS within_rank_bound
FROM qs, n ORDER BY q
"""


def cms_conservative_users(spark, sf_dir):
    """Conservative-update count-min (Estan & Varghese 2002) under the
    hard gate, distributed: three CMS variants build in ONE scan pass
    (engine multi-spec partials, sum-merge). The headline sketch is
    sized collision-free on this corpus (eps=1e-5, same discipline as
    cms_topk_users) so its conservative estimates EQUAL the exact
    per-user counts — full-value vs the plain exact SQL. Two
    deliberately capacity-stressed 256-cell sketches (conservative +
    vanilla, same hash family) pin the library's distributed-merge
    invariant as value columns: exact <= est_conservative <= est_vanilla
    — sum-merged conservative partials stay one-sided but strictly
    tighter than vanilla. Probed keys are the bounded deterministic
    user_id % 13 == 0 subset; only (key, exact) pairs and KB-scale blobs
    reach the driver."""
    _ensure_shipped(spark)
    from ip_filter_spark.engine import SketchSpec, build_and_merge
    from ip_filter_spark.sketches.hashing import digests_to_matrix, fnv1a64, key_digest

    ev = _t(spark, sf_dir, "events")
    big = SketchSpec("cms", {"eps": 1e-5, "delta": 0.05, "conservative": True})
    stress_c = SketchSpec("cms", {"width": 256, "depth": 4, "conservative": True})
    stress_v = SketchSpec("cms", {"width": 256, "depth": 4})
    sks = build_and_merge(ev, [big, stress_c, stress_v], key="user_id")
    exact = {
        int(r.user_id): r["count"]
        for r in ev.where(F.col("user_id") % 13 == 0).groupBy("user_id").count().collect()
    }
    keys = sorted(exact)
    h = fnv1a64(digests_to_matrix([key_digest(str(k)) for k in keys]))
    e_big = sks[big.key()].query_hashes(h)
    e_c = sks[stress_c.key()].query_hashes(h)
    e_v = sks[stress_v.key()].query_hashes(h)
    rows = [
        (k, int(eb), bool(int(ec) >= exact[k]), bool(int(ec) <= int(evn)))
        for k, eb, ec, evn in zip(keys, e_big.tolist(), e_c.tolist(), e_v.tolist())
    ]
    return spark.createDataFrame(
        rows, "user_id long, cnt long, cons_ge_exact boolean, cons_le_vanilla boolean"
    )


CMS_CONSERVATIVE_SQL = """
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt,
       TRUE AS cons_ge_exact, TRUE AS cons_le_vanilla
FROM events WHERE user_id % 13 = 0 GROUP BY user_id
"""


def dgim_sliding_counts_events(spark, sf_dir):
    """DGIM exponential histogram (Datar–Gionis–Indyk–Motwani, SODA'02)
    counting each event type's last-7-days activity in O(log² W) state:
    one sorted pass per type inserts epoch-microsecond timestamps into a
    ``sketches.dgim.Dgim`` chain (at most k+1 buckets per power-of-two
    size), then the doubled estimate ``2T + s`` brackets the true count
    by the DGIM theorem |2C − est2x| ≤ s — an exact integer statement
    both engines can check, no tail bound, no float.  Gated columns:
    the exact recent count (full value) plus the bracket and the
    k-invariant relative bound s·k ≤ max(k, 2C) as booleans.  Spark
    shape: ONE shuffle (groupBy event_type), per-key state is the
    bucket chain — kilobytes per key at any window size; the streaming
    habitat is the same chain under ``applyInPandasWithState``."""
    import pandas as pd

    from ip_filter_spark.sketches.dgim import Dgim

    K = 8
    WINDOW_US = 7 * 86400 * 10**6
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        # parquet stores TIMESTAMP_NTZ; the cast applies one fixed session
        # offset, so the micros stay affine in event time (all the DGIM
        # math needs) and the 7-day cutoff matches the oracle's INTERVAL
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_id",
    )
    now_us = ev.agg(F.max("ts_us")).first()[0]

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts_us", "event_id"])
        d = Dgim(k=K)
        for t in pdf["ts_us"].to_numpy():
            d.insert(int(t))
        est2x, unc = d.estimate2x(now_us, WINDOW_US)
        exact = int((pdf["ts_us"] > now_us - WINDOW_US).sum())
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "exact_recent": [exact],
                "within_uncertainty": [abs(2 * exact - est2x) <= unc],
                "rel_bound_ok": [unc * K <= max(K, 2 * exact)],
            }
        )

    return ev.groupBy("event_type").applyInPandas(
        run,
        schema="event_type string, exact_recent long, within_uncertainty boolean, rel_bound_ok boolean",
    )


DGIM_SLIDING_SQL = """
WITH m AS (SELECT MAX(ts) AS now_ts FROM events)
SELECT event_type,
       CAST(SUM(CASE WHEN ts > now_ts - INTERVAL 7 DAY THEN 1 ELSE 0 END) AS BIGINT)
         AS exact_recent,
       TRUE AS within_uncertainty,
       TRUE AS rel_bound_ok
FROM events, m GROUP BY event_type
"""


def hll_intersection_users(spark, sf_dir):
    """|click ∩ purchase| distinct users via HLL inclusion–exclusion:
    two independently-built mergeable sketches plus their LOSSLESS blob
    union (register-wise max), intersection = est(A) + est(B) − est(A∪B).
    This is the composable form KMV set algebra can't reach once
    capacity truncates (kmv_user_overlap asserts its domain fits k; HLL
    IE has no such cliff — it trades the cliff for an additive error).
    The IE estimate inherits at most the summed absolute errors of its
    three terms, so the gate pins |est − exact∩| ≤ rb·(|A| + |B| +
    |A∪B|) with rb the published 1.04/√m bound, alongside the exact
    counts as cross-engine anchors (measured slack ≤ 0.15·bound at
    sf0.001–0.1)."""
    _ensure_shipped(spark)
    from ip_filter_spark.engine import SketchSpec, build_and_merge

    ev = _t(spark, sf_dir, "events")
    spec = SketchSpec("hll", {"p": 14})
    sk = {}
    for et in ("click", "purchase"):
        sk[et] = build_and_merge(
            ev.where(F.col("event_type") == et), [spec], key=F.col("user_id").cast("string")
        )[spec.key()]
    union = sk["click"].merge(sk["purchase"])
    est_i = sk["click"].estimate() + sk["purchase"].estimate() - union.estimate()

    flags = ev.where(F.col("event_type").isin("click", "purchase")).groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("has_a"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("has_b"),
    )
    ex = flags.agg(
        F.sum("has_a").cast("long").alias("a"),
        F.sum("has_b").cast("long").alias("b"),
        F.count("*").cast("long").alias("u"),
        F.sum(F.col("has_a") * F.col("has_b")).cast("long").alias("i"),
    ).first()
    rb = sk["click"].rel_error_bound()
    within = abs(est_i - ex["i"]) <= rb * (ex["a"] + ex["b"] + ex["u"])
    return spark.createDataFrame(
        [(int(ex["a"]), int(ex["b"]), int(ex["i"]), bool(within))],
        "click_users long, purchase_users long, overlap_users long, within_ie_bound boolean",
    )


HLL_INTERSECTION_SQL = """
WITH flags AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS has_a,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_b
  FROM events WHERE event_type IN ('click', 'purchase') GROUP BY user_id)
SELECT CAST(SUM(has_a) AS BIGINT) AS click_users,
       CAST(SUM(has_b) AS BIGINT) AS purchase_users,
       CAST(SUM(has_a * has_b) AS BIGINT) AS overlap_users,
       TRUE AS within_ie_bound
FROM flags
"""


def bloom_cardinality_users(spark, sf_dir):
    """Distinct users estimated FROM THE BLOOM BLOB ALONE — the
    Swamidass–Baldi fill-ratio inversion n̂ = −(m/k)·ln(1 − X/m) (X =
    popcount).  The operational 'how many distinct keys has this
    deployed filter absorbed / how much headroom is left' probe when
    re-counting the corpus would be a full re-scan: the filter built
    for membership answers cardinality for free.  Gate: the exact
    distinct count (cross-engine anchor) + the estimate within 5% —
    at gate fills (X/m ≪ 1) collisions are negligible and measured
    error is < 1% at sf0.001–0.1; the filter itself is the standard
    distributed build (partials → OR-merge)."""
    _ensure_shipped(spark)
    from ip_filter_spark.engine import SketchSpec, build_and_merge

    ev = _t(spark, sf_dir, "events")
    spec = SketchSpec("bloom", {"fpp": 1e-3, "n": 1_000_000})
    sk = build_and_merge(ev, [spec], key=F.col("user_id").cast("string"))[spec.key()]
    est = sk.cardinality_estimate()
    exact = ev.select(F.countDistinct("user_id")).first()[0]
    within = abs(est - exact) / exact <= 0.05
    return spark.createDataFrame(
        [(int(exact), bool(within))],
        "exact_distinct long, estimate_within_5pct boolean",
    )


BLOOM_CARDINALITY_SQL = """
SELECT COUNT(DISTINCT user_id) AS exact_distinct, TRUE AS estimate_within_5pct FROM events
"""


__all__ = [
    "salted_event_type_stats",
    "SALTED_STATS_SQL",
    "distinct_users_exact",
    "DISTINCT_USERS_SQL",
    "hll_distinct_users",
    "HLL_SQL",
    "hll_users_by_type",
    "HLL_BY_TYPE_SQL",
    "sql_udaf_users_by_type",
    "SQL_UDAF_BY_TYPE_SQL",
    "sliding_distinct_users",
    "SLIDING_DISTINCT_SQL",
    "hll_rollup_users",
    "HLL_ROLLUP_SQL",
    "cms_event_counts",
    "CMS_SQL",
    "cms_join_size_events_orders",
    "CMS_JOIN_SIZE_SQL",
    "_quantile_sketch_query",
    "kll_price_quantiles",
    "tdigest_price_quantiles",
    "QUANTILE_BOUND_SQL",
    "tdigest_by_priority",
    "TDIGEST_BY_PRIORITY_SQL",
    "sql_udaf_price_quantiles",
    "SQL_UDAF_PRICE_QUANTILES_SQL",
    "bloom_membership",
    "BLOOM_SQL",
    "cbf_duplicate_counts",
    "CBF_SQL",
    "cbf_deletion_membership",
    "CBF_DELETION_SQL",
    "cuckoo_deletion_membership",
    "CUCKOO_DELETION_SQL",
    "mg_top_langs",
    "MG_TOP_LANGS_SQL",
    "mg_heavy_users",
    "MG_HEAVY_USERS_SQL",
    "kmv_user_overlap",
    "KMV_OVERLAP_SQL",
    "bloom_semijoin_customers",
    "BLOOM_SEMIJOIN_SQL",
    "bucketed_join_segment_revenue",
    "BUCKETED_JOIN_SQL",
    "salted_join_event_enrichment",
    "SALTED_JOIN_SQL",
    "cms_topk_users",
    "CMS_TOPK_SQL",
    "ams_f2_events",
    "AMS_F2_SQL",
    "bloom_anti_join_customers",
    "BLOOM_ANTI_JOIN_SQL",
    "sql_udaf_shipping_quantiles",
    "SQL_UDAF_SHIPPING_QUANTILES_SQL",
    "ddsketch_order_quantiles",
    "DDSKETCH_ORDER_SQL",
    "sql_udaf_order_value_medians",
    "SQL_UDAF_ORDER_VALUE_SQL",
    "native_approx_distinct_events",
    "NATIVE_APPROX_DISTINCT_SQL",
    "native_approx_quantiles_events",
    "NATIVE_APPROX_QUANTILES_SQL",
    "cms_conservative_users",
    "CMS_CONSERVATIVE_SQL",
    "dgim_sliding_counts_events",
    "DGIM_SLIDING_SQL",
    "hll_intersection_users",
    "HLL_INTERSECTION_SQL",
    "bloom_cardinality_users",
    "BLOOM_CARDINALITY_SQL",
]
