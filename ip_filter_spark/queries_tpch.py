"""TPC-H-shaped relational gates, batches 2+3: the decorrelation /
anti-join / disjunctive-pushdown patterns the first batch (queries.py
q1..q15) does not exercise. With q2/q11/q12/q20/q21 here, every one of the
22 TPC-H query patterns has a gated analog. Adapted to the trimmed testdata
schemas (no partsupp table — the distinct (l_partkey, l_suppkey) projection
of lineitem stands in for it; no l_commitdate/l_receiptdate — "shipped more
than N days after the order date" stands in for the late-delivery
predicate; no l_shipmode — l_returnflag classes stand in for q12's modes).

Same determinism discipline as queries.py: exact decimal sums exposed as
double, ratios as one final division over identical doubles, identical
aliases both engines.

Scale notes (100 TB posture) are in each docstring: which side broadcasts,
where the one unavoidable shuffle is, and why no plan degenerates into a
nested-loop or a driver collect.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ip_filter_spark.queries._shared import _dec_sum, _t


# ---------------------------------------------------------------------
# Q4 shape: EXISTS correlated subquery -> left-semi join (non-equi extra
# condition), then a tiny grouped count.
# ---------------------------------------------------------------------
def q4_order_priority_exists(spark, sf_dir):
    """Orders in a quarter with at least one lineitem shipped >30 days
    after the order date, counted per priority.

    r6 shape (guide §3.1): the EXISTS is computed as an INNER join with
    the quarter-filtered orders on the RIGHT plus countDistinct on the
    (unique) orderkey — semantically identical to the left-semi
    (o_orderkey is orders' primary key), but the semi form forces the
    6M-row lineitem through an orderkey Exchange because a left-semi
    can only broadcast its right (build) side, which there was lineitem.
    With orders as the build side the planner broadcasts the ~1/26
    quarter slice (sf-scale; SortMergeJoin -> BroadcastHashJoin, both
    lineitem Exchanges gone) and only the matched pairs reach the
    distinct aggregate. Past broadcastable scale the planner falls back
    to the same single orderkey shuffle the semi-join paid, with the
    non-equi date predicate still applied inside the join."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01")) & (F.col("o_orderdate") < F.lit("1996-10-01"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (o.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")
    )
    return (
        li.join(o, cond, "inner")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_orderkey").alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------
# Q7 shape: two-nation volume shipping — a 4-way join where both
# directions of a nation pair survive, grouped by (supp, cust, year).
# ---------------------------------------------------------------------
def q7_volume_shipping(spark, sf_dir):
    """Revenue flowing between NATION_1 and NATION_2 in either direction,
    by shipping year. lineitem->orders is the one fact-fact shuffle;
    supplier, customer and nation are dimension broadcasts (customer is
    the largest at ~1/10 of orders — still far under the broadcast
    threshold at any SF where orders shuffles; at true 100 TB customer
    would be bucketed alongside orders instead). The nation-pair filter
    is applied after both broadcasts resolve names, exactly as the
    reference SQL states it."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(n1), s.s_nationkey == F.col("sn_key"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(_dec_sum(rev, "revenue"))
    )


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM (
  SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
         CAST(YEAR(l_shipdate) AS BIGINT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    AND ((n2.n_name = 'NATION_1' AND n1.n_name = 'NATION_2')
      OR (n2.n_name = 'NATION_2' AND n1.n_name = 'NATION_1')))
GROUP BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------
# Q8 shape: market share — conditional numerator over a joined volume,
# one final division per group.
# ---------------------------------------------------------------------
def q8_market_share(spark, sf_dir):
    """NATION_5 suppliers' share of ECONOMY-part revenue sold to ASIA
    customers, per order year. Both the numerator (conditional) and the
    denominator are exact decimal sums, so the share is one deterministic
    double division. part/supplier/customer/nation/region all broadcast;
    the only shuffle is lineitem->orders and the final 2-row group."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY").select("p_partkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("c_regionkey")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA").select("r_regionkey")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_vol = F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(F.lit(0.0))
    g = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(r), F.col("c_regionkey") == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(_dec_sum(nation_vol, "nation_volume"), _dec_sum(vol, "total_volume"))
    )
    return g.select(
        "o_year",
        "nation_volume",
        "total_volume",
        (F.col("nation_volume") / F.col("total_volume")).alias("mkt_share"),
    )


Q8_SQL = """
WITH g AS (
  SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
         CAST(SUM(CAST(CASE WHEN n2.n_name = 'NATION_5'
                            THEN l_extendedprice * (1 - l_discount)
                            ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE) AS nation_volume,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS total_volume
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
  GROUP BY o_year)
SELECT o_year, nation_volume, total_volume,
       nation_volume / total_volume AS mkt_share
FROM g
"""


# ---------------------------------------------------------------------
# Q9 shape: product-line profit by supplier nation and year. The trimmed
# schema has no ps_supplycost; 10% of p_retailprice stands in for unit
# cost, kept exact in decimal.
# ---------------------------------------------------------------------
def q9_product_profit(spark, sf_dir):
    """Profit on widget parts by supplier nation and order year. amount =
    exact D(12,2) revenue product minus exact unit-cost product; the
    whole expression stays decimal until the final per-group cast. part
    and supplier broadcast; lineitem->orders is the shuffle. The LIKE
    '%widget%' filter prunes part before the broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").contains("widget"))
        .select("p_partkey", "p_retailprice")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(8,2)") - F.col("l_discount").cast("decimal(8,2)")
    )
    cost = (
        F.col("p_retailprice").cast("decimal(12,2)")
        * F.col("l_quantity").cast("decimal(8,2)")
        * F.lit(0.1).cast("decimal(2,1)")
    )
    amount = rev.cast("decimal(28,6)") - cost.cast("decimal(28,6)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


Q9_SQL = """
SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                     * (CAST(1 AS DECIMAL(8,2)) - CAST(l_discount AS DECIMAL(8,2))) AS DECIMAL(28,6))
              - CAST(CAST(p_retailprice AS DECIMAL(12,2))
                     * CAST(l_quantity AS DECIMAL(8,2))
                     * CAST(0.1 AS DECIMAL(2,1)) AS DECIMAL(28,6))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, o_year
"""


# ---------------------------------------------------------------------
# Q16 shape: distinct-count over a derived partsupp with a NOT IN
# anti-join excluding flagged suppliers.
# ---------------------------------------------------------------------
def q16_supplier_part_counts(spark, sf_dir):
    """Distinct suppliers per (brand, type, size) for mid-size non-PROMO
    parts, excluding suppliers in deficit (s_acctbal < 0) via a broadcast
    LEFT ANTI join — the NOT IN subquery decorrelated without a nested
    loop. The partsupp proxy (distinct partkey, suppkey pairs of
    lineitem) is one shuffle; countDistinct adds the second. At 100 TB
    the distinct and the count partial-aggregate map-side first."""
    ps = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#13")
        & (~F.col("p_type").startswith("PROMO"))
        & F.col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40)
    )
    bad = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        ps.join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13' AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------
# Q17 shape: correlated scalar subquery (per-part average) decorrelated
# into a pre-aggregated self-join.
# ---------------------------------------------------------------------
def q17_small_quantity_revenue(spark, sf_dir):
    """Average yearly revenue that would be lost by dropping small-lot
    orders of Brand#13 parts. The correlated AVG(l_quantity) per part
    becomes one grouped pre-aggregate joined back to lineitem — two scans
    of the brand's lineitems, no per-row subquery. The average is derived
    as exact-decimal sum / count so the 0.2x threshold is the identical
    double in both engines (a raw double AVG is summation-order
    dependent and diverges between engines)."""
    p = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#13").select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
    per_part = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double") / F.count("*")
        ).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(per_part), li.l_partkey == F.col("ap_key"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count("*").alias("n_small_lots"),
        )
    )


Q17_SQL = """
WITH li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#13'),
per_part AS (
  SELECT l_partkey AS ap_key,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty
  FROM li GROUP BY l_partkey)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0 AS avg_yearly,
       COUNT(*) AS n_small_lots
FROM li JOIN per_part ON l_partkey = ap_key
WHERE l_quantity < 0.2 * avg_qty
"""


# ---------------------------------------------------------------------
# Q18 shape: HAVING-filtered IN subquery -> grouped fact filtered on its
# own aggregate, joined back to the dimensions.
# ---------------------------------------------------------------------
def q18_large_volume_customers(spark, sf_dir):
    """Customers whose orders total more than 250 units. The IN (GROUP BY
    ... HAVING) subquery is the grouped lineitem itself filtered on its
    aggregate, then joined back to orders/customer — the aggregate is the
    semi-join. One shuffle on orderkey for the group, the join reuses
    that partitioning; customer broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(_dec_sum(F.col("l_quantity"), "total_qty"))
        .where(F.col("total_qty") > 250)
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            "total_qty",
        )
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey,
       STRFTIME(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_totalprice, total_qty
FROM (SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING total_qty > 250)
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# ---------------------------------------------------------------------
# Q19 shape: disjunction of conjunctive predicates across a join —
# the OR-of-ANDs must still push the shared part filter into the scan.
# ---------------------------------------------------------------------
def q19_disjunctive_revenue(spark, sf_dir):
    """Revenue from three brand/size/quantity channels. The disjunction
    spans join-side pairs, so it can only be evaluated post-join, but
    each disjunct's part-side half (brand + size range) and the shared
    quantity envelope (1..40) push into the scans; part broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    d1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(1, 15)
    )
    d2 = (
        (F.col("p_brand") == "Brand#11")
        & F.col("p_size").between(5, 20)
        & F.col("l_quantity").between(10, 25)
    )
    d3 = (
        (F.col("p_brand") == "Brand#21")
        & F.col("p_size").between(15, 35)
        & F.col("l_quantity").between(25, 40)
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(d1 | d2 | d3)
        .agg(_dec_sum(rev, "revenue"), F.count("*").alias("n_items"))
    )


Q19_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1  AND 10 AND l_quantity BETWEEN 1  AND 15)
   OR (p_brand = 'Brand#11' AND p_size BETWEEN 5  AND 20 AND l_quantity BETWEEN 10 AND 25)
   OR (p_brand = 'Brand#21' AND p_size BETWEEN 15 AND 35 AND l_quantity BETWEEN 25 AND 40)
"""


# ---------------------------------------------------------------------
# Q22 shape: scalar subquery threshold + NOT EXISTS anti-join.
# ---------------------------------------------------------------------
def q22_sales_opportunity(spark, sf_dir):
    """Well-funded customers (balance above the positive-balance average)
    who never ordered, grouped by nation. The scalar AVG is a one-row
    broadcast cross join (computed once, exact decimal sum / count); the
    NOT EXISTS is a LEFT ANTI join against orders' custkey projection.
    Anti-join shuffles on custkey — at 100 TB orders' projection
    pre-aggregates to distinct custkeys map-side."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    thresh = (
        c.where(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double") / F.count("*")
            ).alias("avg_bal")
        )
    )
    return (
        c.join(F.broadcast(thresh))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("numcust"), _dec_sum(F.col("c_acctbal"), "totacctbal"))
    )


Q22_SQL = """
SELECT n_name, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY n_name
"""


# ---------------------------------------------------------------------
# Q2 shape: correlated MIN subquery (cheapest supplier per part) ->
# per-part min + equality join-back, deterministic tie-break.
# ---------------------------------------------------------------------
def q2_min_cost_supplier(spark, sf_dir):
    """For STANDARD parts under size 25, the ASIA supplier with the lowest
    account balance (the trimmed schema's supply-cost stand-in) among those
    who actually supply the part (distinct lineitem pairs = the partsupp
    proxy). The correlated MIN decorrelates into a per-part MIN aggregate
    joined back on (partkey, balance) equality; ties break on MIN(suppkey)
    so the answer is deterministic. part and the region-filtered supplier
    both broadcast; the partsupp-proxy distinct is the one big shuffle,
    and the min/join-back reuse its partkey partitioning. Balance equality
    is exact: both sides compare the same stored float, never a
    recomputed expression."""
    ps = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = (
        _t(spark, sf_dir, "part")
        .where((F.col("p_type") == "STANDARD") & (F.col("p_size") < 25))
        .select("p_partkey", "p_name", "p_size")
    )
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA").select("r_regionkey")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    sup = ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey).join(
        F.broadcast(s), ps.l_suppkey == F.col("s_suppkey")
    )
    min_bal = sup.groupBy(F.col("p_partkey").alias("mb_key")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    best = (
        sup.join(
            F.broadcast(min_bal),
            (sup.p_partkey == F.col("mb_key")) & (sup.s_acctbal == F.col("min_bal")),
        )
        .groupBy("p_partkey", "p_name", "p_size", "min_bal")
        .agg(F.min("s_suppkey").alias("s_suppkey"))
    )
    return (
        best.join(F.broadcast(s.select("s_suppkey", "s_name", "n_name")), "s_suppkey")
        .select(
            "p_partkey",
            "p_name",
            "p_size",
            "s_suppkey",
            "s_name",
            "n_name",
            F.col("min_bal").alias("s_acctbal"),
        )
    )


Q2_SQL = """
WITH sup AS (
  SELECT p_partkey, p_name, p_size, s_suppkey, s_name, s_acctbal, n_name
  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE p_type = 'STANDARD' AND p_size < 25 AND r_name = 'ASIA'),
m AS (SELECT p_partkey AS mb_key, MIN(s_acctbal) AS min_bal FROM sup GROUP BY 1),
b AS (
  SELECT p_partkey, p_name, p_size, min_bal, MIN(s_suppkey) AS s_suppkey
  FROM sup JOIN m ON p_partkey = mb_key AND s_acctbal = min_bal
  GROUP BY 1, 2, 3, 4)
SELECT b.p_partkey, b.p_name, b.p_size, b.s_suppkey, s.s_name, s.n_name,
       b.min_bal AS s_acctbal
FROM b JOIN (SELECT DISTINCT s_suppkey, s_name, n_name FROM sup) s
  ON b.s_suppkey = s.s_suppkey
"""


# ---------------------------------------------------------------------
# Q11 shape: grouped value filtered against a scalar aggregate of the
# SAME derived table (important stock). The threshold comparison is done
# in exact integer cents (value*10^4) so no double summation order or
# decimal-division rounding can flip a borderline group between engines.
# ---------------------------------------------------------------------
def q11_important_parts(spark, sf_dir):
    """Parts whose shipped value (sum of extendedprice*quantity over
    solvent suppliers' lines) exceeds twice the mean part value. The
    scalar subquery over the same aggregate becomes a one-row broadcast
    cross join; the filter `value_cents * n_parts > 2 * total_cents`
    stays in BIGINT so both engines evaluate the identical integers.
    supplier broadcasts; the per-part group is the one shuffle and
    partial-aggregates map-side at 100 TB."""
    li = _t(spark, sf_dir, "lineitem")
    sv = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") >= 0).select("s_suppkey")
    val = F.col("l_extendedprice") * F.col("l_quantity")
    v = (
        li.join(F.broadcast(sv), li.l_suppkey == sv.s_suppkey)
        .groupBy("l_partkey")
        .agg(
            (F.sum(val.cast("decimal(18,4)")) * 10000).cast("bigint").alias("value_cents")
        )
    )
    tot = v.agg(
        F.sum("value_cents").alias("total_cents"), F.count("*").alias("n_parts")
    )
    return (
        v.join(F.broadcast(tot))
        .where(F.col("value_cents") * F.col("n_parts") > 2 * F.col("total_cents"))
        .select("l_partkey", (F.col("value_cents") / 10000.0).alias("part_value"))
    )


Q11_SQL = """
WITH v AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,4))) * 10000 AS BIGINT)
           AS value_cents
  FROM lineitem
  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal >= 0)
  GROUP BY l_partkey),
t AS (SELECT SUM(value_cents) AS total_cents, COUNT(*) AS n_parts FROM v)
SELECT l_partkey, value_cents / 10000.0 AS part_value
FROM v, t
WHERE value_cents * n_parts > 2 * total_cents
"""


# ---------------------------------------------------------------------
# Q12 shape: fact-fact join + dual conditional counts per class (the
# trimmed schema has no l_shipmode; l_returnflag is the class column and
# ">45 days after order date" the late predicate).
# ---------------------------------------------------------------------
def q12_late_lines_by_flag(spark, sf_dir):
    """Per return flag, how many 1997-shipped late lines belong to
    critical (URGENT/HIGH) vs other orders. One shuffle joining the
    pruned lineitem scan to orders on orderkey; the two counts are
    CASE-conditional sums in a single aggregate pass."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01")) & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(late)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(crit, 0).otherwise(1)).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
            AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > o_orderdate + INTERVAL 45 DAY
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------
# Q20 shape: nested semi-join chain with a correlated aggregate
# threshold (suppliers with excess stock of a named part family).
# ---------------------------------------------------------------------
def q20_excess_suppliers(spark, sf_dir):
    """Solvent suppliers who shipped more than 30% of their all-time
    quantity of bolt parts during 1997. The correlated threshold
    (per-pair 1997 quantity vs total quantity) is one grouped aggregate
    with a conditional partial — no second scan — and the comparison is
    exact integer deci-units (qty*10) so no float ratio is evaluated.
    The qualifying pair set semi-joins supplier via a broadcast of the
    DISTINCT suppkeys (bounded by |supplier|, tiny)."""
    p = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").contains("bolt"))
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(p), F.col("l_partkey") == p.p_partkey
    )
    in97 = (F.col("l_shipdate") >= F.lit("1997-01-01")) & (
        F.col("l_shipdate") < F.lit("1998-01-01")
    )
    qty_d = F.col("l_quantity").cast("decimal(18,4)")
    pairs = li.groupBy("l_partkey", "l_suppkey").agg(
        (F.sum(F.when(in97, qty_d).otherwise(F.lit(0).cast("decimal(18,4)"))) * 10)
        .cast("bigint")
        .alias("qty97_deci"),
        (F.sum(qty_d) * 10).cast("bigint").alias("qty_total_deci"),
    )
    excess = (
        pairs.where(F.col("qty97_deci") * 10 > 3 * F.col("qty_total_deci"))
        .select("l_suppkey")
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") > 0)
    return (
        s.join(F.broadcast(excess), s.s_suppkey == excess.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
    )


Q20_SQL = """
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE s_acctbal > 0
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                            AND l_shipdate < TIMESTAMP '1998-01-01'
                           THEN CAST(l_quantity AS DECIMAL(18,4))
                           ELSE CAST(0 AS DECIMAL(18,4)) END) * 10 AS BIGINT)
               AS qty97_deci,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) * 10 AS BIGINT)
               AS qty_total_deci
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%')
      GROUP BY l_partkey, l_suppkey)
    WHERE qty97_deci * 10 > 3 * qty_total_deci)
"""


# ---------------------------------------------------------------------
# Q21 shape: EXISTS + NOT EXISTS self-joins on the fact table (suppliers
# who kept multi-supplier orders waiting). The oracle keeps the literal
# EXISTS/NOT EXISTS form; the Spark plan decorrelates both into one
# per-order aggregate — the scalable rewrite.
# ---------------------------------------------------------------------
def q21_waiting_suppliers(spark, sf_dir):
    """Suppliers who were the SOLE late supplier (>60 days after order
    date) on a finalized multi-supplier order, with the number of such
    orders. EXISTS(another supplier on the order) becomes
    n_suppliers > 1; NOT EXISTS(another LATE supplier) becomes
    n_late_suppliers = 1 (the late row's own supplier is late, so
    'exactly one' == 'no other'). Both counts come from ONE per-order
    aggregate over the joined fact — no self-joins of lineitem at scale;
    the orderkey shuffle is reused by the aggregate and the join-back.
    supplier broadcasts for the name."""
    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    # r6: two countDistinct on the same aggregate planned an Expand (2x
    # the joined fact into the orderkey Exchange); the two-level form —
    # per (orderkey, suppkey) first (map-side partial combine), then per
    # orderkey — computes the identical counts (distinct suppkeys = rows
    # of the first level; 'any late row' = max(late) per supplier) with
    # no Expand and an un-doubled exchange (guide §2.3 'aggregate before
    # you shuffle').
    per_supp = li.groupBy(F.col("l_orderkey").alias("po_key"), "l_suppkey").agg(
        F.max(late.cast("int")).alias("sup_late")
    )
    per_order = per_supp.groupBy("po_key").agg(
        F.count("*").alias("n_supp"),
        F.sum("sup_late").alias("n_late_supp"),
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        li.where(late)
        .join(
            per_order.where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)),
            F.col("l_orderkey") == F.col("po_key"),
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
    )


Q21_SQL = """
SELECT s_name, COUNT(DISTINCT l1.l_orderkey) AS numwait
FROM lineitem l1
JOIN orders ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
"""


TPCH2_QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q11_important_parts": q11_important_parts,
    "q12_late_lines_by_flag": q12_late_lines_by_flag,
    "q20_excess_suppliers": q20_excess_suppliers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q4_order_priority_exists": q4_order_priority_exists,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q18_large_volume_customers": q18_large_volume_customers,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q22_sales_opportunity": q22_sales_opportunity,
}

TPCH2_ORACLES = {
    "q2_min_cost_supplier": Q2_SQL,
    "q11_important_parts": Q11_SQL,
    "q12_late_lines_by_flag": Q12_SQL,
    "q20_excess_suppliers": Q20_SQL,
    "q21_waiting_suppliers": Q21_SQL,
    "q4_order_priority_exists": Q4_SQL,
    "q7_volume_shipping": Q7_SQL,
    "q8_market_share": Q8_SQL,
    "q9_product_profit": Q9_SQL,
    "q16_supplier_part_counts": Q16_SQL,
    "q17_small_quantity_revenue": Q17_SQL,
    "q18_large_volume_customers": Q18_SQL,
    "q19_disjunctive_revenue": Q19_SQL,
    "q22_sales_opportunity": Q22_SQL,
}
