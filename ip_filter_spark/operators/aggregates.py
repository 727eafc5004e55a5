"""Skew-defusing aggregation — the two-phase salted groupBy.

Spark's hash aggregate already computes map-side partials, which
defuses skew for SIMPLE aggregates when upstream partitioning is
uncorrelated with the group key. The two cases where a hot key still
lands on one reducer — and where this operator is the standard fix —
are (a) input ALREADY partitioned/bucketed by the hot key (each task's
partial IS the whole key, so one reducer receives one giant partial
stream per hot key but, worse, holds its whole combine state), and
(b) aggregates whose per-group state is large (collect-style,
exact-distinct maps), where map-side combine doesn't shrink the
payload. Salting splits each group into ``n_salts`` sub-groups for the
first (wide, balanced) exchange; the second exchange moves only
``n_salts`` tiny partial rows per group.

The salt is hashed from high-entropy columns (engine.salted_repartition
uses the same rule): it must vary WITHIN a key — hashing the key itself
would map each group to one salt and spread nothing. Deterministic
(same rows → same placement), unlike rand()-salting.

Decimal partials keep double sums order-independent: partial sums are
exact DECIMAL(18,4) rationals, their re-sum is exact, and only the
final value is cast back to double — so the salted answer is
bit-identical to the unsalted one (and to the SQL oracle), which is
what makes the operator gateable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_group_stats(
    df: DataFrame,
    keys: Sequence[str],
    entropy: Sequence[str],
    value: str | None = None,
    n_salts: int = 32,
) -> DataFrame:
    """Per-``keys`` row count (``n``) and optional exact-decimal
    ``total_<value>`` computed via two-phase salted aggregation.
    ``entropy`` columns must be high-cardinality within each group
    (a row id, a hash input) so the salt actually spreads the group."""
    salt = (F.xxhash64(*entropy) % n_salts + n_salts) % n_salts
    partial_aggs = [F.count("*").alias("__n")]
    final_aggs = [F.sum("__n").alias("n")]
    if value is not None:
        partial_aggs.append(F.sum(F.col(value).cast("decimal(18,4)")).alias("__s"))
        final_aggs.append(F.sum("__s").cast("double").alias(f"total_{value}"))
    partials = df.groupBy(*keys, salt.alias("__salt")).agg(*partial_aggs)
    return partials.groupBy(*keys).agg(*final_aggs)


def distributed_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cum",
    num_buckets: int | None = None,
) -> DataFrame:
    """Global running sum of ``value_col`` in ``order_col`` order — the
    cumulative-sum primitive behind token-budget shard packing — WITHOUT
    the single-partition global window (``Window.orderBy`` with no
    partitionBy funnels the whole table through one task: a driver-wall
    at any scale past one executor).

    Classic two-phase distributed scan, expressed so correctness can
    never depend on physical partition placement:

    1. one boundary scan computes ``num_buckets - 1`` approximate
       quantiles of ``order_col``; the boundaries become plan LITERALS,
       so every later branch assigns rows to buckets identically no
       matter how AQE coalesces or whether the exchange is reused
       (``spark_partition_id()``-based variants break exactly there);
    2. a tiny per-bucket total + an O(num_buckets)-row running sum
       produces each bucket's global offset;
    3. the offsets broadcast-join back and a WITHIN-bucket window
       (partitionBy bucket — a parallel window) adds offset + local
       running sum.

    Every stage is parallel in num_buckets; the only serial work is the
    num_buckets-row offset window. Quantile boundaries keep buckets
    balanced, so no task sees more than ~|df|/num_buckets rows.

    ``order_col`` must be globally unique (ties would make any engine's
    running sum ill-defined — same contract as SQL ``SUM() OVER (ORDER
    BY ...)`` reproducibility).
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    n = int(num_buckets or spark.sparkContext.defaultParallelism)
    qs = [i / n for i in range(1, n)]
    bounds = (
        df.select(F.percentile_approx(order_col, qs, 10_000).alias("b")).first()["b"]
        if n > 1
        else []
    )
    # strictly increasing literals (approx quantiles can repeat on tiny
    # inputs); bucket of a row = number of boundaries < its order value
    uniq = sorted(set(bounds or []))
    if uniq:
        barr = F.array(*[F.lit(b) for b in uniq])
        bucket = F.size(F.filter(barr, lambda b: b < F.col(order_col)))
    else:
        bucket = F.lit(0)
    t = df.withColumn("__bucket", bucket)

    totals = t.groupBy("__bucket").agg(F.sum(F.col(value_col)).alias("__bsum"))
    w_off = Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__bucket", F.coalesce(F.sum("__bsum").over(w_off), F.lit(0)).alias("__offset")
    )
    w_local = (
        Window.partitionBy("__bucket")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t.join(F.broadcast(offsets), "__bucket")
        .withColumn(out_col, F.sum(F.col(value_col)).over(w_local) + F.col("__offset"))
        .drop("__bucket", "__offset")
    )
