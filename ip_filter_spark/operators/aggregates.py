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
    order_col: str | list[str] | tuple[str, ...],
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

    ``order_col`` may be one column name or a list: the COMBINATION must
    be globally unique (ties would make any engine's running sum
    ill-defined — same contract as SQL ``SUM() OVER (ORDER BY ...)``
    reproducibility). With a composite key, quantile boundaries come
    from the FIRST column only — rows tying on it always land in the
    same bucket (assignment reads just that value), so the within-bucket
    window ordering by the full composite still yields the exact global
    order without needing a single sortable surrogate (which would risk
    overflow when packing wide columns into one BIGINT).
    """
    from pyspark.sql import Window

    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    lead = order_cols[0]
    spark = df.sparkSession
    n = int(num_buckets or spark.sparkContext.defaultParallelism)
    qs = [i / n for i in range(1, n)]
    bounds = (
        df.select(F.percentile_approx(lead, qs, 10_000).alias("b")).first()["b"]
        if n > 1
        else []
    )
    # strictly increasing literals (approx quantiles can repeat on tiny
    # inputs); bucket of a row = number of boundaries < its order value
    uniq = sorted(set(bounds or []))
    if uniq:
        barr = F.array(*[F.lit(b) for b in uniq])
        bucket = F.size(F.filter(barr, lambda b: b < F.col(lead)))
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
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t.join(F.broadcast(offsets), "__bucket")
        .withColumn(out_col, F.sum(F.col(value_col)).over(w_local) + F.col("__offset"))
        .drop("__bucket", "__offset")
    )


def distributed_ntile(
    df: DataFrame,
    order_col: str | list[str] | tuple[str, ...],
    k: int,
    out_col: str = "tile",
    num_buckets: int | None = None,
) -> DataFrame:
    """ANSI ``NTILE(k)`` without the single-partition global window.

    Spark's own ``ntile`` over ``Window.orderBy(...)`` with no
    partitionBy funnels every row through ONE task — the same driver
    wall ``distributed_prefix_sum`` exists to avoid. This computes the
    identical tile assignment distributed: the global 1-based rank is a
    prefix sum of ones (two-phase scan, parallel in num_buckets), and
    the tile follows from (rank, n) alone via NTILE's exact size
    discipline — with q = n div k and rem = n mod k, tiles 1..rem hold
    q+1 rows and the rest hold q:

        rank <= rem*(q+1):  tile = (rank-1) div (q+1) + 1
        else:               tile = rem + 1 + (rank - rem*(q+1) - 1) div q

    The else-branch's q is never 0 when reached (n < k puts every row
    under the cutoff). Same contract as the prefix sum: the order-column
    combination must be globally unique, i.e. the caller supplies the
    deterministic tie-break NTILE reproducibility needs anyway.
    """
    ranked = distributed_prefix_sum(
        df.withColumn("__one", F.lit(1)),
        order_col,
        "__one",
        out_col="__rank",
        num_buckets=num_buckets,
    ).drop("__one")
    n_row = F.broadcast(df.agg(F.count(F.lit(1)).alias("__n")))
    tile = F.expr(
        f"CASE WHEN __rank <= (__n % {k}) * (__n div {k} + 1) "
        f"THEN (__rank - 1) div (__n div {k} + 1) + 1 "
        f"ELSE (__n % {k}) + 1 + "
        f"(__rank - (__n % {k}) * (__n div {k} + 1) - 1) div (__n div {k}) END"
    )
    return (
        ranked.crossJoin(n_row)
        .withColumn(out_col, tile.cast("int"))
        .drop("__rank", "__n")
    )
