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
