"""Sequence analytics over event logs — activity islands and
transition (Markov) matrices.

Two classic user-behavior operators the reference's flat traffic
generators (``/root/reference/data/generate_traffic.py``) never need but
any training-data/product pipeline does:

- **Gaps-and-islands** (``activity_islands``): collapse each user's
  distinct active days into maximal runs of consecutive days ("streaks").
  The standard SQL trick — ``day - row_number()`` is constant within a
  consecutive run — makes the island id a pure expression over one
  sorted window, no iteration.
- **Transition matrix** (``transition_counts``): first-order Markov
  transition counts between consecutive event types per user, via one
  ``lag`` window.

Spark-first shape: both are ONE shuffle (the window partition on the
user key) followed by in-partition window functions and a hash
aggregate. At 100 TB the shuffle keys on the user id — high cardinality,
balanced — and per-user state is a sort run (spillable), never
accumulated. The transition aggregate's key space is |types|² (tiny), so
its final groupBy is map-side-combined down to almost nothing before the
second exchange.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def activity_islands(
    df: DataFrame,
    key: str = "user_id",
    day_col: str = "day",
) -> DataFrame:
    """Per-key streak summary over a (key, day) DataFrame (days need not
    be pre-deduplicated): ``longest_streak``, ``n_streaks``,
    ``n_active_days`` — all exact integers.

    Island id = ``day - row_number()`` over (key ORDER BY day) after
    dedup: consecutive days share it, any gap changes it. Two hash
    aggregates over the SAME key partitioning (key,grp → key), so
    Catalyst reuses one Exchange for the distinct, the window, and both
    groupBys.
    """
    days = df.select(key, day_col).distinct()
    w = Window.partitionBy(key).orderBy(day_col)
    isl = days.withColumn("_grp", F.col(day_col) - F.row_number().over(w))
    per_island = isl.groupBy(key, "_grp").agg(F.count("*").alias("_len"))
    return per_island.groupBy(key).agg(
        F.max("_len").alias("longest_streak"),
        F.count("*").alias("n_streaks"),
        F.sum("_len").alias("n_active_days"),
    )


def transition_counts(
    df: DataFrame,
    key: str = "user_id",
    state: str = "event_type",
    ts: str = "ts",
    tie_break: Sequence[str] = ("event_id",),
) -> DataFrame:
    """First-order transition counts: for each consecutive pair of
    events per key (ordered by ``ts`` with a deterministic integer
    tie-break), count (prev_state → state) occurrences and the number of
    distinct keys exhibiting each transition.

    One Exchange on ``key`` feeds the lag window; the pair groupBy's key
    space is |states|², so partial aggregation collapses it map-side.
    """
    w = Window.partitionBy(key).orderBy(ts, *tie_break)
    pairs = df.select(key, state, ts, *tie_break).withColumn(
        "prev_state", F.lag(state).over(w)
    )
    return (
        pairs.where(F.col("prev_state").isNotNull())
        .groupBy("prev_state", F.col(state).alias("next_state"))
        .agg(
            F.count("*").alias("n_transitions"),
            F.countDistinct(key).alias("n_users"),
        )
    )
