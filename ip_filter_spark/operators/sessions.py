"""Sessionization — gap-threshold session assignment over an event log.

The standard log/training-pipeline operator the reference's traffic
tooling stops short of (its generators emit flat traffic,
``/root/reference/data/generate_traffic.py``): group each key's events
into sessions, where a new session starts whenever the gap to the
previous event exceeds ``gap_s``.

Spark-first shape: ONE shuffle (the window partition on ``key``), then
two window functions over the same sorted run — ``lag`` to flag session
starts and a running ``sum`` of those flags to number sessions. Both
windows share one partitioning + sort, so Catalyst plans a single
Window node pair over a single Exchange; no UDF, no second shuffle.

At 100 TB: the shuffle is keyed by ``key`` (user), whose cardinality is
huge relative to executor count, so partitions stay balanced unless one
key dominates; a pathological single-key log degenerates to one task by
construction (session numbering is a strictly sequential scan per key —
the same bound any engine has). Per-key state is a sort run, spillable
by Spark's ExternalSorter, not accumulated in memory.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    tie_break: Sequence[str] = ("event_id",),
    gap_s: int = 1800,
    out_col: str = "session_idx",
) -> DataFrame:
    """Add ``out_col``: 1-based session index per ``key``, new session
    when the gap since the previous event exceeds ``gap_s`` seconds.

    ``tie_break`` columns make the within-key order total (deterministic
    numbering when timestamps collide).
    """
    epoch = F.col(ts).cast("timestamp").cast("long")
    w = Window.partitionBy(key).orderBy(ts, *tie_break)
    gap = epoch - F.lag(epoch).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out_col, F.sum(is_new).over(run))


def session_stats(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    tie_break: Sequence[str] = ("event_id",),
    gap_s: int = 1800,
) -> DataFrame:
    """Per-session summary: (key, session_idx, n_events, start_s, end_s,
    duration_s). One window shuffle + one aggregate on the same key —
    the aggregate reuses the window's hash partitioning (no second
    exchange of the full log)."""
    epoch_col = F.col(ts).cast("timestamp").cast("long")
    sess = sessionize(df, key=key, ts=ts, tie_break=tie_break, gap_s=gap_s)
    return sess.groupBy(key, "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min(epoch_col).alias("start_s"),
        F.max(epoch_col).alias("end_s"),
        (F.max(epoch_col) - F.min(epoch_col)).alias("duration_s"),
    )


def funnel_milestones(
    df: DataFrame,
    steps: Sequence[str],
    key: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel milestones: for each key, the timestamp of the
    FIRST occurrence of step i that is STRICTLY after the key's step
    i-1 milestone (step 0 is the key's first step-0 event). Keys that
    never complete step i carry null from column ``t{i}`` on — the
    standard conversion-funnel semantics (view -> click -> purchase),
    here as a deterministic exact operator rather than a BI-tool
    approximation. Returns one row per distinct key:
    (key, t0, t1, ..., t{len(steps)-1}).

    Shape: step i is filter -> join on key -> min aggregate. Every join
    and aggregate is keyed by ``key``, so after the first Exchange the
    hash partitioning is reusable across all steps (Catalyst's
    EnsureRequirements sees matching distributions); per-step
    intermediate size is <= one row per key that reached the previous
    step — monotonically shrinking. The sequential dependency between
    steps is inherent to the semantics (step i's threshold IS step
    i-1's answer); the alternative single-window form would need a
    per-key ordered scan carrying funnel state, which is the same work
    with worse skew behavior.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    out = df.select(F.col(key).alias("__u")).distinct()
    prev = None
    for i, step in enumerate(steps):
        ev_s = df.where(F.col(type_col) == step).select(
            F.col(key).alias("__u"), F.col(ts).alias("__t")
        )
        if prev is None:
            m = ev_s.groupBy("__u").agg(F.min("__t").alias(f"t{i}"))
        else:
            m = (
                ev_s.join(out.select("__u", prev).where(F.col(prev).isNotNull()), "__u")
                .where(F.col("__t") > F.col(prev))
                .groupBy("__u")
                .agg(F.min("__t").alias(f"t{i}"))
            )
        out = out.join(m, "__u", "left")
        prev = f"t{i}"
    return out.withColumnRenamed("__u", key)
