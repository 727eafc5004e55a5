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
