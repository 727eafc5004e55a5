"""Streaming sessionization — native session windows over an unbounded
stream.

The streaming twin of ``operators/sessions.py``: Spark's
``F.session_window`` is the gap-based session operator that works
identically in batch and Structured Streaming, so the STREAMING answer
is provably the BATCH answer once the watermark passes a session's end
(the driver-gate query ``stream_session_equivalence`` pins exactly that:
full-value row equality against the batch/DuckDB session replica).

Execution model at scale:

- State is one open-session entry per (key, live session) in the state
  store, merged as events arrive; the watermark closes and EVICTS a
  session when it advances past ``session end = last event + gap``, so
  state is bounded by the number of keys active inside one watermark
  horizon — not by stream length.
- ``withWatermark(ts, delay)`` must cover the stream's event-time
  disorder: any event older than ``max_event_time - delay`` is dropped
  as late (append mode). Pick the delay from the source's real
  out-of-orderness; a replayed bounded table needs the FULL span (the
  gate query does this) because file order is not time order.
- Output mode is append: each finalized session is emitted exactly
  once, which is what makes the result a stable table (update mode
  would emit growing prefixes of each session).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery


def stream_session_stats(
    stream: DataFrame,
    *,
    key: str = "user_id",
    ts: str = "ts",
    gap: str = "30 minutes",
    watermark_delay: str = "1 hour",
    out_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Start an availableNow streaming query that appends one row per
    FINALIZED session — (key, session_window struct, n_events) — to
    ``out_dir`` as parquet. Sessions still open when the watermark stops
    advancing stay in state and are not emitted (feed a later-than-
    everything sentinel row to flush a bounded replay)."""
    agg = (
        stream.withWatermark(ts, watermark_delay)
        .groupBy(key, F.session_window(F.col(ts), gap))
        .agg(F.count("*").alias("n_events"))
    )
    return (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
