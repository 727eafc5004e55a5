"""Stream-stream interval join — the streaming twin of
``operators/joins.py::range_join``.

Spark's stream-stream inner join buffers both sides in the state store
and emits a pair the moment the match arrives, regardless of arrival
order or micro-batch boundaries — so over a bounded replay the streaming
answer is provably the batch interval-join answer (the driver-gate query
``stream_range_join_equivalence`` pins full-value row equality against
the same DuckDB BETWEEN-join oracle that gates the batch operator).

Execution model at scale:

- Both sides shuffle on the equi key, so matching rows co-locate; the
  time-range predicate is evaluated within the key's state partition.
- ``withWatermark`` on BOTH event-time columns plus the time-range
  condition lets Spark compute a state-eviction bound per side: a
  buffered left row can be dropped once the right watermark passes
  ``left_ts + upper`` (and vice versa), so state is bounded by the rows
  inside one watermark horizon — not by stream length. A bounded replay
  whose file order is not time order needs the full span as the delay
  (nothing evictable mid-replay); production streams use their real
  disorder bound and get tight state.
- Inner joins emit in append mode WITHOUT waiting for the watermark
  (only eviction waits on it), so no sentinel row is needed to flush a
  bounded replay.
- LEFT OUTER joins additionally emit each unmatched left row with NULL
  right columns — but only once the watermark proves no future right
  match can arrive (global watermark past the row's match horizon), at
  which point the row is evicted and the null row emitted in the next
  (possibly no-data) micro-batch. A bounded replay therefore needs a
  later-than-everything sentinel row as the LAST file on EACH source
  (the global watermark is the minimum across sources) so the closing
  no-data batch flushes every real unmatched row; production streams
  emit nulls continuously as the watermark advances.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    upper_s: int,
    watermark_left: str,
    watermark_right: str,
    how: str = "inner",
) -> DataFrame:
    """The watermarked interval-join TRANSFORMATION (no sink): pairs
    where ``right_ts <= left_ts <= right_ts + upper_s`` for equal keys.
    Returned unsunk so callers can chain further stateful operators
    downstream (e.g. a windowed aggregate over the joined pairs — the
    left event-time column keeps its watermark through the join, which
    is what makes chained stateful stages legal). Column names must be
    disjoint across the two sides (the caller aliases)."""
    lw = left.withWatermark(left_ts, watermark_left)
    rw = right.withWatermark(right_ts, watermark_right)
    cond = (
        (F.col(left_on) == F.col(right_on))
        & (F.col(left_ts) >= F.col(right_ts))
        & (F.col(left_ts) <= F.col(right_ts) + F.expr(f"INTERVAL {int(upper_s)} SECONDS"))
    )
    return lw.join(rw, cond, how)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    upper_s: int,
    watermark_left: str,
    watermark_right: str,
    out_dir: str,
    checkpoint_dir: str,
    how: str = "inner",
) -> StreamingQuery:
    """Start an availableNow streaming join: ``interval_join`` appended
    to ``out_dir`` as parquet. ``how`` is ``inner`` or ``left_outer``;
    outer null emission waits on the watermark (see the module docstring
    for the bounded-replay sentinel requirement)."""
    return (
        interval_join(
            left, right, left_on=left_on, right_on=right_on, left_ts=left_ts,
            right_ts=right_ts, upper_s=upper_s, watermark_left=watermark_left,
            watermark_right=watermark_right, how=how,
        )
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
