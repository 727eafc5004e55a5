"""Streaming exact deduplication: dropDuplicates state over a content key.

Batch exact dedup (operators/dedup.py) is one shuffle; the streaming form
keeps a state store keyed by the content sha so every micro-batch emits
only first-seen documents — the ingest-time half of a training-data
pipeline (dedup at arrival, not in a nightly batch job).

State growth: keyed state holds one entry per distinct key forever when
no watermark is set — correct for bounded replays (availableNow backfill)
and for keyspaces that fit the state store. For unbounded streams use
``within_watermark`` with an event-time column: Spark's
dropDuplicatesWithinWatermark then evicts keys older than the watermark,
trading unbounded-history dedup for bounded state (duplicates arriving
inside the watermark window are still caught — the practical guarantee a
late-data pipeline needs)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_exact_dedup(
    stream_df: DataFrame,
    key_cols: list[str],
    out_dir: str,
    checkpoint_dir: str,
    within_watermark: tuple[str, str] | None = None,
    trigger_available_now: bool = True,
):
    """Start a streaming query writing first-seen rows to ``out_dir``.

    within_watermark: optional (ts_col, delay) enabling bounded-state
    dedup via dropDuplicatesWithinWatermark."""
    if within_watermark is not None:
        ts_col, delay = within_watermark
        deduped = stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp")).withWatermark(
            ts_col, delay
        ).dropDuplicatesWithinWatermark(key_cols)
    else:
        deduped = stream_df.dropDuplicates(key_cols)
    writer = deduped.writeStream.outputMode("append").option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(out_dir, format="parquet")
