"""Structured Streaming integration.

Two capabilities:

- ``stream_sketch_build``: incremental sketch maintenance over a stream.
  Each micro-batch runs the same Arrow-vectorized partial build as the
  batch engine and *appends* blob rows (batch_id in lineage) to a partial
  store; because every sketch's merge is associative+commutative, the
  current global sketch is always just a merge over the store — no
  stateful operator, no replays, restart-safe via the streaming
  checkpoint. (This is the streaming analog of the reference's offline
  rebuild pipeline, /root/reference/setup.py:63-84, which had to rerun
  from scratch.)

- ``windowed_event_counts``: standard watermarked windowed aggregation,
  the built-in-operator path for late-data-tolerant counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ip_filter_spark.engine import SKETCH_ROW_SCHEMA, SketchSpec, build_partials, collect_sketches, tree_merge
from ip_filter_spark.sketches.base import Sketch


def stream_sketch_build(
    stream_df: DataFrame,
    specs: list[SketchSpec],
    store_dir: str,
    checkpoint_dir: str,
    key=None,
    value=None,
    trigger_available_now: bool = True,
):
    """Start a streaming query that maintains per-batch sketch partials.

    Returns the StreamingQuery. The partial store grows by one row per
    (spec, partition, batch); compact it by replacing with tree_merge
    output when it gets large."""

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        partials = build_partials(batch_df, specs, key=key, value=value)
        (
            partials.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("append")
            .parquet(store_dir)
        )

    writer = stream_df.writeStream.foreachBatch(handle_batch).option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def merged_sketches_from_store(spark: SparkSession, store_dir: str, specs: list[SketchSpec]) -> dict[str, Sketch]:
    """Current global sketches = associative merge over all stored partials."""
    partials = spark.read.parquet(store_dir).drop("batch_id")
    merged = tree_merge(partials)
    got = collect_sketches(merged)
    from ip_filter_spark.engine import _params_hash

    return {s.key(): got[f"{s.sketch}:{_params_hash(s.params)}"] for s in specs}


def windowed_event_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts — late rows beyond the watermark
    are dropped by the engine; state is bounded. TIMESTAMP_NTZ columns are
    cast to TIMESTAMP (watermarks require an event-time zone)."""
    stream_df = stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            key_col,
            "n",
            "total_value",
        )
    )


def stream_heavy_hitters(
    stream_df: DataFrame,
    key_col: str,
    store_dir: str,
    checkpoint_dir: str,
    capacity: int = 64,
    trigger_available_now: bool = True,
):
    """Streaming Misra–Gries: each micro-batch appends per-partition MG
    partial summaries to the store; the current global heavy-hitter
    summary is a merge over the store (``merged_heavy_hitters``). The
    deterministic bound degrades gracefully — err is additive over
    merges, still <= n_total/(capacity+1) — and restarts replay nothing
    (streaming checkpoint + append-only store)."""
    from ip_filter_spark.operators.topk import mg_partials

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            mg_partials(batch_df, key_col, capacity=capacity)
            .withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("append")
            .parquet(store_dir)
        )

    writer = stream_df.writeStream.foreachBatch(handle_batch).option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def merged_heavy_hitters(spark: SparkSession, store_dir: str):
    """Current global Misra–Gries summary = merge over all stored
    partials (associative, so read order is irrelevant to the bound)."""
    from ip_filter_spark.sketches import from_bytes

    merged = tree_merge(spark.read.parquet(store_dir).drop("batch_id")).collect()
    out = from_bytes(bytes(merged[0].payload))
    for row in merged[1:]:
        out = out.merge(from_bytes(bytes(row.payload)))
    return out


def compact_store(spark: SparkSession, store_dir: str) -> int:
    """Replace the append-only partial store with its tree-merged
    equivalent — one row per (sketch, params_hash) — so merge-on-read
    stays O(1) on an unbounded stream instead of growing by one blob per
    (spec, partition, micro-batch). Safe between streaming runs: merge
    associativity means (compact, then merge with new partials) equals
    merging everything. Returns the number of rows after compaction.

    Write protocol: materialize merged rows on the driver (KB–MB — one
    blob per spec), then overwrite; the store is only ever read between
    jobs, and the streaming checkpoint (not the store) carries source
    progress, so a crash between write and read just re-compacts."""
    merged = tree_merge(spark.read.parquet(store_dir).drop("batch_id")).collect()
    # explicit schema: Row-based inference widens partition_id to bigint
    # and the next read would mismatch the appended partials' int32
    out = spark.createDataFrame(merged, schema=SKETCH_ROW_SCHEMA)
    out = out.withColumn("batch_id", F.lit(-1).cast("int"))  # lineage: compacted row
    out.coalesce(1).write.mode("overwrite").parquet(store_dir)
    return len(merged)
