"""Streaming CDC: maintain a latest-state snapshot incrementally.

``foreachBatch`` advances a persisted snapshot table: for micro-batch N,
``snapshot_N = upsert_snapshot(newest complete snapshot older than N,
batch-N delta)``. Snapshot directories are BATCH-ID-KEYED, so a replayed
batch deterministically rewrites its own snapshot from the same inputs —
the exactly-once discipline the sketch stream's partial stores use
(streaming/sketch_stream.py), applied to relational state. Readers take
the newest COMPLETE snapshot (``_SUCCESS`` marker); a crash mid-write
leaves an incomplete dir that the retry overwrites.

Scale shape: each micro-batch costs O(delta + snapshot) — the delta
compacts with a WindowGroupLimit top-1 per key (shuffle O(batch keys)),
the merge is one union + top-1 per key over the previous snapshot.
History is NEVER rescanned; an hour of downtime costs one bigger delta,
not a rebuild. ``keep_last`` prunes superseded snapshot dirs so storage
is O(keep_last · keys), not O(batches).

Directory bookkeeping uses the local filesystem API (same convention as
the sketch stream's partial store); on HDFS/S3 swap the three listing
helpers for the Hadoop FileSystem calls — the driver-side logic is
identical.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from ip_filter_spark.operators.cdc import latest_state, upsert_snapshot


def _snap_dir(root: str, batch_id: int) -> str:
    return os.path.join(root, f"snap_{batch_id:020d}")


def _complete_ids(root: str) -> list[int]:
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        if name.startswith("snap_") and os.path.exists(os.path.join(root, name, "_SUCCESS")):
            out.append(int(name[len("snap_") :]))
    return sorted(out)


def latest_snapshot(spark: SparkSession, snapshot_root: str) -> DataFrame:
    """The newest COMPLETE snapshot as a DataFrame (distributed scan —
    nothing reaches the driver but the directory listing)."""
    ids = _complete_ids(snapshot_root)
    if not ids:
        raise FileNotFoundError(f"no complete snapshot under {snapshot_root}")
    return spark.read.parquet(_snap_dir(snapshot_root, ids[-1]))


def stream_upsert_snapshot(
    stream_df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    snapshot_root: str,
    checkpoint_dir: str,
    *,
    keep_last: int = 2,
    trigger_available_now: bool = True,
):
    """Start a stream that folds every micro-batch into the snapshot.

    Idempotent under replay: batch N always reads the newest complete
    snapshot with id < N (its own prior partial/complete output is
    ignored) and overwrite-writes ``snap_N``, so re-execution converges
    to the identical state byte-for-byte."""

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prev = [i for i in _complete_ids(snapshot_root) if i < batch_id]
        if prev:
            base = spark.read.parquet(_snap_dir(snapshot_root, prev[-1]))
            snap = upsert_snapshot(base, batch_df, key_cols, order_cols)
        else:
            snap = latest_state(batch_df, key_cols, order_cols)
        snap.write.mode("overwrite").parquet(_snap_dir(snapshot_root, batch_id))
        if keep_last:
            older = [i for i in _complete_ids(snapshot_root) if i < batch_id]
            for old in older[:-keep_last]:
                shutil.rmtree(_snap_dir(snapshot_root, old), ignore_errors=True)

    writer = stream_df.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


__all__ = ["stream_upsert_snapshot", "latest_snapshot"]
