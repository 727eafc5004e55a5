"""Custom stateful streaming operator: per-key running sketches.

``running_distinct_by_key`` maintains one HyperLogLog per group key across
micro-batches with ``applyInPandasWithState`` — the pattern for stateful
operators that Spark's built-in aggregations can't express (the state is a
sketch blob, not a sum). Each micro-batch:

  state(blob) ← merge(state, HLL(batch rows))      # associative update
  emit (key, estimate, rows_seen)

State is bounded (one 2^p-register blob per key) and survives restarts via
the streaming checkpoint. This is the streaming analog of the engine's
batch build → merge lifecycle, with the merge folded into the state update.

Restart note: checkpoint recovery requires a recovery-capable sink
(foreachBatch / file) — Spark's memory sink raises "does not support
recovering from checkpoint" on restart. Verified behavior: restart with
no new data reprocesses nothing; restart with appended data continues
accumulating from the checkpointed state.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType(), True),
        StructField("estimate", DoubleType(), False),
        StructField("rows_seen", LongType(), False),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("blob", BinaryType(), True),
        StructField("rows_seen", LongType(), True),
    ]
)


def _update(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    from ip_filter_spark.sketches import HyperLogLog, from_bytes
    from ip_filter_spark.sketches.hashing import digests_to_matrix, fnv1a64

    if state.exists:
        blob, rows_seen = state.get
        hll = from_bytes(bytes(blob))
    else:
        hll, rows_seen = HyperLogLog(p=12), 0
    for pdf in pdfs:
        if len(pdf):
            hll.update_hashes(fnv1a64(digests_to_matrix(pdf["__digest"])))
            rows_seen += len(pdf)
    state.update((hll.to_bytes(), rows_seen))
    yield pd.DataFrame({"key": [key[0]], "estimate": [float(hll.estimate())], "rows_seen": [rows_seen]})


def running_distinct_by_key(stream_df: DataFrame, key_col: str, value_col) -> DataFrame:
    """Streaming per-key running distinct-count estimates.

    value_col: column/expr whose sha256 digest feeds the per-key HLL.
    Emits one updated (key, estimate, rows_seen) row per key per batch."""
    from ip_filter_spark.engine import sha256_digest

    vc = F.col(value_col) if isinstance(value_col, str) else value_col
    src = stream_df.select(
        F.col(key_col).alias("key"), sha256_digest(vc.cast("string")).alias("__digest")
    )
    return src.groupBy("key").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
