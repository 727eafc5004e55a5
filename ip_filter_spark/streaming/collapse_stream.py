"""Streaming consecutive-duplicate collapse — ordered-stream compaction
(CDC echo suppression, sensor debounce) kept alive across micro-batches.

The batch habitat (queries.collapse_consecutive_events) is one LAG
window per user; the streaming habitat cannot see the previous row once
it crossed a batch boundary, so the operator carries exactly that one
row of context as state: ``(last_type, last_ts_us, last_event_id)`` per
user — O(1) state per key, the minimum any consecutive-dedup needs.

Within a micro-batch rows sort by (ts_us, event_id) and a vectorized
shift-compare keeps state CHANGES only; the first row of the batch
compares against the state's ``last_type``.  The operator is
sequence-dependent, so order is a first-class output: a batch that
starts before the state's high-water mark flips ``in_order`` to False
(loudly — it still processes, like any late-data policy, but the flag
tells the consumer the kept set may differ from the time-ordered
answer).  A time-partitioned replay keeps it True, and then the union
of per-batch kept rows equals the batch LAG answer row for row.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("event_id", LongType(), False),
        StructField("event_type", StringType(), True),
        StructField("in_order", BooleanType(), False),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("last_type", StringType(), True),
        StructField("last_ts_us", LongType(), True),
        StructField("last_event_id", LongType(), True),
        StructField("in_order", BooleanType(), True),
    ]
)


def _update(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    if state.exists:
        last_type, last_ts, last_id, in_order = state.get
    else:
        last_type, last_ts, last_id, in_order = None, -(2**62), -1, True
    for pdf in pdfs:
        if not len(pdf):
            continue
        pdf = pdf.sort_values(["ts_us", "event_id"])
        first = (int(pdf["ts_us"].iloc[0]), int(pdf["event_id"].iloc[0]))
        if first < (last_ts, last_id):
            in_order = False
        types = pdf["event_type"].tolist()
        prev = [last_type] + types[:-1]
        keep = [t != p for t, p in zip(types, prev)]
        kept = pdf[pd.Series(keep, index=pdf.index)]
        last_type = types[-1]
        last_ts = int(pdf["ts_us"].iloc[-1])
        last_id = int(pdf["event_id"].iloc[-1])
        if len(kept):
            yield pd.DataFrame(
                {
                    "user_id": kept["user_id"].astype("int64"),
                    "event_id": kept["event_id"].astype("int64"),
                    "event_type": kept["event_type"],
                    "in_order": in_order,
                }
            )
    state.update((last_type, last_ts, last_id, in_order))


def stream_collapse_consecutive(
    stream_df: DataFrame,
    user_col: str = "user_id",
    ts_us_col: str = "ts_us",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user streaming consecutive-dedup: emits each micro-batch's
    KEPT rows only (append-shaped update mode — a row, once emitted, is
    final), so the union of per-batch outputs is the full compacted
    stream with no reprocessing and O(1) state per user."""
    src = stream_df.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.col(ts_us_col).cast("long").alias("ts_us"),
        F.col(type_col).alias("event_type"),
        F.col(id_col).cast("long").alias("event_id"),
    )
    return src.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
