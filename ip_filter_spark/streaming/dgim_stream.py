"""Streaming DGIM — per-key sliding-window counts over an unbounded
stream with O(log² W) state per key.

The batch habitat of ``sketches/dgim.py`` sorts a key's history once;
the streaming habitat keeps the SAME bucket chain alive across
micro-batches with ``applyInPandasWithState``:

  state(chain, inserted, last_ts) ← insert(sorted batch rows)
  emit (key, est2x, uncertainty, inserted, in_order)

DGIM is sequence-dependent, so the operator is explicit about order:
rows are sorted within each micro-batch, and a batch that starts before
the state's high-water mark flips ``in_order`` to False (it still
inserts — the bracket theorem then degrades like any late-data policy
would, and the flag tells the consumer).  A time-partitioned replay or
any approximately-ordered real source keeps the flag True.

State is the JSON-encoded bucket chain — ``expire`` after every batch
caps it at O(k · log W) entries regardless of stream length, the whole
point versus buffering the window's events.
"""

from __future__ import annotations

import json
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
        StructField("key", StringType(), True),
        StructField("est2x", LongType(), False),
        StructField("uncertainty", LongType(), False),
        StructField("inserted", LongType(), False),
        StructField("n_batches", LongType(), False),
        StructField("in_order", BooleanType(), False),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("chain", StringType(), True),
        StructField("inserted", LongType(), True),
        StructField("last_ts", LongType(), True),
        StructField("n_batches", LongType(), True),
        StructField("in_order", BooleanType(), True),
    ]
)


def make_update_fn(k: int, now_us: int, window_us: int):
    def update(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        from ip_filter_spark.sketches.dgim import Dgim

        d = Dgim(k=k)
        if state.exists:
            chain, inserted, last_ts, n_batches, in_order = state.get
            d.buckets = json.loads(chain)
        else:
            inserted, last_ts, n_batches, in_order = 0, -(2**62), 0, True
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values("ts_us")
            ts = pdf["ts_us"].to_numpy()
            if int(ts[0]) < last_ts:
                in_order = False
            for t in ts:
                d.insert(int(t))
            inserted += len(pdf)
            last_ts = max(last_ts, int(ts[-1]))
        n_batches += 1
        # bound the state: fully-expired buckets never matter again
        d.expire(now_us, window_us)
        state.update((json.dumps(d.buckets), inserted, last_ts, n_batches, in_order))
        est2x, unc = d.estimate2x(now_us, window_us)
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "est2x": [est2x],
                "uncertainty": [unc],
                "inserted": [inserted],
                "n_batches": [n_batches],
                "in_order": [in_order],
            }
        )

    return update


def stream_dgim_recent(
    stream_df: DataFrame,
    key_col: str,
    ts_us_col,
    now_us: int,
    window_us: int,
    k: int = 8,
) -> DataFrame:
    """Per-key streaming DGIM estimates of the count in
    (now_us − window_us, now_us].  Emits one updated row per key per
    micro-batch (update mode); the latest row per key (max n_batches)
    is the final answer."""
    tc = F.col(ts_us_col) if isinstance(ts_us_col, str) else ts_us_col
    src = stream_df.select(F.col(key_col).alias("key"), tc.cast("long").alias("ts_us"))
    return src.groupBy("key").applyInPandasWithState(
        make_update_fn(k, now_us, window_us),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
