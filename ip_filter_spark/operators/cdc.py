"""Change-data-capture operators: latest-state compaction and upsert merge.

The engine's sketch family treats "current state" as a mergeable
summary of an append-only log (Bloom/CBF/HLL partials OR-merged,
reference build loop /root/reference/prototype/ipfilter.py:50-64);
these operators are the RELATIONAL twin: a changelog of row versions
compacts to one current row per key, and a stored snapshot advances by
merging only the NEW changes — never rescanning history.

Scale shape at 100 TB of log:

- ``latest_state`` is one window rank per key; Spark plans the
  ``rn = 1`` filter as WindowGroupLimit — each task keeps only its
  partial winner per key BEFORE the exchange, so shuffle traffic is
  O(keys · partitions-touched), not O(log);
- ``upsert_snapshot`` is the incremental form: compact the DELTA
  (small), then merge with the previous snapshot — the nightly-merge
  pattern; cost is O(delta + snapshot), independent of total history;
- precedence is explicit (changes beat the snapshot at equal order
  keys) so replaying the same delta is idempotent — the exactly-once
  story composes with the streaming sinks' batch_id-keyed stores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RN = "__cdc_rn"
_SRC = "__cdc_src"


def latest_state(
    changelog: DataFrame, key_cols: list[str], order_cols: list[str]
) -> DataFrame:
    """One row per key: the version that sorts LAST by ``order_cols``
    (ties broken by the later entries of the list — pass e.g.
    ``["ts", "event_id"]`` so equal timestamps resolve
    deterministically). Plans as WindowGroupLimit: map-side partial
    top-1 per key, then one exchange."""
    w = Window.partitionBy(*key_cols).orderBy(*[F.desc(c) for c in order_cols])
    return (
        changelog.withColumn(_RN, F.row_number().over(w))
        .where(F.col(_RN) == 1)
        .drop(_RN)
    )


def upsert_snapshot(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
) -> DataFrame:
    """Advance a snapshot by a changelog delta: per key, the latest
    change wins; keys without changes keep their base row. Changes beat
    the base even at identical ``order_cols`` (explicit precedence → a
    replayed delta is a no-op, not a coin flip). Equivalent to
    ``latest_state(full history)`` whenever ``base`` was itself the
    latest state of everything before the delta — the invariant the
    cdc gate query checks end-to-end."""
    tagged = base.withColumn(_SRC, F.lit(0)).unionByName(
        changes.withColumn(_SRC, F.lit(1))
    )
    return latest_state(tagged, key_cols, [*order_cols, _SRC]).drop(_SRC)


__all__ = ["latest_state", "upsert_snapshot"]
