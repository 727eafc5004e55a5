"""Multi-column data layout — Z-order (Morton) clustering for scans.

Sorting a table by one column makes parquet min/max statistics
selective for THAT column only: a predicate on any other column reads
everything. Z-ordering interleaves the bits of several columns' rank
buckets into one clustering key, so rows close in the multi-dimensional
space land in the same files/row-groups — min/max footer stats become
selective for EVERY participating column at once, and the ordinary
parquet predicate pushdown (row-group skipping) turns a 2-D box filter
into a small fraction of the scan. This is the layout half of scan
pruning (directory partitioning covers low-cardinality columns;
Z-order covers high-cardinality numeric/time dimensions — the layout
tool Delta/Iceberg expose as OPTIMIZE ZORDER BY, here as a plain
DataFrame writer on stock parquet).

Everything is JVM-side expressions (quantile-bucket via a literal
boundary array + ``aggregate``, bit interleave via shift/AND sums) —
no UDF, whole-stage-codegen friendly. The quantile boundaries are a
driver-side ``approxQuantile`` over the input (one pass, Greenwald-
Khanna mergeable summaries — the same sketch family as the engine's
KLL), so bucket occupancy is balanced even for skewed columns where a
linear (min..max) split would put everything in one bucket.

At 100 TB: the write is one range-exchange on the z-key (the shuffle
you pay once, amortized over every later scan, same story as
``write_bucketed``); ``approxQuantile`` is a fixed-size-summary
aggregation, never a sort. Readers need nothing special — pruning is
stock parquet row-group stats.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_expr(col: str, boundaries: list[float]) -> Column:
    """Quantile-bucket index in [0, len(boundaries)]: the number of
    boundaries <= value, via ``aggregate`` over a literal array (O(2^bits)
    JVM comparisons per row, no UDF). Nulls land in bucket 0 — they sort
    first, clustered together, which is all a layout needs."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    v = F.col(col).cast("double")
    return F.aggregate(
        arr,
        F.lit(0),
        lambda acc, b: acc + F.when(b <= v, F.lit(1)).otherwise(F.lit(0)),
    )


def zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    rel_err: float = 1e-3,
    boundaries: dict[str, list[float]] | None = None,
) -> Column:
    """The Morton key column: each column quantile-bucketed to ``bits``
    bits (boundaries from one driver-side ``approxQuantile`` pass —
    ``2^bits - 1`` float literals each), then bit-interleaved so bit j of
    column c lands at position ``j * ncols + c`` (column 0 owns the most
    significant interleave lane). ``bits * len(cols)`` must fit a long;
    8 bits/column separates ~256 ranges per dimension — row-group
    pruning saturates well below that at any realistic file count.
    Pass ``boundaries`` (col → ascending floats, at most ``2^bits - 1``
    each) to skip the quantile pass — reuse across incremental writes,
    or exact bucket control in tests."""
    cols = list(cols)
    if not (1 <= bits * len(cols) <= 62):
        raise ValueError(f"bits*ncols must be in [1, 62], got {bits}*{len(cols)}")
    n = len(cols)
    probs = [i / (1 << bits) for i in range(1, 1 << bits)]
    given = boundaries or {}
    for col, bnds in given.items():
        if len(bnds) >= (1 << bits):
            raise ValueError(f"{col}: {len(bnds)} boundaries exceed 2^bits - 1")
    need = [c for c in cols if c not in given]
    # one quantile pass for every un-supplied column (approxQuantile takes
    # a column list) — a per-column call would scan the input ncols times
    fetched = dict(zip(need, df.stat.approxQuantile(need, probs, rel_err))) if need else {}
    z = F.lit(0).cast("long")
    for c_idx, col in enumerate(cols):
        bnds = list(given[col]) if col in given else fetched[col]
        b = _bucket_expr(col, bnds).cast("long")
        for j in range(bits):
            lane = j * n + (n - 1 - c_idx)
            z = z + F.shiftleft(F.shiftright(b, j).bitwiseAND(F.lit(1)), lane)
    return z


def zorder_write(
    df: DataFrame,
    cols: Sequence[str],
    path: str,
    n_files: int = 32,
    bits: int = 8,
    rel_err: float = 1e-3,
) -> None:
    """Write ``df`` to ``path`` as parquet clustered on the Z-order of
    ``cols``: one range exchange on the z-key (contiguous z-ranges per
    output file → tight per-file/row-group min/max on every
    participating column), sorted within partitions so row groups inside
    a file are tight too. The z-key itself is dropped — pruning works
    off the original columns' stock parquet stats."""
    z = zorder_key(df, cols, bits=bits, rel_err=rel_err)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
