"""Geospatial primitives on integer grid coordinates.

Planar points with integer coordinates (micro-degree / millimetre style
fixed-point), so every distance comparison is exact 64-bit arithmetic —
no float geometry enters any predicate and results are bit-identical
across engines, partitionings and cluster sizes.

Scale shape: the radius self-join is the classic grid-cell spatial join
(the same blocking idea as the reference's guided probe — partition the
key space so candidates meet locally; cf. /root/reference/src/ipfilter
prefix bucketing): each point lands in exactly one radius-sized cell,
the probe side replicates to its 3x3 neighbourhood, and the pair meets
on an equi-join of cell ids. Shuffle is O(9·|points|) regardless of how
many pairs qualify — never the O(n²) cross join, which is the only
alternative Catalyst could plan for a raw distance predicate
(BroadcastNestedLoopJoin — the spatial scale-killer at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def cell_radius_join(
    points: DataFrame,
    radius: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """All pairs of points within Euclidean distance ``radius`` (inclusive,
    compared as squared integers). Exact and lossless: with cell size =
    radius, any pair at distance <= radius differs by at most one cell
    index per axis, so it meets in exactly one (probe-cell, build-cell)
    combination — the 3x3 neighbourhood replication of the probe side.
    Each unordered pair is emitted once (a_id < b_id).

    Returns (a_id, b_id, d2) with d2 = squared distance (BIGINT).

    Precision bound: cell ids come from floor(coord / radius) evaluated
    in double arithmetic, exact while |coord| < 2^53; the distance
    predicate itself is pure 64-bit integer math (overflow-safe while
    |dx|, |dy| < 2^31). Micro-degree geographies (|coord| <= 1.8e9) sit
    comfortably inside both bounds.
    """
    if radius <= 0:
        raise ValueError("radius must be positive")
    r = int(radius)
    cell = F.lit(r)
    cx = F.floor(F.col(x_col) / cell).cast("long")
    cy = F.floor(F.col(y_col) / cell).cast("long")
    base = points.select(
        F.col(id_col).alias("_gid"),
        F.col(x_col).cast("long").alias("_gx"),
        F.col(y_col).cast("long").alias("_gy"),
        cx.alias("_cx"),
        cy.alias("_cy"),
    )
    # Probe side: replicate each point into its 9-cell neighbourhood.
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probe = base.select(
        F.col("_gid").alias("_aid"),
        F.col("_gx").alias("_ax"),
        F.col("_gy").alias("_ay"),
        F.explode(offsets).alias("_o"),
        F.col("_cx").alias("_acx"),
        F.col("_cy").alias("_acy"),
    ).select(
        "_aid",
        "_ax",
        "_ay",
        (F.col("_acx") + F.col("_o.dx")).alias("_jcx"),
        (F.col("_acy") + F.col("_o.dy")).alias("_jcy"),
    )
    build = base.select(
        F.col("_gid").alias("_bid"),
        F.col("_gx").alias("_bx"),
        F.col("_gy").alias("_by"),
        F.col("_cx").alias("_jcx"),
        F.col("_cy").alias("_jcy"),
    )
    dx = F.col("_ax") - F.col("_bx")
    dy = F.col("_ay") - F.col("_by")
    d2 = dx * dx + dy * dy
    return (
        probe.join(build, ["_jcx", "_jcy"])
        .where(F.col("_aid") < F.col("_bid"))
        .where(d2 <= F.lit(r * r).cast("long"))
        .select(
            F.col("_aid").alias("a_id"),
            F.col("_bid").alias("b_id"),
            d2.cast("long").alias("d2"),
        )
    )


def quadkey_expr(x_col, y_col, levels: int, cell: int):
    """Base-4 quadkey string of a point: interleave the top ``levels``
    bits of (x // cell, y // cell), most significant first; digit =
    2*bit(y) + bit(x) — the Bing-maps tile key. Pure div/mod integer
    arithmetic (whole-stage codegen, and replicable symbol-for-symbol in
    ANSI SQL), so the key is bit-identical across engines. A prefix of
    length L is exactly the level-L ancestor tile: hierarchical rollups
    are plain substring group-bys.

    Domain: coordinates must be NON-NEGATIVE (grid indices in
    [0, 2^levels) after the cell division). Signed geographies must be
    shifted into the positive quadrant first (e.g. +180e6 micro-degrees);
    a negative grid index would make ``%`` emit sign-carrying "digits"
    — and engines disagree on negative div/mod, so the shift is also
    what keeps the key engine-portable. ``cell_radius_join`` has no such
    restriction (F.floor handles negative coordinates exactly)."""
    if levels < 1 or levels > 31:
        raise ValueError("levels must be in [1, 31]")
    gx = F.floor(F.col(x_col) / F.lit(int(cell))).cast("long")
    gy = F.floor(F.col(y_col) / F.lit(int(cell))).cast("long")
    digits = []
    for i in range(levels - 1, -1, -1):
        bx = F.shiftright(gx, i) % 2
        by = F.shiftright(gy, i) % 2
        digits.append((by * 2 + bx).cast("int").cast("string"))
    return F.concat(*digits)
