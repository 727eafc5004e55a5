"""Iterative graph operators over edge DataFrames.

The reference has no graph surface; this extends the engine the same way
``operators/dedup.py``'s connected components does — an iterative
algorithm expressed as a fixed-point of DataFrame joins, so Catalyst owns
the physical plan of every step and the only driver involvement is the
loop counter.

Determinism discipline: PageRank here is INTEGER PageRank. Ranks live in
micro-units (1.0 == 1_000_000), per-edge contributions use integer floor
division, and the damping update is ``base + (num * Σcontrib) div den``
— every intermediate is a BIGINT, so the result is bit-identical across
engines, partitionings, and summation orders. That is what makes the
result hash-comparable against a SQL oracle (floats would drift in fold
order); the trade is ≤1 micro-unit of floor error per edge per
iteration, irrelevant for ranking.

Scale shape (100 TB mindset): per iteration the plan is
``ranks ⋈ out_degree`` (node-sized × node-sized, co-partitioned on the
node key after the first shuffle) → ``edges ⋈ shares`` (the one
edge-sized shuffle, partitioned by src) → ``groupBy(dst).sum`` with
map-side partial aggregation. Rank state is O(|V|) and never collects to
the driver; edges are re-used across iterations (cache once). Iteration
state is eagerly materialized each iteration, so plan depth is constant
in the iteration count; ``checkpoint_dir`` gives executor-loss-reliable
cuts for long cluster runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def pagerank_integer(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    unit: int = MICRO,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Fixed-iteration integer PageRank over a directed edge list.

    rank_0(v) = unit for every node appearing as src or dst.
    share_i(u) = rank_i(u) div out_degree(u)              (BIGINT floor)
    rank_{i+1}(v) = base + (damping_num * Σ_{u→v} share_i(u)) div damping_den
    where base = unit - (damping_num * unit) div damping_den.

    Simplified (no dangling-mass redistribution) PageRank: nodes with
    out-degree 0 contribute nothing, like the classic formulation used
    for link analysis at web scale where danglings are handled by the
    symmetrized edge set (undirected callers union both directions).

    Returns DataFrame[node, rank] with rank in micro-units (BIGINT).

    Execution shape: the loop-invariant DataFrames (edges, nodes,
    out-degrees) are persisted once; each iteration's rank state is
    EAGERLY materialized (``localCheckpoint``, or a reliable
    ``checkpoint`` when ``checkpoint_dir`` is given — executor loss
    mid-job replays a localCheckpoint'd lineage from nothing, so long
    runs on real clusters want the reliable path, same trade documented
    on ``dedup.connected_components``). Without the per-iteration cut,
    iteration k's plan re-derives the edge list k times over and the
    plan grows exponentially — the classic iterative-algorithm failure
    on Catalyst. The invariants are unpersisted before returning; the
    returned ranks are materialized and lineage-free.
    """
    assert iterations >= 1 and 0 < damping_num < damping_den
    base = unit - (damping_num * unit) // damping_den

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    deg = e.groupBy("src").agg(F.count("*").alias("out_deg")).persist()
    if checkpoint_dir is not None:
        e.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _cut(df: DataFrame) -> DataFrame:
        return df.checkpoint(eager=True) if checkpoint_dir else df.localCheckpoint(
            eager=True
        )

    ranks = nodes.select("node", F.lit(int(unit)).cast("long").alias("rank"))
    try:
        for _ in range(iterations):
            shares = (
                ranks.join(deg, ranks["node"] == deg["src"], "inner")
                .select(F.col("src"), F.expr("rank div out_deg").alias("share"))
            )
            contrib = (
                e.join(shares, "src")
                .groupBy("dst")
                .agg(F.sum("share").alias("s"))
            )
            ranks = _cut(
                nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
                .select(
                    "node",
                    (
                        F.lit(int(base))
                        + F.expr(
                            f"({int(damping_num)} * coalesce(s, 0L)) div {int(damping_den)}"
                        )
                    ).cast("long").alias("rank"),
                )
            )
    finally:
        # ranks is materialized, so the invariants carry no live lineage
        for df in (e, nodes, deg):
            df.unpersist()
    return ranks


def resolve_hierarchy(
    h: DataFrame,
    node: str = "node",
    parent: str = "parent",
    max_iterations: int = 30,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Resolve every node of a parent-pointer forest to its root + depth.

    Input: DataFrame[node, parent] with parent NULL for roots. Output:
    DataFrame[node, root, depth] — the SQL ``WITH RECURSIVE`` climb, but
    executed by POINTER DOUBLING: the state (node, anc, depth) joins to
    itself on ``anc == node``, composing ancestor pointers, so a depth-d
    forest resolves in ceil(log2(d)) rounds instead of d. At 100 TB that
    is the difference between 4 shuffles and 40 for a depth-20 catalog
    taxonomy; each round is one node-sized self-join (co-partitioned on
    the join key after round one), state never collects to the driver.

    Roots carry the fixed point (root, root, 0), so composing through a
    resolved pointer is idempotent — no per-row "done" bookkeeping.
    Convergence is checked with a piggybacked aggregate (count of
    unresolved pointers) on the SAME materialized state used for the next
    round — no extra scan of anything edge-sized. Same eager-cut /
    reliable-checkpoint discipline as ``pagerank_integer``.
    """
    spark = h.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def _cut(df: DataFrame) -> DataFrame:
        return df.checkpoint(eager=True) if checkpoint_dir else df.localCheckpoint(
            eager=True
        )

    base = h.select(F.col(node).alias("node"), F.col(parent).alias("parent"))
    state = _cut(
        base.select(
            "node",
            F.coalesce(F.col("parent"), F.col("node")).alias("anc"),
            F.when(F.col("parent").isNull(), F.lit(0)).otherwise(F.lit(1))
            .cast("long")
            .alias("depth"),
        )
    )
    roots = base.where(F.col("parent").isNull()).select(F.col("node").alias("anc"))

    for _ in range(max_iterations):
        unresolved = state.join(roots, "anc", "left_anti").limit(1).count()
        if unresolved == 0:
            break
        s2 = state.select(
            F.col("node").alias("j_node"),
            F.col("anc").alias("j_anc"),
            F.col("depth").alias("j_depth"),
        )
        # LEFT join: an anc with no state row (parent pointing at a node
        # the input never lists) must stay unresolved and hit the
        # RuntimeError below — an inner join would silently drop the row
        state = _cut(
            state.join(s2, state["anc"] == s2["j_node"], "left").select(
                "node",
                F.coalesce("j_anc", "anc").alias("anc"),
                (F.col("depth") + F.coalesce("j_depth", F.lit(0).cast("long"))).alias("depth"),
            )
        )
    else:
        raise RuntimeError(
            f"hierarchy did not resolve in {max_iterations} doubling rounds "
            "(cycle, or parent pointing at a missing node?)"
        )
    return state.select("node", F.col("anc").alias("root"), "depth")


def triangles(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Enumerate triangles of an undirected graph given as CANONICAL
    edges (a < b, distinct). Returns DataFrame[a, b, c] with a < b < c.

    Plan shape: the standard two-join enumeration — wedges = E(a,b) ⋈
    E(b,c) on the middle vertex with c > b, closed by a semi-shaped
    inner join back to E on (a,c). Two shuffles, both on edge keys;
    no driver involvement; output is O(#triangles). The canonical
    ordering means each triangle is produced exactly once — no /3 or /6
    dedup pass. Skewed hub vertices are the classic hazard: cap or
    pre-filter degree upstream (the supplier-projection gate caps the
    per-customer fanout before edges are even formed)."""
    e = edges.select(F.col(a).alias("a"), F.col(b).alias("b"))
    e2 = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    wedge = e.join(e2, "b").where(F.col("c") > F.col("b"))
    closing = e.select(F.col("a").alias("ca"), F.col("b").alias("cc"))
    return (
        wedge.join(
            closing,
            (wedge["a"] == closing["ca"]) & (wedge["c"] == closing["cc"]),
            "inner",
        )
        .select("a", "b", "c")
    )
