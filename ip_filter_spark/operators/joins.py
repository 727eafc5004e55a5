"""Sketch-accelerated joins — the runtime-filter pattern, explicit.

``bloom_semi_join`` is the canonical 100 TB application of a mergeable
Bloom filter (the reference's structure, ``/root/reference/prototype/
bloomfilter.py``, applied to join pruning): build a filter over the
build side's join keys (one scan, KB–MB blob), broadcast it, and drop
probe-side rows that cannot match BEFORE the join shuffle. Bloom has no
false negatives, so the prefilter never loses a true match; the ~fpp
fraction of false positives is removed by the exact join that follows —
the result is EXACTLY the plain semi-join, which is what makes the
operator oracle-checkable, while the shuffle moves only
(selectivity + fpp) of the probe table instead of all of it.

Spark's AQE can inject runtime filters for some plans; this operator
makes the decision explicit, works for any key expression, reuses a
filter across many queries (the sketch is a value), and reports the
pruning ratio through lineage columns if asked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ip_filter_spark.engine import SketchSpec, build_and_merge, probe_membership


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str | None = None,
    fpp: float = 1e-4,
    expected_n: int | None = None,
    broadcast_build: bool = True,
) -> DataFrame:
    """Rows of ``probe`` whose ``probe_key`` appears in ``build``'s
    ``build_key`` — semantically ``LEFT SEMI JOIN``, executed as
    Bloom-prefilter → exact semi-join.

    ``expected_n`` sizes the filter (defaults to a count of the build
    side — one cheap aggregate; pass it explicitly to skip that job).
    ``broadcast_build=True`` hints the exact confirm join (correct
    whenever the build side's distinct keys fit an executor; at larger
    build sides Spark falls back to a shuffle join on the ALREADY
    PRUNED probe side, which is the point of the prefilter).
    """
    build_key = build_key or probe_key
    keys = build.select(F.col(build_key).alias("__k")).distinct()
    n = expected_n if expected_n is not None else keys.count()
    spec = SketchSpec("bloom", {"fpp": fpp, "n": max(int(n), 1)})
    bf = build_and_merge(keys, [spec], key="__k")[spec.key()]

    pruned = probe_membership(probe, probe_key, bf, out_col="__hit").where(F.col("__hit")).drop("__hit")
    confirm = keys if not broadcast_build else F.broadcast(keys)
    return pruned.join(confirm, on=pruned[probe_key] == confirm["__k"], how="left_semi")


def broadcast_pair_join(
    pairs: DataFrame,
    table: DataFrame,
    value_col: str,
    a_alias: str,
    b_alias: str,
    id_col: str = "id",
    max_broadcast_pairs: int = 2_000_000,
) -> DataFrame:
    """Attach ``table[value_col]`` to both ids of a candidate pair list —
    the broadcast-pair verify shape shared by ``dedup.minhash_lsh_pairs``
    and ``similarity.embedding_near_dup_pairs``.

    Broadcasts the bare pair list (16 B/pair) into TWO passes over
    ``table``, then joins the two candidate-sized sides on the pair key.
    Shuffle volume is O(candidates · value), never O(corpus · value) — at
    scale the value table (signatures, embeddings) is the big thing and
    candidates are comparatively few. The direct pairs⋈table⋈table form
    sort-merge-shuffles the full value table twice: AQE cannot convert
    those joins to broadcast because the cached table is an
    InMemoryRelation, which adaptive replanning does not see through.

    Guarded: an adversarial corpus can make the candidate list itself too
    big to broadcast, so count it (it is the small output of the bucket
    stage) and fall back to the shuffle form past ``max_broadcast_pairs``.
    Cached first: the guard count would otherwise run the whole candidate
    stage once for itself and again for the verify.

    ``pairs`` must have columns (id_a, id_b); returns
    (id_a, id_b, a_alias, b_alias).
    """
    pairs = pairs.cache()
    if pairs.count() <= max_broadcast_pairs:
        a_side = table.join(F.broadcast(pairs), table[id_col] == pairs["id_a"]).select(
            "id_a", "id_b", F.col(value_col).alias(a_alias)
        )
        b_side = table.join(F.broadcast(pairs), table[id_col] == pairs["id_b"]).select(
            F.col("id_a").alias("__ba"),
            F.col("id_b").alias("__bb"),
            F.col(value_col).alias(b_alias),
        )
        return a_side.join(
            b_side, (F.col("id_a") == F.col("__ba")) & (F.col("id_b") == F.col("__bb"))
        ).drop("__ba", "__bb")
    return pairs.join(
        table.select(F.col(id_col).alias("id_a"), F.col(value_col).alias(a_alias)), on="id_a"
    ).join(table.select(F.col(id_col).alias("id_b"), F.col(value_col).alias(b_alias)), on="id_b")
