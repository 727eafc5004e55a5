"""Seeded sampling generators — the reference's traffic-synthesis analogs.

The reference generates probe traffic three ways (uniform random,
reservoir-sampled proportional to address-space share, proportional to
prefix count — /root/reference/data/generate_traffic.py:39-131). Spark
gives all three as one-liners over the corpus; everything is seeded
(the reference's unseeded shuffle at prototype/utils.py:87 is a known
nondeterminism we deliberately do not reproduce).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def uniform_sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """Uniform traffic (generate_traffic.py:39-52 analog)."""
    return df.sample(fraction=fraction, seed=seed)


def sample_by_key_share(df: DataFrame, key_col: str, total_fraction: float, seed: int = 42) -> DataFrame:
    """Sample proportional to each key's row share (the 'traffic ∝
    prefix-count' generator, generate_traffic.py:112-131): a plain
    uniform sample already yields key proportions equal to row shares,
    so this is uniform sampling with explicit naming."""
    return df.sample(fraction=total_fraction, seed=seed).withColumn("__sampled_by", F.lit(key_col))


def stratified_sample(df: DataFrame, key_col: str, fractions: dict, seed: int = 42) -> DataFrame:
    """Per-stratum sampling fractions (the 'by address-space share'
    reservoir analog, generate_traffic.py:54-84): key → fraction, e.g.
    over-sampling rare languages or deep paths."""
    return df.sampleBy(key_col, fractions=fractions, seed=seed)


def weighted_reservoir_sample(
    df: DataFrame, weight_col, k: int, seed: int = 42, id_cols: list | None = None
) -> DataFrame:
    """Fixed-size weighted sample WITHOUT replacement — true weighted
    reservoir semantics (the reference's reservoir at
    generate_traffic.py:54-84), via Efraimidis–Spirakis A-Res
    distributed: each row gets key = -ln(u)/w with u ~ U(0,1); the k
    SMALLEST keys are the sample, with P(i in sample) increasing in w_i
    exactly as the sequential reservoir.

    Spark-first shape: one scan; per-partition top-k heaps via
    TakeOrderedAndProject (orderBy + limit) — no global sort
    materializes more than k rows per task.

    Determinism: u is hash-derived from the row content (id_cols or all
    columns) + seed, not rand() — same rows → same sample, resume-safe,
    retry-safe (the round-1 gap: sampleBy needs fractions known up front
    and cannot do fixed-size weighted draws)."""
    wc = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    entropy = [F.col(c) for c in (id_cols or df.columns)]
    # u in (0,1): 63-bit hash scaled; +1 avoids u=0 (ln(0))
    u = (F.abs(F.xxhash64(*entropy, F.lit(seed))) + 1).cast("double") / F.lit(float(1 << 63))
    key = -F.log(u) / wc
    return (
        df.withColumn("__ares_key", key)
        .orderBy("__ares_key")
        .limit(k)
        .drop("__ares_key")
    )


def weighted_key_fractions(df: DataFrame, key_col: str, target_rows: int) -> dict:
    """Derive per-key fractions so each key contributes ~equally
    (inverse-frequency weighting) totalling ~target_rows."""
    counts = {r[0]: r[1] for r in df.groupBy(key_col).count().collect()}
    k = len(counts) or 1
    per_key = target_rows / k
    return {key: min(1.0, per_key / n) for key, n in counts.items()}


def deterministic_group_sample(
    df: DataFrame, group_cols, id_col: str, k: int, rank_col: str = "rk"
) -> DataFrame:
    """Exactly ``k`` rows per group (fewer if the group is smaller),
    chosen as the k smallest sha256(id) — a pure function of stable row
    identity, so the sample is reproducible across engines, reruns,
    partitionings and cluster sizes, and adding new rows can only evict
    boundary rows, never reshuffle the choice wholesale (rand()-based
    sampling has neither property). The standard eval-set /
    human-review-batch constructor for a training corpus.

    Plan shape: one window over (group, hash order). Spark >= 3.5 plans
    ``row_number() <= k`` as WindowGroupLimit — each input partition
    keeps only its local top-k per group BEFORE the exchange, so shuffle
    volume is O(groups · k · partitions-touched), not O(rows); the
    test pins that node. Output carries ``rank_col`` (1..k by hash
    order) so downstream sees a stable ordering."""
    from pyspark.sql import Window

    gcols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    h = F.sha2(F.col(id_col).cast("string"), 256)
    w = Window.partitionBy(*gcols).orderBy(h)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )
