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


def mixture_resample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weights: dict,
    default_weight: int = 1,
    rank_col: str = "rk",
) -> DataFrame:
    """Deterministic downsample to a TARGET MIXTURE: given integer
    mixture weights w_g, keep t_g = w_g · m rows per group where
    m = min_g ⌊n_g / w_g⌋ — the largest sample achieving the exact
    target ratio without upsampling any group. Kept rows are the t_g
    smallest sha256(id) per group (identity-hash order, the same family
    as ``deterministic_group_sample``: reproducible across engines,
    reruns, partitionings and cluster sizes; growing a group only moves
    its boundary). The training-mix targeting step — generalizes
    ``balanced_sample`` from equal per-group counts to arbitrary ratios
    (e.g. en:fr:es:zh:de at 3:2:2:1:1).

    Plan shape: one tiny count aggregate (|groups| rows to the driver)
    fixes the budgets, then one window over (group, hash order) with the
    budget joined in broadcast. The rank filter is per-group-variable so
    WindowGroupLimit can't prune it map-side; for few giant groups use
    ``balanced_sample``'s two-phase bucket-histogram form per group —
    here budgets are data-dependent and the window form keeps the whole
    operator SQL-replicable for the gate.

    Output: the kept rows plus ``rank_col`` (1..t_g) and ``budget``
    (t_g) columns."""
    from pyspark.sql import Window

    counts = {r[0]: r[1] for r in df.groupBy(group_col).count().collect()}
    assert counts, "mixture_resample: empty input"
    wt = {g: int(weights.get(g, default_weight)) for g in counts}
    m = min(n // wt[g] for g, n in counts.items())
    budgets = [(g, wt[g] * m) for g in counts]
    budget_df = df.sparkSession.createDataFrame(
        budgets, f"{group_col} string, budget long"
    )
    h = F.sha2(F.col(id_col).cast("string"), 256)
    w = Window.partitionBy(group_col).orderBy(h)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .join(F.broadcast(budget_df), group_col)
        .where(F.col(rank_col) <= F.col("budget"))
    )


def balanced_sample(
    df: DataFrame,
    group_col: str,
    key_expr,
    n_per_group: int | None = None,
    probe_chars: int = 3,
) -> DataFrame:
    """Exact per-group downsampling to a FIXED count — the training-mix
    balancing step (cap every source/language at the minority group's
    size, or at an explicit ``n_per_group``): keep, per group, the
    ``n_per_group`` rows with the smallest ``key_expr`` (a deterministic
    content hash → a reproducible pseudo-random subset, same idea as
    ``hash_sample_docs`` but with an EXACT count, not a binomial one).

    Scale shape: the naive form is ``row_number() OVER (PARTITION BY
    group ORDER BY key) <= n`` — with few giant groups that is one task
    per group, a single-task wall at 100 TB. This implementation uses a
    two-phase bucket histogram instead (the equi-depth-histogram trick
    applied per group):

    1. one aggregation over (group, first ``probe_chars`` hex chars of
       the key) — at most |groups| * 16^probe_chars tiny rows to the
       driver;
    2. per group the driver finds the CUT bucket where the cumulative
       count crosses ``n_per_group``: earlier buckets are kept verbatim
       (a broadcast-hash semi-join, no shuffle of the corpus), and only
       the cut bucket itself — ~1/4096th of the group — goes through the
       per-group window for its residual smallest rows.

    The result is EXACTLY the same set the naive window selects
    (lexicographic hash order is total when ``key_expr`` is unique), so
    a plain-SQL oracle can verify it with the naive form.

    Regime: built for FEW, LARGE groups (training-mix sources/languages
    — the histogram to the driver is |groups| * 16^probe_chars rows).
    For many small groups the naive window is already parallel and
    cheap — use ``deterministic_group_sample`` (WindowGroupLimit) there.
    """
    spark = df.sparkSession
    if n_per_group is None:
        n_per_group = (
            df.groupBy(group_col).count().agg(F.min("count").alias("m")).first()["m"]
        )
    keyed = df.withColumn("__bkey", key_expr).withColumn(
        "__bucket", F.substring("__bkey", 1, probe_chars)
    )
    hist = (
        keyed.groupBy(group_col, "__bucket").count().collect()
    )  # bounded: |groups| x 16^probe_chars
    per_group: dict = {}
    for r in hist:
        per_group.setdefault(r[group_col], []).append((r["__bucket"], r["count"]))
    keep_whole, cut = [], []  # (group, bucket) kept verbatim; (group, bucket, residual)
    for g, buckets in per_group.items():
        cum = 0
        for b, c in sorted(buckets):
            if cum + c <= n_per_group:
                keep_whole.append((g, b))
                cum += c
            else:
                if n_per_group - cum > 0:
                    cut.append((g, b, n_per_group - cum))
                break
    from pyspark.sql import Window
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    gtype = df.schema[group_col].dataType  # groups need not be strings
    whole_schema = StructType(
        [StructField(group_col, gtype), StructField("__bucket", StringType())]
    )
    whole_df = spark.createDataFrame(keep_whole, whole_schema)
    kept = keyed.join(F.broadcast(whole_df), [group_col, "__bucket"], "leftsemi")
    if cut:
        cut_schema = StructType(
            [
                StructField(group_col, gtype),
                StructField("__bucket", StringType()),
                StructField("__residual", LongType()),
            ]
        )
        cut_df = spark.createDataFrame(cut, cut_schema)
        w = Window.partitionBy(group_col, "__bucket").orderBy("__bkey")
        residual = (
            keyed.join(F.broadcast(cut_df), [group_col, "__bucket"], "inner")
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= F.col("__residual"))
            .drop("__rn", "__residual")
        )
        kept = kept.unionByName(residual)
    return kept.drop("__bkey", "__bucket")
