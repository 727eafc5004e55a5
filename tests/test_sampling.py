"""Seeded sampling generators (reference traffic-synthesis analogs)."""

from ip_filter_spark.sources import (
    stratified_sample,
    uniform_sample,
    weighted_key_fractions,
)


def test_uniform_sample_deterministic(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {r.doc_id for r in uniform_sample(docs, 0.2, seed=7).select("doc_id").collect()}
    b = {r.doc_id for r in uniform_sample(docs, 0.2, seed=7).select("doc_id").collect()}
    assert a == b  # seeded → reproducible (unlike the reference's unseeded shuffle)
    assert 0.05 <= len(a) / 500 <= 0.4


def test_stratified_sample_respects_fractions(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fr = weighted_key_fractions(docs, "lang", target_rows=100)
    sample = stratified_sample(docs, "lang", fr, seed=11)
    counts = {r.lang: r["count"] for r in sample.groupBy("lang").count().collect()}
    # inverse-frequency weighting: every language contributes, none dominates
    assert set(counts) == set(fr)
    assert max(counts.values()) <= 4 * min(counts.values()), counts


def test_weighted_reservoir_sample(spark):
    """A-Res law: inclusion frequency across seeds tracks weight; fixed
    seed is deterministic; output size is exactly k."""
    import collections

    from ip_filter_spark.sources.sampling import weighted_reservoir_sample

    rows = [(i, 10.0 if i < 10 else 1.0) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, w double")
    a = [r.id for r in weighted_reservoir_sample(df, "w", 20, seed=1).collect()]
    b = [r.id for r in weighted_reservoir_sample(df, "w", 20, seed=1).collect()]
    assert sorted(a) == sorted(b) and len(a) == 20  # deterministic, exact k
    freq = collections.Counter()
    for seed in range(10):
        for r in weighted_reservoir_sample(df, "w", 20, seed=seed).collect():
            freq[r.id] += 1
    heavy = sum(freq[i] for i in range(10)) / 10  # avg inclusion, w=10
    light = sum(freq[i] for i in range(10, 100)) / 90  # avg inclusion, w=1
    assert heavy > 3 * light, (heavy, light)  # weight-proportional pull
    # and no duplicates within one draw (without replacement)
    assert len(set(a)) == len(a)


def test_mixture_resample_exact_ratio_and_determinism(spark, sf_dir):
    """Mixture law: kept counts are EXACTLY w_g * m with one shared m
    (the largest no-upsample mixture), the kept set is invariant to
    input partitioning, and every group's budget never exceeds its
    size."""
    from ip_filter_spark.sources.sampling import mixture_resample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    weights = {"en": 3, "fr": 2, "es": 2}
    kept = mixture_resample(docs, "lang", "doc_id", weights)
    counts = {r.lang: r["count"] for r in kept.groupBy("lang").count().collect()}
    sizes = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    m = min(sizes[g] // weights.get(g, 1) for g in sizes)
    assert m >= 1
    for g, n in counts.items():
        assert n == weights.get(g, 1) * m, (g, n, m)
        assert n <= sizes[g]
    a = sorted(r.doc_id for r in kept.select("doc_id").collect())
    b = sorted(
        r.doc_id
        for r in mixture_resample(docs.repartition(7), "lang", "doc_id", weights)
        .select("doc_id")
        .collect()
    )
    assert a == b  # identity-hash order: partitioning-invariant
