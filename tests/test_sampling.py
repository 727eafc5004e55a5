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
