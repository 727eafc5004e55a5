from ip_filter_spark.sources.tables import TABLES, load_table, load_tables
from ip_filter_spark.sources.corpus import corpus_from_sf_dir, synthesize_corpus
from ip_filter_spark.sources.sampling import (
    sample_by_key_share,
    stratified_sample,
    uniform_sample,
    weighted_key_fractions,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "corpus_from_sf_dir",
    "synthesize_corpus",
    "uniform_sample",
    "sample_by_key_share",
    "stratified_sample",
    "weighted_key_fractions",
]
