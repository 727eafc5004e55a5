from ip_filter_spark.sources.tables import TABLES, load_table, load_tables
from ip_filter_spark.sources.corpus import corpus_from_sf_dir, synthesize_corpus

__all__ = ["TABLES", "load_table", "load_tables", "corpus_from_sf_dir", "synthesize_corpus"]
