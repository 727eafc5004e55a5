"""Inverted text index — term-partitioned posting lists + conjunctive search.

The reference engine's organizing idea is a pre-built probe structure
that lets a lookup touch only the slice of the data that can possibly
answer it (the guided Bloom descent,
/root/reference/prototype/ipfilter.py:131-158). Applied to text: an
inverted index maps term → (doc_id, tf) posting rows, laid out on disk
PARTITIONED BY a term-hash bucket, so a k-term query reads at most k of
``num_buckets`` partitions (Catalyst partition pruning — no Bloom
needed here because the bucket of a literal term is computable at plan
time). Conjunctive (AND) search is then one hash aggregation over the
selected postings: group by doc, keep docs matched by all k terms.

Scale shape at 100 TB of corpus:

- the posting table is O(total tokens) rows but each row is ~24 bytes
  (term dict-encoded by parquet within a bucket) — it is built with ONE
  explode scan + ONE (term, doc) aggregation, both map-side-combinable;
- ``partitionBy(bucket)`` would normally fan out P × num_buckets small
  files, so the writer repartitions by bucket first (same fix as
  ``operators/layout.py``) — num_buckets files, each internally sorted
  by term so a term's postings are one contiguous, statistics-prunable
  run;
- a query scans ≤ k buckets (PartitionFilters), pushes ``term IN (…)``
  into the parquet scan inside them, and shuffles only the selected
  postings — O(Σ selected posting lengths), independent of corpus size;
- stopword-scale terms dominate that Σ; ``df_cap`` lets the builder
  drop terms appearing in more than a fraction of documents (the
  classic stopword cut), bounding the worst posting list. The cap is
  recorded next to the index so readers know the vocabulary contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ip_filter_spark.functions.text import tokens_expr

_INDEX_SUBDIR = "_term_index"


def build_postings(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(term, doc_id, tf) posting rows — one explode + one aggregation,
    both with map-side partial combine. Whitespace tokenization via the
    shared ``tokens_expr`` (same contract as the text-analysis ops)."""
    tok = docs.select(F.col(id_col).alias("doc_id"), F.explode(tokens_expr(text_col)).alias("term"))
    return tok.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))


def term_bucket(term_col, num_buckets: int):
    """Plan-time-computable bucket of a term: pmod(xxhash64(term), B).
    For a LITERAL term Catalyst constant-folds this, which is what makes
    partition pruning work without touching any file."""
    c = F.col(term_col) if isinstance(term_col, str) else term_col
    return F.pmod(F.xxhash64(c), F.lit(num_buckets)).cast("int")


def write_term_index(
    docs: DataFrame,
    data_path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
    df_cap: float | None = None,
) -> str:
    """Build and persist the index under ``<data_path>/_term_index``
    (underscore-prefixed: invisible to plain parquet listings of the
    corpus dir, same sidecar convention as the file-level Bloom index).

    ``df_cap``: drop terms whose document frequency exceeds this
    fraction of the corpus (stopword cut — bounds the longest posting
    list; None keeps everything). The repartition-then-partitionBy
    write produces exactly ``num_buckets`` files, each sorted by term.
    """
    postings = build_postings(docs, text_col=text_col, id_col=id_col)
    if df_cap is not None:
        n_docs = docs.count()
        # anti-join against the DROPPED terms: stopwords above the cap
        # are a handful of terms, the kept vocabulary is the whole
        # dictionary — broadcasting the small side is the shape that
        # survives a 100 TB corpus
        drop = (
            postings.groupBy("term")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") > int(df_cap * n_docs))
            .select("term")
        )
        postings = postings.join(F.broadcast(drop), "term", "left_anti")
    path = f"{data_path.rstrip('/')}/{_INDEX_SUBDIR}"
    (
        postings.withColumn("bucket", term_bucket("term", num_buckets))
        .repartition("bucket")
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )
    return path


def conjunctive_search(postings: DataFrame, terms: list[str]) -> DataFrame:
    """Docs containing ALL of ``terms``: filter the postings to the query
    vocabulary, then one groupBy(doc_id) keeping groups that matched
    every distinct term. Returns (doc_id, total_tf). The filter is
    pushed into the scan; the aggregation shuffles only the selected
    postings and partially combines map-side."""
    assert terms, "empty query"
    hits = postings.where(F.col("term").isin(list(terms)))
    return (
        hits.groupBy("doc_id")
        .agg(
            F.countDistinct("term").alias("_matched"),
            F.sum("tf").alias("total_tf"),
        )
        .where(F.col("_matched") == len(set(terms)))
        .select("doc_id", "total_tf")
    )


def search_term_index(
    spark: SparkSession, data_path: str, terms: list[str], *, num_buckets: int = 64
) -> DataFrame:
    """Conjunctive search against a persisted index: each query term
    contributes ``bucket = pmod(xxhash64('term'), B)`` — a deterministic
    expression over literals that Catalyst CONSTANT-FOLDS at plan time,
    so the OR of them partition-prunes to ≤ k of ``num_buckets``
    directories without any job or driver-side hashing; ``term IN (…)``
    then pushes into the parquet scan within them."""
    return conjunctive_search(pruned_postings(spark, data_path, terms, num_buckets=num_buckets), terms)


def pruned_postings(
    spark: SparkSession, data_path: str, terms: list[str], *, num_buckets: int = 64
) -> DataFrame:
    """The bucket-pruned slice of a persisted index for ``terms`` — the
    scan ``search_term_index`` aggregates over, exposed separately so
    callers (and the pruning test) can see the scan-only plan."""
    assert terms, "empty query"
    idx = spark.read.parquet(f"{data_path.rstrip('/')}/{_INDEX_SUBDIR}")
    pred = None
    for t in sorted(set(terms)):
        clause = F.col("bucket") == term_bucket(F.lit(t), num_buckets)
        pred = clause if pred is None else pred | clause
    return idx.where(pred)


__all__ = [
    "build_postings",
    "write_term_index",
    "conjunctive_search",
    "search_term_index",
    "pruned_postings",
    "term_bucket",
]
