"""Benchmark decontamination — n-gram overlap between a training corpus
and a (small, fixed) evaluation/benchmark set.

The standard LLM-training hygiene step: a training document is
contaminated if a large-enough fraction of its distinct token n-grams
also appears in the benchmark set (the classic 13-gram rule, scaled to
3-grams here because the synthetic corpus is short-form). Nothing in the
reference corresponds — its corpus tooling stops at route tables
(``/root/reference/data/parse_routes.py``) — but a user running the
engine on web-scale text needs this next to dedup.

Spark-first shape at 100 TB: the benchmark side is *fixed-size* (eval
suites are thousands of documents, not billions), so its distinct-gram
set is collected into a **broadcast** hash relation — the training
corpus is scanned once, its grams exploded map-side, hit-tested against
the broadcast with ZERO shuffle of the gram join, and the only Exchange
is the final per-doc groupBy on the document id (high-cardinality,
balanced). The corpus text itself never moves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ip_filter_spark.functions.text import ngrams_expr


def ngram_overlap_report(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    hit_num: int = 1,
    hit_den: int = 4,
) -> DataFrame:
    """Per training document with at least one benchmark-gram hit:
    ``(id, n_grams, n_hit, contaminated)`` where ``n_grams`` counts the
    doc's distinct token n-grams, ``n_hit`` how many of those appear
    anywhere in ``bench``, and ``contaminated`` is the integer
    cross-product test ``n_hit * hit_den >= n_grams * hit_num``
    (default: ≥ 1/4 of the doc's grams are benchmark grams). Documents
    shorter than ``n`` tokens have no grams and never appear.

    All outputs are integers/booleans — exact across engines.
    """
    grams = F.explode(F.array_distinct(ngrams_expr(text_col, n))).alias("gram")
    bench_grams = bench.select(F.explode(F.array_distinct(ngrams_expr(text_col, n))).alias("gram")).distinct()
    train_grams = train.select(id_col, grams)
    hit: Column = F.when(F.col("_hit").isNotNull(), 1).otherwise(0)
    per_doc = (
        train_grams.join(
            F.broadcast(bench_grams.withColumn("_hit", F.lit(1))), "gram", "left"
        )
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(hit).alias("n_hit"),
        )
    )
    return per_doc.where(F.col("n_hit") > 0).select(
        id_col,
        "n_grams",
        "n_hit",
        (F.col("n_hit") * hit_den >= F.col("n_grams") * hit_num).alias("contaminated"),
    )
