"""The source-code corpus table (repo, path, commit, lang, content).

The engine's primary input shape per BASELINE.json `input_hint`. Two
deterministic constructors:

- ``synthesize_corpus``: pure ``spark.range`` + JVM-side hash-derived
  columns (xxhash64/sha2 pseudo-randomness, fully seeded, no Python UDF,
  no wall-clock) — scales to any row count with embarrassing parallelism;
  repo sizes are Zipf-skewed so the salted-repartition path is exercised.

- ``corpus_from_sf_dir``: derives the same shape from the driver's
  read-only parquet testdata (lineitem × deterministic string synth), so
  benches track the per-round scale factor.

Analogy to the reference's data pipeline: these replace the BGP-table
download/parse/sort stages (/root/reference/data/preprocess_bgp_tables.py)
and the synthetic traffic generators (/root/reference/data/
generate_traffic.py:39-131) — seeded and declarative instead of
urlretrieve + unseeded shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["py", "c", "go", "rs", "java", "js", "ts", "cpp", "rb", "sh"]

_WORDS = [
    "filter", "bloom", "hash", "probe", "merge", "sketch", "prefix", "table",
    "index", "batch", "shard", "scan", "tree", "node", "query", "route",
]


def _pseudo(col, salt: int):
    """Deterministic 63-bit positive pseudo-random stream, JVM-side."""
    return F.abs(F.xxhash64(col.cast("string"), F.lit(salt)))


def synthesize_corpus(
    spark: SparkSession,
    n_rows: int,
    n_repos: int = 1000,
    seed: int = 42,
    dup_fraction: float = 0.1,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic corpus of ``n_rows`` files across ``n_repos`` repos.

    - repo ids follow a power-law-ish skew (id = floor(u^2 * n_repos)) so a
      few repos are huge — the skew the salted repartition must defuse;
    - ``dup_fraction`` of rows share content with an earlier row (exact
      duplicates for dedup operators);
    - content is a deterministic word sequence + unique tail, ~100-300 chars.
    """
    rng = spark.range(n_rows, numPartitions=num_partitions)
    i = F.col("id")
    u = (_pseudo(i, seed) % 1_000_000) / 1_000_000.0
    repo_id = F.floor(F.pow(u, 2.0) * n_repos).cast("long")
    depth = (_pseudo(i, seed + 1) % 5 + 1).cast("int")

    seg = lambda s: F.concat(F.lit("d"), (_pseudo(i, seed + 10 + s) % 20).cast("string"))
    fname = F.concat(F.lit("f"), (_pseudo(i, seed + 2) % 1000).cast("string"))
    lang_ix = (_pseudo(i, seed + 3) % len(LANGS)).cast("int")
    lang = F.element_at(F.array(*[F.lit(l) for l in LANGS]), lang_ix + 1)

    # duplicate content groups: dup rows point at a "parent" id
    is_dup = (_pseudo(i, seed + 4) % 1_000_000) < int(dup_fraction * 1_000_000)
    content_key = F.when(is_dup & (i > 0), _pseudo(i, seed + 5) % F.greatest(i, F.lit(1))).otherwise(i)

    words = F.array(*[F.lit(w) for w in _WORDS])
    w_of = lambda s: F.element_at(words, (_pseudo(content_key, seed + 20 + s) % len(_WORDS) + 1).cast("int"))
    body = F.concat_ws(" ", *[w_of(s) for s in range(30)])
    content = F.concat(body, F.lit(" #"), content_key.cast("string"))

    path = F.concat_ws(
        "/",
        F.array_compact(F.array(seg(0), F.when(depth >= 2, seg(1)), F.when(depth >= 3, seg(2)), F.when(depth >= 4, seg(3)))),
    )
    path = F.concat(path, F.lit("/"), fname, F.lit("."), lang)

    commit = F.sha2(F.concat(F.lit("commit"), (i % 97).cast("string")), 256).substr(1, 40)

    return rng.select(
        F.concat(F.lit("repo-"), repo_id.cast("string")).alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    )


def corpus_from_sf_dir(spark: SparkSession, base_dir: str, num_partitions: int | None = None) -> DataFrame:
    """Corpus derived deterministically from the sf testdata's lineitem
    table — row count scales with the per-round scale factor."""
    li = spark.read.parquet(f"{base_dir}/lineitem.parquet")
    if num_partitions:
        li = li.repartition(num_partitions)
    i = F.xxhash64("l_orderkey", "l_linenumber")
    lang = F.element_at(
        F.array(*[F.lit(l) for l in LANGS]), (F.abs(i) % len(LANGS) + 1).cast("int")
    )
    content = F.concat_ws(
        " ",
        F.lit("item"),
        F.col("l_orderkey").cast("string"),
        F.col("l_partkey").cast("string"),
        F.col("l_suppkey").cast("string"),
        F.col("l_returnflag"),
        F.col("l_linestatus"),
        F.format_number("l_extendedprice", 2),
        F.format_number("l_discount", 2),
        F.repeat(F.concat(F.col("l_returnflag"), F.lit(" ")), (F.abs(i) % 20 + 5).cast("int")),
    )
    path = F.concat(
        F.lit("src/"),
        (F.col("l_partkey") % 50).cast("string"),
        F.lit("/"),
        (F.col("l_suppkey") % 20).cast("string"),
        F.lit("/f"),
        F.col("l_orderkey").cast("string"),
        F.lit("_"),
        F.col("l_linenumber").cast("string"),
        F.lit("."),
        lang,
    )
    return li.select(
        F.concat(F.lit("repo-"), (F.col("l_suppkey") % 100).cast("string")).alias("repo"),
        path.alias("path"),
        F.sha2(F.col("l_orderkey").cast("string"), 256).substr(1, 40).alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    )
