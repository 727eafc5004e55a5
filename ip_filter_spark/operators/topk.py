"""Heavy-hitter queries: exact window top-k (oracle) + CMS-backed top-k.

Exact formulation is the standard groupBy→count→rank; the sketch path
collects per-partition local candidates (a superset of any global top-k)
and estimates their counts from the merged count-min sketch — the
communication is O(P·k) candidates + one CMS blob instead of a full
shuffle of all distinct keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ip_filter_spark.engine import SketchSpec, build_and_merge
from ip_filter_spark.sketches.hashing import digests_to_matrix, fnv1a64


def exact_topk(df: DataFrame, key_col: str, k: int = 10) -> DataFrame:
    """Top-k keys by frequency with deterministic ties (count desc, key asc)."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(F.count("*").alias("cnt"))
    w = Window.orderBy(F.desc("cnt"), F.col("key"))
    return counts.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k).select("key", "cnt", "rank")


def cms_topk(
    df: DataFrame,
    key_col: str,
    k: int = 10,
    eps: float = 1e-4,
    delta: float = 1e-3,
    candidates_per_partition: int = 64,
) -> list[tuple[str, int]]:
    """Approximate top-k: local per-partition candidates ∪ CMS estimates.

    Any global top-k key is a local top-(k') somewhere for k' <=
    candidates_per_partition under mild skew assumptions; its CMS estimate
    never undercounts, so ordering errors are bounded by eps*N."""
    spec = SketchSpec("cms", {"eps": eps, "delta": delta})
    sketches = build_and_merge(df, [spec], key=key_col)
    cms = sketches[spec.key()]

    local = (
        df.groupBy(F.spark_partition_id().alias("pid"), F.col(key_col).alias("key"))
        .agg(F.count("*").alias("cnt"))
        .withColumn("rn", F.row_number().over(Window.partitionBy("pid").orderBy(F.desc("cnt"), F.col("key"))))
        .where(F.col("rn") <= candidates_per_partition)
        .select("key")
        .distinct()
    )
    cand = [r.key for r in local.collect()]
    import hashlib

    digs = digests_to_matrix([hashlib.sha256(str(c).encode()).digest() for c in cand])
    h64 = fnv1a64(digs)
    est = cms.query_hashes(h64)
    ranked = sorted(zip(cand, est.tolist()), key=lambda t: (-t[1], str(t[0])))[:k]
    return [(key, int(cnt)) for key, cnt in ranked]
