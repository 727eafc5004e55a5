"""ip_filter_spark — a from-scratch PySpark-native distributed sketch /
approximate-aggregation library.

Re-expresses the capabilities of the reference ``myegorov/ip-filter``
(a single-node Bloom-filter longest-prefix-match engine) as a mergeable
sketch library over columnar tables of source-code-like corpora:

- standard + counting Bloom filters with guided (BST) longest-prefix-match
  lookup (the reference's core, ``/root/reference/prototype/ipfilter.py``),
- HyperLogLog, count-min sketch, KLL, t-digest, MinHash (north-rule
  additions),
- an Arrow-vectorized build → tree-merge → broadcast-probe harness
  (``engine.py``),
- training-data-pipeline operators: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard / embedding cosine), ANN similarity search, text analysis,
  multimodal plumbing (``operators/``).

Design stance: sketches are plain numpy-backed values (update_batch /
merge / to_bytes / from_bytes / estimate); Spark provides the distributed
lifecycle via DataFrame ops + ``mapInPandas`` / ``applyInPandas``. No
per-row Python anywhere on the hot path.
"""

from ip_filter_spark.version import __version__

__all__ = ["__version__"]
