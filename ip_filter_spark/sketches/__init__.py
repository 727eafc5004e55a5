from ip_filter_spark.sketches.base import Sketch
from ip_filter_spark.sketches.bloom import BloomFilter
from ip_filter_spark.sketches.counting_bloom import CountingBloomFilter
from ip_filter_spark.sketches.frequent_directions import FrequentDirections
from ip_filter_spark.sketches.hll import HyperLogLog
from ip_filter_spark.sketches.cms import CountMinSketch
from ip_filter_spark.sketches.kll import KLLSketch
from ip_filter_spark.sketches.tdigest import TDigest
from ip_filter_spark.sketches.minhash import MinHashSignatures
from ip_filter_spark.sketches.registry import REGISTRY, from_bytes, make_sketch

__all__ = [
    "Sketch",
    "BloomFilter",
    "CountingBloomFilter",
    "FrequentDirections",
    "HyperLogLog",
    "CountMinSketch",
    "KLLSketch",
    "TDigest",
    "MinHashSignatures",
    "REGISTRY",
    "from_bytes",
    "make_sketch",
]
