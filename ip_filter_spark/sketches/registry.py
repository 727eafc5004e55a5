"""Name → sketch-class registry + generic deserialization."""

from __future__ import annotations

from ip_filter_spark.sketches.base import Sketch
from ip_filter_spark.sketches.bloom import BloomFilter
from ip_filter_spark.sketches.cms import CountMinSketch
from ip_filter_spark.sketches.counting_bloom import CountingBloomFilter
from ip_filter_spark.sketches.countsketch import CountSketch
from ip_filter_spark.sketches.cuckoo import CuckooFilter
from ip_filter_spark.sketches.ddsketch import DDSketch
from ip_filter_spark.sketches.frequent_directions import FrequentDirections
from ip_filter_spark.sketches.hll import HyperLogLog
from ip_filter_spark.sketches.kll import KLLSketch
from ip_filter_spark.sketches.kmv import KMVSketch
from ip_filter_spark.sketches.minhash import MinHashSignatures
from ip_filter_spark.sketches.misra_gries import MisraGries
from ip_filter_spark.sketches.tdigest import TDigest

REGISTRY: dict[str, type[Sketch]] = {
    cls.NAME: cls
    for cls in (
        BloomFilter,
        CountingBloomFilter,
        HyperLogLog,
        CountMinSketch,
        CountSketch,
        CuckooFilter,
        KLLSketch,
        DDSketch,
        TDigest,
        MinHashSignatures,
        MisraGries,
        KMVSketch,
        FrequentDirections,
    )
}


def make_sketch(name: str, **params) -> Sketch:
    return REGISTRY[name](**params)


def from_bytes(blob: bytes) -> Sketch:
    name, params, n_items, arrays = Sketch.parse(blob)
    obj = REGISTRY[name]._from_state(params, arrays)
    obj.n_items = n_items
    return obj
