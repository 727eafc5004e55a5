from ip_filter_spark.operators.lpm import PathLPM, derive_prefix_table, exact_lpm
from ip_filter_spark.operators.dedup import (
    dedup_exact,
    exact_dup_groups,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_pairs,
    simhash_signatures,
)
from ip_filter_spark.operators.similarity import (
    RHPIndex,
    cosine_topk,
    embedding_near_dup_pairs,
    rhp_bucketed_topk,
    rhp_signatures,
)
from ip_filter_spark.operators.cidr import (
    build_ip4_lpm,
    cidr4_route_table,
    format_ip4,
    ip4_from_dotted,
    ip4_to_bitpath,
    ip6_to_bitpath,
    lookup_ip4,
)
from ip_filter_spark.operators.topk import cms_topk, exact_topk
from ip_filter_spark.operators.quantiles import exact_quantiles, sketch_quantiles
from ip_filter_spark.operators.multimodal import (
    attach_fake_media,
    decode_bmp,
    decode_ppm,
    decode_wav,
    extract_features,
    resize_image_nearest,
    sample_frames,
)

__all__ = [
    "PathLPM",
    "derive_prefix_table",
    "exact_lpm",
    "dedup_exact",
    "exact_dup_groups",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash_pairs",
    "simhash_signatures",
    "RHPIndex",
    "cosine_topk",
    "build_ip4_lpm",
    "cidr4_route_table",
    "format_ip4",
    "ip4_from_dotted",
    "ip4_to_bitpath",
    "ip6_to_bitpath",
    "lookup_ip4",
    "embedding_near_dup_pairs",
    "rhp_bucketed_topk",
    "rhp_signatures",
    "cms_topk",
    "exact_topk",
    "exact_quantiles",
    "sketch_quantiles",
    "attach_fake_media",
    "decode_bmp",
    "decode_ppm",
    "decode_wav",
    "extract_features",
    "resize_image_nearest",
    "sample_frames",
]
