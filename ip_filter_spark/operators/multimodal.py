"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video bytes travel as ``BinaryType`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow-
batched ``mapInPandas`` stages. The decode kernels themselves are STUBBED
(no imaging/audio libs in this container): ``deterministic_fake=True``
produces a seeded, content-derived feature vector so the Spark-side
plumbing — schema, batching, partitioning, UDF signatures — is real and
testable; ``deterministic_fake=False`` raises NotImplementedError where a
real libjpeg/ffmpeg call would go.

At 100 TB scale the binary column dominates I/O: keep it in its own
parquet column chunk (it already is, columnar), never project it unless
the stage needs bytes, and size ``spark.sql.files.maxPartitionBytes`` so
a task's batch of blobs fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", StructType().add("bytes", "binary").add("codec", "string"), True),
    ]
)


def attach_fake_media(df: DataFrame, id_col: str, kind: str = "image") -> DataFrame:
    """Deterministic binary payloads derived from the id — stands in for
    reading real media files; the bytes are sha2-derived so they are
    stable across runs and partitions."""
    payload = F.struct(
        F.unhex(F.sha2(F.concat(F.lit(kind), F.col(id_col).cast("string")), 512)).alias("bytes"),
        F.lit("fake/v1").alias("codec"),
    )
    return df.select(F.col(id_col).cast("long").alias("media_id"), F.lit(kind).alias("kind"), payload.alias("payload"))


FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", IntegerType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)


def extract_features(media: DataFrame, dim: int = 16, deterministic_fake: bool = True) -> DataFrame:
    """Decode + feature-extract stage. Real decode is stubbed; the fake
    path derives a unit feature vector from the payload bytes with one
    vectorized numpy pass per Arrow batch (the exact shape a real
    model-inference UDF would have)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                yield pd.DataFrame(columns=["media_id", "kind", "n_bytes", "feature"])
                continue
            if not deterministic_fake:
                raise NotImplementedError(
                    "real media decode requires imaging/audio libraries not present in this build"
                )
            blobs = [p["bytes"] for p in b["payload"]]
            mat = np.frombuffer(b"".join(blobs), dtype=np.uint8).reshape(len(blobs), -1)
            # fold the 64 payload bytes into `dim` buckets, L2-normalize
            folded = mat.astype(np.float32).reshape(len(blobs), dim, -1).sum(axis=2)
            norms = np.linalg.norm(folded, axis=1, keepdims=True)
            feats = folded / np.where(norms == 0, 1.0, norms)
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"].to_numpy(),
                    "kind": b["kind"].to_numpy(),
                    "n_bytes": [len(x) for x in blobs],
                    "feature": list(feats),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame-sampling stage shape for video: expands each payload into
    frame offsets (stubbed: offsets derived from payload length)."""
    return media.select(
        "media_id",
        F.posexplode(
            F.sequence(F.lit(0), (F.length(F.col("payload.bytes")) / every_n).cast("int") - 1)
        ).alias("frame_ix", "frame_offset"),
    ).withColumn("frame_offset", F.col("frame_offset") * every_n)
