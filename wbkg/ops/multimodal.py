"""Multimodal (image/audio/video) column plumbing.

Media is carried as opaque `binary` payload columns + typed metadata structs;
transformations run as Arrow-batched pandas UDFs over mapInPandas. The codec
step itself is STUBBED (no image/audio libraries in this container): decode
is a deterministic fake keyed on the payload hash, clearly marked, so the
Spark-side plumbing — schema, partitioning, UDF signature, batch shape — is
real and tested while the pixel math is not.

At 100 TB: payloads dominate storage, so every operator here (a) prunes to
the metadata columns when the payload is not needed and (b) processes
payloads streaming per Arrow batch without collecting.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("doc_id", StringType()),
        StructField("kind", StringType()),      # image | audio | video
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)

FEATURE_DIM = 16


def gen_media_df(spark, docs: int = 20, per_doc: int = 2, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rows = []
    for d in range(docs):
        for m in range(per_doc):
            key = f"{seed}:{d}:{m}".encode()
            payload = hashlib.blake2b(key, digest_size=64).digest()
            kind = ["image", "audio", "video"][m % 3]
            rows.append(
                (
                    f"M{d:05d}_{m}",
                    f"D{d:07d}",
                    kind,
                    {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                    64 if kind != "audio" else None,
                    48 if kind != "audio" else None,
                    1000 * (m + 1) if kind != "image" else None,
                    payload,
                )
            )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def _fake_decode(payload: bytes) -> np.ndarray:
    """STUB for the real codec: deterministic pseudo-pixels derived from the
    payload hash. A real deployment swaps this for PIL/libav decode —
    signature and batch flow stay identical."""
    h = hashlib.blake2b(payload, digest_size=FEATURE_DIM * 4).digest()
    return np.frombuffer(h, dtype=np.uint32).astype(np.float64) / np.iinfo(np.uint32).max


def decode_unavailable(*_args, **_kwargs):
    """The honest entry point for real decoding in this container."""
    raise NotImplementedError(
        "image/audio codecs are not installed in this environment; "
        "extract_features uses the deterministic _fake_decode stub instead"
    )


def extract_features(media: DataFrame) -> DataFrame:
    """media -> (media_id, doc_id, kind, feature: array<float>).

    Column-pruned input (payload + keys only), Arrow-batched, one row out per
    row in. The feature vector is L2-normalized.
    """

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for payload in pdf["payload"]:
                v = _fake_decode(bytes(payload))
                norm = np.linalg.norm(v)
                vecs.append((v / norm if norm else v).astype(np.float32).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "feature": vecs,
                }
            )

    return media.select("media_id", "doc_id", "kind", "payload").mapInPandas(
        feats, schema="media_id string, doc_id string, kind string, feature array<float>"
    )


def frame_sample(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """video/audio -> one row per sampled frame offset (metadata-only op:
    exploding a sequence column; payload untouched and pruned)."""
    frames = F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
    return (
        media.filter(F.col("kind").isin("video", "audio"))
        .filter(F.col("duration_ms").isNotNull())
        .select("media_id", "doc_id", "kind", F.explode(frames).alias("frame_ms"))
    )


def resize_meta(media: DataFrame, max_side: int = 32) -> DataFrame:
    """resize planning as pure column math (aspect-preserving target dims);
    the pixel resample itself would live in extract_features' decode step."""
    scale = F.least(
        F.lit(max_side) / F.greatest(F.col("width"), F.lit(1)),
        F.lit(max_side) / F.greatest(F.col("height"), F.lit(1)),
        F.lit(1.0),
    )
    return media.filter(F.col("width").isNotNull()).select(
        "media_id",
        "width",
        "height",
        F.ceil(F.col("width") * scale).cast("int").alias("target_w"),
        F.ceil(F.col("height") * scale).cast("int").alias("target_h"),
    )
