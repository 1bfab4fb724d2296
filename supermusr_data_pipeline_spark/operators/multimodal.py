"""Multimodal column operators: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
typed metadata struct — the same pattern as the reference's opaque
FlatBuffers payloads routed by identifier (nexus-writer/src/main.rs:284-323).
Decode / feature-extraction runs as Arrow-batched ``mapInPandas`` so payload
bytes move JVM→Python once per batch, never per row.

The actual codec step is STUBBED (no image/audio libraries in this
environment): ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder (seeded by the
payload digest) produces stable "pixel" statistics — making the Spark-side
plumbing (schema, batching, partitioning, UDF signatures) fully testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("digest", T.StringType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("std_intensity", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an HxWx3 uint8 array.

    STUB: real decoding needs an image library not present in this
    container.  ``fake=True`` derives a deterministic 8x8x3 pseudo-image
    from the payload digest so downstream plumbing is testable.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image codec library; "
            "re-run with fake=True for deterministic test decoding"
        )
    digest = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(np.frombuffer(digest[:8], dtype=np.uint64))
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


def extract_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Decode + feature-extract media payloads via mapInPandas.

    Narrow operator: runs in the scan stage, one Arrow batch at a time; at
    100 TB the payload bytes stream through Python workers without any
    shuffle or driver involvement.
    """

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                payload = bytes(row.payload)
                img = decode_image(payload, fake=fake_decode)
                flat = img.astype(np.float64)
                out.append(
                    {
                        "media_id": row.media_id,
                        "kind": row.kind,
                        "n_bytes": len(payload),
                        "digest": hashlib.sha256(payload).hexdigest(),
                        "mean_intensity": float(flat.mean()),
                        "std_intensity": float(flat.std()),
                        # 12-dim feature: per-channel mean/std/min/max
                        "feature": [
                            float(x)
                            for c in range(3)
                            for x in (
                                flat[:, :, c].mean(),
                                flat[:, :, c].std(),
                                flat[:, :, c].min(),
                                flat[:, :, c].max(),
                            )
                        ],
                    }
                )
            yield pd.DataFrame(out) if out else pd.DataFrame(
                {f.name: pd.Series(dtype=object) for f in FEATURE_SCHEMA}
            )

    return media.select("media_id", "kind", "payload").mapInPandas(proc, FEATURE_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a deterministic synthetic media table from the documents
    table: payload = utf-8 text bytes, metadata from n_chars.  Exists so the
    multimodal path has a reproducible input in every environment."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit(8).alias("width"),
            F.lit(8).alias("height"),
            F.lit(16000).alias("sample_rate"),
            F.lit(1).alias("n_frames"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )
