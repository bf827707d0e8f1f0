"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

For a 100 TB training pipeline the engine treats media as ``binary`` columns
with a typed metadata struct, processed by Arrow-batched ``mapInPandas``
stages. The Spark-side plumbing here — schemas, batch iteration, partition
sizing, UDF signatures — is real and tested; the codec calls themselves are
STUBBED (``decode_fn`` defaults to a deterministic fake) because no
image/audio libraries exist in this container. Swap ``decode_fn`` for a
PIL/libav call in production; nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),  # image/audio/video
        T.StructField("payload", T.BinaryType(), False),  # opaque encoded bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)


def _fake_decode(payload: bytes, meta) -> list[float]:
    """Deterministic stand-in for a real codec: 8 pseudo-features derived
    from a digest of the bytes. Replace with PIL/torchaudio/ffmpeg."""
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:8]]


def extract_features(
    df: DataFrame,
    decode_fn: Callable[[bytes, object], list[float]] | None = None,
    n_features: int = 8,
    batch_rows: int = 256,
) -> DataFrame:
    """Decode + feature-extract media rows via mapInPandas.

    Batch shape notes for real codecs: media payloads are MBs, so the Arrow
    batch row-count must stay small (``batch_rows``) to bound worker memory;
    set spark.sql.execution.arrow.maxRecordsPerBatch accordingly or
    repartition so ~128MB of payload lands per task.
    """
    decode = decode_fn or _fake_decode
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("media_type", T.StringType(), False),
            T.StructField("features", T.ArrayType(T.FloatType()), False),
        ]
    )

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                feats = [decode(p, m) for p, m in zip(chunk["payload"], chunk["meta"])]
                yield pd.DataFrame(
                    {
                        "doc_id": chunk["doc_id"].values,
                        "media_type": chunk["media_type"].values,
                        "features": feats,
                    }
                )

    return df.mapInPandas(_gen, out_schema)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize stage — stubbed codec, real plumbing.

    Raises NotImplementedError per row ONLY when actually executed against
    real payloads without a codec; the default fake passes bytes through and
    rewrites meta, which keeps the stage testable.
    """
    out_schema = df.schema

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["meta"] = [
                {"width": width, "height": height, "duration_ms": m["duration_ms"] if m else None,
                 "codec": (m["codec"] if m else None)}
                for m in pdf["meta"]
            ]
            yield pdf

    return df.mapInPandas(_gen, out_schema)


def sample_video_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling stage: one output row per sampled frame (explode on a
    computed frame index — JVM-side; the decode of each frame is the stubbed
    feature stage above)."""
    frames = F.sequence(
        F.lit(0), F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)), F.lit(every_ms)
    )
    return (
        df.filter(F.col("media_type") == "video")
        .withColumn("frame_ms", F.explode(frames))
        .select("doc_id", "media_type", "payload", "meta", "frame_ms")
    )


def synthetic_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests."""
    import numpy as np

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        mt = ["image", "audio", "video"][i % 3]
        payload = bytes(rng.integers(0, 256, size=64, dtype=np.uint8))
        rows.append(
            {
                "doc_id": f"m-{i:06d}",
                "media_type": mt,
                "payload": payload,
                "meta": {
                    "width": 64 if mt == "image" else None,
                    "height": 64 if mt == "image" else None,
                    "duration_ms": 3000 if mt != "image" else None,
                    "codec": {"image": "png", "audio": "opus", "video": "h264"}[mt],
                },
            }
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
