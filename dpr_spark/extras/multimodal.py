"""Multimodal columns: image/audio/video as opaque `binary` + typed
metadata. The Spark-side plumbing (schemas, Arrow batch shapes, UDF
signatures, partition sizing) is real and tested; the codec inner step
is stubbed (no image/audio libraries in this container) behind
`decode_backend="fake"` — a deterministic fake decoder — with
`decode_backend="pil"`-style backends raising NotImplementedError until
their import succeeds.

Pattern: binary columns are large — keep them OUT of shuffles. All ops
here are mapInPandas over the storage partitioning (narrow), metadata
extraction happens once, and downstream joins carry only (id, features).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image|audio|video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = "media_id long, kind string, n_bytes long, feature array<float>"


def _fake_decode(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for a real decode+embed: bytes -> fixed-dim
    float feature via chunked byte statistics. REPLACE with a real codec
    backend (PIL/torchaudio/decord) where available."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(dim, dtype=np.float32)
    chunks = np.array_split(arr.astype(np.float32), dim)
    return np.array([c.mean() if c.size else 0.0 for c in chunks], dtype=np.float32)


def extract_features(
    media: DataFrame, decode_backend: str = "fake", batch_dim: int = 16
) -> DataFrame:
    """binary payload -> feature vector, Arrow-batched. The UDF signature
    and batch shape are what a real decoder plugs into."""
    if decode_backend != "fake":
        raise NotImplementedError(
            f"decode backend {decode_backend!r}: media codec libraries are "
            "not available in this environment; use 'fake' (deterministic) "
            "or plug a backend in _fake_decode's place"
        )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _fake_decode(bytes(p), batch_dim) if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else 0),
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(run, FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plumbing: emits (media_id, frame_idx) rows for
    frames 0, n, 2n, ... from meta.n_frames — the decode of each frame is
    the stubbed step; the row fan-out, pruning and partitioning are real."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.n_frames") - 1, F.lit(0)),
                    F.lit(every_n),
                )
            ).alias("frame_idx"),
        )
    )


def gen_fake_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8).tobytes()
        meta = {
            "width": int(rng.integers(16, 256)) if kind == "image" else None,
            "height": int(rng.integers(16, 256)) if kind == "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "n_frames": int(rng.integers(1, 100)) if kind == "video" else None,
        }
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
