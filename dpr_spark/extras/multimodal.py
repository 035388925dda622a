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


def decode_ppm(payload: bytes):
    """Real image decode for binary PPM (P6) — pure stdlib. Returns
    (width, height, pixels uint8[h, w, 3]). PPM is the no-dependency
    format; PIL/libjpeg backends plug into the same slot."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    fields = []
    pos = 2
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    n = width * height * 3
    px = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return width, height, px.reshape(height, width, 3)


def decode_wav(payload: bytes, with_data: bool = False):
    """Real audio header decode for RIFF/WAVE PCM — pure stdlib struct
    parsing (no audioop). Returns (n_channels, sample_rate,
    bits_per_sample, n_frames); with_data=True appends
    (data_offset, data_size) — the chunk walk's own offsets, so sample
    reads can't be fooled by a b"data" byte string inside an earlier
    LIST/INFO metadata chunk."""
    import struct

    if payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data_size = None
    data_off = None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", payload[pos + 8 : pos + 24])
        elif cid == b"data" and data_size is None:
            data_size = size
            data_off = pos + 8
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data_size is None:
        raise ValueError("missing fmt/data chunk")
    _, n_channels, sample_rate, _, block_align, bits = fmt
    n_frames = data_size // block_align if block_align else 0
    base = (n_channels, sample_rate, bits, n_frames)
    return base + (data_off, data_size) if with_data else base


def _stdlib_decode(payload: bytes, kind: str, dim: int = 16) -> np.ndarray:
    """Real decode for the stdlib-parsable formats: PPM pixels / WAV PCM
    samples -> fixed-dim chunked-mean feature (same output contract as
    _fake_decode). Video has no stdlib codec — explicitly unsupported."""
    if kind == "image":
        _, _, px = decode_ppm(payload)
        arr = px.reshape(-1).astype(np.float32)
    elif kind == "audio":
        n_ch, _, bits, n_frames, data_off, data_size = decode_wav(payload, with_data=True)
        if bits != 16:
            raise ValueError("only 16-bit PCM supported")
        arr = np.frombuffer(
            payload, dtype="<i2", count=data_size // 2, offset=data_off
        ).astype(np.float32)
    else:
        raise NotImplementedError(
            f"no stdlib codec for kind={kind!r}; use decode_backend='fake' "
            "or plug a real library backend"
        )
    if arr.size == 0:
        return np.zeros(dim, dtype=np.float32)
    chunks = np.array_split(arr, dim)
    return np.array([c.mean() if c.size else 0.0 for c in chunks], dtype=np.float32)


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
    """binary payload -> feature vector, Arrow-batched. Backends:
    'fake' (deterministic byte statistics, any kind) and 'stdlib' (REAL
    decode: PPM pixels for images, 16-bit PCM WAV samples for audio;
    video raises NotImplementedError — no stdlib codec exists). A
    PIL/torchaudio backend plugs into the same (payload, kind) -> feature
    slot."""
    if decode_backend not in ("fake", "stdlib"):
        raise NotImplementedError(
            f"decode backend {decode_backend!r}: media codec libraries are "
            "not available in this environment; use 'fake' (deterministic) "
            "or 'stdlib' (PPM/WAV)"
        )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decode_backend == "fake":
                feats = [
                    _fake_decode(bytes(p), batch_dim) if p is not None else None
                    for p in pdf["payload"]
                ]
            else:
                feats = [
                    _stdlib_decode(bytes(p), k, batch_dim) if p is not None else None
                    for p, k in zip(pdf["payload"], pdf["kind"])
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


def make_ppm(width: int, height: int, seed: int = 0) -> bytes:
    """A valid binary-PPM payload with deterministic pixels."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)
    return b"P6\n%d %d\n255\n" % (width, height) + px.tobytes()


def make_wav(n_frames: int, sample_rate: int = 16000, seed: int = 0) -> bytes:
    """A valid 16-bit mono PCM WAV payload with deterministic samples."""
    import struct

    rng = np.random.default_rng(seed)
    data = rng.integers(-32768, 32767, size=n_frames, dtype=np.int16).tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def gen_real_media(spark, n: int = 20, seed: int = 42) -> DataFrame:
    """Deterministic media table with REAL decodable payloads (PPM images
    and WAV audio) for the stdlib backend tests."""
    rows = []
    for i in range(n):
        if i % 2 == 0:
            w, h = 4 + i % 8, 3 + i % 5
            rows.append((i, "image", make_ppm(w, h, seed + i), {"width": w, "height": h, "sample_rate": None, "n_frames": None}))
        else:
            nf = 100 + 7 * i
            rows.append((i, "audio", make_wav(nf, seed=seed + i), {"width": None, "height": None, "sample_rate": 16000, "n_frames": nf}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


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
