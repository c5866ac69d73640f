"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched pandas UDFs over mapInPandas.

The decode step is STUBBED (the sandbox image has no PIL/ffmpeg/torchaudio):
``decode_image``/``decode_audio`` raise NotImplementedError unless the
deterministic fake decoder is requested. Everything Spark-side — schema,
partition sizing, UDF signatures, batch shapes — is real and tested, so
swapping in a real decoder is a one-function change on a cluster image.
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
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, payload_sha256 string, "
    "feat_mean double, feat_std double, feature array<float>"
)


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for plumbing tests: payload bytes are an
    md5 chain keyed by (media_id, block) — reproducible in ANSI SQL (DuckDB
    oracle regenerates the identical bytes via ``md5(id || ':' || block)``),
    unlike a seeded RNG stream. Metadata follows the kind. ``seed`` retained
    for API compatibility (ignored: the md5 chain is the determinism source)."""
    import hashlib

    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        n_bytes = 256 + (i % 7) * 64  # multiple of 16 ⇒ no feature padding
        payload = b"".join(
            hashlib.md5(f"{i}:{blk}".encode("ascii")).digest() for blk in range(n_bytes // 16)
        )
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + (i % 4) * 32 if kind != "audio" else None,
                64 + (i % 3) * 32 if kind != "audio" else None,
                1000 * (1 + i % 30) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_image(payload: bytes) -> "np.ndarray":
    """Real decoder hook (PIL/torchvision on a cluster image)."""
    raise NotImplementedError("image decode requires PIL/torchvision — not in this sandbox image")


def decode_audio(payload: bytes) -> "np.ndarray":
    raise NotImplementedError("audio decode requires soundfile/torchaudio — not in this sandbox image")


def _fake_decode(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in: treat payload bytes as the 'decoded' sample
    stream. Same shape contract as a real decoder's pooled features."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    pad = (-len(arr)) % dim
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, dtype=np.float32)])
    return arr.reshape(-1, dim).mean(axis=0)


def extract_features(media: DataFrame, dim: int = 16, use_fake_decoder: bool = True) -> DataFrame:
    """mapInPandas feature extraction: per Arrow batch, decode each payload and
    emit pooled features + content hash. Batches arrive ~arrow.maxRecordsPerBatch
    rows at a time; payloads never hit the driver."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            feats, means, stds, hashes, nbytes = [], [], [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                nbytes.append(len(b))
                # content hash over the lowercase-hex encoding: DuckDB 1.x
                # sha256 only accepts VARCHAR, so hashing the hex form keeps
                # the fingerprint oracle-verifiable (same collision strength)
                hashes.append(hashlib.sha256(b.hex().encode("ascii")).hexdigest())
                if use_fake_decoder:
                    v = _fake_decode(b, dim)
                else:  # pragma: no cover - cluster-only path
                    v = decode_image(b)
                feats.append(v.astype(np.float32).tolist())
                # feat_mean = exact mean byte value: integer sum / length in
                # float64 — one deterministic division, bit-identical to the
                # SQL oracle (a float32 pooled mean would drift per sum order)
                means.append(
                    float(int(np.frombuffer(b, dtype=np.uint8).sum())) / len(b) if b else 0.0
                )
                stds.append(float(v.astype(np.float64).std()) if v.size else 0.0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series(nbytes, dtype="int32"),
                    "payload_sha256": hashes,
                    "feat_mean": means,
                    "feat_std": stds,
                    "feature": feats,
                }
            )

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts_ms) — the
    explode that fans a video row out to decode tasks, sized by duration
    metadata BEFORE any decode happens (partition planning at 100 TB needs
    the fan-out computable from metadata alone)."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
