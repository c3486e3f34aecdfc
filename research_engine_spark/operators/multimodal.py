"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The decode step is STUBBED (PIL/librosa/ffmpeg are not in this container):
``decode_image``/``decode_audio`` raise NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder (seeded from the
content digest) produces stable feature vectors so the Spark-side plumbing
— schema, partitioning, UDF signature, Arrow batch shape — is real and
testable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = "media_id bigint, kind string, feature array<float>, note string"


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payloads) for plumbing tests."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                rng = np.random.default_rng(np.random.SeedSequence([seed, int(i)]))
                kind = kinds[int(i) % 3]
                payload = rng.bytes(256 + int(i) % 512)
                rows.append({
                    "media_id": int(i), "kind": kind, "payload": payload,
                    "mime": {"image": "image/png", "audio": "audio/wav",
                             "video": "video/mp4"}[kind],
                    "width": 64 if kind != "audio" else None,
                    "height": 64 if kind != "audio" else None,
                    "duration_ms": None if kind == "image" else 1000,
                })
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _fake_decode(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for a real decoder: features seeded by the
    content digest — stable, content-addressed, collision-resistant."""
    h = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    return rng.standard_normal(dim).astype(np.float32)


def extract_features(media: DataFrame, dim: int = 16,
                     fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Real deployment would swap _fake_decode for PIL/torchvision/librosa
    decode inside the same batch loop — the Spark-side contract (binary in,
    array<float> out, Arrow batching, partition-parallel) is identical.
    """
    if not fake:
        raise NotImplementedError(
            "real media decoding requires PIL/librosa/ffmpeg, not present "
            "in this environment; use fake=True for plumbing")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode(bytes(p), dim).tolist() if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "feature": feats,
                "note": "fake-decode:sha256-seeded",
            })

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 250) -> DataFrame:
    """Video frame-sampling plan (timestamps to decode) — pure column ops;
    the decode itself is the stubbed step."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)),
                           F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
