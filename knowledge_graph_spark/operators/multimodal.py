# -*- coding: utf-8 -*-
"""Multimodal column plumbing: image/audio/video as opaque binary.

Training-data pipelines carry media alongside text. The engine treats
media as ``binary`` payload + typed metadata struct, and runs
decode/feature/resize/frame-sample stages as Arrow-batched pandas UDFs
over ``mapInPandas`` — the Spark-side contract (schema, batching,
partition sizing) is real and tested; the codec itself is STUBBED
because the sandbox ships no image/audio libraries.

Codec policy: ``decode_metadata(codec=...)`` selects ``fake`` (default
— deterministic metadata derived from the payload bytes, byte-stable
goldens on any machine), ``real`` (PIL images / soundfile audio, rows
quarantined with a visible error when undecodable or the library is
missing), or ``auto`` (real per kind when wired, else fake). The real
path is contract-tested behind skipif gates, so it cannot rot unseen;
swapping the default for production is ONE argument, no Spark code.

Scale notes:
- media rows are big (MBs): ``spark.sql.files.maxPartitionBytes`` and
  a small ``arrow.maxRecordsPerBatch`` keep a batch << executor memory;
  callers should repartition by a content-hash bucket, never by host.
- feature extraction emits fixed-size float arrays -> downstream
  similarity search (operators/simsearch.py) applies unchanged.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int,height:int,n_frames:int,sample_rate:int,duration_s:double>"
)

DECODED_SCHEMA = (
    "media_id long, kind string, width int, height int, n_frames int, "
    "sample_rate int, duration_s double, ok boolean, error string"
)

FEATURE_DIM = 64
FEATURE_SCHEMA = f"media_id long, kind string, feature array<float>"


def _fake_decode(payload: bytes, kind: str) -> dict:
    """Deterministic stand-in for the codec: metadata derived from a
    blake2b of the payload. Replace with PIL/soundfile/pyav in prod."""
    h = hashlib.blake2b(payload or b"", digest_size=16).digest()
    a, b, c, d = struct.unpack("<IIII", h)
    if kind == "image":
        return {"width": 64 + a % 1920, "height": 64 + b % 1080,
                "n_frames": 1, "sample_rate": 0, "duration_s": 0.0}
    if kind == "audio":
        sr = (8000, 16000, 22050, 44100)[c % 4]
        return {"width": 0, "height": 0, "n_frames": 0,
                "sample_rate": sr, "duration_s": round(1 + d % 300 + a % 100 / 100, 2)}
    if kind == "video":
        return {"width": 320 + a % 1600, "height": 240 + b % 840,
                "n_frames": 24 * (1 + c % 120), "sample_rate": 0,
                "duration_s": float(1 + c % 120)}
    raise NotImplementedError(f"unknown media kind: {kind}")


def _real_decode(payload: bytes, kind: str) -> dict:
    """Production codec path: PIL for images, soundfile for audio,
    and a pure-Python container-header parse for video (MP4 box walk
    / EBML element walk — functions/mediameta.py; metadata only,
    frame decode would need pyav). Imports live inside the
    function so environments without the libraries can still import
    this module; a missing library surfaces as ImportError (codec=auto
    falls back to the fake; codec=real quarantines the row with a
    clear error). Contract-tested by
    tests/test_dedup_textstats.py::test_multimodal_real_codec_*
    (skipif-gated on the library, so the swap point can't rot)."""
    from io import BytesIO

    if kind == "image":
        from PIL import Image

        with Image.open(BytesIO(payload)) as im:
            return {"width": int(im.width), "height": int(im.height),
                    "n_frames": int(getattr(im, "n_frames", 1)),
                    "sample_rate": 0, "duration_s": 0.0}
    if kind == "audio":
        import soundfile as sf

        with sf.SoundFile(BytesIO(payload)) as f:
            return {"width": 0, "height": 0, "n_frames": 0,
                    "sample_rate": int(f.samplerate),
                    "duration_s": round(len(f) / f.samplerate, 2)}
    if kind == "video":
        from knowledge_graph_spark.functions.mediameta import (
            parse_video_metadata)

        m = parse_video_metadata(bytes(payload))
        return {"width": int(m["width"]), "height": int(m["height"]),
                "n_frames": int(m["n_frames"]), "sample_rate": 0,
                "duration_s": float(m["duration_s"])}
    raise NotImplementedError(f"unknown media kind: {kind}")


def _decode_one(payload: bytes, kind: str, codec: str = "fake") -> dict:
    if codec == "fake":
        return _fake_decode(payload, kind)
    if codec == "real":
        return _real_decode(payload, kind)
    # auto: best-effort — the real codec when it is wired for this
    # kind AND the payload actually parses, else the deterministic
    # fake; auto never quarantines (ValueError/OSError = unparseable
    # payload, RuntimeError = libsndfile reject, ImportError =
    # library absent, NotImplementedError = kind not wired)
    try:
        return _real_decode(payload, kind)
    except (ImportError, NotImplementedError, ValueError, OSError,
            RuntimeError):
        return _fake_decode(payload, kind)


def decode_metadata(media: DataFrame, codec: str = "fake") -> DataFrame:
    """media(media_id, kind, payload, ...) -> decoded metadata rows.
    Arrow-batched; errors are captured per row, never fail the stage.

    ``codec``: ``fake`` (default) uses the deterministic stand-in —
    byte-stable goldens on any machine, libraries present or not;
    ``real`` requires the production codec (PIL/soundfile) and
    quarantines rows it cannot decode (including when the library is
    missing — visible in ``error``, never silent); ``auto`` prefers
    the real codec per kind, falling back to the fake."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                try:
                    m = _decode_one(
                        bytes(payload) if payload is not None else b"",
                        kind, codec)
                    rows.append({"media_id": mid, "kind": kind, **m,
                                 "ok": True, "error": None})
                except Exception as e:  # quarantine, don't fail the task
                    rows.append({"media_id": mid, "kind": kind, "width": 0,
                                 "height": 0, "n_frames": 0, "sample_rate": 0,
                                 "duration_s": 0.0, "ok": False, "error": str(e)})
            yield pd.DataFrame(rows)

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=DECODED_SCHEMA
    )


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """payload -> fixed-size float feature vector (deterministic fake:
    seeded-hash gaussianish projection of payload bytes; swap for a
    real vision/audio encoder in prod). Vectorized numpy per batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                # blake2b caps digest_size at 64 bytes -> expand via a
                # counter-chained hash (deterministic XOF stand-in)
                seed = hashlib.blake2b(
                    bytes(payload) if payload is not None else b"",
                    digest_size=32,
                ).digest()
                raw = b"".join(
                    hashlib.blake2b(seed + struct.pack("<I", c),
                                    digest_size=64).digest()
                    for c in range((dim * 4 + 63) // 64)
                )[: dim * 4]
                v = np.frombuffer(raw, dtype="<u4").astype(np.float64)
                v = (v / 2**32) * 2 - 1
                v = v / (np.linalg.norm(v) or 1.0)
                feats.append(v.astype(np.float32).tolist())
            yield pd.DataFrame({
                "media_id": pdf["media_id"], "kind": pdf["kind"], "feature": feats,
            })

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def sample_frames(media: DataFrame, every_n: int = 24) -> DataFrame:
    """video rows -> one row per sampled frame index (metadata only in
    the sandbox; the real path attaches decoded frame bytes).
    Frame enumeration itself is JVM-side (sequence + explode) — only
    the decode (stubbed) would run in Python."""
    from pyspark.sql import functions as F

    decoded = decode_metadata(media.filter(F.col("kind") == "video"))
    return (
        decoded.filter(F.col("ok"))
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)),
                           F.lit(every_n))
            ).alias("frame_idx"),
        )
    )


def synthetic_media(spark, n: int, seed: int = 7) -> DataFrame:
    """Deterministic fake media table for tests: payload = seeded bytes."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = kinds[i % 3]
                payload = hashlib.blake2b(
                    struct.pack("<qq", seed, i), digest_size=32
                ).digest() * (1 + i % 4)
                rows.append({"media_id": i, "kind": kind, "payload": payload,
                             "meta": None})
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)
