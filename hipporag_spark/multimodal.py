"""Multimodal column handling: opaque ``binary`` payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns next to a
typed metadata struct — the schema, partitioning, Arrow batch shape and
UDF signatures here are real and tested; only the *codec* step is stubbed
(image/audio libraries are not in this container).  Set
``use_fake_decoder=True`` (the default) for a deterministic fake decoder
keyed on the payload's sha256, or ``False`` to surface the
``NotImplementedError`` marking where a real codec (Pillow/ffmpeg/soundfile)
plugs in.

Operators (all ``mapInPandas`` — Arrow-batched, no per-row Python round
trips; batch size bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``):

- :func:`attach_media`     synthesize a deterministic media table
                           ``(media_id, kind, payload, meta)`` for tests
- :func:`decode_features`  payload → fixed-width float feature vector
- :func:`resize_images`    payload → payload' with updated (width, height)
- :func:`sample_frames`    video payload → one row per sampled frame

Scale notes: payloads are the widest column in any multimodal table — the
plumbing keeps them out of every shuffle (feature extraction projects the
payload away before any groupBy/join; resize is map-only, shuffle-free).
The reference is text-only; this follows standard public
multimodal-pipeline practice (opaque bytes + sidecar metadata).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["attach_media", "decode_features", "resize_images", "sample_frames"]

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int, codec:string>"
)

FEATURE_DIM = 16


def attach_media(spark: SparkSession, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic fake media table for tests/benchmarks: payload bytes
    are a per-media_id sha256 chain (512 ASCII-hex bytes — chosen over raw
    RNG bytes so the driver gate's DuckDB oracle can reproduce the payload
    AND the sha256-derived fake features exactly in SQL); metadata is
    consistent with ``kind``."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                kind = kinds[int(i) % 3]
                payload = "".join(
                    hashlib.sha256(f"{seed}:{int(i)}:{k}".encode()).hexdigest()
                    for k in range(8)
                ).encode()
                meta = {
                    "width": int(16 + (i % 4) * 16) if kind != "audio" else 0,
                    "height": int(16 + (i % 3) * 16) if kind != "audio" else 0,
                    "sample_rate": 16000 if kind == "audio" else 0,
                    "n_frames": int(8 + i % 8) if kind == "video" else (1 if kind == "image" else 0),
                    "codec": {"image": "fake-png", "audio": "fake-pcm", "video": "fake-h264"}[kind],
                }
                rows.append((int(i), kind, payload, meta))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return spark.range(0, n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real codec: features derived from the
    sha256 of the payload (stable across partitionings and engines)."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 8) // len(h) + 1))[: dim * 8], dtype=np.uint64)
    return (raw % 10_000).astype(np.float64) / 10_000.0


def decode_features(
    media: DataFrame, dim: int = FEATURE_DIM, use_fake_decoder: bool = True
) -> DataFrame:
    """payload → ``(media_id, kind, features array<double>)``.

    The payload column is projected away in the same stage, so downstream
    shuffles carry only ``dim`` doubles per row.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_fake_decoder:
                raise NotImplementedError(
                    "real media decode requires Pillow/ffmpeg/soundfile — "
                    "not available in this container; plug the codec in here"
                )
            feats = [_fake_decode(p, dim).tolist() for p in pdf["payload"]]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "features": feats}
            )

    return media.mapInPandas(
        extract, schema="media_id long, kind string, features array<double>"
    )


def resize_images(
    media: DataFrame, width: int, height: int, use_fake_decoder: bool = True
) -> DataFrame:
    """Map-only resize: image rows get a re-encoded payload and updated
    metadata; non-image rows pass through untouched."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            mask = out["kind"] == "image"
            if mask.any():
                if not use_fake_decoder:
                    raise NotImplementedError("real image resize requires Pillow")
                # fake re-encode: payload truncated/padded to width*height/8 bytes
                tgt = max(width * height // 8, 16)
                out.loc[mask, "payload"] = out.loc[mask, "payload"].map(
                    lambda p: (bytes(p) * (tgt // max(len(p), 1) + 1))[:tgt]
                )
                out.loc[mask, "meta"] = out.loc[mask, "meta"].map(
                    lambda m: {**m, "width": width, "height": height}
                )
            yield out

    return media.mapInPandas(resize, schema=MEDIA_SCHEMA)


def sample_frames(
    media: DataFrame, every_nth: int = 2, use_fake_decoder: bool = True
) -> DataFrame:
    """Video payload → one row per sampled frame
    ``(media_id, frame_idx, frame_payload)`` — a 1→N Arrow flat-map."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for _, row in pdf.iterrows():
                if row["kind"] != "video":
                    continue
                if not use_fake_decoder:
                    raise NotImplementedError("real frame sampling requires ffmpeg")
                n_frames = int(row["meta"]["n_frames"])
                raw = bytes(row["payload"])
                per = max(len(raw) // max(n_frames, 1), 1)
                for fi in range(0, n_frames, every_nth):
                    ids.append(row["media_id"])
                    idxs.append(fi)
                    payloads.append(raw[fi * per : (fi + 1) * per])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_payload": payloads}
            )

    return media.mapInPandas(
        frames, schema="media_id long, frame_idx int, frame_payload binary"
    )
