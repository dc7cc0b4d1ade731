"""Multimodal column plumbing (image/audio/video as opaque binary).

A 100 TB training pipeline carries media as `binary` columns with
typed metadata structs; the Spark-side concerns — schema, partition
sizing, Arrow batch shape, UDF signatures — are real and tested here.
The *decoders* (JPEG/PNG/audio codecs) are STUBBED: this container has
no imaging/audio libraries, so `decode_image_features` tries the real
decoder import and otherwise uses a clearly-marked deterministic fake
(byte histogram) behind the same interface. Swap `_decode_real` in a
full environment; nothing else changes.

Schema contract:
    media(media_id long, kind string, meta struct<width:int, height:int,
          sample_rate:int, n_frames:int, format:string>, payload binary)

Scale notes: payloads dominate bytes — keep them OUT of shuffles
(derive features first, join features later by media_id); size
`spark.sql.files.maxPartitionBytes` so one task holds O(100) payloads;
`mapInPandas` streams Arrow record batches so a task never holds its
whole partition of payloads in memory at once.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int, format:string>, "
    "payload binary"
)

FEATURE_DIM = 64


def attach_fake_media(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Derive a deterministic synthetic media table from `documents`
    (doc_id, text): payload = repeated sha256 stream of the text,
    metadata derived from doc stats. Stands in for reading an Iceberg
    media table; deterministic ⇒ test- and bench-stable."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for t in pdf["text"].fillna(""):
                seed = hashlib.sha256(t.encode("utf-8")).digest()
                reps = 1 + len(t) % 8
                payloads.append(seed * reps)  # 32..256 bytes
                metas.append(
                    {"width": 16 + len(t) % 64, "height": 16 + (len(t) // 7) % 64,
                     "sample_rate": 16000, "n_frames": reps, "format": "fake"})
            yield pd.DataFrame({
                "media_id": pdf["doc_id"].to_numpy(),
                "kind": kind, "meta": metas, "payload": payloads,
            })

    return docs.select("doc_id", "text").mapInPandas(gen, MEDIA_SCHEMA)


def _decode_real(payload: bytes, fmt: str) -> np.ndarray:
    """Real decoder hook — requires an imaging library."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real image decoding needs Pillow; this environment ships "
            "none — the pipeline uses the deterministic fake decoder"
        ) from e
    raise NotImplementedError("wire PIL decode here in a full environment")


def _decode_fake(payload: bytes) -> np.ndarray:
    """Deterministic stand-in: 64-bin byte histogram, L1-normalized.
    Same shape/dtype contract as a real embedding."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 2, minlength=FEATURE_DIM)[:FEATURE_DIM]
    total = hist.sum()
    return (hist / total if total else hist).astype(np.float32)


def decode_image_features(media: DataFrame, use_real: bool = False) -> DataFrame:
    """media → (media_id, features array<float>). Arrow-batched
    mapInPandas; payload column is pruned from the output immediately
    so downstream stages never shuffle bytes."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                if use_real:
                    feats.append(_decode_real(bytes(payload),
                                              meta["format"]).tolist())
                else:
                    feats.append(_decode_fake(bytes(payload)).tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"].to_numpy(),
                                "features": feats})

    return media.mapInPandas(decode, "media_id long, features array<float>")


def sample_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """Video-style frame sampling: payload → one row per kept frame
    (frame = one 32-byte chunk in the fake layout; a real decoder
    yields actual frames at the same interface). Output rows are small;
    the explode happens AFTER the payload is cut into frames in-task,
    so the shuffle carries frames, not whole videos."""

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, fnos, frames = [], [], []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                n = int(meta["n_frames"])
                raw = bytes(payload)
                size = len(raw) // n if n else 0
                for f in range(0, n, every):
                    mids.append(mid)
                    fnos.append(f)
                    frames.append(raw[f * size:(f + 1) * size])
            yield pd.DataFrame({"media_id": mids, "frame_no": fnos,
                                "frame": frames})

    return media.mapInPandas(split, "media_id long, frame_no int, frame binary")
