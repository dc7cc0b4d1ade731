"""Multimodal column plumbing (image/audio/video as opaque binary).

A 100 TB training pipeline carries media as `binary` columns with
typed metadata structs; the Spark-side concerns — schema, partition
sizing, Arrow batch shape, UDF signatures — are real and tested here.
Decoders are NATIVE pure-numpy implementations of the public specs
for netpbm, baseline JPEG (T.81 — functions/jpeg.py), PNG
(functions/png.py), PCM WAV (functions/wav.py) and FLAC (RFC 9639 —
functions/flac.py); only lossy audio (MP3/AAC) still needs an
external library, behind a loud NotImplementedError gate. Payload
kinds without a native decoder use a clearly-marked deterministic
fake (byte histogram) behind the same interface.

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


def attach_fake_media(docs: DataFrame, kind: str = "image",
                      fmt: str = "fake") -> DataFrame:
    """Derive a deterministic synthetic media table from `documents`
    (doc_id, text). ``fmt="fake"``: payload = repeated sha256 stream
    of the text. ``fmt="ppm"``: payload = a VALID binary P6 image
    whose pixels derive from the text's sha256 stream — so the real
    bytes→pixels decoder runs end-to-end with no imaging library.
    Stands in for reading an Iceberg media table; deterministic ⇒
    test- and bench-stable."""
    if fmt not in ("fake", "ppm", "jpeg", "png", "wav", "flac"):
        raise ValueError(
            "fmt must be 'fake', 'ppm', 'jpeg', 'png', 'wav' or 'flac'")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for t in pdf["text"].fillna(""):
                seed = hashlib.sha256(t.encode("utf-8")).digest()
                reps = 1 + len(t) % 8
                if fmt == "jpeg":
                    # REAL baseline JPEG payload (functions/jpeg.py):
                    # deterministic smooth image seeded by the sha
                    from .jpeg import encode_jpeg

                    w, h = 24 + len(t) % 16, 24 + (len(t) // 7) % 16
                    s0, s1, s2 = seed[0] + 1, seed[1] + 1, seed[2] + 1
                    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
                    img = np.clip(np.stack([
                        128 + 90 * np.sin(xx / (3 + s0 % 9)),
                        128 + 70 * np.cos(yy / (3 + s1 % 9)),
                        128 + 80 * np.sin((xx + yy) / (4 + s2 % 9)),
                    ], axis=-1), 0, 255).astype(np.uint8)
                    payloads.append(encode_jpeg(
                        img, quality=85, subsample=bool(seed[3] % 2)))
                    metas.append({"width": w, "height": h,
                                  "sample_rate": 16000, "n_frames": reps,
                                  "format": "jpeg"})
                elif fmt == "png":
                    from .png import encode_png

                    w, h = 20 + len(t) % 16, 20 + (len(t) // 7) % 16
                    n_pix = w * h * 3
                    pix = np.frombuffer(
                        (seed * (n_pix // len(seed) + 1))[:n_pix],
                        dtype=np.uint8).reshape(h, w, 3)
                    payloads.append(encode_png(pix))
                    metas.append({"width": w, "height": h,
                                  "sample_rate": 16000, "n_frames": reps,
                                  "format": "png"})
                elif fmt == "wav":
                    from .wav import encode_wav

                    freq = 100.0 + (seed[0] % 40) * 20.0
                    tt = np.arange(4000) / 16000.0
                    sig = (np.sin(2 * np.pi * freq * tt)
                           * (0.2 + (seed[1] % 5) / 10.0))
                    payloads.append(encode_wav(sig.astype(np.float32)))
                    metas.append({"width": 0, "height": 0,
                                  "sample_rate": 16000, "n_frames": reps,
                                  "format": "wav"})
                elif fmt == "flac":
                    from .flac import encode_flac

                    freq = 100.0 + (seed[0] % 40) * 20.0
                    tt = np.arange(4000) / 16000.0
                    sig = (np.sin(2 * np.pi * freq * tt)
                           * (0.2 + (seed[1] % 5) / 10.0))
                    payloads.append(encode_flac(
                        sig.astype(np.float32), rate=16000,
                        use_lpc=bool(seed[2] % 2)))
                    metas.append({"width": 0, "height": 0,
                                  "sample_rate": 16000, "n_frames": reps,
                                  "format": "flac"})
                elif fmt == "ppm":
                    w, h = 16 + len(t) % 16, 16 + (len(t) // 7) % 16
                    n = w * h * 3
                    pix = (seed * (n // len(seed) + 1))[:n]
                    payloads.append(b"P6\n%d %d\n255\n" % (w, h) + pix)
                    metas.append({"width": w, "height": h,
                                  "sample_rate": 16000, "n_frames": reps,
                                  "format": "ppm"})
                else:
                    payloads.append(seed * reps)  # 32..256 bytes
                    metas.append(
                        {"width": 16 + len(t) % 64,
                         "height": 16 + (len(t) // 7) % 64,
                         "sample_rate": 16000, "n_frames": reps,
                         "format": "fake"})
            yield pd.DataFrame({
                "media_id": pdf["doc_id"].to_numpy(),
                "kind": kind, "meta": metas, "payload": payloads,
            })

    return docs.select("doc_id", "text").mapInPandas(gen, MEDIA_SCHEMA)


def decode_ppm(payload: bytes) -> np.ndarray:
    """REAL image decode for binary PPM (P6, RGB) and PGM (P5, gray)
    — the netpbm formats need nothing beyond numpy, so this container
    can exercise a genuine bytes→pixels path end-to-end. Returns
    (H, W, 3) or (H, W) uint8. Handles comment lines and any
    whitespace run in the header; maxval must be <= 255 (the 2-byte
    variant raises)."""
    if payload[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PGM/PPM payload")
    rgb = payload[:2] == b"P6"
    # header: magic, width, height, maxval — tokens separated by
    # whitespace, '#' comments run to end of line
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i:i + 1].isspace():
            i += 1
        if payload[i:i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j:j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval, then raster
    width, height, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    n = width * height * (3 if rgb else 1)
    raster = np.frombuffer(payload, dtype=np.uint8, count=n, offset=i)
    return (raster.reshape(height, width, 3) if rgb
            else raster.reshape(height, width))


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbour resize (pure numpy index math)."""
    h, w = img.shape[:2]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return img[rows][:, cols]


def _features_from_pixels(img: np.ndarray) -> np.ndarray:
    """pixels → grayscale → 8x8 nearest-neighbour thumbnail → 64
    floats, L1-normalized — the classic perceptual-hash shape,
    matching FEATURE_DIM."""
    gray = (img.mean(axis=2) if img.ndim == 3
            else img.astype(np.float64))
    thumb = resize_nearest(gray, 8, 8).astype(np.float64).ravel()
    total = thumb.sum()
    return (thumb / total if total else thumb).astype(np.float32)


def _decode_real(payload: bytes, fmt: str) -> np.ndarray:
    """Real decoder: netpbm AND baseline JPEG handled natively
    (functions/jpeg.py — pure-numpy T.81 baseline codec), so the
    bytes→pixels→features path runs end-to-end in this container;
    PNG/audio formats still require an external library."""
    if payload[:2] in (b"P5", b"P6"):
        return _features_from_pixels(decode_ppm(payload))
    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return _features_from_pixels(decode_jpeg(payload))
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from .png import decode_png

        img = decode_png(payload)
        if img.ndim == 3 and img.shape[2] == 4:
            img = img[:, :, :3]  # drop alpha for luminance features
        if img.ndim == 3 and img.shape[2] == 2:
            img = img[:, :, 0]   # grey+alpha -> grey
        return _features_from_pixels(img)
    if (payload[:4] == b"RIFF" and payload[8:12] == b"WAVE") \
            or payload[:4] == b"fLaC":
        if payload[:4] == b"fLaC":
            from .flac import decode_flac

            x, _rate = decode_flac(payload)
        else:
            from .wav import decode_wav

            x, _rate = decode_wav(payload)
        if x.ndim == 2:
            x = x.mean(axis=1)  # downmix
        # FEATURE_DIM frame RMS energies, L1-normalized — the audio
        # analogue of the 8x8 grayscale thumbnail
        n = len(x)
        if n == 0:
            return np.zeros(FEATURE_DIM, dtype=np.float32)
        edges = np.linspace(0, n, FEATURE_DIM + 1).astype(np.int64)
        rms = np.array([
            np.sqrt(np.mean(np.square(x[a:b]))) if b > a else 0.0
            for a, b in zip(edges[:-1], edges[1:])])
        total = rms.sum()
        return (rms / total if total else rms).astype(np.float32)
    raise NotImplementedError(
        f"decoding {fmt!r}: netpbm, baseline JPEG, PNG, PCM WAV and "
        "FLAC decode natively (functions/jpeg.py, png.py, wav.py, "
        "flac.py); lossy audio (MP3/AAC) needs an external codec "
        "library")


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
