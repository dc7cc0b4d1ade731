"""PNG codec in numpy + stdlib zlib — no imaging library.

PNG (RFC 2083 / ISO 15948) baseline support:
  * decoder: chunk parse (IHDR/PLTE/IDAT/IEND), zlib inflate of the
    concatenated IDAT stream, per-scanline unfiltering (the five
    filter types of §6: None/Sub/Up/Average/Paeth), 8-bit greyscale /
    truecolour / indexed / with-alpha, non-interlaced.
  * encoder (fixture path): filter type 0 scanlines + one zlib
    stream — enough to synthesize deterministic real PNG payloads
    in-container so the decoder runs end-to-end.

Interlaced (Adam7) and 16-bit depths raise — the baseline decoder
refuses rather than mis-decodes, like the JPEG module refuses
progressive streams.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

#: samples per pixel by colour type (§11.2.2)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (H, W[, C]) uint8. Greyscale returns 2-D; RGB /
    RGBA / expanded palette return 3-D."""
    if payload[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    i = 8
    idat = []
    ihdr = None
    plte = None
    n = len(payload)
    while i < n:
        (length,) = struct.unpack(">I", payload[i:i + 4])
        ctype = payload[i + 4:i + 8]
        data = payload[i + 8:i + 8 + length]
        i += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"bit depth {depth} unsupported (8 only)")
    if interlace:
        raise ValueError("Adam7 interlace unsupported")
    if color not in _CHANNELS:
        raise ValueError(f"colour type {color} unsupported")
    ch = _CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT size mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = raw[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        line = raw[y, 1:].copy()
        ft = int(ftypes[y])
        if ft == 0:
            cur = line
        elif ft == 1:  # Sub: sequential in x — per-pixel loop over ch strides
            cur = line
            for x in range(ch, stride):
                cur[x] = (int(cur[x]) + int(cur[x - ch])) & 0xFF
        elif ft == 2:  # Up
            cur = (line.astype(np.int32) + prev).astype(np.uint8)
        elif ft == 3:  # Average
            cur = line
            for x in range(stride):
                left = int(cur[x - ch]) if x >= ch else 0
                cur[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            cur = line
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                c = int(prev[x - ch]) if x >= ch else 0
                b = int(prev[x])
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"filter type {ft}")
        out[y] = cur
        prev = out[y]
    img = out.reshape(h, w, ch)
    if color == 3:  # indexed -> RGB via palette
        if plte is None:
            raise ValueError("indexed PNG without PLTE")
        img = plte[img[:, :, 0]]
    if img.shape[2] == 1:
        return img[:, :, 0]
    return img


def encode_png(img: np.ndarray) -> bytes:
    """(H, W[, C]) uint8 -> PNG (filter 0, one zlib stream)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", crc))

    return (_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b""))
