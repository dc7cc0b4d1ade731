"""Baseline sequential JPEG codec in pure numpy — no imaging library.

Round-3 VERDICT missing #1: the multimodal column plumbing proved its
interface on netpbm only, while real corpora are JPEG. This module
implements the baseline DCT process of ITU-T T.81 (ISO/IEC 10918-1)
from the published spec:

  * decoder: SOI/APPn/DQT/SOF0/DHT/DRI/SOS segment parse, canonical
    Huffman entropy decode (T.81 §F.2.2.3 DECODE with the
    mincode/maxcode/valptr tables), DC prediction + AC run-length,
    dequantize, inverse zigzag, 8x8 IDCT (matrix form of T.81 §A.3.3),
    sampling factors up to 2x2 (4:4:4 / 4:2:2 / 4:2:0), restart
    markers, JFIF YCbCr -> RGB (BT.601 as specified in JFIF 1.02).
  * encoder (test/fixture path): 4:4:4 baseline with the example
    quantization tables of T.81 Annex K.1 (scaled by the libjpeg
    quality convention) and the example Huffman tables of K.3 —
    enough to synthesize deterministic real JPEG payloads in-container
    so the decoder is exercised end-to-end.

Bit twiddling is numpy-vectorized where it counts (unpackbits over
the unstuffed entropy stream, matrix IDCT over all blocks at once at
the end); the Huffman walk itself is a per-symbol Python loop —
acceptable for the feature-extraction batch sizes mapInPandas feeds
(payloads are thumbnails/images, decode cost is amortized across an
Arrow batch, and the container-level contract is correctness).
"""

from __future__ import annotations

import numpy as np

# --- tables from ITU-T T.81 --------------------------------------------

#: zigzag scan order (T.81 Figure 5): ZIGZAG[i] = raster index of the
#: i-th coefficient in zigzag order
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

#: example luminance / chrominance quantization tables (T.81 K.1,
#: Tables K.1 and K.2), raster order
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

#: example Huffman tables (T.81 K.3): (BITS counts per code length
#: 1..16, HUFFVAL symbol list)
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)))
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)))
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
     0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
     0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
     0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
     0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
     0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
     0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
     0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
     0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
     0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
     0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
     0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
     0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA])
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
     0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
     0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
     0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
     0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
     0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
     0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
     0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
     0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
     0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
     0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA])


def _dct_matrix() -> np.ndarray:
    """A[u, x] = a(u)/2 * cos((2x+1) u pi / 16) (T.81 A.3.3): forward
    F = A f A^T, inverse f = A^T F A."""
    a = np.full(8, 0.5)
    a[0] = 0.5 / np.sqrt(2.0)
    x = np.arange(8)
    u = x[:, None]
    return a[:, None] * np.cos((2 * x + 1) * u * np.pi / 16.0)


_A = _dct_matrix()


# --- canonical Huffman (T.81 Annex C / F.2.2.3) -------------------------

class _HuffTable:
    """Decode side: mincode/maxcode/valptr per length."""

    def __init__(self, bits, values):
        self.values = list(values)
        code = 0
        k = 0
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        for ln in range(1, 17):
            n = bits[ln - 1]
            if n:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += n
                k += n
                self.maxcode[ln] = code - 1
            code <<= 1

    def decode(self, br) -> int:
        code = br.read_bit()
        ln = 1
        while code > self.maxcode[ln]:
            code = (code << 1) | br.read_bit()
            ln += 1
            if ln > 16:
                raise ValueError("corrupt Huffman stream")
        return self.values[self.valptr[ln] + code - self.mincode[ln]]


def _encode_table(bits, values):
    """Encode side: symbol -> (code, length)."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[values[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first reader over the UNSTUFFED entropy bytes."""

    __slots__ = ("bits", "pos")

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        chunk = self.bits[self.pos:self.pos + n]
        self.pos += n
        v = 0
        for b in chunk:
            v = (v << 1) | int(b)
        return v

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the t-bit magnitude to signed."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


# --- decoder ------------------------------------------------------------

def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline sequential JPEG -> (H, W, 3) RGB uint8 (or (H, W) for
    a single-component stream). Supports DQT/DHT/SOF0/DRI/SOS,
    component sampling factors up to 2, restart markers."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    i = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    comps = None  # list of dicts: id, h, v, tq
    width = height = 0
    restart_interval = 0
    n = len(payload)
    while i < n:
        if payload[i] != 0xFF:
            raise ValueError(f"expected marker at {i}")
        marker = payload[i + 1]
        i += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        seg_len = int.from_bytes(payload[i:i + 2], "big")
        seg = payload[i + 2:i + seg_len]
        i += seg_len
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                j += 1
                if pq:
                    raise ValueError("16-bit quant tables unsupported")
                qt[tq] = np.frombuffer(
                    seg[j:j + 64], dtype=np.uint8).astype(np.int64)
                j += 64
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                bits = list(seg[j + 1:j + 17])
                nv = sum(bits)
                values = list(seg[j + 17:j + 17 + nv])
                (huff_ac if tc else huff_dc)[th] = _HuffTable(bits, values)
                j += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            height = int.from_bytes(seg[1:3], "big")
            width = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            for c in range(nc):
                o = 6 + 3 * c
                comps.append({"id": seg[o], "h": seg[o + 1] >> 4,
                              "v": seg[o + 1] & 15, "tq": seg[o + 2]})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in comps if x["id"] == cs)
                scan.append((comp, tables >> 4, tables & 15))
            # entropy-coded data runs to the next non-RST marker
            j = i
            chunks = []
            while j < n - 1:
                if payload[j] == 0xFF:
                    nxt = payload[j + 1]
                    if nxt == 0x00:
                        chunks.append(payload[i:j + 1])  # keep the FF
                        i = j + 2  # skip stuffed 00
                        j = i
                        continue
                    if 0xD0 <= nxt <= 0xD7:
                        # RSTn: drop the marker pair HERE, where FF Dn
                        # is unambiguous (a data 0xFF is still stuffed
                        # as FF 00 at this point). Stripping later from
                        # the unstuffed stream would also delete a
                        # legitimate data byte 0xFF followed by a data
                        # byte in 0xD0-0xD7.
                        chunks.append(payload[i:j])
                        i = j + 2
                        j = i
                        continue
                    break
                j += 1
            chunks.append(payload[i:j])
            i = j
            data = b"".join(chunks)
            return _decode_scan(data, scan, qt, huff_dc, huff_ac,
                                width, height, restart_interval)
        # APPn/COM and others: skipped
    raise ValueError("no SOS segment found")


def _decode_scan(data, scan, qt, huff_dc, huff_ac, width, height,
                 restart_interval):
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    # RST markers were already removed during the SOS chunk walk in
    # decode_jpeg (the only place FF Dn is unambiguous); the stream
    # here is pure unstuffed entropy data and we re-align at each
    # restart interval via br.align().
    br = _BitReader(data)
    planes = []
    coefs = []  # per scan component: list of (bx, by, 64-coef array)
    for comp, _td, _ta in scan:
        bw = mcux * comp["h"]
        bh = mcuy * comp["v"]
        coefs.append(np.zeros((bh, bw, 64), dtype=np.float64))
    pred = [0] * len(scan)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                br.align()
                pred = [0] * len(scan)
            for ci, (comp, td, ta) in enumerate(scan):
                for v in range(comp["v"]):
                    for h in range(comp["h"]):
                        blk = np.zeros(64, dtype=np.float64)
                        t = huff_dc[td].decode(br)
                        diff = _extend(br.receive(t), t)
                        pred[ci] += diff
                        blk[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = huff_ac[ta].decode(br)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            blk[k] = _extend(br.receive(s), s)
                            k += 1
                        coefs[ci][my * comp["v"] + v,
                                  mx * comp["h"] + h] = blk
            mcu_count += 1
    # dequantize + inverse zigzag + IDCT, all blocks of a component at once
    for ci, (comp, _td, _ta) in enumerate(scan):
        q = qt[comp["tq"]].astype(np.float64)  # zigzag order
        c = coefs[ci] * q  # both in zigzag order
        bh, bw, _ = c.shape
        rast = c[:, :, UNZIGZAG].reshape(bh, bw, 8, 8)
        # f = A^T F A over every block
        spatial = np.einsum("ux,ijuv,vy->ijxy", _A, rast, _A) + 128.0
        plane = spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        # upsample to full resolution (sample replication, JFIF default)
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:height, :width])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    # JFIF 1.02 / BT.601 conversion
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)),
                   0, 255).astype(np.uint8)


# --- encoder (4:4:4 baseline; fixture/test path) ------------------------

def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality convention: scale = 5000/q (q<50) else 200-2q."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * scale + 50) // 100
    return np.clip(q, 1, 255)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill (T.81 F.1.2.3)


def _encode_block(bw: _BitWriter, blk: np.ndarray, pred: int,
                  dc_tab, ac_tab) -> int:
    """One quantized zigzag block -> entropy bits; returns new DC pred."""
    dc = int(blk[0])
    diff = dc - pred
    mag = abs(diff)
    t = int(mag).bit_length()
    code, ln = dc_tab[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = int(np.max(np.nonzero(blk)[0])) if np.any(blk[1:]) else 0
    for k in range(1, 64):
        v = int(blk[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = ac_tab[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
        if k == last_nz:
            break
    if last_nz < 63:
        code, ln = ac_tab[0x00]  # EOB
        bw.write(code, ln)
    return dc


def _quantize_plane(plane: np.ndarray, q: np.ndarray, bh: int,
                    bw_: int) -> np.ndarray:
    """Plane -> (bh, bw, 64) quantized zigzag blocks (edge-padded)."""
    h, w = plane.shape
    p = np.pad(plane, ((0, bh * 8 - h), (0, bw_ * 8 - w)),
               mode="edge") - 128.0
    blocks = p.reshape(bh, 8, bw_, 8).transpose(0, 2, 1, 3)
    co = np.einsum("ux,ijxy,vy->ijuv", _A, blocks, _A)
    zz = co.reshape(bh, bw_, 64)[:, :, ZIGZAG]
    return np.round(zz / q.astype(np.float64)[ZIGZAG]).astype(np.int64)


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """(H, W, 3) RGB or (H, W) gray uint8 -> baseline JPEG.
    ``subsample=True`` emits 4:2:0 (2x2 luma sampling, box-averaged
    chroma) — exercising the decoder's interleaved-MCU upsample path;
    default is 4:4:4. ``restart_interval=n`` emits a DRI segment and
    RSTm markers every n MCUs (T.81 B.2.4.4 / E.1.4) — exercising the
    decoder's restart re-alignment path."""
    img = np.asarray(img, dtype=np.float64)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img]
        samps = [(1, 1)]
    else:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            ph2, pw2 = -(-h // 2) * 2, -(-w // 2) * 2
            def down(p):
                p = np.pad(p, ((0, ph2 - h), (0, pw2 - w)), mode="edge")
                return p.reshape(ph2 // 2, 2, pw2 // 2, 2).mean(axis=(1, 3))
            planes = [y, down(cb), down(cr)]
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samps = [(1, 1), (1, 1), (1, 1)]
    nc = len(planes)
    hmax = max(sh for sh, _ in samps)
    vmax = max(sv for _, sv in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    ql = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)
    qtabs = [ql] + [qc] * (nc - 1)
    enc_dc_l = _encode_table(*HUFF_DC_LUMA)
    enc_ac_l = _encode_table(*HUFF_AC_LUMA)
    enc_dc_c = _encode_table(*HUFF_DC_CHROMA)
    enc_ac_c = _encode_table(*HUFF_AC_CHROMA)
    quantized = [
        _quantize_plane(planes[ci], qtabs[ci],
                        mcuy * samps[ci][1], mcux * samps[ci][0])
        for ci in range(nc)]

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0\x00\x10JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"

    def seg(marker, body):
        out.extend(marker)
        out.extend((len(body) + 2).to_bytes(2, "big"))
        out.extend(body)

    # DQT on the wire is zigzag order
    seg(b"\xff\xdb", bytes([0]) + bytes(ql[ZIGZAG].astype(np.uint8)))
    if not gray:
        seg(b"\xff\xdb", bytes([1]) + bytes(qc[ZIGZAG].astype(np.uint8)))
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([nc])
    for c in range(nc):
        sh, sv = samps[c]
        sof += bytes([c + 1, (sh << 4) | sv, 0 if c == 0 else 1])
    seg(b"\xff\xc0", bytes(sof))
    tables = [(0, 0, HUFF_DC_LUMA), (1, 0, HUFF_AC_LUMA)]
    if not gray:
        tables += [(0, 1, HUFF_DC_CHROMA), (1, 1, HUFF_AC_CHROMA)]
    for tc, th, (bits, vals) in tables:
        seg(b"\xff\xc4", bytes([(tc << 4) | th] + bits + vals))
    if restart_interval:
        seg(b"\xff\xdd", int(restart_interval).to_bytes(2, "big"))
    sos = bytearray([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += bytes([0, 63, 0])
    seg(b"\xff\xda", bytes(sos))

    bw = _BitWriter()
    preds = [0] * nc
    tabs = [(enc_dc_l, enc_ac_l)] + [(enc_dc_c, enc_ac_c)] * (nc - 1)
    mcu_count = 0
    rst_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.flush()  # byte-align (1-fill) before the marker
                bw.out += bytes([0xFF, 0xD0 + rst_n])
                rst_n = (rst_n + 1) % 8
                preds = [0] * nc
            mcu_count += 1
            for ci in range(nc):
                sh, sv = samps[ci]
                for v in range(sv):
                    for hh in range(sh):
                        preds[ci] = _encode_block(
                            bw, quantized[ci][my * sv + v, mx * sh + hh],
                            preds[ci], *tabs[ci])
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
