"""FLAC codec — pure numpy/stdlib, implementing the public format
spec (RFC 9639 / xiph.org FLAC format): STREAMINFO metadata, frame
sync + UTF-8 frame numbers, CONSTANT/VERBATIM/FIXED/LPC subframes,
Rice-coded residual partitions, stereo decorrelation (left/side,
right/side, mid/side), CRC-8 header and CRC-16 frame checks.

The audio leg of the multimodal-column story alongside
``functions/wav.py``: FLAC is lossless, so decode is bit-exact and a
roundtrip through our own encoder reproduces the input samples
exactly. The encoder (fixture path) writes fixed-blocksize streams
with per-frame best-of fixed predictors (order 0–4) or quantized
Levinson–Durbin LPC, single Rice partition; the decoder handles the
general layout (any predictor, multi-partition residuals, escape
codes, wasted bits) so externally produced baseline streams decode
too. MP3/AAC remain out of scope (lossy psychoacoustic codecs —
an external library's job; the NotImplementedError gate in
functions/multimodal.py documents it).

Nothing here is ported from any decoder implementation — bit layouts
and predictor/Rice definitions are from the published specification.
"""

from __future__ import annotations

import math
import struct

import numpy as np

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


# --------------------------------------------------------------------------
# CRCs (FLAC frame header CRC-8 poly 0x07; frame CRC-16 poly 0x8005)
# --------------------------------------------------------------------------

def _make_crc_table(poly: int, width: int) -> np.ndarray:
    table = np.zeros(256, dtype=np.uint32)
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    for i in range(256):
        r = i << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if r & top else (r << 1)
        table[i] = r & mask
    return table


_CRC8_TABLE = _make_crc_table(0x07, 8)
_CRC16_TABLE = _make_crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = int(_CRC8_TABLE[(crc ^ b) & 0xFF])
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = int(_CRC16_TABLE[((crc >> 8) ^ b) & 0xFF]
                  ) ^ ((crc << 8) & 0xFFFF)
    return crc


# --------------------------------------------------------------------------
# bit IO (MSB-first)
# --------------------------------------------------------------------------

class _Bits:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        out = 0
        pos = self.pos
        data = self.data
        for _ in range(n):
            byte = data[pos >> 3]
            out = (out << 1) | ((byte >> (7 - (pos & 7))) & 1)
            pos += 1
        self.pos = pos
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        pos = self.pos
        data = self.data
        while True:
            byte = data[pos >> 3]
            bit = (byte >> (7 - (pos & 7))) & 1
            pos += 1
            if bit:
                break
            q += 1
        self.pos = pos
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


class _BitOut:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, v: int, n: int) -> None:
        self.write(v & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


def _utf8_number(n: int) -> bytes:
    """FLAC frame-number coding — the UTF-8 scheme extended to 36
    bits (spec 'coded number')."""
    if n < 0x80:
        return bytes([n])
    for nbytes, lead in ((2, 0xC0), (3, 0xE0), (4, 0xF0), (5, 0xF8),
                        (6, 0xFC), (7, 0xFE)):
        if n < (1 << (5 * nbytes + 1)) or nbytes == 7:
            out = bytearray(nbytes)
            for i in range(nbytes - 1, 0, -1):
                out[i] = 0x80 | (n & 0x3F)
                n >>= 6
            out[0] = lead | n
            return bytes(out)
    raise ValueError("number too large")


def _read_utf8_number(bits: _Bits) -> int:
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    v = b0 & (mask - 1)
    for _ in range(nbytes - 1):
        b = bits.read(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("bad UTF-8 coded number")
        v = (v << 6) | (b & 0x3F)
    return v


# --------------------------------------------------------------------------
# decode
# --------------------------------------------------------------------------

_BLOCKSIZE_TABLE = [0, 192, 576, 1152, 2304, 4608, -1, -2,
                    256, 512, 1024, 2048, 4096, 8192, 16384, 32768]
_SAMPLE_SIZE_TABLE = [0, 8, 12, 0, 16, 20, 24, 32]


def _read_residual(bits: _Bits, blocksize: int, order: int) -> np.ndarray:
    method = bits.read(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    part_order = bits.read(4)
    nparts = 1 << part_order
    if blocksize % nparts:
        raise ValueError("blocksize not divisible by partitions")
    out = np.empty(blocksize - order, dtype=np.int64)
    idx = 0
    for p in range(nparts):
        n = (blocksize >> part_order) - (order if p == 0 else 0)
        param = bits.read(pbits)
        if param == escape:
            raw_bits = bits.read(5)
            for i in range(n):
                out[idx] = bits.read_signed(raw_bits) if raw_bits else 0
                idx += 1
        else:
            for i in range(n):
                q = bits.read_unary()
                r = bits.read(param) if param else 0
                u = (q << param) | r
                out[idx] = (u >> 1) ^ -(u & 1)  # unzigzag
                idx += 1
    return out


def _restore_fixed(order: int, warmup: np.ndarray,
                   resid: np.ndarray) -> np.ndarray:
    if order == 0:
        return resid.copy()
    seq = resid.astype(np.int64)
    for k in range(order, 0, -1):
        seed = np.diff(warmup, n=k - 1)[-1] if k > 1 else warmup[-1]
        seq = seed + np.cumsum(seq)
    return np.concatenate([warmup, seq])


def _restore_lpc(warmup: np.ndarray, coefs: list[int], shift: int,
                 resid: np.ndarray) -> np.ndarray:
    order = len(coefs)
    n = order + resid.size
    x = [0] * n
    for i in range(order):
        x[i] = int(warmup[i])
    for i in range(order, n):
        pred = 0
        for j, c in enumerate(coefs):
            pred += c * x[i - 1 - j]
        x[i] = int(resid[i - order]) + (pred >> shift)
    return np.asarray(x, dtype=np.int64)


def _read_subframe(bits: _Bits, blocksize: int, bps: int) -> np.ndarray:
    if bits.read(1):
        raise ValueError("subframe padding bit set")
    ftype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = 1 + bits.read_unary()
        bps -= wasted
    if ftype == 0:  # CONSTANT
        v = bits.read_signed(bps)
        x = np.full(blocksize, v, dtype=np.int64)
    elif ftype == 1:  # VERBATIM
        x = np.array([bits.read_signed(bps) for _ in range(blocksize)],
                     dtype=np.int64)
    elif 8 <= ftype <= 12:  # FIXED order 0-4
        order = ftype - 8
        warmup = np.array([bits.read_signed(bps) for _ in range(order)],
                          dtype=np.int64)
        resid = _read_residual(bits, blocksize, order)
        x = _restore_fixed(order, warmup, resid)
    elif ftype >= 32:  # LPC, order = (type & 31) + 1
        order = (ftype & 31) + 1
        warmup = np.array([bits.read_signed(bps) for _ in range(order)],
                          dtype=np.int64)
        precision = bits.read(4) + 1
        if precision == 16:
            raise ValueError("invalid LPC precision escape")
        shift = bits.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [bits.read_signed(precision) for _ in range(order)]
        resid = _read_residual(bits, blocksize, order)
        x = _restore_lpc(warmup, coefs, shift, resid)
    else:
        raise ValueError(f"reserved subframe type {ftype}")
    if wasted:
        x = x << wasted
    return x


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes -> (float32 samples in [-1, 1], shape (n,) mono or
    (n, channels), sample_rate). Verifies frame CRC-8/CRC-16."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    i = 4
    streaminfo = None
    while True:
        hdr = payload[i:i + 4]
        last = hdr[0] & 0x80
        btype = hdr[0] & 0x7F
        blen = int.from_bytes(hdr[1:4], "big")
        body = payload[i + 4:i + 4 + blen]
        if btype == 0:
            streaminfo = body
        i += 4 + blen
        if last:
            break
    if streaminfo is None:
        raise ValueError("missing STREAMINFO")
    sr_chan_bps = int.from_bytes(streaminfo[10:18], "big")
    sample_rate = (sr_chan_bps >> 44) & 0xFFFFF
    channels = ((sr_chan_bps >> 41) & 0x7) + 1
    bps_info = ((sr_chan_bps >> 36) & 0x1F) + 1
    total_samples = sr_chan_bps & ((1 << 36) - 1)

    chans: list[list[np.ndarray]] = [[] for _ in range(channels)]
    got = 0
    while i < len(payload) and (total_samples == 0
                                or got < total_samples):
        frame_start = i
        bits = _Bits(payload)
        bits.pos = i * 8
        sync = bits.read(14)
        if sync != 0x3FFE:
            raise ValueError("lost frame sync")
        bits.read(1)  # reserved
        bits.read(1)  # blocking strategy
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        chan_code = bits.read(4)
        ss_code = bits.read(3)
        bits.read(1)  # reserved
        _read_utf8_number(bits)
        if bs_code == 6:
            blocksize = bits.read(8) + 1
        elif bs_code == 7:
            blocksize = bits.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_TABLE[bs_code]
        if sr_code == 12:
            bits.read(8)
        elif sr_code in (13, 14):
            bits.read(16)
        bps = _SAMPLE_SIZE_TABLE[ss_code] or bps_info
        header_crc = bits.read(8)
        if crc8(payload[frame_start:bits.byte_pos() - 1]) != header_crc:
            raise ValueError("frame header CRC-8 mismatch")

        if chan_code < 8:
            nch = chan_code + 1
            subs = [_read_subframe(bits, blocksize, bps)
                    for _ in range(nch)]
        else:
            # stereo decorrelation: side channel carries one extra bit
            if chan_code == 8:   # left/side
                left = _read_subframe(bits, blocksize, bps)
                side = _read_subframe(bits, blocksize, bps + 1)
                subs = [left, left - side]
            elif chan_code == 9:  # right/side
                side = _read_subframe(bits, blocksize, bps + 1)
                right = _read_subframe(bits, blocksize, bps)
                subs = [right + side, right]
            elif chan_code == 10:  # mid/side
                mid = _read_subframe(bits, blocksize, bps)
                side = _read_subframe(bits, blocksize, bps + 1)
                l = ((mid << 1) | (side & 1)) + side
                subs = [l >> 1, (l - (side << 1)) >> 1]
            else:
                raise ValueError(f"reserved channel assignment "
                                 f"{chan_code}")
            nch = 2
        if nch != channels:
            raise ValueError("channel count changed mid-stream")
        bits.align()
        frame_crc = bits.read(16)
        if crc16(payload[frame_start:bits.byte_pos() - 2]) != frame_crc:
            raise ValueError("frame CRC-16 mismatch")
        for c in range(channels):
            chans[c].append(subs[c])
        got += blocksize
        i = bits.byte_pos()

    full = [np.concatenate(c) if c else np.zeros(0, dtype=np.int64)
            for c in chans]
    if total_samples:
        full = [x[:total_samples] for x in full]
    scale = float(1 << (bps_info - 1))
    out = np.stack(full, axis=1).astype(np.float32) / scale
    if channels == 1:
        out = out[:, 0]
    return out, int(sample_rate)


# --------------------------------------------------------------------------
# encode
# --------------------------------------------------------------------------

def _rice_param(resid: np.ndarray) -> int:
    if resid.size == 0:
        return 0
    mean = float(np.abs(resid).mean())
    if mean < 0.5:
        return 0
    return min(int(math.log2(mean)) + 1, 14)


def _write_residual(bw: _BitOut, resid: np.ndarray) -> None:
    """Single-partition Rice coding (partition order 0), escape to
    raw when Rice would blow up."""
    bw.write(0, 2)   # method: 4-bit Rice
    bw.write(0, 4)   # partition order 0
    param = _rice_param(resid)
    r64 = resid.astype(np.int64)
    u = (r64 << 1) ^ (r64 >> 63)  # zigzag
    # escape if the worst quotient is pathological
    if u.size and int(u.max() >> param) > 1 << 16:
        raw_bits = max(int(np.abs(resid).max()).bit_length() + 1, 1)
        bw.write(0xF, 4)
        bw.write(raw_bits, 5)
        for v in resid:
            bw.write_signed(int(v), raw_bits)
        return
    bw.write(param, 4)
    for v in u:
        q = int(v) >> param
        bw.write_unary(q)
        if param:
            bw.write(int(v) & ((1 << param) - 1), param)


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    return np.diff(x, n=order) if order else x.copy()


def _best_fixed_order(x: np.ndarray) -> int:
    best, best_cost = 0, None
    for order in range(min(5, len(x))):
        cost = float(np.abs(np.diff(x, n=order)).sum()) if order \
            else float(np.abs(x).sum())
        if best_cost is None or cost < best_cost:
            best, best_cost = order, cost
    return best


def _lpc_coefs(x: np.ndarray, order: int, precision: int = 12):
    """Levinson–Durbin over the block autocorrelation, quantized to
    ``precision``-bit integers with a common shift (the published
    algorithm; exactness of the roundtrip never depends on the
    coefficient quality — the residual absorbs everything)."""
    fx = x.astype(np.float64)
    n = fx.size
    ac = np.array([float(np.dot(fx[: n - k], fx[k:]))
                   for k in range(order + 1)])
    if ac[0] == 0:
        return None
    err = ac[0]
    a = np.zeros(order)
    for i in range(order):
        acc = ac[i + 1] - np.dot(a[:i], ac[1:i + 1][::-1])
        k = acc / err
        a[:i] = a[:i] - k * a[:i][::-1]
        a[i] = k
        err *= (1 - k * k)
        if err <= 0:
            return None
    cmax = float(np.abs(a).max())
    if cmax == 0:
        return None
    shift = min(precision - 1 - max(int(cmax).bit_length(), 0), 14)
    shift = max(shift, 1)
    q = np.round(a * (1 << shift)).astype(np.int64)
    lim = 1 << (precision - 1)
    q = np.clip(q, -lim, lim - 1)
    if not q.any():
        return None
    return q.tolist(), shift


def _lpc_residual(x: np.ndarray, coefs: list[int],
                  shift: int) -> np.ndarray:
    order = len(coefs)
    c = np.asarray(coefs, dtype=np.int64)
    n = x.size
    preds = np.empty(n - order, dtype=np.int64)
    for i in range(order, n):
        preds[i - order] = int(np.dot(c, x[i - order:i][::-1])) >> shift
    return x[order:] - preds


def encode_flac(samples: np.ndarray, rate: int = 16000,
                bits_per_sample: int = 16, block_size: int = 4096,
                use_lpc: bool = False, lpc_order: int = 8,
                mid_side: bool = False) -> bytes:
    """int array (n,) mono or (n, 2) stereo (or float in [-1, 1]) →
    FLAC bytes. Lossless: decode_flac(encode_flac(x)) == x exactly
    (integer samples)."""
    x = np.asarray(samples)
    if x.dtype.kind == "f":
        x = np.clip(np.round(x * (1 << (bits_per_sample - 1))),
                    -(1 << (bits_per_sample - 1)),
                    (1 << (bits_per_sample - 1)) - 1)
    x = x.astype(np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, channels = x.shape
    bps = bits_per_sample

    out = bytearray(b"fLaC")
    info = bytearray()
    info += struct.pack(">HH", block_size, block_size)
    info += (0).to_bytes(3, "big") * 2  # min/max frame size unknown
    packed = (rate << 44) | ((channels - 1) << 41) | ((bps - 1) << 36) \
        | (n & ((1 << 36) - 1))
    info += packed.to_bytes(8, "big")
    info += bytes(16)  # md5 unset
    out += bytes([0x80]) + len(info).to_bytes(3, "big") + bytes(info)

    def write_subframe(bw: _BitOut, ch: np.ndarray, sbps: int) -> None:
        if np.all(ch == ch[0]):
            bw.write(0, 1)
            bw.write(0, 6)   # CONSTANT
            bw.write(0, 1)
            bw.write_signed(int(ch[0]), sbps)
            return
        if use_lpc and ch.size > lpc_order * 2:
            lc = _lpc_coefs(ch, lpc_order)
            if lc is not None:
                coefs, shift = lc
                order = len(coefs)
                bw.write(0, 1)
                bw.write(32 | (order - 1), 6)
                bw.write(0, 1)
                for v in ch[:order]:
                    bw.write_signed(int(v), sbps)
                bw.write(12 - 1, 4)  # precision 12
                bw.write_signed(shift, 5)
                for c in coefs:
                    bw.write_signed(int(c), 12)
                _write_residual(bw, _lpc_residual(ch, coefs, shift))
                return
        order = _best_fixed_order(ch)
        bw.write(0, 1)
        bw.write(8 | order, 6)  # FIXED
        bw.write(0, 1)
        for v in ch[:order]:
            bw.write_signed(int(v), sbps)
        _write_residual(bw, _fixed_residual(ch, order))

    frame_no = 0
    for start in range(0, n, block_size):
        blk = x[start:start + block_size]
        bs = blk.shape[0]
        bw = _BitOut()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)   # fixed blocksize strategy
        bw.write(7, 4)   # blocksize: 16-bit field
        bw.write(0, 4)   # sample rate: from STREAMINFO
        ms = mid_side and channels == 2
        bw.write(10 if ms else channels - 1, 4)
        bw.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps], 3)
        bw.write(0, 1)
        for b in _utf8_number(frame_no):
            bw.write(b, 8)
        bw.write(bs - 1, 16)
        hdr = bw.out[:]
        assert bw.nbits == 0
        bw.write(crc8(bytes(hdr)), 8)
        if ms:
            left, right = blk[:, 0], blk[:, 1]
            mid = (left + right) >> 1
            side = left - right
            write_subframe(bw, mid, bps)
            write_subframe(bw, side, bps + 1)
        else:
            for c in range(channels):
                write_subframe(bw, blk[:, c], bps)
        bw.align()
        body = bytes(bw.out)
        out += body + crc16(body).to_bytes(2, "big")
        frame_no += 1
    return bytes(out)
