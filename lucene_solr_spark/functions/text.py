"""Vectorized text-analysis functions (training-data pipeline ops).

Arrow-batched pandas UDFs — the engine-grade (64-bit, full-width)
variants of the SQL-checkable 16-bit suite entries in
relational/pipeline.py. All hashing is blake2b-based (stdlib,
deterministic across runs/machines — no PYTHONHASHSEED dependence).

Scale shape: every function is a scalar pandas UDF over `text`
(one Arrow batch in, one out) — embarrassingly parallel, no shuffle;
downstream dedup joins group on the emitted fingerprints.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType


def _token_hashes(text: str, seed: bytes = b"") -> np.ndarray:
    """uint64 blake2b hash per whitespace token."""
    toks = text.split()
    if not toks:
        return np.zeros(0, dtype=np.uint64)
    return np.array(
        [int.from_bytes(hashlib.blake2b(seed + t.encode("utf-8"),
                                        digest_size=8).digest(), "big")
         for t in toks],
        dtype=np.uint64,
    )


@F.pandas_udf(LongType())
def simhash64(text: pd.Series) -> pd.Series:
    """64-bit SimHash: per-token 64-bit hash; each bit contributes
    +1/-1 per occurrence; fingerprint = sign vector. Near-dups differ
    in few bits (compare with bit_count(simhash64(a) ^ simhash64(b)))."""
    out = np.zeros(len(text), dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for i, t in enumerate(text.fillna("")):
        h = _token_hashes(t)
        if h.size == 0:
            continue
        bits = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
        sums = (2 * bits - 1).sum(axis=0)
        fp = np.uint64(0)
        for b in np.flatnonzero(sums >= 0):
            fp |= np.uint64(1) << np.uint64(b)
        out[i] = np.int64(fp.astype(np.int64))
    return pd.Series(out)


def minhash_signature(n_hashes: int = 16, shingle_len: int = 3):
    """Returns a pandas UDF: text → array<long> of `n_hashes` MinHash
    values over token `shingle_len`-gram shingles. Documents sharing a
    banded slice of the signature are LSH near-dup candidates."""

    @F.pandas_udf(ArrayType(LongType()))
    def minhash(text: pd.Series) -> pd.Series:
        out = []
        for t in text.fillna(""):
            toks = t.split()
            if len(toks) < shingle_len:
                out.append([0] * n_hashes)
                continue
            shingles = {" ".join(toks[i:i + shingle_len])
                        for i in range(len(toks) - shingle_len + 1)}
            sig = []
            for s in range(n_hashes):
                seed = f"s{s}|".encode()
                sig.append(min(
                    int.from_bytes(hashlib.blake2b(seed + sh.encode("utf-8"),
                                                   digest_size=8).digest(), "big")
                    for sh in shingles) - 2**63)
            out.append(sig)
        return pd.Series(out)

    return minhash


def rolling_fingerprint(window: int = 8, modulus: int = 2**31 - 1,
                        base: int = 257, keep_mask: int = 0x3F):
    """Returns a pandas UDF: text → array<long> winnowing fingerprint
    (Rabin-Karp hash over every `window`-byte span; keep hashes with
    low `keep_mask` bits zero — the MOSS/winnowing document-
    fingerprint scheme). Shared fingerprints locate copied passages.
    Fully vectorized: sliding_window_view × modular power vector
    (products < 2^39, exact in int64)."""
    powers = np.array([pow(base, window - 1 - j, modulus) for j in range(window)],
                      dtype=np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def fingerprint(text: pd.Series) -> pd.Series:
        out = []
        for t in text.fillna(""):
            b = t.encode("utf-8", errors="replace")
            if len(b) < window:
                out.append([])
                continue
            arr = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
            sw = np.lib.stride_tricks.sliding_window_view(arr, window)
            h = (sw * powers[None, :]).sum(axis=1) % modulus
            keep = h[(h & keep_mask) == 0]
            out.append(np.unique(keep).tolist())
        return pd.Series(out)

    return fingerprint
