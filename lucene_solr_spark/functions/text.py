"""Vectorized text-analysis functions (training-data pipeline ops).

Engine-grade (64-bit, full-width) variants of the SQL-checkable 16-bit
suite entries in relational/pipeline.py. The hash-heavy fingerprints
(SimHash, MinHash) are pure JVM column expressions over ``xxhash64`` —
whole-stage-codegen, no Python in the hot path (a per-row Python hash
loop caps fingerprint throughput at per-core Python speed; VERDICT
round-1 perf #5). Only the winnowing fingerprint stays a pandas UDF —
its sliding-window modular hash is one vectorized numpy pass.

Scale shape: every function is a scalar projection over ``text`` —
embarrassingly parallel, no shuffle; downstream dedup joins group on
the emitted fingerprints.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.types import ArrayType, LongType


def _col_sql(col: str | Column) -> str:
    """SQL fragment for a column name / Column (simple refs only)."""
    if isinstance(col, str):
        return f"`{col}`" if col.isidentifier() else col
    return col._jc.toString()  # noqa: SLF001 — Column has no public SQL accessor


def simhash64(col: str | Column) -> Column:
    """64-bit SimHash as a JVM expression: per-token ``xxhash64``; each
    bit contributes +1/-1 per occurrence; fingerprint = sign vector.
    Near-dups differ in few bits (compare with
    ``bit_count(simhash64(a) ^ simhash64(b))``). Bits assemble with
    bitwise OR (no additive overflow under ANSI mode)."""
    c = _col_sql(col)
    return F.expr(f"""
      aggregate(
        transform(filter(split(coalesce({c}, ''), ' '), x -> x <> ''),
                  t -> xxhash64(t)),
        array_repeat(0L, 64),
        (acc, h) -> zip_with(
          acc,
          transform(sequence(0, 63),
                    b -> CASE WHEN (shiftright(h, b) & 1) = 1
                         THEN 1L ELSE -1L END),
          (a, x) -> a + x),
        acc -> aggregate(
          sequence(0, 63), 0L,
          (fp, b) -> CASE WHEN element_at(acc, b + 1) >= 0
                     THEN fp | shiftleft(1L, b) ELSE fp END)
      )""")


def minhash_signature(n_hashes: int = 16, shingle_len: int = 3):
    """Returns ``col → Column(array<long>)``: `n_hashes` MinHash values
    over token `shingle_len`-gram shingles, all JVM (``xxhash64`` over
    the shingle strings, seeded by prefix). Documents sharing a banded
    slice of the signature are LSH near-dup candidates."""

    def minhash(col: str | Column) -> Column:
        c = _col_sql(col)
        toks = f"filter(split(coalesce({c}, ''), ' '), x -> x <> '')"
        shingles = (
            f"transform(sequence(1, size({toks}) - {shingle_len - 1}), "
            f"i -> array_join(slice({toks}, i, {shingle_len}), ' '))"
        )
        return F.expr(f"""
          CASE WHEN size({toks}) < {shingle_len}
               THEN array_repeat(0L, {n_hashes})
               ELSE transform(
                 sequence(0, {n_hashes - 1}),
                 s -> array_min(transform(
                   {shingles},
                   sh -> xxhash64(concat('s', cast(s AS string), '|', sh)))))
          END""")

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
