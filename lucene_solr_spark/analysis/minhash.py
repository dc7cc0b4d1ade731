"""MinHash token filter (index-time LSH fingerprints).

Reference: ``lucene/analysis/common/src/java/org/apache/lucene/
analysis/minhash/MinHashFilter.java`` — consumes the whole (usually
shingled) token stream and emits the per-bucket minimum hashes:

* each token hashes with MurmurHash3 x64 128 over its UTF-16LE bytes
  (:160-168; the public-domain Appleby algorithm, ported below);
* ``hashCount`` variants derive by ``combineOrdered`` with the hash of
  the variant index (:345-353, Guava's ordered combine — ×37 + h per
  128-bit half);
* each variant value lands in bucket ``(val2 >>> 32) / bucketSize``
  with ``bucketSize = ceil(2^32 / bucketCount)`` (:131-134, :168);
* a fixed-size tree set per (variant, bucket) keeps the
  ``hashSetSize`` smallest values under UNSIGNED (val2, val1) order
  (:309-341);
* ``withRotation`` (the factory's default when bucketCount > 1) fills
  empty buckets with the next non-empty bucket's minimum, wrapping
  around (:181-196) — so every doc emits exactly
  hashCount×bucketCount tokens and banded Jaccard estimation stays
  unbiased;
* emitted token text is the raw hash packed into UTF-16 code units
  (:199-237): [int0 int1 of the variant index when hashCount > 1] +
  the 4 chars of val2 + the first 2 (or, when hashCount == 1, all 4)
  chars of val1; all tokens stack at one position (posInc 1 then 0).

The char packing is the reference's index key format and is kept
golden-exact (MinHashFilterTest.java:182-205 vectors) — but those
strings may contain lone surrogates, which Arrow/Parquet UTF-8
transport rejects; pass ``encode="hex"`` for the Spark build path
(same hashes, hex-rendered — a stated departure of transport, not of
math). The relational dedup pipeline's MinHash (functions/text.py)
remains the JVM-side xxhash64 variant; THIS filter is the
Lucene-compatible index-time surface.
"""

from __future__ import annotations

MIN_HASH_TYPE = "MIN_HASH"

_M64 = (1 << 64) - 1


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _M64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _M64
    k ^= k >> 33
    return k


def murmur3_x64_128(key: bytes, seed: int = 0) -> tuple[int, int]:
    """MurmurHash3 x64 128 (public domain; MinHashFilter.java:414-500
    port). Returns unsigned (val1, val2) = (h1, h2)."""
    c1 = 0x87C37B91114253D5
    c2 = 0x4CF5AD432745937F
    length = len(key)
    h1 = seed & 0xFFFFFFFF
    h2 = seed & 0xFFFFFFFF
    rounded = length & ~0xF
    for i in range(0, rounded, 16):
        k1 = int.from_bytes(key[i:i + 8], "little")
        k2 = int.from_bytes(key[i + 8:i + 16], "little")
        k1 = (k1 * c1) & _M64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * c2) & _M64
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & _M64
        h1 = (h1 * 5 + 0x52DCE729) & _M64
        k2 = (k2 * c2) & _M64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * c1) & _M64
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & _M64
        h2 = (h2 * 5 + 0x38495AB5) & _M64
    tail = key[rounded:]
    if tail:
        k1 = int.from_bytes(tail[:8], "little")
        k2 = int.from_bytes(tail[8:], "little")
        if len(tail) > 8:
            k2 = (k2 * c2) & _M64
            k2 = _rotl64(k2, 33)
            k2 = (k2 * c1) & _M64
            h2 ^= k2
        k1 = (k1 * c1) & _M64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * c2) & _M64
        h1 ^= k1
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    return h1, h2


def _int_hash(i: int) -> tuple[int, int]:
    """getIntHash (:247-255): murmur of the big-endian int bytes."""
    return murmur3_x64_128(i.to_bytes(4, "big"))


def _combine_ordered(a: tuple[int, int], b: tuple[int, int]) -> tuple[int, int]:
    """combineOrdered over [a, b] starting from (0, 0) (:345-353)."""
    v1 = ((a[0] * 37 + b[0]) & _M64)
    v2 = ((a[1] * 37 + b[1]) & _M64)
    return v1, v2


def _pack_chars(hash_position: int, val1: int, val2: int,
                hash_count: int) -> str:
    """Token text packing (:199-237)."""
    chars = []
    if hash_count > 1:
        chars += [(hash_position >> 16) & 0xFFFF, hash_position & 0xFFFF]
    chars += [(val2 >> s) & 0xFFFF for s in (48, 32, 16, 0)]
    chars += [(val1 >> 48) & 0xFFFF, (val1 >> 32) & 0xFFFF]
    if hash_count == 1:
        chars += [(val1 >> 16) & 0xFFFF, val1 & 0xFFFF]
    return "".join(map(chr, chars))


def _pack_hex(hash_position: int, val1: int, val2: int,
              hash_count: int) -> str:
    out = f"{val2:016x}{val1:016x}"
    if hash_count > 1:
        out = f"{hash_position:08x}:{out}"
    return out


def min_hash_filter(hash_count: int = 1, bucket_count: int = 512,
                    hash_set_size: int = 1,
                    with_rotation: bool | None = None,
                    encode: str = "chars"):
    """Build the (terms, positions) -> (terms, positions) chain filter
    for :class:`~lucene_solr_spark.analysis.filters.CustomAnalyzer`.
    ``with_rotation`` defaults to ``bucket_count > 1``, the factory
    default (MinHashFilterFactory.java:47-50). Output tokens all stack
    at one position, as the reference emits posInc 1 then 0s."""
    if hash_count <= 0 or bucket_count <= 0 or hash_set_size <= 0:
        raise ValueError(
            "hashCount, bucketCount and hashSetSize must be greater "
            "than zero")
    if encode not in ("chars", "hex"):
        raise ValueError("encode must be 'chars' or 'hex'")
    rotate = bucket_count > 1 if with_rotation is None else with_rotation
    bucket_size = (1 << 32) // bucket_count
    if (1 << 32) % bucket_count != 0:
        bucket_size += 1
    int_hashes = [_int_hash(i) for i in range(hash_count)]
    pack = _pack_chars if encode == "chars" else _pack_hex

    def f(terms: list[str], positions: list[int]):
        if not terms:
            return [], []
        # minhash state: per (variant, bucket) sorted unique values,
        # capped at hash_set_size under unsigned (val2, val1) order
        sets: list[list[set]] = [
            [set() for _ in range(bucket_count)] for _ in range(hash_count)]
        for tok in terms:
            base = murmur3_x64_128(tok.encode("utf-16-le"))
            for i in range(hash_count):
                v1, v2 = _combine_ordered(base, int_hashes[i])
                b = (v2 >> 32) // bucket_size
                s = sets[i][b]
                s.add((v2, v1))  # sort key: unsigned val2 then val1
                if len(s) > hash_set_size:
                    s.discard(max(s))
        if rotate and hash_set_size == 1:
            for i in range(hash_count):
                filled = [min(s) if s else None for s in sets[i]]
                for b in range(bucket_count):
                    if not sets[i][b]:
                        for off in range(1, bucket_count):
                            nb = (b + off) % bucket_count
                            if filled[nb] is not None:
                                sets[i][b].add(filled[nb])
                                break
        out = []
        for i in range(hash_count):
            for b in range(bucket_count):
                for v2, v1 in sorted(sets[i][b]):
                    out.append(pack(i, v1, v2, hash_count))
        return out, [0] * len(out)

    f.__name__ = "min_hash_filter"
    return f
