"""InetAddressPoint / InetAddressRange equivalents (IP point + range queries).

Reference: ``lucene/misc/src/java/org/apache/lucene/document/
InetAddressPoint.java`` — every address is stored as its 16-byte IPv6
form, IPv4 mapped per RFC 4291 §2.5.5 (``encode`` at :166-178: 10 zero
bytes + ff ff + the 4 IPv4 bytes); query surface (:201-266):

* ``newExactQuery``  = range(value, value)           (:201-203)
* ``newPrefixQuery`` = CIDR: host bits of the lower bound cleared, of
  the upper bound set (:214-232)
* ``newRangeQuery``  = inclusive [lower, upper]      (:240-246)
* ``newSetQuery``    = PointInSet over encoded values (:252-266)

and ``InetAddressRange.java`` — a stored [min, max] address range
queried under the RangeFieldQuery relation matrix (INTERSECTS / WITHIN
/ CONTAINS / CROSSES), which this module delegates to
``relational.ranges.range_relation_predicate``.

Spark-first design: a normalized address is its 128-bit value rendered
as a 32-char lowercase hex string. Lexicographic order over that
column IS numeric order over the address space (fixed width, one
case), so every query above is a sargable string predicate — pushed to
the Parquet scan, pruned by row-group min/max stats (the BKD-tree
role, exactly as SURVEY §1.1 maps points). Dotted-quad IPv4 columns
normalize entirely JVM-side inside whole-stage codegen
(split + lpad(hex)); full IPv6 textual grammar (``::`` compression,
v4-mapped suffix) is handled driver-side for query literals via the
stdlib parser — literals are per-query scalars, never row data.
"""

from __future__ import annotations

import ipaddress

from pyspark.sql import Column, functions as F

__all__ = [
    "encode_ip",
    "cidr_bounds",
    "ip_normalize_col",
    "ip_exact",
    "ip_prefix",
    "ip_range",
    "ip_set",
    "ip_range_relation",
    "IP_MIN",
    "IP_MAX",
]

_V4_MAPPED_PREFIX = 0xFFFF << 32

#: InetAddressPoint.MIN_VALUE / MAX_VALUE (:71-79)
IP_MIN = "0" * 32
IP_MAX = "f" * 32


def _hex32(value: int) -> str:
    return format(value, "032x")


def encode_ip(text: str) -> str:
    """InetAddressPoint.encode (:166-178): normalize one textual
    address to the 32-hex-char form. ``1.2.3.4`` and ``::ffff:1.2.3.4``
    encode identically (the class javadoc's defining example)."""
    addr = ipaddress.ip_address(text)
    value = int(addr)
    if addr.version == 4:
        value |= _V4_MAPPED_PREFIX
    return _hex32(value)


def cidr_bounds(text: str, prefix_length: int) -> tuple[str, str]:
    """newPrefixQuery's bound computation (:214-232): clear the host
    bits for the lower bound, set them for the upper. ``prefix_length``
    counts bits of the address's OWN width (0-32 for IPv4, 0-128 for
    IPv6), exactly like the reference's ``8 * value.getAddress().length``
    validation (:218-220)."""
    addr = ipaddress.ip_address(text)
    nbits = addr.max_prefixlen
    if not 0 <= prefix_length <= nbits:
        raise ValueError(
            f"illegal prefixLength '{prefix_length}'. Must be 0-32 for "
            f"IPv4 ranges, 0-128 for IPv6 ranges")
    host = nbits - prefix_length
    lo = (int(addr) >> host) << host
    hi = lo | ((1 << host) - 1)
    if addr.version == 4:
        lo |= _V4_MAPPED_PREFIX
        hi |= _V4_MAPPED_PREFIX
    return _hex32(lo), _hex32(hi)


def ip_normalize_col(col: Column) -> Column:
    """Normalize a dotted-quad IPv4 string column to the 32-hex form —
    pure Catalyst (split → int fold → lpad(hex)), no Python in the
    plan. The 12-byte v4-mapped prefix is a constant
    (InetAddressPoint.IPV4_PREFIX, :61)."""
    parts = F.split(col, r"\.")
    num = (
        parts.getItem(0).cast("long") * F.lit(16777216)
        + parts.getItem(1).cast("long") * F.lit(65536)
        + parts.getItem(2).cast("long") * F.lit(256)
        + parts.getItem(3).cast("long")
    )
    return F.concat(
        F.lit("00000000000000000000ffff"),
        F.lower(F.lpad(F.hex(num), 8, "0")),
    )


def ip_exact(col: Column, text: str) -> Column:
    """newExactQuery (:201-203) over a normalized column."""
    return col == F.lit(encode_ip(text))


def ip_prefix(col: Column, text: str, prefix_length: int) -> Column:
    """newPrefixQuery (:214-232): CIDR membership as one inclusive
    string range — sargable, row-group-prunable."""
    lo, hi = cidr_bounds(text, prefix_length)
    return col.between(F.lit(lo), F.lit(hi))


def ip_range(col: Column, lower: str, upper: str) -> Column:
    """newRangeQuery (:240-246): inclusive [lower, upper]."""
    return col.between(F.lit(encode_ip(lower)), F.lit(encode_ip(upper)))


def ip_set(col: Column, texts: list[str]) -> Column:
    """newSetQuery (:252-266): membership in an encoded value set."""
    return col.isin([encode_ip(t) for t in texts])


def ip_range_relation(
    min_col: str, max_col: str, lower: str, upper: str, relation: str,
) -> Column:
    """InetAddressRange.newIntersects/Within/Contains/CrossesQuery:
    the stored [min_col, max_col] address range vs the query range
    [lower, upper] under the RangeFieldQuery matrix. Hex strings
    compare exactly like the reference's fixed-width byte arrays."""
    from ..relational.ranges import range_relation_predicate

    return range_relation_predicate(
        [(min_col, max_col)], [(encode_ip(lower), encode_ip(upper))],
        relation)
