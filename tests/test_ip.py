"""InetAddressPoint / InetAddressRange equivalents.

Golden vectors from lucene/misc/.../document/InetAddressPoint.java:
v4-mapped encoding (:166-178), CIDR bound fill (:214-232), the
MIN/MAX constants (:71-79), and the class javadoc's defining example
(indexing ``1.2.3.4`` == indexing ``::ffff:1.2.3.4``).
"""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.functions.ip import (
    IP_MAX,
    IP_MIN,
    cidr_bounds,
    encode_ip,
    ip_exact,
    ip_normalize_col,
    ip_prefix,
    ip_range,
    ip_range_relation,
    ip_set,
)

def test_encode_v4_mapped():
    # javadoc: indexing 1.2.3.4 is the same as indexing ::ffff:1.2.3.4
    assert encode_ip("1.2.3.4") == "00000000000000000000ffff01020304"
    assert encode_ip("::ffff:1.2.3.4") == encode_ip("1.2.3.4")


def test_encode_bounds_and_v6():
    assert encode_ip("::") == IP_MIN
    assert encode_ip("ffff:ffff:ffff:ffff:ffff:ffff:ffff:ffff") == IP_MAX
    assert encode_ip("2001:db8::1") == "20010db8000000000000000000000001"


def test_cidr_bounds_v4():
    lo, hi = cidr_bounds("192.168.1.77", 24)
    assert lo == encode_ip("192.168.1.0")
    assert hi == encode_ip("192.168.1.255")
    # /32 degenerates to the exact address (newExactQuery = range(v, v))
    lo, hi = cidr_bounds("10.1.2.3", 32)
    assert lo == hi == encode_ip("10.1.2.3")
    # /0 spans the whole v4-mapped block
    lo, hi = cidr_bounds("7.7.7.7", 0)
    assert lo == encode_ip("0.0.0.0")
    assert hi == encode_ip("255.255.255.255")


def test_cidr_bounds_v6():
    lo, hi = cidr_bounds("2001:db8:abcd::42", 48)
    assert lo == "20010db8abcd00000000000000000000"
    assert hi == "20010db8abcdffffffffffffffffffff"


def test_cidr_prefix_validation():
    # :218-220 — 0-32 for IPv4, 0-128 for IPv6
    with pytest.raises(ValueError):
        cidr_bounds("1.2.3.4", 33)
    with pytest.raises(ValueError):
        cidr_bounds("::1", 129)
    with pytest.raises(ValueError):
        cidr_bounds("1.2.3.4", -1)


IPS = ["0.0.0.0", "1.2.3.4", "9.255.255.255", "10.0.0.0", "10.128.7.1",
       "10.255.255.255", "11.0.0.0", "192.168.1.0", "192.168.1.77",
       "192.168.2.1", "255.255.255.255"]


@pytest.fixture()
def ip_df(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(IPS)],
                               "id int, ip_text string")
    return df.select("id", "ip_text",
                     ip_normalize_col(F.col("ip_text")).alias("ip"))


def test_normalize_col_matches_python(ip_df):
    rows = ip_df.select("ip_text", "ip").collect()
    for r in rows:
        assert r.ip == encode_ip(r.ip_text), r.ip_text


def test_point_queries(ip_df):
    got = {r.ip_text for r in
           ip_df.where(ip_prefix(F.col("ip"), "10.0.0.0", 8)).collect()}
    assert got == {"10.0.0.0", "10.128.7.1", "10.255.255.255"}

    got = {r.ip_text for r in
           ip_df.where(ip_prefix(F.col("ip"), "192.168.1.9", 24)).collect()}
    assert got == {"192.168.1.0", "192.168.1.77"}

    got = {r.ip_text for r in
           ip_df.where(ip_exact(F.col("ip"), "1.2.3.4")).collect()}
    assert got == {"1.2.3.4"}

    got = {r.ip_text for r in
           ip_df.where(ip_range(F.col("ip"), "9.0.0.0", "10.0.0.0"))
           .collect()}
    assert got == {"9.255.255.255", "10.0.0.0"}

    got = {r.ip_text for r in
           ip_df.where(ip_set(F.col("ip"), ["0.0.0.0", "11.0.0.0", "4.4.4.4"]))
           .collect()}
    assert got == {"0.0.0.0", "11.0.0.0"}


def test_range_relations(spark):
    # stored ranges as (label, min_ip, max_ip)
    ranges = [
        ("inside", "10.1.0.0", "10.2.0.0"),
        ("covering", "9.0.0.0", "11.0.0.0"),
        ("left_overlap", "9.0.0.0", "10.0.0.1"),
        ("disjoint", "12.0.0.0", "13.0.0.0"),
    ]
    df = spark.createDataFrame(
        [(lbl, encode_ip(a), encode_ip(b)) for lbl, a, b in ranges],
        "label string, ip_min string, ip_max string")
    q = ("10.0.0.0", "10.255.255.255")

    def names(rel):
        return {r.label for r in
                df.where(ip_range_relation("ip_min", "ip_max", *q, rel))
                .collect()}

    assert names("intersects") == {"inside", "covering", "left_overlap"}
    assert names("within") == {"inside"}
    assert names("contains") == {"covering"}
    assert names("crosses") == {"covering", "left_overlap"}


def test_plan_stays_jvm(ip_df):
    plan = ip_df.where(ip_prefix(F.col("ip"), "10.0.0.0", 8))\
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "EvalPython" not in plan


# ---- property tests (no Spark) --------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@given(st.integers(0, 2**32 - 1), st.integers(0, 32))
@settings(max_examples=200, deadline=None)
def test_cidr_membership_matches_ipaddress(addr, prefix_len):
    """lo <= encode(x) <= hi  ⇔  x ∈ network(addr/prefix) — checked
    against the stdlib's independent network-membership logic."""
    import ipaddress

    ip = str(ipaddress.ip_address(addr))
    lo, hi = cidr_bounds(ip, prefix_len)
    net = ipaddress.ip_network(f"{ip}/{prefix_len}", strict=False)
    # probe: the address itself, the network edges, and a nearby value
    probes = {addr, int(net.network_address), int(net.broadcast_address),
              min(2**32 - 1, addr + 1), max(0, addr - 1)}
    for p in probes:
        ptext = str(ipaddress.ip_address(p))
        enc = encode_ip(ptext)
        in_range = lo <= enc <= hi
        assert in_range == (ipaddress.ip_address(p) in net), (ip, prefix_len, ptext)


@given(st.integers(0, 2**128 - 1))
@settings(max_examples=200, deadline=None)
def test_hex_order_is_address_order_v6(v):
    """Lexicographic order over the hex encoding IS numeric order —
    the property every range predicate relies on."""
    import ipaddress

    w = (v + 12345678901234567890) % (2**128)
    a = encode_ip(str(ipaddress.ip_address(v)))
    b = encode_ip(str(ipaddress.ip_address(w)))
    assert (a < b) == (v < w) or v == w
