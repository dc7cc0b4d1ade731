"""MinHashFilter (analysis/minhash/MinHashFilter.java) — golden
vectors from MinHashFilterTest.java.

Note on the single-input literal golden (:182): the test's Java string
literal contains U+FA85, a CJK COMPATIBILITY ideograph that NFC
normalization rewrites to U+5FAD — any normalizing transport corrupts
it, which is exactly the "String is degenerate as characters!" caveat
in the reference test (:200). The assertions below therefore use the
explicit char-array goldens (:189-190, :199), which pin the same
values unambiguously.
"""

import pytest

from lucene_solr_spark.analysis.filters import CustomAnalyzer
from lucene_solr_spark.analysis.minhash import (
    min_hash_filter,
    murmur3_x64_128,
)

W5 = "woof woof woof woof woof"
P5 = "woof woof woof woof puff"


def _chars(*vals):
    return "".join(map(chr, vals))


def test_murmur_empty_is_zero():
    assert murmur3_x64_128(b"") == (0, 0)


def test_single_input_golden():
    # createTokenStream(5, W5, 1, 1, 100, false) → one 8-char token
    # (:182-186 literal; authoritative char values via the
    # hashCount=2 vector below, which shares the i=0 variant)
    f = min_hash_filter(1, 1, 100, False)
    toks, pos = f([W5], [0])
    assert toks == [_chars(0x2101, 0xD33D, 0xFA85, 0x8059,
                           0x219D, 0xA1C1, 0xD671, 0x676F)]
    assert pos == [0]


def test_two_variant_golden():
    # (:188-192): hashCount=2 prefixes int0/int1 of the variant and
    # truncates val1 to its top two chars
    f = min_hash_filter(2, 1, 1, False)
    toks, pos = f([W5], [0])
    assert toks == [
        _chars(0, 0, 8449, 54077, 64133, 32857, 8605, 41409),
        _chars(0, 1, 16887, 58164, 39536, 14926, 6529, 17276),
    ]
    assert pos == [0, 0]  # posInc 1 then 0: all stacked


def test_two_token_golden_sorted():
    # (:196-205): both shingles' hashes emit in unsigned ascending
    # order within the bucket
    f = min_hash_filter(1, 1, 100, False)
    toks, _ = f([W5, P5], [0, 1])
    assert toks[1] == _chars(36347, 63457, 43013, 56843,
                             52284, 34231, 57934, 42302)
    assert len(toks) == 2


@pytest.mark.parametrize("hc,bc,hss,rot,expect", [
    (100, 1, 1, False, 100),   # testTokenStream2
    (10, 1, 10, False, 20),    # testTokenStream3
    (10, 10, 1, False, 20),    # testTokenStream4
    (10, 10, 1, True, 100),    # testTokenStream4 rotation fill
    (1, 100, 1, False, 2),     # testTokenStream5
    (1, 100, 1, True, 100),    # testTokenStream5 rotation fill
])
def test_token_counts(hc, bc, hss, rot, expect):
    f = min_hash_filter(hc, bc, hss, rot)
    toks, _ = f([W5, P5], [0, 1])
    assert len(toks) == expect


def test_rotation_distinct_values():
    # testTokenStream5 tail: 100 rotated tokens carry only 2 distinct
    # hash values
    f = min_hash_filter(1, 100, 1, True)
    toks, _ = f([W5, P5], [0, 1])
    assert len(set(toks)) == 2


def test_factory_rotation_default():
    # MinHashFilterFactory: withRotation defaults to bucketCount > 1
    toks_multi, _ = min_hash_filter(1, 100, 1)([W5], [0])
    assert len(toks_multi) == 100      # rotated fill
    toks_single, _ = min_hash_filter(1, 1, 100)([W5], [0])
    assert len(toks_single) == 1


def test_hex_encoding_surrogate_safe():
    f = min_hash_filter(2, 4, 1, True, encode="hex")
    toks, _ = f([W5, P5], [0, 1])
    assert len(toks) == 8
    for t in toks:
        t.encode("utf-8")  # hex transport is Arrow/Parquet-safe
        vi, h = t.split(":")
        assert len(vi) == 8 and len(h) == 32


def test_custom_analyzer_chain():
    from lucene_solr_spark.analysis.filters import shingle_filter

    a = CustomAnalyzer(filters=[
        shingle_filter(min_size=3, max_size=3, output_unigrams=False),
        min_hash_filter(1, 8, 1, True, encode="hex"),
    ])
    terms, positions = a.analyze("the quick brown fox jumps over dogs")
    assert len(terms) == 8          # one per bucket, rotation-filled
    assert set(positions) == {0}


def test_validation():
    with pytest.raises(ValueError):
        min_hash_filter(0, 1, 1)
    with pytest.raises(ValueError):
        min_hash_filter(1, 1, 1, encode="base64")


# ---- property tests -------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_tokens = st.lists(st.text(alphabet="abcdefg", min_size=1, max_size=6),
                   min_size=1, max_size=20)


@given(_tokens)
@settings(max_examples=100, deadline=None)
def test_set_semantics(toks):
    # min-hash is a function of the token SET: order and duplicates
    # cannot change the signature
    f = min_hash_filter(2, 8, 1, True)
    a, _ = f(list(toks), list(range(len(toks))))
    b, _ = f(sorted(set(toks)), list(range(len(set(toks)))))
    c, _ = f(list(reversed(toks)), list(range(len(toks))))
    assert a == b == c


@given(_tokens)
@settings(max_examples=100, deadline=None)
def test_rotation_emits_full_grid(toks):
    # rotation + hashSetSize=1 always yields hashCount × bucketCount
    # tokens (the unbiased banded-estimation invariant)
    f = min_hash_filter(3, 4, 1, True)
    out, pos = f(list(toks), list(range(len(toks))))
    assert len(out) == 12
    assert pos == [0] * 12
