"""SloppyPhraseMatcher semantics (search/sloppy.py) — hand-derived
traces of the greedy pq traversal of
lucene/core/src/java/org/apache/lucene/search/SloppyPhraseMatcher.java:119-152
with the PhraseScorer freq accumulation (PhraseScorer.java:68-77)."""

import numpy as np
import pytest

from lucene_solr_spark.search.sloppy import sloppy_freq

f32 = np.float32


def w(*lens):
    """float32-accumulated Σ 1/(1+len) in order."""
    acc = f32(0.0)
    for ln in lens:
        acc = f32(acc + f32(1.0) / f32(1 + ln))
    return float(acc)


def test_javadoc_example_a_b_slop2():
    # doc "x a b a y", query "a b"~2: matched twice, distances 0 and 2
    # (SloppyPhraseMatcher.java class javadoc example)
    assert sloppy_freq([[1, 3], [2]], (0, 1), 2) == w(0, 2)


def test_reversed_pair():
    # doc "... f g", query "g f"~2: one reversed match, distance 2
    assert sloppy_freq([[6], [5]], (0, 1), 2) == w(2)


def test_exact_adjacency():
    assert sloppy_freq([[0], [1]], (0, 1), 0) == w(0)
    assert sloppy_freq([[0], [1]], (0, 1), 3) == w(0)


def test_no_match_within_slop():
    assert sloppy_freq([[0], [4]], (0, 1), 1) == 0.0
    assert sloppy_freq([[0], [10]], (0, 1), 5) == 0.0


def test_greedy_min_propagation():
    # doc "a b c b a": c@[2], b@[1,3] — greedy traversal finds the
    # exact "c b" (min window shrinks to 0 while advancing b)
    assert sloppy_freq([[2], [1, 3]], (0, 1), 2) == w(0)


def test_three_terms_exact():
    # "a b c" contiguous at 4,5,6
    assert sloppy_freq([[4], [5], [6]], (0, 1, 2), 0) == w(0)
    # displaced middle term: "a x b c" → a@0 b@2 c@3, window = 1
    assert sloppy_freq([[0], [2], [3]], (0, 1, 2), 0) == 0.0
    assert sloppy_freq([[0], [2], [3]], (0, 1, 2), 1) == w(1)


def test_stopword_gap_offsets():
    # phrase ("big", "table") with positions (0, 2) — a stopword gap:
    # doc has big@5, table@7 → distance 0
    assert sloppy_freq([[5], [7]], (0, 2), 0) == w(0)


def test_repeated_positions_multiple_matches():
    # doc "a b a b": a@[0,2], b@[1,3], "a b"~0 → two exact matches
    assert sloppy_freq([[0, 2], [1, 3]], (0, 1), 0) == w(0, 0)


@pytest.mark.parametrize("slop", [1, 2, 3])
def test_wider_slop_never_decreases_freq(slop):
    pos = [[0, 7, 20], [3, 9, 21]]
    lo = sloppy_freq(pos, (0, 1), slop - 1)
    hi = sloppy_freq(pos, (0, 1), slop)
    assert hi >= lo
