"""TermAutomatonQuery (sandbox TermAutomatonQuery/TermAutomatonScorer):
builder + finish() validation, rewrite() parity, countMatches unit
semantics on hand events (including the reference's ANY double-path
quirk), token-stream construction, and engine-vs-oracle identity
through the shared DFA runner."""

import numpy as np
import pytest

from lucene_solr_spark.analysis import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_solr_spark.corpus import corpus_df, corpus_pandas
from lucene_solr_spark.index import build_index
from lucene_solr_spark.oracle import OracleIndex
from lucene_solr_spark.search.executor import IndexSearcher
from lucene_solr_spark.search.queries import (
    MatchNoDocsQuery,
    MultiPhraseQuery,
    PhraseQuery,
    TermQuery,
)
from lucene_solr_spark.search.term_automaton import (
    TermAutomatonQuery,
    count_matches,
    token_stream_to_query,
)

N_DOCS = 100


def phrase_automaton(*terms, field="content"):
    q = TermAutomatonQuery(field)
    states = [q.create_state() for _ in range(len(terms) + 1)]
    for i, t in enumerate(terms):
        q.add_transition(states[i], states[i + 1], t)
    q.set_accept(states[-1], True)
    return q.finish()


def any_gap_automaton(field="content"):
    """a * b — exactly one arbitrary token between a and b."""
    q = TermAutomatonQuery(field)
    s = [q.create_state() for _ in range(4)]
    q.add_transition(s[0], s[1], "a")
    q.add_any_transition(s[1], s[2])
    q.add_transition(s[2], s[3], "b")
    q.set_accept(s[3], True)
    return q.finish()


def run(q, token_events):
    det = q._check_finished()
    term_id = {t: tid for tid, t in q.terms().items()}
    events = sorted((pos, term_id[t]) for pos, t in token_events
                    if t in term_id)
    return count_matches(events, det, q.any_id)


# ---- countMatches unit semantics ------------------------------------------

def test_exact_phrase_counting():
    q = phrase_automaton("a", "b")
    # a b a b a → alignments at 0 and 2
    toks = list(enumerate(["a", "b", "a", "b", "a"]))
    assert run(q, toks) == 2
    assert run(q, [(0, "a")]) == 0
    assert run(q, [(0, "b"), (1, "a")]) == 0


def test_overlapping_restarts():
    # "a a" over "a a a": matches at (0,1) and (1,2) — each token also
    # starts a fresh match from state 0 (TermAutomatonScorer.java:319-328)
    q = phrase_automaton("a", "a")
    assert run(q, [(0, "a"), (1, "a"), (2, "a")]) == 2


def test_any_gap_basics():
    q = any_gap_automaton()
    # exactly-one-token gap: 'a x b' matches even though x is not a
    # query term (the gap advance, TermAutomatonScorer.java:264-291)
    assert run(q, [(0, "a"), (2, "b")]) == 1
    # adjacent 'a b' does NOT match (needs one token between)
    assert run(q, [(0, "a"), (1, "b")]) == 0
    # two-token gap does not match either
    assert run(q, [(0, "a"), (3, "b")]) == 0


def test_any_quirk_query_term_fills_gap():
    # Reference quirk (verified against TermAutomatonScorer.java:264-328):
    # in 'a a b' the middle 'a' fills the ANY slot twice — once via the
    # expanded a-arc when the token is matched, once via the gap
    # advance's explicit ANY step — and PosState is a multiset, so
    # freq == 2.
    q = any_gap_automaton()
    assert run(q, [(0, "a"), (1, "a"), (2, "b")]) == 2


def test_multiset_parallel_paths():
    # Two NFA paths accepting the same string from different arcs stay
    # separate paths after subset construction only if they reach
    # different DFA states; a genuinely ambiguous sausage (same slot
    # twice) determinizes to one path → freq 1.
    q = TermAutomatonQuery()
    s0, s1, s2 = (q.create_state() for _ in range(3))
    q.add_transition(s0, s1, "x")
    q.add_transition(s0, s1, "x")  # duplicate arc
    q.add_transition(s1, s2, "y")
    q.set_accept(s2, True)
    q.finish()
    assert run(q, [(0, "x"), (1, "y")]) == 1


# ---- finish() validation ---------------------------------------------------

def test_finish_rejects_leading_trailing_any():
    q = TermAutomatonQuery()
    s0, s1 = q.create_state(), q.create_state()
    q.add_any_transition(s0, s1)
    q.set_accept(s1, True)
    with pytest.raises(ValueError, match="lead"):
        q.finish()

    q2 = TermAutomatonQuery()
    t0, t1, t2 = (q2.create_state() for _ in range(3))
    q2.add_transition(t0, t1, "a")
    q2.add_any_transition(t1, t2)
    q2.set_accept(t2, True)
    with pytest.raises(ValueError, match="end"):
        q2.finish()


def test_finish_rejects_empty_string():
    q = TermAutomatonQuery()
    s0 = q.create_state()
    q.set_accept(s0, True)
    q.add_transition(s0, q.create_state(), "a")
    with pytest.raises(ValueError, match="empty string"):
        q.finish()


def test_unfinished_raises():
    q = TermAutomatonQuery()
    q.create_state()
    with pytest.raises(ValueError, match="finish"):
        q._check_finished()


# ---- rewrite parity --------------------------------------------------------

def test_rewrite_empty_language_to_matchnodocs():
    # accept state unreachable → dead-state removal empties the automaton
    q = TermAutomatonQuery()
    s0, s1, s2 = (q.create_state() for _ in range(3))
    q.add_transition(s0, s1, "a")
    q.set_accept(s2, True)  # no arc into s2
    q.finish()
    assert isinstance(q.rewrite(), MatchNoDocsQuery)


def test_rewrite_single_term():
    q = TermAutomatonQuery(boost=2.0)
    s0, s1 = q.create_state(), q.create_state()
    q.add_transition(s0, s1, "hello")
    q.set_accept(s1, True)
    q.finish()
    r = q.rewrite()
    assert r == TermQuery(term="hello", boost=2.0, field="content")


def test_rewrite_phrase_and_multiphrase():
    r = phrase_automaton("x", "y", "z").rewrite()
    assert isinstance(r, PhraseQuery) and r.terms == ("x", "y", "z")

    q = TermAutomatonQuery()
    s0, s1, s2 = (q.create_state() for _ in range(3))
    q.add_transition(s0, s1, "x")
    q.add_transition(s1, s2, "y")
    q.add_transition(s1, s2, "z")
    q.set_accept(s2, True)
    q.finish()
    r = q.rewrite()
    assert isinstance(r, MultiPhraseQuery)
    assert r.termss == (("x",), ("y", "z"))


def test_rewrite_any_becomes_gapped_phrase():
    # TermAutomatonQuery.java:431-483: an ANY slot is skipped but still
    # advances pos, so "a * b" rewrites to a phrase with a position gap
    r = any_gap_automaton().rewrite()
    assert isinstance(r, PhraseQuery)
    assert r.terms == ("a", "b") and r.positions == (0, 2)


def test_rewrite_branching_stays_automaton():
    # two dest states from one slot → not a sausage → stays self
    q = TermAutomatonQuery()
    s0, s1a, s1b, s2 = (q.create_state() for _ in range(4))
    q.add_transition(s0, s1a, "x")
    q.add_transition(s0, s1b, "y")
    q.add_transition(s1a, s2, "p")
    q.add_transition(s1b, s2, "q")
    q.set_accept(s2, True)
    q.finish()
    assert q.rewrite() is q


# ---- token stream front end ------------------------------------------------

def test_token_stream_phrase_and_star():
    q = token_stream_to_query("content", ["a", "*", "b"])
    term_id = {t: tid for tid, t in q.terms().items()}
    assert set(term_id) == {"a", "b"}
    det = q._check_finished()
    ev = sorted([(0, term_id["a"]), (2, term_id["b"])])
    assert count_matches(ev, det, q.any_id) == 1
    assert count_matches([(0, term_id["a"]), (1, term_id["b"])],
                         det, q.any_id) == 0


def test_token_stream_pos_length_graph():
    # 'wtc' spanning 2 positions parallel to 'world trade': graph query
    # matches either tokenization
    q = token_stream_to_query(
        "content", [("wtc", 1, 2), ("world", 0, 1), ("trade", 1, 1)])
    term_id = {t: tid for tid, t in q.terms().items()}
    det = q._check_finished()
    assert count_matches([(0, term_id["wtc"])], det, q.any_id) == 1
    assert count_matches(
        sorted([(0, term_id["world"]), (1, term_id["trade"])]),
        det, q.any_id) == 1


def test_token_stream_rejects_holes():
    with pytest.raises(ValueError, match="holes"):
        token_stream_to_query("content", ["a", ("b", 2)])
    # preserve_position_increments=False flattens the hole instead
    q = token_stream_to_query("content", ["a", ("b", 2)],
                              preserve_position_increments=False)
    term_id = {t: tid for tid, t in q.terms().items()}
    assert count_matches(
        sorted([(0, term_id["a"]), (1, term_id["b"])]),
        q._check_finished(), q.any_id) == 1


# ---- engine vs oracle identity ---------------------------------------------

@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("index_term_automaton"))
    corpus = corpus_df(spark, N_DOCS, partitions=4)
    tables = build_index(corpus, root, stop_words=ENGLISH_STOP_WORDS,
                         n_buckets=8)
    searcher = IndexSearcher(tables, cache=True)
    oracle = OracleIndex(
        analyzer=StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS))
    pdf = (corpus_pandas(N_DOCS)
           .sort_values(["repo", "path", "commit"]).reset_index(drop=True))
    oracle.add_all(pdf["content"])
    return searcher, oracle


def _identical(searcher, oracle, q, k=10):
    exp = oracle.search(q, k)
    got = searcher.search(q, k)
    assert [(d.docid, np.float32(d.score)) for d in got] == [
        (d.docid, np.float32(d.score)) for d in exp], q


def test_identity_term_automaton(built):
    searcher, oracle = built
    terms = sorted(t for _f, t in oracle.postings)
    hot = max(terms, key=lambda t: oracle.doc_freq(t))
    hot2 = max((t for t in terms if t != hot),
               key=lambda t: oracle.doc_freq(t))
    mid = terms[len(terms) // 2]

    # exact-phrase-shaped automaton (executed through the automaton
    # leaf, not the rewrite) must score identically to the oracle
    _identical(searcher, oracle, phrase_automaton(hot, hot2))

    # ANY-gap automaton: hot * hot2
    q = TermAutomatonQuery()
    s = [q.create_state() for _ in range(4)]
    q.add_transition(s[0], s[1], hot)
    q.add_any_transition(s[1], s[2])
    q.add_transition(s[2], s[3], hot2)
    q.set_accept(s[3], True)
    q.finish()
    _identical(searcher, oracle, q)

    # branching (multiphrase-shaped) automaton with a missing term mixed in
    q2 = TermAutomatonQuery()
    t0, t1, t2 = (q2.create_state() for _ in range(3))
    q2.add_transition(t0, t1, hot)
    q2.add_transition(t1, t2, hot2)
    q2.add_transition(t1, t2, mid)
    q2.add_transition(t1, t2, "zzzznotaterm")
    q2.set_accept(t2, True)
    q2.finish()
    _identical(searcher, oracle, q2)


def test_engine_matches_phrase_rewrite(built):
    # Automaton executed as automaton == its PhraseQuery rewrite
    searcher, oracle = built
    terms = sorted(t for _f, t in oracle.postings)
    hot = max(terms, key=lambda t: oracle.doc_freq(t))
    hot2 = max((t for t in terms if t != hot),
               key=lambda t: oracle.doc_freq(t))
    q = phrase_automaton(hot, hot2)
    got = searcher.search(q, 10)
    via_phrase = searcher.search(q.rewrite(), 10)
    assert [(d.docid, np.float32(d.score)) for d in got] == [
        (d.docid, np.float32(d.score)) for d in via_phrase]
