"""Phrases on the compressed block-max WAND path (VERDICT round-2
next-round #4, phrase part): exact + sloppy PhraseQuery, standalone and
as MUST/SHOULD/FILTER/MUST_NOT clauses of a BooleanQuery, evaluated
inside segment_topk's windowed traversal — identity vs a naive
exhaustive evaluator over a synthetic codec-v2 segment (no Spark), with
WAND pruning on AND off.

Scoring parity target: the same float32 discipline as the uncompressed
engine's _phrase_verify_fn (weight from summed member idfs,
BM25Similarity.java:172-181; freq per ExactPhraseMatcher.java:93-126 /
SloppyPhraseMatcher.java:119-152)."""

import numpy as np
import pandas as pd
import pytest

from lucene_solr_spark.index import codec
from lucene_solr_spark.search import bm25
from lucene_solr_spark.search.sloppy import sloppy_freq
from lucene_solr_spark.search.wand import _phrase_freqs, segment_topk
from lucene_solr_spark.util.smallfloat import int_to_byte4

RNG = np.random.default_rng(7)
VOCAB = ["alpha", "beta", "gamma", "delta", "eps"]
N_DOCS = 400  # > BLOCK_SIZE so hot terms span multiple blocks


def _make_docs():
    """Deterministic synthetic docs as token lists; 'alpha beta' occurs
    as a bigram in many docs, with gaps/absences mixed in."""
    docs = []
    for d in range(N_DOCS):
        n = int(RNG.integers(3, 30))
        toks = list(RNG.choice(VOCAB, size=n,
                               p=[0.35, 0.3, 0.2, 0.1, 0.05]))
        docs.append(toks)
    return docs


def _encode_segment(docs, segment=0):
    """Token lists → codec-v2 block rows (pandas), one segment —
    the same wire format index/segments.py emits."""
    post = {}  # term -> {docid: [positions]}
    for d, toks in enumerate(docs):
        for p, t in enumerate(toks):
            post.setdefault(t, {}).setdefault(d, []).append(p)
    norm_byte = {d: int_to_byte4(len(toks)) for d, toks in enumerate(docs)}
    rows = []
    B = codec.BLOCK_SIZE
    for term, by_doc in post.items():
        docids = np.array(sorted(by_doc), dtype=np.int64)
        for ord_, s in enumerate(range(0, docids.size, B)):
            blk = docids[s:s + B]
            tfs = np.array([len(by_doc[d]) for d in blk], dtype=np.int64)
            norms = np.array([norm_byte[d] for d in blk], dtype=np.uint8)
            ddelta = np.diff(blk, prepend=blk[0]).astype(np.uint64)
            ddelta[0] = 0
            rows.append({
                "segment": segment, "term": term, "block_ord": ord_,
                "n": blk.size,
                "first_docid": int(blk[0]), "last_docid": int(blk[-1]),
                "docids": codec.encode_seq(ddelta, prefer_packed=False),
                "tfs": codec.encode_seq(tfs.astype(np.uint64),
                                        prefer_packed=False),
                "norms": norms.tobytes(),
                "positions": codec.encode_positions(
                    [np.array(by_doc[d], dtype=np.int64) for d in blk]),
                # impacts: every (tf, norm) pair — sound (max is exact)
                "imp_tfs": codec.encode_seq(tfs.astype(np.uint64),
                                            prefer_packed=False),
                "imp_norms": codec.encode_seq(norms.astype(np.uint64),
                                              prefer_packed=False),
            })
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def seg():
    docs = _make_docs()
    blocks = _encode_segment(docs)
    doc_count = len(docs)
    sum_ttf = sum(len(t) for t in docs)
    scorer = bm25.BM25Scorer(doc_count, sum_ttf)
    df = {t: sum(1 for d in docs if t in d) for t in VOCAB}
    return docs, blocks, scorer, df


def _phrase_weight(scorer, df, terms, boost=1.0):
    idfs = [scorer.idf(df[t]) for t in terms]
    return float(scorer.weight_from_idf_sum(
        np.float32(np.sum(np.asarray(idfs, dtype=np.float64))), boost))


def _naive(docs, scorer, df, term_weights=(), phrase_specs=(),
           must=(), filters=(), excludes=(), need=0, k=10):
    """Exhaustive per-doc evaluation with the engine's float32
    discipline; phrase freq via raw position matching."""
    out_d, out_s = [], []
    for d, toks in enumerate(docs):
        pos = {}
        for p, t in enumerate(toks):
            pos.setdefault(t, []).append(p)
        parts = []
        n_should = 0
        ok = True
        for t, w in term_weights:
            tf = len(pos.get(t, ()))
            if tf:
                parts.append(bm25.score_terms(
                    np.array([tf]), np.array([int_to_byte4(len(toks))]),
                    np.float32(w), scorer.cache)[0])
                if t not in must:
                    n_should += 1
            elif t in must:
                ok = False
        for terms_p, offs, slop, w, occ in phrase_specs:
            pls = [np.array(pos.get(t, []), dtype=np.int64)
                   for t in terms_p]
            if any(a.size == 0 for a in pls):
                freq = 0.0
            elif slop == 0:
                freq = 0.0
                base = pls[0] - offs[0]
                for start in base:
                    if all((start + offs[i]) in set(pls[i].tolist())
                           for i in range(len(terms_p))):
                        freq += 1
            else:
                freq = float(sloppy_freq(pls, tuple(offs), slop))
            matched = freq > 0
            if occ == "MUST_NOT":
                if matched:
                    ok = False
                continue
            if matched and occ in ("MUST", "SHOULD"):
                parts.append(bm25.score_terms(
                    np.array([freq]), np.array([int_to_byte4(len(toks))]),
                    np.float32(w), scorer.cache)[0])
                if occ == "SHOULD":
                    n_should += 1
            if occ in ("MUST", "FILTER") and not matched:
                ok = False
        for t in filters:
            if not pos.get(t):
                ok = False
        for t in excludes:
            if pos.get(t):
                ok = False
        if not ok or (need and n_should < need) or not parts:
            continue
        score = np.float32(np.sum(np.asarray(parts, dtype=np.float64)))
        out_d.append(d)
        out_s.append(score)
    order = sorted(range(len(out_d)),
                   key=lambda i: (-float(out_s[i]), out_d[i]))[:k]
    return ([out_d[i] for i in order],
            [np.float32(out_s[i]) for i in order])


def _run(seg, term_weights=(), phrase_specs=(), must=(), filters=(),
         excludes=(), need=0, k=10, use_wand=True):
    docs, blocks, scorer, df = seg
    d, s = segment_topk(
        blocks, dict(term_weights), scorer.cache, k,
        min_should_match=need, use_wand=use_wand,
        must=frozenset(must), filters=frozenset(filters),
        excludes=frozenset(excludes), phrases=tuple(phrase_specs))
    return list(d), [np.float32(x) for x in s]


PHRASE = ("alpha", "beta")


def test_exact_phrase_standalone(seg):
    docs, blocks, scorer, df = seg
    w = _phrase_weight(scorer, df, PHRASE)
    spec = [(PHRASE, (0, 1), 0, w, "MUST")]
    for use_wand in (True, False):
        got = _run(seg, phrase_specs=spec, use_wand=use_wand)
        exp = _naive(docs, scorer, df, phrase_specs=spec)
        assert got == exp


def test_sloppy_phrase_standalone(seg):
    docs, blocks, scorer, df = seg
    w = _phrase_weight(scorer, df, PHRASE, boost=1.3)
    spec = [(PHRASE, (0, 1), 2, w, "MUST")]
    for use_wand in (True, False):
        got = _run(seg, phrase_specs=spec, use_wand=use_wand)
        exp = _naive(docs, scorer, df, phrase_specs=spec)
        assert got == exp


def test_phrase_with_position_gap(seg):
    """PhraseQuery with explicit positions (stopword hole): "alpha _
    gamma" = positions (0, 2)."""
    docs, blocks, scorer, df = seg
    terms = ("alpha", "gamma")
    w = _phrase_weight(scorer, df, terms)
    spec = [(terms, (0, 2), 0, w, "MUST")]
    got = _run(seg, phrase_specs=spec)
    exp = _naive(docs, scorer, df, phrase_specs=spec)
    assert got == exp


def test_phrase_must_plus_term_should(seg):
    docs, blocks, scorer, df = seg
    w = _phrase_weight(scorer, df, PHRASE)
    tw = [("gamma", float(scorer.weight(df["gamma"])))]
    spec = [(PHRASE, (0, 1), 0, w, "MUST")]
    for use_wand in (True, False):
        got = _run(seg, term_weights=tw, phrase_specs=spec,
                   use_wand=use_wand)
        exp = _naive(docs, scorer, df, term_weights=tw, phrase_specs=spec)
        assert got == exp


def test_phrase_should_msm(seg):
    """Two SHOULD clauses (term + phrase), minimum_should_match=2."""
    docs, blocks, scorer, df = seg
    w = _phrase_weight(scorer, df, PHRASE)
    tw = [("delta", float(scorer.weight(df["delta"])))]
    spec = [(PHRASE, (0, 1), 0, w, "SHOULD")]
    got = _run(seg, term_weights=tw, phrase_specs=spec, need=2)
    exp = _naive(docs, scorer, df, term_weights=tw, phrase_specs=spec,
                 need=2)
    assert got == exp


def test_phrase_filter_and_mustnot(seg):
    docs, blocks, scorer, df = seg
    tw = [("gamma", float(scorer.weight(df["gamma"])))]
    filt = [(PHRASE, (0, 1), 0, None, "FILTER")]
    got = _run(seg, term_weights=tw, phrase_specs=filt,
               must={"gamma"})
    exp = _naive(docs, scorer, df, term_weights=tw, phrase_specs=filt,
                 must={"gamma"})
    assert got == exp

    mn = [(("beta", "alpha"), (0, 1), 0, None, "MUST_NOT")]
    got = _run(seg, term_weights=tw, phrase_specs=mn, must={"gamma"})
    exp = _naive(docs, scorer, df, term_weights=tw, phrase_specs=mn,
                 must={"gamma"})
    assert got == exp


def test_phrase_freqs_matches_naive_exact():
    pos_lists = [
        [np.array([1, 5, 9]), np.array([0]), np.array([], dtype=np.int64)],
        [np.array([2, 10]), np.array([4]), np.array([3])],
    ]
    freqs = _phrase_freqs(pos_lists, (0, 1), 0)
    assert freqs.tolist() == [2.0, 0.0, 0.0]
