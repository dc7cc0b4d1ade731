"""Search components: collapse/grouping, facet-on-results, MLT,
rescore, suggest, spellcheck, highlight (SURVEY §2.7/§2.13)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_solr_spark.corpus import corpus_df, corpus_pandas
from lucene_solr_spark.index import build_index
from lucene_solr_spark.oracle import OracleIndex
from lucene_solr_spark.search import components as C
from lucene_solr_spark.search.executor import IndexSearcher
from lucene_solr_spark.search.queries import BooleanQuery, TermQuery

N_DOCS = 120


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("index_comp"))
    corpus = corpus_df(spark, N_DOCS, partitions=4).cache()
    tables = build_index(corpus, root, stop_words=ENGLISH_STOP_WORDS, n_buckets=8)
    searcher = IndexSearcher(tables, cache=True)
    pdf = corpus_pandas(N_DOCS).sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    oracle = OracleIndex(analyzer=StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS))
    oracle.add_all(pdf["content"])
    return searcher, oracle, corpus, pdf


def _common_terms(oracle, n=2):
    v = sorted((t for _f, t in oracle.postings), key=lambda t: -oracle.doc_freq(t))
    return v[:n]


def test_collapse_topk(built):
    searcher, oracle, _, _ = built
    t1, t2 = _common_terms(oracle)
    q = BooleanQuery.of(should=[TermQuery(t1), TermQuery(t2)])
    rows = C.collapse_topk(searcher, q, "repo", k_groups=5, docs_per_group=2).collect()
    assert rows
    # one best row per group; ranks contiguous; within-group ranks valid
    seen = {}
    for r in rows:
        seen.setdefault(r["group_rank"], []).append(r)
        assert 1 <= r["rank_in_group"] <= 2
    assert sorted(seen) == list(range(1, len(seen) + 1))
    # group order == order of each group's best score (desc)
    best = [max(np.float32(r["score"]) for r in grp) for _, grp in sorted(seen.items())]
    assert best == sorted(best, reverse=True)
    # every hit's group collapse is correct vs a direct computation
    full = searcher.search_df(q, None)
    top1 = (full.join(searcher.docs.select("docid", "repo"), "docid")
            .groupBy("repo").agg(F.max("score").alias("s")).collect())
    exp_best = sorted((np.float32(r["s"]) for r in top1), reverse=True)[:len(seen)]
    assert [np.float32(b) for b in best] == [np.float32(x) for x in exp_best]


def test_facet_on_results(built):
    searcher, oracle, _, pdf = built
    t1, _ = _common_terms(oracle)
    q = TermQuery(t1)
    got = {r["lang"]: r["count"] for r in
           C.facet_on_results(searcher, q, "lang").collect()}
    # oracle: docids → langs via pdf order (docid = PK-sorted row index)
    match = set(d for d, _ in oracle._match(q, oracle.scorer()).items())
    exp = {}
    for d in match:
        exp[pdf.iloc[d]["lang"]] = exp.get(pdf.iloc[d]["lang"], 0) + 1
    assert got == exp


def test_more_like_this(built):
    searcher, oracle, _, _ = built
    q = C.more_like_this(searcher, docid=3, max_query_terms=10)
    assert 1 <= len(q.clauses) <= 10
    hits = searcher.search(q, 5)
    assert hits
    # the source doc scores in its own MLT neighborhood (almost surely #1)
    assert any(h.docid == 3 for h in hits)


def test_rescore(built):
    searcher, oracle, _, _ = built
    t1, t2 = _common_terms(oracle)
    first, second = TermQuery(t1), TermQuery(t2)
    got = C.rescore(searcher, first, second, rescore_n=30, k=10,
                    first_weight=1.0, second_weight=2.0).collect()
    assert len(got) == 10
    # recompute expected combination from the two score maps
    scorer = oracle.scorer()
    m1 = oracle._match(first, scorer)
    m2 = oracle._match(second, scorer)
    top30 = sorted(m1.items(), key=lambda kv: (-np.float32(kv[1]), kv[0]))[:30]
    comb = sorted(
        ((d, np.float32(np.float32(s) * np.float32(1.0)
                        + np.float32(m2.get(d, 0.0)) * np.float32(2.0)))
         for d, s in top30),
        key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["docid"], np.float32(r["score"])) for r in got] == [
        (d, np.float32(s)) for d, s in comb]


def test_suggest(built):
    searcher, oracle, _, _ = built
    pref = sorted(t for _f, t in oracle.postings)[len(oracle.postings) // 2][:2]
    got = C.suggest(searcher, pref, 10).collect()
    assert got
    exp = sorted(
        ((t, oracle.doc_freq(t)) for _f, t in oracle.postings if t.startswith(pref)),
        key=lambda x: (-x[1], x[0]))[:10]
    assert [(r["term"], r["weight"]) for r in got] == exp


def test_spellcheck(built):
    searcher, oracle, _, _ = built
    word = max((t for _f, t in oracle.postings if len(t) >= 5),
               key=lambda t: (oracle.doc_freq(t), t))
    typo = word[:-1] + ("x" if word[-1] != "x" else "y")
    out = C.spellcheck(searcher, typo, n=5)
    assert out and out[0][0] == word  # distance-1 high-df correction first
    # DirectSpellChecker gates: accuracy floor, boost-formula scores
    assert all(s >= 0.5 for _, s, _ in out)
    d1 = 1.0 - 1.0 / min(len(word), len(typo))
    assert out[0][1] == pytest.approx(d1)
    # in-vocabulary words return nothing in not_in_index mode (:329)
    assert C.spellcheck(searcher, word, n=5) == []
    # too-short queries return nothing (minQueryLength, :320)
    assert C.spellcheck(searcher, "ab", n=5) == []


def test_highlight(built):
    searcher, oracle, corpus, _ = built
    t1, t2 = _common_terms(oracle)
    q = BooleanQuery.of(should=[TermQuery(t1), TermQuery(t2)])
    rows = C.highlight(searcher, q, k=5, corpus=corpus).collect()
    assert len(rows) == 5
    for r in rows:
        assert "<b>" in r["snippet"]
        inner = [s.split("</b>")[0].lower()
                 for s in r["snippet"].split("<b>")[1:]]
        assert all(tok in (t1, t2) for tok in inner)
    # top-k order preserved
    hits = searcher.search(q, 5)
    assert [r["docid"] for r in rows] == [h.docid for h in hits]


def test_highlight_multi_passage(built):
    searcher, oracle, corpus, _ = built
    t1, t2 = _common_terms(oracle)
    q = BooleanQuery.of(should=[TermQuery(t1), TermQuery(t2)])
    one = C.highlight(searcher, q, k=3, corpus=corpus,
                      window_tokens=6).collect()
    multi = C.highlight(searcher, q, k=3, corpus=corpus,
                        window_tokens=6, max_passages=3).collect()
    for r1, r3 in zip(one, multi):
        assert r1["docid"] == r3["docid"]
        # passage 1 of the multi snippet is a superset start; every
        # passage still wraps only query terms
        inner = [s.split("</b>")[0].lower()
                 for s in r3["snippet"].split("<b>")[1:]]
        assert inner and all(tok in (t1, t2) for tok in inner)
        assert len(r3["snippet"].split(" ... ")) >= 1
    # at least one of the top docs yields >1 passage at window 6
    assert any(len(r["snippet"].split(" ... ")) > 1 for r in multi)


def test_token_spans_offsets(built):
    an = StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS)
    text = "The Quick foo.bar BAZ-code 3.14"
    spans = an.token_spans(text)
    assert [t for t, _, _ in spans] == ["quick", "foo.bar", "baz", "code", "3.14"]
    for t, a, b in spans:
        assert text[a:b].lower() == t


def test_percolate(built):
    _, oracle, _, pdf = built
    from lucene_solr_spark.search.queries import PhraseQuery

    text = pdf["content"].iloc[0]
    an = StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS)
    toks = an.analyze(text)[0]
    queries = {
        "has_first": TermQuery(toks[0]),
        "phrase_first": PhraseQuery((toks[0], toks[1])),
        "no_match": TermQuery("zzzznope"),
        "bool": BooleanQuery.of(must=[TermQuery(toks[0])],
                                must_not=[TermQuery("zzzznope")]),
    }
    got = C.percolate(queries, text, analyzer=an)
    assert got == ["bool", "has_first", "phrase_first"]


def test_knn_classify(built):
    searcher, _, _, pdf = built
    an = StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS)
    # classify a doc by its own text: its own language should lead
    row = pdf.iloc[3]
    out = C.knn_classify(searcher, row["content"], "lang", k=7,
                         analyzer=an).collect()
    assert out, "classifier returned no votes"
    assert sum(r["votes"] for r in out) <= 7
    labels = [r["label"] for r in out]
    assert row["lang"] in labels


def test_match_no_docs(built):
    searcher, oracle, _, _ = built
    from lucene_solr_spark.search.queries import MatchNoDocsQuery

    assert searcher.search(MatchNoDocsQuery(), 5) == []
    assert oracle.search(MatchNoDocsQuery(), 5) == []


def test_spellcheck_collate(built):
    """SpellCheckCollator: multi-word collation verified against the
    index — corrected words substituted, in-vocab words untouched,
    hit counts real."""
    searcher, oracle, _, _ = built
    w1, w2 = _common_terms(oracle)
    typo = w1[:-1] + ("x" if w1[-1] != "x" else "y")
    out = C.spellcheck_collate(searcher, f"{typo} {w2}")
    assert out, "expected at least one verified collation"
    collation, hits = out[0]
    assert collation == f"{w1} {w2}"  # top correction substituted in
    assert hits > 0
    # hit count matches a direct MUST query
    q = BooleanQuery.of(must=[TermQuery(w1), TermQuery(w2)])
    assert hits == searcher.search_df(q, None).count()
    # a fully in-vocabulary query produces no collations
    assert C.spellcheck_collate(searcher, f"{w1} {w2}") == []


def test_luke_info(built):
    """LukeRequestHandler role: index + per-field introspection."""
    searcher, oracle, _, _ = built
    info = C.luke_info(searcher, top_terms=5)
    assert info["maxDoc"] == N_DOCS and info["numDocs"] == N_DOCS
    assert info["deletedDocs"] == 0 and info["hasDeletions"] is False
    f = info["fields"]["content"]
    assert f["distinct"] == len({t for _f, t in oracle.postings})
    assert f["docCount"] == N_DOCS
    # top terms = highest-df dictionary terms, df values exact
    exp = sorted(((t, oracle.doc_freq(t)) for _f, t in oracle.postings),
                 key=lambda x: (-x[1], x[0]))[:5]
    assert f["topTerms"] == exp


def test_mlt_interesting_terms_match_query(built):
    searcher, _, _, _ = built
    terms = C.mlt_interesting_terms(searcher, docid=1, max_query_terms=15)
    assert terms and all(s > 0 for _t, s in terms)
    # scores are non-increasing; term set equals the MLT query's clauses
    assert all(a[1] >= b[1] for a, b in zip(terms, terms[1:]))
    q = C.more_like_this(searcher, docid=1, max_query_terms=15)
    assert {t for t, _s in terms} == {c.query.term for c in q.clauses}


def test_passage_score_formula():
    """PassageScorer.java hand-computed golden (defaults k1=1.2,
    b=0.75, pivot=87): one term, freq 2 in passage, 5 in doc,
    passage 100 chars starting at offset 50, doc 870 chars."""
    import math

    from lucene_solr_spark.search.components import passage_score

    num_docs = 1 + 870 / 87.0                      # 11.0
    weight = 2.2 * math.log(1 + (num_docs + 0.5) / (5 + 0.5))
    norm = 1.2 * (0.25 + 0.75 * 100 / 87.0)
    tf = 2 / (2 + norm)
    expected = tf * weight * (1 + 1 / math.log(87.0 + 50))
    got = passage_score({"x": 2}, {"x": 5}, 100, 50, 870)
    assert got == pytest.approx(expected)
    # position norm: identical passage later in the doc scores lower
    assert passage_score({"x": 2}, {"x": 5}, 100, 500, 870) < got
    # rarer term in doc (smaller ttf) weighs MORE (the DFR-ish weight)
    assert passage_score({"x": 2}, {"x": 2}, 100, 50, 870) > got
