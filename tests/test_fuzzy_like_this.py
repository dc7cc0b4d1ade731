"""FuzzyLikeThisQuery (sandbox/queries/FuzzyLikeThisQuery.java):
variant-boost formula goldens, builder semantics vs hand-computed
values (df fallback to integer-average variant df, score² × idf,
maxNumTerms global truncation, ignoreTF constant-score mode), and
engine-vs-oracle identity on a real index."""

import math

import numpy as np
import pytest

from lucene_solr_spark.analysis import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_solr_spark.corpus import corpus_df, corpus_pandas
from lucene_solr_spark.index import build_index
from lucene_solr_spark.oracle import OracleIndex
from lucene_solr_spark.search.executor import IndexSearcher
from lucene_solr_spark.search.fuzzy_like_this import (
    FieldVals,
    FuzzyLikeThisQuery,
    build_fuzzy_like_this,
    classic_idf,
    fuzzy_variant_score,
)
from lucene_solr_spark.search.queries import (
    BlendedTermLeaf,
    BooleanQuery,
    ConstantScoreQuery,
    MatchNoDocsQuery,
)

N_DOCS = 100


# ---- variant boost (FuzzyTermsEnum.java:231-237) ---------------------------

def test_variant_score_exact_is_one():
    assert fuzzy_variant_score("wire", "wire", 2) == 1.0


def test_variant_score_formula():
    # ed("wire","wirf")=1, min len 4 -> 0.75
    assert fuzzy_variant_score("wire", "wirf", 2) == pytest.approx(0.75)
    # ed("wire","wir")=1, min len 3 -> 1 - 1/3
    assert fuzzy_variant_score("wire", "wir", 2) == pytest.approx(1 - 1 / 3)
    # transposition counts as ONE edit (OSA): "wrie"
    assert fuzzy_variant_score("wire", "wrie", 2) == pytest.approx(0.75)
    # beyond maxEdits -> -inf sentinel
    assert fuzzy_variant_score("wire", "abcdef", 2) == float("-inf")


# ---- builder semantics vs hand-computed ------------------------------------

class _WsAnalyzer:
    def analyze(self, text):
        toks = text.lower().split()
        return toks, list(range(len(toks)))


def _build(query_string, vocab, doc_count=100, max_num_terms=25,
           ignore_tf=False, max_edits=2):
    """vocab: {term: df} single-field enumerator."""

    def enum(field, term, me, pl):
        return [(t, df) for t, df in vocab.items()
                if t.startswith(term[:pl])]

    def doc_freq(field, term):
        return vocab.get(term, 0)

    q = FuzzyLikeThisQuery(
        (FieldVals(query_string, "content", max_edits, 0),),
        max_num_terms=max_num_terms, ignore_tf=ignore_tf)
    return build_fuzzy_like_this(q, enum, doc_freq, doc_count, _WsAnalyzer())


def _leaves(q):
    out = []
    for cl in q.clauses:
        if isinstance(cl.query, BooleanQuery):
            out.extend(c.query for c in cl.query.clauses)
        else:
            out.append(cl.query)
    return out


def test_builder_scores_hand_computed():
    vocab = {"wire": 10, "wirf": 3, "tire": 7}
    q = _build("wire", vocab, doc_count=100)
    leaves = {l.term: l for l in _leaves(q)}
    assert set(leaves) == {"wire", "wirf", "tire"}
    idf = classic_idf(10, 100)  # source term present: its own df
    assert idf == pytest.approx(math.log(101 / 11) + 1, rel=1e-6)
    for term, sim in [("wire", 1.0), ("wirf", 0.75), ("tire", 0.75)]:
        leaf = leaves[term]
        assert isinstance(leaf, BlendedTermLeaf)
        assert (leaf.df, leaf.ttf) == (1, 1)  # artificial stats (:256-273)
        want = float(np.float32(np.float32(sim) * np.float32(sim))
                     * np.float32(idf))
        assert leaf.boost == pytest.approx(want, rel=1e-6)


def test_builder_df_falls_back_to_avg_variant_df():
    # source term "wirz" absent from the vocab: df = total//n = (10+3)//2
    vocab = {"wire": 10, "wirf": 3}
    q = _build("wirz", vocab, doc_count=100)
    leaves = _leaves(q)
    idf = classic_idf((10 + 3) // 2, 100)
    sim = 0.75  # ed 1, min len 4
    want = float(np.float32(np.float32(sim) * np.float32(sim))
                 * np.float32(idf))
    assert {l.term for l in leaves} == {"wire", "wirf"}
    for l in leaves:
        assert l.boost == pytest.approx(want, rel=1e-6)


def test_builder_max_num_terms_keeps_best():
    # many variants; maxNumTerms=2 keeps the highest-scored globally
    vocab = {"wire": 5, "wirf": 5, "wirg": 5, "tire": 5}
    q = _build("wire", vocab, doc_count=100, max_num_terms=2)
    leaves = _leaves(q)
    assert len(leaves) == 2
    # exact match scores sim=1 > others; tie among 0.75-sims broken by
    # smaller term (ScoreTermQueue.lessThan: larger term evicted first)
    assert {l.term for l in leaves} == {"wire", "tire"}


def test_builder_ignore_tf_constant_score():
    q = _build("wire", {"wire": 10}, ignore_tf=True)
    (leaf,) = _leaves(q)
    assert isinstance(leaf, ConstantScoreQuery)
    assert leaf.query.term == "wire"


def test_builder_no_variants_matches_nothing():
    q = _build("zzz", {"wire": 10})
    assert isinstance(q, MatchNoDocsQuery)


# ---- engine vs oracle identity ----------------------------------------------

@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("index_flt"))
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
    return got


def test_identity_fuzzy_like_this(built):
    searcher, oracle = built
    terms = sorted(t for _f, t in oracle.postings)
    hot = max(terms, key=lambda t: oracle.doc_freq(t))
    mid = terms[len(terms) // 2]
    q = FuzzyLikeThisQuery((FieldVals(f"{hot} {mid}", "content", 2, 1),),
                           max_num_terms=8)
    got = _identical(searcher, oracle, q)
    assert got, "fuzzy-like-this found no hits on the corpus"


def test_identity_fuzzy_like_this_ignore_tf(built):
    searcher, oracle = built
    terms = sorted(t for _f, t in oracle.postings)
    mid = terms[len(terms) // 3]
    q = FuzzyLikeThisQuery((FieldVals(mid, "content", 2, 1),),
                           max_num_terms=6, ignore_tf=True)
    _identical(searcher, oracle, q)


def test_identity_unknown_source_term(built):
    searcher, oracle = built
    # a source term absent from the index exercises the avg-df branch
    terms = sorted(t for _f, t in oracle.postings
                   if len(t) >= 5 and t[:4].isalpha())
    src = terms[0][:4] + "zz"
    q = FuzzyLikeThisQuery((FieldVals(src, "content", 2, 2),),
                           max_num_terms=10)
    exp = oracle.search(q, 10)
    got = searcher.search(q, 10)
    assert [(d.docid, np.float32(d.score)) for d in got] == [
        (d.docid, np.float32(d.score)) for d in exp]
