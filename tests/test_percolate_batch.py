"""Distributed batch percolation vs the per-doc MemoryIndex oracle."""

import pytest

from lucene_solr_spark.analysis import StandardAnalyzer
from lucene_solr_spark.corpus import corpus_pandas
from lucene_solr_spark.search.components import percolate, percolate_batch
from lucene_solr_spark.search.queries import (
    BooleanQuery,
    MatchAllDocsQuery,
    PhraseQuery,
    TermQuery,
)

N_DOCS = 60


@pytest.fixture(scope="module")
def docs(spark):
    pdf = corpus_pandas(N_DOCS).reset_index()
    return spark.createDataFrame(
        pdf[["index", "content"]].rename(
            columns={"index": "doc_id", "content": "text"})).cache()


def _queries(pdf_texts):
    # derive real terms from the corpus
    toks = sorted({t for txt in pdf_texts for t in txt.lower().split()
                   if t.isalnum()})
    a, b = toks[0], toks[-1]
    return {
        "common": TermQuery("class"),
        "rare": TermQuery(a),
        "boolmix": BooleanQuery.of(must=[TermQuery("class")],
                                   must_not=[TermQuery(b)]),
        "phrase": PhraseQuery(("class", toks[len(toks) // 2])),
        "all": MatchAllDocsQuery(),
    }


def test_batch_matches_per_doc_percolate(spark, docs):
    pdf = corpus_pandas(N_DOCS)
    qs = _queries(pdf["content"])
    got = {(r["doc_id"], r["query_id"])
           for r in percolate_batch(qs, docs).collect()}
    an = StandardAnalyzer()
    want = set()
    for i, text in enumerate(pdf["content"]):
        for qid in percolate(qs, text, analyzer=an):
            want.add((i, qid))
    assert got == want
    # MatchAllDocs reached every doc through the no-term path
    assert {(i, "all") for i in range(N_DOCS)} <= got


def test_prefilter_prunes(spark, docs):
    # a query over a nonexistent term generates NO candidate pairs and
    # never reaches the exact stage
    qs = {"ghost": TermQuery("zzzznotaterm")}
    assert percolate_batch(qs, docs).count() == 0
