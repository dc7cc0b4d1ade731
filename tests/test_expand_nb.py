"""ExpandComponent + SimpleNaiveBayesClassifier vs direct oracles."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.analysis import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_solr_spark.corpus import corpus_df, corpus_pandas
from lucene_solr_spark.index import build_index
from lucene_solr_spark.search import components as C
from lucene_solr_spark.search.executor import IndexSearcher
from lucene_solr_spark.search.queries import BooleanQuery, TermQuery

N_DOCS = 120


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("index_exp"))
    corpus = corpus_df(spark, N_DOCS, partitions=4).cache()
    tables = build_index(corpus, root, stop_words=ENGLISH_STOP_WORDS,
                         n_buckets=8)
    searcher = IndexSearcher(tables, cache=True)
    pdf = corpus_pandas(N_DOCS).sort_values(
        ["repo", "path", "commit"]).reset_index(drop=True)
    return searcher, pdf


def test_expand_returns_collapsed_away_docs(built):
    searcher, _ = built
    q = BooleanQuery.of(should=[TermQuery("type"), TermQuery("switch"),
                                TermQuery("break")])
    k_groups, expand_rows = 4, 3
    rows = C.expand_topk(searcher, q, "lang", k_groups, expand_rows).collect()
    assert rows
    # direct oracle: full scored match set joined to groups
    full = (searcher.search_df(q, None)
            .join(searcher.docs.select("docid", "lang"), "docid").collect())
    by_group: dict[str, list] = {}
    for r in full:
        by_group.setdefault(r.lang, []).append((np.float32(r.score), r.docid))
    ranked = {g: sorted(v, key=lambda x: (-x[0], x[1]))
              for g, v in by_group.items()}
    heads = sorted(((v[0][0], v[0][1], g) for g, v in ranked.items()),
                   key=lambda x: (-x[0], x[1]))[:k_groups]
    expect = set()
    for _s, _d, g in heads:
        for rank, (_sc, docid) in enumerate(ranked[g][1:expand_rows + 1], 1):
            expect.add((g, docid, rank))
    got = {(r.lang, r.docid, r.expand_rank) for r in rows}
    assert got == expect
    # the collapse heads themselves never appear in the expand section
    head_docids = {d for _s, d, _g in heads}
    assert not head_docids & {r.docid for r in rows}


def test_naive_bayes_matches_hand_computation(built):
    searcher, pdf = built
    an = StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS)
    text = pdf.iloc[5]["content"]
    got = {r.label: r.score for r in
           C.naive_bayes_classify(searcher, text, "lang",
                                  analyzer=an).collect()}
    # hand oracle over the same analyzed corpus
    doc_terms = [set(an.terms(c)) for c in pdf["content"]]
    labels = list(pdf["lang"])
    n_docs = len(pdf)
    sum_doc_freq = sum(len(s) for s in doc_terms)
    avg_unique = sum_doc_freq / n_docs
    words = an.terms(text)
    classes = sorted(set(labels))
    raw = {}
    for c in classes:
        idx = [i for i, l in enumerate(labels) if l == c]
        df_c = len(idx)
        s = math.log(df_c) - math.log(n_docs)
        den = avg_unique * df_c + n_docs
        for w in words:
            hits = sum(1 for i in idx if w in doc_terms[i])
            s += math.log((hits + 1) / den)
        raw[c] = s
    mx = max(raw.values())
    z = sum(math.exp(v - mx) for v in raw.values())
    expect = {c: math.exp(v - mx) / z for c, v in raw.items()}
    assert set(got) == set(expect)
    for c in expect:
        assert got[c] == pytest.approx(expect[c], rel=1e-9)
    # scores form a distribution and the argmax is the doc's own lang
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)


def test_explain_clause_sum_matches_total(built):
    searcher, _ = built
    import numpy as np

    from lucene_solr_spark.search.components import explain

    q = BooleanQuery.of(should=[TermQuery("type"), TermQuery("switch")],
                        must=[TermQuery("break")])
    top = searcher.search_df(q, 1).collect()[0]
    rows = explain(searcher, q, top.docid).collect()
    by = {r.clause: r.score for r in rows}
    total = by.pop("total")
    assert len(by) == 3  # MUST + 2 SHOULD all scoring clauses
    # float32 accumulation: clause scores sum (in f32) to the total
    acc = np.float32(0.0)
    for v in sorted(by.values(), reverse=True):  # engine sums desc-idf?
        acc = np.float32(acc + np.float32(v))
    # order-insensitive check at f32 tolerance
    assert float(acc) == pytest.approx(float(total), rel=1e-6)
