"""IR-quality harness (search/quality.py — benchmark/quality port):
QualityStats accumulator vs hand-computed values, the partial-list
P@N extension rule, good-queries-only averaging (MAP), TrecJudge
parsing, and an end-to-end judged run over the engine where boolean
AND ground truth makes every MUST-query hit relevant by construction."""

import pytest

from lucene_solr_spark.analysis import ENGLISH_STOP_WORDS
from lucene_solr_spark.corpus import corpus_df
from lucene_solr_spark.index import build_index
from lucene_solr_spark.search.executor import IndexSearcher
from lucene_solr_spark.search.quality import (
    QualityBenchmark,
    QualityQuery,
    QualityStats,
    TrecJudge,
    make_topics,
)
from lucene_solr_spark.search.queries import (
    BooleanClause,
    BooleanQuery,
    TermQuery,
)

N_DOCS = 120


# ---- QualityStats unit semantics -------------------------------------------

def test_stats_hand_computed():
    # ranked results: R N R N R, 4 relevant docs exist
    st = QualityStats(max_good_points=4)
    for n, rel in enumerate([True, False, True, False, True], start=1):
        st.add_result(n, rel)
    assert st.precision_at(1) == 1.0
    assert st.precision_at(2) == 0.5
    assert st.precision_at(3) == pytest.approx(2 / 3)
    assert st.precision_at(5) == pytest.approx(3 / 5)
    # avp = (1 + 2/3 + 3/5) / maxGood=4  (QualityStats.java:120-123)
    assert st.avp() == pytest.approx((1 + 2 / 3 + 3 / 5) / 4)
    assert st.recall == pytest.approx(3 / 4)
    assert st.mrr == 1.0


def test_stats_pat_extension_past_list_end():
    # 5 results; P@10 decays as if ranks 6..10 were non-relevant
    st = QualityStats(max_good_points=3)
    for n, rel in enumerate([True, True, False, True, False], start=1):
        st.add_result(n, rel)
    assert st.precision_at(10) == pytest.approx(5 * (3 / 5) / 10)


def test_stats_mrr_only_in_top5():
    st = QualityStats(max_good_points=1)
    for n in range(1, 7):
        st.add_result(n, n == 6)  # first relevant at rank 6
    assert st.mrr == 0.0
    st2 = QualityStats(max_good_points=1)
    for n in range(1, 6):
        st2.add_result(n, n == 5)
    assert st2.mrr == pytest.approx(1 / 5)


def test_stats_rank_must_be_consecutive():
    st = QualityStats(max_good_points=1)
    st.add_result(1, True)
    with pytest.raises(ValueError, match="illegal"):
        st.add_result(3, True)


def test_average_skips_zero_good_queries():
    a = QualityStats(max_good_points=2)
    a.add_result(1, True)
    a.add_result(2, True)          # avp = 1.0, recall 1.0, mrr 1.0
    b = QualityStats(max_good_points=0)
    b.add_result(1, False)         # no judgements: excluded from m
    c = QualityStats(max_good_points=1)
    c.add_result(1, False)
    c.add_result(2, True)          # avp = 0.5, recall 1.0, mrr 0.5
    avg = QualityStats.average([a, b, c])
    assert avg.avp() == pytest.approx((1.0 + 0.5) / 2)  # MAP over m=2
    assert avg.mrr == pytest.approx((1.0 + 0.5) / 2)
    assert avg.recall == pytest.approx(1.0)


def test_trec_judge_parsing():
    qrels = """
# a comment line
T0 0 repoA/f1/c1 1
T0 0 repoA/f2/c1 0
T1 0 repoB/f3/c2 1
T1 0 repoB/f4/c2 1
"""
    j = TrecJudge(qrels)
    assert j.max_recall(QualityQuery("T0", "")) == 1  # the 0-line dropped
    assert j.max_recall(QualityQuery("T1", "")) == 2
    assert j.is_relevant("repoA/f1/c1", QualityQuery("T0", ""))
    assert not j.is_relevant("repoA/f2/c1", QualityQuery("T0", ""))
    assert j.validate_data([QualityQuery("T0", ""), QualityQuery("T1", "")])
    with pytest.raises(ValueError, match="wrong format"):
        TrecJudge("T0 0 doc")


# ---- end-to-end judged run over the engine ----------------------------------

@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("quality_idx"))
    corpus = corpus_df(spark, N_DOCS, partitions=4)
    tables = build_index(corpus, root, stop_words=ENGLISH_STOP_WORDS,
                         n_buckets=8)
    return IndexSearcher(tables, cache=True)


def _must_parser(qq):
    return BooleanQuery(tuple(
        BooleanClause(TermQuery(t), "MUST") for t in qq.text.split()))


def _should_parser(qq):
    return BooleanQuery(tuple(
        BooleanClause(TermQuery(t), "SHOULD") for t in qq.text.split()))


def test_judged_run_must_query_perfect_precision(built):
    queries, qrels_text = make_topics(built, n_topics=4,
                                      terms_per_topic=2)
    assert queries and qrels_text
    judge = TrecJudge(qrels_text)
    assert judge.validate_data(queries)
    bench = QualityBenchmark(searcher=built, parser=_must_parser,
                             max_results=50)
    stats = bench.execute(queries, judge)
    # MUST query ≡ the ground-truth predicate: every hit is relevant
    for st in stats:
        assert st.num_good_points == st.num_points
        if st.num_points >= 1:
            assert st.precision_at(1) == 1.0
    avg = QualityStats.average(stats)
    assert avg.avp() == pytest.approx(avg.recall)  # all-relevant prefix


def test_judged_run_should_query_map_bounds(built):
    queries, qrels_text = make_topics(built, n_topics=4,
                                      terms_per_topic=2)
    judge = TrecJudge(qrels_text)
    bench = QualityBenchmark(searcher=built, parser=_should_parser,
                             max_results=50)
    stats = bench.execute(queries, judge)
    avg = QualityStats.average(stats)
    # OR retrieval must find every AND-relevant doc eventually
    # (supersets match), so recall == 1 given enough results; MAP may
    # dip below 1 when single-term docs outrank two-term docs
    assert 0 < avg.avp() <= 1.0
    assert avg.mrr <= 1.0
    m = [st for st in stats if st.max_good_points > 0]
    for st in m:
        if st.max_good_points <= st.num_points:
            assert st.recall == pytest.approx(1.0)
