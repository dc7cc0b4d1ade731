"""FreeTextSuggester stupid-backoff math on a hand-countable corpus."""

import pytest
from pyspark.sql import SparkSession

from lucene_solr_spark.search.freetext import FreeTextSuggester

DOCS = [
    (0, "big table scan big table join big table scan"),
    (1, "table scan fast"),
    (2, "big table scan"),
    (3, "scan fast done"),
]
# trigram (big,table,*): scan x3, join x1; ctx count2(big,table)=4
# bigram (scan,*): big x1, fast x2; count1(scan)=5
# context (big,scan) never occurs -> pure order-2 backoff


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def test_backoff_scores_trigram_only(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    sug = FreeTextSuggester(docs, "text")
    rows = {r.cand: (r.score, r.ord) for r in
            sug.lookup(("big", "table")).collect()}
    # trigram predictions: count3/count2(big,table)
    assert rows["scan"] == (round(3 / 4, 6), 3)
    assert rows["join"] == (round(1 / 4, 6), 3)
    # every bigram continuation of 'table' (scan, join) was already
    # predicted by the trigram model — seen-dedup leaves no ord-2 rows
    assert [c for c, v in rows.items() if v[1] == 2] == []


def test_backoff_on_unseen_trigram_context(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    sug = FreeTextSuggester(docs, "text")
    rows = {r.cand: (r.score, r.ord) for r in
            sug.lookup(("big", "scan")).collect()}
    # 'big scan' never occurs: the trigram model contributes nothing
    # and every prediction comes from the bigram model at ALPHA
    assert rows == {"fast": (round(0.4 * 2 / 5, 6), 2),
                    "big": (round(0.4 * 1 / 5, 6), 2)}


def test_short_docs_no_shingle_crash(spark):
    docs = spark.createDataFrame(
        [(0, "one"), (1, "two words"), (2, "")], "doc_id long, text string")
    sug = FreeTextSuggester(docs, "text")
    assert sug.g3.count() == 0
    assert sug.g2.count() == 1
    assert sug.lookup(("two", "words")).count() == 0
