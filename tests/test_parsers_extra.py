"""SimpleQueryParser (never-throw grammar) + ComplexPhraseQueryParser
(wildcard/fuzzy inside phrases → MultiPhraseQuery): parse-shape units
and Spark-vs-oracle rank/score identity."""

import numpy as np
import pytest

from lucene_solr_spark.analysis import ENGLISH_STOP_WORDS, StandardAnalyzer
from lucene_solr_spark.corpus import corpus_df, corpus_pandas
from lucene_solr_spark.index import build_index
from lucene_solr_spark.oracle import OracleIndex
from lucene_solr_spark.search.executor import IndexSearcher
from lucene_solr_spark.search.multiterm import expand_terms
from lucene_solr_spark.search.parsers_extra import (
    ComplexPhraseQueryParser,
    SimpleQueryParser,
)
from lucene_solr_spark.search.queries import (
    BooleanQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MultiPhraseQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
)

N_DOCS = 120


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("index_pex"))
    corpus = corpus_df(spark, N_DOCS, partitions=4)
    tables = build_index(corpus, root, stop_words=ENGLISH_STOP_WORDS, n_buckets=8)
    searcher = IndexSearcher(tables, cache=True)
    pdf = corpus_pandas(N_DOCS).sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    oracle = OracleIndex(analyzer=StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS))
    oracle.add_all(pdf["content"])
    return searcher, oracle


def _identical(searcher, oracle, q, k=10):
    exp = oracle.search(q, k)
    got = searcher.search(q, k)
    assert [(d.docid, np.float32(d.score)) for d in got] == [
        (d.docid, np.float32(d.score)) for d in exp], q


AN = StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS)


# ---- SimpleQueryParser units ------------------------------------------

def test_simple_terms_default_or():
    q = SimpleQueryParser(AN).parse("spark index")
    assert isinstance(q, BooleanQuery)
    assert {c.occur for c in q.clauses} == {"SHOULD"}
    assert {c.query.term for c in q.clauses} == {"spark", "index"}


def test_simple_plus_and_pipe():
    q = SimpleQueryParser(AN).parse("spark + index | vector")
    assert isinstance(q, BooleanQuery)  # (spark AND index) OR vector
    assert {c.occur for c in q.clauses} == {"SHOULD"}
    left = q.clauses[0].query
    assert isinstance(left, BooleanQuery)
    assert {c.occur for c in left.clauses} == {"MUST"}


def test_simple_negation():
    q = SimpleQueryParser(AN).parse("spark -vector")
    assert isinstance(q, BooleanQuery)
    occurs = sorted(c.occur for c in q.clauses)
    assert occurs == ["MUST_NOT", "SHOULD"]


def test_simple_phrase_prefix_fuzzy():
    p = SimpleQueryParser(AN)
    assert isinstance(p.parse('"big data engine"'), PhraseQuery)
    assert isinstance(p.parse("spar*"), PrefixQuery)
    f = p.parse("spark~1")
    assert isinstance(f, FuzzyQuery) and f.max_edits == 1


def test_simple_never_throws():
    p = SimpleQueryParser(AN)
    for bad in ['"unterminated', "((( ", ")( |", "+ | - ", "a + ( b",
                '~~~', "-", "", "   ", '"a b', "x )))", "(((a"]:
        q = p.parse(bad)  # must not raise
        assert q is not None


def test_simple_stopword_only():
    assert isinstance(SimpleQueryParser(AN).parse("the and of"),
                      MatchAllDocsQuery)


# ---- ComplexPhraseQueryParser units -----------------------------------

def _mk_cp(vocab):
    return ComplexPhraseQueryParser(
        expand=lambda q: expand_terms(iter(vocab), q), analyzer=AN)


def test_complex_phrase_expansion_shapes():
    vocab = ["spark", "sparse", "spawn", "index", "indexes", "vector"]
    p = _mk_cp(vocab)
    q = p.parse('"spar* index"')
    assert isinstance(q, MultiPhraseQuery)
    assert set(q.termss[0]) == {"spark", "sparse"}
    assert q.termss[1] == ("index",)
    # plain phrase stays a PhraseQuery
    assert isinstance(p.parse('"spark index"'), PhraseQuery)
    # group = one-slot alternatives
    q = p.parse('"(spark vector) index"')
    assert isinstance(q, MultiPhraseQuery)
    assert set(q.termss[0]) == {"spark", "vector"}
    # slop carried through
    assert p.parse('"spar* index"~2').slop == 2


def test_complex_phrase_unmatchable_slot():
    from lucene_solr_spark.search.queries import MatchNoDocsQuery

    p = _mk_cp(["spark", "index"])
    assert isinstance(p.parse('"zzz* index"'), MatchNoDocsQuery)


# ---- engine identity ---------------------------------------------------

SIMPLE_QUERIES = [
    "spark index",
    "spark + index",
    "spark | vector -loop",
    '"return value" | spark',
    "spar* + index",
    "sprak~1",
    "(spark | vector) + index",
]


def test_simple_parser_identity(built):
    searcher, oracle = built
    p = SimpleQueryParser(AN)
    for s in SIMPLE_QUERIES:
        q = p.parse(s)
        _identical(searcher, oracle, q, k=10)


def test_complex_phrase_identity(built):
    searcher, oracle = built
    p = ComplexPhraseQueryParser(expand=searcher._expand, analyzer=AN)
    for s in ['"spar* index"', '"(spark vector) index"~3',
              '"retur* value"', '"the spark"']:
        q = p.parse(s)
        _identical(searcher, oracle, q, k=10)


# -- SurroundQueryParser -------------------------------------------------
from lucene_solr_spark.search.parsers_extra import (  # noqa: E402
    SurroundQueryParser,
    XmlQueryParser,
)
from lucene_solr_spark.search.queries import (  # noqa: E402
    DisjunctionMaxQuery,
    MultiPhraseQuery,
    TermRangeQuery,
)


def _expand_vocab(q):
    vocab = ["table", "tables", "tabulate", "tap"]
    from lucene_solr_spark.search.queries import PrefixQuery, WildcardQuery
    import re as _re

    if isinstance(q, PrefixQuery):
        return [t for t in vocab if t.startswith(q.prefix)]
    if isinstance(q, WildcardQuery):
        rx = _re.compile(q.pattern.replace("?", ".").replace("*", ".*") + "$")
        return [t for t in vocab if rx.match(t)]
    return []


class TestSurround:
    def test_infix_w_exact_phrase(self):
        from lucene_solr_spark.search.spans import SpanNearQuery, SpanTermQuery

        q = SurroundQueryParser().parse("big W table")
        assert isinstance(q, SpanNearQuery) and q.slop == 0 and q.in_order
        assert q.clauses == (SpanTermQuery("big"), SpanTermQuery("table"))

    def test_prefix_distance_ordered(self):
        from lucene_solr_spark.search.spans import SpanNearQuery, SpanTermQuery

        q = SurroundQueryParser().parse("3W(big, data, table)")
        # reference: SpanNearQuery(clauses, opDistance - 1, ordered)
        assert isinstance(q, SpanNearQuery) and q.slop == 2 and q.in_order
        assert [c.term for c in q.clauses] == ["big", "data", "table"]

    def test_unordered_near(self):
        from lucene_solr_spark.search.spans import SpanNearQuery

        q = SurroundQueryParser().parse("2N(big, table)")
        assert isinstance(q, SpanNearQuery) and q.slop == 1
        assert not q.in_order

    def test_wildcard_expansion_to_span_or(self):
        from lucene_solr_spark.search.spans import (
            SpanNearQuery,
            SpanOrQuery,
            SpanTermQuery,
        )

        q = SurroundQueryParser(_expand_vocab).parse("2W(big, tab*)")
        assert isinstance(q, SpanNearQuery) and q.slop == 1
        assert q.clauses[0] == SpanTermQuery("big")
        assert isinstance(q.clauses[1], SpanOrQuery)
        assert [c.term for c in q.clauses[1].clauses] == [
            "table", "tables", "tabulate"]

    def test_nested_distance_ops(self):
        from lucene_solr_spark.search.spans import SpanNearQuery

        q = SurroundQueryParser().parse("3W(2W(a, b), c)")
        assert isinstance(q, SpanNearQuery) and q.slop == 2
        inner = q.clauses[0]
        assert isinstance(inner, SpanNearQuery) and inner.slop == 1

    def test_boolean_and_boost(self):
        q = SurroundQueryParser().parse("(a OR b) AND c^2")
        assert isinstance(q, BooleanQuery)
        assert q.clauses[1].query.boost == 2.0

    def test_not(self):
        q = SurroundQueryParser().parse("fast NOT slow")
        occs = [c.occur for c in q.clauses]
        assert occs == ["MUST", "MUST_NOT"]

    def test_wildcard_without_expand_raises(self):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            SurroundQueryParser().parse("W(big, tab*)" if False else "2W(big, tab*)")


class TestXmlParser:
    def test_boolean_with_clauses(self):
        q = XmlQueryParser().parse(
            '<BooleanQuery minimumNumberShouldMatch="1">'
            '<Clause occurs="must"><TermQuery>Big</TermQuery></Clause>'
            '<Clause occurs="should"><PhraseQuery slop="1">big table</PhraseQuery></Clause>'
            '<Clause occurs="mustNot"><RangeQuery lowerTerm="a" upperTerm="c"/></Clause>'
            "</BooleanQuery>")
        assert isinstance(q, BooleanQuery)
        assert q.minimum_should_match == 1
        assert q.clauses[0].query == TermQuery("big")
        assert isinstance(q.clauses[1].query, PhraseQuery)
        assert isinstance(q.clauses[2].query, TermRangeQuery)

    def test_dismax_and_boost(self):
        q = XmlQueryParser().parse(
            '<DisjunctionMaxQuery tieBreaker="0.1">'
            '<TermQuery boost="2">x</TermQuery><MatchAllDocsQuery/>'
            "</DisjunctionMaxQuery>")
        assert isinstance(q, DisjunctionMaxQuery)
        assert q.tie_breaker == 0.1
        assert q.disjuncts[0].boost == 2.0

    def test_terms_query_analyzed(self):
        from lucene_solr_spark.analysis import ENGLISH_STOP_WORDS, StandardAnalyzer

        q = XmlQueryParser(
            analyzer=StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS)).parse(
            '<TermsQuery fieldName="content">The Quick Fox</TermsQuery>')
        assert isinstance(q, BooleanQuery)
        assert {c.query.term for c in q.clauses} == {"quick", "fox"}

    def test_user_query_delegates(self):
        from lucene_solr_spark.search.parser import QueryParser

        q = XmlQueryParser(classic_parser=QueryParser()).parse(
            "<UserQuery>big AND table</UserQuery>")
        assert isinstance(q, BooleanQuery)

    def test_constant_score(self):
        from lucene_solr_spark.search.queries import ConstantScoreQuery

        q = XmlQueryParser().parse(
            '<ConstantScoreQuery boost="3"><TermQuery>x</TermQuery>'
            "</ConstantScoreQuery>")
        assert isinstance(q, ConstantScoreQuery) and q.boost == 3.0

    def test_unknown_element_raises(self):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            XmlQueryParser().parse("<NoSuchQuery/>")
        # supported-but-empty span containers still refuse
        with _pytest.raises(ValueError):
            XmlQueryParser().parse("<SpanNear/>")


class TestPrecedence:
    """flexible/precedence/PrecedenceQueryParser: AND binds tighter
    than OR (BooleanModifiersQueryNodeProcessor grouping), same clause
    syntax as classic."""

    def _p(self, s, **kw):
        from lucene_solr_spark.search.parser import PrecedenceQueryParser

        return PrecedenceQueryParser(**kw).parse(s)

    def test_and_groups_bind_tighter(self):
        from lucene_solr_spark.search.queries import (
            BooleanQuery,
            TermQuery,
        )

        q = self._p("code AND builder OR vector")
        assert isinstance(q, BooleanQuery)
        assert [c.occur for c in q.clauses] == ["SHOULD", "SHOULD"]
        grp = q.clauses[0].query
        assert isinstance(grp, BooleanQuery)
        assert [(c.query.term, c.occur) for c in grp.clauses] == [
            ("code", "MUST"), ("builder", "MUST")]
        assert isinstance(q.clauses[1].query, TermQuery)

    def test_classic_differs(self):
        from lucene_solr_spark.search.parser import QueryParser
        from lucene_solr_spark.search.queries import TermQuery

        flat = QueryParser().parse("code AND builder OR vector")
        # classic addClause algebra: flat +code +builder vector —
        # semantically different from the precedence grouping
        assert all(isinstance(c.query, TermQuery) for c in flat.clauses)
        assert [c.occur for c in flat.clauses] == [
            "MUST", "MUST", "SHOULD"]

    def test_modifier_inside_group(self):
        q = self._p("code AND NOT builder OR vector")
        grp = q.clauses[0].query
        assert [c.occur for c in grp.clauses] == ["MUST", "MUST_NOT"]

    def test_default_and_operator(self):
        q = self._p("a b", default_operator="AND")
        assert [c.occur for c in q.clauses] == ["MUST", "MUST"]
        q2 = self._p("a b OR c", default_operator="AND")
        assert [c.occur for c in q2.clauses] == ["SHOULD", "SHOULD"]
        assert [c.occur for c in q2.clauses[0].query.clauses] == [
            "MUST", "MUST"]

    def test_parens_and_boost_still_work(self):
        from lucene_solr_spark.search.queries import BooleanQuery

        q = self._p("(a OR b) AND c")
        assert [c.occur for c in q.clauses] == ["MUST", "MUST"]
        assert isinstance(q.clauses[0].query, BooleanQuery)

    def test_empty_matches_all(self):
        from lucene_solr_spark.analysis import (
            ENGLISH_STOP_WORDS,
            StandardAnalyzer,
        )
        from lucene_solr_spark.search.queries import MatchAllDocsQuery

        a = StandardAnalyzer(stop_words=ENGLISH_STOP_WORDS)
        assert isinstance(self._p("the of", analyzer=a), MatchAllDocsQuery)


class TestXmlSpans:
    """xml/builders Span* set: SpanTerm/Near/Or/OrTerms/First/Not."""

    def _p(self, s):
        from lucene_solr_spark.search.parsers_extra import XmlQueryParser

        return XmlQueryParser().parse(s)

    def test_span_near(self):
        from lucene_solr_spark.search.spans import (
            SpanNearQuery,
            SpanTermQuery,
        )

        q = self._p('<SpanNear slop="2" inOrder="false" fieldName="content">'
                    '<SpanTerm>hello</SpanTerm><SpanTerm>world</SpanTerm>'
                    '</SpanNear>')
        assert q == SpanNearQuery(
            (SpanTermQuery("hello"), SpanTermQuery("world")),
            slop=2, in_order=False)

    def test_span_or_terms_analyzed(self):
        from lucene_solr_spark.search.spans import SpanOrQuery

        q = self._p('<SpanOrTerms fieldName="content">Hello World'
                    '</SpanOrTerms>')
        assert isinstance(q, SpanOrQuery)
        assert tuple(c.term for c in q.clauses) == ("hello", "world")

    def test_span_first_not(self):
        from lucene_solr_spark.search.spans import (
            SpanFirstQuery,
            SpanNotQuery,
        )

        q = self._p('<SpanFirst end="5"><SpanTerm fieldName="content">a'
                    '</SpanTerm></SpanFirst>')
        assert isinstance(q, SpanFirstQuery) and q.end == 5
        q2 = self._p('<SpanNot><Include><SpanTerm>a</SpanTerm></Include>'
                     '<Exclude><SpanTerm>b</SpanTerm></Exclude></SpanNot>')
        assert isinstance(q2, SpanNotQuery)
        assert q2.include.term == "a" and q2.exclude.term == "b"

    def test_span_inside_boolean(self):
        from lucene_solr_spark.search.queries import BooleanQuery

        q = self._p('<BooleanQuery><Clause occurs="must">'
                    '<SpanNear slop="0" inOrder="true">'
                    '<SpanTerm>x</SpanTerm><SpanTerm>y</SpanTerm>'
                    '</SpanNear></Clause>'
                    '<Clause occurs="should"><TermQuery>z</TermQuery>'
                    '</Clause></BooleanQuery>')
        assert isinstance(q, BooleanQuery)

    def test_boost_applies(self):
        q = self._p('<SpanTerm boost="2.5" fieldName="content">a'
                    '</SpanTerm>')
        assert q.boost == 2.5
