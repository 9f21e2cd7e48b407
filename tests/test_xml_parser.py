"""XML query parser (Xml/CoreParser.cs:38 builder registry subset) ->
Query AST lowering: element dispatch, occurs mapping, spans, ranges,
error conventions."""

import pytest

from lucenenet_spark.analysis import StandardAnalyzer
from lucenenet_spark.query.ast import (
    BooleanQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    NumericRangeQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)
from lucenenet_spark.query.xmlparser import parse_xml_query

AN = StandardAnalyzer()


def test_term_query():
    assert parse_xml_query("<TermQuery>Merge</TermQuery>", AN) == TermQuery("merge")


def test_term_query_keyword_field_verbatim():
    q = parse_xml_query('<TermQuery fieldName="lang">EN US</TermQuery>', AN)
    assert q == TermQuery("EN US", field="lang")


def test_phrase_query_with_slop():
    q = parse_xml_query('<PhraseQuery slop="2">part filter</PhraseQuery>', AN)
    assert q == PhraseQuery(("part", "filter"), 2)


def test_boolean_query_occurs():
    q = parse_xml_query(
        """
        <BooleanQuery>
          <Clause occurs="must"><TermQuery>data</TermQuery></Clause>
          <Clause occurs="should"><TermQuery>merge</TermQuery></Clause>
          <Clause occurs="mustNot"><TermQuery>rust</TermQuery></Clause>
        </BooleanQuery>
        """,
        AN,
    )
    assert [c.occur for c in q.clauses] == [
        Occur.MUST, Occur.SHOULD, Occur.MUST_NOT,
    ]


def test_filter_clause_is_constant_score_must():
    q = parse_xml_query(
        """
        <BooleanQuery>
          <Clause occurs="must"><TermQuery>data</TermQuery></Clause>
          <Clause occurs="filter"><TermQuery>merge</TermQuery></Clause>
        </BooleanQuery>
        """,
        AN,
    )
    f = q.clauses[1]
    assert f.occur is Occur.MUST
    assert isinstance(f.query, ConstantScoreQuery) and f.query.boost == 0.0


def test_minimum_should_match():
    q = parse_xml_query(
        """
        <BooleanQuery minimumNumberShouldMatch="2">
          <Clause occurs="should"><TermQuery>data</TermQuery></Clause>
          <Clause occurs="should"><TermQuery>merge</TermQuery></Clause>
          <Clause occurs="should"><TermQuery>spark</TermQuery></Clause>
        </BooleanQuery>
        """,
        AN,
    )
    assert q.minimum_should_match == 2


def test_stopworded_clause_drops():
    q = parse_xml_query(
        """
        <BooleanQuery>
          <Clause occurs="should"><TermQuery>the</TermQuery></Clause>
          <Clause occurs="should"><TermQuery>data</TermQuery></Clause>
        </BooleanQuery>
        """,
        AN,
    )
    assert q == TermQuery("data")  # 1-clause unwrap via rewrite()


def test_match_all_and_constant_score():
    assert parse_xml_query("<MatchAllDocsQuery/>", AN) == MatchAllDocsQuery()
    q = parse_xml_query(
        "<ConstantScoreQuery><TermQuery>data</TermQuery></ConstantScoreQuery>",
        AN,
    )
    assert q == ConstantScoreQuery(TermQuery("data"))


def test_dismax():
    q = parse_xml_query(
        """
        <DisjunctionMaxQuery tieBreaker="0.3">
          <TermQuery>data</TermQuery>
          <TermQuery>vector</TermQuery>
        </DisjunctionMaxQuery>
        """,
        AN,
    )
    assert isinstance(q, DisjunctionMaxQuery)
    assert q.tie_breaker == 0.3 and len(q.disjuncts) == 2


def test_ranges():
    q = parse_xml_query(
        '<TermRangeQuery lowerTerm="Apple" upperTerm="Fig" '
        'includeUpper="false"/>',
        AN,
    )
    assert q == TermRangeQuery("apple", "fig", include_upper=False)
    q2 = parse_xml_query(
        '<NumericRangeQuery fieldName="doclen" lowerTerm="10" '
        'upperTerm="20"/>',
        AN,
    )
    assert q2 == NumericRangeQuery("doclen", 10, 20)


def test_mtq_elements():
    assert parse_xml_query("<PrefixQuery>mer</PrefixQuery>", AN) == PrefixQuery("mer")
    assert parse_xml_query("<WildcardQuery>m?rge</WildcardQuery>", AN) == WildcardQuery("m?rge")
    assert parse_xml_query('<FuzzyQuery maxEdits="1">merge</FuzzyQuery>', AN) == FuzzyQuery("merge", max_edits=1)


def test_span_near_with_or_and_nesting():
    q = parse_xml_query(
        """
        <SpanNear slop="2" inOrder="true">
          <SpanOr><SpanTerm>data</SpanTerm><SpanTerm>vector</SpanTerm></SpanOr>
          <SpanNear slop="0" inOrder="true">
            <SpanTerm>part</SpanTerm><SpanTerm>filter</SpanTerm>
          </SpanNear>
        </SpanNear>
        """,
        AN,
    )
    assert isinstance(q, SpanNearQuery)
    assert q.terms[0] == ("data", "vector")
    assert q.terms[1] == SpanNearQuery(("part", "filter"), 0, True)


def test_span_first_and_not():
    q = parse_xml_query(
        '<SpanFirst end="8"><SpanTerm>table</SpanTerm></SpanFirst>', AN
    )
    assert q == SpanFirstQuery("table", end=8)
    q2 = parse_xml_query(
        """
        <SpanNot pre="1" post="1">
          <Include><SpanTerm>data</SpanTerm></Include>
          <Exclude><SpanTerm>merge</SpanTerm></Exclude>
        </SpanNot>
        """,
        AN,
    )
    assert q2 == SpanNotQuery("data", "merge", pre=1, post=1)


def test_boost_attribute():
    q = parse_xml_query('<TermQuery boost="2.5">merge</TermQuery>', AN)
    assert q.boost == 2.5


def test_unknown_element_raises():
    with pytest.raises(ValueError, match="unknown element"):
        parse_xml_query("<FrobQuery>x</FrobQuery>", AN)


def test_malformed_xml_raises():
    with pytest.raises(ValueError, match="malformed"):
        parse_xml_query("<TermQuery>unclosed", AN)


def test_bad_occurs_raises():
    with pytest.raises(ValueError, match="occurs"):
        parse_xml_query(
            '<BooleanQuery><Clause occurs="perhaps">'
            "<TermQuery>x1</TermQuery></Clause></BooleanQuery>",
            AN,
        )
