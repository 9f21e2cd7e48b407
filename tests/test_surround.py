"""Surround parser (Surround/Parser/QueryParser.jj + DistanceQuery.cs:30)
-> Query AST lowering: grammar shapes, precedence, distance lowering to
spans, and the reference's distance-subquery restrictions."""

import pytest

from lucenenet_spark.analysis import StandardAnalyzer
from lucenenet_spark.query.ast import (
    BooleanQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    SpanMultiTermWrapper,
    SpanNearQuery,
    TermQuery,
    WildcardQuery,
)
from lucenenet_spark.query.surround import parse_surround

AN = StandardAnalyzer()


def test_infix_w_adjacent():
    q = parse_surround("data w merge", AN)
    assert q == SpanNearQuery(("data", "merge"), slop=0, in_order=True)


def test_infix_nw_distance():
    q = parse_surround("data 3w merge", AN)
    assert q == SpanNearQuery(("data", "merge"), slop=2, in_order=True)


def test_infix_nn_unordered():
    q = parse_surround("query 2N join", AN)
    assert q == SpanNearQuery(("query", "join"), slop=1, in_order=False)


def test_prefix_form():
    q = parse_surround("3W(data, merge)", AN)
    assert q == SpanNearQuery(("data", "merge"), slop=2, in_order=True)


def test_prefix_form_three_clauses():
    q = parse_surround("4n(a1, b2, c3)", AN)
    assert q == SpanNearQuery(("a1", "b2", "c3"), slop=3, in_order=False)


def test_infix_same_distance_chains_into_one_operator():
    q = parse_surround("a1 3w b2 3w c3", AN)
    assert q == SpanNearQuery(("a1", "b2", "c3"), slop=2, in_order=True)


def test_infix_mixed_distance_nests():
    q = parse_surround("a1 2w b2 3w c3", AN)
    inner = SpanNearQuery(("a1", "b2"), slop=1, in_order=True)
    assert q == SpanNearQuery((inner, "c3"), slop=2, in_order=True)


def test_w_binds_tighter_than_n():
    q = parse_surround("a1 3n b2 2w c3", AN)
    inner = SpanNearQuery(("b2", "c3"), slop=1, in_order=True)
    assert q == SpanNearQuery(("a1", inner), slop=2, in_order=False)


def test_boolean_or_of_spans():
    q = parse_surround("3w(data, merge) or 2n(query, join)", AN)
    assert isinstance(q, BooleanQuery)
    assert [c.occur for c in q.clauses] == [Occur.SHOULD, Occur.SHOULD]
    assert q.clauses[0].query == SpanNearQuery(
        ("data", "merge"), slop=2, in_order=True
    )
    assert q.clauses[1].query == SpanNearQuery(
        ("query", "join"), slop=1, in_order=False
    )


def test_boolean_and_not_precedence():
    # OR loosest: (a AND b) OR (c NOT d)
    q = parse_surround("a1 and b2 or c3 not d4", AN)
    assert isinstance(q, BooleanQuery)
    assert len(q.clauses) == 2
    left, right = q.clauses[0].query, q.clauses[1].query
    assert [c.occur for c in left.clauses] == [Occur.MUST, Occur.MUST]
    assert [c.occur for c in right.clauses] == [Occur.MUST, Occur.MUST_NOT]


def test_or_inside_distance_becomes_alternatives():
    q = parse_surround("3w((data or vector), merge)", AN)
    assert q == SpanNearQuery((("data", "vector"), "merge"), slop=2, in_order=True)


def test_wildcard_inside_distance_wraps_mtq():
    q = parse_surround("2w(val*, merge)", AN)
    assert q.terms[0] == SpanMultiTermWrapper(PrefixQuery("val"))
    q2 = parse_surround("2w(v?l, merge)", AN)
    assert q2.terms[0] == SpanMultiTermWrapper(WildcardQuery("v?l"))


def test_nested_prefix_distance():
    q = parse_surround("5n(3w(data, merge), spark)", AN)
    inner = SpanNearQuery(("data", "merge"), slop=2, in_order=True)
    assert q == SpanNearQuery((inner, "spark"), slop=4, in_order=False)


def test_standalone_term_and_wildcards():
    assert parse_surround("merge", AN) == TermQuery("merge")
    assert parse_surround("mer*", AN) == PrefixQuery("mer")
    assert parse_surround("m?rge", AN) == WildcardQuery("m?rge")


def test_boost_suffix():
    q = parse_surround("3w(data, merge)^2.5", AN)
    assert q.boost == 2.5
    q2 = parse_surround("merge^2 or data", AN)
    assert q2.clauses[0].query.boost == 2.0


def test_analyzed_terms_and_stopwords():
    # analyzer stems/stops: a stopword operand makes the distance op
    # unmatchable -> empty boolean
    q = parse_surround("3w(the, merge)", AN)
    assert q == BooleanQuery(())
    # in boolean position a stopword clause just drops
    q2 = parse_surround("the or merge", AN)
    assert q2 == TermQuery("merge")


def test_multi_token_operand_becomes_adjacency():
    q = parse_surround("3w(over-the-counter, merge)", AN)
    inner = q.terms[0]
    assert isinstance(inner, SpanNearQuery)
    assert inner.slop == 0 and inner.in_order
    assert "counter" in inner.terms


def test_and_not_inside_distance_rejected():
    with pytest.raises(ValueError, match="distance"):
        parse_surround("3w((a1 and b2), c3)", AN)
    with pytest.raises(ValueError, match="distance"):
        parse_surround("3w((a1 not b2), c3)", AN)


def test_zero_distance_rejected():
    with pytest.raises(ValueError, match="distance"):
        parse_surround("0w(a1, b2)", AN)


def test_bare_w_word_is_a_term():
    # 'w' with no '(' in operand position is a plain term
    q = parse_surround("w", AN)
    assert q == TermQuery("w")


def test_missing_paren_raises():
    with pytest.raises(ValueError):
        parse_surround("3w(a1, b2", AN)


def test_trailing_garbage_raises():
    with pytest.raises(ValueError):
        parse_surround("a1 b2", AN)  # no operator between operands


def test_case_insensitive_operators():
    assert parse_surround("data 3W merge", AN) == parse_surround(
        "data 3w merge", AN
    )
    assert parse_surround("AND(a1, b2)", AN) == parse_surround(
        "a1 and b2", AN
    )
