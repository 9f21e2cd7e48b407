"""SimpleQueryParser (Simple/SimpleQueryParser.cs:46) -> Query AST:
operator lowering, left-to-right combination, and the never-throw
contract on malformed input."""

from lucenenet_spark.analysis import StandardAnalyzer
from lucenenet_spark.query.ast import (
    BooleanQuery,
    FuzzyQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
)
from lucenenet_spark.query.simple import parse_simple

AN = StandardAnalyzer()


def test_bare_terms_default_or():
    q = parse_simple("data merge", AN)
    assert isinstance(q, BooleanQuery)
    assert [c.occur for c in q.clauses] == [Occur.SHOULD, Occur.SHOULD]
    assert [c.query for c in q.clauses] == [TermQuery("data"), TermQuery("merge")]


def test_default_operator_and():
    q = parse_simple("data merge", AN, default_operator="AND")
    assert [c.occur for c in q.clauses] == [Occur.MUST, Occur.MUST]


def test_plus_promotes_both_sides():
    q = parse_simple("data + merge", AN)
    assert [c.occur for c in q.clauses] == [Occur.MUST, Occur.MUST]


def test_left_to_right_no_precedence():
    # a + b | c: '+' binds a,b as MUST; '|' adds c as SHOULD alongside
    q = parse_simple("data + merge | spark", AN)
    assert [c.occur for c in q.clauses] == [Occur.MUST, Occur.MUST, Occur.SHOULD]


def test_negation():
    q = parse_simple("data -merge", AN)
    assert [c.occur for c in q.clauses] == [Occur.SHOULD, Occur.MUST_NOT]


def test_only_negation_matches_nothing():
    assert parse_simple("-data", AN) == BooleanQuery(())


def test_phrase_and_slop():
    q = parse_simple('"fast scan"~2', AN)
    assert q == PhraseQuery(("fast", "scan"), 2)


def test_prefix_and_fuzzy():
    q = parse_simple("mer* data~1", AN)
    assert q.clauses[0].query == PrefixQuery("mer")
    assert q.clauses[1].query == FuzzyQuery("data", max_edits=1)


def test_grouping():
    q = parse_simple("(data | merge) + spark", AN)
    assert [c.occur for c in q.clauses] == [Occur.MUST, Occur.MUST]
    inner = q.clauses[0].query
    assert [c.occur for c in inner.clauses] == [Occur.SHOULD, Occur.SHOULD]


def test_never_throws_unterminated_quote():
    q = parse_simple('"fast scan', AN)
    assert q == PhraseQuery(("fast", "scan"), 0)


def test_never_throws_unmatched_parens():
    assert parse_simple("data)", AN) == TermQuery("data")
    q = parse_simple("(data merge", AN)  # group runs to end of input
    assert len(q.clauses) == 2


def test_never_throws_dangling_operators():
    assert parse_simple("+ data", AN) == TermQuery("data")
    assert parse_simple("data |", AN) == TermQuery("data")
    assert parse_simple("", AN) == BooleanQuery(())


def test_escape_keeps_operator_literal():
    # '\+' is literal text for the analyzer (which strips punctuation)
    q = parse_simple(r"data \+ merge", AN)
    assert [c.query for c in q.clauses] == [TermQuery("data"), TermQuery("merge")]


def test_midword_hyphen_stays_text():
    q = parse_simple("first-class", AN)
    assert q == PhraseQuery(("first", "class"), 0)


def test_stopworded_atom_drops():
    assert parse_simple("the data", AN) == TermQuery("data")
