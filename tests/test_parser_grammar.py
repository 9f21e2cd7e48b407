"""QueryParser grammar extensions (QueryParserBase.cs:188, Classic/
QueryParser.cs): parentheses grouping, field-qualified range/fuzzy/quoted
values, group boost — parsed into the existing AST and, where an index is
handy, matched against the engine."""

import pytest

from lucenenet_spark.analysis import StandardAnalyzer
from lucenenet_spark.data.pages import pages_spark_df
from lucenenet_spark.index import IndexConfig, build_index
from lucenenet_spark.query import parse_query
from lucenenet_spark.query.ast import (
    BooleanQuery,
    FuzzyQuery,
    NumericRangeQuery,
    Occur,
    PhraseQuery,
    TermQuery,
)
from lucenenet_spark.query.engine import Searcher
from lucenenet_spark.scoring.oracle import OracleIndex

AZ = StandardAnalyzer(stop_words=frozenset())  # no stop list: terse queries


def test_parens_grouping():
    q = parse_query("(x OR y) AND z", analyzer=AZ)
    assert isinstance(q, BooleanQuery)
    occurs = [c.occur for c in q.clauses]
    assert occurs == [Occur.MUST, Occur.MUST]
    group = q.clauses[0].query
    assert isinstance(group, BooleanQuery)
    assert {c.query.term for c in group.clauses} == {"x", "y"}
    assert all(c.occur is Occur.SHOULD for c in group.clauses)
    assert q.clauses[1].query == TermQuery("z")


def test_nested_parens_and_group_boost():
    q = parse_query("((x OR y) AND z)^2", analyzer=AZ)
    assert isinstance(q, BooleanQuery)
    assert q.boost == 2.0
    q2 = parse_query("(p (q (r))) s", analyzer=AZ)
    assert len(q2.clauses) == 2  # the group and 's'


def test_field_keyword_plus_phrase():
    q = parse_query('lang:en "data merge"', analyzer=AZ)
    kinds = {type(c.query) for c in q.clauses}
    assert kinds == {TermQuery, PhraseQuery}
    kw = next(c.query for c in q.clauses if isinstance(c.query, TermQuery))
    assert (kw.field, kw.term) == ("lang", "en")


def test_field_range_compiles_to_numeric_range():
    import datetime as dt

    q = parse_query("warc_ts:[2020-01-01 TO 2020-06-01]", analyzer=AZ)
    # ISO bounds become tz-aware UTC instants, never session-tz strings
    assert q == NumericRangeQuery(
        "warc_ts",
        dt.datetime(2020, 1, 1, tzinfo=dt.timezone.utc),
        dt.datetime(2020, 6, 1, tzinfo=dt.timezone.utc),
    )
    qn = parse_query("doclen:[30 TO 80]", analyzer=AZ)
    assert qn == NumericRangeQuery("doclen", 30, 80)


def test_field_quoted_value_is_one_keyword_term():
    q = parse_query('source:"web crawl"', analyzer=AZ)
    assert q == TermQuery("web crawl", field="source")


def test_field_fuzzy():
    q = parse_query("lang:en~1", analyzer=AZ)
    assert isinstance(q, FuzzyQuery)
    assert (q.field, q.term, q.max_edits) == ("lang", "en", 1)


def test_stray_parens_do_not_crash():
    q = parse_query(") x (", analyzer=AZ)
    assert isinstance(q, TermQuery) and q.term == "x"


def test_parens_query_matches_oracle(spark, tmp_path):
    """(tiger OR heart) AND NOT lamb through engine == numpy oracle."""
    out = str(tmp_path / "idx")
    pages = pages_spark_df(spark, 120, seed=3)
    build_index(
        spark, pages, out,
        IndexConfig(num_partitions=4, bucket_width=2, flush_docs=64),
        overwrite=True,
    )
    s = Searcher(spark, out)
    pdf = pages.select("url", "text").toPandas()
    dm = s.docmap.select("docid", "url").toPandas()
    url2id = dict(zip(dm["url"], dm["docid"]))
    oracle = OracleIndex(
        [(int(url2id[u]), t) for u, t in zip(pdf["url"], pdf["text"])]
    )
    q = parse_query("(tiger OR heart) AND NOT lamb")
    got = [(int(r["docid"]), round(float(r["score"]), 4))
           for r in s.search(q, 10).collect()]
    exp = [(d, round(float(v), 4)) for d, v in oracle.search(q, k=10)]
    assert got == exp and got


def test_explain_matches_score_for_boosted_group(spark, tmp_path):
    """Explanation.value == score for a parenthesized boosted group — the
    TestExplanations contract extended to the new grammar."""
    import numpy as np

    out = str(tmp_path / "idx")
    build_index(
        spark, pages_spark_df(spark, 100, seed=4), out,
        IndexConfig(num_partitions=4, bucket_width=2, flush_docs=64),
        overwrite=True,
    )
    s = Searcher(spark, out)
    q = parse_query("(tiger OR heart)^2 AND NOT lamb")
    top = s.search(q, 5).collect()
    assert top
    for r in top:
        ex = s.explain(q, r["docid"])
        assert np.float32(ex["value"]) == np.float32(r["score"]), ex


def test_parser_never_crashes_property():
    """QueryParser robustness (the reference throws ParseException on
    malformed input; ours degrades to best-effort terms — either way, no
    unhandled crash): arbitrary input must parse to SOME Query."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=500, deadline=None)
    @given(st.text())
    def check(s):
        parse_query(s, analyzer=AZ)

    check()
    # the regression that prompted this: a boost marker with no number
    q = parse_query("tiger^. OR cat^", analyzer=AZ)
    assert {c.query.term for c in q.clauses} == {"tiger", "cat"}


def test_mid_pattern_wildcards():
    """Classic/QueryParser.cs wildcard grammar: te?t / te*t become
    WildcardQuery; a trailing-*-only word keeps the PrefixQuery shape."""
    from lucenenet_spark.query.ast import PrefixQuery, WildcardQuery

    assert parse_query("te?t") == WildcardQuery("te?t")
    assert parse_query("te*t") == WildcardQuery("te*t")
    assert parse_query("t*e?t") == WildcardQuery("t*e?t")
    assert parse_query("data*") == PrefixQuery("data")
    # wildcard patterns lowercase like indexed terms
    assert parse_query("Te?T") == WildcardQuery("te?t")
    # field-qualified wildcards
    assert parse_query("lang:e?") == WildcardQuery("e?", field="lang")
    assert parse_query("lang:e*n") == WildcardQuery("e*n", field="lang")
    assert parse_query("lang:en*") == PrefixQuery("en", field="lang")


def test_escaping():
    """QueryParserBase.Escape / discardEscapeChar: backslash suppresses
    parser interpretation; the analyzer then runs as always."""
    from lucenenet_spark.query.ast import (
        BooleanClause,
        BooleanQuery,
        Occur,
        PhraseQuery,
        TermQuery,
        WildcardQuery,
    )

    # \+literal is a term, not a MUST modifier
    assert parse_query(r"\+literal") == TermQuery("literal")
    plus = parse_query("+must other")
    assert isinstance(plus, BooleanQuery)
    assert plus.clauses[0].occur is Occur.MUST
    # te\*t: escaped star is NOT a wildcard; the text analyzer splits on
    # '*' exactly as indexing would (no '*' ever exists in text terms)
    assert parse_query(r"te\*t") == PhraseQuery(("te", "t"))
    # keyword fields keep escaped metachars verbatim (values unanalyzed)
    assert parse_query(r"lang:\*") == TermQuery("*", field="lang")
    assert parse_query(r"lang:a\*b") == TermQuery("a*b", field="lang")
    # escaped star INSIDE a real wildcard pattern -> literal [] class
    assert parse_query(r"lang:a\*b*") == WildcardQuery("a[*]b*", field="lang")


def test_wildcard_pattern_semantics():
    """The produced patterns behave correctly under the engine's fnmatch
    expansion (the _expand/_expand_terms contract)."""
    import fnmatch
    import re as _re

    from lucenenet_spark.query.parser import _wildcard_pattern

    rx = _re.compile(fnmatch.translate(_wildcard_pattern(r"a\*b*")))
    assert rx.match("a*bxx") and not rx.match("aXbxx")
    rx2 = _re.compile(fnmatch.translate(_wildcard_pattern("te?t")))
    assert rx2.match("text") and not rx2.match("teext")


def test_text_field_aware_parsing():
    """With text_fields declared (IndexConfig.text_fields), field-qualified
    clauses on those fields ANALYZE their value — the MultiFieldQueryParser
    per-field-analyzer convention — instead of keyword exact-match."""
    from lucenenet_spark.query.ast import FuzzyQuery, PhraseQuery, PrefixQuery, TermQuery
    from lucenenet_spark.query.parser import parse_query

    tf = frozenset({"title"})
    q = parse_query('title:"data merge"~2', text_fields=tf)
    assert q == PhraseQuery(("data", "merge"), 2, 1.0, field="title")
    assert parse_query("title:Data", text_fields=tf) == TermQuery("data", field="title")
    # stopwords drop through the chain; single survivor collapses to a term
    assert parse_query('title:"The Data"', text_fields=tf) == TermQuery(
        "data", field="title"
    )
    # wildcard / fuzzy values lowercase (text terms index lowercase)
    assert parse_query("title:S*", text_fields=tf) == PrefixQuery(
        "s", 1.0, field="title"
    )
    assert parse_query("title:Querry~1", text_fields=tf) == FuzzyQuery(
        "querry", max_edits=1, field="title"
    )
    # undeclared fields keep the keyword exact-match treatment
    assert parse_query('lang:"north korea"', text_fields=tf) == TermQuery(
        "north korea", field="lang"
    )
    assert parse_query('title:"data merge"') == TermQuery("data merge", field="title")


def test_searcher_parse_convenience(spark, tmp_path):
    """Searcher.parse wires the index's own analyzer + text_fields into
    parse_query; lang= picks the routed chain."""
    from lucenenet_spark.index import IndexConfig, build_index
    from lucenenet_spark.query.ast import PhraseQuery, TermQuery
    from lucenenet_spark.query.engine import Searcher

    rows = [("u://0", "les recherches donnent", "fr"), ("u://1", "plain text here", "en")]
    df = spark.createDataFrame(rows, "url string, text string, lang string")
    out = str(tmp_path / "idx_parse")
    cfg = IndexConfig(
        num_partitions=2, flush_docs=64,
        lang_field="lang", lang_chains=(("fr", "french"),),
    )
    build_index(spark, df, out, cfg, overwrite=True)
    s = Searcher(spark, out, scoring="exact_int")
    assert s.parse("recherches", lang="fr") == TermQuery("recherch")
    assert s.parse("recherches") == TermQuery("recherches")

    out2 = str(tmp_path / "idx_parse_tf")
    df2 = spark.createDataFrame(
        [("u://0", "body words", "Big Title")], "url string, text string, title string"
    )
    build_index(
        spark, df2, out2,
        IndexConfig(num_partitions=2, flush_docs=64, text_fields=("title",)),
        overwrite=True,
    )
    s2 = Searcher(spark, out2, scoring="exact_int")
    assert s2.parse('title:"Big Title"') == PhraseQuery(("big", "title"), 0, field="title")


# --------------------------------------------------------------------- #
# ComplexPhraseQueryParser dialect (r5 — ComplexPhraseQueryParser.cs:48)
# --------------------------------------------------------------------- #


def test_complex_phrase_group_and_fuzzy():
    from lucenenet_spark.query.ast import FuzzyQuery, SpanMultiTermWrapper, SpanNearQuery

    q = parse_query('"(john jon) smyth~"~2', dialect="complex_phrase")
    assert isinstance(q, SpanNearQuery)
    assert q.slop == 2 and q.in_order
    assert q.terms[0] == ("john", "jon")
    w = q.terms[1]
    assert isinstance(w, SpanMultiTermWrapper)
    assert isinstance(w.query, FuzzyQuery)
    assert w.query.term == "smyth" and w.query.max_edits == 2


def test_complex_phrase_wildcards():
    from lucenenet_spark.query.ast import (
        PrefixQuery,
        SpanMultiTermWrapper,
        SpanNearQuery,
        WildcardQuery,
    )

    q = parse_query('"big val* quer?"', dialect="complex_phrase")
    assert isinstance(q, SpanNearQuery) and q.slop == 0
    assert q.terms[0] == "big"
    assert isinstance(q.terms[1].query, PrefixQuery)
    assert q.terms[1].query.prefix == "val"
    assert isinstance(q.terms[2].query, WildcardQuery)
    assert q.terms[2].query.pattern == "quer?"
    assert isinstance(q.terms[1], SpanMultiTermWrapper)


def test_complex_phrase_fuzzy_edits_and_boost():
    from lucenenet_spark.query.ast import SpanNearQuery

    q = parse_query('"table smyth~1"~3^2.5', dialect="complex_phrase")
    assert isinstance(q, SpanNearQuery)
    assert q.boost == 2.5 and q.slop == 3
    assert q.terms[1].query.max_edits == 1


def test_complex_dialect_plain_phrase_unchanged():
    from lucenenet_spark.query.ast import PhraseQuery

    # no complex syntax inside quotes -> classic PhraseQuery path
    q = parse_query('"big table"~2', dialect="complex_phrase")
    assert isinstance(q, PhraseQuery)
    assert q.terms == ("big", "table") and q.slop == 2


def test_complex_dialect_outside_quotes_classic():
    from lucenenet_spark.query.ast import BooleanQuery, PrefixQuery

    # outside quotes the grammar is the classic one
    q = parse_query('val* AND "(a b) c*"', dialect="complex_phrase")
    assert isinstance(q, BooleanQuery)
    assert isinstance(q.clauses[0].query, PrefixQuery)


def test_classic_dialect_rejects_unknown():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="dialect"):
        parse_query("x", dialect="surround")


def test_complex_single_wrapped_clause_unwraps():
    from lucenenet_spark.query.ast import PrefixQuery

    q = parse_query('"val*"', dialect="complex_phrase")
    assert isinstance(q, PrefixQuery) and q.prefix == "val"
