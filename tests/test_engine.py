"""Differential tests: distributed engine vs the numpy oracle on the same
corpus — every query shape must be rank-identical with bit-equal float32
scores (the TestBooleanQuery/TestSimilarityBase gold-value pattern)."""

import numpy as np
import pytest

from lucenenet_spark.data.pages import pages_spark_df
from lucenenet_spark.index import IndexConfig, build_index
from lucenenet_spark.query.ast import (
    BooleanQuery,
    DisjunctionMaxQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MultiPhraseQuery,
    PhraseQuery,
    PrefixQuery,
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)
from lucenenet_spark.query.engine import Searcher
from lucenenet_spark.query.parser import parse_query
from lucenenet_spark.scoring.oracle import OracleIndex

N_DOCS = 400
CFG = IndexConfig(num_partitions=8, bucket_width=2, flush_docs=64)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx"))
    pages = pages_spark_df(spark, N_DOCS, seed=42)
    build_index(spark, pages, out, CFG, overwrite=True)
    # oracle over IDENTICAL docid assignment: read docmap for the mapping
    from lucenenet_spark.index.storage import IndexStorage

    dm = IndexStorage(out).read_stage(spark, "docmap").select("docid", "url").toPandas()
    url2docid = dict(zip(dm["url"], dm["docid"]))
    pdf = pages.select("url", "text").toPandas()
    oracle = OracleIndex(
        [(url2docid[u], t) for u, t in zip(pdf["url"], pdf["text"])]
    )
    searcher = Searcher(spark, out)
    return searcher, oracle


QUERIES = [
    TermQuery("heart"),
    TermQuery("tiger"),
    TermQuery("the"),  # stopword is stop-filtered at query analysis... but as
    # a raw TermQuery the term simply doesn't exist in the index -> 0 hits
    TermQuery("data"),
    TermQuery("search", boost=2.0),
    BooleanQuery.build(must=[TermQuery("search"), TermQuery("index")]),
    BooleanQuery.build(must=[TermQuery("human"), TermQuery("heart")]),
    BooleanQuery.build(should=[TermQuery("tiger"), TermQuery("heart"), TermQuery("furnace")]),
    BooleanQuery.build(
        should=[TermQuery("search"), TermQuery("index"), TermQuery("query")],
        minimum_should_match=2,
    ),
    BooleanQuery.build(must=[TermQuery("data")], must_not=[TermQuery("search")]),
    BooleanQuery.build(must=[TermQuery("tiger")], should=[TermQuery("symmetry")]),
    BooleanQuery.build(
        must=[TermQuery("data")],
        should=[TermQuery("search"), TermQuery("index")],
        must_not=[TermQuery("engine")],
        minimum_should_match=1,
    ),
    PhraseQuery(("human", "heart")),
    PhraseQuery(("fearful", "symmetry")),
    PhraseQuery(("forest", "night"), slop=2),
    MatchAllDocsQuery(),
    DisjunctionMaxQuery((TermQuery("human"), TermQuery("heart")), tie_breaker=0.5),
    SpanNearQuery(("human", "heart"), slop=0, in_order=True),  # == exact phrase
    SpanNearQuery(("forest", "night"), slop=3, in_order=True),
    SpanNearQuery(("heart", "human"), slop=2, in_order=False),  # reversed, unordered
    SpanNearQuery(("tiger", "burning", "bright"), slop=2, in_order=True),
    SpanFirstQuery("tiger", end=5),
    SpanFirstQuery("data", end=12, boost=1.5),
    SpanOrQuery(("tiger", "heart"), boost=1.25),
    SpanNotQuery("heart", "human", pre=1, post=1),
    SpanNotQuery("data", "nosuchterm"),
    MultiPhraseQuery((("human", "fearful"), ("heart", "symmetry"))),
    # synonym-union span clauses (SpanNear over SpanOr children)
    SpanNearQuery((("tiger", "forest"), "night"), slop=3, in_order=True),
    SpanNearQuery((SpanOrQuery(("human", "fearful")), ("heart", "symmetry")), slop=1),
    SpanNearQuery((("heart", "data"), "human"), slop=2, in_order=False),
    SpanNearQuery(("tiger", "burning", "bright"), slop=1, in_order=False),
    SpanNearQuery(("night", "forest", "tiger"), slop=4, in_order=False),
    # nested span clauses (r4): SpanNear over SpanNear subqueries —
    # NearSpansOrdered's gap-sum rule over variable-length inner spans
    SpanNearQuery(
        (SpanNearQuery(("tiger", "burning"), slop=1, in_order=True), "bright"),
        slop=3, in_order=True,
    ),
    SpanNearQuery(
        ("human", SpanNearQuery(("heart", "symmetry"), slop=4, in_order=False)),
        slop=5, in_order=True,
    ),
    SpanNearQuery(
        (
            SpanNearQuery(
                (SpanOrQuery(("tiger", "forest")), "night"), slop=3, in_order=True
            ),
            SpanNearQuery(("burning", "bright"), slop=2, in_order=True),
        ),
        slop=8, in_order=True,
    ),
    SpanNearQuery(
        (SpanNearQuery(("thy", "heart"), slop=2, in_order=False), "began"),
        slop=4, in_order=True,
    ),
    # three levels of nesting with a SpanOr leaf at the outermost clause
    SpanNearQuery(
        (
            SpanNearQuery(
                (SpanNearQuery(("tiger", "burning"), slop=1, in_order=True), "bright"),
                slop=2, in_order=True,
            ),
            SpanOrQuery(("forest", "night")),
        ),
        slop=6, in_order=True,
    ),
]


def _topk_engine(searcher, q, k=10):
    rows = searcher.search(q, k=k).collect()
    return [(int(r["docid"]), np.float32(r["score"])) for r in rows]


@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_rank_identical(corpus, qi):
    searcher, oracle = corpus
    q = QUERIES[qi]
    got = _topk_engine(searcher, q, k=10)
    want = oracle.search(q, k=10)
    assert [d for d, _ in got] == [d for d, _ in want], f"docids differ for {q}"
    for (dg, sg), (dw, sw) in zip(got, want):
        assert sg == sw, f"score mismatch for {q} doc {dg}: {sg!r} != {sw!r}"


@pytest.mark.parametrize(
    "q",
    [
        PrefixQuery("tig"),
        WildcardQuery("t?ger"),
        FuzzyQuery("tigre", max_edits=2),
        TermRangeQuery("hammer", "heart"),
    ],
)
def test_multiterm_match_sets(corpus, q):
    searcher, oracle = corpus
    got = {int(r["docid"]) for r in searcher.score_df(q).collect()}
    want = set(oracle._eval(q).keys())
    assert got == want


def test_counts_match(corpus):
    searcher, oracle = corpus
    for q in [TermQuery("data"), MatchAllDocsQuery(), PhraseQuery(("human", "heart"))]:
        assert searcher.count(q) == oracle.count(q)


def test_demorgan_equivalence(corpus):
    """TestBooleanQuery.cs:157-style: NOT(a OR b) under a MUST m is the same
    match set as (NOT a AND NOT b) under m."""
    searcher, _ = corpus
    m = TermQuery("data")
    a, b = TermQuery("search"), TermQuery("engine")
    q1 = BooleanQuery.build(
        must=[m], must_not=[BooleanQuery.build(should=[a, b])]
    )
    q2 = BooleanQuery.build(must=[m], must_not=[a, b])
    got1 = {int(r["docid"]) for r in searcher.score_df(q1).collect()}
    got2 = {int(r["docid"]) for r in searcher.score_df(q2).collect()}
    assert got1 == got2


def test_search_after_pagination(corpus):
    searcher, oracle = corpus
    q = TermQuery("data")
    full = oracle.search(q, k=20)
    page1 = _topk_engine(searcher, q, k=10)
    assert page1 == full[:10]
    last_doc, last_score = page1[-1]
    rows = searcher.search_after(q, float(last_score), last_doc, k=10).collect()
    page2 = [(int(r["docid"]), np.float32(r["score"])) for r in rows]
    assert page2 == full[10:20]


def test_parsed_query_end_to_end(corpus):
    searcher, oracle = corpus
    for qs in ["heart", "search AND index", '"human heart"', "+data -search engine"]:
        q = parse_query(qs)
        got = _topk_engine(searcher, q, k=10)
        want = oracle.search(q, k=10)
        assert got == want, qs


def test_search_batch_matches_individual(corpus):
    """search_batch must return per-query results identical to search()
    — same scoring paths, same tie-break — with rank numbered within
    each query_id."""
    searcher, _ = corpus
    batch = {
        "q_heart": TermQuery("heart"),
        "q_bool": BooleanQuery.build(must=[TermQuery("search"), TermQuery("index")]),
        "q_phrase": PhraseQuery(("human", "heart")),
        "q_dismax": DisjunctionMaxQuery(
            (TermQuery("human"), TermQuery("heart")), tie_breaker=0.5
        ),
        "q_empty": TermQuery("zz_no_such_term"),
    }
    got = searcher.search_batch(batch, k=7).collect()
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["docid"], np.float32(r["score"]))
        )
    for qid, q in batch.items():
        want = [
            (r["rank"], r["docid"], np.float32(r["score"]))
            for r in searcher.search(q, k=7).collect()
        ]
        assert sorted(by_q.get(qid, [])) == want, qid
