"""Oracle engine tests over the reference's own 8-doc Blake corpus
(TestSimilarityBase.cs:590), replicating its integration assertions:
TestHeartList (3 hits for "heart") and TestHeartRanking (doc 2 ranks before
docs 6 and 7, 0-based)."""

import math

import numpy as np
import pytest

from lucenenet_spark.analysis import StandardAnalyzer
from lucenenet_spark.data import BLAKE_DOCS
from lucenenet_spark.query.ast import (
    BooleanQuery,
    DisjunctionMaxQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
    rewrite,
)
from lucenenet_spark.query.parser import parse_query
from lucenenet_spark.scoring.oracle import OracleIndex
from lucenenet_spark.scoring.smallfloat import byte315_to_float


@pytest.fixture(scope="module")
def idx():
    return OracleIndex(list(enumerate(BLAKE_DOCS)))


def test_heart_list(idx):
    # TestSimilarityBase.TestHeartList: the term query "heart" matches 3 docs
    assert idx.count(TermQuery("heart")) == 3


def test_heart_ranking(idx):
    # TestHeartRanking: doc 2 (freq=2) must rank above docs 6 and 7 (freq=1)
    top = idx.search(TermQuery("heart"), k=3)
    assert [d for d, _ in top][0] == 2
    assert {top[1][0], top[2][0]} == {6, 7}


def test_independent_bm25_recomputation(idx):
    """Cross-check the float32 kernel against a straight float64 BM25
    computation (same quantized doclen) — agreement to ~1e-5 relative."""
    k1, b = 1.2, 0.75
    n = idx.stats.maxdoc
    avgdl = idx.stats.sum_ttf / n
    for term in ["heart", "tiger", "human", "dread"]:
        plist = idx.postings[term]
        idf = math.log(1 + (n - len(plist) + 0.5) / (len(plist) + 0.5))
        scores = idx.term_scores(term)
        for docid, (freq, _) in plist.items():
            # decoded quantized doclen: norm = 1/decode(byte)^2
            dec = float(byte315_to_float(idx.norm_byte[docid])[0])
            quantized_len = 1.0 / (dec * dec)
            expected = idf * (k1 + 1) * freq / (freq + k1 * (1 - b + b * quantized_len / avgdl))
            assert float(scores[docid]) == pytest.approx(expected, rel=1e-5)


def test_scores_are_float32(idx):
    for _, s in idx.search(TermQuery("tiger"), k=10):
        assert isinstance(s, np.float32)


def test_boolean_and(idx):
    q = BooleanQuery.build(must=[TermQuery("human"), TermQuery("heart")])
    hits = idx.search(q, k=10)
    assert {d for d, _ in hits} == {6, 7}
    # AND score == sum of the term scores (float32 cast of float64 sum)
    th = idx.term_scores("human")
    tc = idx.term_scores("heart")
    for d, s in hits:
        assert s == np.float32(float(th[d]) + float(tc[d]))


def test_boolean_or_msm(idx):
    q = BooleanQuery.build(
        should=[TermQuery("tiger"), TermQuery("heart"), TermQuery("furnace")],
        minimum_should_match=2,
    )
    hits = {d for d, _ in idx.search(q, k=10)}
    # doc 7: heart+furnace; docs 0,5: tiger only; doc 2: heart only; doc 3: furnace only
    assert hits == {7}


def test_boolean_must_not(idx):
    q = BooleanQuery.build(must=[TermQuery("human")], must_not=[TermQuery("heart")])
    assert {d for d, _ in idx.search(q, k=10)} == set()  # 6,7 both have heart
    q2 = BooleanQuery.build(must=[TermQuery("what")], must_not=[TermQuery("tiger")])
    assert 0 not in {d for d, _ in idx.search(q2, k=10)}


def test_req_opt(idx):
    # MUST tiger + SHOULD dread: doc 0/5 match; optional adds nothing (no dread)
    q = BooleanQuery.build(must=[TermQuery("tiger")], should=[TermQuery("symmetry")])
    hits = idx.search(q, k=10)
    assert {d for d, _ in hits} == {0, 5}
    tt = idx.term_scores("tiger")
    ts = idx.term_scores("symmetry")
    for d, s in hits:
        assert s == np.float32(float(tt[d]) + float(ts.get(d, 0.0)))


def test_phrase_exact(idx):
    hits = idx.search(PhraseQuery(("human", "heart")), k=10)
    assert {d for d, _ in hits} == {6, 7}
    # "fearful symmetry" only in docs 0 and 5
    hits2 = idx.search(PhraseQuery(("fearful", "symmetry")), k=10)
    assert {d for d, _ in hits2} == {0, 5}
    # non-adjacent pair does not match exactly
    assert idx.count(PhraseQuery(("tiger", "bright"))) == 0


def test_phrase_with_stopword_gap(idx):
    # "forest of the night" analyzes to [forest, night] at positions with a
    # gap of 3 — as a phrase it must NOT match adjacent [forest, night]
    q = parse_query('"forest of the night"')
    assert isinstance(q, PhraseQuery)
    assert q.terms == ("forest", "night")
    assert idx.count(q) == 0  # exact positions differ (gap), like Lucene
    # with slop 2 the gap is tolerated
    assert idx.count(PhraseQuery(("forest", "night"), slop=2)) == 2


def test_multiterm_queries(idx):
    assert idx.count(PrefixQuery("tig")) == 2
    assert idx.count(WildcardQuery("t?ger")) == 2
    assert idx.count(FuzzyQuery("tigre", max_edits=2)) >= 2
    assert idx.count(TermRangeQuery("hammer", "heart")) >= 3
    assert idx.count(MatchAllDocsQuery()) == 8


def test_dismax(idx):
    q = DisjunctionMaxQuery((TermQuery("human"), TermQuery("heart")), tie_breaker=0.5)
    th, tc = idx.term_scores("human"), idx.term_scores("heart")
    for d, s in idx.search(q, k=10):
        ss = [float(x[d]) for x in (th, tc) if d in x]
        want = max(ss) + 0.5 * (sum(ss) - max(ss))
        assert float(s) == pytest.approx(want, rel=1e-6)


def test_tie_break_docid_asc(idx):
    # docs 0 and 5 are near-identical tiger docs; equal scores must order by docid
    top = idx.search(TermQuery("tiger"), k=2)
    if top[0][1] == top[1][1]:
        assert top[0][0] < top[1][0]


def test_rewrite_single_clause_unwrap():
    q = BooleanQuery.build(should=[TermQuery("x")])
    assert rewrite(q) == TermQuery("x")


def test_parser():
    q = parse_query("tiger AND heart")
    assert isinstance(q, BooleanQuery)
    must, should, must_not = q.parts()
    assert must == [TermQuery("tiger"), TermQuery("heart")]
    q2 = parse_query("+human -heart face")
    m2, s2, n2 = q2.parts()
    assert m2 == [TermQuery("human")] and n2 == [TermQuery("heart")]
    assert s2 == [TermQuery("face")]
    q3 = parse_query("tig*")
    assert q3 == PrefixQuery("tig")
    q4 = parse_query('"human heart"')
    assert q4 == PhraseQuery(("human", "heart"))
    q5 = parse_query("the")  # pure stopword query -> empty boolean
    assert q5 == BooleanQuery(())
