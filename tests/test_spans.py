"""Span algebra semantics (Spans module: SpanNearQuery.cs:38-66,
NearSpansOrdered.cs:42-89, NearSpansUnordered.cs:36-60,
SpanFirstQuery.cs:33-49) on handcrafted corpora — pure-oracle unit tests
(no Spark) pinning the match rules, mirroring the reference's
TestSpans.cs-style fixtures; the engine-vs-oracle differential runs in
test_engine.py's QUERIES battery."""

import pytest

from lucenenet_spark.query.ast import (
    MultiPhraseQuery,
    PhraseQuery,
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    rewrite,
)
from lucenenet_spark.scoring.oracle import OracleIndex

DOCS = [
    (0, "alpha beta gamma"),          # adjacent in order
    (1, "alpha filler beta"),         # gap of 1, in order
    (2, "beta alpha"),                # reversed, adjacent
    (3, "alpha filler filler filler beta"),  # gap of 3
    (4, "gamma delta"),               # no pair at all
    (5, "alpha beta beta gamma"),     # repeated middle term
    (6, "alpha alpha beta"),          # repeated anchor
]


@pytest.fixture(scope="module")
def idx():
    return OracleIndex(DOCS)


def _docs(idx, q):
    return sorted(idx._eval(q).keys())


def _freq(idx, q, d):
    # recover tf from the score by comparing against freq=1..n is fragile;
    # instead count via the eval helpers' own postings
    per = [sorted(idx.postings[t][d][1]) for t in q.terms]
    window = q.slop + len(q.terms) - 1
    n = 0
    for p0 in per[0]:
        if q.in_order:
            cur, ok = p0, True
            for plist in per[1:]:
                nxt = [p for p in plist if p > cur]
                if not nxt:
                    ok = False
                    break
                cur = nxt[0]
            n += 1 if ok and cur - p0 <= window else 0
        else:
            n += 1 if any(abs(p1 - p0) <= window for p1 in per[1]) else 0
    return n


def test_ordered_slop0_is_adjacency(idx):
    q = SpanNearQuery(("alpha", "beta"), slop=0, in_order=True)
    assert _docs(idx, q) == [0, 5, 6]


def test_ordered_slop_window(idx):
    assert _docs(idx, SpanNearQuery(("alpha", "beta"), slop=1, in_order=True)) == [0, 1, 5, 6]
    assert _docs(idx, SpanNearQuery(("alpha", "beta"), slop=3, in_order=True)) == [0, 1, 3, 5, 6]


def test_ordered_respects_order(idx):
    # doc 2 is "beta alpha": never matches the ordered query at any slop
    q = SpanNearQuery(("alpha", "beta"), slop=10, in_order=True)
    assert 2 not in _docs(idx, q)


def test_unordered_matches_either_direction(idx):
    q = SpanNearQuery(("alpha", "beta"), slop=0, in_order=False)
    # slop 0 -> |p1-p0| <= 1: adjacent either way
    assert _docs(idx, q) == [0, 2, 5, 6]


def test_unordered_is_symmetric(idx):
    a = _docs(idx, SpanNearQuery(("alpha", "beta"), slop=2, in_order=False))
    b = _docs(idx, SpanNearQuery(("beta", "alpha"), slop=2, in_order=False))
    assert a == b


def test_three_term_greedy_chain(idx):
    # doc 0 "alpha beta gamma": window 3, slop 0 matches
    # doc 5 "alpha beta beta gamma": greedy picks beta@2, gamma@4 -> window 4,
    # needs slop >= 1
    q0 = SpanNearQuery(("alpha", "beta", "gamma"), slop=0, in_order=True)
    q1 = SpanNearQuery(("alpha", "beta", "gamma"), slop=1, in_order=True)
    assert _docs(idx, q0) == [0]
    assert _docs(idx, q1) == [0, 5]


def test_ordered_slop0_matches_exact_phrase_docs(idx):
    # same MATCH SET as the exact phrase, but SpanScorer damping applies:
    # a 2-term adjacent window has matchLength = End - Start = 2, so each
    # match contributes 1/3 instead of the phrase convention's 1
    # (SpanScorer.cs SetFreqCurrentDoc + BM25Similarity.cs:74)
    span = idx._eval(SpanNearQuery(("alpha", "beta"), slop=0, in_order=True))
    phrase = idx._eval(PhraseQuery(("alpha", "beta")))
    assert sorted(span.keys()) == sorted(phrase.keys())
    assert all(span[d] < phrase[d] for d in span)
    # pin the damped freq exactly: doc 0 has one adjacent match -> freq 1/3
    import numpy as np
    idf = np.float32(
        float(idx.bm25.idf(len(idx.postings["alpha"]), idx.stats.maxdoc)[0])
        + float(idx.bm25.idf(len(idx.postings["beta"]), idx.stats.maxdoc)[0])
    )
    want = idx.bm25.score(
        np.array([1.0 / 3.0]), np.array([idx.norm_byte[0]]), idf, idx._cache
    )[0]
    assert np.float32(span[0]) == np.float32(want)


def test_anchor_freq_counts(idx):
    q = SpanNearQuery(("alpha", "beta"), slop=1, in_order=True)
    # doc 6 "alpha alpha beta": both anchors chain to beta@3 within window
    assert _freq(idx, q, 6) == 2
    # doc 5 "alpha beta beta gamma": single anchor
    assert _freq(idx, q, 5) == 1


def test_span_first(idx):
    # doc 6 "alpha alpha beta": alpha at positions 1,2
    assert _docs(idx, SpanFirstQuery("alpha", end=1)) == [0, 1, 3, 5, 6]
    assert 2 not in _docs(idx, SpanFirstQuery("alpha", end=1))  # alpha at pos 2
    assert _docs(idx, SpanFirstQuery("beta", end=1)) == [2]


def test_span_first_truncated_tf(idx):
    # tf truncation changes the score: end=1 sees one alpha in doc 6, end=2 two
    s1 = idx._eval(SpanFirstQuery("alpha", end=1))[6]
    s2 = idx._eval(SpanFirstQuery("alpha", end=2))[6]
    assert s2 > s1


def test_unordered_three_clauses(idx):
    """r4: n>2 unordered — joint window over the nearest position of every
    clause around each anchor (NearSpansUnordered's slop rule)."""
    # doc 0 "alpha beta gamma": range 2 <= slop 0 + 3 - 1 = 2 -> matches
    q0 = SpanNearQuery(("beta", "alpha", "gamma"), slop=0, in_order=False)
    assert 0 in _docs(idx, q0)
    # doc 5 "alpha beta beta gamma": anchor beta@1 (nearest), alpha@0,
    # gamma@3 -> range 3 > 2 at slop 0; slop 1 admits it
    assert 5 not in _docs(idx, q0)
    q1 = SpanNearQuery(("beta", "alpha", "gamma"), slop=1, in_order=False)
    assert {0, 5} <= set(_docs(idx, q1))
    # a doc missing any clause can never match
    assert 4 not in _docs(idx, q1) and 2 not in _docs(idx, q1)


def test_span_or_rewrites_to_single_clause_near(idx):
    q = SpanOrQuery(("alpha", "gamma"), boost=2.0)
    r = rewrite(q)
    assert r == SpanNearQuery((("alpha", "gamma"),), 0, True, 2.0)
    # union-of-spans match set: every doc containing either term
    assert sorted(idx._eval(q).keys()) == [0, 1, 2, 3, 4, 5, 6]


def test_span_or_freq_is_damped_occurrences(idx):
    # each member's unit span contributes sloppyFreq(1) = 1/2
    # (SpanScorer.cs SetFreqCurrentDoc); match set equals the slot-union
    # multiphrase but scores are damped
    direct = idx._eval(MultiPhraseQuery((("alpha", "beta"),), 0))
    via_or = idx._eval(SpanOrQuery(("alpha", "beta")))
    assert sorted(direct.keys()) == sorted(via_or.keys())
    assert all(via_or[d] < direct[d] for d in via_or)
    # doc 6 "alpha alpha beta": 3 union positions -> freq 1.5
    import numpy as np
    idf = np.float32(
        float(idx.bm25.idf(len(idx.postings["alpha"]), idx.stats.maxdoc)[0])
        + float(idx.bm25.idf(len(idx.postings["beta"]), idx.stats.maxdoc)[0])
    )
    want = idx.bm25.score(
        np.array([1.5]), np.array([idx.norm_byte[6]]), idf, idx._cache
    )[0]
    assert np.float32(via_or[6]) == np.float32(want)


def test_span_not_excludes_window(idx):
    # doc 0 "alpha beta gamma": alpha@0 with beta@1 -> excluded at post>=1
    q = SpanNotQuery("alpha", "beta", pre=0, post=1)
    got = sorted(idx._eval(q).keys())
    # doc 1 "alpha filler beta": beta@2 is outside [0,1]? p=0,post=1 -> window
    # [0,1], beta@2 survives. doc 6 "alpha alpha beta": alpha@0 window [0,1]
    # no beta; alpha@1 window [1,2] hits beta@2 -> freq 1, survives.
    assert 0 not in got and 5 not in got
    assert {1, 3, 6} <= set(got)


def test_span_not_pre_window(idx):
    # doc 2 "beta alpha": alpha@1, pre=1 window [0,1] contains beta@0
    q = SpanNotQuery("alpha", "beta", pre=1, post=0)
    assert 2 not in idx._eval(q)
    # with no window, same-position overlap never happens for distinct terms
    q0 = SpanNotQuery("alpha", "beta", pre=0, post=0)
    assert sorted(idx._eval(q0).keys()) == [0, 1, 2, 3, 5, 6]


def test_span_not_missing_exclude_keeps_all(idx):
    got = idx._eval(SpanNotQuery("alpha", "nosuchterm"))
    want = {d: s for d, s in idx._eval(SpanNotQuery("alpha", "delta")).items()}
    # 'delta' only occurs in doc 4 which has no alpha -> identical sets
    assert got == want
    assert sorted(got.keys()) == [0, 1, 2, 3, 5, 6]


def test_span_near_synonym_clause(idx):
    # SpanNear(SpanOr(alpha, gamma), beta): doc 0 "alpha beta gamma" matches
    # via alpha@0->beta@1; doc 2 "beta alpha" has no in-order chain from
    # either member; doc 4 "gamma delta" has no beta at all
    got = _docs(idx, SpanNearQuery((("alpha", "gamma"), "beta"), slop=0, in_order=True))
    assert got == [0, 5, 6]
    # wider slop picks up doc 1 ("alpha filler beta")
    got1 = _docs(idx, SpanNearQuery((("alpha", "gamma"), "beta"), slop=1, in_order=True))
    assert got1 == [0, 1, 5, 6]


def test_span_near_spanor_child_equals_tuple(idx):
    a = idx._eval(SpanNearQuery((SpanOrQuery(("alpha", "gamma")), "beta"), slop=1))
    b = idx._eval(SpanNearQuery((("alpha", "gamma"), "beta"), slop=1))
    assert a == b  # identical docs AND identical float32 scores


def test_span_near_union_missing_member_drops(idx):
    # a missing union member contributes no spans (and no idf), so the
    # result equals the single-term clause
    with_missing = idx._eval(SpanNearQuery((("alpha", "nosuchterm"), "beta"), slop=0))
    plain = idx._eval(SpanNearQuery(("alpha", "beta"), slop=0))
    assert with_missing == plain
    # a clause whose EVERY member is missing can never match
    assert idx._eval(SpanNearQuery((("nosuch1", "nosuch2"), "beta"), slop=0)) == {}


def test_span_near_unordered_union(idx):
    # unordered 2-clause with a union side: doc 2 "beta alpha" matches
    # (alpha adjacent to beta) even though ordered would not
    q = SpanNearQuery((("alpha", "gamma"), "beta"), slop=0, in_order=False)
    got = _docs(idx, q)
    assert 2 in got and 0 in got


def test_multiphrase_slot_union(idx):
    # "alpha|beta gamma": doc 0 matches via beta@1 gamma@2; doc 5 via
    # beta@2 gamma@3
    q = MultiPhraseQuery((("alpha", "beta"), ("gamma",)), 0)
    assert sorted(idx._eval(q).keys()) == [0, 5]


def test_nested_span_ordered_gap_sum(idx):
    # inner SpanNear(alpha, beta, slop=0, ordered) enumerates: doc 0 span
    # (0,2); doc 5 (0,2); doc 6 (1,3) (anchor alpha@1 — alpha@0's chain has
    # gap 1). Outer SpanNear(inner, gamma, slop=0, ordered) then needs
    # gamma at the inner span's end: doc 0 "alpha beta gamma" only.
    inner = SpanNearQuery(("alpha", "beta"), slop=0, in_order=True)
    assert _docs(idx, SpanNearQuery((inner, "gamma"), slop=0, in_order=True)) == [0]
    # slop=1 admits doc 5 "alpha beta beta gamma" (one-position gap between
    # the inner span end 2 and gamma@3)
    assert _docs(idx, SpanNearQuery((inner, "gamma"), slop=1, in_order=True)) == [0, 5]


def test_nested_span_inner_slop_propagates(idx):
    # inner slop=1 also matches doc 1 "alpha filler beta" as span (0,3);
    # no gamma there, so the outer match set is unchanged — but doc 5's
    # freq picks up nothing new (same anchor). Outer over doc 0 unchanged.
    inner = SpanNearQuery(("alpha", "beta"), slop=1, in_order=True)
    assert _docs(idx, SpanNearQuery((inner, "gamma"), slop=1, in_order=True)) == [0, 5]


def test_nested_span_unordered_inner(idx):
    # unordered inner (beta, alpha) matches doc 2 "beta alpha" as span
    # (0,2); there is no gamma in doc 2, so outer can't match there.
    inner = SpanNearQuery(("beta", "alpha"), slop=0, in_order=False)
    got = _docs(idx, SpanNearQuery((inner, "gamma"), slop=1, in_order=True))
    assert got == [0, 5]  # via beta@1/alpha... doc 0: inner span (0,2)+gamma@2


def test_nested_span_unordered_outer(idx):
    """r5: unordered OUTER nesting (NearSpansUnordered.cs SpansCell length
    bookkeeping) — matchLength - totalLength <= slop over the chosen
    variable-length spans."""
    inner = SpanNearQuery(("alpha", "beta"), slop=0, in_order=True)
    # d0: inner (0,2) + gamma@2 -> window (0,3), total 3, gaps 0
    assert _docs(idx, SpanNearQuery((inner, "gamma"), slop=0, in_order=False)) == [0]
    # d5: inner (0,2) + gamma@3 -> window (0,4), total 3, gap 1
    assert _docs(idx, SpanNearQuery((inner, "gamma"), slop=1, in_order=False)) == [0, 5]


def test_nested_span_unordered_outer_before_anchor():
    """The unordered window may extend BEFORE the nested span — the shape
    an ordered outer can never match."""
    oi = OracleIndex([(0, "gamma alpha beta"), (1, "alpha beta x gamma")])
    inner = SpanNearQuery(("alpha", "beta"), slop=0, in_order=True)
    # d0: inner (1,3), gamma@0 -> window (0,3), total 3, gaps 0
    assert _docs(oi, SpanNearQuery((inner, "gamma"), slop=0, in_order=False)) == [0]
    assert _docs(oi, SpanNearQuery((inner, "gamma"), slop=0, in_order=True)) == []
    # d1 needs one gap (x between beta and gamma)
    assert _docs(oi, SpanNearQuery((inner, "gamma"), slop=1, in_order=False)) == [0, 1]


def test_nested_span_missing_member(idx):
    inner = SpanNearQuery(("alpha", "nosuchterm"), slop=0, in_order=True)
    assert idx._eval(SpanNearQuery((inner, "gamma"), slop=5, in_order=True)) == {}


def test_member_terms_recursive():
    inner = SpanNearQuery((SpanOrQuery(("a", "b")), "c"), slop=0)
    outer = SpanNearQuery((inner, ("d", "e"), "f"), slop=1)
    assert outer.member_terms() == ("a", "b", "c", "d", "e", "f")
    assert outer.has_nested() and not inner.has_nested()
    with pytest.raises(TypeError):
        outer.clause_alts()


def test_nested_three_levels():
    # three levels of ordered nesting, a fresh corpus so the traces stay
    # hand-checkable: l1=(p q), l2=(l1 r), l3=(l2 s)
    idx2 = OracleIndex([(0, "p q r s"), (1, "p q x r y s"), (2, "p x q r s")])
    l1 = SpanNearQuery(("p", "q"), 0, True)
    l2 = SpanNearQuery((l1, "r"), 0, True)
    l3 = SpanNearQuery((l2, "s"), 0, True)
    assert sorted(idx2._eval(l3).keys()) == [0]
    # slop 1 at both outer levels admits doc 1 ("p q x r y s": one-gap
    # chain at each level), never doc 2 (l1 already fails there)
    l2b = SpanNearQuery((l1, "r"), 1, True)
    l3b = SpanNearQuery((l2b, "s"), 1, True)
    assert sorted(idx2._eval(l3b).keys()) == [0, 1]


def test_unsupported_clause_type_raises():
    with pytest.raises(TypeError, match="unsupported span clause"):
        SpanNearQuery((SpanFirstQuery("alpha", end=3), "beta"), slop=0).clauses_norm()
