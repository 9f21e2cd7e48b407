"""Round-2 query operators in float32 ("lucene") scoring mode:
FilteredQuery/NumericRangeQuery, scored MultiTermQuery rewrites
(scoring_boolean / top_terms_scoring), and MultiPhraseQuery.
The driver gate covers their exact_int mode vs DuckDB; these tests pin the
float32 path via internal consistency against the already-oracle-verified
TermQuery/PhraseQuery scorers."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucenenet_spark.index import IndexConfig, build_index
from lucenenet_spark.query.ast import (
    BooleanQuery,
    FilteredQuery,
    FuzzyQuery,
    MultiPhraseQuery,
    NumericRangeQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
)
from lucenenet_spark.query.engine import Searcher

DOCS = [
    ("u://0", "apple store sells apple laptops"),
    ("u://1", "application store hosts application bundles"),
    ("u://2", "apple orchard grows fruit"),
    ("u://3", "the store opens early and the store closes late"),
    ("u://4", "apfel store is a misspelled apple store"),
    ("u://5", "short doc"),
    ("u://6", "filler words filler words filler words filler words filler"),
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("r2idx"))
    pages = spark.createDataFrame(DOCS, "url string, text string")
    build_index(
        spark, pages, out,
        IndexConfig(num_partitions=2, flush_docs=64, stop_filter=False),
        overwrite=True,
    )
    s = Searcher(spark, out)
    dm = s.docmap.select("docid", "url", "doclen").toPandas()
    return s, dict(zip(dm["url"], dm["docid"])), dict(zip(dm["url"], dm["doclen"]))


def _scores(df):
    return {r["docid"]: np.float32(r["score"]) for r in df.collect()}


def test_numeric_range_standalone(idx):
    s, url2doc, url2len = idx
    lo, hi = 4, 6
    got = _scores(s.score_df(NumericRangeQuery("doclen", lo, hi)))
    expect = {d for u, d in url2doc.items() if lo <= url2len[u] <= hi}
    assert set(got) == expect and all(v == np.float32(1.0) for v in got.values())
    # exclusive bounds
    got2 = _scores(
        s.score_df(NumericRangeQuery("doclen", lo, hi, include_lower=False, include_upper=False))
    )
    assert set(got2) == {d for u, d in url2doc.items() if lo < url2len[u] < hi}


def test_filtered_query_keeps_scores_and_restricts(idx):
    s, url2doc, url2len = idx
    base = _scores(s.score_df(TermQuery("store")))
    filt = _scores(
        s.score_df(FilteredQuery(TermQuery("store"), NumericRangeQuery("doclen", 5, 6)))
    )
    expect = {d for d in base if any(
        url2doc[u] == d and 5 <= url2len[u] <= 6 for u in url2doc
    )}
    assert set(filt) == expect and len(filt) < len(base)
    for d, v in filt.items():
        assert v == base[d]  # filter contributes NO score


def test_fuzzy_scoring_boolean_equals_expanded_disjunction(idx):
    s, url2doc, _ = idx
    q = FuzzyQuery("aple", max_edits=2, rewrite_method="scoring_boolean")
    got = _scores(s.score_df(q))
    # expand the same way the engine does, then score as a SHOULD disjunction
    terms = [r["term"] for r in s._expand_terms(q).collect()]
    assert "apple" in terms and "apfel" in terms
    ref = _scores(
        s.score_df(BooleanQuery.build(should=[TermQuery(t) for t in terms]))
    )
    assert got == ref  # same docs, identical float32 scores


def test_top_terms_caps_expansion(idx):
    s, url2doc, _ = idx
    # max_expansions=1 -> only the closest term (fewest edits) scores
    q = FuzzyQuery("aple", max_edits=2, rewrite_method="top_terms_scoring", max_expansions=1)
    got = _scores(s.score_df(q))
    ref = _scores(s.score_df(TermQuery("apple")))  # 1 edit beats apfel's 2
    assert got == ref
    # prefix top_terms: highest-df term first
    qp = PrefixQuery("app", rewrite_method="top_terms_scoring", max_expansions=1)
    gp = _scores(s.score_df(qp))
    # apple df=3 (docs 0,2,4) > application df=1
    assert gp == _scores(s.score_df(TermQuery("apple")))


def test_multi_phrase_single_alts_equals_phrase(idx):
    s, _, _ = idx
    mp = _scores(s.score_df(MultiPhraseQuery(slots=(("apple",), ("store",)))))
    ph = _scores(s.score_df(PhraseQuery(("apple", "store"))))
    assert mp == ph and len(mp) > 0


def test_multi_phrase_alternatives_union(idx):
    s, url2doc, _ = idx
    q = MultiPhraseQuery(slots=(("apple", "application"), ("store",)))
    got = set(_scores(s.score_df(q)))
    # doc0 "apple store", doc1 "application store", doc4 "apple store"
    assert got == {url2doc["u://0"], url2doc["u://1"], url2doc["u://4"]}
    # slot with no indexed term -> empty
    assert s.count(MultiPhraseQuery(slots=(("zzzz",), ("store",)))) == 0


def test_multi_phrase_slop(idx):
    s, url2doc, _ = idx
    # "apple laptops" with a gap in doc0 ("apple store sells apple laptops"):
    # exact "(apple) (laptops)" matches at pos 3-4; slop lets pos 0 match too
    exact = _scores(s.score_df(MultiPhraseQuery(slots=(("apple",), ("laptops",)))))
    sloppy = _scores(s.score_df(MultiPhraseQuery(slots=(("apple",), ("laptops",)), slop=3)))
    assert url2doc["u://0"] in exact
    assert sloppy[url2doc["u://0"]] >= exact[url2doc["u://0"]]


def test_parser_multiphrase_alternatives(idx):
    from lucenenet_spark.query.parser import parse_query

    s, url2doc, _ = idx
    q = parse_query('"apple|application store"')
    assert q == MultiPhraseQuery(slots=(("apple", "application"), ("store",)))
    got = set(_scores(s.score_df(q)))
    assert got == {url2doc["u://0"], url2doc["u://1"], url2doc["u://4"]}
