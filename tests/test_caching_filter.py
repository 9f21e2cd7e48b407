"""CachingWrapperFilter (Search/CachingWrapperFilter.cs:42 analogue): a
wrapped filter's docid set is computed once per Searcher, persisted, and
reused across queries — without changing any result."""

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.data.pages import pages_spark_df
from lucenenet_spark.index import IndexConfig, build_index
from lucenenet_spark.query.ast import (
    CachingWrapperFilter,
    FilteredQuery,
    NumericRangeQuery,
    TermQuery,
    rewrite,
)
from lucenenet_spark.query.engine import Searcher

CFG = IndexConfig(num_partitions=4, bucket_width=2, flush_docs=64)


@pytest.fixture(scope="module")
def searcher(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cachef") / "idx")
    build_index(spark, pages_spark_df(spark, 200, seed=9), out, CFG, overwrite=True)
    return Searcher(spark, out)


def _rng():
    return NumericRangeQuery("doclen", 10, 60)


def test_results_identical_with_and_without_cache(searcher):
    plain = FilteredQuery(TermQuery("data"), _rng())
    cached = FilteredQuery(TermQuery("data"), CachingWrapperFilter(_rng()))
    p = {(r["docid"], round(r["score"], 4)) for r in searcher.score_df(plain).collect()}
    c = {(r["docid"], round(r["score"], 4)) for r in searcher.score_df(cached).collect()}
    assert p == c and len(p) > 0


def test_docid_set_persisted_and_shared(searcher):
    searcher._filter_cache.clear()
    f1 = CachingWrapperFilter(_rng())
    d1 = searcher._filter_docids(f1, {})
    assert d1.storageLevel.useMemory or d1.storageLevel.useDisk
    # a STRUCTURALLY equal filter built separately hits the same entry
    f2 = CachingWrapperFilter(NumericRangeQuery("doclen", 10, 60))
    d2 = searcher._filter_docids(f2, {})
    assert d2 is d1
    assert len(searcher._filter_cache) == 1
    # a different range is a different entry
    searcher._filter_docids(CachingWrapperFilter(NumericRangeQuery("doclen", 5, 9)), {})
    assert len(searcher._filter_cache) == 2


def test_scored_query_as_cached_filter(searcher):
    """Any Query can be the wrapped filter (its scores are dropped)."""
    plain = FilteredQuery(TermQuery("data"), TermQuery("search"))
    cached = FilteredQuery(TermQuery("data"), CachingWrapperFilter(TermQuery("search")))
    p = {r["docid"] for r in searcher.score_df(plain).collect()}
    c = {r["docid"] for r in searcher.score_df(cached).collect()}
    assert p == c


def test_top_level_cached_filter_is_constant_score(searcher):
    rows = searcher.score_df(CachingWrapperFilter(_rng())).collect()
    assert len(rows) > 0
    assert {round(r["score"], 6) for r in rows} == {1.0}


def test_rewrite_recurses_into_wrapper():
    from lucenenet_spark.query.ast import BooleanClause, BooleanQuery, Occur

    inner = BooleanQuery(
        (BooleanClause(TermQuery("x"), Occur.MUST),), 0, 1.0
    )  # 1-clause boolean: rewrites to its inner term
    r = rewrite(CachingWrapperFilter(inner))
    assert r == CachingWrapperFilter(TermQuery("x"))


def test_cache_built_under_prune_is_complete(searcher):
    """A cached filter first materialized while self.postings is swapped to
    a block-pruned view must still hold the FULL docid set (the set is
    built against the searcher's unpruned base postings)."""
    searcher._filter_cache.clear()
    f = CachingWrapperFilter(TermQuery("search"))
    full = {r["docid"] for r in searcher._score(rewrite(TermQuery("search")),
            searcher.term_stats(["search"])).collect()}
    assert len(full) > 1
    lo = sorted(full)[0]
    # simulate the index-sort probe: prune postings to blocks covering only
    # the smallest matching docid, then build the cache inside the swap
    saved = searcher.postings
    searcher.postings = saved.filter(F.col("first_docid") <= lo).filter(
        F.col("last_docid") >= lo
    )
    try:
        cached = searcher._filter_docids(f, searcher.term_stats(["search"]))
    finally:
        searcher.postings = saved
    got = {r["docid"] for r in cached.collect()}
    assert got == full  # complete despite being materialized under a prune
