"""Index-time sort (IndexWriterConfig index sort / SortingMergePolicy —
Lucene.Net.Misc/Index/Sorter/SortingMergePolicy.cs:44 analogue).

``IndexConfig.sort_field`` assigns docids in GLOBAL (sort_field, url)
order, so docid order == sort-key order. Contracts under test:

- docids are dense 0..n-1 and the docmap's sort column is monotonically
  non-decreasing in docid order (ties broken by url);
- a FilteredQuery whose filter is a NumericRangeQuery on the sort field
  returns EXACTLY the results an unsorted index returns for the same
  corpus/query (pruning is a pure optimization), compared by (url, score);
- the block pruning actually engages: _docid_bounds_for_filter yields a
  finite [lo, hi] interval, and (None, None) for an empty range, which
  short-circuits to zero rows;
- append_index on a sorted index is rejected (a delta's docids would
  break global monotonicity);
- the search path stays correct for queries that DON'T touch the sort
  field (bounds helper returns None, nothing is pruned).
"""

import datetime

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.data.pages import pages_spark_df
from lucenenet_spark.index import IndexConfig, build_index
from lucenenet_spark.index.builder import append_index, assign_sorted_docids
from lucenenet_spark.query.ast import (
    FilteredQuery,
    NumericRangeQuery,
    TermQuery,
)
from lucenenet_spark.query.engine import Searcher

EPOCH_2020 = 1577836800

SORTED_CFG = IndexConfig(
    num_partitions=4, bucket_width=2, flush_docs=64,
    docvalue_fields=("warc_ts",), sort_field="warc_ts",
)
PLAIN_CFG = IndexConfig(
    num_partitions=4, bucket_width=2, flush_docs=64,
    docvalue_fields=("warc_ts",),
)


def _pages(spark, n, seed):
    """warc_ts as a pure function of url hash — deterministic, with
    repeated values (minute granularity over one day) so equal-key ties
    exercise the (sort_key, url) tie-break."""
    return pages_spark_df(spark, n, seed=seed).withColumn(
        "warc_ts",
        F.timestamp_seconds(
            F.lit(EPOCH_2020) + F.pmod(F.hash("url"), F.lit(1440)) * F.lit(60)
        ),
    )


@pytest.fixture(scope="module")
def indexes(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("sortidx")
    sorted_dir, plain_dir = str(root / "sorted"), str(root / "plain")
    pages = _pages(spark, 300, seed=11)
    build_index(spark, pages, sorted_dir, SORTED_CFG, overwrite=True)
    build_index(spark, pages, plain_dir, PLAIN_CFG, overwrite=True)
    return sorted_dir, plain_dir


def test_docids_dense_and_sorted(spark, indexes):
    sorted_dir, _ = indexes
    s = Searcher(spark, sorted_dir)
    rows = (
        s.docmap.select("docid", "warc_ts", "url")
        .orderBy("docid")
        .collect()
    )
    assert [r["docid"] for r in rows] == list(range(len(rows)))
    keys = [(r["warc_ts"], r["url"]) for r in rows]
    assert keys == sorted(keys)


def test_searcher_detects_sort_field(spark, indexes):
    sorted_dir, plain_dir = indexes
    assert Searcher(spark, sorted_dir).sort_field == "warc_ts"
    assert Searcher(spark, plain_dir).sort_field is None


def _range_q(lo_min, hi_min, term="data"):
    lo = datetime.datetime.fromtimestamp(
        EPOCH_2020 + lo_min * 60, datetime.timezone.utc
    )
    hi = datetime.datetime.fromtimestamp(
        EPOCH_2020 + hi_min * 60, datetime.timezone.utc
    )
    return FilteredQuery(
        TermQuery(term),
        NumericRangeQuery("warc_ts", lo, hi, include_upper=False),
    )


@pytest.mark.parametrize("lo_min,hi_min", [(0, 1440), (200, 700), (0, 60)])
def test_filtered_range_matches_unsorted(spark, indexes, lo_min, hi_min):
    sorted_dir, plain_dir = indexes
    q = _range_q(lo_min, hi_min)
    got = Searcher(spark, sorted_dir).score_df(q)
    want = Searcher(spark, plain_dir).score_df(q)
    s_dm = Searcher(spark, sorted_dir).docmap.select("docid", "url")
    p_dm = Searcher(spark, plain_dir).docmap.select("docid", "url")
    got_pairs = {
        (r["url"], round(r["score"], 4))
        for r in got.join(s_dm, "docid").collect()
    }
    want_pairs = {
        (r["url"], round(r["score"], 4))
        for r in want.join(p_dm, "docid").collect()
    }
    assert got_pairs == want_pairs
    assert len(got_pairs) > 0


def test_bounds_helper(spark, indexes):
    sorted_dir, plain_dir = indexes
    s = Searcher(spark, sorted_dir)
    q = _range_q(200, 700)
    b = s._docid_bounds_for_filter(q.filter)
    assert b is not None
    lo, hi = b
    assert 0 <= lo <= hi
    n = s.docmap.count()
    # a sub-day range must exclude some docids on at least one side
    assert (hi - lo + 1) < n
    # unsorted index / non-sort-field filters: no bounds
    assert Searcher(spark, plain_dir)._docid_bounds_for_filter(q.filter) is None
    assert s._docid_bounds_for_filter(
        NumericRangeQuery("doclen", 1, 50)
    ) is None
    assert s._docid_bounds_for_filter(TermQuery("data")) is None


def test_empty_range_short_circuits(spark, indexes):
    sorted_dir, _ = indexes
    s = Searcher(spark, sorted_dir)
    q = _range_q(100000, 100001)  # past every generated timestamp
    assert s._docid_bounds_for_filter(q.filter) == (None, None)
    assert s.score_df(q).count() == 0


def test_append_rejected_on_sorted_index(spark, indexes):
    sorted_dir, _ = indexes
    with pytest.raises(ValueError, match="sort_field"):
        append_index(spark, _pages(spark, 40, seed=12), sorted_dir)


def test_assign_sorted_docids_dense_rank(spark):
    pages = _pages(spark, 120, seed=3)
    n = pages.count()  # the generator may round n up to a partition multiple
    out = assign_sorted_docids(pages, "warc_ts", num_partitions=4, docid_base=7)
    rows = out.select("docid", "warc_ts", "url").orderBy("docid").collect()
    assert [r["docid"] for r in rows] == list(range(7, 7 + n))
    keys = [(r["warc_ts"], r["url"]) for r in rows]
    assert keys == sorted(keys)


def test_assign_sorted_docids_rejects_null_keys(spark):
    """NULL sort keys would land in a NULL bucket and produce NULL docids
    (silent corruption); the build must fail loudly instead."""
    from pyspark.sql import functions as F

    pages = _pages(spark, 60, seed=3).withColumn(
        "warc_ts",
        F.when(F.col("url").endswith("1"), F.lit(None)).otherwise(F.col("warc_ts")),
    )
    with pytest.raises(ValueError, match="NULL"):
        assign_sorted_docids(pages, "warc_ts", num_partitions=4).collect()


@pytest.mark.parametrize("descending", [False, True])
@pytest.mark.parametrize("term", ["data", "w00042", "nonexistent_term_xyz"])
def test_early_terminating_sort_matches_full(spark, indexes, descending, term):
    """search_by_index_sort (EarlyTerminatingSortingCollector analogue)
    must equal the full-scan search_sorted for common, rare (multi-probe
    widening), and no-match queries, both directions, on a tie-heavy key
    (300 docs over 1440 minute slots)."""
    sorted_dir, _ = indexes
    s = Searcher(spark, sorted_dir)
    k = 10
    order = [
        F.desc("warc_ts") if descending else F.asc("warc_ts"),
        F.asc("docid"),
    ]
    got = s.search_by_index_sort(TermQuery(term), k, descending=descending)
    want = s.search_sorted(TermQuery(term), order, k).select(
        "docid", "score", "warc_ts"
    )
    g = [(r["docid"], round(r["score"], 4), r["warc_ts"]) for r in got.collect()]
    w = [(r["docid"], round(r["score"], 4), r["warc_ts"]) for r in want.collect()]
    assert g == w


def test_early_terminating_sort_small_first_probe(spark, indexes):
    """The first probe must already satisfy k=1 for a common term — the
    early-termination payoff: the probe interval stays at its initial
    size, far below the corpus size at scale."""
    sorted_dir, _ = indexes
    s = Searcher(spark, sorted_dir)
    rows = s.search_by_index_sort(TermQuery("data"), 1).collect()
    assert len(rows) == 1


def test_early_terminating_requires_sorted_index(spark, indexes):
    _, plain_dir = indexes
    with pytest.raises(ValueError, match="sort_field"):
        Searcher(spark, plain_dir).search_by_index_sort(TermQuery("data"), 5)


def test_search_after_on_index_sort(spark, indexes):
    """SearchAfter over the index sort: page 2 via the last docid cursor
    equals rows k+1..2k of the single-call top-2k — and deep pages probe
    from the cursor, not from docid 0."""
    sorted_dir, _ = indexes
    s = Searcher(spark, sorted_dir)
    q = TermQuery("data")
    all10 = [
        (r["docid"], round(r["score"], 4))
        for r in s.search_by_index_sort(q, 10).collect()
    ]
    page1 = s.search_by_index_sort(q, 5).collect()
    cursor = page1[-1]["docid"]
    page2 = [
        (r["docid"], round(r["score"], 4))
        for r in s.search_by_index_sort(q, 5, after_docid=cursor).collect()
    ]
    assert [(r["docid"], round(r["score"], 4)) for r in page1] == all10[:5]
    assert page2 == all10[5:]


def test_search_after_descending_rejected(spark, indexes):
    sorted_dir, _ = indexes
    with pytest.raises(ValueError, match="ascending-only"):
        Searcher(spark, sorted_dir).search_by_index_sort(
            TermQuery("data"), 5, descending=True, after_docid=3
        )


def test_checkindex_verifies_sort_invariant(spark, indexes):
    from lucenenet_spark.index import checkindex

    sorted_dir, plain_dir = indexes
    res = checkindex.verify(spark, sorted_dir)
    assert res["docids_follow_index_sort"] is True
    assert res["ok"]
    assert "docids_follow_index_sort" not in checkindex.verify(spark, plain_dir)


def test_fingerprint_stable_without_sort_field(spark):
    """Indexes committed before sort_field existed must keep their
    fingerprint: the default (None) is dropped from the hash input."""
    base = IndexConfig(num_partitions=4)
    import dataclasses

    with_field = dataclasses.replace(base, sort_field=None)
    assert base.fingerprint() == with_field.fingerprint()
    assert dataclasses.replace(
        base, sort_field="warc_ts"
    ).fingerprint() != base.fingerprint()
