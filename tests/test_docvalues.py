"""Doc-values metadata columns (Index/DocValues.cs analogue).

``IndexConfig.docvalue_fields`` carries chosen input columns (here: a
``warc_ts`` timestamp and a ``lang`` string) through the 'd' partial rows
into the docid-sorted docmap, where:

- NumericRangeQuery("warc_ts", lo, hi) compiles to a PUSHED-DOWN Parquet
  predicate on the docmap scan (NumericRangeQuery.cs:97-166 trie ranges ->
  footer min/max skipping),
- Searcher.search_sorted orders by the column (Sort.cs:100-112),
- the columns survive append (delta generations) and delete-applying
  compaction.
"""

import datetime
import re

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.data.pages import pages_spark_df
from lucenenet_spark.index import (
    IndexConfig,
    build_index,
    compact_index,
    delete_docs,
)
from lucenenet_spark.index.builder import append_index
from lucenenet_spark.query.ast import (
    FilteredQuery,
    NumericRangeQuery,
    TermQuery,
)
from lucenenet_spark.query.engine import Searcher

CFG = IndexConfig(
    num_partitions=4, bucket_width=2, flush_docs=64,
    docvalue_fields=("warc_ts", "lang"),
)

EPOCH_2020 = 1577836800


def _pages(spark, n, seed):
    """Deterministic warc_ts (minutes-from-2020 keyed on url hash) + lang."""
    return (
        pages_spark_df(spark, n, seed=seed)
        .withColumn(
            "warc_ts",
            F.timestamp_seconds(
                F.lit(EPOCH_2020) + F.pmod(F.hash("url"), F.lit(86400)) * F.lit(60)
            ),
        )
        .withColumn(
            "lang", F.when(F.pmod(F.hash("url"), F.lit(3)) == 0, "de").otherwise("en")
        )
    )


@pytest.fixture(scope="module")
def dvidx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("dv") / "idx")
    build_index(spark, _pages(spark, 150, seed=5), out, CFG, overwrite=True)
    return out


def test_docmap_carries_docvalues(spark, dvidx):
    s = Searcher(spark, dvidx)
    cols = dict(s.docmap.dtypes)
    assert cols.get("warc_ts") == "timestamp"
    assert cols.get("lang") == "string"
    assert s.docmap.filter(F.col("warc_ts").isNull()).count() == 0


def test_ts_range_filter_matches_and_pushes_down(spark, dvidx):
    s = Searcher(spark, dvidx)
    lo = datetime.datetime(2020, 1, 10)
    hi = datetime.datetime(2020, 2, 5)
    unfiltered = {r.docid for r in s.score_df(TermQuery("heart")).collect()}
    q = FilteredQuery(TermQuery("heart"), NumericRangeQuery("warc_ts", lo, hi))
    hits = s.score_df(q).join(s.docmap.select("docid", "warc_ts"), "docid").collect()
    in_range = {
        r.docid for r in s.docmap.filter(
            (F.col("warc_ts") >= lo) & (F.col("warc_ts") <= hi)
        ).collect()
    }
    assert {r.docid for r in hits} == unfiltered & in_range
    assert all(lo <= r.warc_ts <= hi for r in hits)

    # the range must reach the Parquet scan as PushedFilters
    plan = (
        s.docmap.filter((F.col("warc_ts") >= lo) & (F.col("warc_ts") <= hi))
        ._jdf.queryExecution().executedPlan().toString()
    )
    pushed = re.search(r"PushedFilters: \[[^\]]*", plan).group(0)
    assert "GreaterThanOrEqual(warc_ts" in pushed
    assert "LessThanOrEqual(warc_ts" in pushed


def test_sort_by_docvalue(spark, dvidx):
    s = Searcher(spark, dvidx)
    rows = s.search_sorted(
        TermQuery("tiger"), [F.desc("warc_ts"), F.asc("docid")], k=10
    ).select("docid", "warc_ts").collect()
    assert len(rows) > 1
    ts = [r.warc_ts for r in rows]
    assert ts == sorted(ts, reverse=True)


def test_docvalues_survive_append_and_compaction(spark, tmp_path):
    out = str(tmp_path / "idx")
    build_index(spark, _pages(spark, 100, seed=11), out, CFG, overwrite=True)
    extra = _pages(spark, 40, seed=12).withColumn(
        "url", F.concat(F.lit("g1-"), F.col("url"))
    )
    append_index(spark, extra, out, CFG)
    s = Searcher(spark, out)
    total = s.docmap.count()
    assert s.docmap.filter(F.col("warc_ts").isNull()).count() == 0

    # delete a few docs, compact, and check the dv columns are still there
    victims = [r.docid for r in s.docmap.limit(5).collect()]
    delete_docs(spark, out, victims)
    compact_index(spark, out, CFG)
    s2 = Searcher(spark, out)
    assert s2.docmap.count() == total - 5
    cols = dict(s2.docmap.dtypes)
    assert cols.get("warc_ts") == "timestamp" and cols.get("lang") == "string"
    assert s2.docmap.filter(F.col("warc_ts").isNull()).count() == 0


def test_docvalue_field_collision_raises(spark, tmp_path):
    bad = IndexConfig(num_partitions=2, docvalue_fields=("doclen",))
    with pytest.raises(ValueError, match="collides"):
        build_index(
            spark, _pages(spark, 10, seed=1), str(tmp_path / "bad"), bad,
            overwrite=True,
        )
