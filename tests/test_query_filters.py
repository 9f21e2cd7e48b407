"""Query-time filter pack: TermsFilter (Queries/TermsFilter.cs:37) and
DuplicateFilter (Sandbox/Queries/DuplicateFilter.cs:33) analogues, used as
the non-scoring side of FilteredQuery."""

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.data.pages import pages_spark_df
from lucenenet_spark.index import IndexConfig, build_index
from lucenenet_spark.query.ast import (
    CachingWrapperFilter,
    DuplicateFilter,
    FilteredQuery,
    TermQuery,
    TermsFilter,
)
from lucenenet_spark.query.engine import Searcher

CFG = IndexConfig(
    num_partitions=4, bucket_width=2, flush_docs=64,
    keyword_fields=("lang",), docvalue_fields=("lang",),
)


def _pages(spark, n, seed):
    return pages_spark_df(spark, n, seed=seed).withColumn(
        "lang",
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("es")),
            (F.pmod(F.hash("url"), F.lit(4)) + 1).cast("int"),
        ),
    )


@pytest.fixture(scope="module")
def searcher(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("qf") / "idx")
    build_index(spark, _pages(spark, 250, seed=13), out, CFG, overwrite=True)
    return Searcher(spark, out)


def test_terms_filter_is_keyword_union(searcher):
    q = FilteredQuery(
        TermQuery("data"),
        TermsFilter((("lang", "de"), ("lang", "fr"))),
    )
    got = searcher.score_df(q).join(searcher.docmap, "docid")
    langs = {r["lang"] for r in got.collect()}
    assert langs and langs <= {"de", "fr"}
    # same docs as filtering the unfiltered match set by the docmap column
    want = {
        r["docid"]
        for r in searcher.score_df(TermQuery("data"))
        .join(searcher.docmap, "docid")
        .filter(F.col("lang").isin("de", "fr"))
        .collect()
    }
    assert {r["docid"] for r in got.collect()} == want


def test_terms_filter_scores_unchanged(searcher):
    """The filter side contributes no score: scores equal the unfiltered
    query's scores for the surviving docids."""
    base = {
        r["docid"]: round(r["score"], 4)
        for r in searcher.score_df(TermQuery("data")).collect()
    }
    q = FilteredQuery(TermQuery("data"), TermsFilter((("lang", "en"),)))
    for r in searcher.score_df(q).collect():
        assert round(r["score"], 4) == base[r["docid"]]


def test_terms_filter_unknown_term_empty(searcher):
    q = FilteredQuery(TermQuery("data"), TermsFilter((("lang", "zz"),)))
    assert searcher.score_df(q).count() == 0


@pytest.mark.parametrize("keep", ["first", "last"])
def test_duplicate_filter_keeps_one_per_value(searcher, keep):
    dup = DuplicateFilter("lang", keep=keep)
    kept = searcher._filter_docids(dup, {})
    rows = kept.join(searcher.docmap, "docid").select("docid", "lang").collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["docid"])
    assert all(len(v) == 1 for v in by_lang.values())
    # the survivor is the extreme docid of its value group
    dm = {r["lang"]: r for r in (
        searcher.docmap.groupBy("lang")
        .agg(F.min("docid").alias("lo"), F.max("docid").alias("hi"))
        .collect()
    )}
    for lang, (d,) in by_lang.items():
        assert d == (dm[lang]["lo"] if keep == "first" else dm[lang]["hi"])


def test_duplicate_filter_in_filtered_query(searcher):
    q = FilteredQuery(TermQuery("data"), DuplicateFilter("lang"))
    got = searcher.score_df(q).join(searcher.docmap, "docid").collect()
    # at most one match per lang survives, with its original score
    langs = [r["lang"] for r in got]
    assert len(langs) == len(set(langs))


def test_terms_filter_cacheable(searcher):
    searcher._filter_cache.clear()
    f = CachingWrapperFilter(TermsFilter((("lang", "de"),)))
    d1 = searcher._filter_docids(f, searcher.term_stats(["lang:de"]))
    d2 = searcher._filter_docids(
        CachingWrapperFilter(TermsFilter((("lang", "de"),))), {}
    )
    assert d2 is d1
