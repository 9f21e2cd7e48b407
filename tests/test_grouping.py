"""Two-pass grouped search (Grouping/GroupingSearch.cs:38 analogue):
Searcher.group_search vs a pandas recomputation from the same match set."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucenenet_spark.data.pages import pages_spark_df
from lucenenet_spark.index import IndexConfig, build_index
from lucenenet_spark.query.ast import TermQuery
from lucenenet_spark.query.engine import Searcher

CFG = IndexConfig(num_partitions=4, bucket_width=2, flush_docs=64)


@pytest.fixture(scope="module")
def searcher(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("grp") / "idx")
    build_index(spark, pages_spark_df(spark, 300, seed=21), out, CFG, overwrite=True)
    return Searcher(spark, out)


def _expected(searcher, q, bucket, n_groups, docs_per_group):
    scored = searcher.score_df(q).join(
        searcher.docmap.select("docid", "doclen"), "docid"
    ).toPandas()
    scored["group"] = scored["doclen"] // bucket
    scored = scored.sort_values(
        ["group", "score", "docid"], ascending=[True, False, True]
    )
    scored["doc_rank"] = scored.groupby("group").cumcount() + 1
    scored = scored[scored.doc_rank <= docs_per_group]
    heads = (
        scored[scored.doc_rank == 1][["group", "score"]]
        .rename(columns={"score": "top"})
        .sort_values(["top", "group"], ascending=[False, True])
        .head(n_groups)
        .reset_index(drop=True)
    )
    heads["group_rank"] = heads.index + 1
    out = scored.merge(heads[["group", "group_rank"]], on="group")
    return {
        (int(r.group), int(r.group_rank), int(r.docid), round(float(r.score), 4), int(r.doc_rank))
        for r in out.itertuples()
    }


@pytest.mark.parametrize("n_groups,per_group", [(3, 2), (5, 3), (100, 1)])
def test_group_search_matches_pandas(searcher, n_groups, per_group):
    q = TermQuery("data")
    got = searcher.group_search(
        q, (F.col("doclen") / F.lit(10)).cast("long"), n_groups, per_group
    )
    g = {
        (int(r["group"]), int(r["group_rank"]), int(r["docid"]),
         round(float(r["score"]), 4), int(r["doc_rank"]))
        for r in got.collect()
    }
    assert g == _expected(searcher, q, 10, n_groups, per_group)
    assert len(g) > 0


def test_group_count(searcher):
    """AllGroupsCollector analogue: distinct group values of the match set."""
    got = searcher.group_count(TermQuery("data"), (F.col("doclen") / F.lit(10)).cast("long"))
    scored = searcher.score_df(TermQuery("data")).join(
        searcher.docmap.select("docid", "doclen"), "docid"
    ).toPandas()
    assert got == (scored["doclen"] // 10).nunique()
    assert got > 0


def test_group_search_accepts_column_name(searcher):
    got = searcher.group_search(TermQuery("data"), "doclen", 2, 1).collect()
    assert len(got) == 2
    assert {r["doc_rank"] for r in got} == {1}
    assert {r["group_rank"] for r in got} == {1, 2}
