"""Multi-field indexing: keyword fields (StringField.cs:43 analogue) indexed
as namespaced "<field>:<value>" postings, field-qualified queries, parser
``field:`` syntax, and non-interference with the text field."""

import numpy as np
import pytest

from lucenenet_spark.index import IndexConfig, build_index
from lucenenet_spark.index.checkindex import verify
from lucenenet_spark.query.ast import BooleanQuery, PrefixQuery, TermQuery
from lucenenet_spark.query.engine import Searcher
from lucenenet_spark.query.parser import parse_query

DOCS = [
    ("u://0", "spark merges posting lists", "en", "web"),
    ("u://1", "spark scores documents with bm25", "en", "web"),
    ("u://2", "duckdb verifies the oracle", "fr", "web"),
    ("u://3", "numpy kernels invert tokens", "fr", "book"),
    ("u://4", "arrow batches stream rows", None, "book"),  # null lang
]

CFG = IndexConfig(
    num_partitions=2, flush_docs=64, stop_filter=False,
    keyword_fields=("lang", "source"),
)


@pytest.fixture(scope="module")
def kw_index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("kwidx"))
    pages = spark.createDataFrame(
        DOCS, "url string, text string, lang string, source string"
    )
    build_index(spark, pages, out, CFG, overwrite=True)
    searcher = Searcher(spark, out)
    dm = searcher.docmap.select("docid", "url").toPandas()
    url2doc = dict(zip(dm["url"], dm["docid"]))
    return searcher, url2doc


def test_keyword_term_matches_and_scores_idf(kw_index):
    s, url2doc = kw_index
    rows = s.score_df(TermQuery("en", field="lang")).collect()
    got = {r["docid"] for r in rows}
    assert got == {url2doc["u://0"], url2doc["u://1"]}
    # norms omitted: score == float32 idf of the keyword term (df=2, N=5)
    import math

    idf = np.float32(math.log(1.0 + (5 - 2 + 0.5) / (2 + 0.5)))
    for r in rows:
        assert np.float32(r["score"]) == idf
    # null keyword value is simply not indexed
    assert s.count(TermQuery("None", field="lang")) == 0


def test_mixed_text_and_keyword_conjunction(kw_index):
    s, url2doc = kw_index
    q = BooleanQuery.build(
        must=[TermQuery("spark"), TermQuery("web", field="source")]
    )
    got = {r["docid"] for r in s.score_df(q).collect()}
    assert got == {url2doc["u://0"], url2doc["u://1"]}
    # keyword constraint excludes the text match in the other source
    q2 = BooleanQuery.build(
        must=[TermQuery("numpy"), TermQuery("web", field="source")]
    )
    assert s.count(q2) == 0


def test_keyword_prefix_and_text_isolation(kw_index):
    s, url2doc = kw_index
    # keyword prefix scan stays inside the field namespace
    got = {r["docid"] for r in s.score_df(PrefixQuery("b", field="source")).collect()}
    assert got == {url2doc["u://3"], url2doc["u://4"]}
    # text-field scans never leak keyword keys: every doc has source:*,
    # but text prefix "s" must match only text terms (spark/scores/stream)
    text_hits = {r["docid"] for r in s.score_df(PrefixQuery("s")).collect()}
    assert url2doc["u://2"] not in text_hits  # 'duckdb verifies the oracle'
    # suggest/spell exclude the keyword namespace
    assert all(":" not in r["term"] for r in s.suggest("w", 10).collect())


def test_parser_field_syntax(kw_index):
    s, url2doc = kw_index
    q = parse_query("+spark +lang:en")
    got = {r["docid"] for r in s.score_df(q).collect()}
    assert got == {url2doc["u://0"], url2doc["u://1"]}
    q2 = parse_query("source:b*")
    got2 = {r["docid"] for r in s.score_df(q2).collect()}
    assert got2 == {url2doc["u://3"], url2doc["u://4"]}
    # explicit default field falls back to analyzed text
    q3 = parse_query("text:spark")
    assert q3 == TermQuery("spark")


def test_checkindex_with_keyword_fields(kw_index, spark):
    s, _ = kw_index
    # invariants hold with keyword postings present (sum-freq accounting)
    res = verify(spark, s.index_dir)
    assert res["ok"], res


def test_explain_keyword(kw_index):
    s, url2doc = kw_index
    ex = s.explain(TermQuery("en", field="lang"), url2doc["u://0"])
    assert ex["value"] > 0
    assert "keyword" in ex["description"] or "lang" in ex["description"]
    ex0 = s.explain(TermQuery("en", field="lang"), url2doc["u://2"])
    assert ex0["value"] == 0.0
