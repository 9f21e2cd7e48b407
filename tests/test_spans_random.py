"""Randomized differential for the span algebra: the Spark engine and the
numpy oracle must produce identical match sets and bit-equal float32
scores over GENERATED span queries — flat, union-clause, and nested —
on one shared index. Complements test_engine.py's fixed battery by
sweeping shapes nobody hand-picked (seeded, deterministic)."""

import random

import numpy as np
import pytest

from lucenenet_spark.data.pages import pages_spark_df
from lucenenet_spark.index import IndexConfig, build_index
from lucenenet_spark.query.ast import SpanNearQuery, SpanOrQuery
from lucenenet_spark.query.engine import Searcher
from lucenenet_spark.scoring.oracle import OracleIndex

VOCAB = [
    "tiger", "burning", "bright", "forest", "night", "heart", "human",
    "fearful", "symmetry", "data", "search", "index", "query", "engine",
]


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idxr"))
    pages = pages_spark_df(spark, 300, seed=11)
    build_index(
        spark, pages, out,
        IndexConfig(num_partitions=8, bucket_width=2, flush_docs=64),
        overwrite=True,
    )
    from lucenenet_spark.index.storage import IndexStorage

    dm = IndexStorage(out).read_stage(spark, "docmap").select("docid", "url").toPandas()
    url2docid = dict(zip(dm["url"], dm["docid"]))
    pdf = pages.select("url", "text").toPandas()
    oracle = OracleIndex([(url2docid[u], t) for u, t in zip(pdf["url"], pdf["text"])])
    return Searcher(spark, out), oracle


def _rand_unit_clause(rng):
    if rng.random() < 0.3:
        k = rng.randint(2, 3)
        return SpanOrQuery(tuple(rng.sample(VOCAB, k)))
    return rng.choice(VOCAB)


def _rand_span(rng, depth):
    n = rng.randint(2, 3)
    clauses = []
    for _ in range(n):
        if depth > 0 and rng.random() < 0.4:
            clauses.append(_rand_span(rng, depth - 1))
        else:
            clauses.append(_rand_unit_clause(rng))
    # r5: unordered OUTER nesting is supported too — sample both modes
    # regardless of nested clauses
    in_order = rng.random() < 0.7
    return SpanNearQuery(
        tuple(clauses), slop=rng.randint(0, 6), in_order=in_order
    )


@pytest.mark.parametrize("seed", range(18))
def test_random_span_rank_identity(corpus, seed):
    searcher, oracle = corpus
    rng = random.Random(1000 + seed)
    q = _rand_span(rng, depth=2)
    got = [
        (int(r["docid"]), np.float32(r["score"]))
        for r in searcher.search(q, k=10).collect()
    ]
    want = oracle.search(q, k=10)
    assert [d for d, _ in got] == [d for d, _ in want], f"docids differ for {q}"
    for (dg, sg), (_dw, sw) in zip(got, want):
        assert sg == sw, f"score mismatch for {q} doc {dg}: {sg!r} != {sw!r}"


# r5: ComplexPhrase lowerings (SpanMultiTermWrapper clauses) through the
# REAL index vs the oracle — the wrapper expands against each engine's own
# term dictionary, which is the same dictionary by construction
COMPLEX_QS = [
    '"(table row) val*"~3',
    '"spark merg?"~2',
    '"(data column) quer*"~4',
    '"table valux~1"~3',
    '"va* (row line)"~2',
]


@pytest.mark.parametrize("qs", COMPLEX_QS)
def test_complex_phrase_rank_identity(corpus, qs):
    from lucenenet_spark.query.parser import parse_query

    searcher, oracle = corpus
    q = parse_query(qs, dialect="complex_phrase")
    got = [
        (int(r["docid"]), np.float32(r["score"]))
        for r in searcher.search(q, k=10).collect()
    ]
    want = oracle.search(q, k=10)
    assert [d for d, _ in got] == [d for d, _ in want], f"docids differ for {qs}"
    for (dg, sg), (_dw, sw) in zip(got, want):
        assert sg == sw, f"score mismatch for {qs} doc {dg}: {sg!r} != {sw!r}"
