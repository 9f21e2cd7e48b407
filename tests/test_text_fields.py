"""Multi-field analyzed text (Document/TextField.cs:38 + FieldInfos
per-field norms; the MultiFieldQueryParser target shape):
``IndexConfig.text_fields`` indexes extra columns through the SAME chain
under "<field>:<term>" keys with the FIELD'S OWN doclen/norm bytes, and
TermQuery(field=...) scores BM25 with that field's avgdl."""

import math
import re

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.data.pages import pages_spark_df
from lucenenet_spark.index import IndexConfig, build_index
from lucenenet_spark.query.ast import BooleanQuery, TermQuery
from lucenenet_spark.query.engine import Searcher

CFG = IndexConfig(
    num_partitions=4, bucket_width=2, flush_docs=64,
    stop_filter=False, ascii_tokens=True, text_fields=("title",),
)


def _pages(spark, n, seed):
    return pages_spark_df(spark, n, seed=seed).withColumn(
        "title", F.expr("substring(text, 1, 60)")
    )


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("mf") / "idx")
    pages = _pages(spark, 200, seed=7)
    build_index(spark, pages, out, CFG, overwrite=True)
    pdf = pages.select("url", "text", "title").toPandas()
    s = Searcher(spark, out, scoring="exact_int")
    dm = {r["url"]: r["docid"] for r in s.docmap.select("url", "docid").collect()}
    return s, pdf, dm


def _toks(text):
    return [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]


def _expected_title_scores(pdf, dm, term):
    """Pure-python BM25 over the TITLE field with integer micro-units —
    the same op order as the engine's exact_int kernel."""
    docs = {dm[r.url]: _toks(r.title) for r in pdf.itertuples()}
    n = len(docs)
    dls = {d: len(t) for d, t in docs.items()}
    sum_ttf = sum(dls.values())
    avgdl = sum_ttf / float(n)
    matches = {d: t.count(term) for d, t in docs.items() if term in t}
    df = len(matches)
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    out = {}
    for d, tf in matches.items():
        denom = float(tf) + 1.2 * (0.25 + (0.75 * dls[d]) / avgdl)
        out[d] = math.floor((idf * 2.2 * tf) / denom * 1e6 + 0.5)
    return out


@pytest.mark.parametrize("term", ["the", "data", "w00042"])
def test_title_term_scores_with_title_stats(built, term):
    s, pdf, dm = built
    got = {r["docid"]: r["score"] for r in s.score_df(TermQuery(term, field="title")).collect()}
    assert got == _expected_title_scores(pdf, dm, term)


def test_title_and_text_are_independent(built):
    s, pdf, dm = built
    title = {r["docid"] for r in s.score_df(TermQuery("data", field="title")).collect()}
    text = {r["docid"] for r in s.score_df(TermQuery("data")).collect()}
    # every title match's doc also contains the term in text (title is a
    # prefix of text), but not vice versa
    assert title and title < text


def test_mixed_field_boolean_sums(built):
    s, _, _ = built
    q = BooleanQuery.build(
        should=[TermQuery("data"), TermQuery("data", field="title")]
    )
    both = {r["docid"]: r["score"] for r in s.score_df(q).collect()}
    a = {r["docid"]: r["score"] for r in s.score_df(TermQuery("data")).collect()}
    b = {r["docid"]: r["score"] for r in s.score_df(TermQuery("data", field="title")).collect()}
    for d, sc in both.items():
        assert sc == a.get(d, 0) + b.get(d, 0)


def test_explain_title_term_value_equals_score(built):
    s, _, _ = built
    top = s.search(TermQuery("the", field="title"), 3).collect()
    for r in top:
        ex = s.explain(TermQuery("the", field="title"), r["docid"])
        assert ex["value"] == float(r["score"])
        assert "title:" in ex["description"]


def test_phrase_on_title_field(built):
    """PhraseQuery(field='title'): phrase occurrences counted in the TITLE
    positions, scored as a pseudo-term with the title's stats."""
    from lucenenet_spark.query.ast import PhraseQuery

    s, pdf, dm = built
    docs = {dm[r.url]: _toks(r.title) for r in pdf.itertuples()}
    n = len(docs)
    dls = {d: len(t) for d, t in docs.items()}
    avgdl = sum(dls.values()) / float(n)

    # find a phrase pair that occurs in at least one title
    pair = None
    for t in docs.values():
        if len(t) >= 2:
            pair = (t[0], t[1])
            break
    assert pair
    pfs = {
        d: sum(1 for i in range(len(t) - 1) if (t[i], t[i + 1]) == pair)
        for d, t in docs.items()
    }
    pfs = {d: c for d, c in pfs.items() if c}
    dfa = sum(1 for t in docs.values() if pair[0] in t)
    dfb = sum(1 for t in docs.values() if pair[1] in t)
    idf = math.log(1.0 + (n - dfa + 0.5) / (dfa + 0.5)) + math.log(
        1.0 + (n - dfb + 0.5) / (dfb + 0.5)
    )
    want = {
        d: math.floor(
            (idf * 2.2 * c) / (c + 1.2 * (0.25 + (0.75 * dls[d]) / avgdl)) * 1e6 + 0.5
        )
        for d, c in pfs.items()
    }
    got = {
        r["docid"]: r["score"]
        for r in s.score_df(PhraseQuery(pair, field="title")).collect()
    }
    assert got == want and len(got) > 0


def test_guards(spark):
    import dataclasses

    with pytest.raises(ValueError, match="keyword_field"):
        build_index(
            spark, _pages(spark, 10, seed=1), "/tmp/mf_guard2",
            dataclasses.replace(CFG, keyword_fields=("title",)), overwrite=True,
        )
    with pytest.raises(ValueError, match="not in input"):
        build_index(
            spark, pages_spark_df(spark, 10, seed=1), "/tmp/mf_guard3",
            CFG, overwrite=True,
        )


def test_checkindex_ok_on_multifield(spark, built):
    from lucenenet_spark.index import checkindex

    s, _, _ = built
    res = checkindex.verify(spark, s.index_dir)
    assert res["ok"], res


def _filter_chain_df(spark):
    rows = [
        ("u://0", "plain body words here", "running quickly café", "news"),
        ("u://1", "other body text rows", "runner naïve tables", "blogs"),
        ("u://2", "third body entry words", "unrelated title words", "news"),
    ]
    return spark.createDataFrame(
        rows, "url string, text string, title string, src string"
    )


def test_english_chain_stems_extra_text_fields(spark, tmp_path):
    """encode_terms applies the stemmer to the SUFFIX of text-field
    postings, so a stemmed query term (what analyze_query yields) matches
    — the TextField.cs:38 + PerFieldAnalyzerWrapper contract. Keyword
    postings stay verbatim."""
    import dataclasses

    out = str(tmp_path / "mf_en")
    cfg = dataclasses.replace(
        CFG, analyzer="english", keyword_fields=("src",),
    )
    build_index(spark, _filter_chain_df(spark), out, cfg, overwrite=True)
    s = Searcher(spark, out, scoring="exact_int")
    # query side: EnglishAnalyzer.analyze_query("running") -> ["run"]
    toks = s.analyzer.analyze_query("running")
    assert toks == ["run"]
    hits = {r["docid"] for r in s.score_df(TermQuery("run", field="title")).collect()}
    dm = {r["url"]: r["docid"] for r in s.docmap.select("url", "docid").collect()}
    assert hits == {dm["u://0"]}  # "running" -> "run" (Porter keeps "runner")
    # the raw surface form is NOT indexed (the suffix really was stemmed)
    assert s.score_df(TermQuery("running", field="title")).count() == 0
    # keyword postings are exempt from the suffix filter: verbatim value
    # ("news" would stem to "new" if the filter leaked into keywords)
    assert s.score_df(TermQuery("news", field="src")).count() == 2
    assert s.score_df(TermQuery("new", field="src")).count() == 0


def test_folding_chain_folds_extra_text_fields(spark, tmp_path):
    import dataclasses

    out = str(tmp_path / "mf_fold")
    cfg = dataclasses.replace(CFG, analyzer="ascii_folding", ascii_tokens=False)
    build_index(spark, _filter_chain_df(spark), out, cfg, overwrite=True)
    s = Searcher(spark, out, scoring="exact_int")
    assert s.analyzer.analyze_query("café") == ["cafe"]
    dm = {r["url"]: r["docid"] for r in s.docmap.select("url", "docid").collect()}
    hits = {r["docid"] for r in s.score_df(TermQuery("cafe", field="title")).collect()}
    assert hits == {dm["u://0"]}
    hits2 = {r["docid"] for r in s.score_df(TermQuery("naive", field="title")).collect()}
    assert hits2 == {dm["u://1"]}


def test_span_on_title_field(spark, built):
    """SpanNearQuery(field='title') seeks namespaced postings and scores
    with the title field's norms — match set equals the exact title phrase
    at slop 0, scores damped by SpanScorer's sloppyFreq."""
    from lucenenet_spark.query.ast import PhraseQuery, SpanNearQuery

    s, pdf, dm = built
    # find a term pair adjacent in at least one title
    pair = None
    for r in pdf.itertuples():
        t = _toks(r.title)
        if len(t) >= 2 and t[0] != t[1]:
            pair = (t[0], t[1])
            break
    assert pair
    span = {
        r["docid"]: r["score"]
        for r in s.score_df(
            SpanNearQuery(pair, slop=0, in_order=True, field="title")
        ).collect()
    }
    phrase = {
        r["docid"]: r["score"]
        for r in s.score_df(PhraseQuery(pair, field="title")).collect()
    }
    assert sorted(span) == sorted(phrase) and len(span) > 0
    assert all(span[d] < phrase[d] for d in span)  # 1/3 damping per match
    # field isolation: the default-field span of the same pair is computed
    # over BODY positions, not title positions
    body = {
        r["docid"]
        for r in s.score_df(SpanNearQuery(pair, slop=0, in_order=True)).collect()
    }
    body_pairs = {
        dm[r.url]
        for r in pdf.itertuples()
        if any(
            a == pair[0] and b == pair[1]
            for a, b in zip(_toks(r.text), _toks(r.text)[1:])
        )
    }
    assert body == body_pairs


def test_scored_prefix_rewrite_on_title_uses_field_norms(spark, built):
    """scoring_boolean MTQ on a text field scores the full BM25 kernel
    with the field's norms/avgdl (not the keyword norms-omitted path):
    verify against a pure-python per-term disjunction over titles."""
    from lucenenet_spark.query.ast import PrefixQuery

    s, pdf, dm = built
    docs = {dm[r.url]: _toks(r.title) for r in pdf.itertuples()}
    n = len(docs)
    dls = {d: len(t) for d, t in docs.items()}
    avgdl = sum(dls.values()) / float(n)
    want: dict[int, float] = {}
    terms = sorted({t for ts in docs.values() for t in ts if t.startswith("s")})
    for term in terms:
        matches = {d: ts.count(term) for d, ts in docs.items() if term in ts}
        df = len(matches)
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for d, tf in matches.items():
            denom = float(tf) + 1.2 * (0.25 + (0.75 * dls[d]) / avgdl)
            want[d] = want.get(d, 0.0) + math.floor(
                (idf * 2.2 * tf) / denom * 1e6 + 0.5
            )
    got = {
        r["docid"]: r["score"]
        for r in s.score_df(
            PrefixQuery("s", field="title", rewrite_method="scoring_boolean")
        ).collect()
    }
    assert got == want and len(got) > 0


def test_parser_text_field_phrase_end_to_end(built):
    """parse_query(text_fields=searcher.text_fields): title:"a b" parses to
    a per-field PhraseQuery and scores identically to the hand-built AST."""
    from lucenenet_spark.query.ast import PhraseQuery
    from lucenenet_spark.query.parser import parse_query

    s, pdf, dm = built
    pair = None
    for r in pdf.itertuples():
        t = _toks(r.title)
        if len(t) >= 2:
            pair = (t[0], t[1])
            break
    assert pair is not None
    parsed = parse_query(f'title:"{pair[0]} {pair[1]}"', text_fields=s.text_fields)
    want = {
        (r["docid"], r["score"])
        for r in s.score_df(PhraseQuery(pair, 0, field="title")).collect()
    }
    got = {(r["docid"], r["score"]) for r in s.score_df(parsed).collect()}
    assert got == want and got
