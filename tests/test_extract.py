"""HTML -> text extraction: the input_hint's byte-identity invariant.

The input table carries html (raw payload) AND text (extracted); the
contract is byte-identical extracted text per url. These tests pin:
- wrap -> extract round-trips ANY text byte-exactly (hypothesis property);
- the synthetic pages corpus satisfies extract(html) == text row-for-row;
- an index built from the html column ALONE equals one built from text.
"""

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lucenenet_spark.analysis.extract import (
    escape_html,
    extract_text,
    extract_text_arrow,
    wrap_html,
)
from lucenenet_spark.data.pages import pages_spark_df_distributed, synth_pages_pandas
from lucenenet_spark.index import IndexConfig, IndexStorage, build_index


@settings(max_examples=300, deadline=None)
@given(st.text())
def test_wrap_extract_roundtrip_property(text):
    out = extract_text_arrow(pa.array([wrap_html(text)], pa.binary())).to_pylist()[0]
    assert out == text


def test_roundtrip_adversarial_fixtures():
    fixtures = [
        "",
        "a < b && c > d \"quoted\" 'single' & more",
        "<script>alert('x')</script><style>p{}</style><!-- comment -->",
        "pre-escaped looking &amp; &lt;x&gt; stays literal",
        "multi\nline\ttext  with   runs of space",
        "unicode café 中文 \U0001f600",
        "</body> tag text inside the body",
    ]
    arr = pa.array([wrap_html(t, title=f"t{i}") for i, t in enumerate(fixtures)], pa.binary())
    assert extract_text_arrow(arr).to_pylist() == fixtures


def test_escape_is_injective_on_entities():
    # classic round-trip ordering: & escaped first, unescaped last
    s = "&amp; & &lt; <"
    assert escape_html(s) == "&amp;amp; &amp; &amp;lt; &lt;"


def test_no_body_fragment_and_null():
    arr = pa.array([b"frag <b>bold</b> &lt;x&gt;", None], pa.binary())
    out = extract_text_arrow(arr).to_pylist()
    assert out == ["frag bold <x>", None]


def test_pages_corpus_invariant_pandas():
    pdf = synth_pages_pandas(500, seed=7)
    out = extract_text_arrow(pa.array(list(pdf["html"]), pa.binary())).to_pylist()
    assert out == list(pdf["text"])


def test_pages_corpus_invariant_distributed(spark):
    df = pages_spark_df_distributed(spark, 2000, seed=11, num_partitions=8)
    redone = extract_text(df.withColumnRenamed("text", "text_src"), out_col="text_ex")
    bad = redone.filter(
        ~(F.col("text_ex") == F.col("text_src"))
        | F.col("text_ex").isNull()
    ).count()
    assert bad == 0
    # extract_text is a narrow map: no shuffle in the plan
    plan = redone._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_index_from_html_equals_index_from_text(spark, tmp_path):
    cfg = IndexConfig(num_partitions=4, flush_docs=500)
    df = pages_spark_df_distributed(spark, 800, seed=5, num_partitions=4)
    out_text = str(tmp_path / "from_text")
    out_html = str(tmp_path / "from_html")
    build_index(spark, df, out_text, cfg, overwrite=True)
    # drop the provided text entirely; recover it from the raw html
    build_index(
        spark,
        extract_text(df.drop("text"), html_col="html", out_col="text"),
        out_html,
        cfg,
        overwrite=True,
    )

    def stage_hash(out, stage, cols=None):
        sdf = IndexStorage(out).read_stage(spark, stage)
        if cols:
            sdf = sdf.select(*cols)
        row = sdf.select(
            F.sha2(
                F.concat_ws("\x01", *[F.col(c).cast("string") for c in sdf.columns]), 256
            ).alias("h")
        ).agg(F.sum(F.conv(F.substring("h", 1, 12), 16, 10).cast("decimal(38,0)"))).first()
        return row[0]

    for stage, cols in [
        ("termstats", None),
        ("docmap", ["docid", "url", "doclen", "norm_byte"]),
    ]:
        assert stage_hash(out_text, stage, cols) == stage_hash(out_html, stage, cols), stage
