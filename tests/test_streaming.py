"""Streaming index maintenance: file-source micro-batches -> delta
generations -> searchable composite; replay safety; compaction trigger."""

import os

import pytest

from lucenenet_spark.data.pages import synth_pages_pandas
from lucenenet_spark.index import IndexConfig, IndexStorage, build_index
from lucenenet_spark.query.ast import TermQuery
from lucenenet_spark.query.engine import Searcher
from lucenenet_spark.streaming import start_stream_indexer

CFG = IndexConfig(num_partitions=4, bucket_width=2, flush_docs=64)

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _write_batch(dirpath: str, name: str, n: int, seed: int, prefix: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = synth_pages_pandas(n, seed=seed, include_blake=False)
    pdf["url"] = prefix + pdf["url"]
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        os.path.join(dirpath, name),
        coerce_timestamps="us",  # Spark's timestamp type is microseconds
        allow_truncated_timestamps=True,
    )


@pytest.fixture(scope="module")
def stream_env(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    idx = str(root / "idx")
    src = str(root / "src")
    ckpt = str(root / "ckpt")
    os.makedirs(src)
    build_index(
        spark, spark.createDataFrame(synth_pages_pandas(50, seed=42)), idx, CFG, overwrite=True
    )
    return idx, src, ckpt


def test_stream_appends_then_compacts(spark, stream_env):
    idx, src, ckpt = stream_env
    _write_batch(src, "b0.parquet", 30, seed=1, prefix="s0-")
    _write_batch(src, "b1.parquet", 20, seed=2, prefix="s1-")

    stream = spark.readStream.schema(PAGES_SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = start_stream_indexer(spark, stream, idx, ckpt, CFG)
    q.awaitTermination(300)

    s = Searcher(spark, idx)
    assert s.maxdoc == 58 + 30 + 20
    assert s.is_composite
    assert len(IndexStorage(idx).delta_dirs()) == 2
    assert s.score_df(TermQuery("data")).filter("docid >= 58").count() > 0

    # restart with a NEW file + compaction threshold: old batches are not
    # reprocessed (checkpoint), third generation triggers a full compact
    _write_batch(src, "b2.parquet", 10, seed=3, prefix="s2-")
    stream2 = spark.readStream.schema(PAGES_SCHEMA).parquet(src)
    q2 = start_stream_indexer(spark, stream2, idx, ckpt, CFG, compact_every=3)
    q2.awaitTermination(300)

    s2 = Searcher(spark, idx)
    assert s2.maxdoc == 58 + 30 + 20 + 10  # no duplicates from replay
    assert not s2.is_composite  # compacted back to a single base
    from lucenenet_spark.index.checkindex import verify

    assert verify(spark, idx)["ok"]
