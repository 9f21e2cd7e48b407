"""Deterministic synthetic Common-Crawl-style ``pages`` table.

Exact input shape per BASELINE.json input_hint:
    (url string, warc_ts timestamp, html binary, text string, lang string)

Scales (FIXTURES.md §1):
- ``tiny``  = the reference's 8-document Blake "Tyger" corpus verbatim
  (TestSimilarityBase.cs:590) — one doc per entry, for golden-score tests;
- ``n`` docs = Zipf-distributed vocabulary (seed fixed) so stopword-heavy
  skew exists, with the 8 Blake docs prepended for golden queries.

Everything is a pure function of (n, seed) — no external data, byte-stable
across runs and machines (numpy PCG64 with fixed seed).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from lucenenet_spark.analysis.extract import wrap_html

# The reference's integration-test corpus (8 docs) — Blake, "The Tyger" /
# "A Divine Image" (public-domain poems), exactly as in
# src/Lucene.Net.Tests/Search/Similarities/TestSimilarityBase.cs:590.
BLAKE_DOCS: list[str] = [
    "Tiger, tiger burning bright   In the forest of the night   What immortal hand or eye   Could frame thy fearful symmetry ?",
    "In what distant depths or skies   Burnt the fire of thine eyes ?   On what wings dare he aspire ?   What the hands the seize the fire ?",
    "And what shoulder and what art   Could twist the sinews of thy heart ?   And when thy heart began to beat What dread hand ? And what dread feet ?",
    "What the hammer? What the chain ?   In what furnace was thy brain ?   What the anvil ? And what dread grasp   Dare its deadly terrors clasp ?",
    "And when the stars threw down their spears   And water'd heaven with their tear   Did he smile his work to see ?   Did he, who made the lamb, made thee ?",
    "Tiger, tiger burning bright   In the forest of the night   What immortal hand or eye   Dare frame thy fearful symmetry ?",
    "Cruelty has a human heart   And jealousy a human face   Terror the human form divine   And Secrecy the human dress .",
    "The human dress is forg'd iron   The human form a fiery forge   The human face a furnace seal'd   The human heart its fiery gorge .",
]

# A compact web-ish vocabulary; Zipf ranks give realistic term skew
# (rank-1 terms behave like stopwords — the skew the salted merge handles).
_VOCAB_ROOTS = [
    "the", "of", "and", "to", "in", "for", "with", "data", "search", "index",
    "query", "page", "web", "crawl", "text", "term", "score", "rank", "link",
    "site", "news", "time", "year", "world", "people", "system", "spark",
    "engine", "document", "content", "archive", "open", "free", "home",
    "about", "contact", "service", "product", "review", "guide", "forum",
    "wiki", "blog", "post", "article", "comment", "user", "video", "image",
    "music",
]


def _vocab(size: int) -> np.ndarray:
    roots = np.array(_VOCAB_ROOTS)
    if size <= len(roots):
        return roots[:size]
    extra = np.array([f"w{i:05d}" for i in range(size - len(roots))])
    return np.concatenate([roots, extra])


def synth_pages_pandas(
    n: int,
    seed: int = 42,
    vocab_size: int = 5000,
    mean_len: int = 60,
    include_blake: bool = True,
) -> pd.DataFrame:
    """Generate ``n`` synthetic pages (plus the 8 Blake docs if requested)."""
    rng = np.random.default_rng(seed)
    vocab = _vocab(vocab_size)
    # Zipf-ish rank weights 1/(rank+1)^1.07
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    weights = 1.0 / ranks**1.07
    weights /= weights.sum()
    doc_lens = np.maximum(1, rng.poisson(mean_len, size=n))
    total = int(doc_lens.sum())
    all_tokens = rng.choice(vocab, size=total, p=weights)
    texts: list[str] = []
    off = 0
    for L in doc_lens:
        texts.append(" ".join(all_tokens[off : off + L]))
        off += L
    if include_blake:
        texts = list(BLAKE_DOCS) + texts
    m = len(texts)
    idx = np.arange(m)
    urls = [f"https://site{i % 997:04d}.example/p/{i:08d}" for i in idx]
    ts = pd.Timestamp("2024-01-01", tz=None) + pd.to_timedelta(idx, unit="s")
    htmls = [wrap_html(t, title=f"p{i}") for i, t in enumerate(texts)]
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": ts,
            "html": htmls,
            "text": texts,
            "lang": ["en"] * m,
        }
    )


def write_pages_parquet(path: str, n: int, seed: int = 42, **kw) -> str:
    """Materialize a pages table as a single parquet file (test/bench input)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = synth_pages_pandas(n, seed=seed, **kw)
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    pq.write_table(table, path)
    return path


def pages_spark_df(spark, n: int, seed: int = 42, num_partitions: int | None = None, **kw):
    """Create the pages table directly as a Spark DataFrame (Arrow path)."""
    pdf = synth_pages_pandas(n, seed=seed, **kw)
    df = spark.createDataFrame(pdf)
    if num_partitions:
        df = df.repartition(num_partitions, "url")
    return df


def pages_spark_df_distributed(
    spark,
    n: int,
    seed: int = 42,
    num_partitions: int = 32,
    vocab_size: int = 5000,
    mean_len: int = 60,
):
    """Generate the pages table DISTRIBUTED — each partition synthesizes its
    own row range with an rng seeded by (seed, partition), so the corpus is
    a pure function of (n, seed, num_partitions) and synthesis scales with
    the cluster instead of the driver. This is the generator the bench uses
    at sizes where driver-side pandas synthesis would itself be the
    bottleneck (and the pattern a 100 TB backfill would use)."""
    import pyarrow as pa

    def gen(batches):
        for rb in batches:
            ids = rb.column("id").to_numpy(zero_copy_only=False)
            if len(ids) == 0:
                continue
            rng = np.random.default_rng([seed, int(ids[0])])
            vocab = _vocab(vocab_size)
            ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
            weights = 1.0 / ranks**1.07
            weights /= weights.sum()
            doc_lens = np.maximum(1, rng.poisson(mean_len, size=len(ids)))
            all_tokens = rng.choice(vocab, size=int(doc_lens.sum()), p=weights)
            bounds = np.concatenate([[0], np.cumsum(doc_lens)])
            texts = [" ".join(all_tokens[bounds[i]:bounds[i + 1]]) for i in range(len(ids))]
            urls = [f"https://site{int(i) % 997:04d}.example/p/{int(i):08d}" for i in ids]
            ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(ids, unit="s")
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(urls),
                    pa.array(ts).cast(pa.timestamp("us")),
                    pa.array(
                        [wrap_html(t, title=f"p{int(i)}") for i, t in zip(ids, texts)],
                        pa.binary(),
                    ),
                    pa.array(texts),
                    pa.array(["en"] * len(ids)),
                ],
                names=["url", "warc_ts", "html", "text", "lang"],
            )

    base = spark.range(0, n, 1, num_partitions)
    return base.mapInArrow(
        gen, schema="url string, warc_ts timestamp, html binary, text string, lang string"
    )
