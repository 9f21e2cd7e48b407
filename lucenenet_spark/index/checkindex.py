"""Offline index integrity verification — the CheckIndex analogue
(src/Lucene.Net/Index/CheckIndex.cs): cross-table invariants any healthy
index must satisfy. Runs as distributed aggregations (no collect of data
tables), returns a dict of named checks -> bool plus counters.

Invariants (FIXTURES.md §5):
- Σ posting freqs per doc == doclen in docmap
- per-term df == number of posting entries; termstats.df consistent
- docids strictly increasing within each block and across a term's blocks
- every posting docid exists in docmap; docids dense 0..maxdoc-1
- stats.avgdl == float32(sum_ttf / float64(maxdoc))
- lineage counters sum to table totals
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from .builder import DOCMAP_SCHEMA, PARTIALS_SCHEMA, POSTINGS_SCHEMA, TERMSTATS_SCHEMA
from .storage import IndexStorage


def verify(spark: SparkSession, index_dir: str) -> dict:
    st = IndexStorage(index_dir)
    postings = st.read_stage(spark, "postings", POSTINGS_SCHEMA)
    docmap = st.read_stage(spark, "docmap", DOCMAP_SCHEMA)
    termstats = st.read_stage(spark, "termstats", TERMSTATS_SCHEMA)
    stats = st.read_stage(spark, "stats").collect()[0]
    lineage = st.read_stage(spark, "lineage")

    results: dict[str, object] = {}
    maxdoc = int(stats["maxdoc"])

    # docmap: dense unique docids 0..maxdoc-1
    dm = docmap.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("docid").alias("nd"),
        F.min("docid").alias("lo"),
        F.max("docid").alias("hi"),
        F.sum("doclen").alias("sum_ttf"),
    ).collect()[0]
    results["docmap_dense_docids"] = (
        int(dm["n"]) == maxdoc
        and int(dm["nd"]) == maxdoc
        and int(dm["lo"]) == 0
        and int(dm["hi"]) == maxdoc - 1
    )
    results["stats_sum_ttf"] = int(dm["sum_ttf"] or 0) == int(stats["sum_ttf"])
    results["stats_avgdl_float32"] = np.float32(stats["avgdl"]) == np.float32(
        int(stats["sum_ttf"]) / float(maxdoc)
    )

    # blocks: internal ordering + metadata consistency (vectorized per block)
    def check_blocks(batches):
        bad_order = 0
        bad_meta = 0
        n_entries = 0
        sum_freq = 0
        for pdf in batches:
            for _, r in pdf.iterrows():
                deltas = np.asarray(r["docid_deltas"], dtype=np.int64)
                freqs = np.asarray(r["freqs"], dtype=np.int64)
                d = r["first_docid"] + np.cumsum(deltas)
                if deltas[0] != 0 or (deltas[1:] <= 0).any():
                    bad_order += 1
                if (
                    d[-1] != r["last_docid"]
                    or len(d) != r["entry_count"]
                    or freqs.max(initial=0) != r["block_max_tf"]
                    or freqs.sum() != r["block_ttf"]
                    or (freqs <= 0).any()
                ):
                    bad_meta += 1
                n_entries += len(d)
                sum_freq += int(freqs.sum())
        yield pd.DataFrame(
            {"bad_order": [bad_order], "bad_meta": [bad_meta],
             "n_entries": [n_entries], "sum_freq": [sum_freq]}
        )

    agg = (
        postings.select("first_docid", "last_docid", "entry_count",
                        "docid_deltas", "freqs", "block_max_tf", "block_ttf")
        .mapInPandas(check_blocks, "bad_order long, bad_meta long, n_entries long, sum_freq long")
        .agg(F.sum("bad_order"), F.sum("bad_meta"), F.sum("n_entries"), F.sum("sum_freq"))
        .collect()[0]
    )
    results["blocks_sorted"] = int(agg[0] or 0) == 0
    results["blocks_metadata"] = int(agg[1] or 0) == 0
    # Σ freq over all postings == Σ doclen (every token is in exactly one entry)
    results["sum_freq_equals_sum_doclen"] = int(agg[3] or 0) == int(stats["sum_ttf"])

    # termstats df/ttf match the posting blocks
    ts_chk = (
        postings.groupBy("term")
        .agg(F.sum("entry_count").alias("df2"), F.sum("block_ttf").alias("ttf2"))
        .join(termstats, "term", "full_outer")
        .filter(
            (F.col("df2").isNull())
            | (F.col("df").isNull())
            | (F.col("df2") != F.col("df"))
            | (F.col("ttf2") != F.col("ttf"))
        )
        .count()
    )
    results["termstats_consistent"] = ts_chk == 0

    # cross-term docid ordering: per (term), blocks ordered by (bucket,
    # block_id) must have non-overlapping increasing docid ranges
    w_chk = (
        postings.select("term", "bucket", "block_id", "first_docid", "last_docid")
        .withColumn(
            "prev_last",
            F.lag("last_docid").over(
                Window.partitionBy("term").orderBy("bucket", "block_id")
            ),
        )
        .filter(F.col("prev_last").isNotNull() & (F.col("first_docid") <= F.col("prev_last")))
        .count()
    )
    results["term_blocks_disjoint_increasing"] = w_chk == 0

    # every posting docid within docmap range (cheap range proxy + exact join
    # on a sample is overkill at 100TB; the range check is the invariant here)
    rng = postings.agg(F.min("first_docid"), F.max("last_docid")).collect()[0]
    results["posting_docids_in_range"] = (
        rng[0] is None or (int(rng[0]) >= 0 and int(rng[1]) <= maxdoc - 1)
    )

    # lineage counters
    lin = lineage.agg(
        F.sum("doc_count"), F.sum("token_count"), F.sum("posting_count")
    ).collect()[0]
    results["lineage_docs"] = int(lin[0] or 0) == maxdoc
    results["lineage_tokens"] = int(lin[1] or 0) == int(stats["sum_ttf"])
    results["lineage_postings"] = int(lin[2] or 0) == int(agg[2] or 0)

    results["ok"] = all(v for k, v in results.items() if isinstance(v, bool))
    return results
