"""Distributed inverted-index build — the IndexWriter of the engine.

Spark-first re-expression of the reference's indexing path (SURVEY.md §3.1):

=====================================  =========================================
Reference (C#, threads + codec files)  Here (Spark, partitions + Parquet tables)
=====================================  =========================================
IndexWriter.AddDocument routing to a   ``repartition(P, url)`` — each of the P
DocumentsWriterPerThread               partitions is a "DWPT"
(IndexWriter.cs:1621)
DWPT in-RAM inversion + 16MB flush     ``mapInPandas(_build_partials)`` with a
(DocumentsWriterPerThread.cs:274,509)  numpy lexsort inversion kernel, flushing
                                       a sub-segment every ``flush_docs`` docs
FreqProxTermsWriter byte-slice         partial posting rows
postings (FreqProxTermsWriterPerField  ``(term, pid, seg, docids[], freqs[],
.cs:155-251)                           norm_bytes[], positions[][])``
SegmentMerger k-way merge with docID   ONE shuffle: ``groupBy(term, bucket)``
rebasing (SegmentMerger.cs:89-148)     + ``applyInPandas(_merge_partials)``.
                                       No merge-sort and no docID rebasing are
                                       needed: docids are assigned as
                                       partition-offset + local rank, so each
                                       pid owns a contiguous docid range and
                                       concatenating runs in (pid, seg) order
                                       IS the merged sorted list
TieredMergePolicy tiers / salting      ``bucket = pid // bucket_width`` bounds
(TieredMergePolicy.cs:308-440)         any single merge task to bucket_width
                                       partitions' postings — stopword skew
                                       never lands on one task
Lucene41PostingsWriter 128-int blocks  block rows with docid deltas, freqs,
+ skip entries + norms                 norm bytes, first/last docid (the skip
(Lucene41PostingsWriter.cs:302-358)    entry) and block-max metadata; Parquet
                                       min/max footer stats on ``term`` replace
                                       the BlockTree/FST seek index
Two-phase segments_N commit            per-stage Parquet write + _COMMIT.json
(IndexWriter.cs:3868)                  marker; resume skips committed stages

Scale notes (the 100 TB contract):
- exactly TWO wide shuffles touch the full corpus: the initial
  ``repartition(P, url)`` of the pages and the ``groupBy(term, bucket)`` of
  the partial postings. Everything else is metadata-sized.
- partial postings are pre-aggregated per (term, partition) before the
  shuffle — the map-side-combine that keeps a stopword's shuffle volume at
  one row per partition instead of one row per document.
- norm bytes are denormalized into the posting blocks, so query-time scoring
  never joins the (10^12-row) docmap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analysis import StandardAnalyzer
from ..analysis.analyzer import analyze_flat
from ..scoring.bm25 import BM25
from ..scoring.smallfloat import doclen_to_norm_byte_fast
from .config import IndexConfig
from .storage import IndexStorage

# positions are stored FLAT (concatenated across entries in entry order);
# ``freqs`` doubles as the split lengths — freq == len(positions-of-entry) —
# exactly the reason Lucene's .doc file can address the .pos file without a
# per-entry length (Lucene41PostingsFormat.cs:88-100 file-layout rationale).
PARTIALS_SCHEMA = (
    "row_type string, pid int, seg int, "
    "docid long, url string, doclen int, norm_byte int, text_bytes long, "
    "term string, docids array<long>, freqs array<int>, "
    "norm_bytes array<int>, doclens array<int>, positions array<int>"
)

POSTINGS_SCHEMA = (
    "term string, bucket int, block_id long, first_docid long, last_docid long, "
    "entry_count int, docid_deltas array<long>, freqs array<int>, "
    "norm_bytes array<int>, doclens array<int>, positions array<int>, "
    "block_max_tf int, block_ttf long, block_max_ub float"
)

STAGES = ("docoffsets", "partials", "docmap", "stats", "postings", "termstats", "lineage")


def partition_id_expr(num_partitions: int):
    """The partition id ``repartition(P, url)`` will assign, computed WITHOUT
    shuffling: Spark's hash partitioning is pmod(murmur3(url), P) and
    ``F.hash`` is the same murmur3 — validated by test_build.py."""
    return F.pmod(F.hash("url"), F.lit(num_partitions))


class IndexBuilder:
    def __init__(
        self,
        spark: SparkSession,
        storage: IndexStorage,
        config: IndexConfig | None = None,
        analyzer: StandardAnalyzer | None = None,
    ):
        self.spark = spark
        self.storage = storage
        self.config = config or IndexConfig()
        if analyzer is None:
            from ..analysis.analyzer import ENGLISH_STOP_WORDS

            analyzer = StandardAnalyzer(
                stop_words=ENGLISH_STOP_WORDS if self.config.stop_filter else frozenset(),
                max_token_length=self.config.max_token_length,
            )
        self.analyzer = analyzer

    # ------------------------------------------------------------------ #
    def build(self, pages: DataFrame, overwrite: bool = False) -> dict:
        """Run all stages; returns the summary dict. Stages whose commit
        marker matches the config fingerprint are skipped (resume)."""
        if overwrite:
            self.storage.drop()
        fp = self.config.fingerprint()
        summary = {"fingerprint": fp, "stages": {}}

        def run(stage: str, fn):
            if self.storage.is_committed(stage, fp):
                summary["stages"][stage] = {"skipped": True}
                return
            import time as _time

            t0 = _time.time()
            meta = fn()
            if isinstance(meta, dict):
                meta["wall_sec"] = round(_time.time() - t0, 3)
            summary["stages"][stage] = meta

        if not self.config.external_docids:
            run("docoffsets", lambda: self._stage_docoffsets(pages))
        run("partials", lambda: self._stage_partials(pages))
        run("docmap", self._stage_docmap)
        run("stats", self._stage_stats)
        run("postings", self._stage_postings)
        run("termstats", self._stage_termstats)
        run("lineage", self._stage_lineage)
        return summary

    # ------------------------------------------------------------------ #
    def _stage_docoffsets(self, pages: DataFrame) -> dict:
        """Per-partition doc counts -> docid base offsets (docBase analogue,
        BaseCompositeReader.cs:79-99 ``starts[]``). Cheap: scans only the
        ``url`` column (Parquet projection), no shuffle of the payload."""
        P = self.config.num_partitions
        counts = (
            pages.select(partition_id_expr(P).alias("pid"))
            .groupBy("pid")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        pdf = counts.toPandas().sort_values("pid")  # P rows — driver-safe
        full = pd.DataFrame({"pid": range(P)}).merge(pdf, on="pid", how="left").fillna(0)
        full["cnt"] = full["cnt"].astype("int64")
        full["docid_base"] = full["cnt"].cumsum().shift(1, fill_value=0)
        df = self.spark.createDataFrame(full[["pid", "cnt", "docid_base"]])
        return self.storage.write_stage(
            df, "docoffsets", self.config.fingerprint(),
            meta={"maxdoc": int(full["cnt"].sum())},
        )

    def _offsets(self) -> dict[int, int]:
        pdf = self.storage.read_stage(self.spark, "docoffsets").toPandas()
        return dict(zip(pdf["pid"].astype(int), pdf["docid_base"].astype(int)))

    # ------------------------------------------------------------------ #
    def _stage_partials(self, pages: DataFrame) -> dict:
        """The DWPT pass: one ``mapInPandas`` over hash-partitioned,
        url-sorted pages emits BOTH doc rows (docmap) and partial posting
        rows from a single tokenization — written once, partitioned by
        row_type for pruned reads."""
        cfg = self.config
        analyzer = self.analyzer
        external = cfg.external_docids
        offsets = None if external else self._offsets()

        def build_partials(batches):
            state_pid = None
            next_docid = 0
            seg = 0
            # per-seg accumulators (flat numpy-friendly lists)
            acc_terms: list[np.ndarray] = []
            acc_docs: list[np.ndarray] = []
            acc_pos: list[np.ndarray] = []
            acc_norm: list[np.ndarray] = []
            acc_len: list[np.ndarray] = []
            docs_in_seg = 0

            def flush_seg():
                nonlocal seg, acc_terms, acc_docs, acc_pos, acc_norm, acc_len, docs_in_seg
                if docs_in_seg == 0:
                    return None
                t = np.concatenate(acc_terms) if acc_terms else np.array([], dtype=object)
                d = np.concatenate(acc_docs) if acc_docs else np.array([], dtype=np.int64)
                p = np.concatenate(acc_pos) if acc_pos else np.array([], dtype=np.int64)
                nb = np.concatenate(acc_norm) if acc_norm else np.array([], dtype=np.int64)
                dl = np.concatenate(acc_len) if acc_len else np.array([], dtype=np.int64)
                out = _invert(t, d, p, nb, dl, state_pid, seg, cfg.index_positions)
                seg += 1
                acc_terms, acc_docs, acc_pos, acc_norm, acc_len = [], [], [], [], []
                docs_in_seg = 0
                return out

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                pid = int(pdf["pid"].iloc[0])
                if state_pid is None:
                    state_pid = pid
                    if not external:
                        next_docid = offsets[pid]
                texts = pdf["text"]
                flat_terms, flat_docidx, flat_pos, lens = analyze_flat(texts, analyzer)
                if external:
                    docids = pdf["docid"].to_numpy(dtype=np.int64)
                else:
                    docids = np.arange(next_docid, next_docid + len(pdf), dtype=np.int64)
                    next_docid += len(pdf)
                norm_bytes = doclen_to_norm_byte_fast(lens).astype(np.int64)

                # doc rows
                yield pd.DataFrame(
                    {
                        "row_type": "d",
                        "pid": pid,
                        "seg": seg,
                        "docid": docids,
                        "url": pdf["url"].values,
                        "doclen": lens.astype("int32"),
                        "norm_byte": norm_bytes.astype("int32"),
                        "text_bytes": texts.fillna("").str.encode("utf-8").str.len().astype("int64"),
                        "term": None,
                        "docids": None,
                        "freqs": None,
                        "norm_bytes": None,
                        "doclens": None,
                        "positions": None,
                    }
                )

                # accumulate inversion input (flat arrays, no per-token Python)
                if len(flat_terms):
                    acc_terms.append(flat_terms)
                    acc_docs.append(docids[flat_docidx])
                    acc_pos.append(flat_pos)
                    acc_norm.append(norm_bytes[flat_docidx])
                    acc_len.append(lens[flat_docidx])
                docs_in_seg += len(pdf)
                if docs_in_seg >= cfg.flush_docs:
                    out = flush_seg()
                    if out is not None:
                        yield out
            out = flush_seg()
            if out is not None:
                yield out

        P = cfg.num_partitions
        if external:
            # caller-assigned docids: range partitioning keeps each pid's
            # docid range contiguous and pid order == docid order, so the
            # (pid, seg)-ordered concatenation in the merge stays sorted
            prepared = (
                pages.select("url", "text", "docid")
                .repartitionByRange(P, "docid")
                .sortWithinPartitions("docid")
                .withColumn("pid", F.spark_partition_id())
            )
        else:
            prepared = (
                pages.select("url", "text")
                .repartition(P, "url")
                .sortWithinPartitions("url")
                .withColumn("pid", F.spark_partition_id())
            )
        partials = prepared.mapInPandas(build_partials, schema=PARTIALS_SCHEMA)
        return self.storage.write_stage(
            partials, "partials", cfg.fingerprint(), partition_by=["row_type"]
        )

    # ------------------------------------------------------------------ #
    def _stage_docmap(self) -> dict:
        df = (
            self.storage.read_stage(self.spark, "partials")
            .filter(F.col("row_type") == "d")
            .select("docid", "url", "doclen", "norm_byte", "text_bytes", "pid")
        )
        return self.storage.write_stage(
            df, "docmap", self.config.fingerprint(),
            range_partition_column="docid", sort_columns=["docid"],
        )

    def _stage_stats(self) -> dict:
        dm = self.storage.read_stage(self.spark, "docmap")
        row = dm.agg(
            F.count(F.lit(1)).alias("maxdoc"), F.sum("doclen").alias("sum_ttf")
        ).collect()[0]
        maxdoc, sum_ttf = int(row["maxdoc"]), int(row["sum_ttf"] or 0)
        avgdl = float(np.float32(sum_ttf / maxdoc)) if maxdoc and sum_ttf > 0 else 1.0
        df = self.spark.createDataFrame(
            [("text", maxdoc, sum_ttf, avgdl)], "field string, maxdoc long, sum_ttf long, avgdl float"
        )
        return self.storage.write_stage(
            df, "stats", self.config.fingerprint(),
            meta={"maxdoc": maxdoc, "sum_ttf": sum_ttf, "avgdl": avgdl},
        )

    # ------------------------------------------------------------------ #
    def _stage_postings(self) -> dict:
        """THE global shuffle (SegmentMerger analogue). Partial posting rows
        are range-repartitioned by (term, bucket) and merged by a STREAMING
        group merge inside ``mapInPandas`` — one pandas/Arrow pipeline per
        merge task instead of one per (term, bucket) group, so millions of
        small terms cost no per-group overhead, while hot (stopword) terms
        are still split across ``bucket`` salt values. Because the range
        partitioning clusters terms, the output files are term-sorted as a
        side effect: Parquet footer min/max on ``term`` become the term-
        dictionary seek index with NO extra shuffle at write time."""
        cfg = self.config
        stats = self.storage.read_stage(self.spark, "stats").collect()[0]
        avgdl = np.float32(stats["avgdl"])
        cache = BM25(cfg.k1, cfg.b).norm_cache(avgdl)
        block_size = cfg.block_size
        index_positions = cfg.index_positions

        def emit_rows(terms, buckets, docids_col, freqs_col, norms_col,
                      dlens_col, pos_col) -> pd.DataFrame | None:
            """Fully vectorized block builder over a run of partial rows that
            contains ONLY complete (term, bucket) groups, pre-sorted by
            (term, bucket, pid, seg). One np.concatenate per column, group/
            block boundaries via flatnonzero, per-block stats via reduceat —
            no per-row or per-entry Python."""
            n_rows = len(terms)
            if n_rows == 0:
                return None
            row_lens = np.fromiter((len(x) for x in docids_col), dtype=np.int64, count=n_rows)
            docids = np.concatenate([np.asarray(x, dtype=np.int64) for x in docids_col])
            freqs = np.concatenate([np.asarray(x, dtype=np.int64) for x in freqs_col])
            norms = np.concatenate([np.asarray(x, dtype=np.int64) for x in norms_col])
            dlens = np.concatenate([np.asarray(x, dtype=np.int64) for x in dlens_col])
            if index_positions:
                poss = np.concatenate([np.asarray(x, dtype=np.int64) for x in pos_col])
                pos_bounds = np.concatenate([[0], np.cumsum(freqs)])

            # row -> group id (change of term or bucket)
            term_arr = np.asarray(terms, dtype=object)
            buck_arr = np.asarray(buckets, dtype=np.int64)
            row_change = np.empty(n_rows, dtype=bool)
            row_change[0] = True
            row_change[1:] = (term_arr[1:] != term_arr[:-1]).astype(bool)
            row_change[1:] |= buck_arr[1:] != buck_arr[:-1]
            row_group = np.cumsum(row_change) - 1

            # entry -> group id; within-group entry rank; block boundaries
            n_entries = len(docids)
            entry_group = np.repeat(row_group, row_lens)
            group_first_entry = np.flatnonzero(
                np.concatenate([[True], entry_group[1:] != entry_group[:-1]])
            )
            rank = np.arange(n_entries) - group_first_entry[
                np.cumsum(np.concatenate([[True], entry_group[1:] != entry_group[:-1]])) - 1
            ]
            is_block_start = (rank % block_size) == 0
            block_starts = np.flatnonzero(is_block_start)
            block_ends = np.append(block_starts[1:], n_entries)
            block_group = entry_group[block_starts]
            block_id = rank[block_starts] // block_size

            # per-block stats (vectorized)
            first_docid = docids[block_starts]
            last_docid = docids[block_ends - 1]
            max_tf = np.maximum.reduceat(freqs, block_starts)
            ttf = np.add.reduceat(freqs, block_starts)
            f32 = freqs.astype(np.float32)
            ub = f32 / (f32 + cache[norms & 0xFF])
            max_ub = np.maximum.reduceat(ub, block_starts)

            # docid deltas with a 0 at every block start
            deltas = np.empty(n_entries, dtype=np.int64)
            deltas[0] = 0
            deltas[1:] = docids[1:] - docids[:-1]
            deltas[block_starts] = 0

            # group id -> (term, bucket) of first row of the group
            group_first_row = np.flatnonzero(row_change)
            gterm = term_arr[group_first_row]
            gbuck = buck_arr[group_first_row]

            split = block_starts[1:]
            out = {
                "term": gterm[block_group],
                "bucket": gbuck[block_group].astype(np.int32),
                "block_id": block_id,
                "first_docid": first_docid,
                "last_docid": last_docid,
                "entry_count": (block_ends - block_starts).astype(np.int32),
                "docid_deltas": np.split(deltas, split),
                "freqs": np.split(freqs.astype(np.int32), split),
                "norm_bytes": np.split(norms.astype(np.int32), split),
                "doclens": np.split(dlens.astype(np.int32), split),
                "positions": (
                    [
                        poss[pos_bounds[s]:pos_bounds[e]].astype(np.int32)
                        for s, e in zip(block_starts, block_ends)
                    ]
                    if index_positions
                    else None
                ),
                "block_max_tf": max_tf.astype(np.int32),
                "block_ttf": ttf,
                "block_max_ub": max_ub.astype(np.float32),
            }
            return pd.DataFrame(out)

        cols = ["term", "bucket", "docids", "freqs", "norm_bytes", "doclens", "positions"]

        def merge_stream(batches):
            """Rows arrive sorted by (term, bucket, pid, seg); groups may
            span Arrow batches — hold back the trailing open group and
            prepend it to the next batch, then hand complete-group runs to
            the vectorized block builder."""
            held: list | None = None  # list of column lists
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                data = [pdf[c].tolist() for c in cols]
                if held is not None:
                    data = [h + d for h, d in zip(held, data)]
                terms, buckets = data[0], data[1]
                n = len(terms)
                # find start of the last (term, bucket) group
                last_key = (terms[-1], buckets[-1])
                cut = n - 1
                while cut > 0 and (terms[cut - 1], buckets[cut - 1]) == last_key:
                    cut -= 1
                held = [d[cut:] for d in data]
                if cut > 0:
                    out = emit_rows(*[d[:cut] for d in data])
                    if out is not None:
                        yield out
            if held and held[0]:
                out = emit_rows(*held)
                if out is not None:
                    yield out

        partials = (
            self.storage.read_stage(self.spark, "partials")
            .filter(F.col("row_type") == "p")
            .select("term", "pid", "seg", "docids", "freqs", "norm_bytes", "doclens", "positions")
            .withColumn("bucket", (F.col("pid") / F.lit(cfg.bucket_width)).cast("int"))
        )
        n_merge = cfg.merge_partitions or self.spark.conf.get(
            "spark.sql.shuffle.partitions"
        )
        postings = (
            partials.repartitionByRange(int(n_merge), "term", "bucket")
            .sortWithinPartitions("term", "bucket", "pid", "seg")
            .mapInPandas(merge_stream, schema=POSTINGS_SCHEMA)
        )
        return self.storage.write_stage(postings, "postings", cfg.fingerprint())

    # ------------------------------------------------------------------ #
    def _stage_termstats(self) -> dict:
        stats = self.storage.read_stage(self.spark, "stats").collect()[0]
        maxdoc = int(stats["maxdoc"])
        post = self.storage.read_stage(self.spark, "postings")
        ts = (
            post.groupBy("term")
            .agg(
                F.sum("entry_count").alias("df"),
                F.sum("block_ttf").alias("ttf"),
                F.max(F.col("block_max_ub")).alias("max_ub"),
            )
            # float32 idf exactly as BM25Similarity.cs:67-70: double math,
            # one (float) cast — Spark's cast(double as float) is the same
            # round-to-nearest conversion as the C# (float) cast
            .withColumn(
                "idf",
                F.log(
                    F.lit(1.0)
                    + (F.lit(float(maxdoc)) - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                ).cast("float"),
            )
        )
        return self.storage.write_stage(
            ts, "termstats", self.config.fingerprint(),
            range_partition_column="term", sort_columns=["term"],
        )

    def _stage_lineage(self) -> dict:
        """Per-partition audit counters (doc/byte/posting), the resume/
        lineage contract: Σ over pids must equal the table totals
        (CheckIndex analogue, asserted by checkindex.verify)."""
        partials = self.storage.read_stage(self.spark, "partials")
        docs = (
            partials.filter(F.col("row_type") == "d")
            .groupBy("pid")
            .agg(
                F.count(F.lit(1)).alias("doc_count"),
                F.sum("text_bytes").alias("byte_count"),
                F.sum("doclen").alias("token_count"),
            )
        )
        posts = (
            partials.filter(F.col("row_type") == "p")
            .groupBy("pid")
            .agg(
                F.sum(F.size("docids")).alias("posting_count"),
                (F.max("seg") + 1).alias("seg_count"),
            )
        )
        lineage = docs.join(posts, "pid", "left")
        return self.storage.write_stage(lineage, "lineage", self.config.fingerprint())


def _invert(
    terms: np.ndarray,
    docs: np.ndarray,
    pos: np.ndarray,
    norms: np.ndarray,
    dlens: np.ndarray,
    pid: int,
    seg: int,
    index_positions: bool,
) -> pd.DataFrame:
    """Vectorized in-partition inversion: flat (term, doc, pos, norm) arrays
    -> one partial posting row per term. The numpy lexsort replaces the
    reference's TermsHash byte-slice accumulation
    (FreqProxTermsWriterPerField.cs:155-251)."""
    codes, uniques = pd.factorize(terms, sort=True)
    order = np.lexsort((pos, docs, codes))
    t = codes[order]
    d = docs[order]
    p = pos[order]
    nb = norms[order]
    dl = dlens[order]

    # boundaries of (term, doc) runs -> postings entries
    entry_change = np.empty(len(t), dtype=bool)
    entry_change[0] = True
    np.not_equal(t[1:], t[:-1], out=entry_change[1:])
    doc_change = np.empty(len(t), dtype=bool)
    doc_change[0] = True
    np.not_equal(d[1:], d[:-1], out=doc_change[1:])
    is_entry = entry_change | doc_change
    entry_starts = np.flatnonzero(is_entry)
    entry_ends = np.append(entry_starts[1:], len(t))
    entry_freqs = (entry_ends - entry_starts).astype(np.int64)
    entry_docs = d[entry_starts]
    entry_norms = nb[entry_starts]
    entry_dlens = dl[entry_starts]
    entry_terms = t[entry_starts]

    # boundaries of term runs over the entries
    term_change = np.empty(len(entry_terms), dtype=bool)
    term_change[0] = True
    np.not_equal(entry_terms[1:], entry_terms[:-1], out=term_change[1:])
    term_starts = np.flatnonzero(term_change)
    term_ends = np.append(term_starts[1:], len(entry_terms))

    rows = {
        "row_type": "p",
        "pid": pid,
        "seg": seg,
        "docid": None,
        "url": None,
        "doclen": None,
        "norm_byte": None,
        "text_bytes": None,
        "term": uniques[entry_terms[term_starts]],
        "docids": [entry_docs[s:e] for s, e in zip(term_starts, term_ends)],
        "freqs": [entry_freqs[s:e].astype(np.int32) for s, e in zip(term_starts, term_ends)],
        "norm_bytes": [entry_norms[s:e].astype(np.int32) for s, e in zip(term_starts, term_ends)],
        "doclens": [entry_dlens[s:e].astype(np.int32) for s, e in zip(term_starts, term_ends)],
    }
    if index_positions:
        # flat positions per term: p is sorted by (term, doc, pos), so the
        # token-range slice of a term IS its entry-ordered position stream
        tok_bounds = np.append(entry_starts, len(t))
        rows["positions"] = [
            p[tok_bounds[s]:tok_bounds[e]].astype(np.int32)
            for s, e in zip(term_starts, term_ends)
        ]
    else:
        rows["positions"] = None
    return pd.DataFrame(rows)


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    config: IndexConfig | None = None,
    overwrite: bool = False,
) -> dict:
    builder = IndexBuilder(spark, IndexStorage(out_dir), config)
    return builder.build(pages, overwrite=overwrite)
