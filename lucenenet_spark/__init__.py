"""lucenenet_spark — a PySpark-native full-text inverted-index + BM25 engine.

A from-scratch rebuild of the capabilities of Lucene.NET 4.8 (reference at
/root/reference), re-expressed Spark-first:

- index build = ``mapInPandas`` per-partition segment construction followed by
  ONE shuffle (``repartition`` on term) that plays the role of Lucene's
  SegmentMerger + TieredMergePolicy,
- posting lists = rows of 128-entry blocks (delta docids, freqs, norm bytes,
  block-max metadata) in a term-sorted Parquet/Iceberg table,
- queries = DataFrame compositions (joins/groupBy) over posting blocks with
  float32 BM25 scoring and block-max pruning,
- top-k = ``orderBy(score desc, docid asc).limit(k)`` (Spark's distributed
  TakeOrderedAndProject).

Nothing here is a port: the reference's C# execution machinery (DWPT threads,
codec byte formats, skip files, scorer heaps) is replaced by Spark's own
parallelism, Parquet encodings, min/max pruning and hash aggregation. See
SURVEY.md for the file:line parity map.
"""

__version__ = "0.1.0"
