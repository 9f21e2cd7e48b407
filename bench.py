"""Benchmark harness: index-build throughput + query latencies.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32) and prints ONE JSON line:

    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {...}, "sf": 0.1, "index_build_sec": ..., "index_docs_per_sec": ...,
     "synth_build_docs_per_sec": ...}

Two build measurements:
- the sf documents table (what the correctness queries run on), and
- a synthetic Common-Crawl-style ``pages`` corpus (SPARK_GRAFT_BENCH_SYNTH_DOCS,
  default 50_000, seed 42) — the north-rule indexing path at a size where
  per-doc cost, not fixed overhead, dominates. Used by scripts/scaling_bench.py
  for the N-vs-4N-cores scaling-efficiency evidence.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # Each mapInArrow task keeps a JVM thread AND a Python worker hot; this
    # VM's memory bandwidth collapses ~30x beyond ~16 concurrent memory-heavy
    # processes (measured: 127 GB/s aggregate at 8 procs -> 4.3 GB/s at 32,
    # BENCH/BASELINE.md). Cap task slots so the build runs at the machine's
    # peak instead of inside the collapse; override with SPARK_GRAFT_MAX_SLOTS.
    cpus = min(cpus, int(os.environ.get("SPARK_GRAFT_MAX_SLOTS", "16")))
    # 200k: small enough to keep the bench under ~2 min, large enough that
    # per-doc cost (not JVM/stage fixed overhead) dominates the docs/sec
    synth_docs = int(os.environ.get("SPARK_GRAFT_BENCH_SYNTH_DOCS", "200000"))
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    try:
        sf = float(sf_name.replace("sf", ""))
    except ValueError:
        sf = 0.0

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    # SPARK_GRAFT_MASTER overrides the master URL (e.g. a localhost
    # standalone cluster, spark://127.0.0.1:7077) — scripts/scaling_cluster.py
    # uses this to run the SAME bench job on N separate 1-core executor
    # JVMs instead of N threads in one JVM. cpus then means spark.cores.max
    # (the executor count at 1 core each).
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    b = (
        SparkSession.builder.master(master)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
    )
    if not master.startswith("local"):
        b = (
            b.config("spark.cores.max", str(cpus))
            .config("spark.executor.cores", "1")
            # one-core executors on one host: waiting (default 3 s) for the
            # executor that holds a cached block idles whole scheduler waves
            # on short stages — measured as the main reason a 4N-executor
            # job under-scaled vs 4 concurrent N-executor jobs. At 100 TB
            # with multi-minute stages the default is fine; for seconds-long
            # stages schedule immediately and let the localhost "remote"
            # fetch pay its (tiny) price.
            .config("spark.locality.wait", "0")
            .config(
                "spark.executor.memory",
                os.environ.get("SPARK_GRAFT_EXEC_MEM", "2600m"),
            )
            .config("spark.executorEnv.PYTHONPATH", os.path.dirname(os.path.abspath(__file__)))
        )
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from lucenenet_spark.index.builder import build_index
    from lucenenet_spark.index.config import IndexConfig

    out: dict = {"metric": "total_query_sec", "unit": "sec", "sf": sf, "cpus": cpus}

    # ---- index build over the sf documents table (fresh, timed) ---------- #
    # SKIP_SF=1 (scaling control runs): only the synth build matters, and
    # concurrent control jobs must not race on the shared sf index dir
    if os.environ.get("SPARK_GRAFT_BENCH_SKIP_SF") != "1":
        key = sf_name or "default"
        idx_dir = os.path.join(entrymod._INDEX_ROOT, key)
        pages = entrymod._entry_pages(spark, sf_dir)
        n_docs = pages.count()
        t0 = time.time()
        build_index(spark, pages, idx_dir, entrymod._ENTRY_CONFIG, overwrite=True)
        t_build = time.time() - t0
        out["index_build_sec"] = round(t_build, 3)
        out["index_docs_per_sec"] = round(n_docs / t_build, 1)
        out["index_n_docs"] = n_docs

    # ---- synthetic pages corpus build (north-rule path, bigger) ---------- #
    if synth_docs > 0:
        from lucenenet_spark.data.pages import pages_spark_df_distributed

        # merge partitions sized by DATA, not cluster width (the 100 TB
        # lesson): 32 tasks over ~36M posting entries at 1M docs gives the
        # range partitioner balanced waves at ANY slot count — with
        # merge tasks == slots, range imbalance makes the largest task
        # dominate the stage (measured: 28 s -> 14.7 s at local[4], 1M docs)
        cfg = IndexConfig(
            num_partitions=max(cpus, 16), flush_docs=50_000, merge_partitions=32
        )
        # generation partition count is FIXED (not cpu-dependent) so the
        # corpus is byte-identical across parallelism levels — required for
        # the N-vs-4N scaling comparison to be apples-to-apples
        synth = pages_spark_df_distributed(spark, synth_docs, seed=42, num_partitions=64)
        synth = synth.persist()
        m = synth.count()  # materialize input so build timing excludes synthesis
        # build twice; time the warm run (first run pays one-time JVM codegen
        # + Python-worker fork costs that a long-lived cluster amortizes away)
        # pid-suffixed output: concurrent control jobs (scaling_control.py
        # runs four bench.py processes at once) must not race on the dir
        synth_dir = f"/tmp/lucenenet_spark_bench_synth_{os.getpid()}"
        build_index(spark, synth, synth_dir, cfg, overwrite=True)
        t0 = time.time()
        build_index(spark, synth, synth_dir, cfg, overwrite=True)
        t_synth = time.time() - t0
        out["synth_build_docs"] = m
        out["synth_build_sec"] = round(t_synth, 3)
        out["synth_build_docs_per_sec"] = round(m / t_synth, 1)
        synth.unpersist()
        import shutil

        shutil.rmtree(synth_dir, ignore_errors=True)

    # ---- query latencies -------------------------------------------------- #
    if os.environ.get("SPARK_GRAFT_BENCH_SKIP_QUERIES") == "1":
        out["queries"] = {}
        out["value"] = out["synth_build_sec" if synth_docs > 0 else "index_build_sec"]
        print(json.dumps(out))
        spark.stop()
        return

    qs = entrymod.queries()
    entrymod._searcher(spark, sf_dir)  # warm: open searcher, cache block metadata
    entrymod._sorted_searcher(spark, sf_dir)  # warm: sorted-index build is not a query
    times: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        times[name] = round(time.time() - t0, 3)
    out["queries"] = times
    out["value"] = round(sum(times.values()), 3)

    # ---- BM25 latency battery (p50/p95 — the metric's second half) -------- #
    # Repeated warm top-k searches over representative query shapes, timed
    # end-to-end (plan + execute + materialize). The percentile is across
    # shape x rep, so it reflects the latency a mixed query stream sees.
    lat_reps = int(os.environ.get("SPARK_GRAFT_BENCH_LAT_REPS", "5"))
    if lat_reps > 0:
        from lucenenet_spark.query.ast import (
            BooleanClause,
            BooleanQuery,
            Occur,
            PhraseQuery,
            TermQuery,
        )

        shapes = {
            "term": TermQuery("data"),
            "bool_and": BooleanQuery(
                [
                    BooleanClause(TermQuery("table"), Occur.MUST),
                    BooleanClause(TermQuery("group"), Occur.MUST),
                ]
            ),
            "bool_or": BooleanQuery(
                [
                    BooleanClause(TermQuery("spark"), Occur.SHOULD),
                    BooleanClause(TermQuery("merge"), Occur.SHOULD),
                    BooleanClause(TermQuery("vector"), Occur.SHOULD),
                ]
            ),
            "phrase": PhraseQuery(["part", "filter"]),
        }
        s = entrymod._searcher(spark, sf_dir)
        lats: list[float] = []
        per_shape: dict[str, list[float]] = {k: [] for k in shapes}
        for _ in range(lat_reps):
            for name, q in shapes.items():
                t0 = time.time()
                s.search(q, 10).write.mode("overwrite").format("noop").save()
                dt = time.time() - t0
                lats.append(dt)
                per_shape[name].append(dt)
        lats.sort()
        p = lambda q: round(lats[min(len(lats) - 1, int(q * len(lats)))], 3)  # noqa: E731
        out["bm25_topk_p50_sec"] = p(0.50)
        out["bm25_topk_p95_sec"] = p(0.95)
        out["bm25_topk_reps"] = len(lats)
        out["bm25_topk_median_by_shape"] = {
            k: round(sorted(v)[len(v) // 2], 3) for k, v in per_shape.items()
        }

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
