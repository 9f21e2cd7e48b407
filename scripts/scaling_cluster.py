"""Multi-JVM scaling evidence: N vs 4N SEPARATE executor JVMs on a
localhost Spark STANDALONE cluster.

The single-process local[N] pairs share one JVM heap + GC, which confounds
the north rule's N-vs-4N executor criterion at wider widths (r4 verdict:
2->8 / 4->16 medians were bus/heap-saturated). This harness removes the
shared-heap confound: it starts a real standalone master + 4N one-core
workers (each executor its OWN JVM with its own heap, exactly like a
multi-node cluster except the memory bus), then runs the SAME index build
(bench.py synth path, deterministic corpus, seed 42) with
spark.cores.max = N and = 4N, interleaved reps, and reports throughput at
both plus eff = (thr_4N / thr_N) / 4.

Prereq (run once per boot; idempotent):
    bash scripts/start_standalone_cluster.sh 8
Usage:
    python scripts/scaling_cluster.py [N] [synth_docs] [reps]
Writes BENCH/SCALING_CLUSTER_r5.md.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MASTER = "spark://127.0.0.1:7077"


def run_bench(execs: int, synth_docs: int) -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_MASTER=MASTER,
        SPARK_GRAFT_CPUS=str(execs),
        SPARK_GRAFT_MAX_SLOTS=str(execs),
        SPARK_GRAFT_BENCH_SYNTH_DOCS=str(synth_docs),
        SPARK_GRAFT_BENCH_SKIP_QUERIES="1",
        SPARK_GRAFT_BENCH_SKIP_SF="1",
        SPARK_GRAFT_DRIVER_MEM="6g",
    )
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, cwd=REPO, check=True,
    )
    line = [ln for ln in p.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def probe_bw(nproc: int = 4, secs: float = 2.0) -> float:
    """Same co-tenant 'weather' probe as scaling_bench.py."""
    import multiprocessing as mp

    import numpy as np

    def w(q):
        a = np.zeros(100_000_000 // 8)
        b = np.empty_like(a)
        t0 = time.time()
        cnt = 0
        while time.time() - t0 < secs:
            np.copyto(b, a)
            cnt += 1
        q.put(cnt * a.nbytes * 2 / (time.time() - t0))

    q = mp.Queue()
    ps = [mp.Process(target=w, args=(q,)) for _ in range(nproc)]
    [p.start() for p in ps]
    [p.join() for p in ps]
    return round(sum(q.get() for _ in ps) / 1e9, 1)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    synth_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 60_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    runs_lo, runs_hi, effs, bws = [], [], [], []
    for i in range(reps):
        bws.append(probe_bw())
        print(f"  weather: {bws[-1]} GB/s", file=sys.stderr)
        runs_lo.append(run_bench(n, synth_docs))
        runs_hi.append(run_bench(4 * n, synth_docs))
        for execs, r in ((n, runs_lo[-1]), (4 * n, runs_hi[-1])):
            print(
                f"  {execs} executors: {r['synth_build_docs_per_sec']} docs/s "
                f"(build {r['synth_build_sec']}s)", file=sys.stderr,
            )
        effs.append(
            (runs_hi[-1]["synth_build_docs_per_sec"]
             / runs_lo[-1]["synth_build_docs_per_sec"]) / 4.0
        )
        print(f"  rep {i + 1}/{reps}: eff = {effs[-1]:.3f}", file=sys.stderr)

    med = statistics.median(effs)
    best = max(effs)
    rep_rows = "\n".join(
        f"| {i + 1} | {b} | {rl['synth_build_docs_per_sec']} | "
        f"{rh['synth_build_docs_per_sec']} | {e:.3f} |"
        for i, (b, rl, rh, e) in enumerate(zip(bws, runs_lo, runs_hi, effs))
    )
    md = f"""# Scaling evidence — MULTI-JVM standalone cluster (r5)

`python scripts/scaling_cluster.py {n} {synth_docs} {reps}` against a
localhost Spark standalone cluster: 1 master + {4 * n} workers, each worker
1 core / 3g, every executor its OWN JVM (separate heap + GC — the r4
shared-driver-JVM confound removed; the memory bus remains shared, which a
single box cannot avoid). Same deterministic synthetic corpus (seed 42,
{synth_docs} docs), same build job; spark.cores.max selects {n} vs
{4 * n} one-core executors. Interleaved reps; bw = 2-s memory-bandwidth
weather probe before each rep (quiet box ~= 85-90 GB/s).

| rep | bw GB/s | {n} executors docs/s | {4 * n} executors docs/s | eff |
|---|---|---|---|---|
{rep_rows}

**Median scaling efficiency ({n} -> {4 * n} separate executor JVMs):
{med:.3f}** {"(PASS >= 0.8)" if med >= 0.8 else "(below 0.8 — see note)"}
(best rep: {best:.3f})
"""
    out = os.path.join(REPO, "BENCH", "SCALING_CLUSTER_r5.md")
    with open(out, "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
