"""Clock-matched MULTI-JVM scaling control (r5).

Same logic as scripts/scaling_control.py but on the standalone cluster:
compare ONE 4N-executor job against FOUR CONCURRENT N-executor jobs on the
SAME 4N one-core workers. Both sides load every core identically (same
frequency scaling, same memory-bus pressure, separate executor JVMs on
both sides), so the ratio isolates what the north rule actually asks
about — does the PARALLEL PLAN lose efficiency as one job spans 4x more
executors? — from single-box clock/bandwidth physics.

eff = thr(one 4N-exec job) / (4 * median thr(concurrent N-exec jobs))

Prereq: bash scripts/start_standalone_cluster.sh <4N workers>
Usage:  python scripts/scaling_cluster_control.py [N] [synth_docs] [reps]
Writes BENCH/SCALING_CLUSTER_CONTROL_r5.md.
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


def bench_cmd_env(execs: int, synth_docs: int) -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_MASTER=MASTER,
        SPARK_GRAFT_CPUS=str(execs),
        SPARK_GRAFT_MAX_SLOTS=str(execs),
        SPARK_GRAFT_BENCH_SYNTH_DOCS=str(synth_docs),
        SPARK_GRAFT_BENCH_SKIP_QUERIES="1",
        SPARK_GRAFT_BENCH_SKIP_SF="1",
        SPARK_GRAFT_DRIVER_MEM="5g",
    )
    return env


def parse(p: subprocess.CompletedProcess) -> dict:
    line = [ln for ln in p.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    synth_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 240_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    bench = os.path.join(REPO, "bench.py")

    def run_big() -> float:
        big = parse(subprocess.run(
            [sys.executable, bench], capture_output=True, text=True,
            env=bench_cmd_env(4 * n, synth_docs), cwd=REPO, check=True,
        ))
        return big["synth_build_docs_per_sec"]

    def run_smalls() -> list:
        procs = [
            subprocess.Popen(
                [sys.executable, bench], stdout=subprocess.PIPE,
                stderr=subprocess.PIPE, text=True,
                env=bench_cmd_env(n, synth_docs), cwd=REPO,
            )
            for _ in range(4)
        ]
        smalls = []
        for p in procs:
            out, err = p.communicate()
            if p.returncode != 0:
                raise RuntimeError(err[-2000:])
            line = [ln for ln in out.strip().splitlines() if ln.startswith("{")][-1]
            smalls.append(json.loads(line)["synth_build_docs_per_sec"])
        return smalls

    # uncounted warm-up rep: each bench invocation is a fresh standalone
    # application (fresh executor JVMs on the workers), but the OS page
    # cache, python bytecode cache, and worker-side spark dirs warm across
    # invocations — the r5 first run measured rep1 at ~1/3 of rep3
    # throughput on the identical job, so measure only after one full pass
    print("  warm-up rep (uncounted)...", file=sys.stderr)
    run_big()
    run_smalls()

    rows = []
    for i in range(reps):
        # alternate side order per rep so slow box-weather drift cannot
        # systematically favor one side; probe bw right before each side
        bw_a = probe_bw()
        if i % 2 == 0:
            thr_big = run_big()
            bw_b = probe_bw()
            smalls = run_smalls()
        else:
            smalls = run_smalls()
            bw_b = probe_bw()
            thr_big = run_big()
        med_small = statistics.median(smalls)
        eff = thr_big / (4.0 * med_small)
        rows.append((bw_a, bw_b, thr_big, smalls, eff))
        print(f"  rep {i + 1}/{reps} (bw {bw_a}/{bw_b}): {4 * n}-exec "
              f"{thr_big} docs/s vs 4x {n}-exec {sorted(smalls)} -> "
              f"eff {eff:.3f}", file=sys.stderr)

    med = statistics.median(e for *_, e in rows)
    tbl = "\n".join(
        f"| {i + 1} | {ba}/{bb} | {b} | "
        f"{'-'.join(str(round(x)) for x in sorted(s))} | {e:.3f} |"
        for i, (ba, bb, b, s, e) in enumerate(rows)
    )
    md = f"""# Clock-matched multi-JVM scaling control (r5)

`python scripts/scaling_cluster_control.py {n} {synth_docs} {reps}` on the
localhost standalone cluster ({4 * n} one-core workers, separate executor
JVMs): ONE {4 * n}-executor job vs FOUR CONCURRENT {n}-executor jobs —
identical total core load on both sides, so clocks and the memory bus are
equalized and the ratio isolates the parallel PLAN's efficiency.

| rep | bw GB/s (per side) | {4 * n}-exec docs/s | 4 concurrent {n}-exec docs/s | eff |
|---|---|---|---|---|
{tbl}

**Median clock-matched multi-JVM efficiency: {med:.3f}**
{"(PASS >= 0.8)" if med >= 0.8 else "(below 0.8)"}
"""
    out = os.path.join(REPO, "BENCH", "SCALING_CLUSTER_CONTROL_r5.md")
    with open(out, "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
