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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MASTER = "spark://127.0.0.1:7077"


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

    rows = []
    for i in range(reps):
        # side A: one job spanning 4N executors
        big = parse(subprocess.run(
            [sys.executable, bench], capture_output=True, text=True,
            env=bench_cmd_env(4 * n, synth_docs), cwd=REPO, check=True,
        ))
        thr_big = big["synth_build_docs_per_sec"]
        # side B: four CONCURRENT N-executor jobs (same total core load)
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
        med_small = statistics.median(smalls)
        eff = thr_big / (4.0 * med_small)
        rows.append((thr_big, smalls, eff))
        print(f"  rep {i + 1}/{reps}: {4 * n}-exec {thr_big} docs/s vs "
              f"4x {n}-exec {sorted(smalls)} -> eff {eff:.3f}", file=sys.stderr)

    med = statistics.median(e for _, _, e in rows)
    tbl = "\n".join(
        f"| {i + 1} | {b} | {'-'.join(str(round(x)) for x in sorted(s))} | {e:.3f} |"
        for i, (b, s, e) in enumerate(rows)
    )
    md = f"""# Clock-matched multi-JVM scaling control (r5)

`python scripts/scaling_cluster_control.py {n} {synth_docs} {reps}` on the
localhost standalone cluster ({4 * n} one-core workers, separate executor
JVMs): ONE {4 * n}-executor job vs FOUR CONCURRENT {n}-executor jobs —
identical total core load on both sides, so clocks and the memory bus are
equalized and the ratio isolates the parallel PLAN's efficiency.

| rep | {4 * n}-exec docs/s | 4 concurrent {n}-exec docs/s | eff |
|---|---|---|---|
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
