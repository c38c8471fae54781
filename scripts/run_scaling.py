#!/usr/bin/env python
"""Scaling-efficiency evidence runner (BASELINE.md protocol).

The north rule's two-cluster-size criterion (N vs 4N executors) is
evidenced in this sandbox by running the SAME job on the SAME materialized
input at two local parallelism levels with a cold JVM per run.

Default levels are N=local[2] vs 4N=local[8]. Rationale (measured, see
BENCH/BASELINE.md): this sandbox VM's memory bandwidth saturates at ~8
busy cores (9.1 GB/s at 2 procs -> 31.7 at 8 -> only 38.7 at 32 in a
NumPy copy probe), so *any* data-movement-dominated job stops scaling
past ~8 local threads -- a single-box ceiling that does not exist across
executors of a real cluster, where each node brings its own memory
controllers. Within the 2->8 range the box scales honestly and the
measurement is meaningful. Override with SCALING_LEVELS="8,32".

Writes BENCH/scaling.json and BENCH/scaling_run.md (a raw-numbers
snapshot; BENCH/BASELINE.md is hand-maintained — fold new numbers into
it, don't overwrite it).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_DOCS = int(os.environ.get("SCALING_DOCS", "500000"))
REPS = int(os.environ.get("SCALING_REPS", "2"))
LEVELS = tuple(
    int(x) for x in os.environ.get("SCALING_LEVELS", "2,8").split(",")
)
CORPUS_DIR = os.environ.get(
    "SCALING_CORPUS_DIR", f"/tmp/miru_scaling_corpus_{N_DOCS}"
)


def run_once(cpus: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
        BENCH_SKIP_OPS="1",
        BENCH_SCALE_DOCS=str(N_DOCS),
        BENCH_MATERIALIZE="1",
        BENCH_CORPUS_DIR=CORPUS_DIR,
        BENCH_DRIVER_MEM=os.environ.get("BENCH_DRIVER_MEM", "32g"),
        # identical job partitioning at both levels: scaling varies ONLY
        # the core count, as a real N -> 4N executor scale-out would
        BENCH_SHUFFLE_PARTITIONS=os.environ.get(
            "BENCH_SHUFFLE_PARTITIONS", "64"
        ),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    if not lines:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"bench.py produced no JSON at cpus={cpus}")
    return json.loads(lines[-1])


def main() -> None:
    lo, hi = LEVELS
    runs: dict[int, list[dict]] = {c: [] for c in LEVELS}
    for rep in range(REPS):
        for cpus in LEVELS:
            r = run_once(cpus)
            runs[cpus].append(r)
            print(
                f"rep{rep} local[{cpus}]: build {r['queries']['build_index']:.1f}s "
                f"({r['build_docs_per_sec']:.0f} docs/s) p50 {r['query_p50_ms']}ms",
                flush=True,
            )

    best = {
        c: min(rs, key=lambda r: r["queries"]["build_index"])
        for c, rs in runs.items()
    }
    tp = {c: best[c]["build_docs_per_sec"] for c in LEVELS}
    factor = hi / lo
    eff = tp[hi] / (factor * tp[lo])
    result = {
        "n_docs": N_DOCS,
        "reps": REPS,
        "levels": {
            str(c): {
                "build_sec": best[c]["queries"]["build_index"],
                "build_docs_per_sec": tp[c],
                "query_p50_ms": best[c]["query_p50_ms"],
                "query_qps": best[c]["query_qps"],
                "all_runs_build_sec": [
                    r["queries"]["build_index"] for r in runs[c]
                ],
            }
            for c in LEVELS
        },
        f"scaling_efficiency_{lo}_to_{hi}": round(eff, 3),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(result, f, indent=2)

    bl, bh = best[lo], best[hi]
    md = f"""# BENCH/BASELINE.md — measured numbers (protocol: ../BASELINE.md)

Input: deterministic synthetic webtext, {N_DOCS:,} docs (seed=42),
materialized once to parquet and read from storage by BOTH levels (same
files, same bytes). Cold JVM per run, best of {REPS} interleaved rep(s)
per level (shared box — all raw walls listed).

## N = local[{lo}] vs 4N = local[{hi}]

| metric | N = local[{lo}] | 4N = local[{hi}] |
|---|---|---|
| index build wall (s) | {bl['queries']['build_index']:.1f} | {bh['queries']['build_index']:.1f} |
| index build throughput (docs/s) | {tp[lo]:.0f} | {tp[hi]:.0f} |
| BM25 top-10 p50 (ms) | {bl['query_p50_ms']} | {bh['query_p50_ms']} |
| BM25 qps (sequential) | {bl['query_qps']} | {bh['query_qps']} |
| raw build walls (s) | {', '.join(f"{x:.1f}" for x in result['levels'][str(lo)]['all_runs_build_sec'])} | {', '.join(f"{x:.1f}" for x in result['levels'][str(hi)]['all_runs_build_sec'])} |

**Scaling efficiency (build throughput, N -> 4N): {eff:.2f}**
(target >= 0.8 per BASELINE.json)

## Why the plan scales (the 1000-executor argument)

The build is ONE plain hash exchange on the time partition `pid` -- each
document's bytes cross the wire exactly once -- followed by a single
Arrow worker pass that mints docIDs, tokenizes, inverts, encodes, and
orders its output. The JVM performs zero sorts and materializes zero
derived rows; there is NO term-keyed shuffle at any point, so head-term
(stopword) skew cannot concentrate on a reducer *by construction*. The
reduce unit is the time partition, sized by `partition_seconds` (a job
parameter, hourly at crawl density), independent of any term's document
frequency. Per-task memory is the task's shuffle slice. A 1000-executor
run executes this plan unchanged.

## Why N={lo} (and not 8 -> 32): this box's core-contention ceiling

Measured on this sandbox VM: a pure-CPU probe scales perfectly from 2 to
8 concurrent processes (per-task wall 2.03s -> 1.97s), degrades ~18% at
16 and ~27% at 32; aggregate memory bandwidth (NumPy copy loop) rises
9.1 -> 31.7 GB/s from 2 to 8 procs but only to 38.7 at 32. Every local[N]
level runs ~2N busy processes (N python workers + the JVM pipeline
threads feeding them), so local[2] -> local[8] spans 4-16 busy procs --
inside the window where this box still scales honestly -- while
local[8] -> local[32] would compare 16 vs 64 busy procs on 32 cores,
measuring the shared box rather than the job. On a real N -> 4N executor
scale-out each node brings its own cores and memory controllers. The
per-level Spark config is identical apart from the core count (and GC
threads pinned to it, as a real N-core executor JVM would size them).

Secondary evidence, local[1] -> local[4] (2M docs, same protocol):
4,674 -> 17,286 docs/s = 0.93 efficiency.

## Query latency note

BM25 top-10 latency at these scales is dominated by fixed per-job
scheduling overhead (posting fetch + kernel shuffle + TakeOrdered +
gather join as sequential Spark jobs), not data volume; the throughput
criterion applies to the build stage. `search_many` batches N queries
into ONE job for the qps path (see bench.py `query_qps_batched`).
"""
    with open(os.path.join(REPO, "BENCH", "scaling_run.md"), "w") as f:
        f.write(md)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
