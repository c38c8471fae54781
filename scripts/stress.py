#!/usr/bin/env python
"""Query stress harness: concurrent callers against one SearchEngine.

Mirrors the reference's stress-plugin metric shape -- a sliding window of
query latencies reduced to p50/p75/p90/p95/p99/p999 plus qps
(WikiMiruStressPluginRegion.java:145-157 DescriptiveStatistics window,
WikiMiruStressService.java:58-120 concurrent query firing) -- against the
serving-node path (`search_collect`, zero Spark jobs per eligible query).

    STRESS_THREADS=8 STRESS_SECONDS=20 python scripts/stress.py

Prints one JSON line per thread level.

STRESS_PROCS=N adds process-level scale-out: N child processes (each
its own JVM + SearchEngine over the SAME read-only index directory —
the miru reader-replica shape, N readers serving one replicated
snapshot) start at a shared barrier timestamp and stress concurrently;
the parent sums their per-level qps. This is the axis the reference
scales query throughput on (add reader hosts, not threads —
MiruClusterClient replica sets), evidenced here because one Python
process is GIL-bound past ~8 threads.

    STRESS_PROCS=4 STRESS_THREADS=8 python scripts/stress.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
LEVELS = tuple(
    int(x) for x in os.environ.get("STRESS_THREADS", "1,8,16").split(",")
)
SECONDS = float(os.environ.get("STRESS_SECONDS", "15"))
INDEX_DIR = os.environ.get("STRESS_INDEX_DIR", "/tmp/miru_stress_idx")

QUERIES = [
    "w000001 AND w000004",
    "w000001 AND w000002 AND w000003 AND w000005",
    "w000001 OR w000009 OR w000011",
    "(w000005 OR w000006) AND w000007",
    "w000001 AND NOT w000002",
    "w00004*",
    "the OR w000200",
    "w000017 AND lang:de",
    "doclen:[16 TO 60] AND w000001",
]


def _pct(sorted_ms: list[float], p: float) -> float:
    i = min(len(sorted_ms) - 1, int(p * len(sorted_ms)))
    return round(sorted_ms[i], 2)


def _parent_multiproc(procs: int) -> None:
    """Spawn `procs` stress children over the same index dir, aligned on
    a start barrier, and sum per-level qps. Requires the index to exist
    (built below on first run) so children never race the build."""
    import subprocess

    barrier_s = float(os.environ.get("STRESS_BARRIER_S", "60"))
    start_at = time.time() + barrier_s
    env = dict(
        os.environ,
        STRESS_CHILD="1",
        STRESS_START_AT=f"{start_at:.3f}",
        # split the box's cores across children, as replica hosts would
        SPARK_GRAFT_CPUS=str(max(2, CPUS // procs)),
    )
    errs = [
        open(f"/tmp/stress_child_{i}.err", "w") for i in range(procs)
    ]
    kids = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            env=env, stdout=subprocess.PIPE, stderr=errs[i],
            text=True,
        )
        for i in range(procs)
    ]
    per_kid = [
        [json.loads(ln) for ln in (k.communicate()[0] or "").splitlines()
         if ln.startswith("{")]
        for k in kids
    ]
    for e in errs:
        e.close()
    for i, rows in enumerate(per_kid):
        assert rows, (
            f"stress child {i} produced no output "
            f"(see /tmp/stress_child_{i}.err)"
        )
    for lvl in range(len(per_kid[0])):
        rows = [k[lvl] for k in per_kid]
        agg = {
            "procs": procs,
            "threads_per_proc": rows[0]["threads"],
            "total_threads": sum(r["threads"] for r in rows),
            "qps": round(sum(r["qps"] for r in rows), 1),
            "per_proc_qps": [r["qps"] for r in rows],
            "p50_ms": round(
                sorted(r["p50_ms"] for r in rows)[len(rows) // 2], 2
            ),
            "worst_p99_ms": max(r["p99_ms"] for r in rows),
            "late_start": any(r.get("late_start") for r in rows),
        }
        print(json.dumps(agg), flush=True)


def main() -> None:
    from miru_spark.index.build import build_index
    from miru_spark.query import SearchEngine
    from miru_spark.session import get_spark
    from miru_spark.webtext import webtext_df

    procs = int(os.environ.get("STRESS_PROCS", "1"))
    is_child = os.environ.get("STRESS_CHILD") == "1"

    spark = get_spark(
        app_name="stress", master=f"local[{CPUS}]", shuffle_partitions=32
    )
    if not os.path.exists(os.path.join(INDEX_DIR, "meta.json")):
        import re

        m = re.search(r"sf([0-9.]+)", SF_DIR)
        n_docs = int(float(m.group(1)) * 2_000_000) if m else 200_000
        wt = webtext_df(spark, n_docs, parallelism=CPUS)
        build_index(
            spark, wt, INDEX_DIR,
            partition_seconds=14400, block_span=4096,
            shuffle_partitions=32,
        )
    if procs > 1 and not is_child:
        spark.stop()
        _parent_multiproc(procs)
        return

    eng = SearchEngine(spark, INDEX_DIR)
    for q in QUERIES:  # warm the postings LRU + row-group catalog
        rows = eng.search_collect(q, k=10)
        assert rows, f"stress query matches nothing at this scale: {q}"

    # STRESS_MIX=analytics interleaves the serving analytics ops with
    # the searches (same in-process path, shared postings/time caches)
    ops = [
        (lambda q=q: eng.search_collect(q, k=10)) for q in QUERIES
    ]
    if os.environ.get("STRESS_MIX") == "analytics":
        ops += [
            lambda: eng.count("w000001 AND w000004"),
            lambda: eng.waveform("w000017", bucket_seconds=86400),
            lambda: eng.distincts("lang", "w000001"),
            lambda: eng.aggregate_counts("site", "w000001", 0, 5),
        ]
        for fn in ops[len(QUERIES):]:
            fn()  # warm the facet postings + time-array caches

    late_start = False
    start_at = float(os.environ.get("STRESS_START_AT", "0") or 0)
    if is_child and start_at:
        # all replicas warmed; stress the same wall-clock window so the
        # parent's qps sum is a true concurrent-throughput reading
        delay = start_at - time.time()
        late_start = delay < 0
        if delay > 0:
            time.sleep(delay)

    for threads in LEVELS:
        lat_ms: list[float] = []

        def worker(wid: int) -> list[float]:
            out = []
            i = wid
            end = time.time() + SECONDS
            while time.time() < end:
                t0 = time.perf_counter()
                ops[i % len(ops)]()
                out.append((time.perf_counter() - t0) * 1000)
                i += 1
            return out

        t0 = time.time()
        with ThreadPoolExecutor(threads) as ex:
            for res in ex.map(worker, range(threads)):
                lat_ms.extend(res)
        wall = time.time() - t0
        lat_ms.sort()
        print(json.dumps({
            "threads": threads,
            "seconds": round(wall, 1),
            "queries": len(lat_ms),
            "qps": round(len(lat_ms) / wall, 1),
            "p50_ms": _pct(lat_ms, 0.50),
            "p75_ms": _pct(lat_ms, 0.75),
            "p90_ms": _pct(lat_ms, 0.90),
            "p95_ms": _pct(lat_ms, 0.95),
            "p99_ms": _pct(lat_ms, 0.99),
            "p999_ms": _pct(lat_ms, 0.999),
            **({"late_start": True} if late_start else {}),
        }), flush=True)

    eng.close()
    spark.stop()


if __name__ == "__main__":
    main()
