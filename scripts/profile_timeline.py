#!/usr/bin/env python
"""Run one build and dump a stage TIMELINE (submission/completion walls +
inter-stage gaps) from the status API — finds serial driver-side time."""
from __future__ import annotations

import datetime as dt
import json
import os
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("PROFILE_CPUS", "8"))
CORPUS = os.environ.get("PROFILE_CORPUS", "/tmp/miru_scaling_corpus_6000000")
SHUF = int(os.environ.get("PROFILE_SHUF", "64"))


def _ts(s: str) -> float:
    # "2026-08-19T12:34:56.789GMT"
    return dt.datetime.strptime(s.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f").timestamp()


def main() -> None:
    from miru_spark.index.build import build_index
    from miru_spark.session import get_spark

    spark = get_spark(
        app_name="profile_timeline",
        master=f"local[{CPUS}]",
        shuffle_partitions=SHUF,
        extra_conf={
            "spark.driver.memory": "32g",
            "spark.io.compression.codec": "zstd",
            "spark.ui.enabled": "true",
            "spark.driver.extraJavaOptions": (
                f"-XX:+UseParallelGC -XX:ParallelGCThreads={CPUS}"
            ),
        },
    )
    wt = spark.read.parquet(CORPUS)
    idx = tempfile.mkdtemp(prefix="proftl_")
    t0 = time.time()
    build_index(spark, wt, idx, partition_seconds=14400, block_span=4096,
                resume=False, shuffle_partitions=SHUF)
    wall = time.time() - t0
    print(f"TOTAL WALL {wall:.1f}s  cpus={CPUS} shuf={SHUF}", flush=True)

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    stages = json.loads(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete"
        ).read()
    )
    evs = []
    for s in stages:
        sub = _ts(s["submissionTime"])
        comp = _ts(s["completionTime"])
        evs.append((sub, comp, s["stageId"], s["numCompleteTasks"],
                    round(s["executorRunTime"] / 1000, 1),
                    round(s.get("executorCpuTime", 0) / 1e9, 1),
                    round(s.get("jvmGcTime", 0) / 1000, 1),
                    s["name"].split("\n")[0][:70]))
    evs.sort()
    base = evs[0][0]
    prev_end = base
    gap_total = 0.0
    print("  start    end   wall  tasks  runT   cpuT   gc  | gap-before | name")
    for sub, comp, sid, nt, rt, ct, gc, name in evs:
        gap = max(0.0, sub - prev_end)
        gap_total += gap
        print(f"{sub-base:7.1f} {comp-base:7.1f} {comp-sub:6.1f} {nt:5d} "
              f"{rt:7.1f} {ct:7.1f} {gc:5.1f} | {gap:7.1f} | s{sid} {name}")
        prev_end = max(prev_end, comp)
    print(f"SUM inter-stage gap: {gap_total:.1f}s;  "
          f"wall-after-last-stage: {wall - (prev_end - base):.1f}s (approx)")
    import shutil
    shutil.rmtree(idx, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
