#!/usr/bin/env python
"""Run one build and dump per-stage wall/cpu metrics from the status API."""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("PROFILE_CPUS", "8"))
N_DOCS = int(os.environ.get("PROFILE_DOCS", "6000000"))
CORPUS = os.environ.get("PROFILE_CORPUS", "/tmp/miru_scaling_corpus_6000000")
SHUF = int(os.environ.get("PROFILE_SHUF", "64"))


def main() -> None:
    from miru_spark.index.build import build_index
    from miru_spark.session import get_spark

    spark = get_spark(
        app_name="profile6m",
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
    idx = tempfile.mkdtemp(prefix="prof6m_")
    t0 = time.time()
    build_index(spark, wt, idx, partition_seconds=14400, block_span=4096,
                resume=False, shuffle_partitions=SHUF)
    wall = time.time() - t0
    print(f"TOTAL WALL {wall:.1f}s  cpus={CPUS} shuf={SHUF} docs={N_DOCS}", flush=True)

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    stages = json.loads(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=complete").read()
    )
    rows = []
    for s in stages:
        rows.append(
            (
                s["stageId"],
                s["name"].split("\n")[0][:60],
                round((s["completionTime_epoch"] if False else 0), 1) if False else None,
                s["numCompleteTasks"],
                round(s["executorRunTime"] / 1000, 1),
                round(s.get("executorCpuTime", 0) / 1e9, 1),
                round(s.get("shuffleWriteBytes", 0) / 2**20, 1),
                round(s.get("shuffleReadBytes", 0) / 2**20, 1),
                round(s.get("memoryBytesSpilled", 0) / 2**20, 1),
                round(s.get("diskBytesSpilled", 0) / 2**20, 1),
                round(s.get("jvmGcTime", 0) / 1000, 1),
            )
        )
    print("stage tasks runTime cpuTime shufW(MB) shufR(MB) memSpill diskSpill gc(s) name")
    for r in sorted(rows, key=lambda r: -r[4])[:12]:
        print(f"{r[0]:>5} {r[3]:>5} {r[4]:>8} {r[5]:>8} {r[6]:>9} {r[7]:>9} "
              f"{r[8]:>8} {r[9]:>9} {r[10]:>5} {r[1]}")
    import shutil

    shutil.rmtree(idx, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
