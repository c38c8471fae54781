#!/usr/bin/env python
"""Compaction benefit measurement (BENCH/BASELINE.md "compaction" section).

Simulates crawl cadence: the same deterministic corpus built as ONE
batch vs as COMPACT_BATCHES sip-sized micro-batches (each its own
commit unit, as `sip_build` produces), then `compact_index`. Reports,
for fragmented vs compacted: segment file count, engine init (catalog
pin) time, serving-node warm p50, and distributed-path p50 — the two
query paths whose read fan-out fragmentation widens. Rank identity of
every measured query across the three states is asserted, not assumed.

Writes BENCH/compaction.json. Fold numbers into BENCH/BASELINE.md by
hand (it is hand-maintained).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = int(os.environ.get("COMPACT_DOCS", "200000"))
N_BATCHES = int(os.environ.get("COMPACT_BATCHES", "40"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PARTITION_SECONDS = 14400
BLOCK_SPAN = 4096

QUERIES = [
    "w000017 AND w000031",
    "w000101 AND w000205 AND w000046 AND w000088",
    "w000013 OR w000201 OR w000502",
    "w000040 AND (w000150 OR w000222)",
    "w000019 AND NOT w000404",
    "w00042*",
    "w000003 AND w004242",
    "w000017 AND lang:de",
    "w000017 AND site:[100 TO 140]",
]


def seg_files(index_dir: str) -> int:
    seg = os.path.join(index_dir, "segments")
    return sum(
        1
        for d in os.listdir(seg)
        for f in os.listdir(os.path.join(seg, d))
        if f.endswith(".parquet")
    )


def measure(spark, index_dir: str) -> tuple[dict, dict]:
    from miru_spark.query.engine import SearchEngine

    t0 = time.time()
    eng = SearchEngine(spark, index_dir).cache()
    init_s = time.time() - t0
    eng.search("w000001", k=10).collect()  # warm scan path
    df_ms, local_ms = [], []
    answers = {}
    for q in QUERIES:
        t0 = time.time()
        answers[q] = [
            (r["pid"], r["doc_id"], round(r["score"], 6))
            for r in eng.search(q, k=10).collect()
        ]
        df_ms.append((time.time() - t0) * 1000)
    for q in QUERIES:  # warm the postings LRU, then measure
        eng.search_collect(q, k=10)
    for q in QUERIES:
        t0 = time.time()
        eng.search_collect(q, k=10)
        local_ms.append((time.time() - t0) * 1000)
    eng.close()
    med = lambda xs: round(sorted(xs)[len(xs) // 2], 1)  # noqa: E731
    return (
        {
            "segment_files": seg_files(index_dir),
            "engine_init_s": round(init_s, 2),
            "df_p50_ms": med(df_ms),
            "serving_warm_p50_ms": med(local_ms),
        },
        answers,
    )


def main() -> None:
    from miru_spark.index.build import build_index
    from miru_spark.index.compact import compact_index
    from miru_spark.session import get_spark
    from miru_spark.webtext import webtext_df

    spark = get_spark(
        app_name="miru_compact_bench",
        master=f"local[{CPUS}]",
        extra_conf={
            "spark.sql.shuffle.partitions": str(CPUS),
            "spark.driver.memory": os.environ.get("BENCH_DRIVER_MEM", "32g"),
        },
    )
    work = "/tmp/miru_compact_bench"
    shutil.rmtree(work, ignore_errors=True)
    out: dict = {
        "n_docs": N_DOCS,
        "n_batches": N_BATCHES,
        "cpus": CPUS,
    }

    one = os.path.join(work, "idx_onebatch")
    t0 = time.time()
    build_index(
        spark, webtext_df(spark, N_DOCS, parallelism=64), one,
        partition_seconds=PARTITION_SECONDS, block_span=BLOCK_SPAN,
        shuffle_partitions=CPUS,
    )
    out["onebatch_build_s"] = round(time.time() - t0, 1)
    out["onebatch"], base_answers = measure(spark, one)

    frag = os.path.join(work, "idx_frag")
    # crawl-cadence appends cover CLOSED time windows: slice batches at
    # pid boundaries (appending into an already-complete pid is a late
    # arrival the sip API rejects/skips by design)
    from miru_spark.webtext import _BASE_TS_US, _STEP_US

    pid_us = PARTITION_SECONDS * 1_000_000
    pid_of = lambda i: (_BASE_TS_US + i * _STEP_US) // pid_us  # noqa: E731
    n_pids = pid_of(N_DOCS - 1) - pid_of(0) + 1
    bounds = [0]
    for b in range(1, N_BATCHES):
        cut_pid = pid_of(0) + b * n_pids // N_BATCHES
        i = bounds[-1]
        while i < N_DOCS and pid_of(i) < cut_pid:
            i += 1
        bounds.append(i)
    bounds.append(N_DOCS)
    t0 = time.time()
    indexed = 0
    for b in range(N_BATCHES):
        lo, hi = bounds[b], bounds[b + 1]
        if lo >= hi:
            continue
        rep = build_index(
            spark,
            webtext_df(spark, hi - lo, parallelism=8, start=lo),
            frag,
            partition_seconds=PARTITION_SECONDS, block_span=BLOCK_SPAN,
            shuffle_partitions=8,
        )
        indexed += rep.n_docs
    assert indexed == N_DOCS, indexed  # no batch dropped late rows
    out["frag_build_s"] = round(time.time() - t0, 1)
    out["fragmented"], frag_answers = measure(spark, frag)

    t0 = time.time()
    rep = compact_index(spark, frag)
    out["compact_s"] = round(time.time() - t0, 1)
    out["compact_report"] = {
        k: rep[k] for k in ("merged_tags", "files_before", "files_after")
    }
    out["compacted"], comp_answers = measure(spark, frag)

    for q in QUERIES:
        assert frag_answers[q] == comp_answers[q] == base_answers[q], q
    out["rank_identity"] = "onebatch == fragmented == compacted (asserted)"

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "compaction.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
