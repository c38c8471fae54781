#!/usr/bin/env python
"""Headline benchmark for the miru_spark engine.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, ...extras}

Workload (the north-star metrics from BASELINE.md):
  1. index build over the deterministic synthetic webtext corpus sized to
     the sf (2M rows/sf unit -> 200k docs at sf0.1) -- docs/sec reported;
  2. BM25 top-10 query latencies over that index (conjunctive,
     disjunctive, mixed, NOT, prefix, head-term shapes from FIXTURES.md §2);
  3. breadth ops over the driver tables at the sf dir (fulltext SQL path,
     dedup, ANN, aggregate-counts, text-quality).

Set BENCH_SCALE_DOCS to override the synthetic corpus size, BENCH_SKIP_OPS=1
to run only the build+query core (used by the scaling-efficiency runner).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SHUF = int(os.environ.get("BENCH_SHUFFLE_PARTITIONS", str(CPUS)))

BM25_QUERIES = {
    "q_and2": "w000017 AND w000031",
    "q_and4": "w000101 AND w000205 AND w000046 AND w000088",
    "q_or3": "w000013 OR w000201 OR w000502",
    "q_mixed": "w000040 AND (w000150 OR w000222)",
    "q_not": "w000019 AND NOT w000404",
    "q_prefix": "w00042*",
    "q_head_tail": "w000003 AND w004242",
    # round-2 composed-field paths: keyword field filter and an
    # order-preserving numeric range scan (MiruTermComposer analog)
    "q_field": "w000017 AND lang:de",
    "q_numrange": "w000017 AND site:[100 TO 140]",
}


def _sf_from_dir(d: str) -> float:
    m = re.search(r"sf([0-9.]+)", os.path.basename(d.rstrip("/")))
    return float(m.group(1)) if m else 0.1


def main() -> None:
    sf = _sf_from_dir(SF_DIR)
    n_docs = int(os.environ.get("BENCH_SCALE_DOCS", str(int(2_000_000 * sf))))

    from miru_spark.index.build import build_index
    from miru_spark.query.engine import SearchEngine
    from miru_spark.session import get_spark
    from miru_spark.webtext import webtext_df

    # heap sized to the JOB, fixed (-Xms == -Xmx): the 200k-doc sf0.1 run
    # fits comfortably in 12g, and a lazily-expanding oversized heap is
    # actively harmful on hosts that demand-page guest memory -- measured
    # on the round-4 box: ParallelGC young pauses of 6.4s/13.8s while the
    # heap grew toward 48g (first-touch page-in ~0.05-1.4 GB/s there),
    # vs a 554ms worst pause with a fixed right-sized heap. Multi-million
    # -doc runs still get the big heap (or set BENCH_DRIVER_MEM).
    driver_mem = os.environ.get(
        "BENCH_DRIVER_MEM", "12g" if n_docs <= 1_000_000 else "48g"
    )
    spark = get_spark(
        app_name="miru_spark_bench",
        master=f"local[{CPUS}]",
        # job partitioning is a property of the JOB, not the cluster size:
        # the scaling harness pins it so N vs 4N runs identical work units
        shuffle_partitions=SHUF,
        extra_conf={
            # one local JVM hosts driver+executors; the big-corpus shuffle
            # OOMs the 8g default (same heap at every parallelism level)
            "spark.driver.memory": driver_mem,
            # an executor JVM with N cores sizes its GC threads to N; the
            # single local JVM sees all 32 and would otherwise burst GC on
            # ~20 threads even at local[2], borrowing cores the level is
            # not supposed to have (skews N-vs-4N scaling measurements)
            "spark.driver.extraJavaOptions": (
                f"-Xms{driver_mem} "
                f"-XX:+UseParallelGC -XX:ParallelGCThreads={CPUS}"
            ),
            # text shuffles well under zstd (~2x smaller than lz4): trades
            # shared-memory-bus bytes for per-core compute, which is the
            # scaling-friendly direction on a multi-executor cluster too
            "spark.io.compression.codec": "zstd",
        },
    )

    timings: dict[str, float] = {}
    extras: dict = {"n_docs": n_docs, "cpus": CPUS}

    index_dir = tempfile.mkdtemp(prefix="miru_bench_idx_")
    corpus_dir = None
    try:
        # -- 1. index build (throughput metric) ---------------------------
        # corpus generation parallelism is pinned (not CPUS-derived) so the
        # materialized file layout is identical no matter which parallelism
        # level materializes it first -- both scaling levels must read the
        # same bytes in the same file layout
        wt = webtext_df(spark, n_docs, parallelism=64)
        if os.environ.get("BENCH_MATERIALIZE", "0") == "1":
            # write the corpus to parquet first (untimed) and build from the
            # storage read -- matches a real pipeline and avoids charging
            # the synthetic generator to the build metric twice
            corpus_dir = os.environ.get(
                "BENCH_CORPUS_DIR", ""
            ) or tempfile.mkdtemp(prefix="miru_bench_corpus_")
            marker = os.path.join(corpus_dir, "_SUCCESS")
            if not os.path.exists(marker):
                wt.write.mode("overwrite").parquet(corpus_dir)
            wt = spark.read.parquet(corpus_dir)
        # untimed warmup: a small throwaway build spins up the Arrow
        # worker pool, JITs the codec/shuffle paths and faults the JVM's
        # working pages ONCE -- the throughput metric is steady-state
        # indexing on a long-lived cluster, not JVM cold-start (on a
        # demand-paged host the first build otherwise pays seconds of
        # one-time page-in that no later batch pays)
        if os.environ.get("BENCH_WARMUP", "1") == "1":
            warm_dir = tempfile.mkdtemp(prefix="miru_bench_warm_")
            try:
                build_index(
                    spark,
                    webtext_df(spark, 20_000, parallelism=64),
                    warm_dir,
                    partition_seconds=14400,
                    block_span=4096,
                    resume=False,
                    shuffle_partitions=SHUF,
                )
            finally:
                shutil.rmtree(warm_dir, ignore_errors=True)
        t0 = time.time()
        # partition_seconds sizes the reduce unit (one pid = one window
        # group); at the synthetic corpus density (7s/doc) 4h partitions
        # keep pids task-sized AND numerous enough (~3x cores at sf0.1)
        # that the single-shuffle build saturates every level -- the same
        # knob a crawl-scale run turns (hourly pids at web density)
        report = build_index(
            spark,
            wt,
            index_dir,
            partition_seconds=int(os.environ.get("BENCH_PARTITION_SECONDS", "14400")),
            block_span=4096,
            resume=False,
            shuffle_partitions=SHUF,
        )
        timings["build_index"] = time.time() - t0
        extras["build_docs_per_sec"] = round(n_docs / timings["build_index"], 1)
        extras["n_partitions"] = len(report.pids_built)

        # -- 2. BM25 top-10 latencies -------------------------------------
        # median of 3 runs per query: single-shot timings on a shared box
        # conflate one JVM/GC hiccup with the engine (observed ±40% drift
        # between otherwise-identical rounds); the median is the honest
        # per-query latency estimate and still pays every query's full cost
        REPS = int(os.environ.get("BENCH_QUERY_REPS", "3"))

        def _median(xs: list[float]) -> float:
            return sorted(xs)[len(xs) // 2]

        def _med_ms(fn, pre=None):
            """Median-of-REPS wall per op, in ms (same rationale as the
            query medians: a single shot conflates one host page-in or
            GC hiccup with the engine). `pre` runs untimed before each
            rep (e.g. clearing a result cache so the op's COMPUTE is
            measured, not a memo hit). Returns (ms, last_result)."""
            runs, last = [], None
            for _ in range(REPS):
                if pre is not None:
                    pre()
                t0 = time.time()
                last = fn()
                runs.append(time.time() - t0)
            return round(_median(runs) * 1e3, 1), last

        eng = SearchEngine(spark, index_dir).cache()
        eng.search("w000001", k=10).collect()  # warm cache + scan path once
        for name, q in BM25_QUERIES.items():
            runs = []
            for _ in range(REPS):
                t0 = time.time()
                rows = eng.search(q, k=10).collect()
                runs.append(time.time() - t0)
            timings[name] = _median(runs)
            extras.setdefault("rows", {})[name] = len(rows)
        qtimes = [timings[n] for n in BM25_QUERIES]
        extras["query_p50_ms"] = round(sorted(qtimes)[len(qtimes) // 2] * 1000, 1)
        extras["query_qps"] = round(len(qtimes) / sum(qtimes), 2)

        # serving-node latency: search_collect answers eligible queries
        # in-process (pyarrow + NumPy, zero Spark jobs) -- the analog of
        # the reference's memory-mapped partition host answering directly.
        # Skipped in scaling-protocol runs (BENCH_SKIP_OPS=1): those
        # measure build throughput on multi-million-doc corpora where
        # cold serving reads would just add unrelated minutes.
        if os.environ.get("BENCH_SKIP_OPS", "0") != "1":
            ctimes = []
            for q in BM25_QUERIES.values():
                runs = []
                for _ in range(REPS):
                    t0 = time.time()
                    eng.search_collect(q, k=10)
                    runs.append(time.time() - t0)
                ctimes.append(_median(runs))
            extras["query_p50_servingnode_ms"] = round(
                sorted(ctimes)[len(ctimes) // 2] * 1000, 1
            )
            extras["query_qps_servingnode"] = round(
                len(ctimes) / sum(ctimes), 2
            )
            # index-backed analytics (count / waveform / distincts):
            # match-set aggregation without scoring, serving path.
            # median-of-REPS like the queries; the decoded-postings LRU
            # staying warm across reps IS the steady-state serving cost
            extras["analytics_count_ms"], n_match = _med_ms(
                lambda: eng.count("w000017 AND w000031")
            )
            extras["analytics_waveform_ms"], wf = _med_ms(
                lambda: eng.waveform("w000017", bucket_seconds=86400)
            )
            extras["analytics_distincts_ms"], fc = _med_ms(
                lambda: eng.distincts("lang", "w000017")
            )
            extras["analytics_metrics_ms"], mx = _med_ms(
                lambda: eng.metrics("site", "w000017", 86400, "avg")
            )
            extras["analytics_trending_ms"], tr = _med_ms(
                lambda: eng.trending("lang", "w000017", bucket_seconds=86400)
            )
            extras["analytics_sizes"] = [
                n_match, len(wf), len(fc), len(mx), len(tr)
            ]
            # r4 reco plugin family over the same index (the composed
            # lang/site fields stand in for user/item dimensions so the
            # build metric stays comparable across rounds)
            extras["plugin_features_ms"], gf = _med_ms(
                lambda: eng.gather_features(("lang", "site"), query="w000017")
            )
            # strut memoizes per-(model, term) scores (StrutModelScorer
            # analog); clear it each rep so the GATHER cost is measured
            extras["plugin_strut_ms"], st = _med_ms(
                lambda: eng.strut(
                    "lang", [(1.0, "site")], query="w000017", k=10
                ),
                pre=eng._strut_cache.clear,
            )
            # field3=doclen: the uniform synthetic corpus gives every
            # lang full site coverage, so a site-typed hop-3 would
            # (correctly) exclude everything; doclen keeps the same
            # 3-hop work and returns a real page
            extras["plugin_reco_ms"], rc = _med_ms(
                lambda: eng.reco(("lang", "de"), "site", "lang", "doclen", k=10)
            )
            extras["plugin_inbox_ms"], ib = _med_ms(
                lambda: eng.inbox(
                    "de", item_field="site", stream_field="lang", count=10
                )
            )
            extras["plugin_stumptown_ms"], sp = _med_ms(
                lambda: eng.stumptown("w000017", bucket_seconds=86400, k=10)
            )
            extras["plugin_sizes"] = [
                len(gf), len(st), len(rc), len(ib["page"]),
                len(sp["waveform"]) + len(sp["results"]),
            ]

        # batched qps: all queries in ONE Spark job (stress-harness shape)
        runs = []
        for _ in range(REPS):
            t0 = time.time()
            eng.search_many(list(BM25_QUERIES.values()), k=10)
            runs.append(time.time() - t0)
        timings["q_batch_all"] = _median(runs)
        extras["query_qps_batched"] = round(
            len(BM25_QUERIES) / timings["q_batch_all"], 2
        )

        # -- 3. breadth ops over driver tables ----------------------------
        # the interactive engine is done: release its cache and give AQE
        # back to the wide analytic ops below
        eng.close()
        if os.environ.get("BENCH_SKIP_OPS", "0") != "1":
            from miru_spark.ops import dedup, events_ops, fulltext_sql
            from miru_spark.ops import similarity, textstats

            breadth = {
                "op_ft_bm25_sql": fulltext_sql.ft_bm25_and_topk,
                "op_dd_minhash": dedup.dd_minhash_pairs,
                "op_ann_cosine": similarity.ann_cosine_topk,
                "op_ev_aggcounts": events_ops.ev_aggregate_counts,
                "op_tx_quality": textstats.tx_quality,
            }
            # median-of-REPS, same rationale as the query medians: these
            # are multi-second distributed jobs and a single shot on a
            # shared/demand-paged box can absorb a 10-30s host stall that
            # says nothing about the plan being measured
            for name, fn in breadth.items():
                runs = []
                for _ in range(REPS):
                    t0 = time.time()
                    fn(spark, SF_DIR).collect()
                    runs.append(time.time() - t0)
                timings[name] = sorted(runs)[len(runs) // 2]
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)
        if corpus_dir and not os.environ.get("BENCH_CORPUS_DIR"):
            shutil.rmtree(corpus_dir, ignore_errors=True)
        spark.stop()

    out = {
        "metric": "index_build+bm25_topk+breadth_ops_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf,
    }
    out.update(extras)
    out["host_mem_bw_gbps"] = _mem_bw_probe()
    print(json.dumps(out))


def _mem_bw_probe() -> float:
    """Single-process NumPy copy bandwidth, GB/s -- a 0.3 s host-health
    datum embedded in every bench record so a degraded reading carries
    its own adjudication (this sandbox's shared VM intermittently
    throttles guest memory ~7x; quiet readings are ~5-10 GB/s,
    throttled ~0.4 -- see BENCH/BASELINE.md box-pathology closures)."""
    import numpy as np

    a = np.empty(25_000_000, dtype=np.float64)  # 200 MB
    t0 = time.time()
    for _ in range(3):
        a.copy()
    return round(3 * a.nbytes * 2 / (time.time() - t0) / 1e9, 2)


if __name__ == "__main__":
    main()
