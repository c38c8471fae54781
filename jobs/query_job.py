#!/usr/bin/env python
"""spark-submit entry point: BM25 top-k queries against a built index.

Usage:
    spark-submit --py-files miru_spark.zip jobs/query_job.py \
        --index-dir /path/to/index --query "spark AND join" [-k 10] \
        [--time-range 2024-01-01T00:00:00,2024-01-02T00:00:00] \
        [--queries-file queries.txt] [--json]

One line of output per query: rank, pid, doc_id, score, url (or a JSON
object per query with --json, including latency_ms).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_ts(s: str) -> int:
    dt = datetime.fromisoformat(s)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1_000_000)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--query", action="append", default=[])
    ap.add_argument("--queries-file")
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("--time-range", help="ISO8601 start,end")
    ap.add_argument("--locale", default=None)
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--no-blockmax", action="store_true")
    ap.add_argument(
        "--authz", action="append", default=None,
        help="granted access label (repeatable); docs must carry one",
    )
    ap.add_argument(
        "--constraints", default=None,
        help="extra filter query ANDed into every query (never scores)",
    )
    args = ap.parse_args()

    queries = list(args.query)
    if args.queries_file:
        with open(args.queries_file) as f:
            queries += [ln.strip() for ln in f if ln.strip()]
    if not queries:
        ap.error("no queries given")

    time_range_us = None
    if args.time_range:
        lo, hi = args.time_range.split(",")
        time_range_us = (_parse_ts(lo), _parse_ts(hi))

    from pyspark.sql import SparkSession

    from miru_spark.query.engine import SearchEngine

    spark = SparkSession.builder.appName("miru_query").getOrCreate()
    try:
        from miru_spark.session import package_zip

        spark.sparkContext.addPyFile(package_zip())
    except Exception:
        pass

    eng = SearchEngine(spark, args.index_dir)
    if len(queries) > 1:
        eng.cache()
    for q in queries:
        t0 = time.time()
        rows = eng.search(
            q,
            k=args.k,
            locale=args.locale,
            time_range_us=time_range_us,
            use_blockmax=not args.no_blockmax,
            constraints=args.constraints,
            authz=args.authz,
        ).collect()
        ms = (time.time() - t0) * 1000
        if args.json:
            print(
                json.dumps(
                    {
                        "query": q,
                        "latency_ms": round(ms, 1),
                        "results": [
                            {
                                "rank": i + 1,
                                "pid": r["pid"],
                                "doc_id": r["doc_id"],
                                "score": round(r["score"], 6),
                                "url": r["url"],
                            }
                            for i, r in enumerate(rows)
                        ],
                    }
                )
            )
        else:
            print(f"# {q}  ({ms:.0f} ms)")
            for i, r in enumerate(rows):
                print(
                    f"{i + 1}\t{r['pid']}\t{r['doc_id']}\t"
                    f"{r['score']:.6f}\t{r['url']}"
                )


if __name__ == "__main__":
    main()
