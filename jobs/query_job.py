#!/usr/bin/env python
"""spark-submit entry point: BM25 top-k queries against a built index.

Usage:
    spark-submit --py-files miru_spark.zip jobs/query_job.py \
        --index-dir /path/to/index --query "spark AND join" [-k 10] \
        [--time-range 2024-01-01T00:00:00,2024-01-02T00:00:00] \
        [--queries-file queries.txt] [--json] \
        [--mode search|count|waveform|distincts|explain] \
        [--bucket-seconds 86400] [--field lang]

One line of output per query: rank, pid, doc_id, score, url (or a JSON
object per query with --json, including latency_ms). Non-search modes
always print one JSON object per query; with no --query they run
match-all (count the corpus, its waveform, a whole-field facet).
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
    ap.add_argument(
        "--mode", choices=["search", "count", "waveform", "distincts",
                           "metrics", "trending", "aggregate",
                           "explain", "features", "reco", "strut",
                           "inbox"],
        default="search",
        help="search = ranked top-k (default); count = exact match "
        "count; waveform = per-time-bucket match counts; distincts = "
        "faceted field-value counts; metrics = per-bucket sum/avg of a "
        "numeric field; trending = strategy-ranked field values; "
        "aggregate = stream page (newest doc per value + counts); "
        "explain = plan report, no query; features = field-tuple "
        "co-occurrence counts (--field + --field2 [+ --field3]); "
        "reco = collaborative filtering (--my f:v, --field/--field2/"
        "--field3); strut = presence-scored candidates (--field + "
        "repeatable --feature scalar:field); inbox = stream page "
        "(--stream-id, --field item field, [--read-state dir])",
    )
    ap.add_argument(
        "--bucket-seconds", type=int, default=86400,
        help="waveform/metrics bucket width (default 1 day)",
    )
    ap.add_argument(
        "--field", default=None,
        help="distincts/metrics: the facet / numeric field",
    )
    ap.add_argument(
        "--kind", choices=["sum", "avg"], default="sum",
        help="metrics aggregation (default sum)",
    )
    ap.add_argument(
        "--strategy",
        choices=["linear_regression", "peaks", "highest_peak", "leader",
                 "unit_weighted", "regression_weighted", "max"],
        default="linear_regression",
        help="trending ranking strategy / strut finalize strategy",
    )
    ap.add_argument(
        "--start", type=int, default=0,
        help="aggregate/inbox: page offset (startFromDistinctN)",
    )
    ap.add_argument("--field2", default=None,
                    help="features/reco: second field")
    ap.add_argument("--field3", default=None,
                    help="features (optional) / reco: third field")
    ap.add_argument("--my", default=None,
                    help="reco: my activity as field:value")
    ap.add_argument(
        "--feature", action="append", default=None,
        help="strut feature as scalar:field (repeatable)",
    )
    ap.add_argument("--stream-id", default=None, help="inbox stream id")
    ap.add_argument("--stream-field", default="stream",
                    help="inbox: composed stream field (default stream)")
    ap.add_argument(
        "--read-state", default=None,
        help="inbox: streamed read-state table dir",
    )
    ap.add_argument(
        "--unread-only", action="store_true",
        help="inbox: page only unread items",
    )
    args = ap.parse_args()

    queries = list(args.query)
    if args.queries_file:
        with open(args.queries_file) as f:
            queries += [ln.strip() for ln in f if ln.strip()]
    _FIELD_MODES = ("distincts", "metrics", "trending", "aggregate",
                    "features", "reco", "strut", "inbox")
    if not queries:
        if args.mode in ("count", "waveform") + _FIELD_MODES:
            queries = [None]  # match-all
        else:
            ap.error("no queries given")
    if args.mode in _FIELD_MODES and not args.field:
        ap.error(f"--mode {args.mode} requires --field")
    if args.mode == "features" and not args.field2:
        ap.error("--mode features requires --field2")
    if args.mode == "reco" and not (
        args.my and args.field2 and args.field3
    ):
        ap.error("--mode reco requires --my, --field2, --field3")
    if args.mode == "inbox" and not args.stream_id:
        ap.error("--mode inbox requires --stream-id")

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
    if args.mode != "search":
        for q in queries:
            t0 = time.time()
            kw = dict(
                locale=args.locale,
                time_range_us=time_range_us,
                constraints=args.constraints,
                authz=args.authz,
            )
            if args.mode == "count":
                res = eng.count(q, **kw)
            elif args.mode == "waveform":
                res = eng.waveform(q, args.bucket_seconds, **kw)
            elif args.mode == "distincts":
                res = eng.distincts(args.field, q, **kw)
            elif args.mode == "metrics":
                res = eng.metrics(
                    args.field, q, args.bucket_seconds, args.kind, **kw
                )
            elif args.mode == "trending":
                res = eng.trending(
                    args.field, q, args.bucket_seconds, args.strategy,
                    top_n=args.k, **kw
                )
            elif args.mode == "aggregate":
                res = eng.aggregate_counts(
                    args.field, q, args.start, args.k, **kw
                )
            elif args.mode == "features":
                flds = [args.field, args.field2] + (
                    [args.field3] if args.field3 else []
                )
                res = eng.gather_features(
                    tuple(flds), query=q, top_n=args.k, **kw
                )
                res = [[list(v), c] for v, c in res]
            elif args.mode == "reco":
                f, v = args.my.split(":", 1)
                res = eng.reco(
                    (f, v), args.field, args.field2, args.field3,
                    k=args.k, **kw
                )
            elif args.mode == "strut":
                if not args.feature:
                    ap.error("--mode strut requires --feature")
                feats = [
                    (float(s.split(":", 1)[0]), s.split(":", 1)[1])
                    for s in args.feature
                ]
                strat = (
                    args.strategy
                    if args.strategy in ("unit_weighted",
                                         "regression_weighted", "max")
                    else "unit_weighted"
                )
                res = eng.strut(
                    args.field, feats, k=args.k, query=q,
                    strategy=strat, **kw
                )
            elif args.mode == "inbox":
                res = eng.inbox(
                    args.stream_id, item_field=args.field,
                    stream_field=args.stream_field, query=q,
                    start=args.start, count=args.k,
                    unread_only=args.unread_only,
                    read_state=args.read_state, **kw
                )
            else:
                res = eng.explain(
                    q, k=args.k, locale=args.locale,
                    time_range_us=time_range_us,
                    constraints=args.constraints, authz=args.authz,
                )
            ms = (time.time() - t0) * 1000
            print(
                json.dumps(
                    {
                        "mode": args.mode,
                        "query": q,
                        "latency_ms": round(ms, 1),
                        "result": res,
                    }
                )
            )
        return

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
