#!/usr/bin/env python
"""spark-submit entry point: build (or resume) the inverted index.

Usage (cluster):
    spark-submit --py-files miru_spark.zip jobs/build_index_job.py \
        --input /path/to/webtext_parquet --index-dir /path/to/index \
        [--partition-seconds 86400] [--block-span 4096] [--no-resume] \
        [--synthetic N]

`--input` reads a parquet/Iceberg-table path with the webtext schema
(url, warc_ts, html, text, lang); `--synthetic N` generates the
deterministic N-row corpus instead (benchmarks). The job is resumable:
re-running skips partitions whose lineage rows are complete
(FullTextGatherer.java:176-252 checkpoint pattern).

Build the zip with:  python -c "from miru_spark.session import package_zip; print(package_zip())"
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="webtext parquet path")
    ap.add_argument("--synthetic", type=int, help="generate N synthetic rows")
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--partition-seconds", type=int, default=86400)
    ap.add_argument("--block-span", type=int, default=4096)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--batch-partitions", type=int, default=None)
    args = ap.parse_args()
    if not args.input and not args.synthetic:
        ap.error("one of --input / --synthetic is required")

    from pyspark.sql import SparkSession

    from miru_spark.index.build import build_index
    from miru_spark.webtext import webtext_df

    spark = SparkSession.builder.appName("miru_build_index").getOrCreate()
    try:
        from miru_spark.session import package_zip

        spark.sparkContext.addPyFile(package_zip())
    except Exception:
        pass  # running under --py-files already

    if args.synthetic:
        wt = webtext_df(spark, args.synthetic)
    else:
        wt = spark.read.parquet(args.input)

    report = build_index(
        spark,
        wt,
        args.index_dir,
        partition_seconds=args.partition_seconds,
        block_span=args.block_span,
        batch_partitions=args.batch_partitions,
        resume=not args.no_resume,
    )
    print(
        json.dumps(
            {
                "n_docs": report.n_docs,
                "pids_built": len(report.pids_built),
                "pids_skipped": len(report.pids_skipped),
                "wall_time_s": round(report.wall_time_s, 2),
                "docs_per_sec": round(
                    report.n_docs / report.wall_time_s, 1
                )
                if report.wall_time_s
                else None,
            }
        )
    )


if __name__ == "__main__":
    main()
