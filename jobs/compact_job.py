#!/usr/bin/env python
"""spark-submit entry point: index maintenance (segment + tombstone-log
compaction).

Usage:
    spark-submit --py-files miru_spark.zip jobs/compact_job.py \
        --index-dir /path/to/index [--max-unit-bytes 268435456] \
        [--target-partitions N] [--target-file-bytes 134217728] \
        [--no-removals] [--retire-before-us EPOCH_US]

Full pass by default; --max-unit-bytes runs a tiered pass (only
sub-threshold commit units merge -- the Lucene merge-policy shape, so a
scheduled maintenance run costs ingest-proportional work, never an
index rewrite). Prints ONE JSON report line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dir", required=True)
    ap.add_argument(
        "--max-unit-bytes", type=int, default=None,
        help="tiered pass: merge only commit units smaller than this",
    )
    ap.add_argument(
        "--target-partitions", type=int, default=None,
        help="explicit output file count (default: size-based)",
    )
    ap.add_argument(
        "--target-file-bytes", type=int, default=128 * 1024 * 1024,
        help="size-based output sizing target (default 128 MiB)",
    )
    ap.add_argument(
        "--no-removals", action="store_true",
        help="skip the tombstone-log compaction",
    )
    ap.add_argument(
        "--retire-before-us", type=int, default=None,
        help="advance the retention watermark to this epoch-microsecond "
        "cutoff before compacting, so the pass physically reclaims the "
        "expired pids (index/retention.py)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from miru_spark.index.compact import compact_index

    spark = SparkSession.builder.appName("miru_compact").getOrCreate()
    try:
        from miru_spark.session import package_zip

        spark.sparkContext.addPyFile(package_zip())
    except Exception:
        pass

    t0 = time.time()
    if args.retire_before_us is not None:
        from miru_spark.index.retention import set_retention

        set_retention(args.index_dir, args.retire_before_us)
    rep = compact_index(
        spark,
        args.index_dir,
        target_partitions=args.target_partitions,
        target_file_bytes=args.target_file_bytes,
        max_unit_bytes=args.max_unit_bytes,
        removals=not args.no_removals,
    )
    rep["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(rep))


if __name__ == "__main__":
    main()
