#!/usr/bin/env python
"""Stage-by-stage noop profile of the single-pass build pipeline.

  scan    - corpus scan + projection
  window  - + docID minting exchange/sort
  indexed - + tokenize/invert/encode worker (Arrow out + python + Arrow in)
  sorted  - + sortWithinPartitions(row_type, pid, term, blk, doc_id)
  written - + zstd parquet write to disk

PROFILE_CPUS=8 [PROFILE_SHM=1] python scripts/profile_pipeline.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("PROFILE_CPUS", "8"))
CORPUS_DIR = os.environ.get("PROFILE_CORPUS_DIR", "/tmp/exp_corpus_2m")
SHUF = int(os.environ.get("PROFILE_SHUFFLE_PARTITIONS", "64"))


def main() -> None:
    from pyspark.sql import functions as F

    from miru_spark.index.build import (
        _make_indexer,
        _with_pid,
        _SEGMENT_SCHEMA,
    )
    from miru_spark.session import get_spark

    extra = {"spark.driver.memory": "32g"}
    if os.environ.get("PROFILE_SHM") == "1":
        shm = "/dev/shm/spark_local"
        os.makedirs(shm, exist_ok=True)
        extra["spark.local.dir"] = shm
    spark = get_spark(
        app_name="profile_pipeline",
        master=f"local[{CPUS}]",
        shuffle_partitions=SHUF,
        extra_conf=extra,
    )
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    wt = spark.read.parquet(CORPUS_DIR)

    t: dict[str, float] = {}

    def noop(df, name):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t[name] = round(time.time() - t0, 1)

    # the current single-exchange pipeline (index/build.py::build_index):
    # pid stamp -> ONE hash repartition on pid -> in-worker Arrow sort +
    # mint + invert + encode (term-major output, no JVM sort anywhere)
    if "authz" not in wt.columns:
        wt = wt.withColumn("authz", F.lit(None).cast("array<string>"))
    if "fields" not in wt.columns:
        wt = wt.withColumn(
            "fields", F.lit(None).cast("map<string,array<string>>")
        )
    pid_df = _with_pid(wt, int(os.environ.get("PROFILE_PARTITION_SECONDS", "14400")))
    sub = pid_df.select(
        "pid", "url", "warc_us", "lang", "text", "authz", "fields"
    ).repartition(SHUF, "pid")
    seg = sub.mapInArrow(_make_indexer(4096), _SEGMENT_SCHEMA)

    noop(wt.select("url", "warc_ts", "lang", "text"), "scan")
    noop(sub, "exchanged")
    noop(seg, "indexed")
    out = tempfile.mkdtemp(prefix="profile_seg_")
    t0 = time.time()
    seg.write.mode("overwrite").option(
        "compression", "zstd"
    ).parquet(out)
    t["written"] = round(time.time() - t0, 1)
    shutil.rmtree(out, ignore_errors=True)

    print(json.dumps({"cpus": CPUS, "shm": os.environ.get("PROFILE_SHM", "0"), **t}))
    spark.stop()


if __name__ == "__main__":
    main()
