"""Streaming stumptown: the live newest-k page + finalized waveform
buckets converge to the batch answers across two checkpointed runs
(restart-safe state), ties broken exactly like the batch ORDER BY
(ts DESC, event_id DESC), k bound respected per key.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from miru_spark.streaming.analytics import EVENTS_SCHEMA
from miru_spark.streaming.stumptown import (
    read_newest_pages,
    stream_stumptown,
)

D0 = dt.datetime(2024, 3, 1)


def _rows(start_id, spec):
    """spec: (event_type, user_id, minute_offset) triples."""
    return [
        (
            start_id + i,
            D0 + dt.timedelta(minutes=m),
            u,
            et,
            1.0,
            "{}",
        )
        for i, (et, u, m) in enumerate(spec)
    ]


def _write(spark, d_in, rows, name):
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(d_in)
    del name


def test_streaming_stumptown_converges_to_batch(spark, tmp_path):
    d_in = str(tmp_path / "in")
    d_out = str(tmp_path / "out")
    d_ck = str(tmp_path / "ckpt")
    k = 3

    batch1 = _rows(100, [
        ("error", 1, 0), ("error", 2, 5), ("error", 3, 5),  # tie ts
        ("error", 4, 2), ("click", 9, 1),
    ])
    _write(spark, d_in, batch1, "b1")
    rep1 = stream_stumptown(
        spark, d_in, d_out, d_ck, k=k,
        bucket="10 minutes", watermark="5 minutes",
    )
    assert rep1["newest_batches"] >= 1

    # restart with a second file: newer events displace page entries,
    # a never-seen key appears
    batch2 = _rows(200, [
        ("error", 5, 30), ("error", 6, 31),
        ("view", 7, 32), ("click", 8, 40),
        # a LATE error inside the old window: must still page-rank by ts
        ("error", 9, 3),
    ])
    _write(spark, d_in, batch2, "b2")
    stream_stumptown(
        spark, d_in, d_out, d_ck, k=k,
        bucket="10 minutes", watermark="5 minutes",
    )

    all_rows = batch1 + batch2
    ev = spark.createDataFrame(all_rows, EVENTS_SCHEMA)
    pages = {
        et: [
            (r["ts"], r["event_id"], r["user_id"])
            for r in grp
        ]
        for et, grp in (
            (et, read_newest_pages(spark, d_out)
             .filter(F.col("event_type") == et).collect())
            for et in ("error", "click", "view")
        )
    }
    for et in ("error", "click", "view"):
        want = [
            (r["ts"], r["event_id"], r["user_id"])
            for r in ev.filter(F.col("event_type") == et)
            .orderBy(F.desc("ts"), F.desc("event_id"))
            .limit(k)
            .collect()
        ]
        assert pages[et] == want, f"{et}: {pages[et]} != {want}"
        assert len(pages[et]) <= k

    # finalized waveform buckets match the batch window counts for the
    # closed windows that were emitted
    wf = spark.read.parquet(f"{d_out}/waveform")
    got = {
        (r["event_type"], r["bucket_start"]): r["cnt"]
        for r in wf.collect()
    }
    assert got, "watermark should have finalized at least one bucket"
    batch_wf = {
        (r["event_type"], r["window"]["start"]): r["cnt"]
        for r in ev.groupBy(
            "event_type", F.window("ts", "10 minutes").alias("window")
        )
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    for key_, cnt in got.items():
        assert batch_wf[key_] == cnt
