"""applyInPandasWithState latest-per-entity: stream upserts across two
checkpointed runs converge to exactly the batch ev_aggregate_counts
answer (latest = max (ts, event_id), n_events = total)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from miru_spark.streaming.analytics import EVENTS_SCHEMA
from miru_spark.streaming.stateful import stream_latest_per_entity

D0 = dt.datetime(2024, 3, 1)


def _rows(start_id, spec):
    """spec: (user_id, hour_offset) pairs."""
    return [
        (
            start_id + i,
            D0 + dt.timedelta(hours=h),
            u,
            "click",
            1.0,
            "{}",
        )
        for i, (u, h) in enumerate(spec)
    ]


def _batch_oracle(spark, all_rows):
    ev = spark.createDataFrame(all_rows, EVENTS_SCHEMA)
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    latest = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", "event_id")
    )
    counts = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    return {
        r["user_id"]: (r["ts"], r["event_id"], r["n"])
        for r in latest.join(counts, "user_id").collect()
    }


def test_stateful_latest_matches_batch_across_restarts(spark, tmp_path):
    d_in, d_out, d_ck = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt"),
    )
    # run 1: users 1..3
    rows1 = _rows(100, [(1, 0), (1, 5), (2, 3), (3, 1), (3, 1)])
    spark.createDataFrame(rows1, EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(d_in)
    assert stream_latest_per_entity(spark, d_in, d_out, d_ck) >= 1

    # run 2 (fresh query, state restored from checkpoint): user 2 gets a
    # newer event, user 1 an OLDER one (latest must not regress), user 4
    # is new
    rows2 = _rows(200, [(2, 9), (1, 2), (4, 7)])
    spark.createDataFrame(rows2, EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(d_in)
    stream_latest_per_entity(spark, d_in, d_out, d_ck)

    log = spark.read.parquet(d_out)
    w = Window.partitionBy("user_id").orderBy(F.desc("batch_id"))
    live = (
        log.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    )
    got = {
        r["user_id"]: (r["latest_ts"], r["latest_event_id"], r["n_events"])
        for r in live
    }
    want = _batch_oracle(spark, rows1 + rows2)
    assert got == want
    # ties broke on event_id: user 3 has two rows at the same ts
    assert got[3][1] == 104
    # older row merged into counts without regressing latest
    assert got[1] == (D0 + dt.timedelta(hours=5), 101, 3)
