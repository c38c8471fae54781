"""Watermarked streaming waveform == batch waveform for finalized
windows; late-beyond-watermark rows are dropped (the streaming analog of
writing into a closed partition). FIXTURES.md §3 streaming invariants."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from miru_spark.streaming.analytics import (
    EVENTS_SCHEMA,
    stream_waveform,
    waveform_stream,
)

D0 = dt.datetime(2024, 1, 1)


def _rows(spec):
    """spec: list of (day_offset, hour, event_type) -> events rows."""
    out = []
    for i, (day, hour, et) in enumerate(spec):
        out.append(
            (
                i,
                D0 + dt.timedelta(days=day, hours=hour),
                i % 7,
                et,
                float(i),
                "{}",
            )
        )
    return out


def _write(spark, rows, path):
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("stream_wave")
    return {
        "in": str(base / "events"),
        "out": str(base / "waveform"),
        "ckpt": str(base / "ckpt"),
    }


def test_stream_waveform_matches_batch_and_handles_late(spark, dirs):
    # batch 1: days 0..6, two keys
    spec1 = [(d, h, et) for d in range(7) for h in (1, 13)
             for et in ("click", "view")]
    _write(spark, _rows(spec1), dirs["in"])
    rep1 = stream_waveform(
        spark, dirs["in"], dirs["out"], dirs["ckpt"],
        bucket="1 day", watermark="2 days",
    )
    assert rep1["n_batches"] >= 1 and rep1["dropped_late"] == 0

    got1 = spark.read.parquet(dirs["out"])
    # append mode emits only windows finalized by the watermark:
    # watermark = max(ts) - 2 days = day6T13 - 2d; windows ending on or
    # before it (days 0..3) are out, days 4..6 still pending in state
    batch = (
        waveform_stream(
            spark.createDataFrame(_rows(spec1), EVENTS_SCHEMA)
        )
        .filter(F.col("bucket_end") <= F.lit(D0 + dt.timedelta(days=4, hours=13)))
    )
    assert sorted(map(tuple, got1.collect())) == sorted(
        map(tuple, batch.collect())
    )
    n_emitted_1 = got1.count()
    assert n_emitted_1 == 2 * 4  # 2 keys x days 0..3

    # batch 2: a fresh day-8 row advances the watermark; one late row
    # inside the watermark (day 6 -- still pending, must merge); one
    # beyond it (day 0 -- finalized + evicted, must be dropped)
    spec2 = [(8, 1, "click"), (6, 2, "click"), (0, 2, "click")]
    _write(spark, _rows(spec2), dirs["in"])
    rep2 = stream_waveform(
        spark, dirs["in"], dirs["out"], dirs["ckpt"],
        bucket="1 day", watermark="2 days",
    )
    assert rep2["dropped_late"] >= 1  # the day-0 straggler

    got2 = spark.read.parquet(dirs["out"])
    # watermark after batch 2 = day8T01 - 2d = day6T01: days 4..5 newly
    # finalized; day 6 (window end day7) still pending with the merged
    # late row. batch 3 pushes the watermark past day 7 to flush it.
    _write(spark, _rows([(10, 1, "view")]), dirs["in"])
    stream_waveform(
        spark, dirs["in"], dirs["out"], dirs["ckpt"],
        bucket="1 day", watermark="2 days",
    )
    got3 = spark.read.parquet(dirs["out"])
    day6_click = got3.filter(
        (F.col("bucket_start") == F.lit(D0 + dt.timedelta(days=6)))
        & (F.col("event_type") == "click")
    ).collect()
    assert len(day6_click) == 1
    # 2 on-time rows (hours 1, 13) + 1 late-but-in-watermark row
    assert day6_click[0]["cnt"] == 3
    # the beyond-watermark day-0 row did NOT produce a duplicate window
    day0_click = got3.filter(
        (F.col("bucket_start") == F.lit(D0))
        & (F.col("event_type") == "click")
    ).collect()
    assert len(day0_click) == 1 and day0_click[0]["cnt"] == 2

    # idempotent: no new files -> no new output rows
    n_before = got3.count()
    stream_waveform(
        spark, dirs["in"], dirs["out"], dirs["ckpt"],
        bucket="1 day", watermark="2 days",
    )
    assert spark.read.parquet(dirs["out"]).count() == n_before


def test_waveform_stream_plan_is_batch_compatible(spark):
    # the same plan constructor serves the batch path (no watermark)
    rows = _rows([(0, 1, "click"), (0, 2, "click"), (1, 1, "view")])
    out = waveform_stream(spark.createDataFrame(rows, EVENTS_SCHEMA))
    got = {(r["event_type"], r["bucket_start"].day): r["cnt"]
           for r in out.collect()}
    assert got == {("click", 1): 2, ("view", 2): 1}
