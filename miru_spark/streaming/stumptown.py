"""Streaming stumptown: live newest-k + windowed waveform per key.

The stumptown deployable is a live log viewer: its writer tails the
WAL into the open partition and every query answers "the newest K
events matching a filter, plus the match waveform"
(miru-stumptown-plugins/.../Stumptown.java:37-73,
StumptownQuestion.java). The streaming-native form keeps both answers
HOT instead of recomputing them per query:

- newest-k: a keyed `applyInPandasWithState` state machine whose state
  is the bounded top-k (ts, event_id, user_id) list per key -- O(k)
  state per key, merged per micro-batch by (ts, event_id) descending,
  ties exactly like the batch `ORDER BY ts DESC, event_id DESC`. At
  10^9 events/day the state is still keys x k rows, sharded by the
  grouping hash like any shuffle.
- waveform: the existing watermarked windowed count
  (streaming/analytics.waveform_stream -- append-mode finalized
  buckets, late-beyond-watermark drops).

Two streaming queries over the same file source (each checkpointed,
both availableNow-driven by `stream_stumptown`) -- Structured
Streaming's analog of the reference keeping the inbox-style aux
answers warm while the analytics rollup runs beside it.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from .analytics import EVENTS_SCHEMA, waveform_stream

_OUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("rank", LongType()),
        StructField("ts", TimestampType()),
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
    ]
)
_STATE_SCHEMA = StructType(
    [
        StructField("us", ArrayType(LongType())),
        StructField("event_ids", ArrayType(LongType())),
        StructField("user_ids", ArrayType(LongType())),
    ]
)


def _make_update(k: int):
    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        us, eids, uids = (
            state.get if state.exists else ([], [], [])
        )
        rows = list(zip(us, eids, uids))
        for pdf in pdfs:
            if not len(pdf):
                continue
            t = (
                pdf["ts"].astype("datetime64[us]").astype("int64")
            ).tolist()
            rows.extend(
                zip(t, pdf["event_id"].tolist(), pdf["user_id"].tolist())
            )
        # newest-k by (ts, event_id) desc -- the batch tie order
        rows.sort(key=lambda r: (-r[0], -r[1]))
        rows = rows[:k]
        state.update(
            (
                [r[0] for r in rows],
                [r[1] for r in rows],
                [r[2] for r in rows],
            )
        )
        yield pd.DataFrame(
            {
                "event_type": [key[0]] * len(rows),
                "rank": list(range(1, len(rows) + 1)),
                "ts": [pd.Timestamp(r[0], unit="us") for r in rows],
                "event_id": [r[1] for r in rows],
                "user_id": [r[2] for r in rows],
            }
        )

    return update


def newest_k_stream(events, k: int = 10) -> Any:
    """Plan constructor: streaming events -> per-event_type newest-k
    page, re-emitted (update mode) whenever the page changes."""
    return events.groupBy("event_type").applyInPandasWithState(
        _make_update(int(k)),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_stumptown(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    k: int = 10,
    bucket: str = "1 hour",
    watermark: str = "2 hours",
) -> dict:
    """Consume new event files (availableNow) and keep BOTH stumptown
    answers hot: `<output_dir>/newest` is the newest-k changefeed (the
    live page is each key's rows from its highest batch_id) and
    `<output_dir>/waveform` appends finalized watermarked buckets.
    State survives restarts via the two checkpoints; a second call
    continues where the first stopped. Returns micro-batch counts."""
    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)

    def sink(batch_df, batch_id: int) -> None:
        from .stateful import write_changefeed_batch

        write_changefeed_batch(batch_df, f"{output_dir}/newest", batch_id)

    q1 = (
        newest_k_stream(events, k)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{checkpoint_dir}/newest")
        .start()
    )
    q2 = (
        waveform_stream(
            spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir),
            bucket=bucket,
            watermark=watermark,
        )
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", f"{output_dir}/waveform")
        .option("checkpointLocation", f"{checkpoint_dir}/waveform")
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination()
    q2.awaitTermination()
    from .analytics import run_batches

    return {
        "newest_batches": run_batches(q1),
        "waveform_batches": run_batches(q2),
    }


def read_newest_pages(spark: SparkSession, output_dir: str):
    """Materialize the live newest-k pages from the changefeed: each
    key's rows from its highest batch_id, rank-ordered."""
    log = spark.read.parquet(f"{output_dir}/newest")
    latest = log.groupBy("event_type").agg(
        F.max("batch_id").alias("batch_id")
    )
    return (
        log.join(F.broadcast(latest), ["event_type", "batch_id"])
        .drop("batch_id")
        .orderBy("event_type", "rank")
    )
