"""Stateful streaming latest-per-entity via applyInPandasWithState.

The reference's AggregateCounts stream page tracks, per aggregate entity,
the latest activity and how many versions it has seen (AggregateCounts.java,
query shape AggregateCountsQuery.java:15-23); its writer keeps that hot by
replaying the WAL into the open partition. The streaming-native form is a
keyed state machine: per key, state = (latest_ts, latest_event_id,
n_events), updated per micro-batch, emitted in update mode whenever it
changes.

This is the `applyInPandasWithState` pattern (Arrow-batched per-group
pandas, explicit GroupState) rather than a windowed agg, because the
state is NOT time-bucketed -- it is one row per live entity, updated
forever. State scale: O(distinct keys), partitioned by the grouping hash
across executors; a 10^9-entity stream shards its state the same way the
shuffle does, and RocksDB state store (config, not code) moves it off
heap at that scale.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from .analytics import EVENTS_SCHEMA

_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("latest_ts", TimestampType()),
        StructField("latest_event_id", LongType()),
        StructField("n_events", LongType()),
    ]
)
_STATE_SCHEMA = StructType(
    [
        StructField("latest_us", LongType()),
        StructField("latest_event_id", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _update_latest(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Merge this micro-batch's rows for one key into its GroupState.

    Latest = max (ts, event_id) tuple, matching the batch op's window
    order (events_ops.ev_aggregate_counts) so stream and batch agree on
    ties exactly.
    """
    latest_us, latest_eid, n = (
        state.get if state.exists else (None, None, 0)
    )
    for pdf in pdfs:
        if not len(pdf):
            continue
        n += len(pdf)
        us = (pdf["ts"].astype("datetime64[us]").astype("int64")).to_numpy()
        eid = pdf["event_id"].to_numpy()
        i = max(range(len(pdf)), key=lambda j: (us[j], eid[j]))
        cand = (int(us[i]), int(eid[i]))
        if latest_us is None or cand > (latest_us, latest_eid):
            latest_us, latest_eid = cand
    state.update((latest_us, latest_eid, n))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "latest_ts": [pd.Timestamp(latest_us, unit="us")],
            "latest_event_id": [latest_eid],
            "n_events": [n],
        }
    )


def latest_per_entity_stream(events) -> Any:
    """Plan constructor: streaming events frame -> update-mode upserts."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_latest,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def write_changefeed_batch(batch_df, output_dir: str, batch_id: int) -> None:
    """Idempotent changefeed sink under foreachBatch's at-least-once
    replay: each batch owns its `batch_id=` partition dir, so a batch
    re-run after a crash-before-checkpoint OVERWRITES itself instead of
    appending duplicate rows (readers take max(batch_id) per key, which
    duplicate appends would double)."""
    batch_df.write.mode("overwrite").parquet(
        f"{output_dir}/batch_id={batch_id}"
    )


def stream_latest_per_entity(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
) -> int:
    """Consume new event files (availableNow) and append every state
    upsert to `output_dir` tagged with its micro-batch id. The live view
    is the row with the highest batch_id per key (the parquet log is the
    changefeed; at scale the sink would be an upsert store). Returns the
    number of micro-batches run; state survives restarts via the
    checkpoint, so a second call continues counting where the first
    stopped."""
    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    upserts = latest_per_entity_stream(events)

    def sink(batch_df, batch_id: int) -> None:
        write_changefeed_batch(batch_df, output_dir, batch_id)

    q = (
        upserts.writeStream.outputMode("update")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    q.awaitTermination()
    from .analytics import run_batches

    return run_batches(q)
