"""Streaming analytics waveform: watermarked windowed counts.

The reference's analytics plugin answers "events per time bucket per key"
over a closed partition (Analytics.analyze,
miru-analytics-plugins/.../Analytics.java:57-201); its writer side keeps
the open partition hot by tailing the WAL. The Spark-native streaming
form of the same waveform is a Structured Streaming windowed aggregation:

- `readStream` over the growing events directory (at scale: Kafka or an
  Iceberg table -- same plan, different source)
- `withWatermark(ts, delay)` bounds how late a row may arrive and lets
  Spark finalize + evict window state (the reference's analog is the
  partition rolling closed: once closed, late writers error --
  MiruPartitionState.java:10-15; here late-beyond-watermark rows are
  DROPPED, counted by the `numDroppedRows` metric)
- append output mode emits each (key, window) exactly once, when the
  watermark passes the window end -- so the sink is an immutable parquet
  log of finalized buckets, safe to serve without read-side dedup

State scale note: state size is O(open windows x keys), independent of
total stream length -- the watermark evicts everything older, so this
runs forever on a 100 TB/day stream without unbounded state. The shuffle
is the normal streaming-agg hash exchange on (key, window); skewed keys
salt exactly like the batch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def run_batches(q) -> int:
    """Batches run by THIS RUN of a finished availableNow query.

    batchId is cumulative across restarts of the same checkpoint, so
    `lastProgress.batchId + 1` would report every prior run's batches
    too on a resumed query. `recentProgress` is per-run (a fresh buffer
    per StreamingQuery start), so this run's batch count is
    last.batchId - recentProgress[0].batchId + 1 -- exact whenever the
    run fits the progress retention window
    (spark.sql.streaming.numRecentProgressUpdates, default 100), an
    at-least count beyond it. Per-batch SUMS over recentProgress (e.g.
    dropped_late) likewise see only that window -- callers report them
    as at-least counts."""
    rp = q.recentProgress
    last = q.lastProgress
    if last is None:
        return len(rp)
    last_id = int(last["batchId"])
    if rp:
        return last_id - int(rp[0]["batchId"]) + 1
    return 1


def waveform_stream(
    events: DataFrame,
    bucket: str = "1 day",
    watermark: str = "2 days",
    key: str = "event_type",
) -> DataFrame:
    """Windowed count waveform over a *streaming* events frame.

    Pure plan constructor (works on batch frames too, minus the
    watermark), so tests and callers compose sources/sinks around it.
    """
    df = events
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.col(key), F.window("ts", bucket).alias("win"))
        .agg(F.count("*").cast("long").alias("cnt"))
        .select(
            key,
            F.col("win.start").alias("bucket_start"),
            F.col("win.end").alias("bucket_end"),
            "cnt",
        )
    )


def stream_waveform(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    bucket: str = "1 day",
    watermark: str = "2 days",
    key: str = "event_type",
    max_files_per_trigger: int | None = None,
) -> dict:
    """Consume all new event files (availableNow) and append finalized
    waveform buckets to `output_dir`.

    Exactly-once file-level consumption via the streaming checkpoint
    (same cursor mechanism as streaming.sip). Returns counters:
    `n_batches` micro-batches ran, `dropped_late` rows discarded for
    arriving later than the watermark allows.
    """
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    events = reader.parquet(input_dir)
    q = (
        waveform_stream(events, bucket, watermark, key)
        .writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .format("parquet")
        .option("path", output_dir)
        .start()
    )
    q.awaitTermination()
    dropped = 0
    for prog in q.recentProgress:
        op = (prog.get("stateOperators") or [{}])[0]
        dropped += int(op.get("numRowsDroppedByWatermark", 0) or 0)
    return {"n_batches": run_batches(q), "dropped_late": dropped}
