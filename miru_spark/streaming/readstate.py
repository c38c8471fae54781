"""Streaming read-state: READ/UNREAD/MARK_ALL_READ ops arriving after the
inbox is built, merged into a compact state table.

The reference applies these WAL activity types to live per-user unread
bitmaps as they stream in (MiruPartitionedActivity.java:17-19 READ/UNREAD
/MARK_ALL_READ; MiruJustInTimeBackfillerizer applies them against the
inbox index). Spark analog: readStream over the append-only op log ->
foreachBatch MERGE into a state table holding exactly what unread
resolution needs:

    explicit rows: (user_id, item, op, ts, seq)   latest per (user, item)
    markall rows:  (user_id, NULL,  'mark_all_read', max ts, -1) per user

State size is O(users x touched items), independent of op-log length --
the MERGE keeps only the newest op per key (latest-op-wins, same rule as
ops.readstate.latest_explicit). Commit is write-temp + atomic rename, so
readers never see a half-written state. At scale the state table
partitions by hash(user_id) and the MERGE rewrites only partitions the
batch touches (here: single dir, the local-fs stand-in).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..ops.readstate import READLOG_SCHEMA


def _merge_state(old: DataFrame | None, batch: DataFrame) -> DataFrame:
    allrows = batch if old is None else old.unionByName(batch)
    explicit = allrows.filter(F.col("op").isin("read", "unread"))
    w = Window.partitionBy("user_id", "item").orderBy(
        F.desc("ts"), F.desc("seq")
    )
    latest = (
        explicit.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    markall = (
        allrows.filter(F.col("op") == "mark_all_read")
        .groupBy("user_id")
        .agg(F.max("ts").alias("ts"))
        .select(
            "user_id",
            F.lit(None).cast("long").alias("item"),
            F.lit("mark_all_read").alias("op"),
            "ts",
            F.lit(-1).cast("long").alias("seq"),
        )
    )
    return latest.unionByName(markall)


def read_state(spark: SparkSession, state_dir: str) -> DataFrame | None:
    if not os.path.isdir(state_dir) or not any(
        f.endswith(".parquet") for f in os.listdir(state_dir)
    ):
        return None
    return spark.read.parquet(state_dir)


def stream_read_state(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
) -> int:
    """Drain the op-log stream (availableNow) into the state table.
    Restartable: the checkpoint advances only after a batch's state
    commit, and the MERGE is idempotent under replay (latest-op-wins is
    insensitive to re-applying the same rows). Returns batches merged."""
    n = {"batches": 0}

    def sink(batch_df, batch_id: int) -> None:
        old = read_state(spark, state_dir)
        if old is not None:
            # pin the old state in memory before the rename clobbers its
            # files (local-fs stand-in for snapshot isolation)
            old = spark.createDataFrame(
                old.collect(), schema=READLOG_SCHEMA
            )
        merged = _merge_state(old, batch_df)
        tmp = f"{state_dir}.tmp-{uuid.uuid4().hex[:8]}"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
        shutil.rmtree(state_dir, ignore_errors=True)
        os.rename(tmp, state_dir)
        n["batches"] += 1

    q = (
        spark.readStream.schema(READLOG_SCHEMA)
        .parquet(input_dir)
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    q.awaitTermination()
    return n["batches"]


def unread_counts_from_state(
    inbox: DataFrame, state: DataFrame | None
) -> DataFrame:
    """Inbox ops consume the STATE TABLE, not event history: unread counts
    per user given the merged read-state (None = nothing read yet)."""
    from ..ops.readstate import unread_counts

    if state is None:
        return inbox.groupBy("user_id").agg(
            F.countDistinct("item").cast("long").alias("n_unread")
        )
    return unread_counts(inbox, state)
