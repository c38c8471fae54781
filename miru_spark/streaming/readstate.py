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
ops.readstate.latest_explicit).

Layout (the commit-unit pattern index/build.py uses for segments): the
state dir holds epoch directories `e_<batch>_<uid>/bucket=<b>/` -- each
bucket is hash(user_id) % n_buckets -- plus a MANIFEST json mapping every
bucket to the epoch that holds its current rows. A batch MERGEs only the
buckets it touches: read those buckets' old rows (as a lazy relation --
the state NEVER materializes on the driver), union the batch, keep the
newest op per key, write them into a NEW epoch, then atomically swap the
manifest (os.replace). Untouched buckets keep their existing files
byte-for-byte; epochs no longer referenced by the current or previous
manifest are vacuumed. At 100x state size this scales like any
hash-partitioned MERGE sink: per-batch work is O(touched buckets), the
swap is one rename, and readers always see a complete manifest.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..ops.readstate import READLOG_SCHEMA

_MANIFEST = "MANIFEST"
_PREV = "MANIFEST.prev"


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


def _bucket_col(nb: int):
    return F.pmod(F.hash("user_id"), F.lit(nb)).cast("int")


def _load_manifest(state_dir: str) -> dict | None:
    return _load_manifest_file(os.path.join(state_dir, _MANIFEST))


def _bucket_paths(state_dir: str, manifest: dict, buckets=None) -> list:
    out = []
    for b, epoch in manifest["buckets"].items():
        if buckets is not None and int(b) not in buckets:
            continue
        p = os.path.join(state_dir, epoch, f"bucket={b}")
        if os.path.isdir(p):
            out.append(p)
    return out


def read_state(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Current state table as a lazy relation (None = nothing merged
    yet). Readers resolve the manifest once; the files it names are
    immutable (epochs are write-once), so a held DataFrame stays
    consistent for ONE further merge generation -- the vacuum keeps the
    current and previous manifests' epochs and deletes older ones, so
    re-resolve (call read_state again) rather than holding a DataFrame
    across many batches. At scale the epoch dirs would get snapshot-
    expiry retention like the index's commit units."""
    manifest = _load_manifest(state_dir)
    if manifest is None:
        return None
    paths = _bucket_paths(state_dir, manifest)
    if not paths:
        return None
    return spark.read.schema(READLOG_SCHEMA).parquet(*paths)


def stream_read_state(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    n_buckets: int = 32,
) -> int:
    """Drain the op-log stream (availableNow) into the state table.
    Restartable: the checkpoint advances only after a batch's manifest
    swap, and the MERGE is idempotent under replay (latest-op-wins is
    insensitive to re-applying the same rows). Returns batches merged.

    Nothing state-sized ever reaches the driver: the only collect is
    the batch's distinct bucket ids (<= n_buckets ints)."""
    n = {"batches": 0}
    os.makedirs(state_dir, exist_ok=True)

    def sink(batch_df, batch_id: int) -> None:
        manifest = _load_manifest(state_dir) or {
            "buckets": {}, "n_buckets": int(n_buckets),
        }
        nb = int(manifest["n_buckets"])
        batch_b = batch_df.withColumn("bucket", _bucket_col(nb))
        touched = sorted(
            r["bucket"]
            for r in batch_b.select("bucket").distinct().collect()
        )
        if not touched:
            n["batches"] += 1
            return
        old_paths = _bucket_paths(state_dir, manifest, set(touched))
        old = (
            spark.read.schema(READLOG_SCHEMA).parquet(*old_paths)
            if old_paths
            else None
        )
        merged = _merge_state(old, batch_b.drop("bucket")).withColumn(
            "bucket", _bucket_col(nb)
        )
        epoch = f"e_{batch_id}_{uuid.uuid4().hex[:8]}"
        (
            merged.repartition("bucket")
            .write.partitionBy("bucket")
            .mode("overwrite")
            .parquet(os.path.join(state_dir, epoch))
        )
        new_buckets = dict(manifest["buckets"])
        for b in touched:
            # a touched bucket can still be empty after the merge (ops
            # cancelling out is impossible here, but a bucket whose only
            # rows were non-explicit could be); keep the mapping only if
            # the epoch actually wrote it
            if os.path.isdir(
                os.path.join(state_dir, epoch, f"bucket={b}")
            ):
                new_buckets[str(b)] = epoch
        new_manifest = {"buckets": new_buckets, "n_buckets": nb}
        tmp = os.path.join(state_dir, f".manifest-{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            json.dump(new_manifest, f)
        prev_path = os.path.join(state_dir, _MANIFEST)
        if os.path.isfile(prev_path):
            shutil.copy(prev_path, os.path.join(state_dir, _PREV))
        os.replace(tmp, os.path.join(state_dir, _MANIFEST))
        # vacuum epochs referenced by neither the current nor the
        # previous manifest (one generation of reader grace)
        keep = set(new_buckets.values())
        prev = _load_manifest_file(os.path.join(state_dir, _PREV))
        if prev:
            keep |= set(prev["buckets"].values())
        keep.add(epoch)
        for d in os.listdir(state_dir):
            if d.startswith("e_") and d not in keep:
                shutil.rmtree(
                    os.path.join(state_dir, d), ignore_errors=True
                )
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


def _load_manifest_file(path: str) -> dict | None:
    if not os.path.isfile(path):
        return None
    with open(path) as f:
        return json.load(f)


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
