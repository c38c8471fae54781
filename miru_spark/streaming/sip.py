"""Incremental ("sip") index builds via Structured Streaming.

The reference tails its WAL with a sip cursor and appends to the open
partition (MiruWALClient.sipActivity, miru-api/.../wal/MiruWALClient.java:68;
SipMigrateIndexRunnable, miru-service/.../MiruLocalHostedPartition.java:1013).
The Spark-native analog:

- the input is a growing directory of webtext parquet files (at scale: an
  Iceberg table; new snapshots = new WAL entries)
- `spark.readStream.parquet` + `Trigger.AvailableNow` + a checkpoint
  directory gives exactly-once file-level consumption -- the streaming
  checkpoint IS the sip cursor
- each micro-batch runs the normal resumable `build_index`, which skips
  pids whose lineage rows are complete

Partition immutability: like miru's writer, which rolls to a new partition
at capacity and never reopens old ones (AmzaPartitionIdProvider.java:49,
133-190), a pid is immutable once its lineage row is complete. A sip batch
whose rows fall into an already-complete pid is a LATE ARRIVAL; by default
that raises (the data would be silently dropped otherwise). Choices:
`late="error"` (default), `late="skip"` (drop late rows, count them), or
call `reopen_pids` first to invalidate + rebuild those pids.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..index.build import (
    IndexPaths,
    _read_done_pids,
    _with_pid,
    build_index,
)

WEBTEXT_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    # optional access labels (MiruActivity.authz): parquet inputs without
    # the column read as null under this explicit schema
    "authz array<string>"
)


def sip_build(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    partition_seconds: int = 86400,
    block_span: int = 4096,
    late: str = "error",
    batch_partitions: int | None = 8,
    schema: str | None = None,
    transform=None,
    extra_fields: list[str] | None = None,
) -> list[dict]:
    """Consume all files not yet checkpointed and index them.

    Returns one report dict per processed micro-batch. Idempotent: a
    second call with no new files is a no-op (cursor already at head).

    `batch_partitions` bounds how many pids share one commit tag (the
    reopen/repair blast radius: `reopen_pids` invalidates whole commit
    batches, so a bounded value keeps a later repair from rebuilding the
    entire micro-batch). None = fastest single-commit build, whole-batch
    blast radius.

    `schema` + `transform` are the MiruSiphonPlugin contract
    (miru-siphon-api: a plugin declares the feed schema and maps each
    row batch to activities): `schema` overrides the default webtext
    read schema and `transform` (DataFrame -> DataFrame of doc rows,
    e.g. siphon.log_documents or siphon.edge_documents composed with
    parse_edges) runs on the stream before pid assignment, so any
    external feed sips into the index. `extra_fields` declares schema
    fields on the FIRST batch of a fresh index (resume batches inherit
    the declaration from the index meta).
    """
    assert late in ("error", "skip")
    reports: list[dict] = []

    def handle(batch_df, batch_id: int) -> None:
        done = _read_done_pids(spark, IndexPaths(index_dir))
        with_pid = _with_pid(batch_df, partition_seconds)
        # null warc_ts mints no time partition -- the build rejects such
        # rows loudly (build_index's guard), so the sip policy decides
        # here: error surfaces them, skip drops AND COUNTS them (they
        # are not "late", they are untimestamped)
        n_null = with_pid.filter(F.col("pid").isNull()).count()
        if n_null:
            if late == "error":
                raise ValueError(
                    f"sip batch {batch_id}: {n_null} rows have null "
                    f"warc_ts (no time partition); drop or timestamp "
                    f"them, or use late='skip'"
                )
            with_pid = with_pid.filter(F.col("pid").isNotNull())
            batch_df = with_pid.drop("pid", "warc_us")
        if done:
            late_rows = with_pid.filter(
                F.col("pid").isin([int(p) for p in done])
            )
            n_late = late_rows.count()
            if n_late:
                if late == "error":
                    raise ValueError(
                        f"sip batch {batch_id}: {n_late} rows fall into "
                        f"already-complete pids; reopen_pids() or late='skip'"
                    )
                batch_df = (
                    with_pid.filter(
                        ~F.col("pid").isin([int(p) for p in done])
                    )
                    .drop("pid", "warc_us")
                )
        else:
            n_late = 0
        rep = build_index(
            spark,
            batch_df,
            index_dir,
            partition_seconds=partition_seconds,
            block_span=block_span,
            batch_partitions=batch_partitions,
            resume=True,
            extra_fields=extra_fields,
        )
        reports.append(
            {
                "batch_id": batch_id,
                "n_docs": rep.n_docs,
                "pids_built": rep.pids_built,
                "pids_skipped": rep.pids_skipped,
                "late_rows": n_late,
                "null_ts_rows": n_null,
            }
        )

    stream = spark.readStream.schema(schema or WEBTEXT_SCHEMA).parquet(
        input_dir
    )
    if transform is not None:
        stream = transform(stream)
    q = (
        stream.writeStream.foreachBatch(handle)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    q.awaitTermination()
    return reports


def reopen_pids(
    spark: SparkSession, index_dir: str, pids: list[int]
) -> list[int]:
    """Invalidate completed pids so the next build re-indexes them (the
    BULK repair path; miru analog: partition obsolete -> rebuilding,
    MiruPartitionState.java:10-15). For single-document removal use the
    tombstone API (miru_spark.index.removals) -- it is a parquet append,
    not a rebuild.

    Commit granularity is the batch dir, so every pid sharing a batch with
    a reopened pid is reopened too; returns the full reopened set. NOTE:
    a build run with `batch_partitions=None` (the fast single-commit
    default of build_index) puts EVERY pid under one `NNNN_all` tag, so
    reopening any pid of that build invalidates the whole build --
    sip_build therefore defaults to bounded batches (batch_partitions=8).
    Reopened docs already behind the sip checkpoint will not re-stream;
    re-index them with a direct `build_index` call over their source
    slice (the streaming cursor only moves forward)."""
    import shutil

    paths = IndexPaths(index_dir)
    if not os.path.exists(paths.lineage):
        return []
    lineage = spark.read.parquet(paths.lineage)
    tags = {
        r["batch_tag"]
        for r in lineage.filter(F.col("pid").isin([int(p) for p in pids]))
        .select("batch_tag")
        .distinct()
        .collect()
    }
    affected = sorted(
        r["pid"]
        for r in lineage.filter(F.col("batch_tag").isin(list(tags)))
        .select("pid")
        .distinct()
        .collect()
    )
    from ..index.build import _record_vacuumed

    _record_vacuumed(paths, tags)
    for tag in tags:
        shutil.rmtree(
            os.path.join(paths.segments, f"b_{tag}"), ignore_errors=True
        )
    kept_rows = lineage.filter(~F.col("batch_tag").isin(list(tags))).collect()
    if kept_rows:
        from ..index.build import _swap_lineage

        _swap_lineage(spark, paths, kept_rows, lineage.schema)
    else:
        shutil.rmtree(paths.lineage)
    return affected
