"""Index maintenance: segment compaction + tombstone-log compaction.

Incremental commits accumulate: every sip micro-batch, resumed build,
and content repair adds a `segments/b_<tag>/` commit unit, and every
remove/restore appends to the tombstone log. At crawl cadence that is
thousands of small parquet files per day -- more footers for the
serving node's row-group catalog, wider read fan-out per query term,
and term runs fragmented across commit units.

`compact_index` is the Spark-shaped version of the reference's segment
merge story (miru rebuilds/merges LAB indexes per partition;
MiruPartitionState rebuilding, miru-service/.../MiruPartitionState.java)
and the Iceberg `rewrite_data_files` + `expire_snapshots` analog: it
reads the selected commit units (all of them by default; only the
sub-threshold ones in a tiered pass), re-sorts the union GLOBALLY
term-major -- one range-partitioned sort-merge shuffle, the only
term-keyed exchange anywhere in this engine, run at maintenance time,
never on the build or query path -- and commits the result as ONE new
unit, then vacuums the replaced ones. DocIDs, scores, postings bytes,
and meta are unchanged; only the file layout is. Queries before/after
are rank-identical (tests/test_compact.py pins this).

Snapshot semantics: compaction COLLAPSES history. Pre-compaction
`as_of` tags become unreadable (same contract as `reopen_pids`
vacuuming a replaced commit unit); the compacted tag is the new, only
snapshot. Engines constructed before a compaction hold plans over the
vacuumed dirs -- rebuild them after, exactly as after `reopen_pids`.

Crash safety (single maintenance writer, like every mutator here):
the new unit commits by atomic rename BEFORE the lineage rewrite, and
the replaced dirs are deleted only after the lineage points at the new
tag -- a crash in between leaves the old dirs as lineage-orphans that
the next build/compact's `_cleanup_orphans` removes. The tombstone-log
compaction needs no window at all: the resolved rows are APPENDED
first (latest-version-wins resolution is idempotent over duplicates),
then the superseded files are unlinked; a crash mid-delete leaves
harmless duplicate rows.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .build import (
    IndexPaths,
    _cleanup_orphans,
    _read_parquet_dir,
    _record_vacuumed,
    _swap_lineage,
    _valid_tags,
    finalize_index,
)


def compact_removals(spark: SparkSession, index_dir: str) -> dict:
    """Rewrite the tombstone log to one resolved row per (pid, doc_id)
    (latest version wins, ties toward removed -- the same resolution
    `read_removed` applies on every query). Keeping the winning row's
    version preserves out-versioning behavior for every future append.
    Duplicate-safe ordering: append the resolved rows, then unlink the
    superseded files."""
    paths = IndexPaths(index_dir)
    if not os.path.exists(paths.removals):
        return {"rows_before": 0, "rows_after": 0}
    old_files = [
        f for f in os.listdir(paths.removals) if f.endswith(".parquet")
    ]
    from .removals import _SCHEMA, resolve_log

    log = spark.read.schema(_SCHEMA).parquet(paths.removals)
    rows_before = log.count()
    # the ONE shared resolution (removals.resolve_log) -- query-time and
    # compaction-time semantics cannot drift
    latest = resolve_log(log)
    latest.coalesce(1).write.mode("append").parquet(paths.removals)
    for f in old_files:
        try:
            os.remove(os.path.join(paths.removals, f))
        except OSError:
            pass
    rows_after = spark.read.parquet(paths.removals).count()
    return {"rows_before": int(rows_before), "rows_after": int(rows_after)}


def compact_index(
    spark: SparkSession,
    index_dir: str,
    target_partitions: int | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
    max_unit_bytes: int | None = None,
    removals: bool = True,
) -> dict:
    """Merge committed segment commit units into ONE, globally sorted
    (row_type, term, pid, blk, doc_id) so a query term's postings are a
    contiguous row-group run across the whole index, then vacuum the
    replaced units and (optionally) compact the tombstone log.

    `max_unit_bytes=None` (default) is a FULL compaction: every unit
    merges. Setting it runs a TIERED pass -- only units smaller than the
    threshold merge, larger ones stay untouched -- the Lucene merge-
    policy / Iceberg min-input-files shape: at 100 TB a maintenance pass
    must fold the day's small sip units into one without rewriting the
    multi-TB base, so rewrite cost tracks ingest volume, not index size.
    Repeated tiered passes converge geometrically (merged output grows
    past the threshold and drops out of the next pass's input).

    Returns {"tag", "merged_tags", "kept_tags", "files_before",
    "files_after", "removals": {...}}. No-op (beyond removals) when
    fewer than two units qualify."""
    paths = IndexPaths(index_dir)
    # recover/clean any earlier partial maintenance first (idempotent)
    _cleanup_orphans(spark, paths)
    all_tags = sorted(_valid_tags(spark, paths))

    def unit_stats(t: str) -> tuple[int, int]:
        d = os.path.join(paths.segments, f"b_{t}")
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        return len(files), sum(
            os.path.getsize(os.path.join(d, f)) for f in files
        )

    sizes = {t: unit_stats(t) for t in all_tags}
    if max_unit_bytes is None:
        tags = all_tags
    else:
        tags = [t for t in all_tags if sizes[t][1] < max_unit_bytes]
    rep: dict = {
        "tag": None,
        "merged_tags": len(tags),
        "kept_tags": len(all_tags) - len(tags),
    }
    # a single qualifying unit still rewrites when it holds pids the
    # retention watermark has expired -- otherwise a fully-compacted
    # index could never physically reclaim (retention.py's contract)
    from .retention import retention_pid_floor

    pid_floor = retention_pid_floor(index_dir)
    reclaim_due = False
    if pid_floor > 0 and len(tags) == 1 and os.path.exists(paths.lineage):
        reclaim_due = bool(
            spark.read.parquet(paths.lineage)
            .filter(
                F.col("batch_tag").isin(tags)
                & (F.col("pid") < pid_floor)
            )
            .head(1)
        )
    if len(tags) > 1 or reclaim_due:
        # the new tag's epoch must exceed EVERY existing unit's (merged
        # or kept, committed or orphaned) -- same rule as build_index
        epoch = 0
        existing = set(all_tags)
        if os.path.isdir(paths.segments):
            existing |= {
                d[2:]
                for d in os.listdir(paths.segments)
                if d.startswith("b_")
            }
        from .build import _epoch_of, _epoch_str

        for t in existing:
            e = _epoch_of(t.split("_", 1)[0])
            if e is not None:
                epoch = max(epoch, e + 1)
        new_tag = f"{_epoch_str(epoch)}_compact"
        rep["tag"] = new_tag

        seg = _read_parquet_dir(spark, paths.segments, tags)
        # physical retention reclaim (index/retention.py): merged units
        # drop every row of fully-expired pids (strictly below the
        # watermark's pid floor; the boundary pid keeps all rows and
        # stays exact through the engine's query clamp). Kept (unmerged)
        # units reclaim when a later pass merges them -- a FULL
        # compaction reclaims everything at once.
        if pid_floor > 0:
            seg = seg.filter(F.col("pid") >= pid_floor)
            rep["retention_pid_floor"] = pid_floor
        files_before = sum(sizes[t][0] for t in tags)
        bytes_before = sum(sizes[t][1] for t in tags)
        rep["files_before"] = files_before
        if target_partitions is not None:
            n_out = int(target_partitions)
        else:
            # Iceberg rewrite_data_files convention: size outputs toward
            # target-file-size, never exceeding the input file count --
            # compaction must reduce fan-out at every scale. At 100 TB the
            # bytes term dominates and the range shuffle parallelizes it.
            n_out = -(-bytes_before // max(1, target_file_bytes))
            n_out = max(1, min(int(n_out), files_before))
        # ONE range-partitioned sort-merge shuffle. Head-term skew is
        # bounded here by construction: a term's unit of work is the
        # (term, pid, blk) block row (doc-range sliced at build time),
        # never a whole posting list, so the range partitioner can split
        # a head term's rows across adjacent output files -- the row-
        # group catalog prunes by (term_min, term_max) overlap either
        # way. This is the "salted sort-merge with skew splitting" of
        # the north star, realized as range-split block rows.
        merged = seg.repartitionByRange(
            n_out, "row_type", "term", "pid", "blk"
        ).sortWithinPartitions("row_type", "term", "pid", "blk", "doc_id")

        from .build import _commit_write

        _commit_write(merged, paths.segments, new_tag, [])
        rep["files_after"] = sum(
            1
            for f in os.listdir(
                os.path.join(paths.segments, f"b_{new_tag}")
            )
            if f.endswith(".parquet")
        )

        # lineage rewrite: same per-pid rows, all under the new tag (the
        # reopen_pids rewrite pattern); fully-expired pids of the merged
        # units retire WITH their data; THEN vacuum the replaced units
        lineage = spark.read.parquet(paths.lineage)
        if pid_floor > 0:
            lineage = lineage.filter(
                (F.col("pid") >= pid_floor)
                | ~F.col("batch_tag").isin(tags)
            )
        kept = lineage.withColumn(
            "batch_tag",
            F.when(
                F.col("batch_tag").isin(tags), F.lit(new_tag)
            ).otherwise(F.col("batch_tag")),
        ).collect()
        _swap_lineage(spark, paths, kept, lineage.schema)
        _record_vacuumed(paths, tags, replacement=new_tag)
        for t in tags:
            shutil.rmtree(
                os.path.join(paths.segments, f"b_{t}"), ignore_errors=True
            )
        # LOAD-BEARING when pid_floor dropped rows: recomputes N/avgdl/df
        # over the retained corpus so post-reclaim BM25 equals a fresh
        # build of the retained slice (test_retention pins this). With no
        # reclaim it is value-identical and kept for the idempotent
        # guarantee every other mutator gives.
        finalize_index(spark, index_dir)
    if removals:
        rep["removals"] = compact_removals(spark, index_dir)
    return rep
