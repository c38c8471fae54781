"""Doc-level remove / repair: a versioned tombstone table.

Miru mutates a per-partition *removal index* bitmap instead of rewriting
postings: `MiruIndexer.remove` sets the doc's bit (and `set` clears it on
a versioned re-add), and every query applies `andNot(removalIndex)` over
its answer (miru-service/.../stream/MiruIndexer.java:128-162,
miru-plugin/.../index/MiruRemovalIndex.java). The immutable-postings
Spark analog is an append-only parquet tombstone log under
`<index>/removals/`:

    (pid, doc_id, version, removed)

Latest version per (pid, doc_id) wins — a re-add (`restore_docs`, the
MiruIndexer.set analog) simply appends `removed=false` with a higher
version. The query kernels mask matched docIDs against the resolved
removed set, so removing one document costs one tiny parquet append, not
a partition rebuild (`reopen_pids` stays the bulk repair path).

Scale note: tombstones are metadata-sized relative to the corpus (the
reference keeps the whole removal bitmap heap-resident per partition).
The engine pins the resolved set driver-side below a bound; above it,
removals ride into the distributed kernel as per-pid rows co-partitioned
with the postings — no driver-memory dependence on the unpinned path.

Scores of surviving documents are unchanged by design: like the
reference's removal bitmap, tombstones hide documents without touching
df/avgdl statistics until the next rebuild compacts them.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .build import IndexPaths

_SCHEMA = "pid long, doc_id long, version long, removed boolean"


def _append(
    spark: SparkSession,
    paths: IndexPaths,
    pairs: list[tuple[int, int]],
    removed: bool,
    version: int | None,
) -> int:
    if not pairs:
        return 0
    if version is None:
        version = time.time_ns()
    rows = [
        (int(p), int(d), int(version), bool(removed)) for p, d in pairs
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    # append-only: each call writes its own file set, no read-modify-write
    # race with concurrent readers of the snapshot
    df.coalesce(1).write.mode("append").parquet(paths.removals)
    return len(rows)


def remove_docs(
    spark: SparkSession,
    index_dir: str,
    pairs: list[tuple[int, int]],
    version: int | None = None,
) -> int:
    """Tombstone (pid, doc_id) documents (MiruIndexer.remove analog).
    Returns the number of tombstones written."""
    return _append(spark, IndexPaths(index_dir), pairs, True, version)


def restore_docs(
    spark: SparkSession,
    index_dir: str,
    pairs: list[tuple[int, int]],
    version: int | None = None,
) -> int:
    """Versioned re-add (MiruIndexer.set analog): a later `removed=false`
    row out-versions the tombstone and the document is served again."""
    return _append(spark, IndexPaths(index_dir), pairs, False, version)


def remove_urls(
    spark: SparkSession,
    index_dir: str,
    urls: list[str],
    version: int | None = None,
) -> int:
    """Convenience: resolve urls through the forward index (docmap) and
    tombstone every (pid, doc_id) they map to."""
    from .build import read_docmap

    if not urls:
        return 0
    paths = IndexPaths(index_dir)
    rows = (
        read_docmap(spark, paths)
        .filter(F.col("url").isin(list(urls)))
        .select("pid", "doc_id")
        .distinct()
        .collect()
    )
    return _append(
        spark,
        paths,
        [(r["pid"], r["doc_id"]) for r in rows],
        True,
        version,
    )


def read_removed(spark: SparkSession, paths: IndexPaths) -> DataFrame | None:
    """Resolve the tombstone log: latest version per (pid, doc_id) wins;
    returns DataFrame(pid, doc_id) of currently-removed docs, or None when
    no removals exist. Ties on version break toward removed (a same-
    version remove+restore is treated as removed, matching the reference's
    "removed unless strictly newer set" comparison)."""
    if not os.path.exists(paths.removals):
        return None
    log = spark.read.parquet(paths.removals)
    latest = log.groupBy("pid", "doc_id").agg(
        F.max_by(
            F.col("removed"),
            F.struct(F.col("version"), F.col("removed")),
        ).alias("removed")
    )
    return latest.filter(F.col("removed")).select("pid", "doc_id")
