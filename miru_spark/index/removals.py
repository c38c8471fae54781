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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .build import IndexPaths

_SCHEMA = "pid long, doc_id long, version long, removed boolean"


def resolve_log(log: DataFrame) -> DataFrame:
    """THE tombstone resolution, shared by every reader and by
    compaction so their tie-break semantics can never drift: latest
    version per (pid, doc_id) wins, ties toward removed (a same-version
    remove+restore counts removed, matching the reference's "removed
    unless strictly newer set" comparison). Returns one row per
    (pid, doc_id) carrying the winning (version, removed)."""
    return (
        log.groupBy("pid", "doc_id")
        .agg(F.max(F.struct("version", "removed")).alias("s"))
        .select(
            "pid", "doc_id",
            F.col("s.version").alias("version"),
            F.col("s.removed").alias("removed"),
        )
    )


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


def repair_docs(
    spark: SparkSession,
    index_dir: str,
    new_versions: DataFrame,
    version: int | None = None,
) -> dict:
    """Content-level repair (the MiruIndexer.set repair path,
    miru-service/.../stream/MiruIndexer.java:128-161: a strictly-newer
    version replaces the doc's field values). The immutable-postings
    analog: append the new version as a FRESH doc through the normal
    resumable build, then tombstone every pre-repair (pid, doc_id) of
    each repaired url -- one bounded index batch plus one tiny parquet
    append, never a partition rebuild (`reopen_pids` stays the bulk
    path). Build-first ordering fails OPEN on a mid-repair crash.

    `new_versions` is a webtext-shaped DataFrame (url, warc_ts, text,
    lang, optional html/authz). Its `warc_ts` must be NEW (the repair
    lands in a not-yet-complete time partition -- in a live pipeline,
    "now", exactly where the sip cursor is writing). A timestamp falling
    into a completed partition raises instead of silently dropping the
    row (the resumable build skips done pids).

    Readers pick the repair up the same way they pick up any commit:
    engines constructed afterwards see the new version; live engines see
    the tombstone after refresh_removals() but pin their postings
    snapshot at construction (the reference analog: a query routes to a
    replica that has caught up).

    Retry-safe: if a prior repair_docs call died after its build
    committed but before the tombstone append, re-running with the same
    `new_versions` detects the already-indexed (url, warc_ts) rows,
    skips (or resumes) the build, and completes the append -- the
    fail-OPEN window is closed by retrying this same API. Rows whose
    (url, warc_ts) already exist in the index are treated as indexed
    (idempotent retry); a content-only change must carry a new warc_ts
    or go through reopen_pids().

    Returns {"tombstoned": n, "appended": n, "pids": [...]}.
    """
    import json

    from .build import build_index, read_docmap

    paths = IndexPaths(index_dir)
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    psec = int(meta["partition_seconds"])

    urls = [r["url"] for r in new_versions.select("url").distinct().collect()]
    if not urls:
        return {"tombstoned": 0, "appended": 0, "pids": []}

    # guard: every repair row must land in a partition the build can
    # still append to
    from .build import _read_done_pids

    done = _read_done_pids(spark, paths)
    pid_rows = [
        r["pid"]
        for r in new_versions.select(
            F.floor(F.unix_micros("warc_ts") / (psec * 1_000_000)).alias(
                "pid"
            )
        )
        .distinct()
        .collect()
    ]
    if any(p is None for p in pid_rows):
        raise ValueError(
            "repair rows with null warc_ts cannot be indexed (no time "
            "partition); timestamp them first"
        )
    new_pids = sorted(int(p) for p in pid_rows)

    # stale ids (the pre-repair versions to tombstone) are captured
    # BEFORE the build, keyed by (url, warc_us) so a RETRY of a crashed
    # repair -- whose new versions are already in the docmap -- never
    # tombstones them: a previous repair_docs can die AFTER its build
    # committed but BEFORE the tombstone append (the documented
    # fail-OPEN window), and re-running must then skip straight to the
    # append instead of raising on the pid clash forever
    new_keys = {
        (r["url"], int(r["warc_us"]))
        for r in new_versions.select(
            "url", F.unix_micros("warc_ts").alias("warc_us")
        ).collect()
    }
    have = (
        read_docmap(spark, paths)
        .filter(F.col("url").isin(urls))
        .select("pid", "doc_id", "url", "warc_us")
        .distinct()
        .collect()
    )
    stale = sorted(
        {
            (int(r["pid"]), int(r["doc_id"]))
            for r in have
            if (r["url"], int(r["warc_us"])) not in new_keys
        }
    )
    missing = new_keys - {(r["url"], int(r["warc_us"])) for r in have}
    if not missing and not stale:
        # nothing to build and nothing to mask: every "new" version is
        # byte-for-byte the indexed (url, warc_ts) row. This is a
        # content-only edit aimed at an already-indexed timestamp (its
        # pid is complete), NOT a retry -- raise instead of silently
        # no-opping a repair the caller believes changed content
        raise ValueError(
            "new versions carry already-indexed (url, warc_ts) keys "
            "and no prior version needs tombstoning; a content-only "
            "repair must carry a new warc_ts (append-side repair) or "
            "use reopen_pids() for a bulk rebuild"
        )
    appended = 0
    if not missing:
        # pure retry (every new version already committed): the crashed
        # run may ALSO have died between its last segment commit and
        # finalize_index, leaving stats/termstats stale -- refinalize
        # (idempotent overwrite) so n_docs/avgdl/df include the
        # repaired docs before the tombstone append completes the repair
        from .build import finalize_index

        finalize_index(spark, index_dir)
    if missing:
        # versions still to index; their pids must be appendable (a
        # clash on a pid with NO missing version is the retry case and
        # passes through -- build resume skips committed pids anyway)
        missing_pids = sorted(
            {int(us // (psec * 1_000_000)) for _u, us in missing}
        )
        clash = [p for p in missing_pids if p in done]
        if clash:
            raise ValueError(
                f"repair rows fall into already-complete pids {clash}; "
                f"give the new versions a current warc_ts (append-side "
                f"repair) or use reopen_pids() for a bulk rebuild"
            )
        rep = build_index(
            spark,
            new_versions,
            index_dir,
            partition_seconds=psec,
            block_span=int(meta["block_span"]),
            resume=True,
            finalize=True,
        )
        appended = rep.n_docs
    n_tomb = _append(spark, paths, stale, True, version)
    return {"tombstoned": n_tomb, "appended": appended, "pids": new_pids}


def read_removed(spark: SparkSession, paths: IndexPaths) -> DataFrame | None:
    """Resolve the tombstone log: latest version per (pid, doc_id) wins;
    returns DataFrame(pid, doc_id) of currently-removed docs, or None when
    no removals exist. Ties on version break toward removed (a same-
    version remove+restore is treated as removed, matching the reference's
    "removed unless strictly newer set" comparison)."""
    if not os.path.exists(paths.removals):
        return None
    # explicit schema: a crashed append can leave the dir with zero
    # committed footers, and schema inference would then raise from
    # every SearchEngine construction; with the schema it reads empty
    log = spark.read.schema(_SCHEMA).parquet(paths.removals)
    return resolve_log(log).filter(F.col("removed")).select("pid", "doc_id")
