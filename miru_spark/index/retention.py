"""Time-based retention for a built index.

miru's cluster retires whole time partitions as they age out (partition
lifecycle `MiruPartitionState.java:10-15`; the manage service destroys
offline replicas) -- at web scale, dropping expired crawl windows is THE
data-lifecycle operation. This module renders it in two layers, the way
log-structured stores do:

1. `set_retention(index_dir, min_us)` writes a `retention_min_us`
   watermark into `meta.json` (atomic tmp+rename). Engines opened after
   the call clamp EVERY query's time range to `[min_us, +inf)` in
   `_prep_tree` -- one clamp point shared by the serving and distributed
   paths and every index-backed analytics op. O(1) bytes written, takes
   effect logically at once; BM25 idf keeps the global df/N stats until
   physical reclaim, exactly as an explicit time-range query does today.

2. `compact_index` performs the physical reclaim: merged commit units
   drop every row of pids STRICTLY below the watermark's pid floor
   (whole-pid granularity -- the boundary pid keeps all rows and stays
   correct through the query clamp), lineage rows for dropped pids
   retire with their data, and `finalize_index` recomputes df/N over the
   live corpus, after which scores are identical to a fresh build over
   the retained slice (pinned by tests/test_retention.py).
"""

from __future__ import annotations

import json
import os

from .build import IndexPaths  # noqa: F401  (API symmetry with siblings)


def get_retention(index_dir: str) -> int:
    """Current retention watermark in epoch microseconds (0 = none)."""
    meta_path = os.path.join(index_dir, "meta.json")
    if not os.path.exists(meta_path):
        return 0
    with open(meta_path) as f:
        return int(json.load(f).get("retention_min_us", 0) or 0)


def set_retention(index_dir: str, min_us: int) -> int:
    """Set the retention watermark; returns the previous value.

    Docs with warc_ts < min_us stop matching any query on engines opened
    after this call; their bytes are reclaimed by the next full
    `compact_index`. The watermark only moves forward (retention that
    un-hides data would break as_of/readers' monotonicity); pass exactly
    the current value to no-op, a smaller one raises."""
    meta_path = os.path.join(index_dir, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    old = int(meta.get("retention_min_us", 0) or 0)
    min_us = int(min_us)
    if min_us < old:
        raise ValueError(
            f"retention watermark may only advance: {min_us} < current {old}"
        )
    meta["retention_min_us"] = min_us
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, meta_path)
    return old


def retention_pid_floor(index_dir: str) -> int:
    """First pid that retention KEEPS (pids strictly below are fully
    expired). 0 when no watermark is set (or no meta.json yet, matching
    get_retention's degrade)."""
    min_us = get_retention(index_dir)
    if min_us <= 0:
        return 0
    meta_path = os.path.join(index_dir, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    psec_us = int(meta.get("partition_seconds", 86400)) * 1_000_000
    return min_us // psec_us
