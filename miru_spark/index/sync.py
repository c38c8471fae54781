"""Cross-cluster index sync: incremental replication of a built index.

The reference ships a whole sync tier (miru-sync-deployable:
`MiruSyncSenderService` walks tenant partitions forward with cursors
and replays activity to a remote cluster; miru-sync-api carries the
cursor DTOs). On Spark the index IS a directory of write-once commit
units (`segments/b_<tag>/`, committed by atomic rename -- the local-fs
stand-in for Iceberg snapshot commits), so sync becomes Iceberg-style
snapshot replication instead of WAL replay:

1. diff the COMMITTED tag sets (src lineage vs dst lineage) -- the
   cursor analog: tags are `{epoch:04d}_{suffix}`, lexicographically
   ordered by commit time, so the diff IS the forward cursor walk;
2. copy only the missing commit units, each staged to a temp name and
   atomically renamed into place (write-once units never change, so a
   re-run copies nothing -- idempotent catch-up, like the sender's
   progressive forward sync);
3. swap the small derived tables (lineage, stats, termstats, removals,
   meta.json) wholesale via stage + rename -- they are O(tags + terms)
   bytes, dwarfed by postings;
4. delete dst units no longer committed at src LAST (vacuumed /
   reopened / compacted-away units), so a crash mid-sync never leaves
   dst referencing missing data: extra units are unreferenced, never
   the reverse.

Single-writer maintenance op, same assumption as compact_index. At
100 TB the unit copies are parallel filesystem transfers of immutable
directories -- no Spark job, no decode, no shuffle; only the tag diff
and the tiny derived tables are read.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import SparkSession

from .build import IndexPaths, _valid_tags

_DERIVED = ("lineage", "stats", "termstats", "removals")


def _swap_in(src_dir: str, dst_dir: str) -> None:
    """Stage-copy a small table dir and atomically replace the dst."""
    tmp = dst_dir + ".sync_tmp"
    prev = dst_dir + ".sync_prev"
    for p in (tmp, prev):
        if os.path.exists(p):
            shutil.rmtree(p)
    shutil.copytree(src_dir, tmp)
    if os.path.exists(dst_dir):
        os.rename(dst_dir, prev)
    os.rename(tmp, dst_dir)
    if os.path.exists(prev):
        shutil.rmtree(prev)


def sync_index(
    spark: SparkSession, src_root: str, dst_root: str
) -> dict:
    """Replicate `src_root`'s committed state into `dst_root`.

    Returns {"copied": [tags], "removed": [tags], "unchanged": [tags]}.
    Re-running after no src change copies nothing (idempotent). Commit
    units already present at dst are NOT touched (byte-identical,
    verified by tests via mtime pinning)."""
    src = IndexPaths(src_root)
    dst = IndexPaths(dst_root)
    src_meta = os.path.join(src_root, "meta.json")
    dst_meta = os.path.join(dst_root, "meta.json")
    if not os.path.exists(src_meta):
        raise ValueError(f"{src_root} is not a built index (no meta.json)")
    dst_ret = 0
    if os.path.exists(dst_meta):
        with open(src_meta) as f1, open(dst_meta) as f2:
            m1, m2 = json.load(f1), json.load(f2)
        # maintenance-owned keys (set_retention's watermark) legitimately
        # differ across replicas mid-sync -- they replicate via the meta
        # swap below; only BUILD parameters gate compatibility
        m1.pop("retention_min_us", None)
        dst_ret = int(m2.pop("retention_min_us", 0) or 0)
        if m1 != m2:
            raise ValueError(
                "dst index exists with a different meta.json "
                "(partitioning/format mismatch); refusing to mix"
            )
    os.makedirs(dst.segments, exist_ok=True)

    src_tags = set(_valid_tags(spark, src))
    dst_have = {
        d[2:]
        for d in os.listdir(dst.segments)
        if d.startswith("b_")
        and os.path.isdir(os.path.join(dst.segments, d))
    }
    to_copy = sorted(src_tags - dst_have)
    unchanged = sorted(src_tags & dst_have)
    stale = sorted(dst_have - src_tags)

    # 1. stage + rename each missing write-once unit
    for tag in to_copy:
        final = os.path.join(dst.segments, f"b_{tag}")
        tmp = os.path.join(dst.segments, f".sync_{tag}")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        shutil.copytree(os.path.join(src.segments, f"b_{tag}"), tmp)
        os.rename(tmp, final)

    # 2. derived tables + manifest swap
    for name in _DERIVED:
        sdir = os.path.join(src_root, name)
        if os.path.isdir(sdir):
            _swap_in(sdir, os.path.join(dst_root, name))
    _swap_in_file(src_meta, dst_meta)
    # the expired-snapshot ledger rides along: without it a replica
    # would accept as_of reads the source knows are partial
    src_vac = os.path.join(src_root, "vacuumed.json")
    if os.path.exists(src_vac):
        _swap_in_file(src_vac, os.path.join(dst_root, "vacuumed.json"))
    # the replica's retention watermark is forward-only, exactly like
    # set_retention's invariant: a src restored from an older backup
    # must not re-surface docs the replica already hid
    if dst_ret > 0:
        with open(dst_meta) as f:
            merged = json.load(f)
        if int(merged.get("retention_min_us", 0) or 0) < dst_ret:
            merged["retention_min_us"] = dst_ret
            tmp = dst_meta + ".tmp"
            with open(tmp, "w") as f:
                json.dump(merged, f)
            os.replace(tmp, dst_meta)

    # 3. only now drop units the src no longer commits
    for tag in stale:
        shutil.rmtree(os.path.join(dst.segments, f"b_{tag}"))

    return {
        "copied": to_copy,
        "removed": stale,
        "unchanged": unchanged,
    }


def _swap_in_file(src_file: str, dst_file: str) -> None:
    tmp = dst_file + ".sync_tmp"
    shutil.copyfile(src_file, tmp)
    os.replace(tmp, dst_file)


def sync_tenants(
    spark: SparkSession, src_root: str, dst_root: str
) -> dict:
    """Replicate every tenant index under a multi-tenant root
    (tenancy.py's `<root>/t=<id>` layout) -- the reference's sync
    senders walk all tenants the same way (MiruSyncSenderService
    per-tenant progress). Returns {tenant: per-index sync report}."""
    from ..tenancy import list_tenants, tenant_dir

    out = {}
    for t in list_tenants(src_root):
        out[t] = sync_index(
            spark, tenant_dir(src_root, t), tenant_dir(dst_root, t)
        )
    return out
