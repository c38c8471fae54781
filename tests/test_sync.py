"""Cross-cluster sync (miru_spark.index.sync): snapshot replication.

The reference's sync tier (miru-sync-deployable MiruSyncSenderService)
walks partitions forward with cursors and replays them remotely; here
commit units are write-once directories, so sync is an incremental
snapshot copy. Pinned invariants: a synced replica answers rank-
identically; re-sync after an append copies ONLY the new units
(untouched replica units stay byte-identical -- mtime pinned);
tombstones travel; compaction at the source retires replica units;
idempotent no-op when nothing changed; meta mismatch refuses.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from miru_spark.index import build_index, compact_index, remove_urls, sync_index
from miru_spark.query.engine import SearchEngine
from miru_spark.webtext import generate_rows

PARTITION_SECONDS = 3600
BLOCK_SPAN = 128
DAY_US = 86400 * 1_000_000

QUERIES = [
    "w000001 AND w000004",
    "w000001 OR w000009",
    "w000001 AND NOT w000002",
    "w00004*",
]


def _wt(spark, rows):
    from pyspark.sql import functions as F

    return spark.createDataFrame(
        [(r["url"], r["warc_us"], r["html"], r["text"], r["lang"])
         for r in rows],
        "url string, warc_us long, html binary, text string, lang string",
    ).select(
        "url", F.timestamp_micros("warc_us").alias("warc_ts"),
        "html", "text", "lang",
    )


def _batches():
    rows = generate_rows(range(240))
    return [
        [dict(r, warc_us=r["warc_us"] + bi * DAY_US)
         for r in rows[bi * 80:(bi + 1) * 80]]
        for bi in range(3)
    ]


def _answers(spark, index_dir):
    eng = SearchEngine(spark, index_dir)
    out = {
        q: [
            (r["pid"], r["doc_id"], round(r["score"], 9))
            for r in eng.search(q, k=10).collect()
        ]
        for q in QUERIES
    }
    eng.close()
    return out


def _build(spark, index_dir, batches):
    for b in batches:
        build_index(
            spark, _wt(spark, b), index_dir,
            partition_seconds=PARTITION_SECONDS, block_span=BLOCK_SPAN,
        )


def _unit_mtimes(index_dir):
    seg = os.path.join(index_dir, "segments")
    out = {}
    for d in sorted(os.listdir(seg)):
        if not d.startswith("b_"):
            continue
        p = os.path.join(seg, d)
        out[d] = {
            f: os.path.getmtime(os.path.join(p, f))
            for f in sorted(os.listdir(p))
        }
    return out


def test_sync_bootstrap_incremental_and_identity(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("sync") / "src")
    dst = str(tmp_path_factory.mktemp("sync") / "dst")
    batches = _batches()
    _build(spark, src, batches[:2])

    rep = sync_index(spark, src, dst)
    assert len(rep["copied"]) == 2
    assert rep["removed"] == [] and rep["unchanged"] == []
    assert _answers(spark, dst) == _answers(spark, src)

    # idempotent: nothing changed -> nothing copied
    rep2 = sync_index(spark, src, dst)
    assert rep2["copied"] == [] and rep2["removed"] == []
    assert len(rep2["unchanged"]) == 2

    # append a third batch at src: ONLY the new unit travels and the
    # replica's existing unit files are untouched (byte-identity proxy)
    before = _unit_mtimes(dst)
    _build(spark, src, batches[2:])
    rep3 = sync_index(spark, src, dst)
    assert len(rep3["copied"]) == 1
    assert len(rep3["unchanged"]) == 2
    after = _unit_mtimes(dst)
    for d, files in before.items():
        assert after[d] == files, f"replica unit {d} was rewritten"
    assert _answers(spark, dst) == _answers(spark, src)


def test_sync_carries_tombstones_and_compaction(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("sync2") / "src")
    dst = str(tmp_path_factory.mktemp("sync2") / "dst")
    batches = _batches()
    _build(spark, src, batches)
    sync_index(spark, src, dst)

    # tombstone at the source -> replica hides the doc after sync
    victim = batches[0][0]["url"]
    remove_urls(spark, src, [victim])
    rep = sync_index(spark, src, dst)
    assert rep["copied"] == []  # removals are a derived table, no unit
    assert _answers(spark, dst) == _answers(spark, src)
    eng = SearchEngine(spark, dst)
    urls = {
        r["url"] for q in QUERIES for r in eng.search(q, k=50).collect()
    }
    assert victim not in urls
    eng.close()

    # compaction rewrites src into fewer units: replica retires stale
    # units and stays identical
    compact_index(spark, src)
    rep2 = sync_index(spark, src, dst)
    assert rep2["copied"], "compacted unit should be new at the replica"
    assert rep2["removed"], "pre-compaction units should be retired"
    assert _answers(spark, dst) == _answers(spark, src)


def test_sync_refuses_mismatched_meta(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("sync3") / "src")
    dst = str(tmp_path_factory.mktemp("sync3") / "dst")
    batches = _batches()
    _build(spark, src, batches[:1])
    build_index(
        spark, _wt(spark, batches[0]), dst,
        partition_seconds=PARTITION_SECONDS * 2, block_span=BLOCK_SPAN,
    )
    with pytest.raises(ValueError, match="meta.json"):
        sync_index(spark, src, dst)
    with pytest.raises(ValueError, match="not a built index"):
        sync_index(
            spark, str(tmp_path_factory.mktemp("sync3") / "nope"), dst
        )
