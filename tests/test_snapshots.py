"""Snapshot log + time-travel reads over the batch-commit dirs.

Each build batch commits by atomic rename (`b_<tag>/`) plus a lineage
append -- the Iceberg-snapshot analog. `snapshots()` is the snapshot
metadata table; `as_of=<tag>` pins readers and SearchEngine to the
commit prefix, so a query against snapshot S must be identical to a
query against an index that only ever contained S's documents.
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from miru_spark.index.build import (
    IndexPaths,
    build_index,
    read_docmap,
    read_lineage,
    snapshots,
)
from miru_spark.query.engine import SearchEngine
from miru_spark.webtext import webtext_df

PSEC = 3600
N = 1200  # 7s apart -> 3 hourly pids


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("snap")
    idx = str(root / "index")
    sub_idx = str(root / "sub_index")
    wt = webtext_df(spark, N)
    # bounded batches -> one commit tag per pid (3 snapshots)
    build_index(
        spark, wt, idx, partition_seconds=PSEC, block_span=256,
        batch_partitions=1,
    )
    snaps = snapshots(spark, idx).collect()
    # reference index containing ONLY the first snapshot's time slice
    lineage = read_lineage(spark, idx)
    first_pids = [
        r["pid"]
        for r in lineage.filter(F.col("batch_tag") == snaps[0]["batch_tag"])
        .select("pid").distinct().collect()
    ]
    psec_us = PSEC * 1_000_000
    sub = wt.filter(
        F.floor(F.unix_micros("warc_ts") / psec_us).isin(first_pids)
    )
    build_index(spark, sub, sub_idx, partition_seconds=PSEC, block_span=256)
    return {"idx": idx, "sub_idx": sub_idx, "snaps": snaps}


def test_snapshot_log_shape(spark, built):
    snaps = built["snaps"]
    assert len(snaps) >= 3
    tags = [s["batch_tag"] for s in snaps]
    assert tags == sorted(tags)  # commit order == lexicographic
    assert all(s["doc_count"] > 0 and s["postings_bytes"] > 0 for s in snaps)
    lineage = read_lineage(spark, built["idx"])
    assert {"pid", "doc_count", "postings_bytes", "n_terms",
            "wall_time_ms", "status", "batch_tag"} <= set(lineage.columns)


def test_as_of_docmap_matches_lineage(spark, built):
    snaps = built["snaps"]
    tag0 = snaps[0]["batch_tag"]
    dm = read_docmap(spark, IndexPaths(built["idx"]), as_of=tag0)
    assert dm.count() == snaps[0]["doc_count"]
    # epoch-prefix form resolves to the same snapshot
    dm2 = read_docmap(
        spark, IndexPaths(built["idx"]), as_of=tag0.split("_")[0]
    )
    assert dm2.count() == snaps[0]["doc_count"]
    # full (latest) view sees everything
    full = read_docmap(spark, IndexPaths(built["idx"]))
    assert full.count() == sum(s["doc_count"] for s in snaps)


def test_engine_as_of_rank_identical_to_subset_build(spark, built):
    """Time travel is exact: engine pinned at snapshot 0 returns the
    same ranked rows (url, doc_id ordering per pid, score) as an engine
    over an index that was only ever built from snapshot 0's docs."""
    tag0 = built["snaps"][0]["batch_tag"]
    pinned = SearchEngine(spark, built["idx"], as_of=tag0)
    fresh = SearchEngine(spark, built["sub_idx"])
    try:
        for q in ("w000001", "w000001 AND w000004", "w000002 OR w000007"):
            a = [
                (r["url"], round(r["score"], 9))
                for r in pinned.search(q, k=8).collect()
            ]
            b = [
                (r["url"], round(r["score"], 9))
                for r in fresh.search(q, k=8).collect()
            ]
            assert a == b, q
            assert len(a) > 0, q
    finally:
        pinned.close()
        fresh.close()


def test_engine_as_of_latest_tag_equals_default(spark, built):
    last = built["snaps"][-1]["batch_tag"]
    pinned = SearchEngine(spark, built["idx"], as_of=last)
    full = SearchEngine(spark, built["idx"])
    try:
        a = [(r["url"], round(r["score"], 9))
             for r in pinned.search("w000001", k=10).collect()]
        b = [(r["url"], round(r["score"], 9))
             for r in full.search("w000001", k=10).collect()]
        assert a == b
    finally:
        pinned.close()
        full.close()


def test_as_of_before_first_commit_raises(spark, built):
    with pytest.raises(ValueError, match="no committed snapshot"):
        # "/" sorts before every real tag ("{epoch:04d}_{suffix}")
        read_docmap(spark, IndexPaths(built["idx"]), as_of="/")
