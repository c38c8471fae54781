"""Time-based retention: watermark clamp on every query path, physical
reclaim at compaction, score identity with a fresh build of the retained
slice (index/retention.py)."""

import os

import pytest
from pyspark.sql import functions as F

from miru_spark.index import (
    build_index,
    compact_index,
    get_retention,
    retention_pid_floor,
    set_retention,
)
from miru_spark.query.engine import SearchEngine
from miru_spark.webtext import webtext_df

N_DOCS = 600
PARTITION_SECONDS = 600  # ~7 pids over the synthetic corpus
BLOCK_SPAN = 64
QUERIES = ["w000001 AND w000004", "w000001 OR w000009", "w00004*",
           "w000002 AND NOT w000001"]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_ret"))
    wt = webtext_df(spark, N_DOCS, parallelism=4)
    # bounded batches so compaction has units to merge
    build_index(
        spark, wt, d, partition_seconds=PARTITION_SECONDS,
        block_span=BLOCK_SPAN, batch_partitions=3,
    )
    return d


def _cutoff_us(spark, idx, frac=0.4, align_pid=False):
    eng = SearchEngine(spark, idx)
    pids = sorted(eng.pid_counts)
    psec_us = PARTITION_SECONDS * 1_000_000
    if align_pid:
        return pids[len(pids) // 2] * psec_us
    return pids[len(pids) // 3] * psec_us + psec_us // 2  # mid-pid


def test_watermark_clamps_both_paths(spark, idx, tmp_path):
    import shutil

    d = str(tmp_path / "ret1")
    shutil.copytree(idx, d)
    cut = _cutoff_us(spark, d)
    assert get_retention(d) == 0
    assert set_retention(d, cut) == 0
    assert get_retention(d) == cut

    base = SearchEngine(spark, idx)   # no retention
    eng = SearchEngine(spark, d)      # retention set
    big = (1 << 62)
    for q in QUERIES:
        want = base.search_collect(q, k=10, time_range_us=(cut, big))
        assert eng.search_collect(q, k=10, local=True) == want, q
        assert eng.search_collect(q, k=10, local=False) == want, q
        # an explicit range intersects with the watermark
        narrower = base.search_collect(q, k=10, time_range_us=(0, big))
        assert eng.search_collect(q, k=10, time_range_us=(0, big)) == want
        assert narrower == base.search_collect(q, k=10)
    # analytics family honors the clamp through the same prep point
    assert eng.count("w000001") == base.count(
        "w000001", time_range_us=(cut, big)
    )
    # newest() never surfaces an expired doc
    rows = eng.newest(k=20).collect()
    assert all(int(r["warc_ts"].timestamp() * 1e6) >= cut for r in rows)
    # explain surfaces the watermark
    assert eng.explain("w000001")["retention_min_us"] == cut


def test_watermark_keeps_batched_path_live(spark, idx, tmp_path):
    """ADVICE r4: search_many's single-job batched exchange must carry
    the shared retention clamp instead of silently routing every query
    through the individual fallback path. Equality with sequential
    search_collect is exact; the batched route is proven live by
    forbidding the per-query fallback during the call."""
    import shutil

    d = str(tmp_path / "ret_batch")
    shutil.copytree(idx, d)
    cut = _cutoff_us(spark, d)
    set_retention(d, cut)
    eng = SearchEngine(spark, d)
    want = {
        q: eng.search_collect(q, k=10, local=False) for q in QUERIES
    }
    # make every query route distributed so the batch is exercised
    old = eng.local_max_postings
    eng.local_max_postings = 0

    def _no_fallback(*a, **kw):
        raise AssertionError(
            "search_many fell back to per-query search_collect under "
            "retention -- the batched exchange should carry the clamp"
        )

    eng.search_collect = _no_fallback
    try:
        got = eng.search_many(QUERIES, k=10)
    finally:
        eng.local_max_postings = old
        del eng.search_collect
    for q in QUERIES:
        assert got[q] == want[q], q
    # every returned doc is within retention
    psec_us = PARTITION_SECONDS * 1_000_000
    floor_pid = cut // psec_us
    for q, rows in got.items():
        assert all(p >= floor_pid for p, _d, _s, _u in rows), q


def test_watermark_only_advances(spark, idx, tmp_path):
    import shutil

    d = str(tmp_path / "ret2")
    shutil.copytree(idx, d)
    set_retention(d, 1000)
    with pytest.raises(ValueError):
        set_retention(d, 999)
    set_retention(d, 1000)  # same value no-ops
    assert get_retention(d) == 1000


def test_compaction_reclaims_and_matches_fresh_build(
    spark, idx, tmp_path
):
    import shutil

    d = str(tmp_path / "ret3")
    shutil.copytree(idx, d)
    cut = _cutoff_us(spark, d, align_pid=True)
    set_retention(d, cut)
    floor = retention_pid_floor(d)
    assert floor > 0

    rep = compact_index(spark, d)
    assert rep["retention_pid_floor"] == floor
    # physically gone: no surviving row below the floor
    seg = spark.read.option("recursiveFileLookup", "true").parquet(
        os.path.join(d, "segments")
    )
    assert seg.filter(F.col("pid") < floor).count() == 0

    # identical (docs AND scores) to a fresh build over the retained
    # slice: same pids, same minted doc_ids, recomputed df/N
    fresh_dir = str(tmp_path / "fresh")
    wt = webtext_df(spark, N_DOCS, parallelism=4).filter(
        F.unix_micros(F.col("warc_ts")) >= cut
    )
    build_index(
        spark, wt, fresh_dir, partition_seconds=PARTITION_SECONDS,
        block_span=BLOCK_SPAN,
    )
    eng = SearchEngine(spark, d)
    ref = SearchEngine(spark, fresh_dir)
    assert eng.n_docs == ref.n_docs
    for q in QUERIES:
        got = eng.search_collect(q, k=10)
        want = ref.search_collect(q, k=10)
        assert got == want, q
        assert eng.search_collect(q, k=10, local=False) == want, q


def test_resume_build_preserves_watermark(spark, tmp_path):
    d = str(tmp_path / "ret4")
    wt = webtext_df(spark, 200, parallelism=2)
    build_index(
        spark, wt, d, partition_seconds=PARTITION_SECONDS,
        block_span=BLOCK_SPAN,
    )
    set_retention(d, 12345)
    # a resumed (incremental) build must carry the watermark through
    build_index(
        spark, wt, d, partition_seconds=PARTITION_SECONDS,
        block_span=BLOCK_SPAN, resume=True,
    )
    assert get_retention(d) == 12345


def test_sync_propagates_watermark(spark, idx, tmp_path):
    import shutil

    from miru_spark.index import sync_index

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    shutil.copytree(idx, src)
    sync_index(spark, src, dst)  # replicate, then advance retention
    cut = _cutoff_us(spark, src)
    set_retention(src, cut)
    sync_index(spark, src, dst)  # incremental re-sync must not refuse
    assert get_retention(dst) == cut
    a = SearchEngine(spark, src)
    b = SearchEngine(spark, dst)
    for q in QUERIES:
        assert (
            a.search_collect(q, k=10) == b.search_collect(q, k=10)
        ), q


def test_single_unit_index_still_reclaims(spark, idx, tmp_path):
    """Review finding: a fully-compacted (single-unit) index must still
    physically reclaim when the watermark advances afterwards."""
    import shutil

    d = str(tmp_path / "ret5")
    shutil.copytree(idx, d)
    compact_index(spark, d)  # -> ONE unit
    cut = _cutoff_us(spark, d, align_pid=True)
    set_retention(d, cut)
    floor = retention_pid_floor(d)
    rep = compact_index(spark, d)
    assert rep["retention_pid_floor"] == floor
    seg = spark.read.option("recursiveFileLookup", "true").parquet(
        os.path.join(d, "segments")
    )
    assert seg.filter(F.col("pid") < floor).count() == 0
    # and a further pass with nothing left to reclaim no-ops
    rep2 = compact_index(spark, d)
    assert rep2["tag"] is None


def test_fresh_rebuild_drops_stale_watermark(spark, tmp_path):
    """Review finding: resume=False discards the old index, so its
    watermark must not silently hide backfilled older docs."""
    d = str(tmp_path / "ret6")
    wt = webtext_df(spark, 200, parallelism=2)
    build_index(
        spark, wt, d, partition_seconds=PARTITION_SECONDS,
        block_span=BLOCK_SPAN,
    )
    set_retention(d, 10**18)
    build_index(
        spark, wt, d, partition_seconds=PARTITION_SECONDS,
        block_span=BLOCK_SPAN, resume=False,
    )
    assert get_retention(d) == 0
    eng = SearchEngine(spark, d)
    assert eng.count("w000001") > 0  # nothing hidden


def test_sync_never_regresses_replica_watermark(spark, idx, tmp_path):
    """Review finding: a src restored from an older backup must not
    re-surface docs the replica already hid."""
    import shutil

    from miru_spark.index import sync_index

    src = str(tmp_path / "src2")
    dst = str(tmp_path / "dst2")
    shutil.copytree(idx, src)
    sync_index(spark, src, dst)
    set_retention(dst, 99999)   # replica ahead of src
    sync_index(spark, src, dst)
    assert get_retention(dst) == 99999  # forward-only held


def test_bare_newest_honors_time_range(spark, idx):
    """Review finding (pre-existing): newest() without query/constraints
    silently dropped the caller's time_range_us."""
    eng = SearchEngine(spark, idx)
    lo = _cutoff_us(spark, idx)
    hi = 1 << 62
    rows = eng.newest(k=50, time_range_us=(lo, hi)).collect()
    assert rows, "window unexpectedly empty"
    assert all(
        lo <= int(r["warc_ts"].timestamp() * 1e6) <= hi for r in rows
    )
    # matches the filtered path's answer (query=match-all via constraints)
    want = [
        (r["pid"], r["doc_id"])
        for r in eng.newest(
            k=50, query=None, constraints="w000001 OR NOT w000001",
            time_range_us=(lo, hi),
        ).collect()
    ]
    got = [(r["pid"], r["doc_id"]) for r in rows]
    assert got == want


def test_search_many_matches_sequential_under_retention(spark, idx, tmp_path):
    """Review finding: the batched kernel dropped the watermark clamp
    (and any time bounds); such queries must fall back to the
    per-query path so results stay identical to search_collect."""
    import shutil

    d = str(tmp_path / "ret_many")
    shutil.copytree(idx, d)
    set_retention(d, _cutoff_us(spark, d))
    eng = SearchEngine(spark, d)
    batched = eng.search_many(QUERIES, k=10)
    for q in QUERIES:
        assert batched[q] == eng.search_collect(q, k=10), q
