"""Segment + tombstone-log compaction (miru_spark/index/compact.py).

Invariants pinned here: compaction changes FILE LAYOUT only -- docIDs,
scores, stats, tombstone resolution, and every query answer are
bit-identical before/after; the commit-unit count drops to one; old
`as_of` snapshots become unreadable exactly like a reopen_pids vacuum;
the operation is idempotent; appends (builds and removals) keep working
afterwards.
"""

import os

import pytest

from miru_spark.index.build import build_index, snapshots
from miru_spark.index.compact import compact_index, compact_removals
from miru_spark.index.removals import read_removed, remove_docs, restore_docs
from miru_spark.oracle import OracleIndex
from miru_spark.query.engine import SearchEngine
from miru_spark.webtext import generate_rows

PARTITION_SECONDS = 600
BLOCK_SPAN = 64
DAY_US = 86_400_000_000

QUERIES = [
    "w000001 AND w000004",
    "w000001 OR w000009",
    "w000001 AND NOT w000002",
    "w00004*",
    "the OR w000200",
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
    """Three disjoint-day batches -> three commit units."""
    rows = generate_rows(range(240))
    out = []
    for bi in range(3):
        out.append([
            dict(r, warc_us=r["warc_us"] + bi * DAY_US)
            for r in rows[bi * 80:(bi + 1) * 80]
        ])
    return out


def _seg_dirs(index_dir):
    seg = os.path.join(index_dir, "segments")
    return sorted(d for d in os.listdir(seg) if d.startswith("b_"))


def _build_multi(spark, index_dir, positions=False):
    for batch in _batches():
        build_index(
            spark, _wt(spark, batch), index_dir,
            partition_seconds=PARTITION_SECONDS, block_span=BLOCK_SPAN,
            positions=positions,
        )


def test_compact_merges_units_and_preserves_answers(
    spark, tmp_path_factory
):
    index_dir = str(tmp_path_factory.mktemp("cidx"))
    _build_multi(spark, index_dir)
    assert len(_seg_dirs(index_dir)) == 3

    eng = SearchEngine(spark, index_dir)
    before = {q: eng.search_collect(q, k=10) for q in QUERIES}
    before_dist = {
        q: eng.search_collect(q, k=10, local=False) for q in QUERIES[:2]
    }
    pid_counts = dict(eng.pid_counts)
    term_df = dict(eng._term_df)
    old_tag = sorted(
        r["batch_tag"] for r in snapshots(spark, index_dir).collect()
    )[0]
    eng.close()

    rep = compact_index(spark, index_dir, target_partitions=4)
    assert rep["merged_tags"] == 3
    dirs = _seg_dirs(index_dir)
    assert len(dirs) == 1 and dirs[0] == f"b_{rep['tag']}"
    assert rep["files_after"] <= 4
    assert rep["files_after"] < rep["files_before"]

    eng2 = SearchEngine(spark, index_dir)
    assert eng2.pid_counts == pid_counts
    assert eng2._term_df == term_df
    for q in QUERIES:
        assert eng2.search_collect(q, k=10) == before[q]
    for q, want in before_dist.items():
        assert eng2.search_collect(q, k=10, local=False) == want
    # the full oracle agrees too (layout change only)
    rows = [r for b in _batches() for r in b]
    oi = OracleIndex(rows, partition_seconds=PARTITION_SECONDS)
    got = eng2.search_collect(QUERIES[0], k=10)
    want = oi.search(QUERIES[0], k=10)
    assert [(p, d) for p, d, _s, _u in got] == [
        (p, d) for p, d, _s, _u in want
    ]

    # snapshot history collapsed: the old tag is gone
    with pytest.raises(ValueError):
        SearchEngine(spark, index_dir, as_of=old_tag)
    # ... but the compacted tag is a valid snapshot
    eng3 = SearchEngine(spark, index_dir, as_of=rep["tag"])
    assert eng3.search_collect(QUERIES[0], k=10) == before[QUERIES[0]]

    # idempotent: nothing left to merge
    rep2 = compact_index(spark, index_dir)
    assert rep2["merged_tags"] <= 1 and rep2["tag"] is None
    assert eng2.search_collect(QUERIES[1], k=10) == before[QUERIES[1]]


def test_compact_then_append_still_works(spark, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("cidx_app"))
    batches = _batches()
    for batch in batches[:2]:
        build_index(
            spark, _wt(spark, batch), index_dir,
            partition_seconds=PARTITION_SECONDS, block_span=BLOCK_SPAN,
        )
    rep = compact_index(spark, index_dir)
    # default sizing is target-file-bytes-bounded: merging must REDUCE
    # file fan-out even when defaultParallelism exceeds the input count
    assert 1 <= rep["files_after"] < rep["files_before"]
    # appending a later batch mints a FRESH tag above the compacted epoch
    build_index(
        spark, _wt(spark, batches[2]), index_dir,
        partition_seconds=PARTITION_SECONDS, block_span=BLOCK_SPAN,
    )
    assert len(_seg_dirs(index_dir)) == 2
    eng = SearchEngine(spark, index_dir)
    rows = [r for b in batches for r in b]
    oi = OracleIndex(rows, partition_seconds=PARTITION_SECONDS)
    got = eng.search_collect("w000001 AND w000004", k=10)
    want = oi.search("w000001 AND w000004", k=10)
    assert [(p, d, u) for p, d, _s, u in got] == [
        (p, d, u) for p, d, _s, u in want
    ]
    # and it compacts again down to one unit with identical answers
    compact_index(spark, index_dir)
    assert len(_seg_dirs(index_dir)) == 1
    eng2 = SearchEngine(spark, index_dir)
    assert eng2.search_collect("w000001 AND w000004", k=10) == got


def test_tiered_compaction_skips_large_units(spark, tmp_path_factory):
    """max_unit_bytes folds only the small sip units; the big base unit
    is never rewritten (rewrite cost tracks ingest, not index size)."""
    import os as _os

    index_dir = str(tmp_path_factory.mktemp("cidx_tier"))
    batches = _batches()
    # base: two batches merged into one large unit
    for batch in batches[:2]:
        build_index(
            spark, _wt(spark, batch), index_dir,
            partition_seconds=PARTITION_SECONDS, block_span=BLOCK_SPAN,
        )
    compact_index(spark, index_dir)
    base_tag = _seg_dirs(index_dir)[0]
    base_bytes = sum(
        _os.path.getsize(_os.path.join(index_dir, "segments", base_tag, f))
        for f in _os.listdir(_os.path.join(index_dir, "segments", base_tag))
        if f.endswith(".parquet")
    )
    # plus two small sip-sized units (time-disjoint: appends cover
    # CLOSED windows; same-pid rows would be late arrivals)
    third = batches[2]
    for j, half in enumerate((third[:40], third[40:])):
        rows = [dict(r, warc_us=r["warc_us"] + j * DAY_US) for r in half]
        build_index(
            spark, _wt(spark, rows), index_dir,
            partition_seconds=PARTITION_SECONDS, block_span=BLOCK_SPAN,
        )
    assert len(_seg_dirs(index_dir)) == 3
    eng = SearchEngine(spark, index_dir)
    before = {q: eng.search_collect(q, k=10) for q in QUERIES}
    eng.close()

    rep = compact_index(spark, index_dir, max_unit_bytes=base_bytes)
    assert rep["merged_tags"] == 2 and rep["kept_tags"] == 1
    dirs = _seg_dirs(index_dir)
    assert len(dirs) == 2 and base_tag in dirs  # base untouched
    assert f"b_{rep['tag']}" in dirs
    eng2 = SearchEngine(spark, index_dir)
    for q in QUERIES:
        assert eng2.search_collect(q, k=10) == before[q]
    # below-threshold pass with a single qualifying unit: no-op
    rep2 = compact_index(spark, index_dir, max_unit_bytes=base_bytes)
    assert rep2["tag"] is None and len(_seg_dirs(index_dir)) == 2
    # a later FULL pass still collapses everything to one
    rep3 = compact_index(spark, index_dir)
    assert rep3["merged_tags"] == 2 and len(_seg_dirs(index_dir)) == 1
    eng3 = SearchEngine(spark, index_dir)
    assert eng3.search_collect(QUERIES[0], k=10) == before[QUERIES[0]]


def test_sip_continues_after_compaction(spark, tmp_path_factory):
    """Compaction must be invisible to the sip cursor: the checkpoint
    tracks input files, the done-pid set survives the lineage rewrite
    (late-arrival protection intact), and post-compaction sip batches
    mint tags above the compacted epoch."""
    from miru_spark.streaming import sip_build

    root = tmp_path_factory.mktemp("cidx_sip")
    input_dir = str(root / "in")
    index_dir = str(root / "idx")
    ckpt = str(root / "ckpt")
    batches = _batches()

    def _sip(batch):
        _wt(spark, batch).write.mode("append").parquet(input_dir)
        return sip_build(
            spark, input_dir, index_dir, ckpt,
            partition_seconds=PARTITION_SECONDS, block_span=BLOCK_SPAN,
            batch_partitions=2,
        )

    _sip(batches[0])
    _sip(batches[1])
    assert len(_seg_dirs(index_dir)) >= 2
    from miru_spark.index.build import IndexPaths
    from miru_spark.streaming.sip import _read_done_pids

    done_before = set(_read_done_pids(spark, IndexPaths(index_dir)))
    compact_index(spark, index_dir)
    assert len(_seg_dirs(index_dir)) == 1
    # the done-pid set survives the lineage rewrite: late-arrival
    # protection (and resume skipping) is intact after compaction
    assert (
        set(_read_done_pids(spark, IndexPaths(index_dir))) == done_before
    )

    eng = SearchEngine(spark, index_dir)
    rows01 = [r for b in batches[:2] for r in b]
    oi = OracleIndex(rows01, partition_seconds=PARTITION_SECONDS)
    got = eng.search_collect("w000001 OR w000009", k=10)
    want = oi.search("w000001 OR w000009", k=10)
    assert [(p, d, u) for p, d, _s, u in got] == [
        (p, d, u) for p, d, _s, u in want
    ]
    eng.close()

    # new data still flows and the final index matches the full oracle
    _sip(batches[2])
    assert len(_seg_dirs(index_dir)) == 2  # compacted base + new tag
    eng2 = SearchEngine(spark, index_dir)
    oi_all = OracleIndex(
        [r for b in batches for r in b],
        partition_seconds=PARTITION_SECONDS,
    )
    got = eng2.search_collect("w000001 OR w000009", k=10)
    want = oi_all.search("w000001 OR w000009", k=10)
    assert [(p, d, u) for p, d, _s, u in got] == [
        (p, d, u) for p, d, _s, u in want
    ]


def test_compact_removals_resolution_identical(spark, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("cidx_rm"))
    _build_multi(spark, index_dir)
    eng = SearchEngine(spark, index_dir)
    hits = eng.search_collect("w000001", k=5)
    assert len(hits) >= 3
    (p0, d0, _s, _u), (p1, d1, _s1, _u1), (p2, d2, _s2, _u2) = hits[:3]
    remove_docs(spark, index_dir, [(p0, d0), (p1, d1), (p2, d2)], version=10)
    restore_docs(spark, index_dir, [(p1, d1)], version=20)
    remove_docs(spark, index_dir, [(p2, d2)], version=5)  # out-versioned dup

    from miru_spark.index.build import IndexPaths

    paths = IndexPaths(index_dir)
    before = sorted(
        (r["pid"], r["doc_id"])
        for r in read_removed(spark, paths).collect()
    )
    assert before == sorted([(p0, d0), (p2, d2)])
    rep = compact_removals(spark, index_dir)
    assert rep["rows_after"] < rep["rows_before"]
    assert rep["rows_after"] == 3  # one resolved row per touched doc
    after = sorted(
        (r["pid"], r["doc_id"])
        for r in read_removed(spark, paths).collect()
    )
    assert after == before
    # future appends still out-version the compacted rows
    restore_docs(spark, index_dir, [(p0, d0)], version=30)
    final = sorted(
        (r["pid"], r["doc_id"])
        for r in read_removed(spark, paths).collect()
    )
    assert final == [(p2, d2)]
    # masks apply post-compaction end-to-end
    eng2 = SearchEngine(spark, index_dir)
    got = {(p, d) for p, d, _s, _u in eng2.search_collect("w000001", k=10)}
    assert (p2, d2) not in got and (p0, d0) in got


def test_compact_preserves_positions(spark, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("cidx_pos"))
    _build_multi(spark, index_dir, positions=True)
    eng = SearchEngine(spark, index_dir)
    rows0 = _batches()[0]
    snip = " ".join(rows0[3]["text"].split()[:3])
    q = f'"{snip}"'
    before = eng.search_collect(q, k=10, locale=rows0[3]["lang"])
    assert before  # the snippet comes from a real doc
    eng.close()
    compact_index(spark, index_dir)
    eng2 = SearchEngine(spark, index_dir)
    assert eng2.meta["positions"] is True
    assert eng2.search_collect(q, k=10, locale=rows0[3]["lang"]) == before
    assert (
        eng2.search_collect(q, k=10, locale=rows0[3]["lang"], local=False)
        == before
    )
