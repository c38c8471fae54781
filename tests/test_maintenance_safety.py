"""Crash-safety and snapshot-consistency regressions for the index
maintenance layer (third review wave): recoverable lineage swap, the
expired-snapshot ledger, epoch rollover, schema-less removals dirs,
fail-open repair, tenant prevalidation."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from miru_spark.index import build_index, compact_index
from miru_spark.index.build import (
    IndexPaths,
    _epoch_of,
    _epoch_str,
    _valid_tags,
)
from miru_spark.query.engine import SearchEngine
from miru_spark.webtext import webtext_df

PSEC = 600
BS = 64


def _build(spark, d, n=300, **kw):
    build_index(
        spark, webtext_df(spark, n, parallelism=2), d,
        partition_seconds=PSEC, block_span=BS, **kw,
    )


def test_epoch_str_order_and_roundtrip():
    # order-safe across the 9999 rollover, inverse matches
    samples = [0, 1, 9999, 10000, 10001, 123456, 99_999_999]
    strs = [_epoch_str(e) for e in samples]
    assert strs == sorted(strs)  # lexicographic == numeric
    assert [_epoch_of(s) for s in strs] == samples
    assert _epoch_of("compact") is None
    with pytest.raises(ValueError):
        _epoch_str(100_000_000)


def test_post_rollover_build_and_query(spark, tmp_path):
    """An index whose existing commit units sit past epoch 9999 keeps
    committing and querying correctly (tags stay order-safe)."""
    d = str(tmp_path / "idx_roll")
    _build(spark, d, n=120, batch_partitions=2)
    paths = IndexPaths(d)
    # push the epoch space past the rollover by renaming one unit
    tags = sorted(_valid_tags(spark, paths))
    import pyspark.sql.functions as F

    lineage = spark.read.parquet(paths.lineage)
    old = tags[-1]
    new = "A00010000_" + old.split("_", 1)[1]
    os.rename(
        os.path.join(paths.segments, f"b_{old}"),
        os.path.join(paths.segments, f"b_{new}"),
    )
    rows = lineage.withColumn(
        "batch_tag",
        F.when(F.col("batch_tag") == old, new).otherwise(
            F.col("batch_tag")
        ),
    ).collect()
    from miru_spark.index.build import _swap_lineage

    _swap_lineage(spark, paths, rows, lineage.schema)
    n0 = SearchEngine(spark, d).n_docs
    # an appended build mints tags ABOVE the A-form epoch
    build_index(
        spark, webtext_df(spark, 160, parallelism=2), d,
        partition_seconds=PSEC, block_span=BS, batch_partitions=2,
    )
    assert sorted(_valid_tags(spark, paths))[-1].startswith("A000100")
    assert SearchEngine(spark, d).n_docs >= n0


def test_lineage_swap_crash_states_recover(spark, tmp_path):
    """Every crash point of the lineage swap leaves a state
    _recover_lineage rolls forward/back -- never the 'no lineage at all'
    state whose cleanup would delete every segment unit."""
    d = str(tmp_path / "idx_swap")
    _build(spark, d, batch_partitions=2)
    paths = IndexPaths(d)
    want = _valid_tags(spark, paths)
    assert want

    # crash BETWEEN the two renames: lineage gone, .next complete
    os.rename(paths.lineage, paths.lineage + ".next")
    assert _valid_tags(spark, paths) == want  # recovered, not empty
    assert os.path.exists(paths.lineage)

    # crash AFTER the swap, before old-table cleanup
    shutil.copytree(paths.lineage, paths.lineage + ".old")
    assert _valid_tags(spark, paths) == want
    assert not os.path.exists(paths.lineage + ".old")

    # stale .next beside a live table (crash before the first rename)
    shutil.copytree(paths.lineage, paths.lineage + ".next")
    assert _valid_tags(spark, paths) == want
    assert not os.path.exists(paths.lineage + ".next")
    # and the units survived throughout
    eng = SearchEngine(spark, d)
    assert eng.n_docs == 300


def test_tiered_compaction_expires_spanned_snapshots(spark, tmp_path):
    """Review finding: a tiered pass moves merged units' rows under a
    higher-epoch tag; an as_of cutoff spanning a merged tag must RAISE
    (expired snapshot), not silently read a partial corpus."""
    d = str(tmp_path / "idx_tier")
    _build(spark, d, batch_partitions=2)  # several small units
    paths = IndexPaths(d)
    tags = sorted(_valid_tags(spark, paths))
    assert len(tags) >= 2
    last = tags[-1]
    # snapshot at the last tag is the full corpus pre-compaction
    full = SearchEngine(spark, d, as_of=last).n_docs
    assert full == 300
    rep = compact_index(spark, d)  # merges all units (full pass is the
    assert rep["tag"]             # degenerate tiered case)
    with pytest.raises(ValueError, match="merged or vacuumed"):
        SearchEngine(spark, d, as_of=last)
    # the current index still reads completely
    assert SearchEngine(spark, d).n_docs == 300


def test_empty_removals_dir_does_not_brick_engine(spark, tmp_path):
    """Review finding: a crashed tombstone append can leave a removals
    dir with zero parquet footers; engine construction must degrade to
    'no removals', not raise from schema inference."""
    d = str(tmp_path / "idx_rm")
    _build(spark, d, n=120)
    paths = IndexPaths(d)
    os.makedirs(paths.removals)  # exists, but empty
    eng = SearchEngine(spark, d)
    assert eng.n_docs == 120
    assert eng.count("w000001") > 0
    from miru_spark.index.compact import compact_removals

    assert compact_removals(spark, d)["rows_before"] == 0


def test_repair_fails_open_not_closed(spark, tmp_path):
    """Review finding: repair must index the new version BEFORE
    tombstoning the old -- a failing build leaves the document visible
    (fail open), never vanished (fail closed)."""
    from miru_spark.index.removals import repair_docs

    d = str(tmp_path / "idx_rep")
    _build(spark, d, n=120)
    eng0 = SearchEngine(spark, d)
    url = eng0.search_collect("w000001", k=1)[0][3]
    # a new_versions frame the build must reject (null warc_ts)
    bad = spark.createDataFrame(
        [(url, None, None, "repaired text", "en")],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string",
    )
    with pytest.raises(Exception, match="null warc_ts"):
        repair_docs(spark, d, bad)
    # the old version is STILL served -- no tombstone landed
    eng = SearchEngine(spark, d)
    assert url in {u for (_p, _d, _s, u) in eng.search_collect(
        "w000001", k=10
    )}


def test_tenant_ids_validated_before_any_build(spark, tmp_path):
    from miru_spark.tenancy import build_tenant_indexes

    wt = webtext_df(spark, 40, parallelism=2).withColumn(
        "tenant", F.when(F.col("url").contains("site1"), "ok")
        .otherwise(F.lit("bad/id"))
    )
    root = str(tmp_path / "tenants")
    with pytest.raises(ValueError):
        build_tenant_indexes(spark, wt, root, partition_seconds=PSEC,
                             block_span=BS)
    # nothing was built for ANY tenant -- the bad id failed the run
    # before the first build started
    assert not os.path.exists(os.path.join(root, "t_ok")) or not os.listdir(
        os.path.join(root, "t_ok")
    )
