"""Incremental (sip) build tests: Structured Streaming tail-consume with
checkpoint cursor must equal a from-scratch batch build, late arrivals
must not be silently dropped, and reopen_pids must repair."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from miru_spark.index.build import IndexPaths, build_index
from miru_spark.query.engine import SearchEngine
from miru_spark.streaming import reopen_pids, sip_build
from miru_spark.webtext import webtext_df

PSEC = 3600
N = 1200  # 7s apart -> 8400s -> 3 hourly pids


def _postings_sorted(spark, index_dir):
    from miru_spark.index.build import read_postings

    rows = (
        read_postings(spark, IndexPaths(index_dir))
        .select("pid", "term", "blk", "n", "ids_bin", "tfs_bin")
        .collect()
    )
    return sorted(
        (r["pid"], r["term"], r["blk"], r["n"], bytes(r["ids_bin"]),
         bytes(r["tfs_bin"]))
        for r in rows
    )


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("sip")
    return {
        "input": str(root / "input"),
        "index": str(root / "index"),
        "ckpt": str(root / "ckpt"),
        "full": str(root / "full_index"),
    }


def test_sip_incremental_equals_batch(spark, dirs):
    wt = webtext_df(spark, N).withColumn(
        "hour", F.date_trunc("hour", "warc_ts")
    )
    hours = sorted(r["hour"] for r in wt.select("hour").distinct().collect())
    assert len(hours) >= 3

    # batch 1: first hour only
    wt.filter(F.col("hour") == hours[0]).drop("hour").write.mode(
        "append"
    ).parquet(dirs["input"])
    reps1 = sip_build(
        spark, dirs["input"], dirs["index"], dirs["ckpt"],
        partition_seconds=PSEC, block_span=256,
    )
    assert sum(len(r["pids_built"]) for r in reps1) == 1

    # no new files -> no-op (cursor at head)
    reps_noop = sip_build(
        spark, dirs["input"], dirs["index"], dirs["ckpt"],
        partition_seconds=PSEC, block_span=256,
    )
    assert sum(len(r.get("pids_built", [])) for r in reps_noop) == 0

    # batch 2: remaining hours arrive
    wt.filter(F.col("hour") != hours[0]).drop("hour").write.mode(
        "append"
    ).parquet(dirs["input"])
    reps2 = sip_build(
        spark, dirs["input"], dirs["index"], dirs["ckpt"],
        partition_seconds=PSEC, block_span=256,
    )
    built2 = [p for r in reps2 for p in r["pids_built"]]
    assert len(built2) == len(hours) - 1

    # incremental result == from-scratch batch build, bit for bit
    build_index(
        spark, webtext_df(spark, N), dirs["full"],
        partition_seconds=PSEC, block_span=256, resume=False,
    )
    assert _postings_sorted(spark, dirs["index"]) == _postings_sorted(
        spark, dirs["full"]
    )

    # and the engine answers identically over both
    e1 = SearchEngine(spark, dirs["index"])
    e2 = SearchEngine(spark, dirs["full"])
    q = "w000001 AND w000002"
    assert e1.search_collect(q, k=10) == e2.search_collect(q, k=10)


def test_sip_late_arrival_raises_then_reopen(spark, dirs, tmp_path):
    # a file whose rows fall into the already-complete first pid
    late_dir = str(tmp_path / "late_input")
    ckpt2 = str(tmp_path / "ckpt2")
    idx = dirs["index"]
    wt = webtext_df(spark, 100)  # rows 0..99 live in hour 0 (complete)
    wt.write.mode("append").parquet(late_dir)
    with pytest.raises(Exception, match="already-complete"):
        sip_build(
            spark, late_dir, idx, ckpt2,
            partition_seconds=PSEC, block_span=256,
        )

    # repair path: reopen the pid, rebuild from the full input
    lineage = spark.read.parquet(IndexPaths(idx).lineage)
    first_pid = min(r["pid"] for r in lineage.collect())
    reopen_pids(spark, idx, [first_pid])
    rep = build_index(
        spark, webtext_df(spark, N), idx,
        partition_seconds=PSEC, block_span=256, resume=True,
    )
    assert rep.pids_built == [first_pid]
    full = dirs["full"]
    assert _postings_sorted(spark, idx) == _postings_sorted(spark, full)


def test_sip_build_then_remove_then_query(spark, tmp_path_factory):
    """Integration: incremental sip build -> doc-level tombstone ->
    queries exclude the removed doc, rank-identical to the oracle minus
    the victim, on BOTH the serving-node and kernel paths."""
    import math

    from miru_spark.index.removals import remove_docs
    from miru_spark.oracle import OracleIndex
    from miru_spark.webtext import generate_rows

    root = tmp_path_factory.mktemp("sip_rm")
    idx = str(root / "idx")
    ckpt = str(root / "ckpt")
    src = str(root / "src")
    webtext_df(spark, 900, parallelism=4).write.mode("overwrite").parquet(src)
    sip_build(spark, src, idx, ckpt, partition_seconds=PSEC)

    eng0 = SearchEngine(spark, idx)
    q = "w000001 AND w000004"
    top = eng0.search_collect(q, k=3)
    assert top
    victims = [(int(top[0][0]), int(top[0][1]))]
    eng0.close()
    remove_docs(spark, idx, victims)

    oracle = OracleIndex(generate_rows(range(900)), partition_seconds=PSEC)
    full = oracle.search(q, k=10**9)
    want = [r for r in full if (r[0], r[1]) not in set(victims)][:10]

    eng = SearchEngine(spark, idx)
    try:
        for local in (None, False):
            got = eng.search_collect(q, k=10, local=local)
            assert len(got) == len(want), (local, len(got), len(want))
            for g, w in zip(got, want):
                assert (g[0], g[1]) == (w[0], w[1]), (local, g, w)
                assert math.isclose(g[2], w[2], rel_tol=0, abs_tol=1e-9)
    finally:
        eng.close()


def test_sip_with_authz_equals_batch(spark, tmp_path):
    """Streamed ingest of authz-labeled docs == batch build bit-for-bit,
    and the streamed index enforces grants (WEBTEXT_SCHEMA carries the
    optional authz array; parquet files written without it read as
    null)."""
    root = tmp_path
    d_in, d_idx, d_ck = (
        str(root / "in"), str(root / "idx"), str(root / "ck"),
    )
    d_full = str(root / "full")
    n = 600
    wt = webtext_df(spark, n).withColumn(
        "authz",
        F.array(F.format_string("g%d", F.crc32(F.col("url")) % 3)),
    )
    wt.write.mode("append").parquet(d_in)
    sip_build(spark, d_in, d_idx, d_ck, partition_seconds=PSEC,
              block_span=256)
    build_index(spark, wt, d_full, partition_seconds=PSEC,
                block_span=256, resume=False)
    assert _postings_sorted(spark, d_idx) == _postings_sorted(
        spark, d_full
    )
    e = SearchEngine(spark, d_idx)
    all_hits = e.search_collect("w000001", k=n)
    g1 = e.search_collect("w000001", k=n, authz=["g1"])
    assert 0 < len(g1) < len(all_hits)
    assert {t[:2] for t in g1} < {t[:2] for t in all_hits}
    # union over the full grant set == unfiltered
    union = e.search_collect("w000001", k=n, authz=["g0", "g1", "g2"])
    assert union == all_hits
    e.close()
