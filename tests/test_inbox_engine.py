"""Inbox as an engine dimension: composed stream field = MiruInboxIndex
(one posting list per streamId), aggregate-counts page + read-state
unread resolution = AggregateCountsInboxQuestion +
MiruJustInTimeBackfillerizer (reads arrive AFTER the index build and are
consumed at query time from the streamed state table)."""

import datetime as dt
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest
from pyspark.sql import functions as F

from miru_spark.index.build import build_index
from miru_spark.query.engine import SearchEngine

N = 120
EPOCH = 1704067200_000_000


def _stream(d):
    return str(d % 4)

def _item(d):
    return str((d * 3) % 9)

def _ts_us(d):
    return EPOCH + d * 1_000_000


@pytest.fixture(scope="module")
def ib_engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ib_idx"))
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(N)
    wt = docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("url"),
        F.timestamp_micros(
            F.lit(EPOCH) + F.col("doc_id").cast("long") * 1_000_000
        ).alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text",
        F.lit("und").alias("lang"),
        F.create_map(
            F.lit("stream"),
            F.array((F.col("doc_id") % 4).cast("string")),
            F.lit("item"),
            F.array(((F.col("doc_id") * 3) % 9).cast("string")),
        ).alias("fields"),
    )
    build_index(
        spark, wt, d, partition_seconds=60, block_span=64,
        extra_fields=["stream", "item"],
    )
    return SearchEngine(spark, d)


def _oracle_page(stream, pred=lambda d: True):
    per_item = defaultdict(list)
    for d in range(N):
        if _stream(d) == stream and pred(d):
            per_item[_item(d)].append(d)
    rows = [
        {"value": it, "count": len(ds), "newest": max(ds),
         "last_act": _ts_us(max(ds))}
        for it, ds in per_item.items()
    ]
    rows.sort(key=lambda r: (-r["newest"], r["value"]))
    return rows


def test_inbox_page_no_reads(ib_engine):
    got = ib_engine.inbox("2", count=100)
    want = _oracle_page("2")
    assert [r["value"] for r in got["page"]] == [r["value"] for r in want]
    assert [r["count"] for r in got["page"]] == [r["count"] for r in want]
    assert [r["warc_us"] for r in got["page"]] == [
        r["last_act"] for r in want
    ]
    assert all(r["unread"] for r in got["page"])
    assert got["n_unread"] == got["n_items"] == len(want)


def test_inbox_pagination_and_isolation(ib_engine):
    all_rows = ib_engine.inbox("1", count=100)["page"]
    p0 = ib_engine.inbox("1", start=0, count=3)["page"]
    p1 = ib_engine.inbox("1", start=3, count=3)["page"]
    assert [r["value"] for r in p0 + p1] == [
        r["value"] for r in all_rows[:6]
    ]
    # stream isolation: stream 1 items come only from stream-1 docs
    want = {r["value"] for r in _oracle_page("1")}
    assert {r["value"] for r in all_rows} == want


def test_inbox_read_marks_driver_rows(ib_engine):
    want = _oracle_page("2")
    newest_item = want[0]
    older_item = want[-1]
    reads = [
        # read AT the newest activity -> not strictly newer -> read
        {"item": newest_item["value"], "op": "read",
         "ts": newest_item["last_act"], "seq": 1},
        # read BEFORE the last activity -> re-set unread
        {"item": older_item["value"], "op": "read",
         "ts": older_item["last_act"] - 1, "seq": 2},
    ]
    got = ib_engine.inbox("2", count=100, read_state=reads)
    flags = {r["value"]: r["unread"] for r in got["page"]}
    assert flags[newest_item["value"]] is False
    assert flags[older_item["value"]] is True
    assert got["n_unread"] == len(want) - 1
    # unread_only drops the read item from the page
    only = ib_engine.inbox(
        "2", count=100, read_state=reads, unread_only=True
    )
    assert newest_item["value"] not in {
        r["value"] for r in only["page"]
    }
    assert only["n_items"] == len(want)


def test_inbox_markall_and_unread_override(ib_engine):
    want = _oracle_page("2")
    cutoff = want[0]["last_act"]  # >= every activity
    reads = [
        {"item": None, "op": "mark_all_read", "ts": cutoff, "seq": -1},
        {"item": want[2]["value"], "op": "unread", "ts": cutoff + 1,
         "seq": 9},
    ]
    got = ib_engine.inbox("2", count=100, read_state=reads)
    flags = {r["value"]: r["unread"] for r in got["page"]}
    assert flags[want[2]["value"]] is True
    assert sum(flags.values()) == 1


def test_inbox_query_and_constraints_compose(ib_engine):
    # item values present in BOTH filters only
    got = ib_engine.inbox("2", query="item:3", count=100)
    assert {r["value"] for r in got["page"]} <= {"3"}


def test_inbox_streamed_state_consumed_at_query_time(
    ib_engine, spark, tmp_path
):
    """Reads arrive AFTER the index build, via the streaming sink; the
    inbox question consumes the state table by path."""
    from miru_spark.ops.readstate import READLOG_SCHEMA
    from miru_spark.streaming.readstate import stream_read_state

    want = _oracle_page("3")
    target = want[0]
    d_in = str(tmp_path / "oplog")
    d_state = str(tmp_path / "state")
    d_ck = str(tmp_path / "ckpt")
    t = dt.datetime(2024, 1, 1) + dt.timedelta(
        microseconds=target["last_act"] - EPOCH
    )
    spark.createDataFrame(
        [(3, int(target["value"]), "read", t, 1)], READLOG_SCHEMA
    ).coalesce(1).write.mode("append").parquet(d_in)
    assert stream_read_state(spark, d_in, d_state, d_ck) >= 1

    got = ib_engine.inbox("3", count=100, read_state=d_state)
    flags = {r["value"]: r["unread"] for r in got["page"]}
    assert flags[target["value"]] is False
    assert got["n_unread"] == len(want) - 1

    # other streams see no marks from stream 3's reads
    got2 = ib_engine.inbox("2", count=100, read_state=d_state)
    assert got2["n_unread"] == got2["n_items"]


def test_inbox_both_paths_agree(ib_engine):
    a = ib_engine.inbox("0", count=100, local=True)
    b = ib_engine.inbox("0", count=100, local=False)
    assert a == b
