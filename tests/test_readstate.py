"""Read/unread state: batch resolution semantics + streaming MERGE where
read ops arrive AFTER the inbox is built (VERDICT r2 item 4; reference:
READ/UNREAD/MARK_ALL_READ WAL types, MiruPartitionedActivity.java:17-19,
applied by MiruJustInTimeBackfillerizer against the inbox index)."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from miru_spark.ops.readstate import (
    READLOG_SCHEMA,
    unread_counts,
    unread_items,
)
from miru_spark.streaming.readstate import (
    read_state,
    stream_read_state,
    unread_counts_from_state,
)

D0 = dt.datetime(2024, 3, 1)

INBOX_SCHEMA = "user_id long, item long, ts timestamp"


def _t(h):
    return D0 + dt.timedelta(hours=h)


def _inbox(spark):
    # user 1: items 10 (acts @1,@5), 11 (@2); user 2: item 10 (@3)
    rows = [
        (1, 10, _t(1)), (1, 10, _t(5)), (1, 11, _t(2)), (2, 10, _t(3)),
    ]
    return spark.createDataFrame(rows, INBOX_SCHEMA)


def _counts(df):
    return {r["user_id"]: r["n_unread"] for r in df.collect()}


def test_no_reads_everything_unread(spark):
    log = spark.createDataFrame([], READLOG_SCHEMA)
    assert _counts(unread_counts(_inbox(spark), log)) == {1: 2, 2: 1}


def test_read_clears_until_newer_activity(spark):
    # read item 10 at h=2: activity @5 re-sets unread; item 11 read @3
    log = spark.createDataFrame(
        [(1, 10, "read", _t(2), 1), (1, 11, "read", _t(3), 2)],
        READLOG_SCHEMA,
    )
    pairs = {(r["user_id"], r["item"])
             for r in unread_items(_inbox(spark), log).collect()}
    assert pairs == {(1, 10), (2, 10)}


def test_unread_overrides_read(spark):
    log = spark.createDataFrame(
        [(1, 11, "read", _t(3), 1), (1, 11, "unread", _t(4), 2)],
        READLOG_SCHEMA,
    )
    pairs = {(r["user_id"], r["item"])
             for r in unread_items(_inbox(spark), log).collect()}
    assert (1, 11) in pairs


def test_mark_all_read_cutoff(spark):
    # user 1 marks all read at h=4: item 11 (@2) cleared, item 10 has
    # newer activity (@5) so stays unread; user 2 untouched
    log = spark.createDataFrame(
        [(1, None, "mark_all_read", _t(4), -1)], READLOG_SCHEMA
    )
    pairs = {(r["user_id"], r["item"])
             for r in unread_items(_inbox(spark), log).collect()}
    assert pairs == {(1, 10), (2, 10)}


def test_markall_wins_ties_and_explicit_after_wins(spark):
    # explicit unread strictly after the mark_all_read cutoff wins
    log = spark.createDataFrame(
        [
            (1, None, "mark_all_read", _t(6), -1),
            (1, 11, "unread", _t(7), 5),
        ],
        READLOG_SCHEMA,
    )
    pairs = {(r["user_id"], r["item"])
             for r in unread_items(_inbox(spark), log).collect()}
    assert pairs == {(1, 11), (2, 10)}


def test_streaming_reads_after_inbox_build(spark, tmp_path):
    """Inbox exists first; read ops stream in later in two batches. The
    merged state after each drain yields the same unread answer as batch
    resolution over the full log so far."""
    d_in = str(tmp_path / "oplog")
    d_state = str(tmp_path / "state")
    d_ck = str(tmp_path / "ckpt")
    inbox = _inbox(spark)

    # inbox built, zero ops streamed: everything unread via the state path
    assert _counts(unread_counts_from_state(inbox, None)) == {1: 2, 2: 1}

    # batch 1 arrives AFTER the build: user 1 reads item 10 at h=2
    log1 = [(1, 10, "read", _t(2), 1)]
    spark.createDataFrame(log1, READLOG_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(d_in)
    assert stream_read_state(spark, d_in, d_state, d_ck) >= 1
    got = _counts(
        unread_counts_from_state(inbox, read_state(spark, d_state))
    )
    want = _counts(
        unread_counts(inbox, spark.createDataFrame(log1, READLOG_SCHEMA))
    )
    assert got == want  # item 10 re-set by @5 activity -> {1: 2, 2: 1}

    # batch 2: read item 10 again later (h=6, clears it), mark-all for
    # user 2, and an unread flip for user 1 item 11
    log2 = [
        (1, 10, "read", _t(6), 2),
        (2, None, "mark_all_read", _t(9), -1),
        (1, 11, "read", _t(3), 3),
        (1, 11, "unread", _t(4), 4),
    ]
    spark.createDataFrame(log2, READLOG_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(d_in)
    assert stream_read_state(spark, d_in, d_state, d_ck) >= 1
    got = _counts(
        unread_counts_from_state(inbox, read_state(spark, d_state))
    )
    full = spark.createDataFrame(log1 + log2, READLOG_SCHEMA)
    want = _counts(unread_counts(inbox, full))
    assert got == want == {1: 1}  # only (1, 11) unread; user 2 all read

    # state stays compact: one explicit row per (user, item) + markalls
    srows = read_state(spark, d_state).collect()
    keys = [(r["user_id"], r["item"], r["op"]) for r in srows]
    assert len(keys) == len(set(keys))
    assert len([k for k in keys if k[2] != "mark_all_read"]) <= 2


def test_streaming_sink_never_rewrites_untouched_buckets(spark, tmp_path):
    """Scale shape of the MERGE sink (VERDICT r3 item 3): state lives in
    hash(user_id) buckets under write-once epoch dirs; a batch rewrites
    ONLY the buckets it touches (manifest entries for other buckets keep
    pointing at their old epoch, files untouched), the swap is one
    atomic manifest replace, and nothing state-sized reaches the driver
    (the sink's only collect is the batch's distinct bucket ids)."""
    import inspect
    import json

    from miru_spark import streaming as _s
    from miru_spark.streaming import readstate as rs

    d_in = str(tmp_path / "oplog")
    d_state = str(tmp_path / "state")
    d_ck = str(tmp_path / "ckpt")

    # batch 1: many users spread across buckets
    rows1 = [(u, 1, "read", _t(1), u) for u in range(40)]
    spark.createDataFrame(rows1, READLOG_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(d_in)
    stream_read_state(spark, d_in, d_state, d_ck)
    with open(f"{d_state}/MANIFEST") as f:
        m1 = json.load(f)
    files1 = {
        b: sorted(
            (fn, os.stat(f"{d_state}/{ep}/bucket={b}/{fn}").st_mtime_ns)
            for fn in os.listdir(f"{d_state}/{ep}/bucket={b}")
            if fn.endswith(".parquet")
        )
        for b, ep in m1["buckets"].items()
    }

    # batch 2 touches exactly one user -> one bucket
    rows2 = [(7, 2, "read", _t(2), 100)]
    spark.createDataFrame(rows2, READLOG_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(d_in)
    stream_read_state(spark, d_in, d_state, d_ck)
    with open(f"{d_state}/MANIFEST") as f:
        m2 = json.load(f)

    from pyspark.sql import functions as F
    b7 = spark.createDataFrame([(7,)], "user_id long").select(
        F.pmod(F.hash("user_id"), F.lit(m1["n_buckets"])).cast("int")
    ).collect()[0][0]
    changed = {
        b for b in m2["buckets"]
        if m1["buckets"].get(b) != m2["buckets"][b]
    }
    assert changed == {str(b7)}
    # untouched buckets: identical epoch, identical files (mtime pinned)
    for b, ep in m2["buckets"].items():
        if b == str(b7):
            continue
        assert ep == m1["buckets"][b]
        got = sorted(
            (fn, os.stat(f"{d_state}/{ep}/bucket={b}/{fn}").st_mtime_ns)
            for fn in os.listdir(f"{d_state}/{ep}/bucket={b}")
            if fn.endswith(".parquet")
        )
        assert got == files1[b]
    # merged answer still correct across epochs
    srows = read_state(spark, d_state).collect()
    assert {(r["user_id"], r["item"]) for r in srows} == {
        (u, 1) for u in range(40)
    } | {(7, 2)}

    # the driver-materialization pattern is gone from the sink source
    src = inspect.getsource(rs)
    assert "coalesce(1)" not in src
    assert ".collect()" not in src.replace(
        'batch_b.select("bucket").distinct().collect()', ""
    )
    del _s


def test_resolution_equals_wal_replay_randomized(spark):
    """Latest-op-wins resolution == sequential WAL replay (the reference
    applies READ/UNREAD/MARK_ALL_READ bit flips in WAL order). 300
    random scenarios, namespaced into ONE Spark resolution pass.

    Replay total order: (ts, activities < explicit ops < mark_all_read,
    seq) -- activity at the same instant as a read is covered by it;
    mark_all_read lands after same-instant per-item flips (the
    documented tie rule)."""
    import random

    rng = random.Random(1234)
    N_SCEN = 300
    inbox_rows, log_rows = [], []
    expected: dict[int, set] = {}
    seq_counter = [0]

    for s in range(N_SCEN):
        base = s * 100
        events = []  # (ts, phase, seq, kind, user, item)
        for _ in range(rng.randint(1, 6)):
            u, it, ts = rng.randrange(2), rng.randrange(3), rng.randrange(10)
            events.append((ts, 0, 0, "act", u, it))
            inbox_rows.append((base + u, it, _t(ts)))
        for _ in range(rng.randint(0, 6)):
            u, it, ts = rng.randrange(2), rng.randrange(3), rng.randrange(10)
            op = rng.choice(["read", "unread"])
            seq_counter[0] += 1
            events.append((ts, 1, seq_counter[0], op, u, it))
            log_rows.append((base + u, it, op, _t(ts), seq_counter[0]))
        for _ in range(rng.randint(0, 2)):
            u, ts = rng.randrange(2), rng.randrange(10)
            events.append((ts, 2, 0, "mark_all_read", u, None))
            log_rows.append((base + u, None, "mark_all_read", _t(ts), -1))

        # sequential replay
        state: dict[tuple, bool] = {}
        inbox_seen: set = set()
        for ts, _ph, _sq, kind, u, it in sorted(
            events, key=lambda e: (e[0], e[1], e[2])
        ):
            if kind == "act":
                inbox_seen.add((u, it))
                state[(u, it)] = True
            elif kind == "read":
                state[(u, it)] = False
            elif kind == "unread":
                state[(u, it)] = True
            else:  # mark_all_read: clears every item in the inbox so far
                for (uu, ii) in inbox_seen:
                    if uu == u:
                        state[(uu, ii)] = False
        expected[s] = {
            (base + u, it)
            for (u, it), unread in state.items()
            if unread and (u, it) in inbox_seen
        }

    inbox = spark.createDataFrame(inbox_rows, INBOX_SCHEMA)
    log = spark.createDataFrame(log_rows, READLOG_SCHEMA)
    got_all = {
        (r["user_id"], r["item"])
        for r in unread_items(inbox, log).collect()
    }
    for s in range(N_SCEN):
        base = s * 100
        got = {(u, i) for (u, i) in got_all if base <= u < base + 100}
        assert got == expected[s], f"scenario {s}: {got} != {expected[s]}"
