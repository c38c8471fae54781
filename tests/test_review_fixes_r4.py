"""Regression tests for the round-4 review findings over the older
operator/streaming code (null-item reco oracle, idempotent changefeed
sink, empty-table pagination, sip null-warc_ts skip)."""

import json
import os

import duckdb
import pytest
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _mini_events(spark, tmp_path, rows):
    d = str(tmp_path / "sf_mini")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{d}/events.parquet")
    return d


def test_reco_oracle_handles_null_items(spark, tmp_path):
    """Review finding: NOT IN against a subquery containing NULL went
    three-valued in the oracle and returned zero rows while Spark's
    left_anti kept them; NOT EXISTS matches left_anti semantics."""
    import datetime as dt

    from miru_spark.ops.events_ops import (
        EV_RECO_COFILTER_SQL,
        ev_reco_cofilter,
    )

    t = dt.datetime(2024, 1, 1)
    rows = [
        # user 1 touches item 5 -- and has one props-less event (NULL item)
        (1, t, 1, "view", 1.0, '{"k": "5"}'),
        (2, t, 1, "view", 1.0, "{}"),
        # user 2 also touched 5 (contributor), plus items 7 and a NULL
        (3, t, 2, "view", 1.0, '{"k": "5"}'),
        (4, t, 2, "view", 1.0, '{"k": "7"}'),
        (5, t, 2, "view", 1.0, "{}"),
    ]
    d = _mini_events(spark, tmp_path, rows)
    key = lambda p: (p[0] is None, p[0] or "", p[1])  # noqa: E731
    got = sorted(
        ((r["item"], r["score"]) for r in
         ev_reco_cofilter(spark, d).collect()), key=key,
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{d}/events.parquet/*.parquet')"
    )
    want = sorted(
        ((i, s) for i, s in con.execute(EV_RECO_COFILTER_SQL).fetchall()),
        key=key,
    )
    assert got == want
    assert len(got) > 0  # item 7 (and the null-item group) recommend


def test_pagination_empty_events(spark, tmp_path):
    """Review finding: cursor.collect()[0] crashed on an empty events
    table while the SQL oracle returned an empty result."""
    from miru_spark.ops.gather_ops import (
        EV_PAGINATION_KEYSET_SQL,
        ev_pagination_keyset,
    )

    d = _mini_events(spark, tmp_path, [])
    assert ev_pagination_keyset(spark, d).collect() == []
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{d}/events.parquet/*.parquet')"
    )
    assert con.execute(EV_PAGINATION_KEYSET_SQL).fetchall() == []


def test_changefeed_sink_idempotent_under_replay(spark, tmp_path):
    """Review finding: the foreachBatch append sink duplicated rows when
    a batch replays after a crash-before-checkpoint; the per-batch
    partition-dir overwrite makes replay a no-op."""
    from miru_spark.streaming.stateful import write_changefeed_batch

    out = str(tmp_path / "feed")
    b0 = spark.createDataFrame(
        [(1, "a"), (2, "b")], "user_id long, state string"
    )
    write_changefeed_batch(b0, out, 0)
    write_changefeed_batch(b0, out, 0)  # at-least-once replay
    b1 = spark.createDataFrame([(1, "c")], "user_id long, state string")
    write_changefeed_batch(b1, out, 1)
    log = spark.read.parquet(out)
    assert log.count() == 3  # no duplicates from the replayed batch
    # live view (max batch_id per key) unaffected
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("batch_id"))
    live = (
        log.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("user_id", "state")
        .collect()
    )
    assert {(r["user_id"], r["state"]) for r in live} == {(1, "c"), (2, "b")}


def test_sip_skip_keeps_null_warc_ts_rows(spark, tmp_path):
    """Review finding: with late='skip' and late rows present in the
    batch, rows with null warc_ts (null pid) vanished from both the late
    count and the kept set."""
    from miru_spark.index.build import build_index
    from miru_spark.query.engine import SearchEngine
    from miru_spark.streaming.sip import sip_build
    from miru_spark.webtext import webtext_df

    idx = str(tmp_path / "idx_sip")
    wt0 = webtext_df(spark, 60, parallelism=2)
    build_index(spark, wt0, idx, partition_seconds=600, block_span=64)
    done_before = SearchEngine(spark, idx).n_docs

    # stream a batch with: one LATE row (ts inside a completed pid) and
    # one null-warc_ts row carrying a unique marker term
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    late_row = wt0.limit(1)
    null_row = wt0.limit(1).select(
        F.concat(F.lit("nullts-"), "url").alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.lit("uniquemarkerterm the doc").alias("text"),
        F.lit("en").alias("lang"),
    )
    late_row.unionByName(
        null_row.select(*late_row.columns)
    ).coalesce(1).write.mode("overwrite").parquet(in_dir)

    reports = sip_build(
        spark, in_dir, idx, str(tmp_path / "ck"),
        partition_seconds=600, block_span=64, late="skip",
    )
    # policy: the late row counts as late, the untimestamped row is
    # dropped AND counted separately (null warc_ts mints no partition)
    assert sum(r["late_rows"] for r in reports) == 1
    assert sum(r["null_ts_rows"] for r in reports) == 1
    eng = SearchEngine(spark, idx)
    assert eng.count("uniquemarkerterm") == 0
    assert eng.n_docs == done_before

    # late='error' surfaces untimestamped rows loudly
    import pytest as _pytest

    with _pytest.raises(Exception, match="null warc_ts"):
        sip_build(
            spark, in_dir, idx, str(tmp_path / "ck2"),
            partition_seconds=600, block_span=64, late="error",
        )

    # and build_index itself rejects them with a clear message
    bad = spark.read.parquet(in_dir)
    with _pytest.raises(Exception, match="null warc_ts"):
        build_index(
            spark, bad, str(tmp_path / "idx_bad"),
            partition_seconds=600, block_span=64,
        )
