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


# -- fourth review wave: query-core findings --------------------------------


def test_pbutnotq_valueless_first_operand_is_empty():
    """Review finding: a valueless FIRST pButNotQ field filter must
    empty the result, not promote the exclusion into the positive
    slot."""
    from miru_spark.wire import filter_tree

    f = {
        "operation": "pButNotQ",
        "fieldFilters": [
            {"fieldName": "lang", "values": []},
            {"fieldName": "lang", "values": ["en"]},
        ],
    }
    assert filter_tree(f) == ("none",)
    # a valueless EXCLUSION is a no-op, leaving just the positive
    f2 = {
        "operation": "pButNotQ",
        "fieldFilters": [
            {"fieldName": "lang", "values": ["en"]},
            {"fieldName": "lang", "values": []},
        ],
    }
    assert filter_tree(f2) == ("term", "lang\x1fen")


def test_with_access_threads_use_stopwords():
    """Review finding: constraints share the query's analyzer config."""
    from miru_spark.queryparse import parse_query, with_access

    base = parse_query("press", "en", use_stopwords=False)
    tree = with_access(
        base, constraints="the office", locale="en", use_stopwords=False
    )
    # 'the' survives as a constraint conjunct with stopwords off
    flat = repr(tree)
    assert "'the'" in flat
    on = with_access(base, constraints="the office", locale="en")
    assert "'the'" not in repr(on)


def test_bare_string_authz_rejected():
    """Review finding: a bare string iterates per character -- one bogus
    single-char label per letter. Reject loudly on both sides."""
    from miru_spark.fields import doc_field_terms, extra_field_terms
    from miru_spark.queryparse import parse_query, with_access

    with pytest.raises(TypeError, match="bare.*string"):
        doc_field_terms("http://site1.example/x", "en", 5, authz="admin")
    with pytest.raises(TypeError, match="bare string"):
        extra_field_terms({"tag": "news"}, ["tag"])
    with pytest.raises(TypeError, match="bare.*string"):
        with_access(parse_query("x", "en"), authz="admin")
    # the list forms still work
    assert doc_field_terms(
        "http://site1.example/x", "en", 5, authz=["Admin"]
    )[-1].endswith("admin")


def test_field_scoped_phrase_rejected():
    """Review finding: field:"multi word" silently misparsed into a
    quote-bearing composed term plus stray scored terms."""
    from miru_spark.queryparse import QueryParseError, parse_query

    with pytest.raises(QueryParseError, match="field-scoped phrase"):
        parse_query('lang:"en us" hello', "en")


def test_wire_malformed_requests_raise_wire_error():
    from miru_spark.wire import WireError, filter_tree, time_range_us

    # non-numeric value for a numeric field
    with pytest.raises(WireError, match="non-numeric"):
        filter_tree({
            "operation": "and",
            "fieldFilters": [{"fieldName": "site", "values": ["abc"]}],
        })
    # explicit nulls mean unbounded
    assert time_range_us(
        {"smallestTimestamp": None, "largestTimestamp": 5}
    ) == (0, 5)
    assert time_range_us(
        {"smallestTimestamp": None, "largestTimestamp": None}
    ) is None


def test_wire_time_strategy_highlight_passthrough(spark, tmp_path):
    """Review finding: execute(..., highlight_from=) crashed for TIME
    strategy; newest now supports the same summary passthrough."""
    from miru_spark.index import build_index
    from miru_spark.query.engine import SearchEngine
    from miru_spark.webtext import webtext_df
    from miru_spark.wire import execute

    d = str(tmp_path / "idx_wt")
    wt = webtext_df(spark, 80, parallelism=2)
    build_index(spark, wt, d, partition_seconds=600, block_span=64)
    eng = SearchEngine(spark, d)
    req = {"query": {
        "timeRange": None, "defaultField": "text", "locale": "en",
        "useStopWords": True, "query": "w000001",
        "constraintsFilter": None, "strategy": "TIME",
        "desiredNumberOfResults": 5,
    }}
    out = execute(eng, "fulltext", req, highlight_from=wt)
    rows = out.collect()
    assert rows and "summary" in out.columns
    assert any(r["summary"] for r in rows)
    # newest-first order preserved under the summary wrap
    ids = [(r["pid"], r["doc_id"]) for r in rows]
    assert ids == sorted(ids, reverse=True)
