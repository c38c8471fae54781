"""Wire-adapter golden corpus (VERDICT r4 #7): every endpoint kind's
reference-shaped JSON request body is FROZEN in
tests/fixtures/wire_golden_requests.json -- paging cursors and
authzExpression variants included -- and executed here against a
deterministic corpus. A saved reference dashboard's requests keep
running verbatim; editing the fixture file is a compat break."""

import json
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from miru_spark import wire
from miru_spark.index.build import build_index
from miru_spark.query.engine import SearchEngine

EPOCH = 1704067200_000_000
N = 160
FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "fixtures", "wire_golden_requests.json",
)

with open(FIXTURE) as _f:
    GOLDEN = json.load(_f)
BY_NAME = {e["name"]: e for e in GOLDEN["documents"] + GOLDEN["anomaly"]}


@pytest.fixture(scope="module")
def wg_engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("wire_golden_idx"))
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
        F.when(F.col("doc_id") % 2 == 0, "en").otherwise("de")
        .alias("lang"),
        F.create_map(
            F.lit("stream"),
            F.array((F.col("doc_id") % 4).cast("string")),
            F.lit("item"),
            F.array(((F.col("doc_id") * 3) % 9).cast("string")),
            F.lit("user"),
            F.array(F.format_string("u%d", F.col("doc_id") % 13)),
            F.lit("parent"),
            F.array(F.format_string("p%d", (F.col("doc_id") * 7) % 23)),
        ).alias("fields"),
        F.when(F.col("doc_id") % 3 == 0, F.array(F.lit("acl_a")))
        .otherwise(F.array(F.lit("acl_b"))).alias("authz"),
    )
    build_index(
        spark, wt, d, partition_seconds=60, block_span=64,
        extra_fields=["stream", "item", "user", "parent"],
    )
    eng = SearchEngine(spark, d)
    yield eng
    eng.close()


T0_MS = 1704067200_000
N_METRICS = 32


def _metric(i: int) -> dict:
    vals = [5, -6, 0, 1234, 63, -1]
    return {
        "datacenter": "dc1", "cluster": "c1", "host": f"h{i % 3}",
        "service": f"svc{i % 2}", "instance": str(i % 4),
        "version": "1.0", "tenant": "acme", "sampler": "jvm",
        "path": ["gc", "count"], "type": "gauge",
        "value": vals[i % len(vals)],
        "timestamp": str(T0_MS + (i // 8) * 3600_000 + (i % 8) * 1000),
    }


@pytest.fixture(scope="module")
def wg_anomaly(spark, tmp_path_factory):
    from miru_spark.siphon import (
        ANOMALY_FIELDS,
        anomaly_documents,
        parse_metrics,
    )

    d = str(tmp_path_factory.mktemp("wire_golden_anomaly"))
    raw = spark.createDataFrame(
        [(json.dumps(_metric(i)),) for i in range(N_METRICS)],
        "value string",
    )
    build_index(
        spark, anomaly_documents(parse_metrics(raw)), d,
        partition_seconds=3600, block_span=64,
        extra_fields=ANOMALY_FIELDS,
    )
    eng = SearchEngine(spark, d)
    yield eng
    eng.close()


@pytest.mark.parametrize(
    "name", [e["name"] for e in GOLDEN["documents"]]
)
def test_every_document_golden_executes(wg_engine, name):
    e = BY_NAME[name]
    got = wire.execute(wg_engine, e["kind"], e["request"])
    assert got is not None


@pytest.mark.parametrize("name", [e["name"] for e in GOLDEN["anomaly"]])
def test_every_anomaly_golden_executes(wg_anomaly, name):
    e = BY_NAME[name]
    got = wire.execute(wg_anomaly, e["kind"], e["request"])
    assert got is not None


def _run(eng, name):
    e = BY_NAME[name]
    return wire.execute(eng, e["kind"], e["request"])


def test_authz_variants(wg_engine):
    base = _run(wg_engine, "fulltext_tfidf_basic")
    assert base.count() > 0
    # empty grant list is a deny-all (MiruAuthzExpression with values)
    assert _run(wg_engine, "fulltext_authz_deny_all").count() == 0
    # granted labels mask to the acl_a third of the corpus
    granted = [r["url"] for r in
               _run(wg_engine, "fulltext_authz_granted").collect()]
    assert granted
    assert all(int(u[3:]) % 3 == 0 for u in granted)


def test_paging_cursor_concatenation(wg_engine):
    p0 = _run(wg_engine, "agg_counts_page0")["c1"]
    p1 = _run(wg_engine, "agg_counts_page1_cursor")["c1"]
    full = _run(wg_engine, "agg_counts_unpaged")["c1"]
    # the de-constrained item space has exactly 3 distinct values, so
    # page size 2 yields a full page then a 1-row tail page
    assert len(p0) == 2 and len(p1) == 1
    assert p0 + p1 == full


def test_typeahead_prefix_restriction(wg_engine):
    got = _run(wg_engine, "distincts_typeahead_prefixes")
    assert got
    assert all(str(v).startswith(("3", "6")) for v, _c in got)
    # uniques over the same prefixes counts exactly those values
    assert _run(wg_engine, "uniques_prefixed") == len(got)


def test_gather_fields_ride_the_page(wg_engine):
    got = _run(wg_engine, "agg_counts_gather_fields")["c1"]
    assert got
    for row in got:
        assert set(row["fields"]) <= {"user", "lang"}
        assert row["fields"].get("lang") in (["en"], ["de"])


def test_time_strategy_newest_first(wg_engine):
    rows = _run(wg_engine, "fulltext_time_strategy").collect()
    ids = [int(r["url"][3:]) for r in rows]
    assert ids == sorted(ids, reverse=True)


def test_anomaly_expansion_answers_per_value(wg_anomaly):
    got = _run(wg_anomaly, "anomaly_expansion")
    assert set(got) == {("gc", "svc0"), ("gc", "svc1")} or set(got) == {
        "gc:svc0", "gc:svc1"
    } or len(got) == 2
