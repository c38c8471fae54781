"""Feed siphons (miru_spark/siphon.py): the edge-siphon and stumptown
LogMill analogs -- external feeds projected onto the document shape,
indexed via extra_fields, answered by the real engine."""

import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest
from pyspark.sql import functions as F

from miru_spark.index.build import build_index
from miru_spark.query.engine import SearchEngine
from miru_spark.siphon import (
    EDGE_FIELDS,
    LOG_FIELDS,
    edge_documents,
    level_counts,
    log_documents,
    parse_edges,
)

T0 = 1704067200_000  # epoch millis


def _edge(i: int) -> dict:
    return {
        "id": 1000 + i,
        "timestamp": T0 + i * 1000,
        "tenant": "acme",
        "user": f"u{i % 5}",
        "name": f"call rpc{i % 3}",
        "origin": f"svc{i % 4}",
        "destination": f"svc{(i + 1) % 4}",
        "tags": [f"t{i % 2}", "all"] if i % 7 else None,
        "latency": 10 * i,
    }


N_EDGES = 60


@pytest.fixture(scope="module")
def edges_kv(spark):
    # KV change-log shape: (key, value JSON bytes), like the amza rows
    # the reference siphon tails
    rows = [
        (1000 + i, json.dumps(_edge(i)).encode()) for i in range(N_EDGES)
    ]
    return spark.createDataFrame(rows, "key long, value binary")


@pytest.fixture(scope="module")
def edge_engine(spark, edges_kv, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("edge_idx"))
    docs = edge_documents(parse_edges(edges_kv, id_col="key"))
    build_index(
        spark, docs, d,
        partition_seconds=10**9, block_span=64,
        extra_fields=EDGE_FIELDS,
    )
    eng = SearchEngine(spark, d)
    yield eng
    eng.close()


def test_parse_edges_types_and_id_override(spark, edges_kv):
    rows = parse_edges(edges_kv, id_col="key").orderBy("id").collect()
    assert len(rows) == N_EDGES
    r = rows[8]
    assert r["id"] == 1008 and r["latency"] == 80
    assert r["origin"] == "svc0" and r["destination"] == "svc1"
    assert r["tags"] == ["t0", "all"]
    assert rows[7]["tags"] is None  # i=7: i%7==0 -> null tags


def test_edge_documents_shape(spark, edges_kv):
    docs = edge_documents(parse_edges(edges_kv, id_col="key"))
    assert [f.name for f in docs.schema.fields[:6]] == [
        "url", "warc_ts", "html", "text", "lang", "fields",
    ]
    r = docs.filter(F.col("edge_id") == 1000).collect()[0]
    assert r["url"] == "edge://acme/1000"
    assert r["warc_ts"].timestamp() == T0 / 1000
    # null tags dropped from the fields map, never minted as terms
    assert "tags" not in dict(r["fields"])
    assert dict(r["fields"])["origin"] == ["svc0"]


def test_edge_engine_filters_and_features(edge_engine):
    # per-value counts via the composed field terms
    origins = Counter(f"svc{i % 4}" for i in range(N_EDGES))
    assert dict(edge_engine.distincts("origin")) == dict(origins)
    assert edge_engine.count("origin:svc1") == origins["svc1"]
    # multiTerm tags: every i%7!=0 edge carries "all"
    n_tagged = sum(1 for i in range(N_EDGES) if i % 7)
    assert edge_engine.count("tags:all") == n_tagged
    # gatherFeatures over (origin, destination) == input co-occurrence
    want = Counter(
        (f"svc{i % 4}", f"svc{(i + 1) % 4}") for i in range(N_EDGES)
    )
    got = dict(edge_engine.gather_features(("origin", "destination")))
    assert got == dict(want)
    # ranked search over the name text relation composes with filters:
    # name="call rpc{i%3}", origin=svc{i%4} -> matches are i == 10 mod 12
    hits = edge_engine.search_collect("rpc1 AND origin:svc2", k=50)
    assert len(hits) == sum(
        1 for i in range(N_EDGES) if i % 3 == 1 and i % 4 == 2
    )
    assert {h[-1] for h in hits} == {
        f"edge://acme/{1000 + i}"
        for i in range(N_EDGES)
        if i % 3 == 1 and i % 4 == 2
    }


def _log(i: int) -> dict:
    levels = ["INFO", "WARN", "ERROR"]
    return {
        "datacenter": "dc1",
        "cluster": f"c{i % 2}",
        "host": f"h{i % 3}",
        "service": "api",
        "instance": str(i % 2),
        "version": "1.0",
        "level": levels[i % 3] if i % 5 else None,  # exercise defaults
        "threadName": f"thread-{i % 4}",
        "loggerName": "com.example.Api",
        "methodName": "handle",
        "lineNumber": str(40 + i % 3),
        "message": f"request failed shard{i % 6}"
        if i % 3 == 2
        else f"request ok shard{i % 6}",
        "timestamp": str(T0 + i * 60_000),
        "exceptionClass": "java.io.IOException" if i % 3 == 2 else None,
        "thrownStackTrace": ["at com.example.Api.handle(Api.java:42)"]
        if i % 3 == 2
        else None,
    }


N_LOGS = 90


@pytest.fixture(scope="module")
def log_events(spark):
    return spark.createDataFrame(
        [_log(i) for i in range(N_LOGS)],
        "datacenter string, cluster string, host string, service string,"
        "instance string, version string, level string, threadName string,"
        "loggerName string, methodName string, lineNumber string,"
        "message string, timestamp string, exceptionClass string,"
        "thrownStackTrace array<string>",
    )


@pytest.fixture(scope="module")
def log_engine(spark, log_events, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("log_idx"))
    build_index(
        spark, log_documents(log_events), d,
        partition_seconds=3600, block_span=64,
        extra_fields=LOG_FIELDS,
    )
    eng = SearchEngine(spark, d)
    yield eng
    eng.close()


def test_log_documents_deterministic_and_defaulted(spark, log_events):
    docs = log_documents(log_events)
    r = docs.orderBy("warc_ts").collect()
    assert len(r) == N_LOGS
    # deterministic: re-projection yields byte-identical urls
    again = log_documents(log_events).orderBy("warc_ts").collect()
    assert [x["url"] for x in r] == [y["url"] for y in again]
    assert len({x["url"] for x in r}) == N_LOGS
    # i=0 has level=None -> "INFO" default rides into the fields map
    assert dict(r[0]["fields"])["level"] == ["INFO"]
    assert r[0]["warc_ts"].timestamp() == T0 / 1000
    # stack trace text reaches the text relation
    err = [x for x in r if "IOException" in x["text"]]
    assert len(err) == sum(1 for i in range(N_LOGS) if i % 3 == 2)
    assert "api.java" in err[0]["text"].lower()


def test_log_engine_stumptown_page(log_engine):
    # the stumptown product query: newest-k ERROR page + waveform,
    # filter by level dimension, full-text over the message
    n_err_lvl = sum(
        1 for i in range(N_LOGS) if i % 5 and i % 3 == 2
    )
    assert log_engine.count("level:error") == n_err_lvl
    sp = log_engine.stumptown(
        "failed AND level:error", bucket_seconds=3600, k=5
    )
    n_match = log_engine.count("failed AND level:error")
    assert sum(c for _, c in sp["waveform"]) == n_match
    assert len(sp["results"]) == min(5, n_match)
    # newest-first page (results rows are (url, warc_ts_us, pid, doc_id))
    ts = [row[1] for row in sp["results"]]
    assert ts == sorted(ts, reverse=True)
    # tokenized exception text is searchable
    assert log_engine.count("ioexception") == sum(
        1 for i in range(N_LOGS) if i % 3 == 2
    )


def test_level_counts_matches_input(spark, log_events):
    got: Counter = Counter()
    for r in level_counts(log_events).collect():
        got[(r["cluster"], r["level"])] += r["n"]
    want: Counter = Counter()
    for i in range(N_LOGS):
        e = _log(i)
        want[(e["cluster"], e["level"] or "INFO")] += 1
    assert dict(got) == dict(want)


def test_streaming_log_intake_sips_into_index(spark, log_events, tmp_path):
    """The stumptown intake loop (MiruStumptownIntakeService.java:80:
    log feed -> mill -> writer): log events land as files, sip_build
    consumes them through the log_documents transform, the engine
    answers; a second wave appends incrementally and a third call is a
    no-op."""
    from miru_spark.streaming.sip import sip_build

    feed = str(tmp_path / "feed")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    schema = (
        "datacenter string, cluster string, host string, service string,"
        "instance string, version string, level string, threadName string,"
        "loggerName string, methodName string, lineNumber string,"
        "message string, timestamp string, exceptionClass string,"
        "thrownStackTrace array<string>"
    )
    # waves split on the hourly pid boundary (events are minute-spaced):
    # a completed pid is immutable, so each wave must bring NEW pids
    cut = F.col("timestamp").cast("long") < T0 + 60 * 60_000
    first = log_events.filter(cut)
    n_first = first.count()
    first.coalesce(1).write.mode("append").parquet(feed)
    reps = sip_build(
        spark, feed, idx, ckpt,
        partition_seconds=3600, block_span=64,
        schema=schema, transform=log_documents,
        extra_fields=LOG_FIELDS,
    )
    assert sum(r["n_docs"] for r in reps) == n_first
    eng = SearchEngine(spark, idx)
    assert eng.count("request") == n_first
    eng.close()

    # wave 2: the rest of the feed lands in the next hour's pid
    log_events.filter(~cut).coalesce(1).write.mode("append").parquet(feed)
    sip_build(
        spark, feed, idx, ckpt,
        partition_seconds=3600, block_span=64,
        schema=schema, transform=log_documents,
    )
    eng = SearchEngine(spark, idx)
    assert eng.count("request") == N_LOGS
    n_err = sum(1 for i in range(N_LOGS) if i % 5 and i % 3 == 2)
    assert eng.count("level:error") == n_err
    eng.close()

    # no new files -> no-op
    reps3 = sip_build(
        spark, feed, idx, ckpt,
        partition_seconds=3600, block_span=64,
        schema=schema, transform=log_documents,
    )
    assert sum(r["n_docs"] for r in reps3) == 0


# ---------------------------------------------------------------------------
# syslog intake (SyslogEvent.java parse -> MiruLogEvent -> log_documents)
# ---------------------------------------------------------------------------

SYSLOG_LINES = [
    # SyslogEventParseTest.testParseFormat1
    "Nov 21 17:32:09 ip-10-126-5-158 ec2net: [rewrite_aliases] Rewriting aliases of eth0",
    # the four shapes from the SyslogEvent.build() comment block
    "Nov 15 21:24:55 localhost kernel: x86/fpu: Supporting XSAVE feature 0x001: 'x87 floating point registers'",
    "Nov 17 23:23:49 e1 etcd2[889]: compacted raft log at 95010",
    "Nov 17 23:24:10 e1 systemd[1]: Time has been changed",
    "2016-11-17T16:51:26.767584-08:00 soa-prime-data1 /usr/sbin/gmetad[2263]: data_thread() got no answer from any [my cluster] datasource",
    # single-digit day (the dateLength=15 branch)
    "Nov 5 23:23:49 e1 systemd[1]: Time has been changed",
    # bare app token without colon: first word becomes the service
    "Nov 17 23:25:00 e1 standalone message body",
    # nothing after the host token: service/instance stay null
    "Nov 17 23:26:00 solo",
    # unparsable date -> dropped
    "not a syslog line at all",
    "",
]


def _syslog_df(spark):
    return spark.createDataFrame(
        [(l, "10.0.0.9:514") for l in SYSLOG_LINES],
        "value string, addr string",
    )


def test_parse_syslog_golden(spark):
    from datetime import datetime
    from zoneinfo import ZoneInfo

    from miru_spark.siphon import parse_syslog

    tz = ZoneInfo(spark.conf.get("spark.sql.session.timeZone"))
    out = parse_syslog(
        _syslog_df(spark), line_col="value", addr_col="addr", year=2016
    ).collect()
    # the two dateless garbage lines are dropped (SyslogEvent null)
    assert len(out) == len(SYSLOG_LINES) - 2
    by_msg = {r["message"]: r for r in out}

    r = by_msg["[rewrite_aliases] Rewriting aliases of eth0"]
    assert (r["host"], r["service"], r["instance"]) == (
        "ip-10-126-5-158", "ec2net", None,
    )
    assert r["level"] == "INFO"
    want_ms = int(
        datetime(2016, 11, 21, 17, 32, 9, tzinfo=tz).timestamp() * 1000
    )
    assert int(r["timestamp"]) == want_ms

    r = by_msg["compacted raft log at 95010"]
    assert (r["host"], r["service"], r["instance"]) == (
        "e1", "etcd2", "889",
    )

    # ISO branch: exact instant incl. the -08:00 offset and micro->milli
    r = by_msg[
        "data_thread() got no answer from any [my cluster] datasource"
    ]
    assert (r["host"], r["service"], r["instance"]) == (
        "soa-prime-data1", "/usr/sbin/gmetad", "2263",
    )
    want = datetime.fromisoformat("2016-11-17T16:51:26.767584-08:00")
    assert int(r["timestamp"]) == int(want.timestamp() * 1000) \
        or int(r["timestamp"]) == int(want.timestamp()) * 1000 + 767

    # single-digit day parses under the MMM d branch
    r = [
        x for x in out
        if x["message"] == "Time has been changed"
    ]
    assert len(r) == 2
    days = {
        datetime.fromtimestamp(int(x["timestamp"]) / 1000, tz).day
        for x in r
    }
    assert days == {17, 5}

    # bare app token: first word is the service, rest is the message
    r = by_msg["message body"]
    assert (r["host"], r["service"]) == ("e1", "standalone")

    # host-only remainder: host token consumed, service null
    r = by_msg["solo"]
    assert r["host"] == "10.0.0.9:514"  # address fallback
    assert r["service"] is None and r["instance"] is None


def test_parse_syslog_year_default_is_current(spark):
    from datetime import datetime
    from zoneinfo import ZoneInfo

    from miru_spark.siphon import parse_syslog

    tz = ZoneInfo(spark.conf.get("spark.sql.session.timeZone"))
    out = parse_syslog(
        _syslog_df(spark).limit(1), line_col="value"
    ).collect()
    got = datetime.fromtimestamp(int(out[0]["timestamp"]) / 1000, tz)
    assert got.year == datetime.now(tz).year


def test_syslog_to_stumptown_engine(spark, tmp_path):
    """The full miru-syslog pipeline: raw lines -> parse_syslog ->
    log_documents -> index -> stumptown page, like the deployable's
    listener pumping MiruLogEvents at the stumptown intake."""
    from miru_spark.siphon import parse_syslog

    lines = [
        (
            f"Nov 17 23:{23 + i // 60:02d}:{i % 60:02d} "
            f"h{i % 3} svc{i % 2}[{100 + i}]: "
            f"{'request failed' if i % 4 == 3 else 'request ok'} b{i}",
            "10.0.0.1:514",
        )
        for i in range(40)
    ]
    df = spark.createDataFrame(lines, "value string, addr string")
    docs = log_documents(
        parse_syslog(df, line_col="value", addr_col="addr", year=2016)
    )
    d = str(tmp_path / "syslog_idx")
    build_index(
        spark, docs, d,
        partition_seconds=3600, block_span=64,
        extra_fields=LOG_FIELDS,
    )
    eng = SearchEngine(spark, d)
    try:
        assert eng.count("request") == 40
        n_fail = sum(1 for i in range(40) if i % 4 == 3)
        assert eng.count("failed") == n_fail
        assert eng.count("failed AND service:svc1") == sum(
            1 for i in range(40) if i % 4 == 3 and i % 2 == 1
        )
        sp = eng.stumptown("failed", bucket_seconds=3600, k=3)
        assert sum(c for _, c in sp["waveform"]) == n_fail
        assert len(sp["results"]) == 3
    finally:
        eng.close()


# ---------------------------------------------------------------------------
# anomaly metric intake (SampleTrawl mill -> bits field -> metricingSum)
# ---------------------------------------------------------------------------

def _metric(i: int) -> dict:
    vals = [5, -6, 0, 123456789, -987654321, 7, 63, -1]
    return {
        "datacenter": "dc1",
        "cluster": None,  # -> unknown
        "host": f"h{i % 3}",
        "service": f"svc{i % 2}",
        "instance": str(i % 4),
        "version": "1.0",
        "tenant": "acme",
        "sampler": "jvm",
        "path": ["jvm", "heap", "used"] if i % 2 else ["gc", "", "count"],
        "type": "gauge",
        "value": vals[i % len(vals)],
        "timestamp": str(T0 + (i // 10) * 3600_000 + (i % 10) * 1000),
    }


N_METRICS = 40


@pytest.fixture(scope="module")
def metric_rows(spark):
    import json as _json

    from miru_spark.siphon import parse_metrics

    raw = spark.createDataFrame(
        [(_json.dumps(_metric(i)),) for i in range(N_METRICS)],
        "value string",
    )
    return parse_metrics(raw)


def test_anomaly_documents_bit_slicing(spark, metric_rows):
    from miru_spark.siphon import anomaly_documents

    docs = anomaly_documents(metric_rows).collect()
    assert len(docs) == N_METRICS
    by_val = {}
    for d in docs:
        by_val.setdefault(d["metric_value"], d)

    def want_bits(v):
        sign = "+" if v >= 0 else "-"
        mag = (1 << 63) - 1 if v == -(1 << 63) else abs(v)
        return [sign] + [str(i) for i in range(63) if (mag >> i) & 1]

    for v in (5, -6, 0, 123456789, -987654321, 63, -1):
        assert list(dict(by_val[v]["fields"])["bits"]) == want_bits(v), v
    # sanitize drops the empty path element; metric joins with '>'
    gc = [d for d in docs if d["metric_value"] == 5][0]
    f = dict(gc["fields"])
    assert list(f["tags"]) == ["gc", "count"]
    assert f["metric"] == ["gc>>count"]
    assert f["cluster"] == ["unknown"]
    assert gc["text"] == "gc  count"


def test_trawled_counts(spark, metric_rows):
    from miru_spark.siphon import trawled_counts

    got = {
        (r["host"], r["service"], r["instance"]): r["ingressed"]
        for r in trawled_counts(metric_rows).collect()
    }
    want: Counter = Counter()
    for i in range(N_METRICS):
        m = _metric(i)
        want[(m["host"], m["service"], m["instance"])] += 1
    assert got == dict(want)


def test_anomaly_sum_reconstructs_per_bucket(spark, metric_rows, tmp_path):
    """metricingSum parity: per-hour sums reconstructed from the bits
    field equal the brute-force sums of the raw values, overall and
    under a dimension filter."""
    from miru_spark.siphon import (
        ANOMALY_FIELDS,
        anomaly_documents,
        anomaly_sum,
    )

    d = str(tmp_path / "anomaly_idx")
    build_index(
        spark, anomaly_documents(metric_rows), d,
        partition_seconds=3600, block_span=64,
        extra_fields=ANOMALY_FIELDS,
    )
    eng = SearchEngine(spark, d)
    try:
        got = dict(anomaly_sum(eng, bucket_seconds=3600))
        want: Counter = Counter()
        for i in range(N_METRICS):
            m = _metric(i)
            bucket = (int(m["timestamp"]) * 1000 // 3600_000_000) \
                * 3600_000_000
            want[bucket] += m["value"]
        assert got == {k: v for k, v in want.items()}

        # filtered: only svc1's metrics
        got1 = dict(anomaly_sum(eng, query="service:svc1",
                                bucket_seconds=3600))
        want1: Counter = Counter()
        for i in range(N_METRICS):
            m = _metric(i)
            if m["service"] != "svc1":
                continue
            bucket = (int(m["timestamp"]) * 1000 // 3600_000_000) \
                * 3600_000_000
            want1[bucket] += m["value"]
        assert got1 == {k: v for k, v in want1.items()}

        # constraints path: same filter via the constraints tree
        got2 = dict(
            anomaly_sum(eng, constraints="service:svc1",
                        bucket_seconds=3600)
        )
        assert got2 == got1
    finally:
        eng.close()
