"""Wire adapter: the reference's saved JSON request bodies answer
identically to the native engine calls they map to.

Shapes under test (all `public final` JSON POJOs in the reference):
MiruFilter/MiruFieldFilter/MiruValue (miru-api/.../query/filter/*.java),
MiruTimeRange, MiruAuthzExpression, FullTextQuery, AnalyticsQuery,
DistinctsQuery, UniquesQuery, TrendingQuery, DistinctCountQuery,
AggregateCountsQuery, MetricsQuery, StumptownQuery, AnomalyQuery,
RecoQuery, StrutQuery. Filter-tree unit tests pin the evaluator parity
points of MiruAggregateUtil.filterInOut (abortIfEmpty, inclusiveFilter,
pButNotQ shape, unsupported-operation rejection)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest
from pyspark.sql import functions as F

from miru_spark import wire
from miru_spark.fields import FIELD_SEP, encode_num
from miru_spark.index.build import build_index
from miru_spark.query.engine import SearchEngine

EPOCH = 1704067200_000_000
N = 160


def T(field, value):
    return ("term", f"{field}{FIELD_SEP}{value}")


# ---------------------------------------------------------------------------
# filter_tree unit tests (MiruAggregateUtil.filterInOut parity)
# ---------------------------------------------------------------------------

def test_no_filter_is_none():
    # MiruFilter.NO_FILTER = (or, false, null, null)
    assert wire.filter_tree(None) is None
    assert wire.filter_tree({"operation": "or"}) is None
    assert wire.filter_tree(
        {"operation": "or", "inclusiveFilter": False,
         "fieldFilters": None, "subFilters": None}
    ) is None
    # an `and` with nothing in it is NOT the NO_FILTER sentinel
    assert wire.filter_tree({"operation": "and"}) == ("none",)


def test_field_filter_values_or_together():
    f = {"operation": "and", "fieldFilters": [
        {"fieldName": "lang", "values": [{"parts": ["en"]}, "de"]},
    ]}
    assert wire.filter_tree(f) == ("or", [T("lang", "en"), T("lang", "de")])
    # single value collapses to the bare term
    f1 = {"operation": "and", "fieldFilters": [
        {"fieldName": "lang", "values": ["EN"]},
    ]}
    assert wire.filter_tree(f1) == T("lang", "en")


def test_inclusive_filter_prepends_index_mask():
    f = {"operation": "and", "inclusiveFilter": True, "fieldFilters": [
        {"fieldName": "lang", "values": ["en"]},
    ]}
    assert wire.filter_tree(f) == ("and", [("all",), T("lang", "en")])


def test_abort_if_empty_under_and():
    # an `and` whose field filter matched no terms is implicitly empty
    # (MiruAggregateUtil.java:1143,1177); under `or` it's just skipped
    f = {"operation": "and", "fieldFilters": [
        {"fieldName": "lang", "values": []},
        {"fieldName": "item", "values": ["3"]},
    ]}
    assert wire.filter_tree(f) == ("none",)
    f2 = {"operation": "or", "fieldFilters": [
        {"fieldName": "lang", "values": []},
        {"fieldName": "item", "values": ["3"]},
    ]}
    assert wire.filter_tree(f2) == T("item", "3")


def test_p_but_not_q_shape():
    f = {"operation": "pButNotQ", "fieldFilters": [
        {"fieldName": "item", "values": ["1"]},
        {"fieldName": "lang", "values": ["de"]},
        {"fieldName": "lang", "values": ["fr"]},
    ]}
    # andNotTx(first, rest) = first AND NOT (OR rest)
    assert wire.filter_tree(f) == (
        "not", T("item", "1"),
        ("or", [T("lang", "de"), T("lang", "fr")]),
    )


def test_wildcard_value_becomes_prefix():
    f = {"operation": "and", "fieldFilters": [
        {"fieldName": "topic", "values": [{"parts": ["sp", "*"]}]},
    ]}
    assert wire.filter_tree(f) == ("prefix", f"topic{FIELD_SEP}sp")


def test_numeric_field_value_is_order_encoded():
    f = {"operation": "and", "fieldFilters": [
        {"fieldName": "site", "values": ["5"]},
    ]}
    assert wire.filter_tree(f) == T("site", encode_num(5))


def test_unsupported_operation_rejected():
    # executeFilter: "nand isn't currently supported."
    for op in ("nand", "nor", "xor", "xnor", "ifThen", "thenif",
               "notPButQ"):
        with pytest.raises(wire.WireError):
            wire.filter_tree({"operation": op, "fieldFilters": [
                {"fieldName": "lang", "values": ["en"]},
            ]})


def test_non_primary_field_type_rejected():
    with pytest.raises(wire.WireError):
        wire.filter_tree({"operation": "and", "fieldFilters": [
            {"fieldName": "lang", "fieldType": "latest",
             "values": ["en"]},
        ]})


def test_sub_filters_recurse():
    f = {"operation": "or", "subFilters": [
        {"operation": "and", "fieldFilters": [
            {"fieldName": "lang", "values": ["en"]},
            {"fieldName": "item", "values": ["1"]},
        ]},
        {"operation": "and", "fieldFilters": [
            {"fieldName": "lang", "values": ["de"]},
        ]},
    ]}
    assert wire.filter_tree(f) == ("or", [
        ("and", [T("lang", "en"), T("item", "1")]),
        T("lang", "de"),
    ])


def test_time_range_and_authz():
    assert wire.time_range_us(None) is None
    assert wire.time_range_us(
        {"smallestTimestamp": 0, "largestTimestamp": (1 << 63) - 1}
    ) is None  # ALL_TIME
    assert wire.time_range_us(
        {"smallestTimestamp": 10, "largestTimestamp": 20}
    ) == (10, 20)
    assert wire.authz_labels(None) is None
    assert wire.authz_labels({"values": None}) is None  # NOT_PROVIDED
    assert wire.authz_labels({"values": ["a", "b"]}) == ["a", "b"]
    assert wire.authz_labels({"values": []}) == []  # deny-all stays


# ---------------------------------------------------------------------------
# request dispatch == native engine calls, over one built index
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def wx_engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("wire_idx"))
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


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_fulltext_request(wx_engine):
    req = json.loads(json.dumps({
        "tenantId": "t1",
        "actorId": {"bytes": "a"},
        "authzExpression": {"values": None},
        "query": {
            "timeRange": {"smallestTimestamp": 0,
                          "largestTimestamp": (1 << 63) - 1},
            "defaultField": "text",
            "locale": "en",
            "useStopWords": True,
            "query": "the quick brown",
            "maxDeterminizedStates": 10000,
            "constraintsFilter": {"operation": "or"},
            "strategy": "TF_IDF",
            "desiredNumberOfResults": 7,
            "gatherTermsForFields": None,
        },
        "logLevel": "NONE",
    }))
    got = wire.execute(wx_engine, "fulltext", req)
    want = wx_engine.search("the quick brown", k=7, locale="en")
    assert _rows(got) == _rows(want)


def test_fulltext_constrained_and_authz(wx_engine):
    req = {
        "authzExpression": {"values": ["acl_a"]},
        "query": {
            "timeRange": None,
            "defaultField": "text",
            "locale": "en",
            "useStopWords": True,
            "query": "merge OR join",
            "constraintsFilter": {
                "operation": "and",
                "fieldFilters": [
                    {"fieldName": "lang", "values": ["en"]},
                ],
            },
            "strategy": "TF_IDF",
            "desiredNumberOfResults": 9,
        },
    }
    got = wire.execute(wx_engine, "fulltext", req)
    want = wx_engine.search(
        "merge OR join", k=9, locale="en",
        constraints=T("lang", "en"), authz=["acl_a"],
    )
    assert _rows(got) == _rows(want)
    assert len(_rows(got)) > 0


def test_fulltext_time_strategy(wx_engine):
    req = {"query": {
        "timeRange": None, "defaultField": "text", "locale": None,
        "useStopWords": False, "query": "merge",
        "constraintsFilter": None, "strategy": "TIME",
        "desiredNumberOfResults": 5,
    }}
    got = wire.execute(wx_engine, "fulltext", req)
    want = wx_engine.newest(k=5, query="merge")
    assert _rows(got) == _rows(want)


def test_analytics_request(wx_engine):
    rng = {"smallestTimestamp": EPOCH,
           "largestTimestamp": EPOCH + N * 1_000_000}
    req = {"query": {
        "scoreSets": [
            {"key": "s1", "timeRange": rng,
             "divideTimeRangeIntoNSegments": 8},
        ],
        "constraintsFilter": {"operation": "and", "fieldFilters": [
            {"fieldName": "lang", "values": ["en", "de"]},
        ]},
        "analyticsFilters": {
            "evens": {"operation": "and", "fieldFilters": [
                {"fieldName": "lang", "values": ["en"]},
            ]},
            "all": {"operation": "or"},
        },
    }}
    got = wire.execute(wx_engine, "analytics", req)
    want = wx_engine.waveform_many(
        {"evens": T("lang", "en"), "all": None},
        constraints=("or", [T("lang", "en"), T("lang", "de")]),
        time_range_us=(EPOCH, EPOCH + N * 1_000_000),
        segments=8,
    )
    assert got == {"s1": want}
    assert sum(c for _, c in got["s1"]["evens"]) == N // 2


def test_distincts_and_uniques_requests(wx_engine):
    req = {"query": {
        "timeRange": None,
        "gatherDistinctsForField": "item",
        "gatherDistinctParts": None,
        "constraintsFilter": {"operation": "and", "fieldFilters": [
            {"fieldName": "lang", "values": ["en"]},
        ]},
        "prefixes": None,
    }}
    got = wire.execute(wx_engine, "distincts", req)
    want = wx_engine.distincts("item", constraints=T("lang", "en"))
    assert got == want

    ureq = {"query": {
        "timeRange": None,
        "gatherUniquesForField": "item",
        "gatherDistinctParts": None,
        "constraintsFilter": None,
        "prefixes": [{"parts": ["1"]}, {"parts": ["2"]}],
    }}
    ugot = wire.execute(wx_engine, "uniques", ureq)
    assert ugot == wx_engine.uniques("item", prefix=["1", "2"])


def test_trending_request(wx_engine):
    rng = {"smallestTimestamp": EPOCH,
           "largestTimestamp": EPOCH + N * 1_000_000}
    req = {"query": {
        "scoreSets": [{
            "key": "w1",
            "strategies": ["LINEAR_REGRESSION", "LEADER"],
            "timeRange": rng,
            "divideTimeRangeIntoNSegments": 4,
            "desiredNumberOfDistincts": 5,
        }],
        "constraintsFilter": None,
        "aggregateCountAroundField": "item",
        "distinctQueries": [],
    }}
    got = wire.execute(wx_engine, "trending", req)
    seg = dict(time_range_us=(EPOCH, EPOCH + N * 1_000_000), segments=4)
    assert got == {"w1": {
        "LINEAR_REGRESSION": wx_engine.trending(
            "item", strategy="linear_regression", top_n=5, **seg),
        "LEADER": wx_engine.trending(
            "item", strategy="leader", top_n=5, **seg),
    }}


def test_distinct_count_requests(wx_engine):
    req = {"query": {
        "streamId": None,
        "suppressUnreadFilter": None,
        "timeRange": None,
        "streamFilter": {"operation": "and", "fieldFilters": [
            {"fieldName": "stream", "values": ["2"]},
        ]},
        "constraintsFilter": None,
        "aggregateCountAroundField": "item",
        "desiredNumberOfDistincts": 100,
        "unreadOnly": False,
    }}
    got = wire.execute(wx_engine, "count", req)
    assert got == wx_engine.uniques("item", constraints=T("stream", "2"))

    # inbox-scoped: same stream via streamId
    ireq = {"query": {
        "streamId": {"bytes": "2"},
        "timeRange": None,
        "streamFilter": None,
        "constraintsFilter": None,
        "aggregateCountAroundField": "item",
        "desiredNumberOfDistincts": 100,
        "unreadOnly": False,
    }}
    igot = wire.execute(wx_engine, "count", ireq)
    assert igot == got  # same stream's distinct item count


def test_aggregate_counts_request(wx_engine):
    req = {"query": {
        "streamId": None,
        "collectTimeRange": None,
        "answerTimeRange": None,
        "countTimeRange": None,
        "streamFilter": None,
        "constraints": {
            "c1": {
                "constraintsFilter": {"operation": "and",
                                      "fieldFilters": [
                                          {"fieldName": "lang",
                                           "values": ["de"]}]},
                "aggregateCountAroundField": "item",
                "startFromDistinctN": 0,
                "desiredNumberOfDistincts": 4,
                "gatherTermsForFields": None,
            },
        },
        "includeUnreadState": False,
        "unreadOnly": False,
    }}
    got = wire.execute(wx_engine, "aggregate-counts", req)
    want = wx_engine.aggregate_counts(
        "item", count=4, constraints=T("lang", "de"))
    assert got == {"c1": want}

    # inbox flavor: page matches engine.inbox
    ireq = {"query": {
        "streamId": "1",
        "streamFilter": None,
        "constraints": {
            "c1": {
                "constraintsFilter": None,
                "aggregateCountAroundField": "item",
                "startFromDistinctN": 0,
                "desiredNumberOfDistincts": 6,
            },
        },
        "unreadOnly": False,
    }}
    igot = wire.execute(wx_engine, "aggregate-counts", ireq)
    iwant = wx_engine.inbox("1", item_field="item", count=6)
    assert igot == {"c1": iwant}


def test_reco_request(wx_engine):
    req = {"query": {
        "timeRange": None,
        "removeDistinctsQuery": None,
        "constraintsFilter": {"operation": "and", "fieldFilters": [
            {"fieldName": "user", "values": ["u1"]},
        ]},
        "aggregateFieldName1": "parent",
        "aggregateFieldName2": "user",
        "aggregateFieldName3": "parent",
        "scorableFilter": {"operation": "or"},
        "desiredNumberOfDistincts": 6,
    }}
    got = wire.execute(wx_engine, "reco", req)
    want = wx_engine.reco(("user", "u1"), "parent", "user", "parent",
                          k=6)
    assert got == want
    assert len(got) > 0

    # a wide constraintsFilter cannot be a reco seed
    bad = {"query": dict(req["query"],
                         constraintsFilter={"operation": "or"})}
    with pytest.raises(wire.WireError):
        wire.execute(wx_engine, "reco", bad)


def test_strut_request(wx_engine):
    req = {"query": {
        "catwalkDefinition": {
            "catwalkId": "cw1",
            "gatherField": "parent",
            "scorableField": "parent",
            "features": [
                {"name": "f0", "featureFields": ["user"],
                 "featureFilter": None},
                {"name": "f1", "featureFields": ["item", "lang"],
                 "featureFilter": None},
            ],
            "featureStrategy": "UNIT_WEIGHTED",
            "scorableFilter": {"operation": "or"},
            "numeratorCount": 1,
        },
        "modelScalars": [],
        "timeRange": None,
        "constraintFilter": {"operation": "and", "fieldFilters": [
            {"fieldName": "lang", "values": ["en"]},
        ]},
        "numeratorStrategy": "UNIT_WEIGHTED",
        "numeratorScalars": [1.0, 0.5],
        "desiredNumberOfResults": 5,
        "includeFeatures": False,
    }}
    got = wire.execute(wx_engine, "strut", req)
    want = wx_engine.strut(
        "parent",
        [(1.0, ("user",)), (0.5, ("item", "lang"))],
        strategy="unit_weighted",
        k=5,
        constraints=T("lang", "en"),
    )
    assert got == want
    assert len(got) > 0


def test_stumptown_request(wx_engine):
    rng = {"smallestTimestamp": EPOCH,
           "largestTimestamp": EPOCH + N * 1_000_000}
    req = {"query": {
        "timeRange": rng,
        "divideTimeRangeIntoNSegments": 4,
        "desiredNumberOfResultsPerWaveform": 3,
        "constraintsFilter": None,
        "stumptownFilters": {
            "de": {"operation": "and", "fieldFilters": [
                {"fieldName": "lang", "values": ["de"]},
            ]},
        },
    }}
    got = wire.execute(wx_engine, "stumptown", req)
    want = wx_engine.stumptown(
        T("lang", "de"), k=3,
        time_range_us=(EPOCH, EPOCH + N * 1_000_000), segments=4,
    )
    assert got == {"de": want}
    assert sum(c for _, c in got["de"]["waveform"]) == N // 2


def test_unknown_kind_rejected(wx_engine):
    with pytest.raises(wire.WireError):
        wire.execute(wx_engine, "nope", {"query": {}})


# ---------------------------------------------------------------------------
# metrics / anomaly requests (bit-sliced powerBits index)
# ---------------------------------------------------------------------------

T0_MS = 1704067200_000


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


N_METRICS = 32


@pytest.fixture(scope="module")
def wx_anomaly(spark, tmp_path_factory):
    from miru_spark.siphon import (
        ANOMALY_FIELDS,
        anomaly_documents,
        parse_metrics,
    )

    d = str(tmp_path_factory.mktemp("wire_anomaly_idx"))
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


def test_metrics_request(wx_anomaly):
    from miru_spark.siphon import anomaly_sum

    lo, hi = T0_MS * 1000, (T0_MS + 4 * 3600_000) * 1000
    req = {"query": {
        "timeRange": {"smallestTimestamp": lo, "largestTimestamp": hi},
        "divideTimeRangeIntoNSegments": 4,
        "powerBitsFieldName": "bits",
        "constraintsFilter": None,
        "filters": {
            "svc1": {"operation": "and", "fieldFilters": [
                {"fieldName": "service", "values": ["svc1"]},
            ]},
        },
    }}
    got = wire.execute(wx_anomaly, "metrics", req)
    want = anomaly_sum(
        wx_anomaly, query=T("service", "svc1"),
        time_range_us=(lo, hi), segments=4,
    )
    assert got == {"svc1": want}
    # and the sums reconstruct the raw values
    total = sum(v for _, v in got["svc1"])
    assert total == sum(
        _metric(i)["value"] for i in range(N_METRICS)
        if _metric(i)["service"] == "svc1"
    )


def test_anomaly_request_with_expansion(wx_anomaly):
    from miru_spark.siphon import anomaly_sum

    lo, hi = T0_MS * 1000, (T0_MS + 4 * 3600_000) * 1000
    req = {"query": {
        "timeRange": {"smallestTimestamp": lo, "largestTimestamp": hi},
        "divideTimeRangeIntoNSegments": 4,
        "powerBitsFieldName": "bits",
        "constraintsFilter": None,
        "filters": {
            "all": {"operation": "or"},
        },
        "expansionField": "service",
        "expansionValues": ["svc0", "svc1"],
    }}
    got = wire.execute(wx_anomaly, "anomaly", req)
    assert set(got) == {"all\x1fsvc0", "all\x1fsvc1"}
    for svc in ("svc0", "svc1"):
        want = anomaly_sum(
            wx_anomaly, query=T("service", svc),
            time_range_us=(lo, hi), segments=4,
        )
        assert got[f"all\x1f{svc}"] == want


def test_use_stopwords_false_keeps_locale_chain(wx_engine):
    """findAnalyzer(locale, useStopWords=false) = same locale analyzer
    minus the stop list (TermAnalyzers.java:117-133): under `en`,
    "the" alone is Nothing-to-filter with stopwords on, but a real
    scoring term with them off -- while stemming stays on either way."""
    from miru_spark.queryparse import QueryParseError, parse_query

    with pytest.raises(QueryParseError):
        parse_query("the", "en")
    assert parse_query("the", "en", use_stopwords=False) == \
        ("term", "the")
    # stemming still applies without stopwords
    assert parse_query("merges", "en", use_stopwords=False) == \
        parse_query("merges", "en")

    req = {"query": {
        "timeRange": None, "defaultField": "text", "locale": "en",
        "useStopWords": False, "query": "the AND merge",
        "constraintsFilter": None, "strategy": "TF_IDF",
        "desiredNumberOfResults": 6,
    }}
    got = wire.execute(wx_engine, "fulltext", req)
    want = wx_engine.search("the AND merge", k=6, locale="en",
                            use_stopwords=False)
    assert _rows(got) == _rows(want)
    assert len(_rows(got)) > 0
    # with stopwords on, "the" drops and the same query means just
    # "merge" -- different result set shape proves the flag threads
    on = wx_engine.search("the AND merge", k=6, locale="en")
    assert _rows(on) == _rows(wx_engine.search("merge", k=6, locale="en"))


def test_fulltext_max_wildcard_expansion_threads(wx_engine):
    """maxDeterminizedStates (the JSON name FullTextQuery binds to
    maxWildcardExpansion, FullTextQuery.java:30-36) caps the query's
    prefix expansion; <=0/absent keeps the engine default."""
    full = wx_engine.expand_prefix("t")
    assert len(full) > 1
    req = {"query": {
        "timeRange": None, "defaultField": "text", "locale": "en",
        "useStopWords": True, "query": "t*",
        "maxDeterminizedStates": 1,
        "constraintsFilter": None, "strategy": "TF_IDF",
        "desiredNumberOfResults": 8,
    }}
    got = wire.execute(wx_engine, "fulltext", req)
    want = wx_engine.search("t*", k=8, locale="en", max_expand=1)
    assert _rows(got) == _rows(want)
    # the capped query is exactly its first expansion term
    assert _rows(got) == _rows(
        wx_engine.search(full[0], k=8, locale="en")
    )
    req["query"]["maxDeterminizedStates"] = 0
    dflt = wire.execute(wx_engine, "fulltext", req)
    assert _rows(dflt) == _rows(wx_engine.search("t*", k=8, locale="en"))
