"""Authz + constraint masks wired into the real SearchEngine.

The reference's fulltext question ANDs the parsed query with the request's
MiruFilter constraints and the composite authz bitmap per partition
(miru-stream-plugins/.../fulltext/FullTextCustomQuestion.java:91-107;
MiruAuthzUtils.getCompositeAuthz:24-33 ORs one bitmap per granted label;
labels are indexed per value off MiruActivity.authz,
miru-api/.../activity/MiruActivity.java:38).

Rank identity: engine (both serving-node and distributed kernel paths)
vs the pure-Python oracle, with and without grants/constraints.
"""

import math

import pytest

from miru_spark.index.build import build_index
from miru_spark.oracle import OracleIndex
from miru_spark.query.engine import SearchEngine
from miru_spark.webtext import generate_rows

N_DOCS = 400
PARTITION_SECONDS = 600
BLOCK_SPAN = 64

GRANT_QUERIES = [
    ("w000001 AND w000004", ["g1"]),
    ("w000001 OR w000009", ["g0", "g2"]),
    ("w000002 AND w000007 AND w000011", ["g0", "g1", "g2", "g3"]),
    ("w00004*", ["g3"]),
    ("w000001 AND NOT w000002", ["g2"]),
]


def _labels(i: int) -> list[str]:
    # deterministic per-doc grant labels; ~25% of docs per g-label plus a
    # second h-label so multi-label docs exercise the per-value postings
    return [f"g{i % 4}", f"h{i % 3}"]


@pytest.fixture(scope="module")
def corpus():
    rows = generate_rows(range(N_DOCS))
    for i, r in enumerate(rows):
        r["authz"] = _labels(i)
    return rows


@pytest.fixture(scope="module")
def oracle(corpus):
    return OracleIndex(corpus, partition_seconds=PARTITION_SECONDS)


@pytest.fixture(scope="module")
def engine(spark, corpus, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("authz_idx"))
    from pyspark.sql import functions as F

    wt = spark.createDataFrame(
        [
            (r["url"], r["warc_us"], r["html"], r["text"], r["lang"],
             r["authz"])
            for r in corpus
        ],
        "url string, warc_us long, html binary, text string, lang string, "
        "authz array<string>",
    ).select(
        "url",
        F.timestamp_micros("warc_us").alias("warc_ts"),
        "html", "text", "lang", "authz",
    )
    build_index(
        spark, wt, index_dir,
        partition_seconds=PARTITION_SECONDS, block_span=BLOCK_SPAN,
    )
    return SearchEngine(spark, index_dir)


def _assert_rank_identical(got, want):
    assert [(p, d) for p, d, _s, _u in got] == [
        (p, d) for p, d, _s, _u in want
    ]
    for (_p, _d, s_got, _u), (_p2, _d2, s_want, _u2) in zip(got, want):
        assert math.isclose(s_got, s_want, rel_tol=0, abs_tol=1e-9)


@pytest.mark.parametrize("query,grants", GRANT_QUERIES)
def test_authz_rank_identity_local(engine, oracle, query, grants):
    got = engine.search_collect(query, k=10, authz=grants)
    want = oracle.search(query, k=10, authz=grants)
    assert got, f"empty result undercuts the test: {query} {grants}"
    _assert_rank_identical(got, want)


@pytest.mark.parametrize("query,grants", GRANT_QUERIES[:2])
def test_authz_rank_identity_kernel(engine, oracle, query, grants):
    rows = engine.search(
        query, k=10, local=False, authz=grants
    ).collect()
    got = [(r["pid"], r["doc_id"], r["score"], r["url"]) for r in rows]
    want = oracle.search(query, k=10, authz=grants)
    _assert_rank_identical(got, want)


def test_full_grant_set_equals_no_authz(engine, oracle):
    q = "w000001 OR w000009"
    every = ["g0", "g1", "g2", "g3"]
    got = engine.search_collect(q, k=10, authz=every)
    want = engine.search_collect(q, k=10)
    _assert_rank_identical(got, want)
    # and scores are untouched by the mask (authz terms never score)
    _assert_rank_identical(got, oracle.search(q, k=10))


def test_empty_grant_set_denies_all(engine):
    assert engine.search_collect("w000001", k=10, authz=[]) == []


def test_ungranted_label_matches_nothing(engine, oracle):
    got = engine.search_collect("w000001", k=10, authz=["nosuch"])
    assert got == oracle.search("w000001", k=10, authz=["nosuch"]) == []


def test_constraints_filter(engine, oracle):
    q = "w000001 OR w000004"
    c = "doclen:[16 TO 160] AND lang:en"
    got = engine.search_collect(q, k=10, constraints=c)
    want = oracle.search(q, k=10, constraints=c)
    assert got, "constraint filtered everything; weaken the test bounds"
    _assert_rank_identical(got, want)
    # scores equal the unconstrained run's scores for surviving docs:
    # constraints mask, never score
    base = {
        (p, d): s for p, d, s, _u in engine.search_collect(q, k=400)
    }
    for p, d, s, _u in got:
        assert math.isclose(s, base[(p, d)], rel_tol=0, abs_tol=1e-9)


def test_constraints_and_authz_compose(engine, oracle):
    q = "w000001 OR w000002 OR w000004"
    c = "doclen:[16 TO 300]"
    grants = ["g1", "h0"]
    got = engine.search_collect(q, k=10, constraints=c, authz=grants)
    want = oracle.search(q, k=10, constraints=c, authz=grants)
    assert got
    _assert_rank_identical(got, want)


def test_newest_with_authz(engine, oracle):
    got = engine.newest(k=8, query="w000001", authz=["g2"]).collect()
    want = oracle.newest(k=8, query="w000001", authz=["g2"])
    assert [(r["pid"], r["doc_id"]) for r in got] == [
        (p, d) for p, d, _u in want
    ]


def test_authz_only_newest(engine, oracle):
    # query=None + authz: match-all gated by the grant mask
    got = engine.newest(k=8, authz=["g3"]).collect()
    want = oracle.newest(k=8, authz=["g3"])
    assert [(r["pid"], r["doc_id"]) for r in got] == [
        (p, d) for p, d, _u in want
    ]


def test_search_many_with_authz(engine, oracle):
    qs = [q for q, _g in GRANT_QUERIES[:3]]
    res = engine.search_many(qs, k=10, authz=["g0", "g1"])
    for q in qs:
        _assert_rank_identical(
            res[q], oracle.search(q, k=10, authz=["g0", "g1"])
        )


# -- non-Latin locale e2e (new r3 locales through the WHOLE path:
#    Arrow indexing, parquet round-trip, posting fetch, both kernels) ------

def test_nonlatin_locale_e2e(spark, tmp_path):
    import itertools

    from miru_spark.index.build import build_index
    from miru_spark.oracle import OracleIndex
    from miru_spark.query.engine import SearchEngine
    from pyspark.sql import functions as F

    base = 1704067200_000_000
    texts = {
        "tr": "ve bir kitap okudum kitap güzel ama uzun",
        "gr": "ο σκύλος και η γάτα και ο σκύλος τρέχει",
        "ar": "هذا كتاب جديد من المكتبة الكبيرة كتاب",
        "bg": "и книгата е на масата книгата е добра",
        "hi": "यह एक नई किताब है किताब अच्छी है",
    }
    rows = []
    for i, (lang, t) in enumerate(
        itertools.islice(itertools.cycle(texts.items()), 60)
    ):
        rows.append({
            "url": f"https://x{i}.example/{lang}/{i}",
            "warc_us": base + i * 7_000_000,
            "text": t + f" w{i % 7:06d}",
            "lang": lang,
        })
    wt = spark.createDataFrame(
        [(r["url"], r["warc_us"], None, r["text"], r["lang"])
         for r in rows],
        "url string, warc_us long, html binary, text string, lang string",
    ).select("url", F.timestamp_micros("warc_us").alias("warc_ts"),
             "html", "text", "lang")
    idx = str(tmp_path / "nl_idx")
    build_index(spark, wt, idx, partition_seconds=600, block_span=16)
    eng = SearchEngine(spark, idx)
    oi = OracleIndex(rows, partition_seconds=600)
    for q, loc in [
        ("kitap", "tr"), ("σκύλος AND γάτα", "gr"), ("كتاب", "ar"),
        ("книгата", "bg"), ("किताब", "hi"), ("kitap OR كتاب", "tr"),
    ]:
        got = eng.search_collect(q, k=10, locale=loc)
        want = oi.search(q, k=10, locale=loc)
        assert got and [(p, d) for p, d, _s, _u in got] == [
            (p, d) for p, d, _s, _u in want
        ], (q, got, want)
        for g, w in zip(got, want):
            assert abs(g[2] - w[2]) < 1e-9
    # stopwords of the new locales never match (filtered at parse time)
    import pytest as _pytest
    from miru_spark.queryparse import QueryParseError
    with _pytest.raises(QueryParseError):
        eng.search_collect("ve ama", k=5, locale="tr")  # stopword-only
    eng.close()


# -- fuzz: random query trees x random grant sets x random constraints -----
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_TERMS = [f"w{i:06d}" for i in (0, 1, 2, 3, 4, 5, 7, 9, 11, 33, 100)] + [
    "w00004*"
]
_leaf = st.sampled_from(_TERMS)
_query_st = st.recursive(
    _leaf,
    lambda ch: st.one_of(
        st.tuples(ch, ch).map(lambda ab: f"({ab[0]} AND {ab[1]})"),
        st.tuples(ch, ch).map(lambda ab: f"({ab[0]} OR {ab[1]})"),
        st.tuples(ch, ch).map(lambda ab: f"({ab[0]} AND NOT {ab[1]})"),
    ),
    max_leaves=4,
)
_grants_st = st.sets(
    st.sampled_from(["g0", "g1", "g2", "g3", "h0", "h1", "h2", "nosuch"]),
    min_size=1,
    max_size=4,
)
_constraint_st = st.sampled_from(
    [None, "doclen:[16 TO 200]", "lang:en", "doclen:[16 TO 400] AND lang:e*"]
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(query=_query_st, grants=_grants_st, constraint=_constraint_st)
def test_authz_constraints_fuzz(engine, oracle, query, grants, constraint):
    """Every (query tree, grant set, constraint) combination stays rank-
    and score-identical to the oracle -- the access mask composes with
    arbitrary boolean trees without touching scoring."""
    g = sorted(grants)
    got = engine.search_collect(query, k=10, authz=g, constraints=constraint)
    want = oracle.search(query, k=10, authz=g, constraints=constraint)
    _assert_rank_identical(got, want)
