"""Positional phrase queries (a capability BEYOND the reference).

The reference rejects PhraseQuery outright ("Unsupported query type",
LuceneBackedQueryParser.java:108-110) because its index stores no term
positions. This engine keeps that behavior by default (tests below pin
it) and adds an opt-in positional index (`build_index(positions=True)`)
that answers quoted multi-term phrases with Lucene PhraseQuery (slop 0)
semantics: stopword gaps preserved via position increments, members
score like ordinary positive terms (phrase = AND + adjacency filter).

Ground truth: OracleIndex with per-term token positions (brute force).
Both the serving-node and the distributed kernel paths must be
rank-identical with equal scores.
"""

import math

import numpy as np
import pytest

from miru_spark.analyzer import analyze_positions
from miru_spark.codec import (
    decode_grouped_deltas,
    encode_varint,
)
from miru_spark.index.build import build_index
from miru_spark.oracle import OracleIndex
from miru_spark.query.engine import SearchEngine
from miru_spark.queryparse import (
    QueryParseError,
    collect_phrases,
    collect_terms,
    parse_query,
)
from miru_spark.webtext import generate_rows

N_DOCS = 400
PARTITION_SECONDS = 600
BLOCK_SPAN = 64


# -- unit: analyzer positions -----------------------------------------------

def test_analyze_positions_stopword_gaps():
    toks, pos = analyze_positions("kick the ball", "en")
    assert toks == ["kick", "ball"]
    assert pos == [0, 2]  # "the" leaves a position gap


def test_analyze_positions_stemming_and_no_locale():
    toks, pos = analyze_positions("running the races", "en")
    # porter-stemmed forms at stop-gapped positions
    assert pos == [0, 2]
    assert toks == [t for t in toks]  # stemmed, non-empty
    toks2, pos2 = analyze_positions("alpha beta gamma", None)
    assert toks2 == ["alpha", "beta", "gamma"]
    assert pos2 == [0, 1, 2]


# -- unit: codec -------------------------------------------------------------

def test_decode_grouped_deltas_roundtrip():
    rng = np.random.default_rng(7)
    groups = [np.sort(rng.choice(5000, size=n, replace=False))
              for n in rng.integers(1, 12, size=50)]
    counts = np.array([len(g) for g in groups], dtype=np.int64)
    gaps = []
    for g in groups:
        d = np.diff(g, prepend=0)
        d[0] = g[0]  # first value absolute
        gaps.append(d)
    blob = encode_varint(np.concatenate(gaps))
    got = decode_grouped_deltas(blob, counts)
    np.testing.assert_array_equal(got, np.concatenate(groups))


# -- unit: parser gate -------------------------------------------------------

def test_phrase_rejected_by_default_like_reference():
    with pytest.raises(QueryParseError, match="Unsupported query type"):
        parse_query('"w000001 w000002"')


def test_phrase_parses_with_positions():
    tree = parse_query('"kick the ball"', "en", allow_phrases=True)
    assert tree[0] == "phrase"
    assert tree[1] == (("kick", 0), ("ball", 2))
    # members are scoring terms; collect_phrases finds the node
    pos_t, _pre, _neg = collect_terms(tree)
    assert pos_t == {"kick", "ball"}
    assert collect_phrases(tree) == [tree]


def test_quoted_single_token_collapses_to_term():
    assert parse_query('"the ball"', "en", allow_phrases=True) == (
        "term", "ball",
    )
    # a fully-stopword phrase drops its clause; alone, that is the
    # reference's "Nothing to filter" (LuceneBackedQueryParser.java:142)
    with pytest.raises(QueryParseError, match="Nothing to filter"):
        parse_query('"the a of"', "en", allow_phrases=True)
    assert parse_query(
        'w000001 AND "the a of"', "en", allow_phrases=True
    ) == ("term", "w000001")


# -- e2e fixtures ------------------------------------------------------------

@pytest.fixture(scope="module")
def corpus():
    return generate_rows(range(N_DOCS))


@pytest.fixture(scope="module")
def oracle(corpus):
    return OracleIndex(corpus, partition_seconds=PARTITION_SECONDS)


def _wt(spark, corpus):
    from pyspark.sql import functions as F

    return spark.createDataFrame(
        [(r["url"], r["warc_us"], r["html"], r["text"], r["lang"])
         for r in corpus],
        "url string, warc_us long, html binary, text string, lang string",
    ).select(
        "url", F.timestamp_micros("warc_us").alias("warc_ts"),
        "html", "text", "lang",
    )


@pytest.fixture(scope="module")
def engine(spark, corpus, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("pos_idx"))
    build_index(
        spark, _wt(spark, corpus), index_dir,
        partition_seconds=PARTITION_SECONDS, block_span=BLOCK_SPAN,
        positions=True,
    )
    return SearchEngine(spark, index_dir)


def _snippets(corpus):
    """Deterministic quoted snippets drawn from real doc token streams
    (so phrases are guaranteed to match) plus miss-or-hit random pairs."""
    out = []
    for di, want_len in ((0, 2), (3, 3), (7, 4)):
        words = corpus[di]["text"].split()
        for start in range(0, len(words) - want_len):
            snip = " ".join(words[start:start + want_len])
            toks, _ = analyze_positions(snip, corpus[di]["lang"])
            if len(toks) >= 2:
                out.append(snip)
                break
    # a snippet that straddles a stopword gap, from any en doc
    for r in corpus:
        if r["lang"] != "en":
            continue
        words = r["text"].split()
        toks_pos = analyze_positions(" ".join(words[:40]), "en")
        for j in range(len(words) - 3):
            tri = " ".join(words[j:j + 3])
            toks, pos = analyze_positions(tri, "en")
            if len(toks) == 2 and pos == [0, 2]:  # w STOP w
                out.append(tri)
                break
        if len(out) == 4:
            break
    assert len(out) >= 3
    return out


def _queries(corpus):
    snips = _snippets(corpus)
    qs = [f'"{s}"' for s in snips]
    qs.append(f'"{snips[0]}" AND w000001')
    qs.append(f'"{snips[0]}" OR w000009')
    qs.append(f'w000001 AND NOT "{snips[1]}"')
    qs.append('"w000000 w000001"')  # random pair: hit or miss, both agree
    return qs


def _assert_rank_identical(got, want):
    assert [(p, d) for p, d, _s, _u in got] == [
        (p, d) for p, d, _s, _u in want
    ]
    for (_p, _d, sg, _u), (_p2, _d2, sw, _u2) in zip(got, want):
        assert math.isclose(sg, sw, rel_tol=0, abs_tol=1e-9)


def test_phrase_rank_identity_local(engine, oracle, corpus):
    any_hit = False
    for q in _queries(corpus):
        want = oracle.search(q, k=10, allow_phrases=True)
        got = engine.search_collect(q, k=10)
        _assert_rank_identical(got, want)
        any_hit = any_hit or bool(want)
    assert any_hit  # corpus-drawn snippets must actually match docs


def test_phrase_rank_identity_distributed(engine, oracle, corpus):
    for q in _queries(corpus)[:4]:
        want = oracle.search(q, k=10, allow_phrases=True)
        got = engine.search_collect(q, k=10, local=False)
        _assert_rank_identical(got, want)


def test_phrase_in_constraints_filter_only(engine, oracle, corpus):
    snip = _snippets(corpus)[0]
    want = oracle.search(
        "w000001", k=10, constraints=f'"{snip}"', allow_phrases=True
    )
    got = engine.search_collect("w000001", k=10, constraints=f'"{snip}"')
    _assert_rank_identical(got, want)
    # distributed too: constraint-phrase members keep tf blobs for the
    # position decode even though they never score
    got_d = engine.search_collect(
        "w000001", k=10, constraints=f'"{snip}"', local=False
    )
    _assert_rank_identical(got_d, want)


def test_phrase_search_many_matches_sequential(engine, corpus):
    qs = _queries(corpus)[:3]
    batched = engine.search_many(qs, k=10)
    for q in qs:
        assert batched[q] == engine.search_collect(q, k=10)


def test_stopword_gap_exactness(spark, tmp_path_factory):
    """'kick the ball' must match kick@i..ball@i+2, never 'kick ball'."""
    base = 1704067200_000_000
    rows = [
        {"url": "u0", "warc_us": base, "html": None,
         "text": "players kick the ball hard", "lang": "en"},
        {"url": "u1", "warc_us": base + 7_000_000, "html": None,
         "text": "players kick ball hard", "lang": "en"},
        {"url": "u2", "warc_us": base + 14_000_000, "html": None,
         "text": "the ball players kick", "lang": "en"},
    ]
    index_dir = str(tmp_path_factory.mktemp("gap_idx"))
    build_index(
        spark, _wt(spark, rows), index_dir,
        partition_seconds=PARTITION_SECONDS, block_span=BLOCK_SPAN,
        positions=True,
    )
    eng = SearchEngine(spark, index_dir)
    got = eng.search_collect('"kick the ball"', k=10, locale="en")
    assert [u for _p, _d, _s, u in got] == ["u0"]
    # 'kick ball' (no gap) matches only the adjacent doc
    got2 = eng.search_collect('"kick ball"', k=10, locale="en")
    assert [u for _p, _d, _s, u in got2] == ["u1"]
    oracle = OracleIndex(rows, partition_seconds=PARTITION_SECONDS)
    _assert_rank_identical(
        got, oracle.search('"kick the ball"', k=10, locale="en",
                           allow_phrases=True),
    )
    # distributed path agrees
    got_d = eng.search_collect('"kick the ball"', k=10, locale="en",
                               local=False)
    assert got_d == got


def test_phrase_requires_positional_index(spark, corpus, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("nopos_idx"))
    build_index(
        spark, _wt(spark, corpus[:50]), index_dir,
        partition_seconds=PARTITION_SECONDS, block_span=BLOCK_SPAN,
    )
    eng = SearchEngine(spark, index_dir)
    with pytest.raises(QueryParseError, match="Unsupported query type"):
        eng.search_collect('"w000001 w000002"', k=10)


def test_resume_inherits_positions_meta(spark, corpus, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("inherit_idx"))
    build_index(
        spark, _wt(spark, corpus[:40]), index_dir,
        partition_seconds=PARTITION_SECONDS, block_span=BLOCK_SPAN,
        positions=True,
    )
    # positions=None on a resume append inherits True from meta; the
    # second batch sits a day later so it lands in NEW pids (resume
    # skips complete partitions by design)
    day_us = 86_400_000_000
    batch2 = [dict(r, warc_us=r["warc_us"] + day_us)
              for r in corpus[40:80]]
    build_index(
        spark, _wt(spark, batch2), index_dir,
        partition_seconds=PARTITION_SECONDS, block_span=BLOCK_SPAN,
    )
    eng = SearchEngine(spark, index_dir)
    assert eng.meta["positions"] is True
    oracle = OracleIndex(
        corpus[:40] + batch2, partition_seconds=PARTITION_SECONDS
    )
    snip = " ".join(batch2[1]["text"].split()[:3])
    q = f'"{snip}"'
    toks, _ = analyze_positions(snip, batch2[1]["lang"])
    if len(toks) >= 2:  # else it collapses to a term -- still compare
        assert parse_query(q, batch2[1]["lang"], True)[0] == "phrase"
    _assert_rank_identical(
        eng.search_collect(q, k=10, locale=batch2[1]["lang"]),
        oracle.search(q, k=10, locale=batch2[1]["lang"],
                      allow_phrases=True),
    )
    # an explicit positions=False append must refuse (format mismatch)
    with pytest.raises(ValueError, match="meta mismatch"):
        build_index(
            spark, _wt(spark, corpus[80:90]), index_dir,
            partition_seconds=PARTITION_SECONDS, block_span=BLOCK_SPAN,
            positions=False,
        )


def test_phrase_highlighting(engine, corpus):
    from miru_spark.query.highlight import highlight

    snip = _snippets(corpus)[0]
    s = highlight(f'"{snip}"', corpus[0]["text"], corpus[0]["lang"])
    assert s is not None and "<b>" in s
