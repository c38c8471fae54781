"""Doc-level remove/repair (tombstone) tests.

Reference semantics: MiruIndexer.remove sets the doc's removal-index bit
and queries apply andNot(removalIndex); MiruIndexer.set out-versions the
removal on re-add (miru-service/.../stream/MiruIndexer.java:128-162,
miru-plugin/.../index/MiruRemovalIndex.java). Removing a doc must not
change surviving docs' scores (the removal bitmap hides documents
without touching df/avgdl until a rebuild), so the expected result is
the full oracle ranking with the tombstoned docs filtered out.
"""

import math

import pytest

from miru_spark.index.build import build_index
from miru_spark.index.removals import remove_docs, remove_urls, restore_docs
from miru_spark.oracle import OracleIndex
from miru_spark.query import SearchEngine
from miru_spark.webtext import generate_rows, webtext_df

N_DOCS = 400
PARTITION_SECONDS = 600
BLOCK_SPAN = 64

QUERIES = [
    "w000001 AND w000004",
    "w000001 OR w000009",
    "w000001 AND NOT w000002",
    "w00004*",
]


@pytest.fixture(scope="module")
def oracle():
    return OracleIndex(
        generate_rows(range(N_DOCS)), partition_seconds=PARTITION_SECONDS
    )


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_rm"))
    wt = webtext_df(spark, N_DOCS, parallelism=4)
    build_index(
        spark, wt, d,
        partition_seconds=PARTITION_SECONDS, block_span=BLOCK_SPAN,
    )
    return d


def _expect(oracle, query, removed: set, k: int):
    """Oracle ranking minus tombstoned docs: surviving docs keep their
    exact scores (stats unchanged), later ranks fill the freed slots."""
    full = oracle.search(query, k=10**9)  # full ranking
    out = [r for r in full if (r[0], r[1]) not in removed]
    return out[:k]


def _assert_same(got, want, query):
    assert len(got) == len(want), f"{query}: {len(got)} vs {len(want)}"
    for g, w in zip(got, want):
        assert (g[0], g[1]) == (w[0], w[1]), f"{query}: {g} vs {w}"
        assert math.isclose(g[2], w[2], rel_tol=0, abs_tol=1e-9)


def test_remove_then_query_excludes(spark, index_dir, oracle):
    base = SearchEngine(spark, index_dir)
    top = base.search_collect("w000001 AND w000004", k=3)
    victims = [(int(p), int(d)) for (p, d, _s, _u) in top]
    assert victims
    remove_docs(spark, index_dir, victims)

    eng = SearchEngine(spark, index_dir)
    removed = set(victims)
    for query in QUERIES:
        want = _expect(oracle, query, removed, 10)
        # local serving path, distributed kernel path, exhaustive kernel
        _assert_same(eng.search_collect(query, k=10), want, query)
        _assert_same(
            eng.search_collect(query, k=10, local=False), want, query
        )
        _assert_same(
            eng.search_collect(
                query, k=10, local=False, use_blockmax=False
            ),
            want,
            query,
        )


def test_unpinned_tombstones_via_kernel_rows(spark, index_dir, oracle):
    """max_pinned_removals=0 forces the 'x'-row co-partitioned path (the
    100 TB shape: removal ids never concentrate on the driver)."""
    eng = SearchEngine(spark, index_dir, max_pinned_removals=0)
    assert eng._removed_df is not None and eng._removed_map is None
    removed = {
        (int(r["pid"]), int(r["doc_id"]))
        for r in eng._removed_df.collect()
    }
    assert removed
    for query in QUERIES[:2]:
        prep = eng._prep_query(query, None, None)
        assert not eng._local_eligible(prep)
        want = _expect(oracle, query, removed, 10)
        _assert_same(eng.search_collect(query, k=10), want, query)
    # search_many falls back per-query but stays correct
    res = eng.search_many(QUERIES[:2], k=10)
    for query in QUERIES[:2]:
        _assert_same(res[query], _expect(oracle, query, removed, 10), query)


def test_restore_outversions_tombstone(spark, index_dir, oracle):
    eng0 = SearchEngine(spark, index_dir)
    removed = {
        (int(r["pid"]), int(r["doc_id"]))
        for r in eng0._removed_df.collect()
    }
    back = sorted(removed)[0]
    restore_docs(spark, index_dir, [back])

    eng = SearchEngine(spark, index_dir)
    still = removed - {back}
    q = "w000001 AND w000004"
    want = _expect(oracle, q, still, 10)
    _assert_same(eng.search_collect(q, k=10), want, q)
    _assert_same(eng.search_collect(q, k=10, local=False), want, q)
    # refresh on a live engine picks up later appends
    eng0.refresh_removals()
    _assert_same(eng0.search_collect(q, k=10), want, q)


def test_same_version_tie_stays_removed(spark, index_dir):
    eng0 = SearchEngine(spark, index_dir)
    victim = sorted(
        (int(r["pid"]), int(r["doc_id"]))
        for r in eng0._removed_df.collect()
    )[0]
    remove_docs(spark, index_dir, [victim], version=7)
    restore_docs(spark, index_dir, [victim], version=7)
    eng = SearchEngine(spark, index_dir)
    assert victim in {
        (int(r["pid"]), int(r["doc_id"]))
        for r in eng._removed_df.collect()
    }


def test_newest_excludes_removed(spark, index_dir):
    eng = SearchEngine(spark, index_dir)
    fresh = eng.newest(k=5).collect()
    removed = {
        (int(r["pid"]), int(r["doc_id"]))
        for r in eng._removed_df.collect()
    }
    assert all((int(r["pid"]), int(r["doc_id"])) not in removed for r in fresh)


def test_remove_urls_roundtrip(spark, index_dir):
    eng0 = SearchEngine(spark, index_dir)
    rows = eng0.newest(k=1).collect()
    url = rows[0]["url"]
    n = remove_urls(spark, index_dir, [url])
    assert n >= 1
    eng = SearchEngine(spark, index_dir)
    assert all(r["url"] != url for r in eng.newest(k=10).collect())


def test_forced_local_raises_when_ineligible(spark, index_dir):
    """local=True must fail loudly when the serving-node path can't
    honor the query (here: tombstones exist but are unpinned, so only
    the kernel path can mask removals) instead of silently resurrecting
    removed docs."""
    eng = SearchEngine(spark, index_dir, max_pinned_removals=0)
    try:
        assert eng._removed_df is not None and eng._removed_map is None
        with pytest.raises(ValueError, match="not eligible"):
            eng.search_collect("w000001", k=5, local=True)
        with pytest.raises(ValueError, match="not eligible"):
            eng.search("w000001", k=5, local=True)
    finally:
        eng.close()
