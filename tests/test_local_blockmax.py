"""Serving-path block-max WAND: exact two-phase pruning over composite-id
cells, rank- and score-identical to the exhaustive serving scan and the
pure-Python oracle (the kernel's block-max twin -- north star: "BM25 with
block-max WAND pruning over block-level max-score summaries")."""

import math

import pytest

from miru_spark.index.build import build_index
from miru_spark.oracle import OracleIndex
from miru_spark.query.engine import SearchEngine
from miru_spark.webtext import generate_rows, webtext_df

N_DOCS = 1500
PARTITION_SECONDS = 3600
BLOCK_SPAN = 32  # small span -> many cells -> pruning observable

QUERIES = [
    "w00000*",                       # wide prefix: the r2 latency tail
    "w000001 OR w000002 OR w000003 OR w000011 OR w000033",
    "w000001 AND w000004",
    "w000002 AND (w000005 OR w000007)",
    "w000001 AND NOT w000002",       # negation stays admissible
    "w000017 AND lang:en",           # filter term rides with bound 0
]


@pytest.fixture(scope="module")
def corpus():
    return generate_rows(range(N_DOCS))


@pytest.fixture(scope="module")
def oracle(corpus):
    return OracleIndex(corpus, partition_seconds=PARTITION_SECONDS)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("bm_idx"))
    wt = webtext_df(spark, N_DOCS, parallelism=4)
    build_index(
        spark, wt, index_dir,
        partition_seconds=PARTITION_SECONDS, block_span=BLOCK_SPAN,
    )
    eng = SearchEngine(spark, index_dir)
    # force engagement regardless of corpus size: the mechanism under
    # test, not the production threshold
    eng.LOCAL_BLOCKMAX_MIN_POSTINGS = 0
    return eng


@pytest.mark.parametrize("query", QUERIES)
def test_blockmax_local_identical_to_exhaustive(engine, oracle, query):
    got = engine.search_collect(query, k=10, use_blockmax=True)
    ref = engine.search_collect(query, k=10, use_blockmax=False)
    assert [(p, d) for p, d, _s, _u in got] == [
        (p, d) for p, d, _s, _u in ref
    ]
    for g, r in zip(got, ref):
        assert g[2] == r[2]  # bit-identical float sums
    want = oracle.search(query, k=10)
    assert [(p, d) for p, d, _s, _u in got] == [
        (p, d) for p, d, _s, _u in want
    ]
    for g, w in zip(got, want):
        assert math.isclose(g[2], w[2], rel_tol=0, abs_tol=1e-9)


def test_blockmax_local_prunes_cells(engine):
    # pruning needs score spread: a rare high-idf term OR a ubiquitous
    # low-idf one -- top-k is dominated by the rare term, so cells
    # carrying only the common term fall under theta and are skipped.
    # (Conjunctions over this homogeneous corpus legitimately prune ~0:
    # every cell holds a near-max-tf doc of every head term.)
    engine.search_collect("w004242 OR w000001", k=10, use_blockmax=True)
    st = engine._local_blockmax_stats
    assert st["cells_total"] >= 16
    assert st["cells_scored"] < st["cells_total"], st


def test_blockmax_respects_k_larger_than_matches(engine):
    got = engine.search_collect(
        "w004242 AND w000003", k=1000, use_blockmax=True
    )
    ref = engine.search_collect(
        "w004242 AND w000003", k=1000, use_blockmax=False
    )
    assert got == ref


def test_blockmax_with_authz_and_constraints(spark, tmp_path, oracle):
    # masks apply inside the subset scorer: phase-1 "k found" counts only
    # docs surviving authz/constraints, so pruning stays exact under them
    from pyspark.sql import functions as F

    rows = generate_rows(range(600))
    for i, r in enumerate(rows):
        r["authz"] = [f"g{i % 3}"]
    wt = spark.createDataFrame(
        [(r["url"], r["warc_us"], r["html"], r["text"], r["lang"],
          r["authz"]) for r in rows],
        "url string, warc_us long, html binary, text string, lang string, "
        "authz array<string>",
    ).select("url", F.timestamp_micros("warc_us").alias("warc_ts"),
             "html", "text", "lang", "authz")
    idx = str(tmp_path / "bm_authz_idx")
    build_index(spark, wt, idx, partition_seconds=3600, block_span=32)
    eng = SearchEngine(spark, idx)
    eng.LOCAL_BLOCKMAX_MIN_POSTINGS = 0
    oi = OracleIndex(rows, partition_seconds=3600)
    q = "w000001 OR w000002 OR w000004"
    got = eng.search_collect(q, k=10, authz=["g1"],
                             constraints="doclen:[16 TO 400]")
    ref = eng.search_collect(q, k=10, authz=["g1"],
                             constraints="doclen:[16 TO 400]",
                             use_blockmax=False)
    want = oi.search(q, k=10, authz=["g1"],
                     constraints="doclen:[16 TO 400]")
    assert got == ref
    assert [(p, d) for p, d, _s, _u in got] == [
        (p, d) for p, d, _s, _u in want
    ]
    eng.close()
