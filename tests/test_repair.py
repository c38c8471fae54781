"""Content-level repair: versioned re-index of a changed document.

The reference's MiruIndexer.set repairs a doc's field values when a
strictly newer version arrives (miru-service/.../stream/MiruIndexer.java
:128-161). The immutable-postings analog (`repair_docs`): tombstone the
old (pid, doc_id) and append the new version as a fresh doc through the
normal resumable build -- no partition rebuild.

Rank identity: the engine after repair must equal a pure-Python oracle
built over the LOGICAL corpus the engine serves -- original rows plus the
new version row -- with the tombstoned key masked from results. (Global
BM25 stats keep counting the tombstoned doc until compaction, exactly
like the reference's removal bitmap; the oracle models the same.)
"""

import math
import os

import pytest

from miru_spark.index.build import IndexPaths, build_index
from miru_spark.index.removals import repair_docs
from miru_spark.oracle import OracleIndex
from miru_spark.query.engine import SearchEngine
from miru_spark.webtext import generate_rows, webtext_df

N_DOCS = 300
PARTITION_SECONDS = 600
NEW_TOKEN = "w009998"  # tail token: unique to the repaired version


@pytest.fixture(scope="module")
def corpus():
    return generate_rows(range(N_DOCS))


@pytest.fixture(scope="module")
def repaired(spark, corpus, tmp_path_factory):
    """Build, repair one doc's text, return (engine, old_key, new_row)."""
    index_dir = str(tmp_path_factory.mktemp("repair_idx"))
    wt = webtext_df(spark, N_DOCS, parallelism=4)
    build_index(
        spark, wt, index_dir,
        partition_seconds=PARTITION_SECONDS, block_span=64,
    )
    pre = SearchEngine(spark, index_dir)
    target_url = corpus[7]["url"]
    [old] = pre.docmap.filter(pre.docmap.url == target_url).collect()
    op, od = int(old["pid"]), int(old["doc_id"])
    pre.close()
    seg_dirs_before = sorted(os.listdir(IndexPaths(index_dir).segments))

    new_ts_us = max(r["warc_us"] for r in corpus) + PARTITION_SECONDS * 10**6
    new_text = f"{NEW_TOKEN} repaired body " + " ".join(
        ["w000004"] * 3 + ["w000001"]
    )
    new_row = {
        "url": target_url,
        "warc_us": new_ts_us,
        "text": new_text,
        "lang": "en",
    }
    from pyspark.sql import functions as F

    nv = spark.createDataFrame(
        [(target_url, new_ts_us, new_text, "en")],
        "url string, warc_us long, text string, lang string",
    ).select(
        "url", F.timestamp_micros("warc_us").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"), "text", "lang",
    )
    rep = repair_docs(spark, index_dir, nv)
    assert rep["tombstoned"] == 1 and rep["appended"] == 1

    seg_dirs_after = sorted(os.listdir(IndexPaths(index_dir).segments))
    # no pid rebuild: every pre-repair commit dir is untouched, exactly
    # one new batch dir appended
    assert set(seg_dirs_before) <= set(seg_dirs_after)
    assert len(seg_dirs_after) == len(seg_dirs_before) + 1

    eng = SearchEngine(spark, index_dir)
    return eng, (op, od), new_row


@pytest.fixture(scope="module")
def oracle_after(corpus, repaired):
    _eng, old_key, new_row = repaired
    return OracleIndex(
        corpus + [new_row], partition_seconds=PARTITION_SECONDS
    ), old_key


def _oracle_topk(oracle, old_key, query, k):
    full = oracle.search(query, k=k + 1)
    return [t for t in full if (t[0], t[1]) != old_key][:k]


def test_new_content_served_both_paths(repaired):
    eng, old_key, new_row = repaired
    got_local = eng.search_collect(NEW_TOKEN, k=5)
    assert [u for _p, _d, _s, u in got_local] == [new_row["url"]]
    rows = eng.search(NEW_TOKEN, k=5, local=False).collect()
    assert [r["url"] for r in rows] == [new_row["url"]]


def test_old_version_masked(repaired):
    eng, old_key, _new_row = repaired
    # the old doc matched this query before the repair; now its key is
    # tombstoned on both paths
    for rows in (
        eng.search_collect("w000001 OR w000002", k=N_DOCS),
        [
            (r["pid"], r["doc_id"], r["score"], r["url"])
            for r in eng.search(
                "w000001 OR w000002", k=N_DOCS, local=False
            ).collect()
        ],
    ):
        assert old_key not in {(p, d) for p, d, _s, _u in rows}


@pytest.mark.parametrize(
    "query",
    ["w000001 AND w000004", "w000001 OR w000009", f"{NEW_TOKEN} OR w000002"],
)
def test_rank_identity_after_repair(repaired, oracle_after, query):
    eng, _old, _new = repaired
    oracle, old_key = oracle_after
    got = eng.search_collect(query, k=10)
    want = _oracle_topk(oracle, old_key, query, 10)
    assert [(p, d) for p, d, _s, _u in got] == [
        (p, d) for p, d, _s, _u in want
    ]
    for (_p, _d, sg, _u), (_p2, _d2, sw, _u2) in zip(got, want):
        assert math.isclose(sg, sw, rel_tol=0, abs_tol=1e-9)


def test_repair_into_complete_pid_raises(spark, repaired, corpus, tmp_path):
    eng, _old, _new = repaired
    from pyspark.sql import functions as F

    nv = spark.createDataFrame(
        [(corpus[3]["url"], corpus[3]["warc_us"], "x", "en")],
        "url string, warc_us long, text string, lang string",
    ).select(
        "url", F.timestamp_micros("warc_us").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"), "text", "lang",
    )
    with pytest.raises(ValueError, match="already-indexed"):
        repair_docs(spark, eng.paths.root, nv)


def test_repair_retry_after_crashed_append(spark, corpus, tmp_path_factory):
    """ADVICE r4: a repair that dies AFTER its build committed but
    BEFORE the tombstone append must be completable by re-running
    repair_docs with the same rows -- the retry detects the indexed
    new versions and skips straight to the append (no pid-clash
    raise, no double index)."""
    import shutil

    from pyspark.sql import functions as F

    index_dir = str(tmp_path_factory.mktemp("repair_retry"))
    wt = webtext_df(spark, 60, parallelism=2)
    build_index(
        spark, wt, index_dir,
        partition_seconds=PARTITION_SECONDS, block_span=64,
    )
    url = corpus[5]["url"]
    new_ts = corpus[59]["warc_us"] + PARTITION_SECONDS * 10**6
    nv = spark.createDataFrame(
        [(url, new_ts, "retry body w000001", "en")],
        "url string, warc_us long, text string, lang string",
    ).select(
        "url", F.timestamp_micros("warc_us").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"), "text", "lang",
    )
    rep1 = repair_docs(spark, index_dir, nv)
    assert rep1 == {
        "tombstoned": 1, "appended": 1, "pids": rep1["pids"]
    }
    # simulate the crash window: the build committed, the tombstone
    # append never happened
    shutil.rmtree(IndexPaths(index_dir).removals)
    rep2 = repair_docs(spark, index_dir, nv)
    assert rep2["tombstoned"] == 1
    assert rep2["appended"] == 0  # no double index of the new version
    eng = SearchEngine(spark, index_dir)
    try:
        rows = eng.docmap.filter(eng.docmap.url == url).collect()
        # both versions in the docmap, exactly one visible after masking
        assert len(rows) == 2
        hits = eng.search("w000001", k=60).filter(
            F.col("url") == url
        ).collect()
        assert len(hits) == 1
        # the retry path re-finalizes (idempotent): global stats include
        # the repaired doc even if the crashed run died pre-finalize
        assert eng.n_docs == 61
        # the new version's unique term (en chain stems retry -> retri)
        assert "retri" in eng._term_df
    finally:
        eng.close()
