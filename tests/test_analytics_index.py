"""Index-backed analytics: `SearchEngine.count` and `SearchEngine.waveform`.

The reference's analytics plugin computes per-time-bucket counts of the
docs matching a constrained filter by ANDing the filter bitmap with
per-bucket time-range bitmaps (miru-analytics-plugins/.../Analytics.java
:164-183). Here the same semantics come from the inverted index + time
index: matched docIDs map through the pid's time array to a histogram.

Invariants pinned: serving-node and distributed answers are identical;
both equal a pure-Python recomputation AND a DuckDB SQL oracle over the
same corpus; tombstones, constraints, authz, time ranges, and match-all
all apply; waveform sums to count.
"""

import collections
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from miru_spark.index.build import build_index
from miru_spark.index.removals import remove_docs
from miru_spark.query.engine import SearchEngine
from miru_spark.webtext import generate_rows, webtext_df

PSEC = 3600
N = 3000
HOUR_US = 3600 * 1_000_000
ROWS = generate_rows(range(N))


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("wave") / "index")
    build_index(
        spark, webtext_df(spark, N), idx,
        partition_seconds=PSEC, block_span=256,
    )
    e = SearchEngine(spark, idx).cache()
    yield e
    e.close()


def _expected(term):
    return [r for r in ROWS if term in r["text"].split()]


def test_count_both_paths_match_oracle(eng):
    exp = len(_expected("w000001"))
    assert eng.count("w000001") == exp
    assert eng.count("w000001", local=False) == exp
    both = [
        r for r in ROWS
        if {"w000001", "w000004"} <= set(r["text"].split())
    ]
    assert eng.count("w000001 AND w000004") == len(both)
    assert eng.count("w000001 AND w000004", local=False) == len(both)
    # match-all (query=None) counts the corpus
    assert eng.count(None) == N
    assert eng.count(None, local=False) == N
    # no matches
    assert eng.count("zzzznotaterm") == 0
    assert eng.count("zzzznotaterm", local=False) == 0


def test_waveform_paths_identical_and_sum_to_count(eng):
    wl = eng.waveform("w000001", bucket_seconds=3600)
    wd = eng.waveform("w000001", bucket_seconds=3600, local=False)
    assert wl == wd
    assert sum(c for _b, c in wl) == eng.count("w000001")
    exp = collections.Counter(
        (r["warc_us"] // HOUR_US) * HOUR_US
        for r in _expected("w000001")
    )
    assert wl == sorted(exp.items())
    assert eng.waveform("zzzznotaterm", bucket_seconds=3600) == []


def test_waveform_matches_duckdb_oracle(eng):
    import pandas as pd

    con = duckdb.connect()
    con.register(
        "docs",
        pd.DataFrame(
            {
                "warc_us": [r["warc_us"] for r in ROWS],
                "text": [r["text"] for r in ROWS],
            }
        ),
    )
    want = con.execute(
        """
        SELECT (warc_us // 3600000000) * 3600000000 AS bucket,
               CAST(count(*) AS BIGINT) AS cnt
        FROM docs
        WHERE list_contains(string_split(text, ' '), 'w000001')
          AND list_contains(string_split(text, ' '), 'w000009')
        GROUP BY bucket ORDER BY bucket
        """
    ).fetchall()
    got = eng.waveform("w000001 AND w000009", bucket_seconds=3600)
    assert got == [(int(b), int(c)) for b, c in want]
    assert got == eng.waveform(
        "w000001 AND w000009", bucket_seconds=3600, local=False
    )


def test_count_respects_time_range_constraints_authz(eng):
    t0 = ROWS[0]["warc_us"]
    tr = (t0, t0 + HOUR_US - 1_000_000)
    exp = [r for r in _expected("w000001") if tr[0] <= r["warc_us"] <= tr[1]]
    assert eng.count("w000001", time_range_us=tr) == len(exp)
    assert eng.count("w000001", time_range_us=tr, local=False) == len(exp)
    wl = eng.waveform("w000001", bucket_seconds=600, time_range_us=tr)
    assert sum(c for _b, c in wl) == len(exp)
    assert wl == eng.waveform(
        "w000001", bucket_seconds=600, time_range_us=tr, local=False
    )
    # constraints gate the match set (never score -- count has no scores
    # anyway, but the tree composition is the same with_access path)
    de = [r for r in _expected("w000001") if r["lang"] == "de"]
    assert eng.count("w000001", constraints="lang:de") == len(de)
    assert (
        eng.count("w000001", constraints="lang:de", local=False) == len(de)
    )


def test_distincts_both_paths_match_oracle(eng):
    want = collections.Counter(r["lang"] for r in _expected("w000001"))
    want = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
    assert eng.distincts("lang", "w000001") == want
    assert eng.distincts("lang", "w000001", local=False) == want
    # numeric field decodes back to ints; match-all facet
    import re

    site = lambda u: int(  # noqa: E731
        re.match(r"^https?://[a-z]*?(\d+)\.", u).group(1)
    )
    wa = collections.Counter(site(r["url"]) for r in ROWS)
    wa = sorted(wa.items(), key=lambda kv: (-kv[1], str(kv[0])))
    assert eng.distincts("site") == wa
    assert eng.distincts("site", local=False) == wa
    # constraints compose; unknown field -> empty
    de = collections.Counter(
        r["lang"] for r in _expected("w000001") if r["lang"] == "de"
    )
    assert eng.distincts("lang", "w000001", constraints="lang:de") == [
        ("de", de["de"])
    ]
    assert eng.distincts("nosuchfield", "w000001") == []


def test_count_masks_tombstones(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("wave_rm") / "index")
    build_index(
        spark, webtext_df(spark, 600), idx,
        partition_seconds=PSEC, block_span=256,
    )
    eng = SearchEngine(spark, idx)
    before = eng.count("w000001")
    hit = eng.search_collect("w000001", k=1)[0]
    remove_docs(spark, idx, [(hit[0], hit[1])], version=5)
    eng2 = SearchEngine(spark, idx)
    assert eng2.count("w000001") == before - 1
    assert eng2.count("w000001", local=False) == before - 1
    wl = eng2.waveform("w000001", bucket_seconds=3600)
    assert sum(c for _b, c in wl) == before - 1
    eng.close()
    eng2.close()
