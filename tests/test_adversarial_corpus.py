"""Adversarial corpus e2e: pathological documents through the REAL build
(vectorized Arrow worker) and both query paths, rank-identical to the
pure-Python oracle. Exercises the edges a crawl actually contains: empty
and whitespace-only pages, one-token and punctuation-only pages,
all-stopword pages, a 5000-repeat token (BM25 tf saturation), CJK/emoji/
combining-mark unicode, mixed locales (stemmed + unstemmed scripts),
identical timestamps (url tie-break in docID minting), duplicate texts,
numeric-looking tokens."""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

from miru_spark.index.build import build_index
from miru_spark.oracle import OracleIndex
from miru_spark.query.engine import SearchEngine

PSEC = 3600
_BASE = 1704067200_000_000  # 2024-01-01T00:00:00Z micros


def _rows():
    docs = [
        # (text, lang, ts_offset_us)
        ("", "en", 0),
        ("   \t  \n ", "en", 1_000_000),
        ("lonely", "en", 2_000_000),
        ("the a is was and or not to of in", "en", 3_000_000),
        ("zebra " * 5000, "en", 4_000_000),
        ("zebra quagga", "en", 5_000_000),
        ("猫 走る 犬 and zebra", "zh", 6_000_000),
        ("naïve café résumé elephant", "fr", 7_000_000),
        ("läuft kätzchen häuser elephant", "de", 8_000_000),
        ("!!! ... ??? ---", "en", 9_000_000),
        ("42 3.14 0xdead 9999999 zebra", "en", 10_000_000),
        # identical timestamp pair: url decides docID order
        ("tied zebra alpha", "en", 11_000_000),
        ("tied zebra beta", "en", 11_000_000),
        # duplicate text (exact dup docs, distinct urls/timestamps)
        ("duplicate content here quagga", "en", 12_000_000),
        ("duplicate content here quagga", "en", 13_000_000),
        # crosses into the next hourly partition
        ("zebra after the hour quagga", "en", 3700_000_000),
        ("бежит кошка zebra", "ru", 3710_000_000),
        ("emoji 🦓 stays whole zebra", "en", 3720_000_000),
    ]
    return [
        {
            "url": f"https://site{i % 3}.example/adv/{i}",
            "warc_us": _BASE + off,
            "text": t,
            "lang": lang,
        }
        for i, (t, lang, off) in enumerate(docs)
    ]


QUERIES = [
    "zebra",
    "zebra AND quagga",
    "zebra OR quagga OR lonely",
    "zebra AND NOT quagga",
    "the AND zebra",          # stopword clause dropped under AND
    "the",                    # all clauses dropped -> empty
    "走る",                   # CJK token
    "naïve OR kätzchen",      # diacritics across locales
    "quag*",                  # prefix expansion
    "zeb* AND NOT lonely",
    "lang:zh AND zebra",      # field term composed with text
    "42 AND zebra",           # numeric-looking token
    "duplicate AND content",
]


@pytest.fixture(scope="module")
def adv(spark, tmp_path_factory):
    rows = _rows()
    wt = spark.createDataFrame(
        [
            (
                r["url"],
                r["warc_us"],
                None,
                r["text"],
                r["lang"],
            )
            for r in rows
        ],
        "url string, warc_us long, html binary, text string, lang string",
    ).selectExpr(
        "url", "timestamp_micros(warc_us) AS warc_ts", "html", "text", "lang"
    )
    d = str(tmp_path_factory.mktemp("adv_idx"))
    build_index(spark, wt, d, partition_seconds=PSEC, block_span=4)
    return SearchEngine(spark, d), OracleIndex(rows, partition_seconds=PSEC)


@pytest.mark.parametrize("query", QUERIES)
def test_adversarial_rank_identity(adv, query):
    eng, oracle = adv
    want = oracle.search(query, k=20)
    got_local = eng.search_collect(query, k=20)
    got_dist = [
        (r["pid"], r["doc_id"], r["score"], r["url"])
        for r in eng.search(query, k=20).collect()
    ]
    for name, got in (("serving", got_local), ("distributed", got_dist)):
        assert len(got) == len(want), (name, query, len(got), len(want))
        for g, w in zip(got, want):
            assert (g[0], g[1]) == (w[0], w[1]), (name, query, g, w)
            assert math.isclose(g[2], w[2], rel_tol=0, abs_tol=1e-9), (
                name, query, g, w)


def test_adversarial_counts_and_analytics(adv):
    eng, oracle = adv
    # count == oracle's full match set, both paths
    for q in ("zebra", "zebra AND quagga", "lang:zh"):
        want = len(oracle.search(q, k=100))
        assert eng.count(q) == want, q
        assert eng.count(q, local=False) == want, q
    # tf saturation: the 5000-repeat doc's one-term score stays strictly
    # under the idf*(k1+1) asymptote (tf cannot run away in BM25)
    from miru_spark.oracle import K1, bm25_idf

    zebra = {t[3]: t[2] for t in eng.search_collect("zebra", k=20)}
    monster = next(s for u, s in zebra.items() if "/adv/4" in u)
    df = len(zebra)
    assert monster < bm25_idf(len(_rows()), df) * (K1 + 1.0)
    # empty-text docs are real docs: universe minus matches stays exact
    n_all = eng.count(None)
    assert n_all == len(_rows())
    # waveform buckets across the partition boundary sum to the count
    wf = eng.waveform("zebra", bucket_seconds=PSEC)
    assert sum(c for _b, c in wf) == eng.count("zebra")


def test_adversarial_tie_and_dup_docids(adv):
    eng, oracle = adv
    # identical timestamps: docIDs dense-ranked by (warc_ts, url) --
    # 'tied zebra alpha' (url .../11) sorts before beta (.../12)
    a = eng.search_collect("tied", k=5, locale="en")
    assert len(a) == 2
    assert a[0][1] != a[1][1]
    # exact-duplicate texts score identically; order falls to (pid, doc)
    d = eng.search_collect("duplicate AND content AND here", k=5, locale="en")
    assert len(d) == 2
    assert math.isclose(d[0][2], d[1][2], abs_tol=1e-12)
    assert (d[0][0], d[0][1]) < (d[1][0], d[1][1])
