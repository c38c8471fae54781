"""Randomized fuzz for the index-backed analytics family: seeded
random boolean query trees x random bucketing (epoch-aligned AND
divideTimeRangeIntoNSegments) x irregular timestamps (bursts + gaps,
NOT the uniform 1-doc-per-second grid of the other suites). Every
answer must equal a brute-force pure-Python recompute on BOTH engine
paths for waveform / count / stumptown / distincts.
"""

import os
import random
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

from miru_spark.index.build import build_index
from miru_spark.query.engine import SearchEngine

N = 300
RNG = random.Random(13)
BASE_US = 1704067200_000_000


def _make_docs():
    """Bursty, gappy timeline: clusters of docs separated by random
    dead stretches; small vocabulary so random trees actually match."""
    docs = []
    t = BASE_US
    for d in range(N):
        if RNG.random() < 0.08:
            t += RNG.randrange(1, 40) * 3_600_000_000  # hours-long gap
        t += RNG.randrange(1, 900) * 1_000_000
        terms = sorted(
            {f"w{RNG.randrange(8)}" for _ in range(RNG.randrange(1, 5))}
        )
        lang = RNG.choice(["de", "en", "fr", "es"])
        docs.append(
            {"d": d, "ts": t, "terms": terms, "lang": lang}
        )
    return docs


DOCS = _make_docs()


@pytest.fixture(scope="module")
def az_engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("az_idx"))
    rows = [
        (
            f"doc{doc['d']:08d}",
            doc["ts"],
            None,
            " ".join(doc["terms"]),
            doc["lang"],
        )
        for doc in DOCS
    ]
    from pyspark.sql import functions as F

    wt = spark.createDataFrame(
        rows,
        "url string, warc_us long, html binary, text string, "
        "lang string",
    ).select(
        "url", F.timestamp_micros("warc_us").alias("warc_ts"),
        "html", "text", "lang",
    )
    build_index(spark, wt, d, partition_seconds=7200, block_span=64)
    eng = SearchEngine(spark, d).cache()
    yield eng
    eng.close()


def _rand_query(rng):
    """Random boolean tree over the tiny vocabulary + lang field."""
    def leaf():
        if rng.random() < 0.2:
            return f"lang:{rng.choice(['de', 'en', 'fr', 'es'])}"
        return f"w{rng.randrange(8)}"

    def tree(depth):
        if depth == 0 or rng.random() < 0.4:
            return leaf()
        op = rng.choice(["AND", "OR", "AND NOT"])
        return f"({tree(depth - 1)}) {op} ({tree(depth - 1)})"

    return tree(rng.randrange(1, 3))


def _matches(query_terms_fn):
    return [doc for doc in DOCS if query_terms_fn(doc)]


def _eval_doc(q, doc):
    """Tiny evaluator for the generated query shapes only."""
    q = q.strip()
    if q.startswith("(") and q.endswith(")"):
        depth = 0
        for i, ch in enumerate(q):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0 and i < len(q) - 1:
                    break
        else:
            return _eval_doc(q[1:-1], doc)
    for op, fn in (
        (" AND NOT ", lambda a, b: a and not b),
        (" AND ", lambda a, b: a and b),
        (" OR ", lambda a, b: a or b),
    ):
        depth = 0
        for i in range(len(q)):
            if q[i] == "(":
                depth += 1
            elif q[i] == ")":
                depth -= 1
            elif depth == 0 and q[i:].startswith(op):
                return fn(
                    _eval_doc(q[:i], doc), _eval_doc(q[i + len(op):], doc)
                )
    if q.startswith("lang:"):
        return doc["lang"] == q[5:]
    return q in doc["terms"]


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5, 6])
def test_fuzz_waveform_count_stumptown_distincts(az_engine, seed):
    rng = random.Random(seed)
    for _round in range(4):
        q = _rand_query(rng)
        hits = [doc for doc in DOCS if _eval_doc(q, doc)]
        # --- count, both paths
        assert az_engine.count(q) == len(hits)
        assert az_engine.count(q, local=False) == len(hits)
        # --- epoch waveform, random bucket size
        bsec = rng.choice([60, 600, 3600, 86400])
        bus = bsec * 1_000_000
        want = sorted(
            Counter((doc["ts"] // bus) * bus for doc in hits).items()
        )
        assert az_engine.waveform(q, bucket_seconds=bsec) == want
        assert (
            az_engine.waveform(q, bucket_seconds=bsec, local=False)
            == want
        )
        # --- segment waveform over a random sub-range
        lo = rng.randrange(0, N // 2)
        hi = rng.randrange(lo + 10, N)
        t0, t1 = DOCS[lo]["ts"], DOCS[hi]["ts"]
        nseg = rng.choice([3, 5, 8])
        dur = (t1 - t0) // nseg
        if dur >= 1:
            exp = [0] * nseg
            for doc in hits:
                rel = doc["ts"] - t0
                if 0 <= rel < nseg * dur:
                    exp[rel // dur] += 1
            want_seg = [(t0 + i * dur, exp[i]) for i in range(nseg)]
            assert (
                az_engine.waveform(
                    q, time_range_us=(t0, t1), segments=nseg
                )
                == want_seg
            )
            assert (
                az_engine.waveform(
                    q, time_range_us=(t0, t1), segments=nseg,
                    local=False,
                )
                == want_seg
            )
        # --- stumptown: same waveform + newest-k identity
        k = rng.choice([1, 5, 17])
        st = az_engine.stumptown(q, bucket_seconds=bsec, k=k)
        assert st == az_engine.stumptown(
            q, bucket_seconds=bsec, k=k, local=False
        )
        assert st["waveform"] == want
        newest = sorted(hits, key=lambda doc: -doc["ts"])[:k]
        assert [w for _u, w, _p, _d in st["results"]] == [
            doc["ts"] for doc in newest
        ]
        # --- distincts with counts
        want_d = sorted(
            Counter(doc["lang"] for doc in hits).items(),
            key=lambda t: (-t[1], t[0]),
        )
        assert az_engine.distincts("lang", q) == want_d
        assert az_engine.distincts("lang", q, local=False) == want_d
