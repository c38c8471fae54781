"""Randomized-corpus fuzz for the reco plugin family: a seeded
IRREGULAR corpus (random multi-valued field assignments, skewed value
frequencies, docs with missing fields) instead of the modular patterns
of test_featureops -- the same brute-force reference semantics must
hold on both engine paths."""

import os
import random
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest
from pyspark.sql import functions as F

from miru_spark.index.build import build_index
from miru_spark.query.engine import SearchEngine

N = 200
RNG = random.Random(7)


def _make_docs():
    docs = []
    for d in range(N):
        # skewed users (Zipf-ish), multi-valued items, sometimes ABSENT
        # parent/items (missing-field docs)
        user = f"u{min(int(RNG.expovariate(0.25)), 14):02d}"
        items = sorted(
            {f"i{RNG.randrange(12)}" for _ in range(RNG.randrange(0, 4))}
        )
        parent = (
            f"p{RNG.randrange(25)}" if RNG.random() > 0.15 else None
        )
        docs.append({"d": d, "user": user, "items": items,
                     "parent": parent})
    return docs


DOCS = _make_docs()


@pytest.fixture(scope="module")
def fz_engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fz_idx"))
    rows = [
        (
            f"doc{doc['d']:08d}",
            1704067200_000_000 + doc["d"] * 1_000_000,
            None,
            f"w{doc['d'] % 9}",
            "und",
            {
                "user": [doc["user"]],
                "item": doc["items"],
                **({"parent": [doc["parent"]]} if doc["parent"] else {}),
            },
        )
        for doc in DOCS
    ]
    wt = spark.createDataFrame(
        rows,
        "url string, warc_us long, html binary, text string, "
        "lang string, fields map<string,array<string>>",
    ).select(
        "url", F.timestamp_micros("warc_us").alias("warc_ts"),
        "html", "text", "lang", "fields",
    )
    build_index(
        spark, wt, d, partition_seconds=300, block_span=64,
        extra_fields=["user", "item", "parent"],
    )
    return SearchEngine(spark, d)


def _gf_oracle(fields):
    cnt: Counter = Counter()
    for doc in DOCS:
        groups = []
        for f in fields:
            g = (
                doc["items"] if f == "item"
                else [doc["user"]] if f == "user"
                else ([doc["parent"]] if doc["parent"] else [])
            )
            groups.append(g)
        tuples = [()]
        for g in groups:
            tuples = [t + (v,) for t in tuples for v in g]
        cnt.update(tuples)
    return sorted(cnt.items(), key=lambda vc: (-vc[1], vc[0]))


@pytest.mark.parametrize(
    "fields",
    [("user", "item"), ("user", "parent"), ("item", "parent"),
     ("user", "item", "parent")],
)
@pytest.mark.parametrize("local", [True, False])
def test_fuzz_gather_features(fz_engine, fields, local):
    assert fz_engine.gather_features(fields, local=local) == _gf_oracle(
        fields
    )


def _reco_oracle(me, k):
    my = [doc for doc in DOCS if doc["user"] == me and doc["parent"]]
    parents = {doc["parent"] for doc in my}
    other = [
        doc for doc in DOCS
        if doc["parent"] in parents and doc["user"] != me
    ]
    weights = Counter(doc["user"] for doc in other)
    ranked = sorted(weights.items(), key=lambda uc: (-uc[1], uc[0]))[:k]
    scores: Counter = Counter()
    for user, w in ranked:
        theirs = {
            doc["parent"] for doc in DOCS
            if doc["user"] == user and doc["parent"]
        } - parents
        for p in theirs:
            scores[p] += w
    return sorted(scores.items(), key=lambda ps: (-ps[1], ps[0]))[:k]


@pytest.mark.parametrize("local", [True, False])
def test_fuzz_reco_random_users(fz_engine, local):
    users = sorted({doc["user"] for doc in DOCS})
    rng = random.Random(11)
    for me in rng.sample(users, min(6, len(users))):
        got = fz_engine.reco(
            ("user", me), "parent", "user", "parent", k=6, local=local
        )
        assert got == _reco_oracle(me, 6), me


def test_fuzz_strut_random_model(fz_engine):
    rng = random.Random(13)
    feats = [(1.0, "user"), (0.7, ("user", "item"))]
    users = sorted({doc["user"] for doc in DOCS})
    items = sorted({i for doc in DOCS for i in doc["items"]})
    model = {(0, (u,)): round(rng.random(), 3) for u in users}
    model |= {
        (1, (u, i)): round(rng.random() * 1.3, 3)  # some clip at 1.0
        for u in users for i in items
    }
    a = fz_engine.strut("parent", feats, model=model, k=8, local=True)
    b = fz_engine.strut("parent", feats, model=model, k=8, local=False)
    assert a == b
    # brute-force the top candidate's score
    cands = sorted(
        {doc["parent"] for doc in DOCS if doc["parent"]}
    )
    best = {}
    for c in cands:
        mine = [doc for doc in DOCS if doc["parent"] == c]
        f0 = max(
            (min(model[(0, (doc["user"],))], 1.0) for doc in mine),
            default=0.0,
        )
        f1 = max(
            (
                min(model[(1, (doc["user"], i))], 1.0) * 0.7
                for doc in mine for i in doc["items"]
            ),
            default=0.0,
        )
        s = (f0 + f1) / 2 if (f0 > 0 or f1 > 0) else 0.0
        if s > 0:
            best[c] = s
    want = sorted(best.items(), key=lambda vs: (-vs[1], vs[0]))[:8]
    assert [v for v, _ in a] == [v for v, _ in want]
    for (_x, s1), (_y, s2) in zip(a, want):
        assert abs(s1 - s2) < 1e-12
