"""Connected-components duplicate clustering (dedup.py) vs a driver
union-find oracle, plus the dd_cluster pipeline invariants."""

import random

import pytest
from pyspark.sql import functions as F

from miru_spark.ops.dedup import connected_components, dd_cluster


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _cc_dict(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    out = connected_components(df)
    return {r["node"]: r["component"] for r in out.collect()}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_graphs_match_union_find(spark, seed):
    rng = random.Random(seed)
    n = 120
    edges = [
        (rng.randrange(n), rng.randrange(n))
        for _ in range(rng.randint(40, 160))
    ]
    edges = [(a, b) for a, b in edges if a != b]
    got = _cc_dict(spark, edges)
    want = _union_find(edges)
    assert got == want


def test_long_chain_converges_logarithmically(spark):
    # a 64-node path is label-propagation's worst case (diameter 63);
    # large-star/small-star must still finish within max_rounds=25
    edges = [(i, i + 1) for i in range(63)]
    got = _cc_dict(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 64


def test_self_loops_and_duplicate_edges_ignored(spark):
    got = _cc_dict(spark, [(5, 5), (1, 2), (2, 1), (1, 2), (7, 8)])
    assert got == {1: 1, 2: 1, 7: 7, 8: 7}


def test_dd_cluster_invariants(spark):
    sf = "/root/testdata/sf0.001"
    from miru_spark.ops.dedup import dd_minhash_pairs

    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in dd_minhash_pairs(spark, sf).collect()
    ]
    rows = dd_cluster(spark, sf).collect()
    cl = {r["doc_id"]: r["cluster_id"] for r in rows}
    # exactly the paired docs are clustered
    assert set(cl) == {d for p in pairs for d in p}
    # every verified pair lands in one cluster
    for a, b in pairs:
        assert cl[a] == cl[b], (a, b)
    # cluster id is the member minimum, canonical flags exactly the id
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        assert cid == min(m["doc_id"] for m in members)
        canon = [m for m in members if m["is_canonical"]]
        assert len(canon) == 1 and canon[0]["doc_id"] == cid


def test_emb_cluster_matches_union_find(spark):
    sf = "/root/testdata/sf0.001"
    from miru_spark.ops.similarity import emb_cluster, emb_dup_pairs

    pairs = [
        (r["vid_a"], r["vid_b"])
        for r in emb_dup_pairs(spark, sf).collect()
    ]
    rows = emb_cluster(spark, sf).collect()
    got = {r["vec_id"]: r["cluster_id"] for r in rows}
    assert got == _union_find(pairs)
    canon = [r for r in rows if r["is_canonical"]]
    assert {r["vec_id"] for r in canon} == set(got.values())


def test_keep_set_invariants(spark):
    sf = "/root/testdata/sf0.001"
    from miru_spark.ops.dedup import _docs, dd_cluster, dd_keep_set

    all_ids = {r["doc_id"] for r in _docs(spark, sf).select("doc_id").collect()}
    cl = dd_cluster(spark, sf).collect()
    keep = {r["doc_id"] for r in dd_keep_set(spark, sf).collect()}
    clustered = {r["doc_id"] for r in cl}
    canonical = {r["doc_id"] for r in cl if r["is_canonical"]}
    assert keep == (all_ids - clustered) | canonical
    # exactly one survivor per cluster
    assert len(canonical) == len({r["cluster_id"] for r in cl})


def test_simhash_pairs_match_brute_force(spark):
    """Manku bucket recall is exact by pigeonhole: the bucketed candidate
    pass must find EXACTLY the brute-force hamming<=K pairs."""
    sf = "/root/testdata/sf0.001"
    from miru_spark.ops.dedup import (
        SIM_HAMMING_K,
        dd_simhash,
        dd_simhash_pairs,
    )

    sigs = {
        r["doc_id"]: r["simhash"]
        for r in dd_simhash(spark, sf).collect()
    }
    ids = sorted(sigs)
    want = {
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(sigs[a] ^ sigs[b]).count("1") <= SIM_HAMMING_K
    }
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in dd_simhash_pairs(spark, sf).collect()
    }
    assert got == want
    assert len(got) > 0  # the corpus does contain near-dup fingerprints
