"""Multi-tenancy: tenant-partitioned index directories with a hard wall
(MiruTenantId analog -- reference routes tenant -> partition set -> hosts;
here tenant -> its own index dir, so cross-tenant bytes are never read)."""

import math

import pytest

from miru_spark.oracle import OracleIndex
from miru_spark.tenancy import (
    TenantEngines,
    build_tenant_indexes,
    list_tenants,
)
from miru_spark.webtext import generate_rows

PARTITION_SECONDS = 3600


def _tenant_of(i: int) -> str:
    return f"acme{i % 2}"


@pytest.fixture(scope="module")
def corpora():
    rows = generate_rows(range(300))
    by_t: dict[str, list] = {}
    for i, r in enumerate(rows):
        r = dict(r)
        r["tenant"] = _tenant_of(i)
        by_t.setdefault(r["tenant"], []).append(r)
    return by_t


@pytest.fixture(scope="module")
def engines(spark, corpora, tmp_path_factory):
    from pyspark.sql import functions as F

    root = str(tmp_path_factory.mktemp("tenant_root"))
    allrows = [r for rs in corpora.values() for r in rs]
    wt = spark.createDataFrame(
        [(r["url"], r["warc_us"], r["html"], r["text"], r["lang"],
          r["tenant"]) for r in allrows],
        "url string, warc_us long, html binary, text string, lang string, "
        "tenant string",
    ).select("url", F.timestamp_micros("warc_us").alias("warc_ts"),
             "html", "text", "lang", "tenant")
    reports = build_tenant_indexes(
        spark, wt, root, partition_seconds=PARTITION_SECONDS, block_span=64
    )
    assert set(reports) == set(corpora)
    assert list_tenants(root) == sorted(corpora)
    return TenantEngines(spark, root)


def test_per_tenant_rank_identity(engines, corpora):
    for t, rows in corpora.items():
        oi = OracleIndex(rows, partition_seconds=PARTITION_SECONDS)
        got = engines.search_collect(t, "w000001 OR w000002", k=10)
        want = oi.search("w000001 OR w000002", k=10)
        assert got and [(p, d) for p, d, _s, _u in got] == [
            (p, d) for p, d, _s, _u in want
        ]
        for g, w in zip(got, want):
            assert math.isclose(g[2], w[2], rel_tol=0, abs_tol=1e-9)


def test_tenant_isolation(engines, corpora):
    # no url of tenant A ever appears in tenant B's results, and the
    # per-tenant BM25 stats differ (df/N are tenant-scoped)
    urls = {t: {r["url"] for r in rows} for t, rows in corpora.items()}
    for t in corpora:
        got = engines.search_collect(t, "w000001", k=50)
        assert got
        for _p, _d, _s, u in got:
            assert u in urls[t]
    a = engines.engine("acme0")
    b = engines.engine("acme1")
    assert a.n_docs + b.n_docs == 300
    assert a is not b and a.paths.root != b.paths.root


def test_sync_tenants_replicates_every_tenant(
    engines, corpora, spark, tmp_path
):
    """sync_tenants walks the multi-tenant root like the reference's
    per-tenant sync senders; each replica answers rank-identically and
    a re-sync copies nothing."""
    from miru_spark.index.sync import sync_tenants
    from miru_spark.tenancy import TenantEngines

    dst = str(tmp_path / "replica_root")
    rep = sync_tenants(spark, engines.root, dst)
    assert set(rep) == set(corpora)
    assert all(r["copied"] for r in rep.values())
    replica = TenantEngines(spark, dst)
    for t in corpora:
        assert replica.search_collect(
            t, "w000001 OR w000002", k=10
        ) == engines.search_collect(t, "w000001 OR w000002", k=10)
    rep2 = sync_tenants(spark, engines.root, dst)
    assert all(not r["copied"] and not r["removed"] for r in rep2.values())
    replica.close()


def test_unknown_tenant_raises(engines):
    with pytest.raises(KeyError):
        engines.engine("nosuch")


def test_null_tenant_rejected(spark, tmp_path):
    from pyspark.sql import functions as F

    wt = spark.createDataFrame(
        [("u1", 1704067200_000_000, "x", "en", None)],
        "url string, warc_us long, text string, lang string, tenant string",
    ).select("url", F.timestamp_micros("warc_us").alias("warc_ts"),
             F.lit(None).cast("binary").alias("html"),
             "text", "lang", "tenant")
    with pytest.raises(ValueError, match="NULL tenant"):
        build_tenant_indexes(spark, wt, str(tmp_path / "r"))


def test_bad_tenant_id_rejected(tmp_path):
    from miru_spark.tenancy import tenant_dir

    for bad in ("", "a/b", "../x"):
        with pytest.raises(ValueError):
            tenant_dir(str(tmp_path), bad)
