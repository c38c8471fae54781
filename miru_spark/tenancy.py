"""Multi-tenancy: tenant as a first-class partition dimension.

The reference threads `MiruTenantId` through every API call and maps each
tenant to its own partition set hosted on its replica hosts
(miru-api/.../activity/MiruActivity.java:36 tenantId field;
MiruPartitionId per tenant, the cluster registry routing tenant ->
partitions -> hosts). The Spark-native analog is directory-level tenant
partitioning -- the same layout Hive/Iceberg partition-by-tenant gives:

    <root>/t=<tenant>/   one complete index per tenant

so every per-tenant read prunes to its own directory (no cross-tenant
bytes are ever scanned -- stronger isolation than a tenant filter
column), tenants build/resume/repair independently, and per-tenant
engines hold per-tenant snapshots. Authz masks (query/engine.py) handle
intra-tenant access control; tenancy handles the hard wall.

Scale note: tenants are registry-bounded (the reference keeps the tenant
registry in Amza), so the driver-side tenant enumeration here is
metadata-sized. Builds loop tenants sequentially for deterministic
lineage; a real deployment fans tenant builds out as independent jobs --
each call is already a self-contained `build_index`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .index.build import DEFAULT_BLOCK_SPAN, DEFAULT_PARTITION_SECONDS
from .query.engine import SearchEngine

_TDIR = "t="


def tenant_dir(root: str, tenant: str) -> str:
    t = str(tenant)
    if not t or "/" in t or t.startswith("."):
        raise ValueError(f"invalid tenant id: {tenant!r}")
    return os.path.join(root, f"{_TDIR}{t}")


def list_tenants(root: str) -> list[str]:
    if not os.path.isdir(root):
        return []
    return sorted(
        d[len(_TDIR):]
        for d in os.listdir(root)
        if d.startswith(_TDIR)
        and os.path.isdir(os.path.join(root, d))
    )


def build_tenant_indexes(
    spark: SparkSession,
    webtext: DataFrame,
    root: str,
    tenant_col: str = "tenant",
    partition_seconds: int = DEFAULT_PARTITION_SECONDS,
    block_span: int = DEFAULT_BLOCK_SPAN,
    **build_kw,
) -> dict:
    """Build (or resume) one index per distinct tenant in `webtext`.
    Returns {tenant: BuildReport}. Rows with NULL tenant are rejected --
    the reference requires a tenantId on every activity."""
    from .index.build import build_index

    if tenant_col not in webtext.columns:
        raise ValueError(f"input has no {tenant_col!r} column")
    n_null = webtext.filter(F.col(tenant_col).isNull()).limit(1).count()
    if n_null:
        raise ValueError("rows with NULL tenant id are not indexable")
    tenants = sorted(
        str(r[0])
        for r in webtext.select(tenant_col).distinct().collect()
    )
    # validate EVERY tenant id before building ANY: a bad id failing
    # mid-loop would abandon earlier tenants' minutes of build work in a
    # state the caller cannot distinguish from a crash
    dirs = {t: tenant_dir(root, t) for t in tenants}
    reports = {}
    for t in tenants:
        sub = webtext.filter(F.col(tenant_col) == t).drop(tenant_col)
        reports[t] = build_index(
            spark,
            sub,
            dirs[t],
            partition_seconds=partition_seconds,
            block_span=block_span,
            **build_kw,
        )
    return reports


class TenantEngines:
    """Lazy per-tenant SearchEngine registry over a tenant-partitioned
    index root (the MiruTenantId -> hosted partitions routing step).
    Engines are constructed on first use and cached; each holds its own
    snapshot, postings cache, and tombstone state -- nothing is shared
    across the tenant wall."""

    def __init__(self, spark: SparkSession, root: str, **engine_kw):
        self.spark = spark
        self.root = root
        self._engine_kw = engine_kw
        self._engines: dict[str, SearchEngine] = {}

    def tenants(self) -> list[str]:
        return list_tenants(self.root)

    def engine(self, tenant: str) -> SearchEngine:
        t = str(tenant)
        eng = self._engines.get(t)
        if eng is None:
            d = tenant_dir(self.root, t)
            if not os.path.isdir(d):
                raise KeyError(f"unknown tenant: {tenant!r}")
            eng = SearchEngine(self.spark, d, **self._engine_kw)
            self._engines[t] = eng
        return eng

    def search(self, tenant: str, query: str, k: int = 10, **kw):
        return self.engine(tenant).search(query, k=k, **kw)

    def search_collect(self, tenant: str, query: str, k: int = 10, **kw):
        return self.engine(tenant).search_collect(query, k=k, **kw)

    def close(self) -> None:
        for eng in self._engines.values():
            eng.close()
        self._engines.clear()
