"""Driver-mimic correctness gate: run every queries() entry on Spark and
its oracle_sql() on DuckDB over the same parquet tables; compare row count,
column names, and order-insensitive values (floats pre-rounded by the
queries themselves). This is a local replica of the driver's
CORRECTNESS_r{N}.json check."""

import datetime
import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("MIRU_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 6)
    except Exception:
        pass
    return v


def _normalize(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in idx) for r in rows]
    return sorted(cols), sorted(out, key=repr)


QUERY_NAMES = sorted(entrymod.queries())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, name):
    q = entrymod.queries()[name]
    sqls = entrymod.oracle_sql()
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if name not in sqls:
        assert len(srows) >= 0  # rows-only check
        return
    con = _duck(SF_DIR)
    res = con.execute(sqls[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    s_cols, s_vals = _normalize(scols, srows)
    o_cols, o_vals = _normalize(ocols, orows)
    assert s_cols == o_cols, f"{name}: columns {s_cols} vs {o_cols}"
    assert len(s_vals) == len(o_vals), (
        f"{name}: row count {len(s_vals)} vs {len(o_vals)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_vals, o_vals) if a != b
    ][:5]
    assert not mismatches, f"{name}: value mismatches {mismatches}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["doc_id", "score"]
