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


def test_registry_within_driver_cap():
    """The driver's CORRECTNESS gate checks at most 50 entries (r02
    registered 54, checked exactly the first 50 -- the tail silently
    fell off). Batch families (tx_profile, mm_pipeline) keep us under."""
    names = list(entrymod.queries())
    assert len(names) <= 50, (
        f"{len(names)} registered entries exceed the driver's 50-entry "
        f"gate; batch or prune: {names[50:]}"
    )
    assert set(entrymod.oracle_sql()) <= set(names)


# The per-op tx_*/mm_* functions left the driver registry (batched into
# tx_profile/mm_pipeline) but keep their individual DuckDB parity here.
def _retired_pairs():
    from miru_spark.ops import dedup as dd
    from miru_spark.ops import events_ops as eo
    from miru_spark.ops import fulltext_sql as ft
    from miru_spark.ops import gather_ops as go
    from miru_spark.ops import multimodal as mm
    from miru_spark.ops import textstats as tx

    return {
        # retired r3: slot given to ft_engine_waveform; OR-path engine
        # semantics remain driver-gated by ft_engine_bm25_or
        "ft_disjunctive": (ft.ft_disjunctive, ft.FT_DISJUNCTIVE_SQL),
        # retired r5: slot given to ft_engine_distincts_wide (streamed
        # uncapped facet enumeration); conjunctive BM25 stays
        # driver-gated by ft_engine_bm25 (the REAL engine's AND path)
        "ft_bm25_and_topk": (ft.ft_bm25_and_topk, ft.FT_BM25_AND_SQL),
        "tx_token_count": (tx.tx_token_count, tx.TX_TOKEN_COUNT_SQL),
        "tx_quality": (tx.tx_quality, tx.TX_QUALITY_SQL),
        "tx_langid": (tx.tx_langid, tx.TX_LANGID_SQL),
        "tx_fingerprint": (tx.tx_fingerprint, tx.TX_FINGERPRINT_SQL),
        "mm_decode_meta": (mm.mm_decode_meta, mm.MM_DECODE_META_SQL),
        "mm_frame_sample": (mm.mm_frame_sample, mm.MM_FRAME_SAMPLE_SQL),
        "mm_resize_plan": (mm.mm_resize_plan, mm.MM_RESIZE_PLAN_SQL),
        "mm_audio_windows": (mm.mm_audio_windows, mm.MM_AUDIO_WINDOWS_SQL),
        # retired r4: slots given to the engine-backed reco plugin
        # family (ft_engine_features/reco/strut/inbox); the event-table
        # re-expressions keep their DuckDB parity here
        "ev_gather_features": (
            go.ev_gather_features, go.EV_GATHER_FEATURES_SQL),
        "ev_strut_score": (go.ev_strut_score, go.EV_STRUT_SCORE_SQL),
        "ev_inbox_aggregate_counts": (
            go.ev_inbox_aggregate_counts, go.EV_INBOX_AGG_COUNTS_SQL),
        "ev_reco_cofilter": (
            eo.ev_reco_cofilter, eo.EV_RECO_COFILTER_SQL),
        # retired r4 (late): slot given to ft_engine_stumptown (the
        # engine's one-pass waveform + newest-k)
        "ev_anomaly_newest": (
            eo.ev_anomaly_newest, eo.EV_ANOMALY_NEWEST_SQL),
        # retired r4 (late): slot given to dd_cluster; the signatures
        # stay pair-verified transitively in-registry AND directly here
        "dd_minhash_sig": (dd.dd_minhash_sig, dd.DD_MINHASH_SIG_SQL),
    }


@pytest.mark.parametrize("name", sorted(_retired_pairs()))
def test_retired_per_op_matches_oracle(spark, name):
    fn, sql = _retired_pairs()[name]
    sdf = fn(spark, SF_DIR)
    s_cols, s_vals = _normalize(sdf.columns, [tuple(r) for r in sdf.collect()])
    res = _duck(SF_DIR).execute(sql)
    o_cols, o_vals = _normalize(
        [d[0] for d in res.description], res.fetchall()
    )
    assert s_cols == o_cols
    assert s_vals == o_vals
