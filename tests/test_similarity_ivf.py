"""IVF ANN (`ann_ivf_topk`): oracle parity against DuckDB running the
same exact-integer coarse quantizer + float re-rank, and recall against
the exact brute-force top-k. Registry-equivalent rigor for an op the
50-entry driver gate has no slot for."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pytest

from miru_spark.ops import similarity

SF = "/root/testdata/sf0.01"


def _canon(pdf):
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == "float64":
            pdf[c] = pdf[c].round(6)
    return (
        pdf.sort_values(by=list(pdf.columns))
        .reset_index(drop=True)
        .astype(str)
    )


@pytest.fixture(scope="module")
def ivf_pdf(spark):
    return similarity.ann_ivf_topk(spark, SF).toPandas()


def test_ivf_matches_duckdb_oracle(ivf_pdf):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
    )
    want = con.execute(similarity.ANN_IVF_TOPK_SQL).fetchdf()
    got_c, want_c = _canon(ivf_pdf), _canon(want)
    assert list(got_c.columns) == list(want_c.columns)
    assert len(got_c) == len(want_c)
    assert got_c.equals(want_c)


def test_ivf_recall_vs_bruteforce(spark, ivf_pdf):
    exact = similarity.ann_cosine_topk(spark, SF).toPandas()
    recalls = []
    for qid in range(similarity.N_QUERIES):
        e = set(exact[exact.qid == qid].vid)
        g = set(ivf_pdf[ivf_pdf.qid == qid].vid)
        assert len(g) <= similarity.TOP_K
        recalls.append(len(e & g) / len(e))
    # nprobe=4 of 16 cells scans ~1/4 of the corpus; on the synthetic
    # near-uniform embeddings (worst case for IVF: no cluster structure)
    # the probed quarter still recovers a solid share of the exact top-k
    assert sum(recalls) / len(recalls) >= 0.4, recalls


def test_ivf_bounded_and_ranked(ivf_pdf):
    for qid, grp in ivf_pdf.groupby("qid"):
        assert list(grp.sort_values("rank")["rank"]) == list(
            range(1, len(grp) + 1)
        )
        cos = list(grp.sort_values("rank")["cosine"])
        assert cos == sorted(cos, reverse=True)
        assert qid not in set(grp.vid)
