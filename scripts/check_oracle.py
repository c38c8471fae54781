#!/usr/bin/env python
"""Local stand-in for the driver's CORRECTNESS gate.

Runs each __spark_entry__.queries() entry on Spark AND its oracle_sql()
on DuckDB at sf0.01, canonicalizes both frames the way the driver does
(columns sorted by name, rows sorted by all columns, values hashed) and
prints per-query row/schema/hash match.

    python scripts/check_oracle.py [name_substring ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _canon(pdf):
    import pandas as pd

    pdf = pdf.copy()
    pdf.columns = [c.lower() for c in pdf.columns]
    pdf = pdf[sorted(pdf.columns)]
    for c in pdf.columns:
        if pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].round(6)
    pdf = pdf.sort_values(list(pdf.columns), ignore_index=True)
    return pdf


def _hash(pdf) -> str:
    h = hashlib.md5()
    for c in pdf.columns:
        h.update(c.encode())
        h.update(pdf[c].astype(str).str.cat(sep="\x1f").encode())
    return h.hexdigest()


def main() -> None:
    import duckdb

    import __spark_entry__ as entry
    from miru_spark.session import get_spark

    pats = sys.argv[1:]
    qs = entry.queries()
    sqls = entry.oracle_sql()
    if pats:
        qs = {k: v for k, v in qs.items() if any(p in k for p in pats)}

    spark = get_spark(app_name="oracle_check", master="local[8]",
                      shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    n_bad = 0
    for name, fn in sorted(qs.items()):
        try:
            sdf = _canon(fn(spark, SF_DIR).toPandas())
            if name not in sqls:
                print(f"{name:28s} rows={len(sdf)} (no oracle: rows-only)")
                continue
            odf = _canon(con.execute(sqls[name]).fetchdf())
            rows = len(sdf) == len(odf)
            schema = list(sdf.columns) == list(odf.columns)
            hmatch = rows and schema and _hash(sdf) == _hash(odf)
            flag = "OK " if (rows and schema and hmatch) else "FAIL"
            if flag == "FAIL":
                n_bad += 1
            print(
                f"{name:28s} {flag} rows={len(sdf)}/{len(odf)} "
                f"schema={schema} hash={hmatch}"
            )
            if flag == "FAIL" and len(sdf) and len(odf):
                print("  spark:", sdf.head(3).to_dict("records"))
                print("  duck :", odf.head(3).to_dict("records"))
        except Exception as e:  # noqa: BLE001
            n_bad += 1
            print(f"{name:28s} ERR  {type(e).__name__}: {e}")
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
