"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` -- flagship BM25 query through the real blocked-postings
engine at sf0.001. `queries()` / `oracle_sql()` -- one entry per
implemented operator from SURVEY.md §2 plus the training-data pipeline
operators; DuckDB verifies each at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _ensure_pyfiles(spark: SparkSession) -> None:
    """Ship miru_spark to executor workers (spark-submit --py-files
    equivalent) -- the driver may construct its own bare session."""
    try:
        from miru_spark.session import package_zip

        spark.sparkContext.addPyFile(package_zip())
    except Exception:
        pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build the real inverted index over sf0.001 documents and
    answer a conjunctive BM25 top-10 query."""
    _ensure_pyfiles(spark)
    from miru_spark.ops.fulltext_sql import ft_engine_bm25

    return ft_engine_bm25(spark, "/root/testdata/sf0.001")


def _all_ops() -> dict[str, tuple]:
    from miru_spark.ops import dedup, events_ops, fulltext_sql, gather_ops
    from miru_spark.ops import multimodal, readstate, similarity, textstats

    merged: dict[str, tuple] = {}
    for mod in (
        fulltext_sql,
        events_ops,
        gather_ops,
        readstate,
        dedup,
        similarity,
        textstats,
        multimodal,
    ):
        merged.update(mod.QUERIES)
    return merged


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ops = _all_ops()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_pyfiles(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, (fn, _sql) in ops.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_fn, sql) in _all_ops().items() if sql is not None
    }
