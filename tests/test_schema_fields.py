"""Schema-declared extra fields (MiruSchema analog): build_index's
`extra_fields` declaration indexes the input's `fields` map column as
composed filter-only terms -- queryable via field:value syntax, prefix
expansion, and the facet machinery, on both engine paths."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest
from pyspark.sql import functions as F

from miru_spark.fields import FIELD_SEP
from miru_spark.index.build import build_index
from miru_spark.query.engine import SearchEngine

N = 120


def _corpus(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(N)
    return docs.select(
        F.format_string("doc%08d", F.col("doc_id")).alias("url"),
        F.timestamp_micros(
            F.lit(1704067200_000_000)
            + F.col("doc_id").cast("long") * 1_000_000
        ).alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        "text",
        F.lit("und").alias("lang"),
        F.create_map(
            F.lit("user"),
            F.array(F.format_string("u%02d", F.col("doc_id") % 12)),
            F.lit("item"),
            F.array(F.format_string("i%02d", (F.col("doc_id") / 3).cast("long") % 7)),
        ).alias("fields"),
    )


@pytest.fixture(scope="module")
def xf_engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("xf_idx"))
    build_index(
        spark, _corpus(spark), d,
        partition_seconds=10**9, block_span=64,
        extra_fields=["user", "item"],
    )
    return SearchEngine(spark, d)


def test_extra_field_terms_indexed_and_queryable(xf_engine):
    eng = xf_engine
    # term dictionary carries the composed values
    assert eng.expand_prefix(f"user{FIELD_SEP}") == [
        f"user{FIELD_SEP}u{i:02d}" for i in range(12)
    ]
    # field:value search, both paths, == the defining modulo
    expect = sorted(d for d in range(N) if d % 12 == 5)
    got = sorted(
        r["doc_id"] for r in eng.search("user:u05", k=N).collect()
    )
    assert got == expect
    assert eng.count("user:u05") == len(expect)
    assert eng.count("user:u05", local=False) == len(expect)


def test_extra_fields_compose_with_text_and_facets(xf_engine):
    eng = xf_engine
    # distincts over one extra field constrained by another
    dist = dict(eng.distincts("item", query="user:u05"))
    expect: dict = {}
    for d in range(N):
        if d % 12 == 5:
            v = f"i{(d // 3) % 7:02d}"
            expect[v] = expect.get(v, 0) + 1
    assert dist == expect
    assert dict(
        eng.distincts("item", query="user:u05", local=False)
    ) == expect


def test_resume_inherits_extra_fields(spark, tmp_path):
    d = str(tmp_path / "idx")
    build_index(
        spark, _corpus(spark), d,
        partition_seconds=10**9, block_span=64,
        extra_fields=["user"],
    )
    # a resume append with extra_fields=None inherits ["user"]; an
    # explicit conflicting declaration is rejected (meta mismatch)
    build_index(spark, _corpus(spark), d, partition_seconds=10**9,
                block_span=64)
    with pytest.raises(ValueError, match="meta mismatch"):
        build_index(
            spark, _corpus(spark), d,
            partition_seconds=10**9, block_span=64,
            extra_fields=["user", "item"],
        )


def test_plain_index_unaffected(spark, tmp_path):
    # no declaration -> identical meta shape to before (extra_fields=[])
    import json

    d = str(tmp_path / "plain")
    build_index(
        spark, _corpus(spark).drop("fields"), d,
        partition_seconds=10**9, block_span=64,
    )
    with open(os.path.join(d, "meta.json")) as f:
        meta = json.load(f)
    assert meta["extra_fields"] == []
    eng = SearchEngine(spark, d)
    assert eng.expand_prefix(f"user{FIELD_SEP}") == []
