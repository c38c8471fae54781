"""Deterministic Common-Crawl-style `webtext` table generator.

Schema per BASELINE.json input_hint:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Generation is a pure function of (seed, row index) via counter-based Philox
streams (one stream per row), so any partitioning of the Spark range
produces identical rows -- the FIXTURES.md §1 requirement. Mirrors the
reference test corpus pattern (MiruFullTextNGTest.java:79-91,200-213: docs
drawn from a tiny dictionary) scaled up: Zipf(s=1.07) over a frozen
10,033-word dictionary whose head is the classic 33-word English stopword
list, LogNormal(5.0, 0.6) doc lengths clamped to [16, 4096].

The `html` column embeds `text` losslessly (paragraphs of 40 tokens) so the
extractor invariant (extract_text(html) == text, byte-identical) is
checkable per row.
"""

from __future__ import annotations

import numpy as np

from .analyzer import ENGLISH_STOPWORDS

SEED = 42
_BASE_TS_US = 1704067200_000_000  # 2024-01-01T00:00:00Z in micros
_STEP_US = 7_000_000  # 7s per row
_PARA_TOKENS = 40

# Frozen dictionary: 33 classic stopwords at the Zipf head, then w000000..
STOPWORD_LIST = sorted(ENGLISH_STOPWORDS)
VOCAB: list[str] = STOPWORD_LIST + [f"w{i:06d}" for i in range(10_000)]
_VOCAB_ARR = np.array(VOCAB)

_ranks = np.arange(1, len(VOCAB) + 1, dtype=np.float64)
_weights = _ranks ** -1.07
_CUMW = np.cumsum(_weights / _weights.sum())
_CUMW[-1] = 1.0


def _rng_for_row(i: int, seed: int = SEED) -> np.random.Generator:
    return np.random.Generator(
        np.random.Philox(key=[seed, 0xDA7A], counter=[0, 0, 0, int(i)])
    )


def _lang_for(u: float) -> str:
    if u < 0.90:
        return "en"
    if u < 0.95:
        return "de"
    if u < 0.98:
        return "fr"
    return "und"


def generate_row(i: int, seed: int = SEED) -> dict:
    """Generate webtext row i. Pure function of (seed, i)."""
    rng = _rng_for_row(i, seed)
    lang = _lang_for(float(rng.random()))
    length = int(np.clip(np.exp(rng.normal(5.0, 0.6)), 16, 4096))
    idx = np.searchsorted(_CUMW, rng.random(length), side="right")
    tokens = _VOCAB_ARR[np.minimum(idx, len(VOCAB) - 1)]
    text = " ".join(tokens.tolist())
    paras = [
        " ".join(tokens[j : j + _PARA_TOKENS].tolist())
        for j in range(0, length, _PARA_TOKENS)
    ]
    html = (
        f"<html><head><title>Page {i}</title></head><body><p>"
        + "</p><p>".join(paras)
        + "</p></body></html>"
    ).encode("utf-8")
    return {
        "url": f"https://site{i % 499}.example/{lang}/page/{i}",
        "warc_us": _BASE_TS_US + i * _STEP_US,
        "html": html,
        "text": text,
        "lang": lang,
    }


def generate_rows(indices, seed: int = SEED) -> list[dict]:
    return [generate_row(int(i), seed) for i in indices]


def webtext_df(
    spark,
    n: int,
    seed: int = SEED,
    parallelism: int | None = None,
    start: int = 0,
):
    """Distributed deterministic webtext DataFrame of rows [start, start+n).

    `start` slices the same deterministic corpus: webtext_df(s, N) equals
    the concat of webtext_df(s, b, start=i*b) batches -- crawl micro-batch
    simulation for sip/compaction tests."""
    import pyarrow as pa
    from pyspark.sql import functions as F

    out_schema = (
        "url string, warc_us long, html binary, text string, lang string"
    )

    def gen(batches):
        for batch in batches:
            ids = batch.column("id").to_numpy()
            rows = generate_rows(ids, seed)
            yield pa.RecordBatch.from_pylist(
                rows,
                schema=pa.schema(
                    [
                        ("url", pa.string()),
                        ("warc_us", pa.int64()),
                        ("html", pa.binary()),
                        ("text", pa.string()),
                        ("lang", pa.string()),
                    ]
                ),
            )

    rng_df = spark.range(
        start,
        start + n,
        1,
        parallelism or spark.sparkContext.defaultParallelism,
    )
    df = rng_df.mapInArrow(gen, out_schema)
    return (
        df.withColumn("warc_ts", F.timestamp_micros("warc_us"))
        .drop("warc_us")
        .select("url", "warc_ts", "html", "text", "lang")
    )
