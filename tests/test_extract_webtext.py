"""Extractor invariant + generator determinism (BASELINE.json input_hint:
byte-identical extracted text per url; FIXTURES.md §1)."""

import numpy as np

from miru_spark.extract import extract_text
from miru_spark.webtext import SEED, VOCAB, generate_row, generate_rows


def test_extract_byte_identical_over_sample():
    for i in range(0, 3000, 7):
        r = generate_row(i)
        assert extract_text(r["html"]) == r["text"], f"row {i}"


def test_extract_edge_cases():
    assert extract_text(None) == ""
    assert extract_text(b"") == ""
    assert extract_text(b"no tags at all") == "no tags at all"
    assert extract_text(b"<html><body><p>a  b</p></body></html>") == "a b"
    assert (
        extract_text(b"<body><script>var x=1;</script>hi</body>") == "hi"
    )
    assert extract_text(b"<body>a &amp; b</body>") == "a & b"


def test_generator_deterministic_and_partition_independent():
    a = generate_rows([5, 10, 99])
    b = [generate_row(10), generate_row(5), generate_row(99)]
    assert a[0] == b[1] and a[1] == b[0] and a[2] == b[2]


def test_generator_shape():
    r = generate_row(123, seed=SEED)
    n_tokens = len(r["text"].split(" "))
    assert 16 <= n_tokens <= 4096
    assert r["lang"] in ("en", "de", "fr", "und")
    assert r["url"].endswith("/page/123")
    assert set(r["text"].split(" ")) <= set(VOCAB)


def test_lang_mix_roughly_matches_spec():
    langs = [generate_row(i)["lang"] for i in range(2000)]
    frac_en = langs.count("en") / len(langs)
    assert 0.85 < frac_en < 0.95


def test_zipf_head_is_stopwords():
    """Stopwords sit at the Zipf head -> head-term skew is observable."""
    from collections import Counter

    c = Counter()
    for i in range(300):
        c.update(generate_row(i)["text"].split(" "))
    top10 = {t for t, _ in c.most_common(10)}
    from miru_spark.analyzer import ENGLISH_STOPWORDS

    assert len(top10 & ENGLISH_STOPWORDS) >= 8
