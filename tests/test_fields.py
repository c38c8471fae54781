"""Property tests for field-scoped term composition (fields.py), the
MiruTermComposer analog: order-preserving numeric encoding and composed
terms' non-collision with analyzer output."""

import os
import sys

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from miru_spark.fields import (
    FIELD_SEP,
    compose,
    compose_value,
    decode_num,
    doc_field_terms,
    encode_num,
)

I64 = st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1)


@given(I64)
@settings(max_examples=200)
def test_encode_decode_roundtrip(v):
    assert decode_num(encode_num(v)) == v


@given(I64, I64)
@settings(max_examples=200)
def test_encoding_is_order_preserving(a, b):
    # lexicographic compare of encodings == numeric compare of values,
    # which is what makes a numeric range a term-dictionary range scan
    assert (encode_num(a) < encode_num(b)) == (a < b)
    assert len(encode_num(a)) == len(encode_num(b))  # fixed width


def test_out_of_range_rejected():
    with pytest.raises(ValueError):
        encode_num(1 << 63)
    with pytest.raises(ValueError):
        encode_num(-(1 << 63) - 1)


def test_composed_terms_cannot_collide_with_text_tokens():
    # the analyzer never emits \x1f, so composed terms live in a disjoint
    # region of the shared posting space
    from miru_spark.analyzer import analyze

    t = compose_value("site", 42)
    assert FIELD_SEP in t
    toks = analyze("site 42 lang en doclen 7 " + t.replace(FIELD_SEP, " "))
    assert all(FIELD_SEP not in tok for tok in toks)


def test_doc_field_terms_shape():
    terms = doc_field_terms("https://site37.example/en/page/1", "EN", 12)
    assert compose("lang", "en") in terms
    assert compose("site", encode_num(37)) in terms
    assert compose("doclen", encode_num(12)) in terms


def test_extra_field_terms_declared_only_dedup_casefold():
    from miru_spark.fields import extra_field_terms

    fm = {
        "user": ["U01", "u01"],          # case-folded dedupe
        "item": ["i05", "i02"],
        "undeclared": ["x"],             # not in the schema declaration
    }
    terms = extra_field_terms(fm, ["user", "item"])
    assert terms == [
        compose("user", "u01"),
        compose("item", "i02"),
        compose("item", "i05"),
    ]
    # pyarrow map columns decode to key/value tuple lists
    terms2 = extra_field_terms(
        [("user", ["U01", "u01"]), ("item", ["i05", "i02"])],
        ["user", "item"],
    )
    assert terms2 == terms
    assert extra_field_terms(None, ["user"]) == []
    assert extra_field_terms({}, ["user"]) == []
