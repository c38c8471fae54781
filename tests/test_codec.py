"""Varint/delta-gap codec: property-based round-trips (SURVEY.md §5)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from miru_spark.codec import (
    decode_postings,
    decode_varint,
    encode_postings,
    encode_varint,
)


@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500)
)
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.int64)
    assert decode_varint(encode_varint(arr)).tolist() == vals


@given(
    st.sets(st.integers(min_value=0, max_value=10**9), max_size=500)
)
@settings(max_examples=200, deadline=None)
def test_postings_roundtrip(ids):
    arr = np.array(sorted(ids), dtype=np.int64)
    assert decode_postings(encode_postings(arr)).tolist() == sorted(ids)


def test_empty():
    assert encode_varint(np.array([], dtype=np.int64)) == b""
    assert decode_varint(b"").size == 0
    assert encode_postings(np.array([], dtype=np.int64)) == b""
    assert decode_postings(b"").size == 0


def test_single_byte_values_compact():
    arr = np.arange(128, dtype=np.int64)
    assert len(encode_varint(arr)) == 128


def test_delta_gap_compresses_dense_runs():
    ids = np.arange(10_000, dtype=np.int64) * 2
    # gaps of 2 -> 1 byte each (plus the head)
    assert len(encode_postings(ids)) <= 10_001


def test_non_increasing_rejected():
    import pytest

    with pytest.raises(ValueError):
        encode_postings(np.array([3, 3], dtype=np.int64))
    with pytest.raises(ValueError):
        encode_postings(np.array([5, 2], dtype=np.int64))


def test_grouped_encoders_match_per_group():
    import numpy as np

    from miru_spark.codec import (
        encode_postings,
        encode_postings_grouped,
        encode_varint,
        encode_varint_grouped,
    )

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 1 << 40, size=997).astype(np.int64)
    cuts = np.sort(rng.choice(np.arange(1, 997), size=30, replace=False))
    starts = np.concatenate([[0], cuts])
    ends = np.concatenate([cuts, [997]])
    got = encode_varint_grouped(vals, starts, ends)
    want = [bytes(encode_varint(vals[s:e])) for s, e in zip(starts, ends)]
    assert got == want

    ids = np.cumsum(rng.integers(1, 50, size=997)).astype(np.int64)
    got_p = encode_postings_grouped(ids, starts, ends)
    want_p = [bytes(encode_postings(ids[s:e])) for s, e in zip(starts, ends)]
    assert got_p == want_p


# -- scoring accumulation: both probe directions vs a scalar reference ----

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=100, deadline=None)
@given(
    ids=st.lists(st.integers(0, 500), min_size=0, max_size=80, unique=True),
    matches=st.lists(st.integers(0, 500), min_size=1, max_size=80,
                     unique=True),
    idf=st.floats(0.1, 10.0),
)
def test_accumulate_term_directions_match_scalar(ids, matches, idf):
    import numpy as np

    from miru_spark.query.engine import _accumulate_term, _bm25_tf_part

    ids_a = np.array(sorted(ids), dtype=np.int64)
    m_a = np.array(sorted(matches), dtype=np.int64)
    tfs = (ids_a % 7 + 1).astype(np.int64)
    dls = (ids_a % 31 + 5).astype(np.int64)
    avgdl = 20.0

    want = np.zeros(m_a.size)
    pos_of = {int(v): i for i, v in enumerate(ids_a)}
    for i, mv in enumerate(m_a):
        j = pos_of.get(int(mv))
        if j is not None:
            want[i] = idf * _bm25_tf_part(
                float(tfs[j]), float(dls[j]), avgdl
            )

    got = np.zeros(m_a.size)
    _accumulate_term(got, m_a, ids_a, tfs, dls, idf, avgdl)
    assert np.allclose(got, want, rtol=0, atol=1e-12)

    # force the opposite direction by padding the other side
    if ids_a.size and ids_a.size != m_a.size:
        got2 = np.zeros(m_a.size)
        _accumulate_term(got2, m_a, ids_a, tfs, dls, idf, avgdl)
        assert np.array_equal(got, got2)
