"""Baseline JPEG codec (miru_spark.jpeg): real entropy decode.

The decoder is exercised against genuine entropy-coded baseline
streams produced by the paired encoder: canonical Huffman tables via
DHT, byte stuffing, restart markers, 4:4:4 and 4:2:0 sampling, grey
single-component scans. With all-ones quantization the round-trip
error is bounded by DCT float rounding + YCbCr integer rounding (a few
levels), so assertions use tight tolerances rather than bit equality
(JPEG is lossy by construction).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from miru_spark import jpeg, media


def _rng(seed=0):
    return np.random.default_rng(seed)


def _maxerr(a, b):
    return int(np.abs(a.astype(int) - b.astype(int)).max())


def test_roundtrip_444_noise_tight():
    px = _rng(1).integers(0, 256, (33, 47, 3), dtype=np.uint8)
    out = jpeg.decode(jpeg.encode(px))
    assert out.shape == px.shape
    assert _maxerr(out, px) <= 3


def test_roundtrip_constant_and_gradient_exact():
    px = np.full((16, 24, 3), 130, dtype=np.uint8)
    assert _maxerr(jpeg.decode(jpeg.encode(px)), px) == 0
    x = np.linspace(0, 255, 40)
    g = np.meshgrid(x, np.linspace(0, 255, 24))[0].astype(np.uint8)
    px = np.stack([g, g, g], axis=2)
    assert _maxerr(jpeg.decode(jpeg.encode(px)), px) <= 1


def test_roundtrip_grey_component():
    g = _rng(2).integers(0, 256, (17, 9), dtype=np.uint8)
    out = jpeg.decode(jpeg.encode(g))
    assert out.shape == (17, 9, 3)
    assert _maxerr(out[:, :, 0], g) <= 2
    assert np.array_equal(out[:, :, 0], out[:, :, 1])


def test_roundtrip_420_subsampled():
    # constant-chroma image: 2x2 chroma averaging is lossless
    g = _rng(3).integers(0, 256, (30, 42), dtype=np.uint8)
    px = np.stack([g, g, g], axis=2)
    out = jpeg.decode(jpeg.encode(px, subsample=True))
    assert _maxerr(out, px) <= 2
    # smooth chroma: bounded by the 2x2 average + nearest upsample
    x = np.linspace(0, 255, 64)
    sm = np.meshgrid(x, x)
    px = np.dstack(
        [sm[0], sm[1], (sm[0] + sm[1]) / 2]
    ).astype(np.uint8)
    out = jpeg.decode(jpeg.encode(px, subsample=True))
    assert _maxerr(out, px) <= 8


def test_restart_markers():
    px = _rng(4).integers(0, 256, (33, 47, 3), dtype=np.uint8)
    for dri in (1, 3, 7):
        out = jpeg.decode(jpeg.encode(px, restart=dri))
        assert _maxerr(out, px) <= 3
    out = jpeg.decode(jpeg.encode(px, subsample=True, restart=2))
    assert out.shape == px.shape


def test_quantization_lossy_but_bounded():
    px = _rng(5).integers(0, 256, (24, 24, 3), dtype=np.uint8)
    out = jpeg.decode(jpeg.encode(px, quant=8))
    err = np.abs(out.astype(int) - px.astype(int))
    assert err.mean() < 8
    # heavier quant -> smaller file
    assert len(jpeg.encode(px, quant=8)) < len(jpeg.encode(px))


def test_jpeg_meta_agrees_with_decoder():
    px = _rng(6).integers(0, 256, (21, 37, 3), dtype=np.uint8)
    for kw in ({}, {"subsample": True}, {"restart": 2}):
        data = jpeg.encode(px, **kw)
        m = media.jpeg_meta(data)
        assert (m["width"], m["height"], m["channels"]) == (37, 21, 3)
        assert jpeg.decode(data).shape == (21, 37, 3)


def test_decode_rejects_unsupported_modes():
    px = _rng(7).integers(0, 256, (8, 8, 3), dtype=np.uint8)
    data = bytearray(jpeg.encode(px))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC3  # claim lossless (unsupported mode)
    with pytest.raises(ValueError):
        jpeg.decode(bytes(data))
    with pytest.raises(ValueError):
        jpeg.decode(b"\x89PNG1234")
    # a baseline stream merely RELABELED progressive is also malformed
    # (its single scan claims the whole band in one DC+AC pass)
    data[i + 1] = 0xC2
    with pytest.raises(ValueError):
        jpeg.decode(bytes(data))


# -- progressive (SOF2) -------------------------------------------------------

def test_progressive_equals_baseline_pixels():
    """The cross-codec invariant: progressive and baseline encodings of
    the same pixels carry identical quantized coefficients, so the two
    decode paths (which share no scan logic) must agree pixel-exactly."""
    rng = _rng(11)
    for shape, q, sub in [
        ((37, 53, 3), 1, False),
        ((37, 53, 3), 4, True),   # MCU-padded luma grid vs true extent
        ((24, 31), 1, False),     # grey single component
        ((8, 8, 3), 1, False),
        ((9, 10, 3), 7, True),
        ((64, 48, 3), 2, False),
    ]:
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        base = jpeg.decode(jpeg.encode(px, quant=q, subsample=sub))
        prog = jpeg.decode(
            jpeg.encode_progressive(px, quant=q, subsample=sub)
        )
        assert np.array_equal(base, prog), (shape, q, sub)


def test_progressive_smooth_image_eobrun_folding():
    # smooth gradients quantize to long zero runs -> multi-block EOB
    # runs with buffered correction bits in the refinement scan
    yy, xx = np.mgrid[0:50, 0:60]
    px = np.stack(
        [(yy * 2) % 256, (xx * 3) % 256, (yy + xx) % 256], axis=2
    ).astype(np.uint8)
    for q, sub in [(1, False), (5, True), (3, False)]:
        base = jpeg.decode(jpeg.encode(px, quant=q, subsample=sub))
        prog = jpeg.decode(
            jpeg.encode_progressive(px, quant=q, subsample=sub)
        )
        assert np.array_equal(base, prog), (q, sub)


def test_progressive_roundtrip_tight():
    # with all-ones quantization the full pipeline stays near-lossless
    px = _rng(13).integers(0, 256, (33, 47, 3), dtype=np.uint8)
    out = jpeg.decode(jpeg.encode_progressive(px, quant=1))
    assert out.shape == px.shape
    assert _maxerr(out, px) <= 2


def test_progressive_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(8, 40),
        h=st.integers(8, 40),
        q=st.integers(1, 8),
        sub=st.booleans(),
        seed=st.integers(0, 2**31 - 1),
    )
    def prop(w, h, q, sub, seed):
        px = np.random.default_rng(seed).integers(
            0, 256, (h, w, 3), dtype=np.uint8
        )
        base = jpeg.decode(jpeg.encode(px, quant=q, subsample=sub))
        prog = jpeg.decode(
            jpeg.encode_progressive(px, quant=q, subsample=sub)
        )
        assert np.array_equal(base, prog)

    prop()


def test_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 32),
        sub=st.booleans(),
        dri=st.sampled_from([0, 0, 2]),
        seed=st.integers(0, 2**31 - 1),
    )
    def prop(w, h, sub, dri, seed):
        g = np.random.default_rng(seed).integers(
            0, 256, (h, w), dtype=np.uint8
        )
        px = np.stack([g, g, g], axis=2)  # constant chroma
        out = jpeg.decode(jpeg.encode(px, subsample=sub, restart=dri))
        assert out.shape == px.shape
        assert _maxerr(out, px) <= 2

    prop()


def test_spark_jpeg_thumbnail(spark):
    from miru_spark.ops.multimodal import image_thumbnails

    px = _rng(8).integers(0, 256, (40, 60, 3), dtype=np.uint8)
    data = jpeg.encode(px)
    df = spark.createDataFrame(
        [(5, bytearray(data))], "id long, payload binary"
    )
    r = image_thumbnails(df, box=30).collect()[0]
    assert (r["out_w"], r["out_h"]) == (30, 20)
    want = media.resize_nearest(jpeg.decode(data), 30, 20)
    assert np.array_equal(media.png_decode(bytes(r["thumb"])), want)
