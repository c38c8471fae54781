"""Real media decode (miru_spark.media) + the multimodal pipeline over
GENUINE payloads.

The decode step of the multimodal pipeline was a declared stub while no
codec libs existed in the sandbox; these tests pin that it is now REAL
for every format the standard library can parse: PNG round-trips
pixel-exactly through encode -> decode across all implemented scanline
filters, JPEG/GIF/BMP metadata comes from real marker/block walks over
hand-constructed byte streams, WAV PCM round-trips through the stdlib
reader, and the Spark stages (decode_binary_meta / audio_rms_windows /
image_thumbnails) produce the same answers over a binary column as the
pure functions do locally. Unrecognized payloads still take the
deterministic fallback, preserving the DuckDB oracle for mm_pipeline.
"""

import os
import struct
import sys
import zlib

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from miru_spark import media


def _rng(seed=7):
    return np.random.default_rng(seed)


# -- PNG ---------------------------------------------------------------------

@pytest.mark.parametrize("ch", [1, 2, 3, 4])
@pytest.mark.parametrize("ftype", [0, 1, 2])
def test_png_roundtrip_pixel_exact(ch, ftype):
    px = _rng(ch * 10 + ftype).integers(0, 256, (13, 17, ch), dtype=np.uint8)
    data = media.png_encode(px, filter_type=ftype)
    meta = media.png_meta(data)
    assert (meta["width"], meta["height"], meta["channels"]) == (17, 13, ch)
    out = media.png_decode(data)
    assert out.shape == px.shape
    assert np.array_equal(out, px)


def test_png_average_and_paeth_filters_decode():
    """Rows filtered with Average (3) and Paeth (4) -- built by hand so
    the decoder's full unfilter matrix is exercised, not just what our
    encoder emits."""
    w, h, ch = 5, 4, 3
    px = _rng(42).integers(0, 256, (h, w, ch), dtype=np.int16)
    stride = w * ch
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int16)
    for y, ftype in zip(range(h), (0, 3, 4, 3)):
        line = px[y].reshape(-1)
        enc = np.zeros(stride, dtype=np.int16)
        rec = np.zeros(stride, dtype=np.int16)
        for x in range(stride):
            left = rec[x - ch] if x >= ch else 0
            up = prev[x]
            ul = prev[x - ch] if x >= ch else 0
            if ftype == 0:
                pred = 0
            elif ftype == 3:
                pred = (left + up) >> 1
            else:
                pred = media._paeth(int(left), int(up), int(ul))
            enc[x] = (line[x] - pred) & 0xFF
            rec[x] = line[x]
        raw.append(ftype)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = line.copy()

    def chunk(typ, body):
        return (
            struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    )
    assert np.array_equal(media.png_decode(data), px.astype(np.uint8))


def test_png_palette_resolves_to_rgb():
    pal = _rng(3).integers(0, 256, (4, 3), dtype=np.uint8)
    idx = _rng(4).integers(0, 4, (6, 7), dtype=np.uint8)

    def chunk(typ, body):
        return (
            struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    raw = bytearray()
    for y in range(6):
        raw.append(0)
        raw.extend(idx[y].tobytes())
    ihdr = struct.pack(">IIBBBBB", 7, 6, 8, 3, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", pal.tobytes())
        + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    )
    out = media.png_decode(data)
    assert out.shape == (6, 7, 3)
    assert np.array_equal(out, pal[idx])


def test_png_rejects_garbage():
    assert media.png_meta(b"not a png") is None
    with pytest.raises(ValueError):
        media.png_decode(b"\x89PNG\r\n\x1a\n" + b"\x00" * 40)


def test_png_roundtrip_property():
    """Property sweep: random dims x channels x filter types round-trip
    pixel-exactly (hypothesis-style, deterministic seeds)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 25),
        ch=st.sampled_from([1, 2, 3, 4]),
        ftype=st.sampled_from([0, 1, 2]),
        seed=st.integers(0, 2**31 - 1),
    )
    def prop(w, h, ch, ftype, seed):
        px = np.random.default_rng(seed).integers(
            0, 256, (h, w, ch), dtype=np.uint8
        )
        assert np.array_equal(
            media.png_decode(media.png_encode(px, filter_type=ftype)), px
        )

    prop()


# -- JPEG / GIF / BMP headers --------------------------------------------------

def _tiny_jpeg(w, h, ncomp=3):
    """SOI + APP0 + DQT(fake) + SOF0 header bytes (no entropy data)."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    dqt = b"\xff\xdb" + struct.pack(">H", 5) + b"\x00\x01\x02"
    sof = (
        b"\xff\xc0"
        + struct.pack(">H", 8 + 3 * ncomp)
        + b"\x08"
        + struct.pack(">HH", h, w)
        + bytes([ncomp])
        + b"\x01\x11\x00" * ncomp
    )
    return b"\xff\xd8" + app0 + dqt + sof


def test_jpeg_meta_real_marker_walk():
    m = media.jpeg_meta(_tiny_jpeg(640, 480))
    assert (m["width"], m["height"], m["channels"]) == (640, 480, 3)
    m = media.jpeg_meta(_tiny_jpeg(31, 7, ncomp=1))
    assert (m["width"], m["height"], m["channels"]) == (31, 7, 1)
    assert media.jpeg_meta(b"\xff\xd8\xff\xd9") is None  # EOI before SOF
    assert media.jpeg_meta(b"GIF89a??") is None


def _tiny_gif(w, h, n_frames):
    out = b"GIF89a" + struct.pack("<HH", w, h) + bytes([0x00, 0, 0])
    for _ in range(n_frames):
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out += b"\x02"  # LZW min code size
        out += b"\x01\x00"  # one 1-byte sub-block
        out += b"\x00"  # block terminator
    return out + b"\x3b"


def test_gif_meta_counts_frames():
    m = media.gif_meta(_tiny_gif(12, 34, 3))
    assert (m["width"], m["height"], m["n_frames"]) == (12, 34, 3)
    m = media.gif_meta(_tiny_gif(1, 1, 1))
    assert m["n_frames"] == 1
    assert media.gif_meta(b"GIF00a" + b"\x00" * 20) is None


def test_bmp_meta():
    hdr = b"BM" + b"\x00" * 16 + struct.pack("<ii", 320, -240) + b"\x00" * 4
    m = media.bmp_meta(hdr)
    assert (m["width"], m["height"]) == (320, 240)


def test_gif_lzw_pixel_roundtrip():
    """Full LZW decode: indexed frames -> GIF bytes -> pixel-exact RGB."""
    pal = _rng(11).integers(0, 256, (7, 3), dtype=np.uint8)
    f1 = _rng(12).integers(0, 7, (9, 14), dtype=np.uint8)
    f2 = _rng(13).integers(0, 7, (9, 14), dtype=np.uint8)
    data = media.gif_encode_indexed([f1, f2], pal, 14, 9)
    m = media.gif_meta(data)
    assert (m["width"], m["height"], m["n_frames"]) == (14, 9, 2)
    frames = media.gif_decode(data)
    assert len(frames) == 2
    for fr, idx in zip(frames, (f1, f2)):
        assert (fr["width"], fr["height"]) == (14, 9)
        assert np.array_equal(fr["pixels"], pal[idx.astype(np.int32)])


def test_gif_interlaced_deinterlaces():
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    idx = (np.arange(80).reshape(10, 8) % 2).astype(np.uint8)
    data = media.gif_encode_indexed([idx], pal, 8, 10, interlace=True)
    fr = media.gif_decode(data)[0]
    assert np.array_equal(fr["pixels"], pal[idx.astype(np.int32)])


def test_gif_lzw_table_growth_and_clear():
    """A long low-entropy stream forces code-width growth past 9 bits
    and (at 4096 entries) a mid-stream clear; decode stays exact."""
    pal = _rng(21).integers(0, 256, (4, 3), dtype=np.uint8)
    idx = (
        _rng(22).integers(0, 4, 70000, dtype=np.uint8).reshape(200, 350)
    )
    data = media.gif_encode_indexed([idx], pal, 350, 200)
    fr = media.gif_decode(data)[0]
    assert np.array_equal(fr["pixels"], pal[idx.astype(np.int32)])


def test_gif_lzw_property_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        w=st.integers(1, 30),
        h=st.integers(1, 20),
        ncol=st.integers(2, 16),
        seed=st.integers(0, 2**31 - 1),
    )
    def prop(w, h, ncol, seed):
        rng = np.random.default_rng(seed)
        pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        idx = rng.integers(0, ncol, (h, w), dtype=np.uint8)
        fr = media.gif_decode(
            media.gif_encode_indexed([idx], pal, w, h)
        )[0]
        assert np.array_equal(fr["pixels"], pal[idx.astype(np.int32)])

    prop()


# -- WAV -----------------------------------------------------------------------

def test_wav_roundtrip_and_rms():
    rate = 8000
    t = np.arange(rate * 3) / rate  # 3 s
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    data = media.wav_encode(sig, rate)
    meta = media.wav_meta(data)
    assert meta["sample_rate"] == rate
    assert meta["duration_ms"] == 3000
    r2, nch, out = media.wav_decode(data)
    assert (r2, nch) == (rate, 1)
    assert np.allclose(out[:, 0], sig, atol=1.0 / 32767)
    wins = media.rms_windows(out, rate, 1000, 500)
    # 3 s, 1 s window, 0.5 s hop -> starts at 0..2000 ms
    assert [(s, e) for s, e, _ in wins] == [
        (0, 1000), (500, 1500), (1000, 2000), (1500, 2500), (2000, 3000)
    ]
    # RMS of a 0.5-amplitude sine is 0.5/sqrt(2)
    for _s, _e, r in wins:
        assert abs(r - 0.5 / np.sqrt(2)) < 1e-3


def test_spectral_windows_find_the_tone():
    """A 440 Hz sine's centroid and dominant bin land on 440 Hz."""
    rate = 8000
    t = np.arange(rate * 2) / rate
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    wins = media.spectral_windows(sig, rate, 1000, 500)
    assert len(wins) == 3
    for _s, _e, rms, centroid, dominant in wins:
        assert abs(rms - 0.5 / np.sqrt(2)) < 1e-3
        assert abs(dominant - 440.0) < 2.0
        assert abs(centroid - 440.0) < 10.0
    # two tones: dominant picks the louder, centroid sits between
    sig2 = 0.5 * np.sin(2 * np.pi * 300 * t) + 0.2 * np.sin(
        2 * np.pi * 1200 * t
    )
    _s, _e, _r, centroid, dominant = media.spectral_windows(
        sig2, rate, 1000, 1000
    )[0]
    assert abs(dominant - 300.0) < 2.0
    assert 300.0 < centroid < 1200.0


def test_spark_spectral_audio(spark):
    from miru_spark.ops.multimodal import audio_rms_windows

    rate = 8000
    t = np.arange(rate * 2) / rate
    wav = media.wav_encode(0.4 * np.sin(2 * np.pi * 660 * t), rate)
    df = spark.createDataFrame(
        [(1, bytearray(wav))], "id long, payload binary"
    )
    rows = audio_rms_windows(df, spectral=True).collect()
    assert len(rows) == 3
    for r in rows:
        assert abs(r["dominant_hz"] - 660.0) < 2.0
        assert abs(r["rms"] - 0.4 / np.sqrt(2)) < 1e-3


def test_sniff_meta_dispatch():
    png = media.png_encode(np.zeros((2, 3, 3), np.uint8))
    assert media.sniff_meta(png)["format"] == "png"
    assert media.sniff_meta(_tiny_jpeg(9, 9))["format"] == "jpeg"
    assert media.sniff_meta(_tiny_gif(2, 2, 2))["format"] == "gif"
    wav = media.wav_encode(np.zeros(100), 1000)
    m = media.sniff_meta(wav)
    assert m["format"] == "wav" and m["n_frames"] == 100
    assert media.sniff_meta(b"plain text payload") is None
    assert media.sniff_meta(b"") is None


def test_resize_nearest_exact():
    px = np.arange(24, dtype=np.uint8).reshape(4, 6)
    out = media.resize_nearest(px, 3, 2)
    assert out.shape == (2, 3)
    assert np.array_equal(out, px[[0, 2]][:, [0, 2, 4]])
    up = media.resize_nearest(px, 12, 8)
    assert up.shape == (8, 12)
    assert np.array_equal(up[::2, ::2], px)


# -- Spark stages over genuine payloads ----------------------------------------

def test_spark_decode_binary_meta_real_payloads(spark):
    from miru_spark.ops.multimodal import decode_binary_meta

    png = media.png_encode(
        _rng(1).integers(0, 256, (48, 64, 3), dtype=np.uint8)
    )
    wav = media.wav_encode(np.zeros(16000), 16000)
    gif = _tiny_gif(10, 20, 4)
    rows = [
        (1, bytearray(png)),
        (2, bytearray(wav)),
        (3, bytearray(gif)),
        (4, bytearray(b"not media at all")),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    got = {
        r["id"]: r.asDict()
        for r in decode_binary_meta(df).collect()
    }
    assert got[1]["format"] == "png"
    assert (got[1]["width"], got[1]["height"]) == (64, 48)
    assert got[2]["format"] == "wav"
    assert got[2]["duration_ms"] == 1000
    assert got[2]["sample_rate"] == 16000
    assert got[3]["format"] == "gif"
    assert got[3]["n_frames"] == 4
    assert got[4]["format"] is None and got[4]["width"] == -1
    assert got[4]["n_bytes"] == len(b"not media at all")


def test_spark_audio_rms_and_thumbnails(spark):
    from miru_spark.ops.multimodal import (
        audio_rms_windows,
        image_thumbnails,
    )

    rate = 8000
    t = np.arange(rate * 2) / rate
    wav = media.wav_encode(0.25 * np.sin(2 * np.pi * 220 * t), rate)
    px = _rng(9).integers(0, 256, (30, 60, 3), dtype=np.uint8)
    png = media.png_encode(px)
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(png)), (3, bytearray(b"x"))],
        "id long, payload binary",
    )
    rms = audio_rms_windows(df, win_ms=1000, hop_ms=500).collect()
    assert {r["id"] for r in rms} == {1}
    want = media.rms_windows(
        media.wav_decode(wav)[2], rate, 1000, 500
    )
    got = sorted((r["win_start_ms"], r["win_end_ms"], r["rms"]) for r in rms)
    assert [(s, e) for s, e, _ in got] == [(s, e) for s, e, _ in want]
    assert all(abs(a[2] - b[2]) < 1e-12 for a, b in zip(got, want))

    th = image_thumbnails(df, box=20).collect()
    assert {r["id"] for r in th} == {2}
    r = th[0]
    assert (r["out_w"], r["out_h"]) == (20, 10)
    decoded = media.png_decode(bytes(r["thumb"]))
    assert np.array_equal(decoded, media.resize_nearest(px, 20, 10))


def test_spark_gif_thumbnail(spark):
    from miru_spark.ops.multimodal import image_thumbnails

    pal = _rng(31).integers(0, 256, (8, 3), dtype=np.uint8)
    idx = _rng(32).integers(0, 8, (16, 40), dtype=np.uint8)
    gif = media.gif_encode_indexed([idx], pal, 40, 16)
    df = spark.createDataFrame(
        [(7, bytearray(gif))], "id long, payload binary"
    )
    r = image_thumbnails(df, box=10).collect()[0]
    assert (r["out_w"], r["out_h"]) == (10, 4)
    want = media.resize_nearest(pal[idx.astype(np.int32)], 10, 4)
    assert np.array_equal(media.png_decode(bytes(r["thumb"])), want)


def test_spark_corrupt_payloads_skip_not_crash(spark):
    """Valid magic + garbage body must not fail the task (errors='skip'
    default); errors='raise' surfaces the decode error."""
    from miru_spark.ops.multimodal import (
        audio_rms_windows,
        image_thumbnails,
    )

    good = media.png_encode(
        _rng(55).integers(0, 256, (8, 8, 3), dtype=np.uint8)
    )
    bad_png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 64
    bad_jpg = b"\xff\xd8\xff\xc0\x00\x05garbage-without-sos"
    bad_wav = b"RIFF\x00\x00\x00\x00WAVEjunk"
    df = spark.createDataFrame(
        [
            (1, bytearray(good)),
            (2, bytearray(bad_png)),
            (3, bytearray(bad_jpg)),
            (4, bytearray(bad_wav)),
        ],
        "id long, payload binary",
    )
    th = image_thumbnails(df, box=4).collect()
    assert {r["id"] for r in th} == {1}
    assert audio_rms_windows(df).collect() == []
    with pytest.raises(Exception):
        image_thumbnails(df, box=4, errors="raise").collect()


def test_mm_decode_meta_fallback_preserved(spark, tmp_path):
    """The oracle contract: text payloads are not valid media, so
    mm_decode_meta still reports the deterministic length-derived
    metadata DuckDB recomputes (octet_length)."""
    import pandas as pd

    from miru_spark.ops.multimodal import _fake_decode_meta, mm_decode_meta

    sf = tmp_path / "sf"
    sf.mkdir()
    pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": ["alpha beta", "x", "hello world!"]}
    ).to_parquet(sf / "documents.parquet")
    got = {
        r["doc_id"]: (r["width"], r["height"], r["n_frames"])
        for r in mm_decode_meta(spark, str(sf)).collect()
    }
    for did, txt in ((0, "alpha beta"), (1, "x"), (2, "hello world!")):
        assert got[did] == _fake_decode_meta(len(txt.encode()))


# -- video containers (MP4 / AVI metadata walk) -------------------------------

def _box(typ: bytes, payload: bytes) -> bytes:
    import struct as _s
    return _s.pack(">I", len(payload) + 8) + typ + payload


def _make_mp4(w=320, h=240, n_samples=90, timescale=1000, duration=3000,
              with_audio=True):
    import struct as _s
    ftyp = _box(b"ftyp", b"isom" + _s.pack(">I", 512) + b"isomiso2")
    mvhd = _box(
        b"mvhd",
        bytes(4) + bytes(8) + _s.pack(">II", timescale, duration)
        + bytes(80),
    )

    def trak(kind, tw, th, samples):
        tkhd = _box(
            b"tkhd",
            bytes(4) + bytes(8) + _s.pack(">I", 1) + bytes(4)
            + _s.pack(">I", duration) + bytes(8) + bytes(8) + bytes(36)
            + _s.pack(">II", tw << 16, th << 16),
        )
        hdlr = _box(b"hdlr", bytes(8) + kind + bytes(12) + b"h\x00")
        stsz = _box(b"stsz", bytes(4) + _s.pack(">II", 0, samples))
        mdia = _box(
            b"mdia",
            _box(b"mdhd", bytes(24))
            + hdlr
            + _box(b"minf", _box(b"stbl", stsz)),
        )
        return _box(b"trak", tkhd + mdia)

    traks = trak(b"vide", w, h, n_samples)
    if with_audio:
        traks += trak(b"soun", 0, 0, 130)
    moov = _box(b"moov", mvhd + traks)
    return ftyp + moov + _box(b"mdat", bytes(8))


def _make_avi(w=640, h=360, frames=120, us_per_frame=33333, streams=2):
    import struct as _s
    avih = _s.pack(
        "<10I", us_per_frame, 0, 0, 0, frames, 0, streams, 0, w, h
    ) + bytes(16)
    chunk = b"avih" + _s.pack("<I", len(avih)) + avih
    hdrl = b"LIST" + _s.pack("<I", 4 + len(chunk)) + b"hdrl" + chunk
    body = b"AVI " + hdrl
    return b"RIFF" + _s.pack("<I", len(body)) + body


def test_mp4_meta_walk():
    data = _make_mp4()
    m = media.mp4_meta(data)
    assert m == {
        "width": 320, "height": 240, "n_frames": 90,
        "duration_ms": 3000, "n_tracks": 2, "n_video": 1, "n_audio": 1,
    }
    s = media.sniff_meta(data)
    assert s["format"] == "mp4" and s["n_frames"] == 90
    assert s["width"] == 320 and s["duration_ms"] == 3000
    m2 = media.mp4_meta(_make_mp4(with_audio=False))
    assert m2["n_tracks"] == 1 and m2["n_audio"] == 0
    # 64-bit mvhd (version 1) duration path
    import struct as _s
    mvhd1 = _box(
        b"mvhd",
        bytes([1, 0, 0, 0]) + bytes(16)
        + _s.pack(">I", 600) + _s.pack(">Q", 1800) + bytes(80),
    )
    data1 = _box(b"ftyp", b"isom") + _box(b"moov", mvhd1)
    assert media.mp4_meta(data1)["duration_ms"] == 3000
    # truncated/garbage boxes -> None, never a crash
    assert media.mp4_meta(data[:20]) is None
    assert media.mp4_meta(b"\x00\x00\x00\x08ftyp") is None
    assert media.sniff_meta(b"\x00" * 40) is None


def test_avi_meta_walk():
    data = _make_avi()
    m = media.avi_meta(data)
    assert (m["width"], m["height"]) == (640, 360)
    assert m["n_frames"] == 120 and m["n_tracks"] == 2
    assert m["duration_ms"] == round(120 * 33333 / 1000)
    s = media.sniff_meta(data)
    assert s["format"] == "avi" and s["n_frames"] == 120
    assert media.avi_meta(data[:16]) is None


def test_spark_video_meta_and_frame_sampling(spark):
    from miru_spark.ops.multimodal import decode_binary_meta

    df = spark.createDataFrame(
        [
            (1, bytearray(_make_mp4(n_samples=57))),
            (2, bytearray(_make_avi(frames=24))),
            (3, bytearray(b"not a container")),
        ],
        "id long, payload binary",
    )
    rows = {r["id"]: r for r in decode_binary_meta(df).collect()}
    assert rows[1]["format"] == "mp4" and rows[1]["n_frames"] == 57
    assert rows[2]["format"] == "avi" and rows[2]["n_frames"] == 24
    assert rows[3]["format"] is None
    # real temporal sampling off the parsed frame counts
    assert media.frame_indices(rows[1]["n_frames"], every=10) == [
        0, 10, 20, 30, 40, 50
    ]
