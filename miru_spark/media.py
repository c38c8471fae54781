"""Real, dependency-free media decoding for multimodal binary columns.

The sandbox carries no PIL/ffmpeg/cv2, but several container formats are
fully decodable with the Python standard library alone -- so the decode
step of the multimodal pipeline (ops/multimodal.py) is REAL for these
formats, not a stub:

- PNG: complete pixel decode (zlib inflate + all five scanline filters
  incl. Paeth) for 8-bit greyscale / grey+alpha / RGB / RGBA / palette,
  non-interlaced -- the overwhelming share of real-world PNGs. Encoder
  included for round-trip tests.
- JPEG: real marker walk to SOF0/1/2 for (width, height, components)
  here; FULL baseline pixel decode (Huffman + dequant + IDCT + 4:2:0
  upsampling + YCbCr) lives in the sibling `miru_spark.jpeg` module.
- GIF: header dims + a real block walk counting image descriptors
  (n_frames), skipping extensions and LZW sub-blocks byte-exactly.
- BMP: BITMAPINFOHEADER dims.
- WAV: full PCM sample decode via the stdlib `wave` reader (8/16-bit),
  returned as numpy arrays. Encoder included for round-trip tests.

Feature extraction over the decoded payloads is likewise real:
`resize_nearest` (numpy nearest-neighbor resampling -- what a
thumbnailing stage does), `rms_windows` (per-window root-mean-square
over PCM frames -- the canonical first audio feature), and
`frame_indices` (uniform temporal sampling).

`sniff_meta(data)` is the dispatch the Spark pipeline calls per payload:
magic-byte detection -> real metadata, or None for unrecognized bytes
(the caller decides the fallback). All functions are pure and
picklable, safe inside Arrow-batched mapInPandas workers.

Reference provenance: the reference engine stores no media -- this
module serves the training-data-pipeline extension (multimodal columns
as opaque binary + typed metadata), where the decode was previously a
declared stub.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color_type -> samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def png_meta(data: bytes) -> dict | None:
    """Parse the IHDR of a PNG byte string. Returns
    {width, height, bit_depth, color_type, channels} or None."""
    if len(data) < 33 or not data.startswith(_PNG_SIG):
        return None
    ln, typ = struct.unpack(">I4s", data[8:16])
    if typ != b"IHDR" or ln != 13:
        return None
    w, h, depth, ctype = struct.unpack(">IIBB", data[16:26])
    if ctype not in _PNG_CHANNELS:
        return None
    return {
        "width": int(w),
        "height": int(h),
        "bit_depth": int(depth),
        "color_type": int(ctype),
        "channels": _PNG_CHANNELS[ctype],
    }


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def png_decode(data: bytes) -> np.ndarray:
    """Full PNG pixel decode (8-bit, non-interlaced). Returns a uint8
    array of shape (height, width, channels); palette images resolve
    through their PLTE to RGB. Raises ValueError on unsupported or
    malformed input."""
    meta = png_meta(data)
    if meta is None:
        raise ValueError("not a PNG")
    if meta["bit_depth"] != 8:
        raise ValueError(f"unsupported bit depth {meta['bit_depth']}")
    w, h, ch = meta["width"], meta["height"], meta["channels"]
    interlace = data[28]
    if interlace != 0:
        raise ValueError("interlaced PNG unsupported")
    # chunk walk: concatenate IDAT, remember PLTE
    pos, idat, plte = 8, [], None
    while pos + 8 <= len(data):
        ln, typ = struct.unpack(">I4s", data[pos : pos + 8])
        body = data[pos + 8 : pos + 8 + ln]
        if typ == b"IDAT":
            idat.append(body)
        elif typ == b"PLTE":
            plte = body
        elif typ == b"IEND":
            break
        pos += 12 + ln  # len + type + crc
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("scanline size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = bytearray(stride)
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for x in range(ch, stride):
                line[x] = (line[x] + line[x - ch]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = line[x - ch] if x >= ch else 0
                line[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = line[x - ch] if x >= ch else 0
                ul = prev[x - ch] if x >= ch else 0
                line[x] = (line[x] + _paeth(left, prev[x], ul)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
        prev = line
    px = out.reshape(h, w, ch)
    if meta["color_type"] == 3:
        if plte is None:
            raise ValueError("palette image without PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        px = pal[px[:, :, 0]]
    return px


def png_encode(px: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal PNG encoder (8-bit grey/grey+alpha/RGB/RGBA) for
    round-trip tests; `filter_type` 0/1/2 applies that filter to every
    scanline so the decoder's unfilter paths are exercised."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = bytearray()
    prev = np.zeros((w * ch,), dtype=np.int16)
    for y in range(h):
        line = px[y].reshape(-1).astype(np.int16)
        if filter_type == 0:
            enc = line
        elif filter_type == 1:
            left = np.concatenate([np.zeros(ch, np.int16), line[:-ch]])
            enc = (line - left) & 0xFF
        elif filter_type == 2:
            enc = (line - prev) & 0xFF
        else:
            raise ValueError("encoder supports filter 0/1/2")
        raw.append(filter_type)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = line

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


_SOF_MARKERS = frozenset(
    range(0xC0, 0xD0)
) - {0xC4, 0xC8, 0xCC}  # DHT, JPG, DAC are not frame headers


def jpeg_meta(data: bytes) -> dict | None:
    """Real JPEG marker walk to the first SOFn frame header. Returns
    {width, height, channels} or None."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        return None
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if 0xD0 <= marker <= 0xD9:  # RSTn / EOI: no length field
            if marker == 0xD9:
                return None
            pos += 2
            continue
        seglen = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        if marker in _SOF_MARKERS:
            if pos + 9 > len(data):
                return None
            h, w = struct.unpack(">HH", data[pos + 5 : pos + 9])
            ncomp = data[pos + 9]
            return {
                "width": int(w), "height": int(h), "channels": int(ncomp),
            }
        pos += 2 + seglen
    return None


def gif_meta(data: bytes) -> dict | None:
    """GIF header dims + a real block walk counting image descriptors
    (= frames). Returns {width, height, n_frames} or None."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", data[6:10])
    flags = data[10]
    pos = 13
    if flags & 0x80:  # global color table
        pos += 3 * (2 << (flags & 0x07))
    frames = 0
    n = len(data)
    while pos < n:
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < n and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            frames += 1
            if pos + 10 > n:
                break
            lflags = data[pos + 9]
            pos += 10
            if lflags & 0x80:  # local color table
                pos += 3 * (2 << (lflags & 0x07))
            pos += 1  # LZW minimum code size
            while pos < n and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        else:
            return None
    return {"width": int(w), "height": int(h), "n_frames": frames}


def bmp_meta(data: bytes) -> dict | None:
    """BMP (BITMAPINFOHEADER) dims. Returns {width, height} or None."""
    if len(data) < 26 or data[:2] != b"BM":
        return None
    w, h = struct.unpack("<ii", data[18:26])
    return {"width": int(w), "height": abs(int(h))}


def wav_decode(data: bytes) -> tuple[int, int, np.ndarray]:
    """Full PCM WAV decode via the stdlib reader. Returns
    (sample_rate, n_channels, samples) with samples shaped
    (n_frames, n_channels) as float64 in [-1, 1]."""
    with wave.open(io.BytesIO(data), "rb") as wf:
        rate = wf.getframerate()
        nch = wf.getnchannels()
        width = wf.getsampwidth()
        frames = wf.readframes(wf.getnframes())
    if width == 2:
        s = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        s = (
            np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0
        ) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    return rate, nch, s.reshape(-1, nch)


def wav_meta(data: bytes) -> dict | None:
    """WAV header metadata without materializing samples."""
    try:
        with wave.open(io.BytesIO(data), "rb") as wf:
            return {
                "sample_rate": wf.getframerate(),
                "channels": wf.getnchannels(),
                "n_frames": wf.getnframes(),
                "duration_ms": int(
                    wf.getnframes() * 1000 / wf.getframerate()
                ),
            }
    except (wave.Error, EOFError, struct.error):
        return None


def wav_encode(
    samples: np.ndarray, sample_rate: int = 16000
) -> bytes:
    """Minimal 16-bit PCM WAV encoder for round-trip tests. `samples`
    float in [-1, 1], shape (n_frames,) or (n_frames, n_channels)."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    pcm = np.clip(np.round(s * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(s.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def sniff_meta(data: bytes) -> dict | None:
    """Magic-byte dispatch to the real decoders. Returns a normalized
    {format, width, height, n_frames, sample_rate, duration_ms} dict
    (absent dims are -1) or None for unrecognized payloads."""
    if not data:
        return None
    out = {
        "format": None, "width": -1, "height": -1,
        "n_frames": 1, "sample_rate": -1, "duration_ms": -1,
    }
    if data.startswith(_PNG_SIG):
        m = png_meta(data)
        if m is None:
            return None
        out.update(format="png", width=m["width"], height=m["height"])
        return out
    if data[:2] == b"\xff\xd8":
        m = jpeg_meta(data)
        if m is None:
            return None
        out.update(format="jpeg", width=m["width"], height=m["height"])
        return out
    if data[:6] in (b"GIF87a", b"GIF89a"):
        m = gif_meta(data)
        if m is None:
            return None
        out.update(
            format="gif", width=m["width"], height=m["height"],
            n_frames=max(m["n_frames"], 1),
        )
        return out
    if data[:2] == b"BM":
        m = bmp_meta(data)
        if m is None:
            return None
        out.update(format="bmp", width=m["width"], height=m["height"])
        return out
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        m = wav_meta(data)
        if m is None:
            return None
        out.update(
            format="wav", sample_rate=m["sample_rate"],
            n_frames=m["n_frames"], duration_ms=m["duration_ms"],
        )
        return out
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        m = avi_meta(data)
        if m is None:
            return None
        out.update(
            format="avi", width=m["width"], height=m["height"],
            n_frames=m["n_frames"], duration_ms=m["duration_ms"],
        )
        return out
    if len(data) >= 12 and data[4:8] == b"ftyp":
        m = mp4_meta(data)
        if m is None:
            return None
        out.update(
            format="mp4", width=m["width"], height=m["height"],
            n_frames=m["n_frames"], duration_ms=m["duration_ms"],
        )
        return out
    return None


# -- video containers (metadata walk; no codec decode) -----------------------

def _mp4_boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for each ISO-BMFF box."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(data[pos : pos + 4], "big")
        typ = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                return
            size = int.from_bytes(data[pos + 8 : pos + 16], "big")
            hdr = 16
        elif size == 0:  # to end of file
            size = end - pos
        if size < hdr or pos + size > end:
            return
        yield typ, pos + hdr, pos + size
        pos += size


_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def mp4_meta(data: bytes) -> dict | None:
    """ISO base-media (MP4/MOV) metadata: a real box walk through
    moov/mvhd (timescale+duration), trak/tkhd (presentation dims),
    mdia/hdlr (track kind) and stbl/stsz (video sample count). No codec
    payloads are touched -- container structure only."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        return None
    out = {
        "width": -1, "height": -1, "n_frames": 1, "duration_ms": -1,
        "n_tracks": 0, "n_video": 0, "n_audio": 0,
    }

    def walk(start, end, in_trak=False, trak=None):
        for typ, b0, b1 in _mp4_boxes(data, start, end):
            if typ == b"mvhd" and b1 - b0 >= 20:
                ver = data[b0]
                if ver == 1 and b1 - b0 >= 28:
                    ts = int.from_bytes(data[b0 + 20 : b0 + 24], "big")
                    dur = int.from_bytes(data[b0 + 24 : b0 + 32], "big")
                else:
                    ts = int.from_bytes(data[b0 + 12 : b0 + 16], "big")
                    dur = int.from_bytes(data[b0 + 16 : b0 + 20], "big")
                if ts:
                    out["duration_ms"] = int(round(dur * 1000 / ts))
            elif typ == b"trak":
                t = {"kind": None, "w": -1, "h": -1, "samples": 0}
                walk(b0, b1, True, t)
                out["n_tracks"] += 1
                if t["kind"] == b"vide":
                    out["n_video"] += 1
                    if out["width"] < 0:
                        out["width"], out["height"] = t["w"], t["h"]
                        out["n_frames"] = max(t["samples"], 1)
                elif t["kind"] == b"soun":
                    out["n_audio"] += 1
            elif typ == b"tkhd" and in_trak and b1 - b0 >= 84:
                # 16.16 fixed-point width/height close the v0 box
                t_w = int.from_bytes(data[b1 - 8 : b1 - 4], "big") >> 16
                t_h = int.from_bytes(data[b1 - 4 : b1], "big") >> 16
                trak["w"], trak["h"] = t_w, t_h
            elif typ == b"hdlr" and in_trak and b1 - b0 >= 12:
                trak["kind"] = data[b0 + 8 : b0 + 12]
            elif typ == b"stsz" and in_trak and b1 - b0 >= 12:
                trak["samples"] = int.from_bytes(
                    data[b0 + 8 : b0 + 12], "big"
                )
            elif typ in _MP4_CONTAINERS:
                walk(b0, b1, in_trak, trak)

    walk(0, len(data))
    if out["n_tracks"] == 0 and out["duration_ms"] < 0:
        return None
    return out


def avi_meta(data: bytes) -> dict | None:
    """AVI (RIFF) metadata from the avih main header: frame period,
    total frames, stream count, dims."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        return None
    pos = 12
    end = min(len(data), 8 + int.from_bytes(data[4:8], "little"))

    def find_avih(pos, end):
        while pos + 8 <= end:
            cc = data[pos : pos + 4]
            size = int.from_bytes(data[pos + 4 : pos + 8], "little")
            if cc == b"LIST":
                inner = find_avih(pos + 12, min(pos + 8 + size, end))
                if inner is not None:
                    return inner
            elif cc == b"avih":
                return pos + 8
            pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
        return None

    o = find_avih(pos, end)
    if o is None or o + 40 > len(data):
        return None
    us_per_frame = int.from_bytes(data[o : o + 4], "little")
    frames = int.from_bytes(data[o + 16 : o + 20], "little")
    streams = int.from_bytes(data[o + 24 : o + 28], "little")
    w = int.from_bytes(data[o + 32 : o + 36], "little")
    h = int.from_bytes(data[o + 36 : o + 40], "little")
    return {
        "width": w, "height": h, "n_frames": max(frames, 1),
        "n_tracks": streams,
        "duration_ms": int(round(frames * us_per_frame / 1000)),
    }


def _lzw_decode(mcs: int, data: bytes, n_pixels: int) -> list[int]:
    """GIF-variant LZW decode (LSB-first variable-width codes, clear /
    end codes, 12-bit table cap with deferred-clear tolerance)."""
    clear = 1 << mcs
    end = clear + 1
    base = [[i] for i in range(clear)] + [None, None]
    table = list(base)
    code_size = mcs + 1
    out: list[int] = []
    prev: list[int] | None = None
    bitpos = 0
    nbits = len(data) * 8
    while bitpos + code_size <= nbits and len(out) < n_pixels:
        byte = bitpos >> 3
        window = int.from_bytes(data[byte : byte + 4], "little")
        code = (window >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            table = list(base)
            code_size = mcs + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("bad first LZW code")
            prev = table[code]
            out.extend(prev)
            continue
        if code < len(table) and table[code] is not None:
            entry = table[code]
        elif code == len(table):
            entry = prev + [prev[0]]
        else:
            raise ValueError("LZW code out of range")
        out.extend(entry)
        if len(table) < 4096:
            table.append(prev + [entry[0]])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return out


def _lzw_encode(mcs: int, indices) -> bytes:
    """GIF-variant LZW encode (the decoder's exact inverse; emits a
    clear when the table fills). For round-trip tests and the GIF
    writer below."""
    clear = 1 << mcs
    end = clear + 1
    out = bytearray()
    acc = 0
    accbits = 0

    def emit(code: int, size: int):
        nonlocal acc, accbits
        acc |= code << accbits
        accbits += size
        while accbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8

    code_size = mcs + 1
    table: dict[tuple, int] = {(i,): i for i in range(clear)}
    next_code = end + 1
    emit(clear, code_size)
    prev: tuple = ()
    for raw in indices:
        idx = int(raw)
        cur = prev + (idx,)
        if cur in table:
            prev = cur
            continue
        emit(table[prev], code_size)
        if next_code < 4096:
            table[cur] = next_code
            next_code += 1
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        else:
            emit(clear, code_size)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            code_size = mcs + 1
        prev = (idx,)
    if prev:
        emit(table[prev], code_size)
    emit(end, code_size)
    if accbits:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def gif_decode(data: bytes) -> list[dict]:
    """REAL GIF pixel decode: full LZW decompression of every image
    descriptor, local/global palette resolution, deinterlacing. Returns
    one dict per frame: {x, y, width, height, pixels} with pixels a
    uint8 (h, w, 3) array of that frame's own rect (frame composition /
    disposal is presentation policy, left to the caller)."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    flags = data[10]
    pos = 13
    gpal = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gpal = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8)
        gpal = gpal.reshape(-1, 3)
        pos += 3 * n
    frames: list[dict] = []
    n = len(data)
    while pos < n:
        b = data[pos]
        if b == 0x3B:
            break
        if b == 0x21:  # extension
            pos += 2
            while pos < n and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:
            x, y, w, h = struct.unpack("<HHHH", data[pos + 1 : pos + 9])
            lflags = data[pos + 9]
            pos += 10
            pal = gpal
            if lflags & 0x80:
                cnt = 2 << (lflags & 0x07)
                pal = np.frombuffer(
                    data[pos : pos + 3 * cnt], dtype=np.uint8
                ).reshape(-1, 3)
                pos += 3 * cnt
            mcs = data[pos]
            pos += 1
            lzw = bytearray()
            while pos < n and data[pos] != 0:
                ln = data[pos]
                lzw.extend(data[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(mcs, bytes(lzw), w * h)
            if len(idx) < w * h:
                raise ValueError("truncated LZW pixel data")
            grid = np.array(idx[: w * h], dtype=np.int32).reshape(h, w)
            if lflags & 0x40:  # interlaced: rows arrive in 4 passes
                order = [
                    r
                    for start, step in _GIF_PASSES
                    for r in range(start, h, step)
                ]
                de = np.empty_like(grid)
                de[order] = grid
                grid = de
            if pal is None:
                raise ValueError("no palette for frame")
            frames.append(
                {
                    "x": int(x), "y": int(y),
                    "width": int(w), "height": int(h),
                    "pixels": pal[grid],
                }
            )
        else:
            raise ValueError(f"bad GIF block 0x{b:02x}")
    return frames


def gif_encode_indexed(
    frames, palette, width: int, height: int, interlace: bool = False
) -> bytes:
    """Minimal GIF89a writer over palette-indexed frames (each a uint8
    (h, w) array positioned at (0, 0)) for round-trip tests."""
    pal = np.asarray(palette, dtype=np.uint8).reshape(-1, 3)
    bits = max(1, int(np.ceil(np.log2(max(len(pal), 2)))))
    padded = np.zeros((2 << (bits - 1), 3), dtype=np.uint8)
    padded[: len(pal)] = pal
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out.append(0x80 | (bits - 1))  # global palette present
    out += b"\x00\x00"
    out += padded.tobytes()
    mcs = max(2, bits)
    for fr in frames:
        g = np.asarray(fr, dtype=np.uint8)
        h, w = g.shape
        out.append(0x2C)
        out += struct.pack("<HHHH", 0, 0, w, h)
        out.append(0x40 if interlace else 0x00)
        if interlace:
            order = [
                r for start, step in _GIF_PASSES for r in range(start, h, step)
            ]
            g = g[order]
        out.append(mcs)
        lzw = _lzw_encode(mcs, g.reshape(-1))
        for off in range(0, len(lzw), 255):
            blk = lzw[off : off + 255]
            out.append(len(blk))
            out += blk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


# -- feature extraction over decoded payloads ------------------------------

def resize_nearest(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Real nearest-neighbor resize (the thumbnailing stage): pure numpy
    index mapping, pixel-exact and deterministic."""
    px = np.asarray(px)
    h, w = px.shape[:2]
    ys = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xs = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return px[ys[:, None], xs[None, :]]


def rms_windows(
    samples: np.ndarray,
    sample_rate: int,
    win_ms: int = 1000,
    hop_ms: int = 500,
) -> list[tuple[int, int, float]]:
    """Per-window RMS over mono-mixed PCM: [(start_ms, end_ms, rms)].
    The canonical first audio feature a pipeline extracts per window."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 2:
        s = s.mean(axis=1)
    n = s.size
    win = max(1, int(sample_rate * win_ms / 1000))
    hop = max(1, int(sample_rate * hop_ms / 1000))
    out = []
    for start in range(0, max(n - win, 0) + 1, hop):
        seg = s[start : start + win]
        if seg.size == 0:
            break
        out.append(
            (
                int(start * 1000 / sample_rate),
                int(min(start + win, n) * 1000 / sample_rate),
                float(np.sqrt(np.mean(seg * seg))),
            )
        )
    return out


def frame_indices(n_frames: int, every: int = 10) -> list[int]:
    """Uniform temporal sampling: every `every`-th frame index."""
    return list(range(0, max(int(n_frames), 0), max(int(every), 1)))


def spectral_windows(
    samples: np.ndarray,
    sample_rate: int,
    win_ms: int = 1000,
    hop_ms: int = 500,
) -> list[tuple[int, int, float, float, float]]:
    """Per-window spectral features over mono-mixed PCM (real DSP, rFFT
    with a Hann window): [(start_ms, end_ms, rms, centroid_hz,
    dominant_hz)]. Centroid = magnitude-weighted mean frequency;
    dominant = argmax-magnitude bin (DC excluded)."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 2:
        s = s.mean(axis=1)
    n = s.size
    win = max(1, int(sample_rate * win_ms / 1000))
    hop = max(1, int(sample_rate * hop_ms / 1000))
    hann = 0.5 - 0.5 * np.cos(
        2 * np.pi * np.arange(win) / max(win - 1, 1)
    )
    freqs = np.fft.rfftfreq(win, d=1.0 / sample_rate)
    out = []
    for start in range(0, max(n - win, 0) + 1, hop):
        seg = s[start : start + win]
        if seg.size == 0:
            break
        rms = float(np.sqrt(np.mean(seg * seg)))
        padded = np.zeros(win)
        padded[: seg.size] = seg * hann[: seg.size]
        mag = np.abs(np.fft.rfft(padded))
        mag[0] = 0.0  # exclude DC from both features
        total = mag.sum()
        centroid = float((freqs * mag).sum() / total) if total > 0 else 0.0
        dominant = float(freqs[int(np.argmax(mag))]) if total > 0 else 0.0
        out.append(
            (
                int(start * 1000 / sample_rate),
                int(min(start + win, n) * 1000 / sample_rate),
                rms, centroid, dominant,
            )
        )
    return out
