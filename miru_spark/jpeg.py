"""Baseline JPEG codec, dependency-free (numpy only).

A real sequential-DCT JPEG decoder: segment parse (DQT/SOF0/DHT/SOS/
DRI), canonical Huffman decode with byte-unstuffing and restart
markers, dequantization, inverse zigzag, orthonormal 8x8 IDCT, chroma
upsampling for 4:2:0 / 4:2:2, YCbCr -> RGB. Handles any baseline file
whose Huffman tables arrive in DHT segments (i.e. every spec-compliant
baseline JPEG — Annex K tables are just one choice of DHT payload).

The paired encoder emits spec-compliant baseline JPEGs (4:4:4, uniform
or scaled Annex-K-style quantization, canonical single-length Huffman
tables written to DHT) so the decoder round-trips against genuine
entropy-coded streams in tests; with an all-ones quantization table the
round-trip error is bounded by DCT float rounding (≤ 2 levels/channel).

Progressive (SOF2) JPEG is fully supported on both sides: the decoder
accumulates successive-approximation coefficient scans (DC first/refine,
AC first/refine with EOB-run folding and buffered correction bits, spec
Annex G) across any spectral-selection script, and `encode_progressive`
emits a multi-scan progression exercising every scan kind. The
cross-codec test invariant: progressive and baseline encodings of the
same pixels carry identical quantized coefficients, so the two decode
paths (which share no scan logic) must produce identical pixels.
Arithmetic-coded, 12-bit and lossless modes are out of scope (the
decoder raises on their SOF markers).
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: index i of the scan -> (row, col) flattened offset
_ZZ = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal DCT-II basis: block = C.T @ coefs @ C inverts C @ b @ C.T
_C = np.zeros((8, 8))
for _k in range(8):
    _s = np.sqrt(1.0 / 8.0) if _k == 0 else np.sqrt(2.0 / 8.0)
    for _n in range(8):
        _C[_k, _n] = _s * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


class _BitReader:
    """MSB-first entropy-segment reader with 0xFF00 unstuffing; stops
    at (and reports) markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self):
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(self.data):
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.nbits += 8  # pad with zeros past the segment end
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = (
                    self.data[self.pos + 1]
                    if self.pos + 1 < len(self.data)
                    else 0xD9
                )
                if nxt == 0x00:
                    self.pos += 2
                else:
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def peek16(self) -> int:
        if self.nbits < 16:
            self._fill()
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int):
        self.nbits -= n

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        return v

    def align_restart(self):
        """Consume a pending RSTn marker and resynchronize."""
        self.nbits = 0
        self.acc = 0
        if self.marker is None:
            # buffered bits ended before the fill reached the marker:
            # skip the padding byte(s) up to the 0xFF ourselves
            while (
                self.pos < len(self.data)
                and self.data[self.pos] != 0xFF
            ):
                self.pos += 1
            if self.pos + 1 < len(self.data):
                self.marker = self.data[self.pos + 1]
        m = self.marker
        self.marker = None
        if m is not None and 0xD0 <= m <= 0xD7:
            self.pos += 2
        else:
            raise ValueError(f"expected restart marker, got {m}")


class _HuffTable:
    """Canonical JPEG Huffman table -> (maxlen-bit lookup) decoder."""

    def __init__(self, bits: list[int], vals: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        self.min_len = None
        self.max_len = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = vals[k]
                k += 1
                code += 1
                if self.min_len is None:
                    self.min_len = length
                self.max_len = length
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        word = br.peek16()
        for length in range(self.min_len or 1, self.max_len + 1):
            code = word >> (16 - length)
            sym = self.lookup.get((length, code))
            if sym is not None:
                br.skip(length)
                return sym
        raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """JPEG EXTEND: t-bit magnitude v -> signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode(data: bytes) -> np.ndarray:
    """Decode a baseline (SOF0/1) or progressive (SOF2) JPEG to uint8
    (h, w, 3) RGB (greyscale files are replicated to 3 channels)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    comps: list[dict] = []
    w = h = 0
    restart_interval = 0
    progressive = False
    coefs: list[np.ndarray] | None = None  # per-comp zigzag int grids
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError("segment desync")
        marker = data[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker in (0xD8,):
            pos += 2
            continue
        seglen = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        body = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0x0F
                o += 1
                if pq == 0:
                    tbl = np.frombuffer(
                        body[o : o + 64], dtype=np.uint8
                    ).astype(np.float64)
                    o += 64
                else:
                    tbl = np.frombuffer(
                        body[o : o + 128], dtype=">u2"
                    ).astype(np.float64)
                    o += 128
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0x0F
                bits = list(body[o + 1 : o + 17])
                cnt = sum(bits)
                vals = body[o + 17 : o + 17 + cnt]
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffTable(
                    bits, vals
                )
                o += 17 + cnt
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            progressive = marker == 0xC2
            h, w = struct.unpack(">HH", body[1:5])
            nc = body[5]
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {
                        "id": cid, "h": hv >> 4, "v": hv & 0x0F,
                        "tq": tq,
                    }
                )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG mode (SOF marker 0x{marker:02x})"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []  # component INDICES participating in scan
            for i in range(ns):
                cs, tdta = body[1 + 2 * i : 3 + 2 * i]
                for ci, c in enumerate(comps):
                    if c["id"] == cs:
                        c["td"] = tdta >> 4
                        c["ta"] = tdta & 0x0F
                        scan_comps.append(ci)
            pos = pos + 2 + seglen
            if not progressive:
                return _decode_scan(
                    data, pos, w, h, comps, qt, huff_dc, huff_ac,
                    restart_interval,
                )
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if coefs is None:
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcux = (w + 8 * hmax - 1) // (8 * hmax)
                mcuy = (h + 8 * vmax - 1) // (8 * vmax)
                coefs = [
                    np.zeros(
                        (mcuy * c["v"], mcux * c["h"], 64),
                        dtype=np.int32,
                    )
                    for c in comps
                ]
            pos = _decode_prog_scan(
                data, pos, w, h, comps, scan_comps, coefs,
                huff_dc, huff_ac, ss, se, ah, al, restart_interval,
            )
            continue
        elif marker == 0xD9:
            break
        pos += 2 + seglen
    if progressive and coefs is not None:
        return _prog_reconstruct(coefs, comps, qt, w, h)
    raise ValueError("no SOS segment")


def _decode_scan(data, pos, w, h, comps, qt, huff_dc, huff_ac, dri):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes.append(np.zeros((ph, pw), dtype=np.float64))
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_count and mcu_count % dri == 0:
                br.align_restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dtab = huff_dc[c["td"]]
                atab = huff_ac[c["ta"]]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.float64)
                        t = dtab.decode(br)
                        diff = _extend(br.receive(t), t)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = atab.decode(br)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.receive(s), s)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[_ZZ] = zz * q
                        blk = _C.T @ coef.reshape(8, 8) @ _C
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk
            mcu_count += 1
    return _assemble(planes, comps, hmax, vmax, w, h)


def _assemble(planes, comps, hmax, vmax, w, h):
    """Upsample subsampled planes, crop, level-shift, YCbCr->RGB."""
    out = []
    for c, p in zip(comps, planes):
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(
                np.repeat(p, hmax // c["h"], axis=1),
                vmax // c["v"], axis=0,
            )
        out.append(p[:h, :w] + 128.0)
    if len(out) == 1:
        g = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(
        np.round(np.stack([r, g, b], axis=2)), 0, 255
    ).astype(np.uint8)


# -- progressive (SOF2) scan decoding ---------------------------------------

def _decode_prog_scan(
    data, pos, w, h, comps, scan_comps, coefs,
    huff_dc, huff_ac, ss, se, ah, al, dri,
):
    """One progressive SOS: successive-approximation coefficient updates
    (spec G.2). DC scans (ss==0) may interleave components; AC scans are
    single-component over that component's own block grid. Returns the
    stream position of the next marker."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    br = _BitReader(data, pos)
    state = {"eobrun": 0}
    pred = [0] * len(comps)

    def dc_first(ci, by, bx):
        c = comps[ci]
        t = huff_dc[c["td"]].decode(br)
        pred[ci] += _extend(br.receive(t), t)
        coefs[ci][by, bx, 0] = pred[ci] << al

    def dc_refine(ci, by, bx):
        if br.receive(1):
            coefs[ci][by, bx, 0] |= 1 << al

    def ac_first(ci, by, bx):
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        blk = coefs[ci][by, bx]
        atab = huff_ac[comps[ci]["ta"]]
        k = ss
        while k <= se:
            rs = atab.decode(br)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += br.receive(r)
                break
            k += r
            if k > se:
                raise ValueError("AC index overflow")
            blk[k] = _extend(br.receive(s), s) << al
            k += 1

    def ac_refine(ci, by, bx):
        # spec G.2 / figure G.7 refinement semantics
        blk = coefs[ci][by, bx]
        atab = huff_ac[comps[ci]["ta"]]
        p1, m1 = 1 << al, -(1 << al)

        def correct(k):
            if br.receive(1) and not (blk[k] & p1):
                blk[k] += p1 if blk[k] >= 0 else m1

        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = atab.decode(br)
                r, s = rs >> 4, rs & 0x0F
                sval = 0
                if s == 0:
                    if r != 15:
                        state["eobrun"] = 1 << r
                        if r:
                            state["eobrun"] += br.receive(r)
                        break
                    # ZRL: pass 16 zero-history positions
                else:
                    sval = p1 if br.receive(1) else m1
                while k <= se:
                    if blk[k] != 0:
                        correct(k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if s and k <= se:
                    blk[k] = sval
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                if blk[k] != 0:
                    correct(k)
                k += 1
            state["eobrun"] -= 1

    if ss == 0:
        visit = dc_first if ah == 0 else dc_refine
        if se != 0:
            raise ValueError("DC scan with Se != 0")
    else:
        visit = ac_first if ah == 0 else ac_refine
        if len(scan_comps) != 1:
            raise ValueError("interleaved AC scan")

    def restart_check(unit):
        if dri and unit and unit % dri == 0:
            br.align_restart()
            state["eobrun"] = 0
            for i in range(len(pred)):
                pred[i] = 0

    if len(scan_comps) > 1:
        mcux = (w + 8 * hmax - 1) // (8 * hmax)
        mcuy = (h + 8 * vmax - 1) // (8 * vmax)
        unit = 0
        for my in range(mcuy):
            for mx in range(mcux):
                restart_check(unit)
                for ci in scan_comps:
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            visit(
                                ci, my * c["v"] + by, mx * c["h"] + bx
                            )
                unit += 1
    else:
        ci = scan_comps[0]
        c = comps[ci]
        # non-interleaved geometry: the component's OWN block grid
        cw = (w * c["h"] + hmax - 1) // hmax
        ch = (h * c["v"] + vmax - 1) // vmax
        bw, bh = (cw + 7) // 8, (ch + 7) // 8
        unit = 0
        for by in range(bh):
            for bx in range(bw):
                restart_check(unit)
                visit(ci, by, bx)
                unit += 1

    # advance to the next marker: the reader sits at (or just before) it
    p = br.pos
    if br.marker is not None:
        return p
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] not in (0x00,):
            return p
        p += 1
    return p


def _prog_reconstruct(coefs, comps, qt, w, h):
    """Dequantize + IDCT the accumulated progressive coefficients."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for c, grid in zip(comps, coefs):
        q = qt[c["tq"]]
        bh, bw = grid.shape[:2]
        plane = np.zeros((bh * 8, bw * 8), dtype=np.float64)
        # vectorized: dequant + unzigzag all blocks, batched IDCT
        deq = grid.reshape(-1, 64).astype(np.float64) * q
        nat = np.zeros_like(deq)
        nat[:, _ZZ] = deq
        blocks = _C.T @ nat.reshape(-1, 8, 8) @ _C
        blocks = blocks.reshape(bh, bw, 8, 8)
        plane = blocks.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        planes.append(plane)
    return _assemble(planes, comps, hmax, vmax, w, h)


# -- encoder ----------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-fill per spec


def _canonical_table(symbols: set[int]) -> tuple[list[int], bytes, dict]:
    """Uniform-length canonical Huffman table over the used symbols
    (valid per Annex C: all codes one length L, all-ones code unused
    because 2^L >= n_symbols + 1). Returns (BITS, HUFFVAL, sym->(code,
    len))."""
    syms = sorted(symbols) or [0]
    L = max(1, int(np.ceil(np.log2(len(syms) + 1))))
    bits = [0] * 16
    bits[L - 1] = len(syms)
    codes = {s: (i, L) for i, s in enumerate(syms)}
    return bits, bytes(syms), codes


def _prep(px, quant, subsample):
    """Shared encoder front half: color transform, (optional) 4:2:0
    downsample, MCU padding, FDCT+quantize+zigzag grids."""
    px = np.asarray(px)
    grey = px.ndim == 2
    h, w = px.shape[:2]
    if grey:
        planes = [px.astype(np.float64) - 128.0]
        factors = [(1, 1)]
    else:
        r = px[:, :, 0].astype(np.float64)
        g = px[:, :, 1].astype(np.float64)
        b = px[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y - 128.0, cb, cr]
        factors = (
            [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
        )
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    qtab = np.full(64, float(max(1, quant)))
    grids = []
    for (fh, fv), p in zip(factors, planes):
        if (fh, fv) != (hmax, vmax):
            # 2x2 mean downsample (pad to even dims first)
            p2 = np.pad(
                p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)),
                mode="edge",
            )
            p = 0.25 * (
                p2[0::2, 0::2] + p2[1::2, 0::2]
                + p2[0::2, 1::2] + p2[1::2, 1::2]
            )
        ph, pw = mcuy * 8 * fv, mcux * 8 * fh
        p = np.pad(
            p,
            ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
            mode="edge",
        )
        grids.append(_block_grid(p, qtab))
    return grids, factors, qtab, h, w, len(planes), mcux, mcuy


def _block_grid(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """FDCT + quantize + zigzag every 8x8 block of a (padded) plane ->
    int64 array of shape (bh, bw, 64)."""
    h, w = plane.shape
    bh, bw = h // 8, w // 8
    out = np.empty((bh, bw, 64), dtype=np.int64)
    for by in range(bh):
        for bx in range(bw):
            blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            coef = (_C @ blk @ _C.T).reshape(-1)
            out[by, bx] = np.round(coef[_ZZ] / qtab[_ZZ]).astype(
                np.int64
            )
    return out


def encode(
    px: np.ndarray,
    quant: int = 1,
    subsample: bool = False,
    restart: int = 0,
) -> bytes:
    """Encode uint8 RGB (h, w, 3) or grey (h, w) to a baseline JPEG.
    `quant=1` writes all-ones quantization tables (near-lossless: error
    bounded by DCT rounding); larger values scale a flat table.
    `subsample=True` emits 4:2:0 (2x2-averaged chroma); `restart=N`
    writes DRI + RSTn markers every N MCUs."""
    grids, factors, qtab, h, w, ncomp, mcux, mcuy = _prep(
        px, quant, subsample
    )
    ntab = 1 if ncomp == 1 else 2

    def emission(collect_dc=None, collect_ac=None, write=None):
        """One pass over blocks in interleaved MCU order with restart
        and per-component DC prediction; collects symbols or writes."""
        pred = [0] * ncomp
        mcu = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart and mcu and mcu % restart == 0:
                    if write is not None:
                        write("restart", 0, (mcu // restart - 1) % 8, 0)
                    pred = [0] * ncomp
                for ci in range(ncomp):
                    ti = 0 if ci == 0 else 1
                    fh, fv = factors[ci]
                    for by in range(fv):
                        for bx in range(fh):
                            zz = grids[ci][my * fv + by, mx * fh + bx]
                            diff = int(zz[0]) - pred[ci]
                            pred[ci] = int(zz[0])
                            t = abs(diff).bit_length()
                            if collect_dc is not None:
                                collect_dc[ti].add(t)
                            if write is not None:
                                write("dc", ti, t, diff)
                            k = 1
                            while k < 64:
                                if zz[k] == 0:
                                    run = 0
                                    j = k
                                    while j < 64 and zz[j] == 0:
                                        run += 1
                                        j += 1
                                    if j == 64:
                                        if collect_ac is not None:
                                            collect_ac[ti].add(0x00)
                                        if write is not None:
                                            write("ac", ti, 0x00, 0)
                                        break
                                    while run >= 16:
                                        if collect_ac is not None:
                                            collect_ac[ti].add(0xF0)
                                        if write is not None:
                                            write("ac", ti, 0xF0, 0)
                                        run -= 16
                                    v = int(zz[j])
                                    s = abs(v).bit_length()
                                    rs = (run << 4) | s
                                    if collect_ac is not None:
                                        collect_ac[ti].add(rs)
                                    if write is not None:
                                        write("ac", ti, rs, v)
                                    k = j + 1
                                else:
                                    v = int(zz[k])
                                    s = abs(v).bit_length()
                                    if collect_ac is not None:
                                        collect_ac[ti].add(s)
                                    if write is not None:
                                        write("ac", ti, s, v)
                                    k += 1
                mcu += 1

    dc_syms: list[set] = [set() for _ in range(ntab)]
    ac_syms: list[set] = [set() for _ in range(ntab)]
    emission(collect_dc=dc_syms, collect_ac=ac_syms)
    dc_tabs = [_canonical_table(dc_syms[i]) for i in range(ntab)]
    ac_tabs = [_canonical_table(ac_syms[i]) for i in range(ntab)]

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes):
        out.extend(b"\xff" + bytes([marker]))
        out.extend(struct.pack(">H", len(body) + 2))
        out.extend(body)

    qz = np.empty(64, dtype=np.uint8)
    qz[np.arange(64)] = qtab[_ZZ].astype(np.uint8)
    seg(0xDB, bytes([0x00]) + qz.tobytes())
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        fh, fv = factors[ci]
        sof += bytes([ci + 1, (fh << 4) | fv, 0])
    seg(0xC0, bytes(sof))
    for ti in range(ntab):
        bits, vals, _ = dc_tabs[ti]
        seg(0xC4, bytes([0x00 | ti]) + bytes(bits) + vals)
        bits, vals, _ = ac_tabs[ti]
        seg(0xC4, bytes([0x10 | ti]) + bytes(bits) + vals)
    if restart:
        seg(0xDD, struct.pack(">H", restart))
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        ti = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (ti << 4) | ti])
    sos += bytes([0, 63, 0])
    seg(0xDA, bytes(sos))

    wtr = _BitWriter()

    def write(kind, ti, sym, val):
        if kind == "restart":
            wtr.flush()
            out.extend(wtr.out)
            wtr.out = bytearray()
            out.extend(b"\xff" + bytes([0xD0 + sym]))
            return
        code, ln = (dc_tabs if kind == "dc" else ac_tabs)[ti][2][sym]
        wtr.put(code, ln)
        nbits = sym if kind == "dc" else sym & 0x0F
        if nbits:
            wtr.put(
                val if val > 0 else val + (1 << nbits) - 1, nbits
            )

    emission(write=write)
    wtr.flush()
    out.extend(wtr.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


# -- progressive (SOF2) encoder ----------------------------------------------

class _ScanEmitter:
    """Two-pass scan emitter: collect Huffman symbols, then write. The
    EOB-run machinery (spec G.1.2.2-3) is shared by both passes so the
    collected symbol set matches what the write pass emits."""

    def __init__(self, symbols=None, writer=None, table=None):
        self.symbols = symbols
        self.writer = writer
        self.table = table
        self.eobrun = 0
        self.bebits: list[int] = []  # correction bits tied to the run

    def sym(self, s):
        if self.symbols is not None:
            self.symbols.add(s)
        if self.writer is not None:
            code, ln = self.table[s]
            self.writer.put(code, ln)

    def bits(self, v, n):
        if n and self.writer is not None:
            self.writer.put(v, n)

    def raw(self, bitlist):
        for b in bitlist:
            self.bits(b, 1)

    def flush_eobrun(self):
        if self.eobrun:
            nb = self.eobrun.bit_length() - 1
            self.sym(nb << 4)
            self.bits(self.eobrun - (1 << nb), nb)
            self.raw(self.bebits)
            self.bebits = []
            self.eobrun = 0


def _prog_dc_pass(em, grids, factors, mcux, mcuy, al, refine):
    pred = [0] * len(grids)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (fh, fv) in enumerate(factors):
                for by in range(fv):
                    for bx in range(fh):
                        v = int(grids[ci][my * fv + by, mx * fh + bx, 0])
                        if refine:
                            em.bits((v >> al) & 1, 1)
                            continue
                        val = v >> al  # arithmetic shift (spec F.1.5.1)
                        diff = val - pred[ci]
                        pred[ci] = val
                        t = abs(diff).bit_length()
                        em.sym(t)
                        em.bits(
                            diff if diff > 0
                            else diff + (1 << t) - 1 if t else 0,
                            t,
                        )


def _prog_ac_first_pass(em, grid, ss, se, al):
    bh, bw = grid.shape[:2]
    for by in range(bh):
        for bx in range(bw):
            blk = grid[by, bx]
            r = 0
            wrote = False
            for k in range(ss, se + 1):
                v = int(blk[k])
                av = abs(v) >> al  # AC point transform: magnitude shift
                if av == 0:
                    r += 1
                    continue
                em.flush_eobrun()
                while r > 15:
                    em.sym(0xF0)
                    r -= 16
                s = av.bit_length()
                em.sym((r << 4) | s)
                em.bits(av if v > 0 else (-av) + (1 << s) - 1, s)
                r = 0
                wrote = True
            if r > 0 or not wrote:
                em.eobrun += 1
                if em.eobrun == 0x7FFF:
                    em.flush_eobrun()
    em.flush_eobrun()


def _prog_ac_refine_pass(em, grid, ss, se, al):
    """Successive-approximation AC refinement (spec G.1.2.3): newly-
    nonzero coefficients emit (run,1) symbols; already-nonzero ones emit
    bare correction bits, buffered so they attach to the next symbol or
    EOB run."""
    bh, bw = grid.shape[:2]
    for by in range(bh):
        for bx in range(bw):
            blk = grid[by, bx]
            absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
            eobpos = ss - 1
            for i, t in enumerate(absv):
                if t == 1:
                    eobpos = ss + i
            r = 0
            pend: list[int] = []
            for k in range(ss, se + 1):
                t = absv[k - ss]
                if t == 0:
                    r += 1
                    continue
                while r > 15 and k <= eobpos:
                    em.flush_eobrun()
                    em.sym(0xF0)
                    r -= 16
                    em.raw(pend)
                    pend = []
                if t > 1:
                    pend.append(t & 1)
                    continue
                em.flush_eobrun()
                em.sym((r << 4) | 1)
                em.bits(1 if int(blk[k]) >= 0 else 0, 1)
                em.raw(pend)
                pend = []
                r = 0
            if r > 0 or pend:
                em.eobrun += 1
                em.bebits.extend(pend)
                if em.eobrun == 0x7FFF:
                    em.flush_eobrun()
    em.flush_eobrun()


def encode_progressive(
    px: np.ndarray, quant: int = 1, subsample: bool = False,
    se_split: int = 5,
) -> bytes:
    """Encode uint8 RGB (h, w, 3) or grey (h, w) to a PROGRESSIVE
    (SOF2) JPEG. The progression script exercises every scan kind of
    spec Annex G: DC first (Al=1) -> DC refinement (raw bits), then per
    component AC first over two spectral bands (1..se_split,
    se_split+1..63, Al=1) and a full-band AC refinement (Ah=1 -> Al=0)
    with EOB-run folding and buffered correction bits. Coefficients are
    identical to `encode`'s for the same (quant, subsample), so decoding
    both must give identical pixels -- the cross-codec test invariant."""
    grids, factors, qtab, h, w, ncomp, mcux, mcuy = _prep(
        px, quant, subsample
    )
    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes):
        out.extend(b"\xff" + bytes([marker]))
        out.extend(struct.pack(">H", len(body) + 2))
        out.extend(body)

    qz = np.empty(64, dtype=np.uint8)
    qz[np.arange(64)] = qtab[_ZZ].astype(np.uint8)
    seg(0xDB, bytes([0x00]) + qz.tobytes())
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        fh, fv = factors[ci]
        sof += bytes([ci + 1, (fh << 4) | fv, 0])
    seg(0xC2, bytes(sof))

    def run_scan(kind, comp_ids, ss, se, ah, al, pass_fn):
        # pass 1: collect symbols (DC refinement scans are Huffman-free)
        table = None
        if kind != "dc_refine":
            syms: set[int] = set()
            pass_fn(_ScanEmitter(symbols=syms))
            bits, vals, table = _canonical_table(syms)
            cls = 0x00 if kind == "dc_first" else 0x10
            seg(0xC4, bytes([cls]) + bytes(bits) + vals)
        sos = bytearray([len(comp_ids)])
        for ci in comp_ids:
            sos += bytes([ci + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        seg(0xDA, bytes(sos))
        wtr = _BitWriter()
        pass_fn(_ScanEmitter(writer=wtr, table=table))
        wtr.flush()
        out.extend(wtr.out)

    allc = list(range(ncomp))
    run_scan(
        "dc_first", allc, 0, 0, 0, 1,
        lambda em: _prog_dc_pass(em, grids, factors, mcux, mcuy, 1, False),
    )
    run_scan(
        "dc_refine", allc, 0, 0, 1, 0,
        lambda em: _prog_dc_pass(em, grids, factors, mcux, mcuy, 0, True),
    )
    # non-interleaved AC scans cover the component's TRUE block extent
    # (ceil of its subsampled pixel dims), not the MCU-padded grid
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)

    def _extent(ci):
        fh, fv = factors[ci]
        cw = (w * fh + hmax - 1) // hmax
        chh = (h * fv + vmax - 1) // vmax
        return grids[ci][: (chh + 7) // 8, : (cw + 7) // 8]

    for ci in range(ncomp):
        for lo, hi in ((1, se_split), (se_split + 1, 63)):
            run_scan(
                "ac_first", [ci], lo, hi, 0, 1,
                lambda em, g=_extent(ci), a=lo, b=hi:
                    _prog_ac_first_pass(em, g, a, b, 1),
            )
    for ci in range(ncomp):
        run_scan(
            "ac_refine", [ci], 1, 63, 1, 0,
            lambda em, g=_extent(ci): _prog_ac_refine_pass(em, g, 1, 63, 0),
        )
    out.extend(b"\xff\xd9")
    return bytes(out)
