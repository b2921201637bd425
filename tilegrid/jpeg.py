"""Baseline JPEG (ITU T.81 sequential DCT, 8-bit) encoder + decoder,
from scratch in NumPy.

Replaces the round-1 declared-fake codec so `fmt='jpeg'` tiles and
`renderJpg` (reference: raster/src/main/scala/geotrellis/raster/render/
JpgRenderMethods.scala and render/jpg/) are a real capability, and so the
GeoTiff reader can decode JPEG-compressed strips/tiles (reference:
raster/.../io/geotiff/compression/JpegDecompression — via javax.imageio
there; implemented here).

Scope: baseline sequential (SOF0), grayscale or YCbCr 4:4:4 / 4:2:0,
restart markers, abbreviated streams with externally supplied tables
(TIFF compression 7 `JPEGTables`). The encoder computes per-image optimal
Huffman tables with the T.81 Annex K.2 length-limited procedure (what
libjpeg's optimize_coding does) — every table used is written to DHT, and
the decoder consumes arbitrary valid DHT/DQT, so wild files with the
Annex K default tables decode too.

DCT is the exact orthonormal 8x8 transform as a batched matrix product
(whole-image einsum — no per-pixel Python). Entropy coding walks blocks in
Python, which is fine at tile sizes (<= 256x256); tiles decode inside
Arrow batches on executors, so the engine-level parallelism is Spark's.
"""

from __future__ import annotations

import math
import struct

import numpy as np

__all__ = ["encode", "decode", "JpegError"]


class JpegError(ValueError):
    pass


# --------------------------------------------------------------- constants


def _zigzag() -> np.ndarray:
    order = []
    for s in range(15):
        diag = [(i, s - i) for i in range(s + 1) if 0 <= i < 8 and 0 <= s - i < 8]
        if s % 2 == 0:
            diag = diag[::-1]
        order += [r * 8 + c for (r, c) in diag]
    return np.array(order, np.int32)


_ZZ = _zigzag()  # raster index of the k-th zigzag position
_UNZZ = np.argsort(_ZZ)

# Annex K.1 example quantization tables (the universally used defaults)
_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    np.int32,
).reshape(8, 8)
_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    np.int32,
).reshape(8, 8)

_C = np.zeros((8, 8))
for _u in range(8):
    _a = math.sqrt(0.125) if _u == 0 else 0.5
    for _i in range(8):
        _C[_u, _i] = _a * math.cos((2 * _i + 1) * _u * math.pi / 16.0)
_CT = _C.T.copy()


def _qtable(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _fdct(blocks: np.ndarray) -> np.ndarray:
    # blocks (..., 8, 8) spatial -> coefficients
    return np.einsum("ui,...ij,jv->...uv", _C, blocks, _CT, optimize=True)


def _idct(coefs: np.ndarray) -> np.ndarray:
    return np.einsum("iu,...uv,vj->...ij", _CT, coefs, _C, optimize=True)


# ------------------------------------------------- Huffman table construction


def _code_lengths(freq_in: np.ndarray) -> tuple[list[int], list[int]]:
    """T.81 K.2 optimal length-limited (<=16) Huffman code sizes.
    Returns (bits[1..16] counts, symbol list ordered for DHT)."""
    freq = freq_in.astype(np.int64).copy()
    freq = np.append(freq, 1)  # reserved symbol 256 guarantees no all-1s code
    codesize = np.zeros(257, np.int64)
    others = np.full(257, -1, np.int64)
    while True:
        nz = np.nonzero(freq)[0]
        if len(nz) <= 1:
            break
        # v1 = least frequent (ties -> larger index), v2 = next least
        order = nz[np.lexsort((-nz, freq[nz]))]
        v1, v2 = int(order[0]), int(order[1])
        freq[v1] += freq[v2]
        freq[v2] = 0
        codesize[v1] += 1
        while others[v1] != -1:
            v1 = int(others[v1])
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] != -1:
            v2 = int(others[v2])
            codesize[v2] += 1
    bits = np.zeros(60, np.int64)
    for s in codesize:
        if s:
            bits[int(s)] += 1
    i = len(bits) - 1  # Adjust_BITS: fold code lengths > 16
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    i = 16
    while i > 0 and bits[i] == 0:
        i -= 1
    if i > 0:
        bits[i] -= 1  # drop the reserved symbol's code
    syms = [s for s in range(256) if codesize[s] > 0]
    syms.sort(key=lambda s: (codesize[s], s))
    out_bits = [int(b) for b in bits[1:17]]
    assert sum(out_bits) == len(syms)
    return out_bits, syms


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (ln, code)
            code += 1
            k += 1
        code <<= 1
    return codes


# ------------------------------------------------------------------ encoder


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)


def _csize(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _to_blocks(comp: np.ndarray) -> np.ndarray:
    h, w = comp.shape
    return comp.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def _pad_edge(a: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = a.shape[:2]
    ph = (mh - h % mh) % mh
    pw = (mw - w % mw) % mw
    if ph or pw:
        a = np.pad(a, [(0, ph), (0, pw)] + [(0, 0)] * (a.ndim - 2), mode="edge")
    return a


def encode(
    arr: np.ndarray,
    quality: int = 90,
    subsample: bool = True,
    restart_interval: int = 0,
) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 to a baseline JFIF
    stream. RGB uses YCbCr 4:2:0 when subsample else 4:4:4."""
    if arr.dtype != np.uint8:
        raise JpegError("jpeg encoder expects uint8")
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    if arr.ndim not in (2, 3) or (arr.ndim == 3 and arr.shape[2] != 3):
        raise JpegError("jpeg encoder expects (h,w) or (h,w,3)")
    H, W = arr.shape[:2]
    gray = arr.ndim == 2
    qt = [_qtable(_Q_LUMA, quality), _qtable(_Q_CHROMA, quality)]

    if gray:
        comps = [(arr.astype(np.float64), 1, 1, 0)]
        hmax = vmax = 1
    else:
        rgb = arr.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = -0.168735892 * rgb[..., 0] - 0.331264108 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128.0
        cr = 0.5 * rgb[..., 0] - 0.418687589 * rgb[..., 1] - 0.081312411 * rgb[..., 2] + 128.0
        if subsample:
            hmax = vmax = 2
            yp = _pad_edge(y, 16, 16)
            # 2x2 box mean on the padded plane
            def half(c):
                cp = _pad_edge(c, 16, 16)
                return (cp[0::2, 0::2] + cp[0::2, 1::2] + cp[1::2, 0::2] + cp[1::2, 1::2]) / 4.0
            comps = [(yp, 2, 2, 0), (half(cb), 1, 1, 1), (half(cr), 1, 1, 1)]
        else:
            hmax = vmax = 1
            comps = [(y, 1, 1, 0), (cb, 1, 1, 1), (cr, 1, 1, 1)]

    # quantized zigzag coefficients per component
    qcoef = []
    for plane, hi, vi, tq in comps:
        plane = _pad_edge(plane, 8, 8)
        blocks = _to_blocks(plane - 128.0)
        coefs = _fdct(blocks)
        q = np.round(coefs / qt[tq]).astype(np.int32)
        # store in zigzag order: position k holds raster coefficient _ZZ[k]
        qcoef.append(q.reshape(q.shape[0], q.shape[1], 64)[..., _ZZ])

    mcus_x = qcoef[0].shape[1] // comps[0][1]
    mcus_y = qcoef[0].shape[0] // comps[0][2]

    # token stream: (class, tid, symbol, extra_len, extra_val)
    tokens: list[tuple[int, int, int, int, int]] = []
    pred = [0] * len(comps)
    nmcu = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and nmcu and nmcu % restart_interval == 0:
                tokens.append((2, rst & 7, 0, 0, 0))  # RST marker token
                rst += 1
                pred = [0] * len(comps)
            nmcu += 1
            for ci, (plane, hi, vi, tq) in enumerate(comps):
                for by in range(vi):
                    for bx in range(hi):
                        blk = qcoef[ci][my * vi + by, mx * hi + bx]
                        diff = int(blk[0]) - pred[ci]
                        pred[ci] = int(blk[0])
                        s = _csize(diff)
                        extra = diff if diff >= 0 else diff + (1 << s) - 1
                        tokens.append((0, 0 if ci == 0 else 1, s, s, extra))
                        run = 0
                        nz = np.nonzero(blk[1:])[0]
                        last = int(nz[-1]) + 1 if len(nz) else 0
                        for k in range(1, last + 1):
                            v = int(blk[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                tokens.append((1, 0 if ci == 0 else 1, 0xF0, 0, 0))
                                run -= 16
                            s = _csize(v)
                            extra = v if v >= 0 else v + (1 << s) - 1
                            tokens.append((1, 0 if ci == 0 else 1, (run << 4) | s, s, extra))
                            run = 0
                        if last < 63:
                            tokens.append((1, 0 if ci == 0 else 1, 0x00, 0, 0))

    # per-(class, id) optimal Huffman tables
    n_t = 1 if gray else 2
    freqs = {(cls, tid): np.zeros(256, np.int64) for cls in (0, 1) for tid in range(n_t)}
    for cls, tid, sym, _, _ in tokens:
        if cls < 2:
            freqs[(cls, tid)][sym] += 1
    tables = {}
    for key, fr in freqs.items():
        if fr.sum() == 0:
            fr[0] = 1
        tables[key] = _code_lengths(fr)
    codes = {k: _canonical_codes(*v) for k, v in tables.items()}

    # ---- emit stream
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid in range(n_t):
        z = qt[tid].reshape(64)[_ZZ]
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(int(v) for v in z)
    nc = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, H, W, nc)
    for ci, (_, hi, vi, tq) in enumerate(comps):
        out += struct.pack(">BBB", ci + 1, (hi << 4) | vi, tq)
    for (cls, tid), (bits, vals) in sorted(tables.items()):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), (cls << 4) | tid)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        tid = 0 if ci == 0 else 1
        out += struct.pack(">BB", ci + 1, (tid << 4) | tid)
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 AhAl=0

    bw = _BitWriter()
    for cls, tid, sym, xlen, xval in tokens:
        if cls == 2:  # restart marker
            bw.flush()
            out += bytes(bw.buf)
            bw = _BitWriter()
            out += bytes((0xFF, 0xD0 + tid))
            continue
        ln, code = codes[(cls, tid)][sym]
        bw.put(code, ln)
        if xlen:
            bw.put(xval, xlen)
    bw.flush()
    out += bytes(bw.buf)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------------ decoder


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise JpegError("entropy data truncated")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


class _HuffTable:
    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code, k = 0, 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1
        self.vals = vals

    def decode(self, br: _BitReader) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | br.bit()
            if self.maxcode[ln] >= code >= self.mincode[ln]:
                return self.vals[self.valptr[ln] + code - self.mincode[ln]]
        raise JpegError("bad Huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


class _State:
    def __init__(self) -> None:
        self.qt: dict[int, np.ndarray] = {}
        self.huff: dict[tuple[int, int], _HuffTable] = {}
        self.restart = 0


def _parse_tables(data: bytes, st: _State) -> None:
    """Consume DQT/DHT/DRI segments of a tables-only stream (TIFF
    JPEGTables tag) or any marker run."""
    i = 0
    n = len(data)
    while i < n - 1:
        if data[i] != 0xFF:
            i += 1
            continue
        m = data[i + 1]
        if m in (0xD8, 0xD9, 0x01) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        if i + 4 > n:
            break
        ln = struct.unpack(">H", data[i + 2 : i + 4])[0]
        seg = data[i + 4 : i + 2 + ln]
        if m == 0xDB:
            _read_dqt(seg, st)
        elif m == 0xC4:
            _read_dht(seg, st)
        elif m == 0xDD:
            st.restart = struct.unpack(">H", seg[:2])[0]
        i += 2 + ln


def _read_dqt(seg: bytes, st: _State) -> None:
    i = 0
    while i < len(seg):
        pq, tq = seg[i] >> 4, seg[i] & 15
        i += 1
        if pq == 0:
            z = np.frombuffer(seg[i : i + 64], np.uint8).astype(np.int32)
            i += 64
        else:
            z = np.frombuffer(seg[i : i + 128], ">u2").astype(np.int32)
            i += 128
        tbl = np.zeros(64, np.int32)
        tbl[_ZZ] = z
        st.qt[tq] = tbl.reshape(8, 8)


def _read_dht(seg: bytes, st: _State) -> None:
    i = 0
    while i < len(seg):
        cls, tid = seg[i] >> 4, seg[i] & 15
        bits = list(seg[i + 1 : i + 17])
        nv = sum(bits)
        vals = list(seg[i + 17 : i + 17 + nv])
        st.huff[(cls, tid)] = _HuffTable(bits, vals)
        i += 17 + nv


def decode(data: bytes, tables: bytes | None = None) -> np.ndarray:
    """Decode a baseline JPEG stream to (h, w) uint8 or (h, w, 3) RGB.
    `tables` optionally preloads DQT/DHT from a TIFF `JPEGTables` blob for
    abbreviated per-tile streams."""
    st = _State()
    if tables:
        _parse_tables(tables, st)
    if data[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (no SOI)")
    i = 2
    n = len(data)
    frame = None
    out = None
    while i < n - 1:
        if data[i] != 0xFF:
            i += 1
            continue
        m = data[i + 1]
        if m == 0xD9:  # EOI
            break
        if m in (0x01,) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        ln = struct.unpack(">H", data[i + 2 : i + 4])[0]
        seg = data[i + 4 : i + 2 + ln]
        if m == 0xDB:
            _read_dqt(seg, st)
        elif m == 0xC4:
            _read_dht(seg, st)
        elif m == 0xDD:
            st.restart = struct.unpack(">H", seg[:2])[0]
        elif m in (0xC0, 0xC1):  # baseline / extended sequential Huffman
            prec, H, W, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise JpegError(f"unsupported precision {prec}")
            frame = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                frame.append([cid, hv >> 4, hv & 15, tq])
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError(f"unsupported JPEG mode (SOF{m - 0xC0})")
        elif m == 0xDA:
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = seg[0]
            sel = {}
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                sel[cs] = (tt >> 4, tt & 15)
            # entropy-coded data runs to the next non-RST marker
            j = i + 2 + ln
            segs: list[bytes] = []
            cur = bytearray()
            while j < n - 1:
                if data[j] == 0xFF:
                    nxt = data[j + 1]
                    if nxt == 0x00:
                        cur.append(0xFF)
                        j += 2
                        continue
                    if nxt == 0xFF:  # fill byte before a marker (T.81 B.1.1.2)
                        j += 1
                        continue
                    if 0xD0 <= nxt <= 0xD7:
                        segs.append(bytes(cur))
                        cur = bytearray()
                        j += 2
                        continue
                    break
                cur.append(data[j])
                j += 1
            if j == n - 1 and data[j] != 0xFF:
                cur.append(data[j])  # stream truncated without EOI
            segs.append(bytes(cur))
            out = _decode_scan(st, frame, sel, segs, H, W)
            i = j
            continue
        i += 2 + ln
    if out is None:
        raise JpegError("no scan decoded")
    return out


def _decode_scan(st, frame, sel, segs, H, W):
    hmax = max(c[1] for c in frame)
    vmax = max(c[2] for c in frame)
    mcus_x = -(-W // (8 * hmax))
    mcus_y = -(-H // (8 * vmax))
    coef = {}
    for cid, hi, vi, tq in frame:
        coef[cid] = np.zeros((mcus_y * vi, mcus_x * hi, 64), np.int32)
    pred = {c[0]: 0 for c in frame}
    si = 0
    br = _BitReader(segs[0])
    mcu = 0
    per_seg = st.restart if st.restart else mcus_x * mcus_y
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if mcu and mcu % per_seg == 0 and si + 1 < len(segs):
                si += 1
                br = _BitReader(segs[si])
                pred = {c[0]: 0 for c in frame}
            mcu += 1
            for cid, hi, vi, tq in frame:
                dct_t = st.huff.get((0, sel[cid][0]))
                act = st.huff.get((1, sel[cid][1]))
                if dct_t is None or act is None:
                    raise JpegError("missing Huffman table")
                for by in range(vi):
                    for bx in range(hi):
                        blk = coef[cid][my * vi + by, mx * hi + bx]
                        s = dct_t.decode(br)
                        diff = _extend(br.bits(s), s) if s else 0
                        pred[cid] += diff
                        blk[0] = pred[cid]
                        k = 1
                        while k <= 63:
                            rs = act.decode(br)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise JpegError("AC index overflow")
                            blk[k] = _extend(br.bits(s), s)
                            k += 1
    planes = {}
    for cid, hi, vi, tq in frame:
        qtab = st.qt.get(tq)
        if qtab is None:
            raise JpegError("missing quant table")
        z = coef[cid]
        # de-zigzag: stored zigzag -> raster
        rast = np.zeros_like(z)
        rast[:, :, _ZZ] = z
        blocks = rast.reshape(z.shape[0], z.shape[1], 8, 8).astype(np.float64)
        spatial = _idct(blocks * qtab) + 128.0
        by, bx = spatial.shape[0], spatial.shape[1]
        plane = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        # upsample to full MCU grid resolution
        ry, rx = vmax // vi, hmax // hi
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes[cid] = plane[:H, :W]
    if len(frame) == 1:
        return np.clip(np.round(planes[frame[0][0]]), 0, 255).astype(np.uint8)
    if len(frame) == 3:
        ids = [c[0] for c in frame]
        y, cb, cr = planes[ids[0]], planes[ids[1]] - 128.0, planes[ids[2]] - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136286 * cb - 0.714136286 * cr
        b = y + 1.772 * cb
        return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
    raise JpegError(f"unsupported component count {len(frame)}")
