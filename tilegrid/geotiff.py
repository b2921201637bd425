"""Minimal from-scratch GeoTiff codec (no GDAL, no PIL).

Reference: raster/src/main/scala/geotrellis/raster/io/geotiff/ (~15k LoC,
full format matrix). This module implements the working subset a tiled
ingest actually needs — enough to read/write real georeferenced rasters:

  read:  little/big-endian classic TIFF; striped or tiled layout;
         uncompressed (1), Deflate (8/32946), PackBits (32773);
         8/16-bit unsigned + 32/64-bit float samples; 1 band (gray) or
         N bands pixel-interleaved (RGB); GeoTiff georeferencing via
         ModelPixelScale (33550) + ModelTiepoint (33922) -> Extent.
  write: little-endian, striped, Deflate or uncompressed, same sample
         types, with the two geo tags.

Unsupported shapes (JPEG-in-TIFF, YCbCr, planar bands, BigTIFF) raise
ValueError with the tag that triggered it — honest partial coverage,
not silent corruption.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .grid import Extent

# tag ids
_W, _H = 256, 257
_BITS, _COMP, _PHOTO = 258, 259, 262
_STRIP_OFF, _SPP, _ROWS_PER_STRIP, _STRIP_CNT = 273, 277, 278, 279
_PLANAR = 284
_TILE_W, _TILE_H, _TILE_OFF, _TILE_CNT = 322, 323, 324, 325
_SAMPLE_FMT = 339
_PIXEL_SCALE, _TIEPOINT = 33550, 33922

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 11: 4, 12: 8, 16: 8, 17: 8}


def _read_ifd(data: bytes, bo: str):
    (off,) = struct.unpack_from(bo + "I", data, 4)
    (n,) = struct.unpack_from(bo + "H", data, off)
    tags: dict[int, list] = {}
    for i in range(n):
        base = off + 2 + i * 12
        tag, typ, cnt = struct.unpack_from(bo + "HHI", data, base)
        size = _TYPE_SIZE.get(typ, 1) * cnt
        if size <= 4:
            vo = base + 8
        else:
            (vo,) = struct.unpack_from(bo + "I", data, base + 8)
        if typ in (3,):
            vals = list(struct.unpack_from(bo + f"{cnt}H", data, vo))
        elif typ in (4,):
            vals = list(struct.unpack_from(bo + f"{cnt}I", data, vo))
        elif typ in (1,):
            vals = list(struct.unpack_from(bo + f"{cnt}B", data, vo))
        elif typ == 12:
            vals = list(struct.unpack_from(bo + f"{cnt}d", data, vo))
        elif typ == 11:
            vals = list(struct.unpack_from(bo + f"{cnt}f", data, vo))
        elif typ == 5:  # rational
            raw = struct.unpack_from(bo + f"{2 * cnt}I", data, vo)
            vals = [raw[2 * j] / max(raw[2 * j + 1], 1) for j in range(cnt)]
        else:
            vals = []
        tags[tag] = vals
    return tags


def _decompress(chunk: bytes, comp: int) -> bytes:
    if comp == 1:
        return chunk
    if comp in (8, 32946):
        return zlib.decompress(chunk)
    if comp == 32773:  # PackBits
        out = bytearray()
        i = 0
        while i < len(chunk):
            nv = chunk[i]
            n = nv - 256 if nv > 127 else nv
            i += 1
            if n >= 0:
                out += chunk[i : i + n + 1]
                i += n + 1
            elif n != -128:
                out += bytes([chunk[i]]) * (1 - n)
                i += 1
        return bytes(out)
    raise ValueError(f"unsupported TIFF compression {comp}")


def _dtype(bits: int, fmt: int, bo: str) -> np.dtype:
    e = "<" if bo == "<" else ">"
    if fmt == 3:
        return np.dtype(e + {32: "f4", 64: "f8"}[bits])
    return np.dtype(e + {8: "u1", 16: "u2", 32: "u4"}[bits])


def tiff_decode(data: bytes) -> tuple[np.ndarray, Extent | None]:
    """Decode -> ((h, w) or (h, w, bands) array, Extent or None)."""
    if data[:4] == b"II*\x00":
        bo = "<"
    elif data[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a classic TIFF")
    tags = _read_ifd(data, bo)
    w, h = tags[_W][0], tags[_H][0]
    spp = tags.get(_SPP, [1])[0]
    bits = tags.get(_BITS, [8])[0]
    comp = tags.get(_COMP, [1])[0]
    fmt = tags.get(_SAMPLE_FMT, [1])[0]
    if tags.get(_PLANAR, [1])[0] != 1:
        raise ValueError("planar (band-separate) TIFF unsupported")
    dt = _dtype(bits, fmt, bo)
    px_bytes = spp * bits // 8
    out = np.zeros((h, w, spp), dtype=dt.newbyteorder("="))
    if _TILE_OFF in tags:
        tw, th = tags[_TILE_W][0], tags[_TILE_H][0]
        offs, cnts = tags[_TILE_OFF], tags[_TILE_CNT]
        tiles_across = -(-w // tw)
        for idx, (o, c) in enumerate(zip(offs, cnts)):
            raw = _decompress(data[o : o + c], comp)
            arr = np.frombuffer(raw, dtype=dt, count=tw * th * spp).reshape(th, tw, spp)
            ty, tx = (idx // tiles_across) * th, (idx % tiles_across) * tw
            out[ty : ty + th, tx : tx + tw] = arr[: min(th, h - ty), : min(tw, w - tx)]
    else:
        rps = tags.get(_ROWS_PER_STRIP, [h])[0]
        offs, cnts = tags[_STRIP_OFF], tags[_STRIP_CNT]
        y = 0
        for o, c in zip(offs, cnts):
            raw = _decompress(data[o : o + c], comp)
            rows = min(rps, h - y)
            arr = np.frombuffer(raw, dtype=dt, count=rows * w * spp).reshape(rows, w, spp)
            out[y : y + rows] = arr
            y += rows
    ext = None
    if _PIXEL_SCALE in tags and _TIEPOINT in tags:
        sx, sy = tags[_PIXEL_SCALE][0], tags[_PIXEL_SCALE][1]
        tp = tags[_TIEPOINT]
        # tiepoint: raster (i, j, k) -> model (x, y, z); standard NW anchor
        i, j, x, y_ = tp[0], tp[1], tp[3], tp[4]
        xmin = x - i * sx
        ymax = y_ + j * sy
        ext = Extent(xmin, ymax - h * sy, xmin + w * sx, ymax)
    arr2 = out[:, :, 0] if spp == 1 else out
    return arr2, ext


def tiff_encode(
    arr: np.ndarray, extent: Extent | None = None, compress: bool = True
) -> bytes:
    """Encode (h, w) or (h, w, bands) uint8/uint16/float32/float64 as a
    little-endian striped (Geo)TIFF."""
    a = np.ascontiguousarray(arr)
    h, w = a.shape[:2]
    spp = a.shape[2] if a.ndim == 3 else 1
    kind = a.dtype.kind
    if kind == "f":
        fmt, bits = 3, a.dtype.itemsize * 8
    elif kind == "u":
        fmt, bits = 1, a.dtype.itemsize * 8
    else:
        raise ValueError(f"unsupported dtype {a.dtype}")
    body = a.astype(a.dtype.newbyteorder("<")).tobytes()
    comp = 8 if compress else 1
    payload = zlib.compress(body, 6) if compress else body

    entries: list[tuple[int, int, int, bytes]] = []  # tag, type, count, value
    extra: list[bytes] = []

    def add(tag: int, typ: int, vals: list, pack: str):
        cnt = len(vals)
        raw = struct.pack("<" + pack * cnt, *vals)
        entries.append((tag, typ, cnt, raw))

    add(_W, 4, [w], "I")
    add(_H, 4, [h], "I")
    add(_BITS, 3, [bits] * spp, "H")
    add(_COMP, 3, [comp], "H")
    add(_PHOTO, 3, [2 if spp >= 3 else 1], "H")
    add(_SPP, 3, [spp], "H")
    add(_ROWS_PER_STRIP, 4, [h], "I")
    add(_STRIP_CNT, 4, [len(payload)], "I")
    add(_SAMPLE_FMT, 3, [fmt] * spp, "H")
    if extent is not None:
        sx = extent.width / w
        sy = extent.height / h
        add(_PIXEL_SCALE, 12, [sx, sy, 0.0], "d")
        add(_TIEPOINT, 12, [0.0, 0.0, 0.0, extent.xmin, extent.ymax, 0.0], "d")
    add(_STRIP_OFF, 4, [0], "I")  # patched below

    entries.sort(key=lambda e: e[0])
    n = len(entries)
    ifd_off = 8
    data_off = ifd_off + 2 + n * 12 + 4
    # lay out oversized values
    blobs = []
    for tag, typ, cnt, raw in entries:
        if len(raw) > 4:
            blobs.append((tag, data_off, raw))
            data_off += len(raw)
    strip_off = data_off
    blob_at = {t: o for t, o, _ in blobs}

    out = bytearray()
    out += b"II*\x00" + struct.pack("<I", ifd_off)
    out += struct.pack("<H", n)
    for tag, typ, cnt, raw in entries:
        if tag == _STRIP_OFF:
            raw = struct.pack("<I", strip_off)
        out += struct.pack("<HHI", tag, typ, cnt)
        if len(raw) > 4:
            out += struct.pack("<I", blob_at[tag])
        else:
            out += raw.ljust(4, b"\x00")
    out += struct.pack("<I", 0)  # no next IFD
    for _, _, raw in blobs:
        out += raw
    out += payload
    return bytes(out)
