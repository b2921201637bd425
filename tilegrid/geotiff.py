"""Minimal from-scratch GeoTiff codec (no GDAL, no PIL).

Reference: raster/src/main/scala/geotrellis/raster/io/geotiff/ (~15k LoC,
full format matrix). This module implements the working subset a tiled
ingest actually needs — enough to read/write real georeferenced rasters:

  read:  little/big-endian classic TIFF or BigTIFF (version 43, 64-bit
         offsets, LONG8/SLONG8/IFD8 types); striped or tiled layout;
         uncompressed (1), LZW (5), Deflate (8/32946), PackBits (32773);
         horizontal-differencing (2) and floating-point (3) predictors;
         8/16-bit unsigned + 32/64-bit float samples; 1 band (gray) or
         N bands, pixel-interleaved (PlanarConfiguration 1) or
         band-separate (PlanarConfiguration 2, strips and tiles); GeoTiff
         georeferencing via ModelPixelScale (33550) + ModelTiepoint
         (33922) -> Extent.
  write: little-endian, striped or TILED (tile_size=N: square tiles,
         edge-padded, TileOffsets layout), LZW / Deflate / JPEG /
         uncompressed, optional predictor 2 / 3, chunky or planar
         (planar=2: band-separate chunks), same sample types, with the
         two geo tags; classic or BigTIFF layout (bigtiff=True for
         >4 GiB outputs); chained-IFD overviews (`overviews=[...]`,
         the cloud-optimized layout) read back via
         tiff_decode(data, ifd=k) / windowed reads per level.

LZW follows the TIFF6 early-change convention the reference decodes
(LZWDecompression.scala:95-99: the decoder widens its code size when its
next table index reaches 511/1023/2047, one code earlier than GIF); the
writer flushes the dictionary with a ClearCode at 4094 like libtiff.

JPEG-in-TIFF: compression 7 (new-style) reads and writes through the
from-scratch baseline codec in tilegrid/jpeg.py — abbreviated per-chunk
streams pick their DQT/DHT up from the JPEGTables (347) tag; old-style
compression 6 reads in its common whole-image interchange form
(JPEGInterchangeFormat/Length tags 513/514). Still unsupported shapes
(per-tile compression-6 offset tables, progressive scans, 12-bit JPEG)
raise ValueError with the tag that triggered it — honest partial
coverage, not silent corruption.
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
_PREDICTOR = 317
_TILE_W, _TILE_H, _TILE_OFF, _TILE_CNT = 322, 323, 324, 325
_SAMPLE_FMT = 339
_JPEG_IF, _JPEG_IF_LEN = 513, 514  # old-style JPEG (compression 6) pointers
_JPEG_TABLES = 347
_PIXEL_SCALE, _TIEPOINT = 33550, 33922

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 11: 4, 12: 8, 16: 8, 17: 8}


def _read_ifd(data: bytes, bo: str, big: bool = False, ifd: int = 0):
    """Parse one IFD (the `ifd`-th, following next-IFD pointers — wild
    files chain overview/reduced-resolution IFDs this way). Classic TIFF:
    u32 IFD offset at byte 4, u16 entry count, 12-byte entries with a
    4-byte inline-value window. BigTIFF (version 43): u64 IFD offset at
    byte 8, u64 entry count, 20-byte entries (tag u16, type u16, count
    u64, value/offset 8 bytes) with an 8-byte inline window and
    LONG8/SLONG8/IFD8 value types."""
    if big:
        (off,) = struct.unpack_from(bo + "Q", data, 8)
    else:
        (off,) = struct.unpack_from(bo + "I", data, 4)
    for _ in range(ifd):  # hop to the requested IFD
        if off == 0:
            raise ValueError(f"TIFF has no IFD #{ifd}")
        if big:
            (n,) = struct.unpack_from(bo + "Q", data, off)
            (off,) = struct.unpack_from(bo + "Q", data, off + 8 + n * 20)
        else:
            (n,) = struct.unpack_from(bo + "H", data, off)
            (off,) = struct.unpack_from(bo + "I", data, off + 2 + n * 12)
    if off == 0:
        raise ValueError(f"TIFF has no IFD #{ifd}")
    if big:
        (n,) = struct.unpack_from(bo + "Q", data, off)
        ent0, ent_sz, inline = off + 8, 20, 8
    else:
        (n,) = struct.unpack_from(bo + "H", data, off)
        ent0, ent_sz, inline = off + 2, 12, 4
    tags: dict[int, list] = {}
    for i in range(n):
        base = ent0 + i * ent_sz
        if big:
            tag, typ = struct.unpack_from(bo + "HH", data, base)
            (cnt,) = struct.unpack_from(bo + "Q", data, base + 4)
        else:
            tag, typ, cnt = struct.unpack_from(bo + "HHI", data, base)
        size = _TYPE_SIZE.get(typ, 1) * cnt
        if size <= inline:
            vo = base + ent_sz - inline
        else:
            (vo,) = struct.unpack_from(
                bo + ("Q" if big else "I"), data, base + ent_sz - inline
            )
        if typ in (3,):
            vals = list(struct.unpack_from(bo + f"{cnt}H", data, vo))
        elif typ in (4,):
            vals = list(struct.unpack_from(bo + f"{cnt}I", data, vo))
        elif typ in (16, 18):  # LONG8 / IFD8 (BigTIFF)
            vals = list(struct.unpack_from(bo + f"{cnt}Q", data, vo))
        elif typ == 17:  # SLONG8
            vals = list(struct.unpack_from(bo + f"{cnt}q", data, vo))
        elif typ in (1, 7):  # BYTE / UNDEFINED (e.g. JPEGTables blobs)
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


_LZW_CLEAR, _LZW_EOI = 256, 257


def _lzw_decode(data: bytes) -> bytes:
    """TIFF LZW (compression 5), early-change convention: the code width
    grows when the decoder's next table index reaches 511/1023/2047
    (LZWDecompression.scala:95-99)."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    nbits = 9
    buf = nbuf = pos = 0
    n = len(data)
    prev: bytes | None = None
    while True:
        while nbuf < nbits and pos < n:
            buf = (buf << 8) | data[pos]
            pos += 1
            nbuf += 8
        if nbuf < nbits:
            break
        code = (buf >> (nbuf - nbits)) & ((1 << nbits) - 1)
        nbuf -= nbits
        buf &= (1 << nbuf) - 1
        if code == _LZW_EOI:
            break
        if code == _LZW_CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            nbits = 9
            prev = None
            continue
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt LZW stream")
        out += entry
        prev = entry
        if len(table) in (511, 1023, 2047) and nbits < 12:
            nbits += 1
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """TIFF LZW writer paired with _lzw_decode: widths grow at the writer's
    next_code 512/1024/2048 (one ahead of the reader's 511/... — the writer
    table leads by one entry), dictionary flushed at 4094."""
    out = bytearray()
    buf = 0
    nbuf = 0
    nbits = 9
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258

    def emit(code: int):
        nonlocal buf, nbuf
        buf = (buf << nbits) | code
        nbuf += nbits
        while nbuf >= 8:
            out.append((buf >> (nbuf - 8)) & 0xFF)
            nbuf -= 8
        buf &= (1 << nbuf) - 1

    emit(_LZW_CLEAR)
    omega = b""
    for b in data:
        k = omega + bytes([b])
        if k in table:
            omega = k
            continue
        emit(table[omega])
        table[k] = next_code
        next_code += 1
        if next_code in (512, 1024, 2048):
            nbits += 1
        omega = bytes([b])
        if next_code == 4094:
            emit(table[omega])
            emit(_LZW_CLEAR)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            nbits = 9
            omega = b""
    if omega:
        emit(table[omega])
    emit(_LZW_EOI)
    if nbuf:
        out.append((buf << (8 - nbuf)) & 0xFF)
    return bytes(out)


def _chunk_to_array(
    raw: bytes, predictor: int, dt: np.dtype, rows: int, width: int, spp: int
) -> np.ndarray:
    """Decompressed chunk bytes -> (rows, width, spp) array, applying the
    TIFF predictor inverse. predictor 2 = horizontal differencing per
    row/band (HorizontalPredictor.scala); 3 = floating-point byte-delta +
    plane-deinterleave (FloatingPointPredictor.scala)."""
    if predictor == 1:
        return np.frombuffer(raw, dtype=dt, count=rows * width * spp).reshape(
            rows, width, spp
        )
    if predictor == 2:
        arr = np.frombuffer(raw, dtype=dt, count=rows * width * spp)
        acc = arr.reshape(rows, width, spp).astype(np.int64)
        acc = np.cumsum(acc, axis=1)
        mod = 1 << (dt.itemsize * 8)
        return (acc % mod).astype(dt.newbyteorder("=")).reshape(rows, width, spp)
    if predictor == 3:
        bps = dt.itemsize
        by = np.frombuffer(raw, dtype=np.uint8, count=rows * width * spp * bps)
        # byte differencing runs with stride = bandCount
        # (FloatingPointPredictor.scala:56-58): undo by cumsum down each
        # stride lane
        lanes = by.reshape(rows, bps * width * spp // spp, spp).astype(np.int64)
        lanes = (np.cumsum(lanes, axis=1) % 256).astype(np.uint8)
        by = lanes.reshape(rows, bps * width * spp)
        # row layout after delta-undo: bps planes of (width*spp) bytes,
        # plane 0 = most significant byte of each sample
        planes = by.reshape(rows, bps, width * spp)
        sample_bytes = np.transpose(planes, (0, 2, 1))  # (rows, samples, bps)
        be = np.dtype(">" + {4: "f4", 8: "f8"}[bps])
        vals = np.frombuffer(np.ascontiguousarray(sample_bytes).tobytes(), dtype=be)
        return vals.astype(dt.newbyteorder("=")).reshape(rows, width, spp)
    raise ValueError(f"unsupported TIFF predictor {predictor}")


def _apply_predictor(a: np.ndarray, predictor: int) -> bytes:
    """Writer-side predictor transform of a (h, w, spp) array -> raw strip
    bytes (little-endian samples for predictor 2, plane-interleaved deltas
    for predictor 3)."""
    h, w = a.shape[:2]
    spp = a.shape[2] if a.ndim == 3 else 1
    a3 = a.reshape(h, w, spp)
    if predictor == 2:
        mod = 1 << (a.dtype.itemsize * 8)
        d = a3.astype(np.int64)
        d = np.concatenate([d[:, :1], (d[:, 1:] - d[:, :-1]) % mod], axis=1)
        return d.astype(a.dtype.newbyteorder("<")).tobytes()
    if predictor == 3:
        bps = a.dtype.itemsize
        be = a3.astype(a3.dtype.newbyteorder(">"))
        by = np.frombuffer(be.tobytes(), np.uint8).reshape(h, w * spp, bps)
        planes = np.transpose(by, (0, 2, 1)).reshape(h, bps * w * spp)
        # difference with stride = bandCount (mirror of the reader's lanes)
        lanes = planes.reshape(h, bps * w, spp).astype(np.int64)
        d = np.concatenate(
            [lanes[:, :1], (lanes[:, 1:] - lanes[:, :-1]) % 256], axis=1
        )
        return d.astype(np.uint8).reshape(h, bps * w * spp).astype(np.uint8).tobytes()
    raise ValueError(f"unsupported TIFF predictor {predictor}")


def _decompress(chunk: bytes, comp: int) -> bytes:
    if comp == 1:
        return chunk
    if comp == 5:
        return _lzw_decode(chunk)
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


def _chunk_pixels(
    data: bytes,
    off: int,
    cnt: int,
    comp: int,
    predictor: int,
    dt: np.dtype,
    rows: int,
    cols: int,
    spp: int,
    jpt: bytes | None = None,
) -> np.ndarray:
    """One strip/tile -> (rows, cols, spp) pixel array. Compression 7
    (new-style JPEG) chunks are whole baseline JPEG streams — abbreviated
    ones pick up DQT/DHT from the JPEGTables tag — decoded straight to
    pixels by tilegrid.jpeg (the reference decodes via javax.imageio:
    raster/.../io/geotiff/GeoTiffReader + JpegDecompressor); everything
    else is decompress-bytes + predictor."""
    chunk = data[off : off + cnt]
    if comp == 7:
        from . import jpeg as _jpeg

        img = _jpeg.decode(bytes(chunk), tables=jpt)
        if img.ndim == 2:
            img = img[:, :, None]
        if img.shape[2] != spp:
            raise ValueError(f"JPEG chunk has {img.shape[2]} bands, IFD says {spp}")
        return img[:rows, :cols].astype(dt.newbyteorder("="))
    raw = _decompress(chunk, comp)
    return _chunk_to_array(raw, predictor, dt, rows, cols, spp)


def _dtype(bits: int, fmt: int, bo: str) -> np.dtype:
    e = "<" if bo == "<" else ">"
    if fmt == 3:
        return np.dtype(e + {32: "f4", 64: "f8"}[bits])
    return np.dtype(e + {8: "u1", 16: "u2", 32: "u4"}[bits])


def _open_tiff(data: bytes, ifd: int = 0) -> tuple[str, dict]:
    """Parse header + the ifd-th IFD -> (byte order, tags)."""
    big = False
    if data[:4] == b"II*\x00":
        bo = "<"
    elif data[:4] == b"MM\x00*":
        bo = ">"
    elif data[:4] == b"II+\x00":
        bo, big = "<", True
    elif data[:4] == b"MM\x00+":
        bo, big = ">", True
    else:
        raise ValueError("not a TIFF (classic or BigTIFF)")
    if big:
        osz, pad = struct.unpack_from(bo + "HH", data, 4)
        if osz != 8 or pad != 0:
            raise ValueError(f"BigTIFF with offset size {osz} unsupported")
    return bo, _read_ifd(data, bo, big, ifd)


def tiff_decode(data: bytes, ifd: int = 0) -> tuple[np.ndarray, Extent | None]:
    """Decode -> ((h, w) or (h, w, bands) array, Extent or None).
    Accepts classic TIFF (version 42) and BigTIFF (version 43, 64-bit
    offsets — the layout >4 GiB rasters are written in). ifd selects a
    chained IFD (0 = full resolution, 1.. = overviews)."""
    bo, tags = _open_tiff(data, ifd)
    w, h = tags[_W][0], tags[_H][0]
    spp = tags.get(_SPP, [1])[0]
    bits = tags.get(_BITS, [8])[0]
    comp = tags.get(_COMP, [1])[0]
    fmt = tags.get(_SAMPLE_FMT, [1])[0]
    planar = tags.get(_PLANAR, [1])[0]
    if comp == 6:
        # old-style JPEG: only the common whole-image interchange form
        # (JPEGInterchangeFormat/Length point at one complete stream);
        # per-tile comp-6 offset tables stay unsupported and raise below
        if _JPEG_IF not in tags:
            raise ValueError(
                "old-style JPEG (compression 6) without JPEGInterchangeFormat"
            )
        o = tags[_JPEG_IF][0]
        ln = tags.get(_JPEG_IF_LEN, [len(data) - o])[0]
        from . import jpeg as _jpeg

        img = _jpeg.decode(bytes(data[o : o + ln]))
        if img.ndim == 2:
            img = img[:, :, None]
        arr2 = img[:h, :w, 0] if spp == 1 else img[:h, :w]
        return arr2, _geo_extent(tags, h, w)
    if planar not in (1, 2):
        raise ValueError(f"unsupported PlanarConfiguration {planar}")
    dt = _dtype(bits, fmt, bo)
    predictor = tags.get(_PREDICTOR, [1])[0]
    jpt = bytes(tags[_JPEG_TABLES]) if _JPEG_TABLES in tags else None
    out = np.zeros((h, w, spp), dtype=dt.newbyteorder("="))
    # PlanarConfiguration 2 (band-separate): the chunk sequence is band
    # 0's chunks, then band 1's, ... — each chunk holds ONE band's samples
    chunk_spp = 1 if planar == 2 else spp
    if _TILE_OFF in tags:
        tw, th = tags[_TILE_W][0], tags[_TILE_H][0]
        offs, cnts = tags[_TILE_OFF], tags[_TILE_CNT]
        tiles_across = -(-w // tw)
        per_band = len(offs) // spp if planar == 2 else len(offs)
        for idx, (o, c) in enumerate(zip(offs, cnts)):
            arr = _chunk_pixels(data, o, c, comp, predictor, dt, th, tw,
                                chunk_spp, jpt)
            b, pidx = (idx // per_band, idx % per_band) if planar == 2 else (None, idx)
            ty, tx = (pidx // tiles_across) * th, (pidx % tiles_across) * tw
            clip = arr[: min(th, h - ty), : min(tw, w - tx)]
            if planar == 2:
                out[ty : ty + th, tx : tx + tw, b : b + 1] = clip
            else:
                out[ty : ty + th, tx : tx + tw] = clip
    else:
        rps = tags.get(_ROWS_PER_STRIP, [h])[0]
        offs, cnts = tags[_STRIP_OFF], tags[_STRIP_CNT]
        per_band = len(offs) // spp if planar == 2 else len(offs)
        y = 0
        for idx, (o, c) in enumerate(zip(offs, cnts)):
            if planar == 2:
                b, pidx = idx // per_band, idx % per_band
                y = pidx * rps
            else:
                b = None
            rows = min(rps, h - y)
            arr = _chunk_pixels(data, o, c, comp, predictor, dt, rows, w,
                                chunk_spp, jpt)
            if planar == 2:
                out[y : y + rows, :, b : b + 1] = arr
            else:
                out[y : y + rows] = arr
                y += rows
    arr2 = out[:, :, 0] if spp == 1 else out
    return arr2, _geo_extent(tags, h, w)


def _geo_extent(tags: dict, h: int, w: int) -> Extent | None:
    """ModelPixelScale + ModelTiepoint -> Extent (standard NW anchor)."""
    if _PIXEL_SCALE not in tags or _TIEPOINT not in tags:
        return None
    sx, sy = tags[_PIXEL_SCALE][0], tags[_PIXEL_SCALE][1]
    tp = tags[_TIEPOINT]
    # tiepoint: raster (i, j, k) -> model (x, y, z)
    i, j, x, y_ = tp[0], tp[1], tp[3], tp[4]
    xmin = x - i * sx
    ymax = y_ + j * sy
    return Extent(xmin, ymax - h * sy, xmin + w * sx, ymax)


def tiff_decode_window(
    data: bytes, x0: int, y0: int, ww: int, wh: int, ifd: int = 0
) -> tuple[np.ndarray, Extent | None]:
    """Windowed read — decode ONLY the strips/tiles intersecting the pixel
    window [x0, x0+ww) x [y0, y0+wh) (the reference's WindowedGeoTiffReader,
    raster/.../io/geotiff/SinglebandGeoTiff.scala:61-88 + windowed docs
    docs/raster/WindowedGeoTiffReaderDemo.md). Returns ((wh, ww) or
    (wh, ww, bands) array, window Extent or None). Cost scales with the
    window's share of the file's chunks, not the file size. ifd selects a
    chained IFD (overviews)."""
    bo, tags = _open_tiff(data, ifd)
    w, h = tags[_W][0], tags[_H][0]
    if not (0 <= x0 and 0 <= y0 and x0 + ww <= w and y0 + wh <= h and ww > 0 and wh > 0):
        raise ValueError(f"window {(x0, y0, ww, wh)} outside raster {w}x{h}")
    spp = tags.get(_SPP, [1])[0]
    bits = tags.get(_BITS, [8])[0]
    comp = tags.get(_COMP, [1])[0]
    fmt = tags.get(_SAMPLE_FMT, [1])[0]
    planar = tags.get(_PLANAR, [1])[0]
    if planar not in (1, 2):
        raise ValueError(f"unsupported PlanarConfiguration {planar}")
    dt = _dtype(bits, fmt, bo)
    predictor = tags.get(_PREDICTOR, [1])[0]
    jpt = bytes(tags[_JPEG_TABLES]) if _JPEG_TABLES in tags else None
    out = np.zeros((wh, ww, spp), dtype=dt.newbyteorder("="))
    chunk_spp = 1 if planar == 2 else spp
    n_bands = spp if planar == 2 else 1
    if _TILE_OFF in tags:
        tw, th = tags[_TILE_W][0], tags[_TILE_H][0]
        offs, cnts = tags[_TILE_OFF], tags[_TILE_CNT]
        tiles_across = -(-w // tw)
        tiles_down = -(-h // th)
        per_band = tiles_across * tiles_down
        for b in range(n_bands):
            for tyi in range(y0 // th, (y0 + wh - 1) // th + 1):
                for txi in range(x0 // tw, (x0 + ww - 1) // tw + 1):
                    idx = b * per_band + tyi * tiles_across + txi
                    arr = _chunk_pixels(data, offs[idx], cnts[idx], comp,
                                        predictor, dt, th, tw, chunk_spp, jpt)
                    ty, tx = tyi * th, txi * tw
                    sy0, sx0 = max(y0 - ty, 0), max(x0 - tx, 0)
                    sy1 = min(y0 + wh - ty, th, h - ty)
                    sx1 = min(x0 + ww - tx, tw, w - tx)
                    dy0, dx0 = ty + sy0 - y0, tx + sx0 - x0
                    piece = arr[sy0:sy1, sx0:sx1]
                    if planar == 2:
                        out[dy0 : dy0 + piece.shape[0],
                            dx0 : dx0 + piece.shape[1], b : b + 1] = piece
                    else:
                        out[dy0 : dy0 + piece.shape[0],
                            dx0 : dx0 + piece.shape[1]] = piece
    else:
        rps = tags.get(_ROWS_PER_STRIP, [h])[0]
        offs, cnts = tags[_STRIP_OFF], tags[_STRIP_CNT]
        per_band = len(offs) // spp if planar == 2 else len(offs)
        for b in range(n_bands):
            for k in range(y0 // rps, (y0 + wh - 1) // rps + 1):
                idx = b * per_band + k
                sy = k * rps
                rows = min(rps, h - sy)
                arr = _chunk_pixels(data, offs[idx], cnts[idx], comp,
                                    predictor, dt, rows, w, chunk_spp, jpt)
                sy0 = max(y0 - sy, 0)
                sy1 = min(y0 + wh - sy, rows)
                dy0 = sy + sy0 - y0
                piece = arr[sy0:sy1, x0 : x0 + ww]
                if planar == 2:
                    out[dy0 : dy0 + piece.shape[0], :, b : b + 1] = piece
                else:
                    out[dy0 : dy0 + piece.shape[0]] = piece
    ext = None
    if _PIXEL_SCALE in tags and _TIEPOINT in tags:
        sx, sy = tags[_PIXEL_SCALE][0], tags[_PIXEL_SCALE][1]
        tp = tags[_TIEPOINT]
        i, j, x, y_ = tp[0], tp[1], tp[3], tp[4]
        xmin = (x - i * sx) + x0 * sx
        ymax = (y_ + j * sy) - y0 * sy
        ext = Extent(xmin, ymax - wh * sy, xmin + ww * sx, ymax)
    return (out[:, :, 0] if spp == 1 else out), ext


def tiff_encode(
    arr: np.ndarray,
    extent: Extent | None = None,
    compress: bool | str = True,
    predictor: int = 1,
    bigtiff: bool = False,
    planar: int = 1,
    rows_per_strip: int | None = None,
    overviews: list[np.ndarray] | None = None,
    tile_size: int | None = None,
) -> bytes:
    """Encode (h, w) or (h, w, bands) uint8/uint16/float32/float64 as a
    little-endian striped (Geo)TIFF. compress: True/"deflate", "lzw",
    "jpeg", False/"none". predictor: 1 (none), 2 (horizontal differencing,
    int samples), 3 (floating-point). bigtiff: version-43 layout with
    64-bit counts/offsets (strip offset/count as LONG8) — required once
    any offset would exceed 2^32; enable for >4 GiB outputs. planar: 1
    (pixel-interleaved, chunky) or 2 (PlanarConfiguration 2 — band-
    separate strips, each compressed separately). rows_per_strip: chunk
    the image into multiple strips of this many rows (default: one strip
    of h rows) — write multi-strip files so tiff_decode_window can skip
    chunks outside its window. overviews: reduced-resolution rasters
    (e.g. from tiles.block_reduce or pyramid levels) appended as chained
    IFDs over the same extent — the cloud-optimized layout; read back
    with tiff_decode(data, ifd=k). tile_size: write a TILED layout
    (TileWidth/TileLength/TileOffsets, square tiles, multiple of 16,
    edge-padded) instead of strips — 2-D windowed reads then skip whole
    tiles on both axes."""
    if bigtiff:
        header = b"II+\x00" + struct.pack("<HHQ", 8, 0, 16)
    else:
        header = b"II*\x00" + struct.pack("<I", 8)
    arrs = [arr] + list(overviews or [])
    out = bytearray(header)
    blocks: list[tuple[bytearray, int, int]] = []  # block, next-ptr pos, base
    base = len(out)
    for a2 in arrs:
        blk, npos = _encode_ifd_block(
            a2, extent, compress, predictor, bigtiff, planar, rows_per_strip,
            base, tile_size,
        )
        blocks.append((bytearray(blk), npos, base))
        base += len(blk)
    ptr_fmt = "<Q" if bigtiff else "<I"
    psz = 8 if bigtiff else 4
    for i in range(len(blocks) - 1):
        blk, npos, _ = blocks[i]
        blk[npos : npos + psz] = struct.pack(ptr_fmt, blocks[i + 1][2])
    for blk, _, _ in blocks:
        out += blk
    return bytes(out)


def _encode_ifd_block(
    arr: np.ndarray,
    extent: Extent | None,
    compress: bool | str,
    predictor: int,
    bigtiff: bool,
    planar: int,
    rows_per_strip: int | None,
    base: int,
    tile_size: int | None = None,
) -> tuple[bytes, int]:
    """One IFD + its value blobs + strip payloads, with absolute offsets
    assuming the block starts at file offset `base`. Returns (block bytes,
    position of the next-IFD pointer within the block)."""
    a = np.ascontiguousarray(arr)
    h, w = a.shape[:2]
    spp = a.shape[2] if a.ndim == 3 else 1
    if planar not in (1, 2):
        raise ValueError(f"planar must be 1 or 2, got {planar}")
    if planar == 2 and spp == 1:
        planar = 1  # single band: the two layouts are identical
    kind = a.dtype.kind
    if kind == "f":
        fmt, bits = 3, a.dtype.itemsize * 8
    elif kind == "u":
        fmt, bits = 1, a.dtype.itemsize * 8
    else:
        raise ValueError(f"unsupported dtype {a.dtype}")
    if predictor == 2 and kind != "u":
        raise ValueError("predictor 2 requires integer samples")
    if predictor == 3 and kind != "f":
        raise ValueError("predictor 3 requires float samples")

    rps = h if rows_per_strip is None else max(1, int(rows_per_strip))
    use_tiles = tile_size is not None
    if use_tiles:
        ts = int(tile_size)
        if ts <= 0 or ts % 16 != 0:
            raise ValueError("TIFF tile size must be a positive multiple of 16")
        pad_h, pad_w = (-h) % ts, (-w) % ts
        ap = np.pad(
            a, [(0, pad_h), (0, pad_w)] + ([(0, 0)] if a.ndim == 3 else []),
            mode="edge",
        )
    else:
        ap = a

    def chunk_arrays(band: np.ndarray) -> list[np.ndarray]:
        """Pixel chunks in chunk order: tiles row-major, or strips."""
        if use_tiles:
            return [
                np.ascontiguousarray(band[ty : ty + ts, tx : tx + ts])
                for ty in range(0, band.shape[0], ts)
                for tx in range(0, band.shape[1], ts)
            ]
        return [np.ascontiguousarray(band[y : y + rps]) for y in range(0, h, rps)]

    def body(rows: np.ndarray, bspp: int) -> bytes:
        if predictor == 1:
            return rows.astype(rows.dtype.newbyteorder("<")).tobytes()
        # both predictors are row-local: per-chunk == whole-image
        return _apply_predictor(
            rows.reshape(rows.shape[0], rows.shape[1], bspp), predictor
        )

    if planar == 2:
        chunks = [(c, 1) for b in range(spp) for c in chunk_arrays(ap[:, :, b])]
    else:
        chunks = [(c, spp) for c in chunk_arrays(ap)]
    if compress == "jpeg":
        # JPEG (compression 7): each strip/tile is a complete baseline
        # stream (JPEGTables omitted — legal per TIFF/EP, and decoders that
        # honor it, ours included, fall back to in-stream tables)
        if a.dtype != np.uint8 or predictor != 1 or planar != 1 or spp not in (1, 3):
            raise ValueError(
                "jpeg compression needs uint8, predictor 1, chunky planar, 1 or 3 bands"
            )
        from . import jpeg as _jpeg

        comp = 7
        payloads = [_jpeg.encode(c, quality=90, subsample=False) for c, _ in chunks]
    else:
        bodies = [body(c, bspp) for c, bspp in chunks]
        if compress is True or compress == "deflate":
            comp, payloads = 8, [zlib.compress(b, 6) for b in bodies]
        elif compress == "lzw":
            comp, payloads = 5, [_lzw_encode(b) for b in bodies]
        elif compress is False or compress in (None, "none"):
            comp, payloads = 1, bodies
        else:
            raise ValueError(f"unknown compress {compress!r}")

    entries: list[tuple[int, int, int, bytes]] = []  # tag, type, count, value
    extra: list[bytes] = []

    def add(tag: int, typ: int, vals: list, pack: str):
        cnt = len(vals)
        raw = struct.pack("<" + pack * cnt, *vals)
        entries.append((tag, typ, cnt, raw))

    off_t, off_c = ("Q", 16) if bigtiff else ("I", 4)
    add(_W, 4, [w], "I")
    add(_H, 4, [h], "I")
    add(_BITS, 3, [bits] * spp, "H")
    add(_COMP, 3, [comp], "H")
    add(_PHOTO, 3, [2 if spp >= 3 else 1], "H")
    add(_SPP, 3, [spp], "H")
    if use_tiles:
        add(_TILE_W, 4, [ts], "I")
        add(_TILE_H, 4, [ts], "I")
        add(_TILE_CNT, off_c, [len(p) for p in payloads], off_t)
    else:
        add(_ROWS_PER_STRIP, 4, [rps], "I")
        add(_STRIP_CNT, off_c, [len(p) for p in payloads], off_t)
    add(_SAMPLE_FMT, 3, [fmt] * spp, "H")
    if planar == 2:
        add(_PLANAR, 3, [2], "H")
    if predictor != 1:
        add(_PREDICTOR, 3, [predictor], "H")
    if extent is not None:
        sx = extent.width / w
        sy = extent.height / h
        add(_PIXEL_SCALE, 12, [sx, sy, 0.0], "d")
        add(_TIEPOINT, 12, [0.0, 0.0, 0.0, extent.xmin, extent.ymax, 0.0], "d")
    off_tag = _TILE_OFF if use_tiles else _STRIP_OFF
    add(off_tag, off_c, [0] * len(payloads), off_t)  # patched below

    entries.sort(key=lambda e: e[0])
    n = len(entries)
    # classic: u16 count, 12-byte entries, 4-byte inline values + 4-byte
    # next-IFD pointer; BigTIFF: u64 count, 20-byte entries, 8-byte
    # inline + 8-byte next-IFD pointer. All offsets are absolute
    # (base-relative block layout).
    inline = 8 if bigtiff else 4
    ent_sz = 20 if bigtiff else 12
    count_sz = 8 if bigtiff else 2
    data_off = base + count_sz + n * ent_sz + inline
    # lay out oversized values
    blobs = []
    for tag, typ, cnt, raw in entries:
        if len(raw) > inline:
            blobs.append((tag, data_off, raw))
            data_off += len(raw)
    strip_off = data_off
    blob_at = {t: o for t, o, _ in blobs}
    strip_offs, acc = [], strip_off
    for p in payloads:
        strip_offs.append(acc)
        acc += len(p)
    off_raw = struct.pack("<" + off_t * len(payloads), *strip_offs)

    out = bytearray()
    if bigtiff:
        out += struct.pack("<Q", n)
    else:
        out += struct.pack("<H", n)
    cnt_fmt = "<HHQ" if bigtiff else "<HHI"
    ptr_fmt = "<Q" if bigtiff else "<I"
    for tag, typ, cnt, raw in entries:
        if tag == off_tag:
            raw = off_raw
        out += struct.pack(cnt_fmt, tag, typ, cnt)
        if len(raw) > inline:
            out += struct.pack(ptr_fmt, blob_at[tag])
        else:
            out += raw.ljust(inline, b"\x00")
    next_ptr_pos = len(out)
    out += struct.pack(ptr_fmt, 0)  # patched by tiff_encode when chaining
    for tag, _, raw in blobs:
        out += off_raw if tag == off_tag else raw
    out += b"".join(payloads)
    return bytes(out), next_ptr_pos


def write_cog(
    arr: np.ndarray,
    extent: Extent | None = None,
    tile_size: int = 256,
    compress: bool | str = "deflate",
    min_dim: int = 256,
    resample: str = "average",
    bigtiff: bool = False,
) -> bytes:
    """Cloud-optimized layout in one call: tiled full-resolution IFD plus a
    chain of 2x-decimated overviews (tiles.block_reduce) down to ~min_dim.
    The reference reaches the same layout via GeoTiffBuilder + pyramid
    sinks; readers window any level with tiff_decode_window(..., ifd=k)."""
    from .tiles import block_reduce

    overviews: list[np.ndarray] = []
    cur = np.asarray(arr)
    while min(cur.shape[:2]) // 2 >= min_dim:
        red = block_reduce(cur, 2, resample)
        if np.issubdtype(arr.dtype, np.integer):
            red = np.round(red).astype(arr.dtype)
        else:
            red = red.astype(arr.dtype)
        overviews.append(red)
        cur = red
    return tiff_encode(
        arr, extent=extent, compress=compress, tile_size=tile_size,
        overviews=overviews, bigtiff=bigtiff,
    )
