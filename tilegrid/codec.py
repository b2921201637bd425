"""Tile <-> bytes codecs.

Three formats:
  png  — a real, from-scratch PNG codec (pure NumPy + zlib): 8/16-bit
         grayscale, RGB, RGBA; filters 0-4 on decode, filter 0 on encode.
         (Container has no PIL/imageio, so we implement the subset we emit.)
  jpeg — REAL baseline JPEG (ITU T.81 sequential DCT), from scratch in
         `tilegrid/jpeg.py`: batched-matrix DCT, per-image optimal Huffman
         tables, 4:4:4/4:2:0, restart markers, JFIF container. encode_tile
         uses quality 95 / 4:4:4 (PSNR >= the 40 dB invariant even on
         noise). Entropy coding walks blocks in Python, so it costs ~ms per
         tile — right for user-facing renderJpg/GeoTiff-JPEG, wrong for the
         10^6-image synthetic throughput corpus, which uses:
  fjpg — deterministic fast stand-in lossy codec (uniform quantization step
         5, PSNR ~45 dB, zlib, 'FJPG' container). Kept for the synthetic
         bench corpus where codec speed must not mask the engine's
         shuffle/join behavior; decode dispatch accepts both magics.
  raw  — little-endian ndarray bytes + dtype/shape header (+ zlib), used for
         float/int analysis layers (the reference's Avro tile codecs play
         this role: io/avro/codecs/TileCodecs.scala).

The decoded in-memory tile is a NumPy array: (h, w) single-band or
(h, w, bands) multiband, mirroring Tile/MultibandTile
(raster/.../Tile.scala:30, MultibandTile.scala:54).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


_FJPG_MAGIC = b"FJPG"
_RAW_MAGIC = b"RAWT"
_FAKE_JPEG_STEP = 5  # uniform quantization step -> ~45 dB PSNR


# ---------------------------------------------------------------- PNG encode

def png_encode(arr: np.ndarray) -> bytes:
    """Encode (h,w) or (h,w,{2,3,4}) uint8/uint16 array as PNG (filter 0)."""
    if arr.ndim == 2:
        color_type = 0
    elif arr.ndim == 3 and arr.shape[2] in (2, 3, 4):
        color_type = {2: 4, 3: 2, 4: 6}[arr.shape[2]]
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    if arr.dtype == np.uint8:
        bit_depth = 8
    elif arr.dtype == np.uint16:
        bit_depth = 16
    else:
        raise ValueError(f"unsupported dtype {arr.dtype} for png (use raw)")

    h, w = arr.shape[:2]
    if bit_depth == 16:
        raw = arr.astype(">u2").tobytes()
    else:
        raw = arr.tobytes()
    row_bytes = w * (arr.shape[2] if arr.ndim == 3 else 1) * (bit_depth // 8)
    # prepend filter byte 0 per scanline
    body = np.frombuffer(raw, dtype=np.uint8).reshape(h, row_bytes)
    scan = np.zeros((h, row_bytes + 1), dtype=np.uint8)
    scan[:, 1:] = body
    idat = zlib.compress(scan.tobytes(), 6)
    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, 0)
    return (
        PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def png_encode_indexed(
    indices: np.ndarray, palette: np.ndarray, trans: np.ndarray | None = None
) -> bytes:
    """Indexed-color PNG (color type 3): (h, w) uint8 palette indices +
    PLTE (n, 3) uint8 [+ tRNS (n,) uint8 alpha]. The reference's
    render/png/PngColorEncoding.scala Indexed mode — colormapped tiles
    store 1 byte/px instead of 4."""
    if indices.dtype != np.uint8 or indices.ndim != 2:
        raise ValueError("indices must be (h, w) uint8")
    palette = np.asarray(palette, np.uint8)
    if palette.ndim != 2 or palette.shape[1] != 3 or len(palette) > 256:
        raise ValueError("palette must be (n<=256, 3) uint8")
    if indices.max(initial=0) >= len(palette):
        raise ValueError("index out of palette range")
    h, w = indices.shape
    scan = np.zeros((h, w + 1), dtype=np.uint8)
    scan[:, 1:] = indices
    idat = zlib.compress(scan.tobytes(), 6)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    out = PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"PLTE", palette.tobytes())
    if trans is not None:
        out += _png_chunk(b"tRNS", np.asarray(trans, np.uint8).tobytes())
    return out + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b"")


# ---------------------------------------------------------------- PNG decode

def _unfilter(scan: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG filters. scan: (h, 1+stride) uint8 (filter byte + data)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = scan[y, 0]
        cur = scan[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:
            res = cur
        elif ftype == 2:  # Up
            res = (cur + prev) & 0xFF
        elif ftype == 1:  # Sub (sequential in x)
            res = cur.copy()
            for x in range(bpp, stride):
                res[x] = (res[x] + res[x - bpp]) & 0xFF
        elif ftype == 3:  # Average
            res = cur.copy()
            for x in range(stride):
                left = res[x - bpp] if x >= bpp else 0
                res[x] = (res[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            res = cur.copy()
            for x in range(stride):
                a = res[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = int(out[y - 1, x - bpp]) if (x >= bpp and y > 0) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                res[x] = (res[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = res.astype(np.uint8)
    return out


def png_decode(data: bytes) -> np.ndarray:
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = b""
    plte = trns = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if interlace:
                raise ValueError("interlaced PNG unsupported")
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(payload, np.uint8)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if color_type == 3:  # indexed: unfilter 1 byte/px, then palette-expand
        if plte is None:
            raise ValueError("indexed PNG missing PLTE")
        scan = np.frombuffer(zlib.decompress(idat), np.uint8).reshape(h, w + 1)
        idx = _unfilter(scan, h, w, 1)
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(len(plte), 255, np.uint8)
            alpha[: len(trns)] = trns
            return np.dstack([rgb, alpha[idx]])
        return rgb
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    bytes_per_sample = bit_depth // 8
    bpp = channels * bytes_per_sample
    stride = w * bpp
    raw = zlib.decompress(idat)
    scan = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    body = _unfilter(scan, h, stride, bpp)
    if bit_depth == 16:
        arr = body.reshape(h, w, channels, 2).astype(np.uint16)
        arr = (arr[..., 0] << 8) | arr[..., 1]
    else:
        arr = body.reshape(h, w, channels)
    return arr[:, :, 0] if channels == 1 else arr


# ------------------------------------------------ fake JPEG (stub, see above)

def fake_jpeg_encode(arr: np.ndarray, quality: int = 90) -> bytes:
    """STUB lossy codec (see module docstring). Deterministic."""
    if arr.dtype != np.uint8:
        raise ValueError("fake jpeg supports uint8 only")
    h, w = arr.shape[:2]
    bands = arr.shape[2] if arr.ndim == 3 else 1
    q = (arr.astype(np.uint16) // _FAKE_JPEG_STEP).astype(np.uint8)
    return (
        _FJPG_MAGIC
        + struct.pack("<IIIB", h, w, bands, quality)
        + zlib.compress(q.tobytes(), 6)
    )


def fake_jpeg_decode(data: bytes) -> np.ndarray:
    if data[:4] != _FJPG_MAGIC:
        raise ValueError("not a fake-jpeg")
    h, w, bands, _q = struct.unpack("<IIIB", data[4:17])
    q = np.frombuffer(zlib.decompress(data[17:]), dtype=np.uint8)
    arr = np.minimum(
        q.astype(np.uint16) * _FAKE_JPEG_STEP + _FAKE_JPEG_STEP // 2, 255
    ).astype(np.uint8)
    shape = (h, w) if bands == 1 else (h, w, bands)
    return arr.reshape(shape)


# ----------------------------------------------------------------- raw tiles

_DTYPE_CODES = {
    "uint8": 0, "int8": 1, "uint16": 2, "int16": 3,
    "int32": 4, "int64": 5, "float32": 6, "float64": 7,
}
_CODE_DTYPES = {v: k for k, v in _DTYPE_CODES.items()}


def raw_encode(arr: np.ndarray, compress: bool = True) -> bytes:
    h, w = arr.shape[:2]
    bands = arr.shape[2] if arr.ndim == 3 else 0  # 0 = single band 2-D
    code = _DTYPE_CODES[arr.dtype.name]
    body = np.ascontiguousarray(arr).tobytes()
    flag = 1 if compress else 0
    if compress:
        body = zlib.compress(body, 1)
    return _RAW_MAGIC + struct.pack("<IIIBB", h, w, bands, code, flag) + body


def raw_decode(data: bytes) -> np.ndarray:
    if data[:4] != _RAW_MAGIC:
        raise ValueError("not a raw tile")
    h, w, bands, code, flag = struct.unpack("<IIIBB", data[4:18])
    body = data[18:]
    if flag:
        body = zlib.decompress(body)
    arr = np.frombuffer(body, dtype=_CODE_DTYPES[code])
    shape = (h, w) if bands == 0 else (h, w, bands)
    return arr.reshape(shape).copy()


# ------------------------------------------------------------------ dispatch

def encode_tile(arr: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(arr)
    if fmt == "jpeg":
        from .jpeg import encode as jpeg_encode

        return jpeg_encode(arr, quality=95, subsample=False)
    if fmt == "fjpg":
        return fake_jpeg_encode(arr)
    if fmt == "raw":
        return raw_encode(arr)
    if fmt == "tiff":
        from .geotiff import tiff_encode

        return tiff_encode(arr)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_tile(data: bytes, fmt: str | None = None) -> np.ndarray:
    if fmt is None:  # sniff
        if data[:8] == PNG_SIG:
            fmt = "png"
        elif data[:4] == _FJPG_MAGIC:
            fmt = "fjpg"
        elif data[:2] == b"\xff\xd8":
            fmt = "jpeg"
        elif data[:4] == _RAW_MAGIC:
            fmt = "raw"
        elif data[:4] in (b"II*\x00", b"MM\x00*"):
            fmt = "tiff"
        else:
            raise ValueError("unknown tile format")
    if fmt == "png":
        return png_decode(bytes(data))
    if fmt == "jpeg":
        data = bytes(data)
        if data[:4] == _FJPG_MAGIC:  # layers stored before the real codec
            return fake_jpeg_decode(data)
        from .jpeg import decode as jpeg_decode

        return jpeg_decode(data)
    if fmt == "fjpg":
        return fake_jpeg_decode(bytes(data))
    if fmt == "raw":
        return raw_decode(bytes(data))
    if fmt == "tiff":
        from .geotiff import tiff_decode

        arr, _ = tiff_decode(bytes(data))
        return arr
    raise ValueError(f"unknown fmt {fmt!r}")


def to_gray_f64(arr: np.ndarray) -> np.ndarray:
    """Collapse a decoded image to single-band float64 (luma if RGB)."""
    if arr.ndim == 2:
        return arr.astype(np.float64)
    a = arr.astype(np.float64)
    if a.shape[2] >= 3:
        return 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]
    return a[:, :, 0]


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)
