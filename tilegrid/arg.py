"""Azavea Raster Grid (ARG) format: JSON metadata sidecar + big-endian
raw cell file.

Reference: raster/src/main/scala/geotrellis/raster/io/arg/{ArgWriter.scala,
ArgReader.scala, CellWriter.scala}. Metadata keys, datatype names, and cell
encodings follow the reference exactly: int8/int16/int32 big-endian with the
type's ConstantNoData sentinel (min value), uint8/uint16 with sentinel 0,
float32/float64 with NaN, bool bit-packed 8 cells/byte (row-major stream,
final partial byte flushed). "type": "constant" metadata-only tiles are read
back as filled rasters (ArgWriter.writeConstantTile)."""

from __future__ import annotations

import json
import math

import numpy as np

from .grid import Extent

__all__ = ["arg_write", "arg_read"]

# datatype -> (numpy big-endian dtype, NoData sentinel); None = NaN/bit
_TYPES: dict[str, tuple[str, int | None]] = {
    "int8": (">i1", -(1 << 7)),
    "uint8": (">u1", 0),
    "int16": (">i2", -(1 << 15)),
    "uint16": (">u2", 0),
    "int32": (">i4", -(1 << 31)),
    "float32": (">f4", None),
    "float64": (">f8", None),
}


def _infer_datatype(arr: np.ndarray) -> str:
    k = arr.dtype.kind + str(arr.dtype.itemsize)
    return {
        "i1": "int8", "u1": "uint8", "i2": "int16", "u2": "uint16",
        "i4": "int32", "f4": "float32", "f8": "float64",
    }.get(k, "float64")


def arg_write(
    base: str,
    arr: np.ndarray,
    extent: Extent,
    layer: str = "layer",
    datatype: str | None = None,
) -> None:
    """Write `base`.json + `base`.arg (ArgWriter.write). `arr` is (rows,
    cols); NaN cells become the datatype's NoData sentinel."""
    if arr.ndim != 2:
        raise ValueError("ARG stores single-band rasters")
    rows, cols = arr.shape
    datatype = datatype or ("bool" if arr.dtype == np.bool_ else _infer_datatype(arr))
    meta = {
        "layer": layer,
        "datatype": datatype,
        "type": "arg",
        "xmin": extent.xmin,
        "xmax": extent.xmax,
        "ymin": extent.ymin,
        "ymax": extent.ymax,
        "cols": cols,
        "rows": rows,
        "cellwidth": extent.width / cols,
        "cellheight": extent.height / rows,
        "epsg": 3785,  # ArgWriter.scala:49 hardcodes the legacy web-mercator code
        "yskew": 0.0,
        "xskew": 0.0,
    }
    with open(base + ".json", "w") as f:
        json.dump(meta, f, indent=2)
    if datatype == "bool":
        bits = np.packbits(arr.astype(bool).ravel())  # MSB-first, final byte padded
        body = bits.tobytes()
    else:
        dt, nd = _TYPES[datatype]
        a = np.asarray(arr, np.float64)
        if nd is None:
            body = a.astype(dt).tobytes()
        else:
            filled = np.where(np.isnan(a), float(nd), a)
            body = filled.astype(dt).tobytes()
    with open(base + ".arg", "wb") as f:
        f.write(body)


def arg_read(path: str) -> tuple[np.ndarray, Extent, dict]:
    """Read an ARG layer (ArgReader.read): `path` is the .json sidecar or
    the extension-less base. Returns (float64 array with NaN NoData,
    Extent, raw metadata dict)."""
    base = path[: -len(".json")] if path.endswith(".json") else path
    with open(base + ".json") as f:
        meta = json.load(f)
    rows, cols = int(meta["rows"]), int(meta["cols"])
    extent = Extent(meta["xmin"], meta["ymin"], meta["xmax"], meta["ymax"])
    datatype = meta["datatype"]
    ltype = meta.get("type", "arg").lower()
    if ltype == "constant":
        return np.full((rows, cols), float(meta["constant"])), extent, meta
    if ltype != "arg":
        raise ValueError(f"cannot read raster layer type {ltype!r}, must be arg")
    with open(base + ".arg", "rb") as f:
        body = f.read()
    if datatype == "bool":
        bits = np.unpackbits(np.frombuffer(body, np.uint8), count=rows * cols)
        return bits.reshape(rows, cols).astype(np.float64), extent, meta
    dt, nd = _TYPES[datatype]
    raw = np.frombuffer(body, dtype=dt, count=rows * cols).reshape(rows, cols)
    out = raw.astype(np.float64)
    if nd is not None:
        out[raw == nd] = math.nan
    return out, extent, meta
