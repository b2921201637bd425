"""Cell types: (numpy dtype, NoData policy) pairs + masked NoData arithmetic.

Mirrors the reference's CellType lattice (raster/.../CellType.scala:119-372):
8 storage widths x {no-NoData, constant-NoData, user-defined-NoData}, with the
sentinel conventions NODATA = int32 min for ints and NaN for floats
(raster/package.scala:158-167). NoData propagation in binary ops (either side
NoData -> NoData, e.g. local/Add.scala:31-38) is centralized here so every
local/focal/zonal kernel shares one implementation.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

INT_NODATA = {
    "int8": -128,
    "uint8": 255,  # reference UByteConstantNoDataCellType uses 0; we follow
    # the reference for ubyte: see UBYTE_NODATA below
    "int16": -32768,
    "uint16": 65535,
    "int32": -2147483648,
    "int64": -9223372036854775808,
}
# reference: UByteConstantNoDataCellType noDataValue = 0 (CellType.scala),
# UShortConstantNoDataCellType = 0
REFERENCE_UNSIGNED_NODATA = {"uint8": 0, "uint16": 0}


@dataclass(frozen=True)
class CellType:
    dtype: str                      # numpy dtype name
    nodata: float | int | None      # None = no NoData; NaN for float consts

    @property
    def np_dtype(self) -> np.dtype:
        return np.dtype(self.dtype)

    @property
    def is_float(self) -> bool:
        return self.np_dtype.kind == "f"

    @property
    def has_nodata(self) -> bool:
        if self.nodata is None:
            return False
        return True

    @property
    def name(self) -> str:
        if self.nodata is None:
            return f"{self.dtype}raw"
        if self.is_float and isinstance(self.nodata, float) and np.isnan(self.nodata):
            return self.dtype
        return f"{self.dtype}ud{self.nodata}"

    def to_json(self) -> dict:
        nd = self.nodata
        if nd is not None and isinstance(nd, float) and np.isnan(nd):
            nd = "nan"
        return {"dtype": self.dtype, "nodata": nd}

    @staticmethod
    def from_json(d: dict) -> "CellType":
        nd = d["nodata"]
        if nd == "nan":
            nd = float("nan")
        return CellType(d["dtype"], nd)


# canonical constant-NoData cell types (reference case objects CellType.scala:322-372)
BIT = CellType("uint8", None)                      # bit cells have no NoData
INT8 = CellType("int8", INT_NODATA["int8"])
UINT8 = CellType("uint8", REFERENCE_UNSIGNED_NODATA["uint8"])
INT16 = CellType("int16", INT_NODATA["int16"])
UINT16 = CellType("uint16", REFERENCE_UNSIGNED_NODATA["uint16"])
INT32 = CellType("int32", INT_NODATA["int32"])
FLOAT32 = CellType("float32", float("nan"))
FLOAT64 = CellType("float64", float("nan"))
UINT8_RAW = CellType("uint8", None)
FLOAT64_RAW = CellType("float64", None)

_WIDEN_ORDER = ["uint8", "int8", "uint16", "int16", "int32", "int64", "float32", "float64"]


def union(a: CellType, b: CellType) -> CellType:
    """Widening union used when merging layers (TileLayerMetadata.scala:127)."""
    dt = np.promote_types(a.np_dtype, b.np_dtype).name
    if a.nodata is None and b.nodata is None:
        nd = None
    elif np.dtype(dt).kind == "f":
        nd = float("nan")
    else:
        nd = INT_NODATA.get(dt, None)
    return CellType(dt, nd)


def isdata(arr: np.ndarray, ct: CellType) -> np.ndarray:
    """Boolean mask of data (non-NoData) cells."""
    if ct.nodata is None:
        return np.ones(arr.shape, dtype=bool)
    if ct.is_float or (isinstance(ct.nodata, float) and np.isnan(ct.nodata)):
        if arr.dtype.kind == "f":
            return ~np.isnan(arr)
        return np.ones(arr.shape, dtype=bool)
    return arr != ct.nodata


def to_masked_double(arr: np.ndarray, ct: CellType) -> np.ndarray:
    """Promote to float64 with NoData as NaN — the uniform compute repr."""
    out = arr.astype(np.float64, copy=True)
    if ct.nodata is not None and not ct.is_float:
        out[arr == ct.nodata] = np.nan
    return out


def from_masked_double(arr: np.ndarray, ct: CellType) -> np.ndarray:
    """Demote float64-with-NaN back to the cell type's storage dtype."""
    if ct.is_float:
        return arr.astype(ct.np_dtype)
    out = arr.copy()
    nanmask = np.isnan(out)
    if ct.nodata is not None:
        out[nanmask] = ct.nodata
    else:
        out[nanmask] = 0
    info = np.iinfo(ct.np_dtype)
    return np.clip(out, info.min, info.max).astype(ct.np_dtype)


def binary_nodata(f, a: np.ndarray, b: np.ndarray, ct: CellType) -> np.ndarray:
    """Apply binary ufunc f with reference NoData propagation: either side
    NoData -> NoData (local/Add.scala:31-38)."""
    if ct.nodata is None:
        return f(a, b)
    da, db = to_masked_double(a, ct), to_masked_double(b, ct)
    with np.errstate(invalid="ignore", divide="ignore"):
        out = f(da, db)
    out[np.isnan(da) | np.isnan(db)] = np.nan
    return from_masked_double(out, ct)
