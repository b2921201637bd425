"""Datum grid-shift tables (NADCON/NTv1 style) — proj.4's nad_cvt/nad_intr
re-created vectorized.

Reference: proj4/src/main/java/org/osgeo/proj4j/datum/Grid.java:88-310
(pj_apply_gridshift / nad_cvt / nad_intr), CTABLEV2.java (the proj.4
"CTABLE V2" little-endian binary table) and NTV1.java (the Canadian NTv1
big-endian grid, arc-seconds, west-positive longitudes). Formats
implemented from those published binary layouts; both a reader AND a
writer exist here so tests build their own synthetic grid files rather
than shipping any grid data.

A table maps geodetic (lam, phi) radians to (dlam, dphi) shift radians on
a regular grid anchored at `ll` with spacing `del`; the shift to the
target datum (WGS84/NAD83) is `lam - dlam, phi + dphi` with bilinear
interpolation between nodes (nad_intr); the inverse is a fixed-point
iteration (nad_cvt, MAX_TRY/TOL verbatim). All entry points are
NumPy-vectorized over point batches — this is the raster-warp / column
batch path, same execution shape as the Helmert route in proj.py.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

MAX_TRY = 9       # Grid.java:63
TOL = 1e-12       # Grid.java:64
_SEC2RAD = np.pi / 180.0 / 3600.0
_D2R = np.pi / 180.0


@dataclass(frozen=True)
class ConversionTable:
    """Grid.ConversionTable: ll/del in radians, cvs shape (nphi, nlam, 2)
    holding (dlam, dphi) radians (float32, like the reference's
    FloatPolarCoordinate nodes)."""

    id: str
    ll: tuple[float, float]      # (lam0, phi0)
    del_: tuple[float, float]    # (dlam, dphi) node spacing
    lim: tuple[int, int]         # (nlam, nphi)
    cvs: np.ndarray              # float32 (nphi, nlam, 2)


# ------------------------------------------------------------- CTABLE V2

_CT2_MAGIC = b"CTABLE V2"


def parse_ctable2(data: bytes) -> ConversionTable:
    """CTABLEV2.java:44-76: 160-byte header — magic at 0, id at 16 (80
    bytes, NUL-padded), ll doubles at 96/104, del at 112/120, lim ints at
    128/132 (all little-endian); then lim.lam*lim.phi (dlam, dphi) float32
    pairs row-major from the south-west corner."""
    if data[:len(_CT2_MAGIC)] != _CT2_MAGIC:
        raise ValueError("not a CTABLE V2 file")
    cid = data[16:96].split(b"\0", 1)[0].decode("ascii").strip()
    ll = struct.unpack_from("<dd", data, 96)
    dl = struct.unpack_from("<dd", data, 112)
    nlam, nphi = struct.unpack_from("<ii", data, 128)
    if not (1 <= nlam <= 100000 and 1 <= nphi <= 100000):
        raise ValueError(f"grid position counts out of range: {nlam}x{nphi}")
    cvs = np.frombuffer(data, dtype="<f4", count=nlam * nphi * 2, offset=160)
    return ConversionTable(cid, (ll[0], ll[1]), (dl[0], dl[1]), (nlam, nphi),
                           cvs.reshape(nphi, nlam, 2).copy())


def write_ctable2(table: ConversionTable) -> bytes:
    header = bytearray(160)
    header[:len(_CT2_MAGIC)] = _CT2_MAGIC
    cid = table.id.encode("ascii")[:79]
    header[16:16 + len(cid)] = cid
    struct.pack_into("<dd", header, 96, *table.ll)
    struct.pack_into("<dd", header, 112, *table.del_)
    struct.pack_into("<ii", header, 128, *table.lim)
    body = np.ascontiguousarray(table.cvs, dtype="<f4").tobytes()
    return bytes(header) + body


# ------------------------------------------------------------------ NTv1

def parse_ntv1(data: bytes) -> ConversionTable:
    """NTV1.java:45-91: big-endian, header 176 bytes ('HEADER' at 0,
    'W GRID' at 96, 'TO      NAD83' at 144, record count 12 at 8); bounds
    in degrees (south at 24, north at 40, east at 56, west at 72 —
    west-positive, hence the sign flips), spacing at 88 (phi) / 104 (lam);
    rows south->north, each row's nodes stored EAST->west (reversed on
    load), values (dphi, dlam)... per the reference's assignment order:
    node = (row_buff[2i], row_buff[2i+1]) as (dlam, dphi) arc-seconds."""
    if not (data[0:6] == b"HEADER" and data[96:102] == b"W GRID"):
        raise ValueError("not an NTv1 file")
    (count,) = struct.unpack_from(">i", data, 8)
    if count != 12:
        raise ValueError(f"NTv1 record count {count} != 12")
    ll_phi = struct.unpack_from(">d", data, 24)[0]
    ur_phi = struct.unpack_from(">d", data, 40)[0]
    ur_lam = -struct.unpack_from(">d", data, 56)[0]
    ll_lam = -struct.unpack_from(">d", data, 72)[0]
    dphi = struct.unpack_from(">d", data, 88)[0]
    dlam = struct.unpack_from(">d", data, 104)[0]
    nlam = int(abs(ur_lam - ll_lam) / dlam + 0.5) + 1
    nphi = int(abs(ur_phi - ll_phi) / dphi + 0.5) + 1
    raw = np.frombuffer(data, dtype=">f8", count=nlam * nphi * 2, offset=176)
    raw = raw.reshape(nphi, nlam, 2)
    cvs = (raw[:, ::-1, :] * _SEC2RAD).astype(np.float32)
    return ConversionTable(
        "NTv1 Grid Shift File",
        (ll_lam * _D2R, ll_phi * _D2R), (dlam * _D2R, dphi * _D2R),
        (nlam, nphi), cvs)


def write_ntv1(table: ConversionTable) -> bytes:
    """Inverse of parse_ntv1 (test fixture builder)."""
    nlam, nphi = table.lim
    header = bytearray(176)
    header[0:6] = b"HEADER"
    struct.pack_into(">i", header, 8, 12)
    header[96:102] = b"W GRID"
    header[144:160] = b"TO      NAD83   "
    ll_lam_deg = table.ll[0] / _D2R
    ll_phi_deg = table.ll[1] / _D2R
    dlam_deg = table.del_[0] / _D2R
    dphi_deg = table.del_[1] / _D2R
    struct.pack_into(">d", header, 24, ll_phi_deg)
    struct.pack_into(">d", header, 40, ll_phi_deg + (nphi - 1) * dphi_deg)
    struct.pack_into(">d", header, 56, -(ll_lam_deg + (nlam - 1) * dlam_deg))
    struct.pack_into(">d", header, 72, -ll_lam_deg)
    struct.pack_into(">d", header, 88, dphi_deg)
    struct.pack_into(">d", header, 104, dlam_deg)
    body = (np.ascontiguousarray(table.cvs[:, ::-1, :], dtype=np.float64)
            / _SEC2RAD).astype(">f8").tobytes()
    return bytes(header) + body


def parse_grid(data: bytes) -> ConversionTable:
    """Format sniff, Grid.gridinfoInit:342-355."""
    if data[:len(_CT2_MAGIC)] == _CT2_MAGIC:
        return parse_ctable2(data)
    if data[0:6] == b"HEADER" and data[96:102] == b"W GRID":
        return parse_ntv1(data)
    raise ValueError("unknown grid format (expected CTABLE V2 or NTv1)")


# ------------------------------------------------------------ interp/shift

def nad_interp(table: ConversionTable, lam, phi):
    """Vectorized nad_intr (Grid.java:253-310): bilinear over the 4
    surrounding nodes with the exact edge-tolerance backoffs; input is
    TABLE-RELATIVE radians (already minus ll); NaN outside the grid."""
    nlam, nphi = table.lim
    tl = np.asarray(lam, np.float64) / table.del_[0]
    tp = np.asarray(phi, np.float64) / table.del_[1]
    il = np.floor(tl).astype(np.int64)
    ip = np.floor(tp).astype(np.int64)
    fl = tl - il
    fp = tp - ip

    # edge backoffs (verbatim tolerances)
    low = (il == -1) & (fl > 0.99999999999)
    il = np.where(low, il + 1, il)
    fl = np.where(low, 0.0, fl)
    high = (il + 1 == nlam) & (fl < 1e-11)
    il = np.where(high, il - 1, il)
    fl = np.where(high, 1.0, fl)
    lowp = (ip == -1) & (fp > 0.99999999999)
    ip = np.where(lowp, ip + 1, ip)
    fp = np.where(lowp, 0.0, fp)
    highp = (ip + 1 == nphi) & (fp < 1e-11)
    ip = np.where(highp, ip - 1, ip)
    fp = np.where(highp, 1.0, fp)

    ok = (il >= 0) & (il + 1 < nlam) & (ip >= 0) & (ip + 1 < nphi)
    ils = np.clip(il, 0, nlam - 2)
    ips = np.clip(ip, 0, nphi - 2)
    f00 = table.cvs[ips, ils]
    f10 = table.cvs[ips, ils + 1]
    f01 = table.cvs[ips + 1, ils]
    f11 = table.cvs[ips + 1, ils + 1]
    m10 = fl * (1.0 - fp)
    m00 = (1.0 - fl) * (1.0 - fp)
    m11 = fl * fp
    m01 = (1.0 - fl) * fp
    dlam = m00 * f00[..., 0] + m10 * f10[..., 0] + m01 * f01[..., 0] + m11 * f11[..., 0]
    dphi = m00 * f00[..., 1] + m10 * f10[..., 1] + m01 * f01[..., 1] + m11 * f11[..., 1]
    return np.where(ok, dlam, np.nan), np.where(ok, dphi, np.nan)


def _norm_lon(x):
    return (np.asarray(x) + np.pi) % (2.0 * np.pi) - np.pi


def nad_convert(table: ConversionTable, lam, phi, inverse: bool = False):
    """Vectorized nad_cvt (Grid.java:199-250). Forward (to the target
    datum): lam' = lam - dlam, phi' = phi + dphi. Inverse: fixed-point
    iteration, MAX_TRY/TOL verbatim; points that fail at a grid edge keep
    the first approximation, non-converged points go NaN."""
    lam = np.asarray(lam, np.float64)
    phi = np.asarray(phi, np.float64)
    tb_lam = _norm_lon(lam - table.ll[0] - np.pi) + np.pi
    tb_phi = phi - table.ll[1]
    dlam, dphi = nad_interp(table, tb_lam, tb_phi)
    if not inverse:
        out_lam = np.where(np.isnan(dlam), np.nan, lam - dlam)
        out_phi = np.where(np.isnan(dlam), np.nan, phi + dphi)
        return out_lam, out_phi
    # inverse: iterate t until applying the forward shift lands on tb
    t_lam = tb_lam + dlam
    t_phi = tb_phi - dphi
    bad = np.isnan(dlam)
    active = ~bad
    edge_break = np.zeros(lam.shape, dtype=bool)
    converged = np.zeros(lam.shape, dtype=bool)
    for _ in range(MAX_TRY + 1):
        if not active.any():
            break
        d2lam, d2phi = nad_interp(table, t_lam, t_phi)
        hit_edge = active & np.isnan(d2lam)
        edge_break |= hit_edge
        dif_lam = t_lam - d2lam - tb_lam
        dif_phi = t_phi + d2phi - tb_phi
        step = active & ~hit_edge
        t_lam = np.where(step, t_lam - dif_lam, t_lam)
        t_phi = np.where(step, t_phi - dif_phi, t_phi)
        done = step & (np.abs(dif_lam) <= TOL) & (np.abs(dif_phi) <= TOL)
        converged |= done
        active = step & ~done
    failed = active  # ran out of iterations
    out_lam = _norm_lon(t_lam + table.ll[0])
    out_phi = t_phi + table.ll[1]
    out_lam = np.where(bad | failed, np.nan, out_lam)
    out_phi = np.where(bad | failed, np.nan, out_phi)
    # edge-break points keep the first approximation (Grid.java:224-228)
    return out_lam, out_phi


def grid_shift(tables, lam, phi, inverse: bool = False):
    """Vectorized pj_apply_gridshift (Grid.java:88-143): per point, every
    covering table is tried in order and the LAST successful conversion
    wins; points no table converts pass through unchanged."""
    lam = np.asarray(lam, np.float64)
    phi = np.asarray(phi, np.float64)
    out_lam = lam.copy()
    out_phi = phi.copy()
    shifted = np.zeros(lam.shape, dtype=bool)
    for table in tables:
        eps = (abs(table.del_[1]) + abs(table.del_[0])) / 10000.0
        lam0, phi0 = table.ll
        lam1 = lam0 + (table.lim[0] - 1) * table.del_[0]
        phi1 = phi0 + (table.lim[1] - 1) * table.del_[1]
        inside = (
            (phi >= phi0 - eps) & (phi <= phi1 + eps)
            & (lam >= lam0 - eps) & (lam <= lam1 + eps)
        )
        if not inside.any():
            continue
        cl, cp = nad_convert(table, lam, phi, inverse=inverse)
        good = inside & ~np.isnan(cl)
        out_lam = np.where(good, cl, out_lam)
        out_phi = np.where(good, cp, out_phi)
        shifted |= good
    return out_lam, out_phi, shifted
