"""Datum grid shifts (reference proj4 Grid.java nad_cvt/nad_intr +
CTABLEV2.java / NTV1.java binary formats). All grids here are synthetic —
built by our own writers — so no grid data ships with the repo."""

import numpy as np
import pytest

from tilegrid import nadgrid as NG
from tilegrid import proj as P

D2R = np.pi / 180.0
SEC = np.pi / 180.0 / 3600.0


def smooth_grid(nlam=9, nphi=7, ll=(-10.0, 30.0), step=1.0, scale=3.0):
    """A smooth nonconstant table: shifts vary sinusoidally, a few arcsec."""
    lam0, phi0 = ll[0] * D2R, ll[1] * D2R
    dl, dp = step * D2R, step * D2R
    jj, ii = np.mgrid[0:nphi, 0:nlam]
    dlam = scale * SEC * np.sin(ii * 0.7 + jj * 0.3)
    dphi = scale * SEC * np.cos(ii * 0.4 - jj * 0.5)
    cvs = np.stack([dlam, dphi], axis=-1).astype(np.float32)
    return NG.ConversionTable("synthetic", (lam0, phi0), (dl, dp),
                              (nlam, nphi), cvs)


def const_grid(c_lam_sec=2.0, c_phi_sec=-1.5, **kw):
    t = smooth_grid(**kw)
    cvs = np.empty_like(t.cvs)
    cvs[..., 0] = c_lam_sec * SEC
    cvs[..., 1] = c_phi_sec * SEC
    return NG.ConversionTable(t.id, t.ll, t.del_, t.lim, cvs)


class TestFormats:
    def test_ctable2_roundtrip(self):
        t = smooth_grid()
        back = NG.parse_ctable2(NG.write_ctable2(t))
        assert back.id == "synthetic"
        assert back.ll == pytest.approx(t.ll)
        assert back.del_ == pytest.approx(t.del_)
        assert back.lim == t.lim
        np.testing.assert_array_equal(back.cvs, t.cvs)

    def test_ntv1_roundtrip(self):
        t = smooth_grid()
        back = NG.parse_ntv1(NG.write_ntv1(t))
        assert back.ll == pytest.approx(t.ll, abs=1e-12)
        assert back.del_ == pytest.approx(t.del_, abs=1e-12)
        assert back.lim == t.lim
        np.testing.assert_allclose(back.cvs, t.cvs, atol=1e-12)

    def test_sniff_dispatch(self):
        t = smooth_grid()
        assert NG.parse_grid(NG.write_ctable2(t)).lim == t.lim
        assert NG.parse_grid(NG.write_ntv1(t)).lim == t.lim
        with pytest.raises(ValueError):
            NG.parse_grid(b"\x00" * 200)

    def test_ctable2_rejects_bad_counts(self):
        t = smooth_grid()
        data = bytearray(NG.write_ctable2(t))
        import struct

        struct.pack_into("<ii", data, 128, 0, 5)
        with pytest.raises(ValueError):
            NG.parse_ctable2(bytes(data))


class TestInterp:
    def test_node_exact_and_bilinear_mid(self):
        t = smooth_grid()
        # table-relative coords of node (i=2, j=3)
        dl, dp = t.del_
        lam, phi = 2 * dl, 3 * dp
        a, b = NG.nad_interp(t, lam, phi)
        assert a == pytest.approx(float(t.cvs[3, 2, 0]), abs=1e-18)
        assert b == pytest.approx(float(t.cvs[3, 2, 1]), abs=1e-18)
        # midpoint of the cell = average of 4 corners
        a, b = NG.nad_interp(t, 2.5 * dl, 3.5 * dp)
        assert a == pytest.approx(float(t.cvs[3:5, 2:4, 0].mean()), rel=1e-6)
        assert b == pytest.approx(float(t.cvs[3:5, 2:4, 1].mean()), rel=1e-6)

    def test_outside_nan_and_edge_backoff(self):
        t = smooth_grid()
        dl, dp = t.del_
        a, _ = NG.nad_interp(t, -2.0 * dl, 0.0)
        assert np.isnan(a)
        # exactly on the far edge: the <1e-11 backoff keeps it valid
        a, _ = NG.nad_interp(t, (t.lim[0] - 1) * dl, 0.0)
        assert not np.isnan(a)
        # a hair past: NaN
        a, _ = NG.nad_interp(t, (t.lim[0] - 1 + 1e-6) * dl, 0.0)
        assert np.isnan(a)


class TestConvert:
    def test_forward_constant_shift(self):
        t = const_grid(2.0, -1.5)
        lam = np.array([-8.0, -5.5, -3.25]) * D2R
        phi = np.array([31.0, 33.5, 35.75]) * D2R
        ol, op = NG.nad_convert(t, lam, phi)
        np.testing.assert_allclose(ol, lam - 2.0 * SEC, atol=1e-12)
        np.testing.assert_allclose(op, phi + -1.5 * SEC, atol=1e-12)

    def test_inverse_roundtrip(self):
        t = smooth_grid()
        rng = np.random.default_rng(5)
        lam = (rng.uniform(-9.5, -2.5, 50)) * D2R
        phi = (rng.uniform(30.5, 35.5, 50)) * D2R
        fl, fp = NG.nad_convert(t, lam, phi)
        bl, bp = NG.nad_convert(t, fl, fp, inverse=True)
        np.testing.assert_allclose(bl, lam, atol=1e-11)
        np.testing.assert_allclose(bp, phi, atol=1e-11)

    def test_grid_shift_passthrough_and_order(self):
        base = const_grid(2.0, 0.0)
        override = const_grid(10.0, 0.0, nlam=3, nphi=3, ll=(-6.0, 32.0))
        lam = np.array([-8.0, -5.0, 40.0]) * D2R  # 3rd point outside both
        phi = np.array([31.0, 33.0, 31.0]) * D2R
        ol, op, hit = NG.grid_shift([base, override], lam, phi)
        # point 0: only base covers -> 2 sec; point 1: LAST covering grid
        # (override) wins -> 10 sec; point 2: untouched
        # cvs nodes are float32 (FloatPolarCoordinate) -> ~1e-13 rad noise
        assert ol[0] == pytest.approx(lam[0] - 2.0 * SEC, abs=1e-11)
        assert ol[1] == pytest.approx(lam[1] - 10.0 * SEC, abs=1e-11)
        assert ol[2] == lam[2] and not hit[2]
        assert hit[0] and hit[1]


class TestProjIntegration:
    def test_nadgrids_proj_string_and_transform(self, tmp_path):
        t = const_grid(3.6, 1.8)  # 3.6 sec = 0.001 deg
        path = tmp_path / "synthetic.ct2"
        path.write_bytes(NG.write_ctable2(t))
        src = P.crs(f"+proj=longlat +ellps=WGS84 +nadgrids={path}")
        dst = P.crs("+proj=longlat +datum=WGS84")
        x, y = P.transform(src, dst, np.array([-5.0]), np.array([33.0]))
        assert x[0] == pytest.approx(-5.0 - 0.001, abs=1e-9)
        assert y[0] == pytest.approx(33.0 + 0.0005, abs=1e-9)
        # and back (inverse grid shift on the dst side)
        bx, by = P.transform(dst, src, x, y)
        assert bx[0] == pytest.approx(-5.0, abs=1e-9)
        assert by[0] == pytest.approx(33.0, abs=1e-9)

    def test_registered_name_and_optional(self):
        P.register_nadgrid("synthetic_test_grid", NG.write_ctable2(const_grid()))
        src = P.crs("+proj=longlat +ellps=WGS84 "
                    "+nadgrids=@missing_grid,synthetic_test_grid,null")
        assert len(src.datum.grids) == 1
        with pytest.raises(ValueError):
            P.crs("+proj=longlat +ellps=WGS84 +nadgrids=missing_grid")

    def test_gridshift_then_projection(self):
        """Grid-shifted source into a projected target == manual chain."""
        t = const_grid(2.0, -1.5)
        P.register_nadgrid("chain_grid", NG.write_ctable2(t))
        src = P.crs("+proj=longlat +ellps=WGS84 +nadgrids=chain_grid")
        dst = P.crs("+proj=tmerc +lat_0=0 +lon_0=-3 +k=0.9996 "
                    "+x_0=500000 +y_0=0 +ellps=WGS84 +towgs84=0,0,0")
        lon, lat = np.array([-5.0]), np.array([33.0])
        gx, gy = P.transform(src, dst, lon, lat)
        wl, wp, _ = NG.grid_shift([t], lon * D2R, lat * D2R)
        ex, ey = dst.forward(wl / D2R, wp / D2R)
        np.testing.assert_allclose([gx[0], gy[0]], [ex[0], ey[0]], atol=1e-6)

    def test_unknown_datum_side_skips(self):
        # TYPE_UNKNOWN on one side -> no shift at all (reference shortcut)
        t = const_grid()
        P.register_nadgrid("skip_grid", NG.write_ctable2(t))
        src = P.crs("+proj=longlat +ellps=WGS84 +nadgrids=skip_grid")
        dst = P.crs("+proj=longlat +ellps=intl")  # no towgs84 -> unknown
        x, y = P.transform(src, dst, np.array([-5.0]), np.array([33.0]))
        assert x[0] == -5.0 and y[0] == 33.0
