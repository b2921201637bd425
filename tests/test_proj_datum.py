"""Geodetic datum transformations (proj.py) vs the reference's
datum/Datum.java + datum/GeocentricConverter.java +
BasicCoordinateTransform.java semantics."""

import math

import numpy as np
import pytest

from tilegrid import proj
from tilegrid.proj import (
    AIRY,
    BESSEL,
    DATUM_WGS84,
    WGS84,
    Datum,
    _DATUMS,
    _geocentric_to_geodetic,
    _geodetic_to_geocentric,
    _helmert_from_wgs84,
    _helmert_to_wgs84,
    datum_transform,
)


class TestGeocentricConverter:
    def test_roundtrip_exact(self):
        rng = np.random.RandomState(7)
        lon = rng.uniform(-math.pi, math.pi, 200)
        lat = rng.uniform(-math.pi / 2 * 0.999, math.pi / 2 * 0.999, 200)
        for ell in (WGS84, AIRY, BESSEL, proj.INTERNATIONAL):
            X, Y, Z = _geodetic_to_geocentric(lon, lat, ell)
            lo, la = _geocentric_to_geodetic(X, Y, Z, ell)
            np.testing.assert_allclose(lo, lon, atol=1e-12)
            np.testing.assert_allclose(la, lat, atol=1e-12)

    def test_equator_and_pole(self):
        # equator: Z == 0, X == a at lon 0; pole: P == 0 handled (lon 0)
        X, Y, Z = _geodetic_to_geocentric(
            np.array([0.0]), np.array([0.0]), WGS84)
        assert abs(X[0] - WGS84.a) < 1e-9 and abs(Z[0]) < 1e-9
        Xp, Yp, Zp = _geodetic_to_geocentric(
            np.array([0.3]), np.array([math.pi / 2]), WGS84)
        lo, la = _geocentric_to_geodetic(Xp, Yp, Zp, WGS84)
        assert abs(la[0] - math.pi / 2) < 1e-9 and lo[0] == 0.0

    def test_latitude_overshoot_clamped(self):
        # the reference clamps latitudes within 0.1% past the pole
        X, Y, Z = _geodetic_to_geocentric(
            np.array([0.0]), np.array([math.pi / 2 * 1.0005]), WGS84)
        assert np.isfinite(X[0]) and abs(Z[0] - WGS84.b) < 1.0


class TestHelmert:
    def test_roundtrip(self):
        p = _DATUMS["osgb36"].params
        rng = np.random.RandomState(3)
        X = rng.uniform(-6.4e6, 6.4e6, 100)
        Y = rng.uniform(-6.4e6, 6.4e6, 100)
        Z = rng.uniform(-6.4e6, 6.4e6, 100)
        X2, Y2, Z2 = _helmert_from_wgs84(*_helmert_to_wgs84(X, Y, Z, p), p)
        # the reference's inverse is the linearized (not exact matrix)
        # inverse, so the roundtrip closes to ~|r|^2 * scale ~ mm level
        np.testing.assert_allclose(X2, X, atol=2e-3)
        np.testing.assert_allclose(Y2, Y, atol=2e-3)
        np.testing.assert_allclose(Z2, Z, atol=2e-3)

    def test_3param_is_translation(self):
        d = Datum("t", WGS84, (10.0, -20.0, 30.0))
        X, Y, Z = _helmert_to_wgs84(
            np.array([1.0]), np.array([2.0]), np.array([3.0]), d.params)
        assert (X[0], Y[0], Z[0]) == (11.0, -18.0, 33.0)

    def test_param_normalization(self):
        # arcsec -> rad and ppm -> M (Datum.java:121-127)
        d = Datum("x", WGS84, (0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 2.0))
        assert abs(d.params[3] - 4.84813681109536e-6) < 1e-20
        assert d.params[6] == 1.000002


class TestDatumTransform:
    def test_identity_cases(self):
        lon = np.array([-0.1])
        lat = np.array([51.5])
        # equal datums, unknown datums, and None all skip the shift
        for sd, td in [
            (DATUM_WGS84, DATUM_WGS84),
            (DATUM_WGS84, _DATUMS["nad83"] if False else DATUM_WGS84),
            (Datum("u", AIRY, None), DATUM_WGS84),
            (DATUM_WGS84, Datum("u", AIRY, None)),
            (None, DATUM_WGS84),
        ]:
            lo, la = datum_transform(lon, lat, sd, td)
            assert np.asarray(lo)[0] == -0.1 and np.asarray(la)[0] == 51.5

    def test_wgs84_family_identity(self):
        # NAD83 (GRS80, 0,0,0) -> WGS84: goes through geocentric because
        # the ellipsoids differ, lands within sub-mm of the input
        lo, la = datum_transform(
            np.array([-100.0]), np.array([40.0]), _DATUMS["nad83"], DATUM_WGS84)
        assert abs(lo[0] + 100.0) < 1e-8 and abs(la[0] - 40.0) < 1e-8

    def test_osgb36_greenwich_anchor(self):
        """Published anchor: the OSGB36 prime meridian at Greenwich lies
        ~5.5 arcsec (~102 m) EAST of the WGS84 zero meridian, so the
        OSGB36 point (lon=0, lat=51.4769) maps to a small negative WGS84
        longitude of about -0.0015 degrees."""
        lo, la = datum_transform(
            np.array([0.0]), np.array([51.4769]),
            _DATUMS["osgb36"], DATUM_WGS84)
        assert -0.00165 < lo[0] < -0.00135  # -5.9" .. -4.9"
        # the latitude shift in southern England is a few tens of meters N
        assert 0.0002 < la[0] - 51.4769 < 0.0008

    def test_roundtrip_via_wgs84(self):
        rng = np.random.RandomState(11)
        lon = rng.uniform(-8.0, 2.0, 50)
        lat = rng.uniform(50.0, 59.0, 50)
        for name in ("osgb36", "potsdam", "ire65", "nzgd49", "ed50",
                     "carthage", "ggrs87"):
            d = _DATUMS[name]
            lo, la = datum_transform(lon, lat, d, DATUM_WGS84)
            lon2, lat2 = datum_transform(lo, la, DATUM_WGS84, d)
            np.testing.assert_allclose(lon2, lon, atol=1e-7)
            np.testing.assert_allclose(lat2, lat, atol=1e-7)
            # and the shift is meters-level real, not a no-op
            assert np.abs(lo - lon).max() > 1e-5

    def test_transform_integration(self):
        # full transform(): OSGB36 longlat -> WGS84 UTM 30N differs from
        # the datum-less path by the ~100 m shift
        src = proj.crs("+proj=longlat +datum=osgb36")
        x1, y1 = proj.transform(src, "epsg:32630", np.array([-0.1]), np.array([51.5]))
        x0, y0 = proj.transform("latlng", "epsg:32630", np.array([-0.1]), np.array([51.5]))
        d = math.hypot(x1[0] - x0[0], y1[0] - y0[0])
        assert 80.0 < d < 160.0

    def test_towgs84_parsing(self):
        p3 = proj.crs("+proj=longlat +ellps=intl +towgs84=-87,-98,-121")
        assert p3.datum.towgs84 == (-87.0, -98.0, -121.0)
        p7 = proj.crs(
            "+proj=longlat +datum=potsdam")
        assert p7.ellipsoid == BESSEL and len(p7.datum.towgs84) == 7
        with pytest.raises(ValueError):
            proj.crs("+proj=longlat +towgs84=1,2")
        with pytest.raises(ValueError):
            proj.crs("+proj=longlat +datum=nosuch")
        # non-WGS84 ellps without towgs84 => unknown datum, no shift
        pu = proj.crs("+proj=longlat +ellps=airy")
        assert pu.datum.towgs84 is None
        lo, la = proj.transform(pu, "latlng", np.array([1.0]), np.array([2.0]))
        assert lo[0] == 1.0 and la[0] == 2.0


class TestLockstep:
    def test_sql_and_column_twins_match_numpy(self, spark):
        import duckdb
        import pandas as pd

        rng = np.random.RandomState(5)
        pdf = pd.DataFrame({
            "lon": rng.uniform(-170, 170, 64),
            "lat": rng.uniform(-75, 75, 64),
        })
        sd, td = _DATUMS["osgb36"], DATUM_WGS84
        nlon, nlat = datum_transform(
            pdf.lon.values, pdf.lat.values, sd, td)
        # DuckDB CTE chain
        con = duckdb.connect()
        con.register("p", pdf)
        q = proj.datum_shift_sql("lon", "p", "lon", "lat", sd, td)
        rows = con.execute(q + " ORDER BY lon").fetchdf()
        order = np.argsort(pdf.lon.values)
        np.testing.assert_allclose(rows.lon_out.values, nlon[order], atol=1e-12)
        np.testing.assert_allclose(rows.lat_out.values, nlat[order], atol=1e-12)
        # Spark codegen chain
        sdf = proj.datum_shift_cols(
            spark.createDataFrame(pdf), "lon", "lat", sd, td)
        got = sdf.select("lon", "lon_out", "lat_out").orderBy("lon").toPandas()
        np.testing.assert_allclose(got.lon_out.values, nlon[order], atol=1e-12)
        np.testing.assert_allclose(got.lat_out.values, nlat[order], atol=1e-12)
