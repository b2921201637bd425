"""Projection module tests (reference parity: proj4/src/main/java/org/osgeo/proj4j/).

Validation strategy (no external geodesy lib in the sandbox):
  * round-trips forward->inverse to sub-mm over each projection's domain
  * spherical-limit cross-checks: with f=0 the ellipsoidal series must match
    the EXACT closed-form spherical projection formulas (independent algebra)
  * differential-geometry properties measured with numerical Jacobians
    against the ellipsoid metric: conformal projections are isotropic
    (h == k), equal-area projections have unit area distortion, and the
    TM scale on the central meridian is exactly k0
  * the three parallel forward implementations (NumPy / pyspark Column /
    DuckDB SQL) agree on the same inputs
"""

import math

import duckdb
import numpy as np
import pytest

from tilegrid import proj as P

RNG = np.random.default_rng(7)


def _grid(lon_lo, lon_hi, lat_lo, lat_hi, n=9):
    lons = np.linspace(lon_lo, lon_hi, n)
    lats = np.linspace(lat_lo, lat_hi, n)
    LO, LA = np.meshgrid(lons, lats)
    return LO.ravel(), LA.ravel()


# --------------------------------------------------------------- round-trips


@pytest.mark.parametrize(
    "p, dom",
    [
        # UTM zones are 6 deg wide: the series round-trips sub-mm inside the
        # zone (lon0 +- 3 deg); outside, truncation grows fast (Snyder p.58)
        (P.utm(33), (12.0, 18.0, -80.0, 84.0)),
        (P.utm(1, south=True), (-180.0, -174.0, -80.0, -1.0)),
        (P.Mercator(P.SPHERE), (-179.0, 179.0, -85.0, 85.0)),
        (P.Mercator(P.WGS84, lon0=10.0, k0=0.98), (-100.0, 120.0, -80.0, 80.0)),
        (P.LambertConformalConic(P.WGS84), (-130.0, -60.0, 20.0, 55.0)),
        (P.AlbersEqualArea(P.GRS80), (-130.0, -60.0, 15.0, 55.0)),
        (P.PolarStereographic(P.WGS84, lat_ts=70.0, lon0=-45.0), (-180.0, 179.0, 60.0, 89.5)),
        (
            P.PolarStereographic(P.WGS84, lat_ts=-71.0, lon0=0.0, north=False),
            (-180.0, 179.0, -89.5, -60.0),
        ),
        (P.Sinusoidal(P.MODIS_SPHERE), (-170.0, 170.0, -85.0, 85.0)),
        (P.Sinusoidal(P.WGS84), (-170.0, 170.0, -85.0, 85.0)),
        (P.crs("epsg:3035"), (-10.0, 30.0, 35.0, 70.0)),
        (P.EquidistantConic(P.CLARKE_1866, 29.5, 45.5, 23.0, -96.0),
         (-120.0, -70.0, 18.0, 55.0)),
        (P.Krovak(), (12.1, 22.5, 47.8, 51.1)),
    ],
)
def test_roundtrip(p, dom):
    lon, lat = _grid(*dom)
    x, y = p.forward(lon, lat)
    lon2, lat2 = p.inverse(x, y)
    # 1e-7 deg ~ 1 cm; TM series round-trips sub-mm inside its zone
    np.testing.assert_allclose(lon2, lon, atol=1e-7, rtol=0)
    np.testing.assert_allclose(lat2, lat, atol=1e-7, rtol=0)


# ------------------------------------------------- spherical-limit identities


def test_tmerc_spherical_limit():
    """Snyder 8-1..8-3 exact spherical TM vs our series with f=0: within 3 deg
    of the central meridian the truncated series must agree to < 1 cm."""
    R, k0 = 6370997.0, 0.9996
    sph = P.Ellipsoid(R, 0.0)
    p = P.TransverseMercator(sph, lon0=15.0, lat0=0.0, k0=k0, fe=0.0, fn=0.0)
    lon, lat = _grid(12.0, 18.0, -75.0, 75.0)
    x, y = p.forward(lon, lat)
    lam = np.radians(lon - 15.0)
    phi = np.radians(lat)
    B = np.cos(phi) * np.sin(lam)
    x_exact = R * k0 * np.arctanh(B)
    y_exact = R * k0 * (np.arctan2(np.tan(phi), np.cos(lam)))
    np.testing.assert_allclose(x, x_exact, atol=0.01, rtol=0)
    np.testing.assert_allclose(y, y_exact, atol=0.01, rtol=0)


def test_lcc_spherical_limit():
    """Snyder 15-1..15-6 exact spherical LCC vs the ellipsoidal code at e=0."""
    R = 6370997.0
    sph = P.Ellipsoid(R, 0.0)
    p = P.LambertConformalConic(sph, lat1=33.0, lat2=45.0, lat0=39.0, lon0=-96.0)
    lon, lat = _grid(-120.0, -70.0, 22.0, 52.0)
    x, y = p.forward(lon, lat)
    p1, p2, p0 = math.radians(33.0), math.radians(45.0), math.radians(39.0)
    n = math.log(math.cos(p1) / math.cos(p2)) / math.log(
        math.tan(math.pi / 4 + p2 / 2) / math.tan(math.pi / 4 + p1 / 2)
    )
    F = math.cos(p1) * math.tan(math.pi / 4 + p1 / 2) ** n / n
    rho0 = R * F / math.tan(math.pi / 4 + p0 / 2) ** n
    phi = np.radians(lat)
    th = n * np.radians(lon + 96.0)
    rho = R * F / np.tan(math.pi / 4 + phi / 2) ** n
    np.testing.assert_allclose(x, rho * np.sin(th), rtol=1e-12, atol=1e-6)
    np.testing.assert_allclose(y, rho0 - rho * np.cos(th), rtol=1e-12, atol=1e-6)


def test_albers_spherical_limit():
    """Snyder 14-1..14-6 exact spherical Albers vs the ellipsoidal code at e=0."""
    R = 6370997.0
    sph = P.Ellipsoid(R, 0.0)
    p = P.AlbersEqualArea(sph, lat1=29.5, lat2=45.5, lat0=23.0, lon0=-96.0)
    lon, lat = _grid(-120.0, -70.0, 17.0, 52.0)
    x, y = p.forward(lon, lat)
    p1, p2, p0 = math.radians(29.5), math.radians(45.5), math.radians(23.0)
    n = (math.sin(p1) + math.sin(p2)) / 2.0
    C = math.cos(p1) ** 2 + 2.0 * n * math.sin(p1)
    rho0 = R * math.sqrt(C - 2.0 * n * math.sin(p0)) / n
    phi = np.radians(lat)
    th = n * np.radians(lon + 96.0)
    rho = R * np.sqrt(C - 2.0 * n * np.sin(phi)) / n
    np.testing.assert_allclose(x, rho * np.sin(th), rtol=1e-12, atol=1e-6)
    np.testing.assert_allclose(y, rho0 - rho * np.cos(th), rtol=1e-12, atol=1e-6)


def test_stere_spherical_limit():
    """Snyder 21-7/21-8 exact spherical polar stereographic at e=0."""
    R = 6370997.0
    sph = P.Ellipsoid(R, 0.0)
    p = P.PolarStereographic(sph, lat_ts=70.0, lon0=-45.0)
    lon, lat = _grid(-180.0, 170.0, 60.0, 89.0)
    x, y = p.forward(lon, lat)
    phi = np.radians(lat)
    lam = np.radians(lon + 45.0)
    # rho = 2 R tan(pi/4 - phi/2) * (1 + sin(lat_ts)) / 2
    k_ts = (1.0 + math.sin(math.radians(70.0))) / 2.0
    rho = 2.0 * R * k_ts * np.tan(math.pi / 4 - phi / 2)
    np.testing.assert_allclose(x, rho * np.sin(lam), rtol=1e-12, atol=1e-6)
    np.testing.assert_allclose(y, -rho * np.cos(lam), rtol=1e-12, atol=1e-6)


def test_laea_epsg_worked_example():
    """EPSG Guidance Note 7-2, Lambert Azimuthal Equal Area example
    (ETRS89-LAEA): 50N 5E -> E 3962799.45, N 2999718.85."""
    p = P.crs("epsg:3035")
    x, y = p.forward(np.array([5.0]), np.array([50.0]))
    assert abs(float(x) - 3962799.45) < 0.01
    assert abs(float(y) - 2999718.85) < 0.01


def test_krovak_epsg_worked_example():
    """EPSG Guidance Note 7-2, Krovak example: 50d12'32.442N,
    16d50'59.179E (Greenwich) -> southing 1050538.63, westing 568991.00;
    the East-North variant (EPSG:5514) negates and swaps them."""
    p = P.Krovak()
    lam = 16.0 + 50.0 / 60.0 + 59.179 / 3600.0
    phi = 50.0 + 12.0 / 60.0 + 32.442 / 3600.0
    x, y = p.forward(np.array([lam]), np.array([phi]))
    assert abs(float(x) - (-568991.00)) < 0.05
    assert abs(float(y) - (-1050538.63)) < 0.05


def test_eqdc_snyder_worked_example():
    """Snyder's equidistant-conic numerical example (Appendix, Clarke 1866,
    lat_1=29.5 lat_2=45.5 lat_0=23 lon_0=-96; 35N 75W):
    x = 1885051.9, y = 1540507.6."""
    p = P.EquidistantConic(P.CLARKE_1866, 29.5, 45.5, 23.0, -96.0)
    x, y = p.forward(np.array([-75.0]), np.array([35.0]))
    assert abs(float(x) - 1885051.9) < 0.1
    assert abs(float(y) - 1540507.6) < 0.1


def test_webmercator_matches_grid_module():
    from tilegrid.grid import lnglat_to_webmercator

    p = P.crs("epsg:3857")
    lon, lat = _grid(-179.0, 179.0, -85.0, 85.0)
    x, y = p.forward(lon, lat)
    xg, yg = lnglat_to_webmercator(lon, lat)
    np.testing.assert_allclose(x, xg, rtol=1e-14)
    np.testing.assert_allclose(y, yg, rtol=1e-12, atol=1e-9)


# ---------------------------------------------- differential-geometry checks


def _jacobian(p, lon, lat, h=1e-6):
    x_e, y_e = p.forward(lon + h, lat)
    x_w, y_w = p.forward(lon - h, lat)
    x_n, y_n = p.forward(lon, lat + h)
    x_s, y_s = p.forward(lon, lat - h)
    hr = math.radians(h)
    return (
        (x_e - x_w) / (2 * hr),
        (y_e - y_w) / (2 * hr),
        (x_n - x_s) / (2 * hr),
        (y_n - y_s) / (2 * hr),
    )


def _metric(el, lat):
    phi = np.radians(lat)
    s2 = np.sin(phi) ** 2
    nu = el.a / np.sqrt(1.0 - el.e2 * s2)  # prime vertical radius
    rho = el.a * (1.0 - el.e2) / (1.0 - el.e2 * s2) ** 1.5  # meridian radius
    return nu * np.cos(phi), rho


@pytest.mark.parametrize(
    "p, dom",
    [
        (P.utm(33), (12.5, 17.5, -70.0, 70.0)),
        (P.Mercator(P.WGS84), (-150.0, 150.0, -75.0, 75.0)),
        (P.LambertConformalConic(P.WGS84), (-120.0, -70.0, 25.0, 50.0)),
        (P.PolarStereographic(P.WGS84, lat_ts=70.0, lon0=-45.0), (-170.0, 170.0, 62.0, 88.0)),
        (P.Krovak(), (13.0, 22.0, 48.0, 51.0)),
    ],
)
def test_conformal_isotropy(p, dom):
    """Conformal projections: meridian scale h equals parallel scale k."""
    lon, lat = _grid(*dom, n=7)
    dxl, dyl, dxp, dyp = _jacobian(p, lon, lat)
    par_len, mer_len = _metric(p.ellipsoid, lat)
    k = np.hypot(dxl, dyl) / par_len
    h = np.hypot(dxp, dyp) / mer_len
    np.testing.assert_allclose(h, k, rtol=5e-5)


def test_albers_unit_area_distortion():
    """Equal-area: |det J| equals the ellipsoid area element everywhere."""
    p = P.AlbersEqualArea(P.GRS80)
    lon, lat = _grid(-125.0, -65.0, 18.0, 55.0, n=7)
    dxl, dyl, dxp, dyp = _jacobian(p, lon, lat)
    par_len, mer_len = _metric(p.ellipsoid, lat)
    det = np.abs(dxl * dyp - dyl * dxp)
    np.testing.assert_allclose(det, par_len * mer_len, rtol=5e-5)


def test_sinusoidal_unit_area_distortion():
    p = P.Sinusoidal(P.WGS84)
    lon, lat = _grid(-150.0, 150.0, -75.0, 75.0, n=7)
    dxl, dyl, dxp, dyp = _jacobian(p, lon, lat)
    par_len, mer_len = _metric(p.ellipsoid, lat)
    det = np.abs(dxl * dyp - dyl * dxp)
    np.testing.assert_allclose(det, par_len * mer_len, rtol=5e-5)


def test_laea_unit_area_distortion():
    """Equal-area: |det J| equals the ellipsoid area element everywhere
    over the EU grid's domain."""
    p = P.crs("epsg:3035")
    lon, lat = _grid(-8.0, 28.0, 37.0, 68.0, n=7)
    dxl, dyl, dxp, dyp = _jacobian(p, lon, lat)
    par_len, mer_len = _metric(p.ellipsoid, lat)
    det = np.abs(dxl * dyp - dyl * dxp)
    np.testing.assert_allclose(det, par_len * mer_len, rtol=5e-5)


def test_eqdc_equidistant_properties():
    """Equidistant conic: meridian scale h == 1 EVERYWHERE (its defining
    property), and parallel scale k == 1 exactly on both standard
    parallels."""
    p = P.EquidistantConic(P.WGS84, 29.5, 45.5, 23.0, -96.0)
    lon, lat = _grid(-120.0, -70.0, 18.0, 55.0, n=7)
    dxl, dyl, dxp, dyp = _jacobian(p, lon, lat)
    par_len, mer_len = _metric(p.ellipsoid, lat)
    np.testing.assert_allclose(np.hypot(dxp, dyp) / mer_len, 1.0, rtol=5e-6)
    for sp in (29.5, 45.5):
        lons = np.linspace(-120.0, -70.0, 7)
        lats = np.full(7, sp)
        dxl, dyl, _, _ = _jacobian(p, lons, lats)
        par_len, _ = _metric(p.ellipsoid, lats)
        np.testing.assert_allclose(np.hypot(dxl, dyl) / par_len, 1.0, rtol=5e-6)


def test_krovak_pseudo_parallel_scale():
    """Krovak: scale ~ k0 = 0.9999 near the pseudo standard parallel's
    trace through the Czech domain (conformal, so any direction)."""
    p = P.Krovak()
    # points where the rotated latitude T is near the pseudo parallel:
    # the line of true-ish scale runs through the middle of the country
    lon, lat = np.array([14.5, 16.5, 18.5]), np.array([49.35, 49.2, 49.0])
    dxl, dyl, _, _ = _jacobian(p, lon, lat)
    par_len, _ = _metric(p.ellipsoid, lat)
    k = np.hypot(dxl, dyl) / par_len
    assert np.all(np.abs(k - 0.9999) < 3e-4)


def test_utm_central_meridian_anchors():
    p = P.utm(31)  # lon0 = 3
    x, y = p.forward(3.0, 0.0)
    assert abs(float(x) - 500000.0) < 1e-6 and abs(float(y)) < 1e-6
    # scale on the central meridian is exactly k0
    dxl, dyl, dxp, dyp = _jacobian(p, np.array([3.0]), np.array([40.0]))
    _, mer_len = _metric(p.ellipsoid, np.array([40.0]))
    np.testing.assert_allclose(np.hypot(dxp, dyp) / mer_len, 0.9996, rtol=1e-7)
    # southern-hemisphere false northing
    ps = P.utm(31, south=True)
    _, ys = ps.forward(3.0, 0.0)
    assert abs(float(ys) - 10000000.0) < 1e-6


# ------------------------------------------------------- registry + transform


def test_registry_and_parser():
    assert isinstance(P.crs("epsg:32633"), P.TransverseMercator)
    assert P.crs("epsg:32733").fn == 10000000.0
    assert P.crs("utm:18n").lon0 == -75.0
    assert isinstance(P.crs("epsg:5070"), P.AlbersEqualArea)
    assert isinstance(P.crs("epsg:2154"), P.LambertConformalConic)
    assert P.crs("epsg:2154").fe == 700000.0
    assert isinstance(P.crs("epsg:3413"), P.PolarStereographic)
    assert not P.crs("epsg:3976").north
    assert isinstance(P.crs("modis"), P.Sinusoidal)
    assert P.crs("modis").ellipsoid.a == 6371007.181
    lcc = P.crs("+proj=lcc +lat_1=40 +lat_2=50 +lat_0=45 +lon_0=5 +x_0=1000")
    assert lcc.lat1 == 40.0 and lcc.fe == 1000.0
    laea = P.crs("epsg:3035")
    assert isinstance(laea, P.LambertAzimuthalEqualArea)
    assert laea.fe == 4321000.0 and laea.lat0 == 52.0
    kr = P.crs("epsg:5514")
    assert isinstance(kr, P.Krovak)
    assert kr.datum is not None and kr.datum.towgs84 == (589.0, 76.0, 480.0)
    eq = P.crs("+proj=eqdc +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96")
    assert isinstance(eq, P.EquidistantConic) and eq.lat1 == 29.5
    with pytest.raises(ValueError):
        P.crs("epsg:99999")
    with pytest.raises(ValueError):
        P.crs("+proj=nosuch")


def test_transform_chain():
    lon, lat = _grid(9.5, 20.5, 35.0, 60.0, n=5)
    x, y = P.crs("webmercator").forward(lon, lat)
    xu, yu = P.transform("epsg:3857", "epsg:32633", x, y)
    xe, ye = P.crs("epsg:32633").forward(lon, lat)
    np.testing.assert_allclose(xu, xe, atol=1e-6)
    np.testing.assert_allclose(yu, ye, atol=1e-6)
    fn = P.transform_fn("epsg:32633", "epsg:3857")
    x2, y2 = fn(xu, yu)
    np.testing.assert_allclose(x2, x, atol=1e-5)
    np.testing.assert_allclose(y2, y, atol=1e-5)


# ------------------------------------------- NumPy / Column / SQL twin parity


_TWIN_PROJS = [
    P.utm(33),
    P.Mercator(P.SPHERE),
    P.Mercator(P.WGS84, lon0=7.0, k0=0.9996),
    P.LambertConformalConic(P.WGS84),
    P.Sinusoidal(P.MODIS_SPHERE),
    P.crs("epsg:3035"),
    P.EquidistantConic(P.WGS84, 29.5, 45.5, 23.0, -96.0),
]


@pytest.mark.parametrize("p", _TWIN_PROJS, ids=lambda p: p.name + str(id(p) % 97))
def test_sql_twin_matches_numpy(p):
    lon, lat = _grid(10.0, 20.0, -60.0, 60.0, n=5)
    x_np, y_np = p.forward(lon, lat)
    xs, ys = p.forward_sql("lon", "lat")
    con = duckdb.connect()
    con.register(
        "pts",
        __import__("pandas").DataFrame({"lon": lon, "lat": lat}),
    )
    got = con.sql(f"SELECT {xs} AS x, {ys} AS y FROM pts").df()
    np.testing.assert_allclose(got["x"].to_numpy(), x_np, rtol=1e-12, atol=1e-6)
    np.testing.assert_allclose(got["y"].to_numpy(), y_np, rtol=1e-12, atol=1e-6)


def test_column_twin_matches_numpy(spark):
    import pandas as pd

    lon, lat = _grid(10.0, 20.0, -60.0, 60.0, n=5)
    sdf = spark.createDataFrame(pd.DataFrame({"lon": lon, "lat": lat}))
    for p in _TWIN_PROJS:
        xc, yc = p.forward_cols("lon", "lat")
        got = sdf.select(xc.alias("x"), yc.alias("y")).toPandas()
        x_np, y_np = p.forward(lon, lat)
        np.testing.assert_allclose(got["x"].to_numpy(), x_np, rtol=1e-12, atol=1e-6)
        np.testing.assert_allclose(got["y"].to_numpy(), y_np, rtol=1e-12, atol=1e-6)


def test_krovak_twins_match_numpy(spark):
    """Krovak's Column/SQL twins over its domain of use (the generic twin
    grid spans latitudes where the unclipped asin would leave Krovak's
    domain, so it gets its own grid)."""
    import pandas as pd

    p = P.Krovak()
    lon, lat = _grid(12.2, 22.4, 47.9, 51.0, n=5)
    x_np, y_np = p.forward(lon, lat)
    xs, ys = p.forward_sql("lon", "lat")
    con = duckdb.connect()
    con.register("pts", pd.DataFrame({"lon": lon, "lat": lat}))
    got = con.sql(f"SELECT {xs} AS x, {ys} AS y FROM pts").df()
    np.testing.assert_allclose(got["x"].to_numpy(), x_np, rtol=1e-12, atol=1e-6)
    np.testing.assert_allclose(got["y"].to_numpy(), y_np, rtol=1e-12, atol=1e-6)
    sdf = spark.createDataFrame(pd.DataFrame({"lon": lon, "lat": lat}))
    xc, yc = p.forward_cols("lon", "lat")
    gc = sdf.select(xc.alias("x"), yc.alias("y")).toPandas()
    np.testing.assert_allclose(gc["x"].to_numpy(), x_np, rtol=1e-12, atol=1e-6)
    np.testing.assert_allclose(gc["y"].to_numpy(), y_np, rtol=1e-12, atol=1e-6)


# ------------------------------------------------- generic distributed warp


def test_generic_warp_latlng_to_utm(spark):
    """reproject_layer with a non-separable dst CRS (UTM 33N): every dst
    pixel center inverse-mapped to the stitched lat/lng source must match a
    whole-array NumPy oracle exactly (same floor-lookup semantics)."""
    import pandas as pd

    from tilegrid import codec, fixtures
    from tilegrid.cell import z2_encode
    from tilegrid.grid import LATLNG_WORLD, Extent, LayoutDefinition, TileLayout
    from tilegrid.operators import LAYER_SCHEMA
    from tilegrid.operators.reproject import reproject_layer

    src_layout = LayoutDefinition(LATLNG_WORLD, TileLayout(4, 4, 16, 16))
    dst_extent = Extent(200000.0, 4000000.0, 800000.0, 4600000.0)
    dst_layout = LayoutDefinition(dst_extent, TileLayout(4, 4, 16, 16))
    src_px = np.arange(64 * 64, dtype=np.float64).reshape(64, 64)
    rows = []
    for c in range(4):
        for r in range(4):
            arr = src_px[r * 16 : (r + 1) * 16, c * 16 : (c + 1) * 16]
            rows.append(
                (2, c, r, int(z2_encode(c, r)),
                 codec.raw_encode(np.ascontiguousarray(arr)), 16, 16, "raw")
            )
    layer = spark.createDataFrame(
        pd.DataFrame(rows, columns=["zoom", "col", "row", "cell", "tile", "h", "w", "fmt"]),
        schema=LAYER_SCHEMA,
    )
    out = reproject_layer(
        layer, src_layout, dst_layout, 2, "latlng", "epsg:32633"
    ).toPandas()
    assert len(out) == 16
    cw, ch = dst_extent.width / 64.0, dst_extent.height / 64.0
    gx, gy = np.meshgrid(np.arange(64), np.arange(64))
    mx = dst_extent.xmin + (gx + 0.5) * cw
    my = dst_extent.ymax - (gy + 0.5) * ch
    lon, lat = P.crs("epsg:32633").inverse(mx.ravel(), my.ravel())
    sgx = np.floor((lon + 180.0) / src_layout.cell_width).astype(np.int64)
    sgy = np.floor((90.0 - lat) / src_layout.cell_height).astype(np.int64)
    want = src_px[sgy, sgx].reshape(64, 64)
    got, (c0, r0, _, _) = fixtures.stitch_layer_df(out)
    assert (c0, r0) == (0, 0)
    np.testing.assert_array_equal(got, want)


def test_generic_warp_bilinear_utm_roundtrip_smoke(spark):
    """Bilinear warp through a generic CRS pair: warping a smooth ramp
    latlng -> UTM must reproduce the ramp evaluated at dst pixel centers
    (bilinear interpolation of a plane is exact up to grid clamping)."""
    import pandas as pd

    from tilegrid import codec, fixtures
    from tilegrid.cell import z2_encode
    from tilegrid.grid import LATLNG_WORLD, Extent, LayoutDefinition, TileLayout
    from tilegrid.operators import LAYER_SCHEMA
    from tilegrid.operators.reproject import reproject_layer

    src_layout = LayoutDefinition(LATLNG_WORLD, TileLayout(4, 4, 16, 16))
    dst_extent = Extent(250000.0, 4050000.0, 750000.0, 4550000.0)
    dst_layout = LayoutDefinition(dst_extent, TileLayout(4, 4, 16, 16))
    # plane in source PIXEL coords -> bilinear reconstruction is exact
    gx, gy = np.meshgrid(np.arange(64, dtype=np.float64), np.arange(64, dtype=np.float64))
    src_px = 3.0 * gx + 7.0 * gy
    rows = []
    for c in range(4):
        for r in range(4):
            arr = src_px[r * 16 : (r + 1) * 16, c * 16 : (c + 1) * 16]
            rows.append(
                (2, c, r, int(z2_encode(c, r)),
                 codec.raw_encode(np.ascontiguousarray(arr)), 16, 16, "raw")
            )
    layer = spark.createDataFrame(
        pd.DataFrame(rows, columns=["zoom", "col", "row", "cell", "tile", "h", "w", "fmt"]),
        schema=LAYER_SCHEMA,
    )
    out = reproject_layer(
        layer, src_layout, dst_layout, 2, "latlng", "epsg:32633", method="bilinear"
    ).toPandas()
    assert len(out) == 16
    cw, ch = dst_extent.width / 64.0, dst_extent.height / 64.0
    dgx, dgy = np.meshgrid(np.arange(64), np.arange(64))
    mx = dst_extent.xmin + (dgx + 0.5) * cw
    my = dst_extent.ymax - (dgy + 0.5) * ch
    lon, lat = P.crs("epsg:32633").inverse(mx.ravel(), my.ravel())
    fx = (lon + 180.0) / src_layout.cell_width - 0.5
    fy = (90.0 - lat) / src_layout.cell_height - 0.5
    want = (3.0 * fx + 7.0 * fy).reshape(64, 64)
    got, (c0, r0, _, _) = fixtures.stitch_layer_df(out)
    assert (c0, r0) == (0, 0)
    assert not np.isnan(got).any()
    np.testing.assert_allclose(got, want, rtol=1e-9)


# -------------------------------------- spherical azimuthal/cylindrical family


@pytest.mark.parametrize(
    "p, dom",
    [
        (P.EquidistantCylindrical(6371000.0, lat_ts=30.0), (-179.0, 179.0, -89.0, 89.0)),
        (P.AzimuthalEquidistant(6371000.0, lon0=10.0, lat0=50.0), (-60.0, 80.0, 0.0, 85.0)),
        (P.Orthographic(6371000.0, lon0=10.0, lat0=50.0), (-50.0, 70.0, 10.0, 85.0)),
        (P.Gnomonic(6371000.0, lon0=10.0, lat0=50.0), (-40.0, 60.0, 15.0, 80.0)),
        (P.Cassini(6371000.0, lon0=10.0, lat0=20.0), (-50.0, 70.0, -60.0, 60.0)),
    ],
)
def test_spherical_family_roundtrip(p, dom):
    lon, lat = _grid(*dom, n=7)
    x, y = p.forward(lon, lat)
    lon2, lat2 = p.inverse(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9, rtol=0)
    np.testing.assert_allclose(lat2, lat, atol=1e-9, rtol=0)


def test_aeqd_preserves_distance_from_center():
    """Defining property: map distance from the center == great-circle
    distance (Snyder ch.25)."""
    from tilegrid.grid import EARTH_RADIUS, haversine_m

    p = P.AzimuthalEquidistant(EARTH_RADIUS, lon0=10.0, lat0=50.0)
    lon, lat = _grid(-120.0, 150.0, -80.0, 85.0, n=7)
    x, y = p.forward(lon, lat)
    want = haversine_m(np.full_like(lon, 10.0), np.full_like(lat, 50.0), lon, lat)
    np.testing.assert_allclose(np.hypot(x, y), want, rtol=1e-9, atol=1e-6)


def test_ortho_distance_is_r_sin_c():
    from tilegrid.grid import EARTH_RADIUS, haversine_m

    p = P.Orthographic(EARTH_RADIUS, lon0=0.0, lat0=0.0)
    lon, lat = _grid(-60.0, 60.0, -60.0, 60.0, n=7)
    x, y = p.forward(lon, lat)
    c = haversine_m(np.zeros_like(lon), np.zeros_like(lat), lon, lat) / EARTH_RADIUS
    np.testing.assert_allclose(np.hypot(x, y), EARTH_RADIUS * np.sin(c), rtol=1e-9, atol=1e-6)


def test_gnomonic_maps_great_circles_to_lines():
    """Three points on one great circle must be exactly collinear on the
    map (Snyder ch.22's defining property)."""
    p = P.Gnomonic(6371000.0, lon0=20.0, lat0=30.0)
    # great circle through two anchor points: sample by SLERP on the sphere
    def sph(lon, lat):
        lam, phi = math.radians(lon), math.radians(lat)
        return np.array(
            [math.cos(phi) * math.cos(lam), math.cos(phi) * math.sin(lam), math.sin(phi)]
        )

    a, b = sph(-10.0, 10.0), sph(60.0, 55.0)
    w = math.acos(float(np.dot(a, b)))
    pts = []
    for t in (0.15, 0.5, 0.85):
        v = (math.sin((1 - t) * w) * a + math.sin(t * w) * b) / math.sin(w)
        lon = math.degrees(math.atan2(v[1], v[0]))
        lat = math.degrees(math.asin(v[2]))
        pts.append(p.forward(lon, lat))
    (x1, y1), (x2, y2), (x3, y3) = [(float(x), float(y)) for x, y in pts]
    cross = (x2 - x1) * (y3 - y1) - (y2 - y1) * (x3 - x1)
    span = max(abs(x3 - x1), abs(y3 - y1))
    assert abs(cross) / (span * span) < 1e-9


def test_eqc_expression_twins(spark):
    import pandas as pd

    p = P.EquidistantCylindrical(6371000.0, lon0=5.0, lat_ts=45.0)
    lon, lat = _grid(-170.0, 170.0, -85.0, 85.0, n=5)
    x_np, y_np = p.forward(lon, lat)
    xs, ys = p.forward_sql("lon", "lat")
    con = duckdb.connect()
    con.register("pts", __import__("pandas").DataFrame({"lon": lon, "lat": lat}))
    got = con.sql(f"SELECT {xs} AS x, {ys} AS y FROM pts").df()
    np.testing.assert_allclose(got["x"].to_numpy(), x_np, rtol=1e-12)
    np.testing.assert_allclose(got["y"].to_numpy(), y_np, rtol=1e-12)
    sdf = spark.createDataFrame(pd.DataFrame({"lon": lon, "lat": lat}))
    xc, yc = p.forward_cols("lon", "lat")
    g2 = sdf.select(xc.alias("x"), yc.alias("y")).toPandas()
    np.testing.assert_allclose(g2["x"].to_numpy(), x_np, rtol=1e-12)
    np.testing.assert_allclose(g2["y"].to_numpy(), y_np, rtol=1e-12)


def test_spherical_family_in_parser():
    assert isinstance(P.crs("+proj=eqc +lat_ts=30"), P.EquidistantCylindrical)
    assert isinstance(P.crs("+proj=aeqd +lat_0=50 +lon_0=10"), P.AzimuthalEquidistant)
    assert isinstance(P.crs("+proj=ortho +lat_0=50"), P.Orthographic)
    assert isinstance(P.crs("+proj=gnom +lat_0=50"), P.Gnomonic)
    assert isinstance(P.crs("+proj=cass +lat_0=20"), P.Cassini)
    assert P.crs("+proj=aeqd +R=6371000 +lat_0=50").R == 6371000.0


def test_reproject_geoms_roundtrip(spark):
    """WKB polygons through latlng -> UTM -> latlng come back within
    sub-mm; multipolygon and point shapes are preserved."""
    import pandas as pd

    from tilegrid.geometry import (
        wkb_decode, wkb_encode_multipolygon, wkb_encode_point, wkb_encode_polygon,
    )
    from tilegrid.operators.vector import reproject_geoms

    shell = np.array([[14.0, 45.0], [16.0, 45.0], [16.0, 47.0], [14.0, 47.0]])
    hole = np.array([[14.6, 45.6], [15.4, 45.6], [15.4, 46.4], [14.6, 46.4]])[::-1]
    rows = [
        ("poly", wkb_encode_polygon([shell, hole])),
        ("multi", wkb_encode_multipolygon([[shell + 0.1], [shell - 3.0]])),
        ("pt", wkb_encode_point(15.0, 46.0)),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["gid", "wkb"]))
    there = reproject_geoms(df, "latlng", "epsg:32633")
    back = reproject_geoms(there, "epsg:32633", "latlng").toPandas().set_index("gid")
    g = wkb_decode(bytes(back.loc["poly", "wkb"]))
    np.testing.assert_allclose(g[0], shell, atol=1e-8)
    np.testing.assert_allclose(g[1], hole, atol=1e-8)
    m = wkb_decode(bytes(back.loc["multi", "wkb"]))
    assert len(m) == 2 and len(m[0]) == 1
    np.testing.assert_allclose(m[0][0], shell + 0.1, atol=1e-8)
    np.testing.assert_allclose(m[1][0], shell - 3.0, atol=1e-8)
    x, y = wkb_decode(bytes(back.loc["pt", "wkb"]))
    assert abs(x - 15.0) < 1e-8 and abs(y - 46.0) < 1e-8
    # projected coordinates really are in meters (UTM northings ~ 5e6)
    mid = wkb_decode(bytes(there.toPandas().set_index("gid").loc["pt", "wkb"]))
    assert 4.9e6 < mid[1] < 5.2e6 and 3e5 < mid[0] < 7e5


def test_far_hemisphere_is_unprojectable():
    """Orthographic/gnomonic must NOT return mirrored finite coordinates
    for the invisible hemisphere (proj4j throws ProjectionException; we
    return NaN)."""
    o = P.Orthographic(6371000.0, lon0=0.0, lat0=0.0)
    x, y = o.forward(np.array([45.0, 135.0, 180.0]), np.array([0.0, 0.0, 0.0]))
    assert np.isfinite(x[0]) and np.isnan(x[1]) and np.isnan(x[2])
    g = P.Gnomonic(6371000.0, lon0=0.0, lat0=0.0)
    xg, yg = g.forward(np.array([30.0, 90.0, 135.0]), np.array([0.0, 0.0, 0.0]))
    assert np.isfinite(xg[0]) and np.isnan(xg[1]) and np.isnan(xg[2])


def test_tmerc_projstring_uses_proj4_defaults():
    """Raw +proj=tmerc defaults x_0=0, k=1 (proj4 parity); UTM's
    0.9996/500000 come only from the utm() factory / EPSG codes."""
    p = P.crs("+proj=tmerc +lon_0=9")
    assert p.fe == 0.0 and p.k0 == 1.0
    x, _ = p.forward(9.0, 0.0)
    assert abs(float(x)) < 1e-9  # central meridian at x=0, not 500000
    assert P.crs("epsg:32632").fe == 500000.0


def test_reproject_geoms_preserves_empty_multipolygon_type(spark):
    import pandas as pd
    import struct as _struct

    from tilegrid.geometry import wkb_encode_multipolygon
    from tilegrid.operators.vector import reproject_geoms

    empty = wkb_encode_multipolygon([])
    df = spark.createDataFrame(pd.DataFrame([("e", empty)], columns=["gid", "wkb"]))
    out = reproject_geoms(df, "latlng", "epsg:32633").toPandas()
    assert _struct.unpack_from("<I", bytes(out.iloc[0]["wkb"]), 1)[0] == 6


# ------------------------- Mollweide / Robinson / Hotine Oblique Mercator


@pytest.mark.parametrize(
    "p, dom",
    [
        (P.Mollweide(6371000.0, lon0=10.0), (-150.0, 170.0, -89.0, 89.0)),
        (P.Wagner4(6371000.0), (-170.0, 170.0, -85.0, 85.0)),
        (P.Wagner5(6371000.0), (-170.0, 170.0, -85.0, 85.0)),
        (P.Robinson(6371000.0, lon0=-20.0), (-150.0, 110.0, -88.0, 88.0)),
    ],
)
def test_pseudocylindrical_roundtrip(p, dom):
    lon, lat = _grid(*dom, n=7)
    x, y = p.forward(lon, lat)
    lon2, lat2 = p.inverse(x, y)
    np.testing.assert_allclose(lon2, lon, atol=2e-5, rtol=0)
    np.testing.assert_allclose(lat2, lat, atol=2e-5, rtol=0)


@pytest.mark.parametrize("cls", [P.Mollweide, P.Wagner4])
def test_mollweide_family_unit_area_distortion(cls):
    """Mollweide and Wagner IV are equal-area: |det J| == sphere area
    element everywhere (Snyder ch. 31). Wagner V is a compromise and is
    deliberately NOT asserted here."""
    p = cls(6371000.0)
    lon, lat = _grid(-150.0, 150.0, -75.0, 75.0, n=7)
    dxl, dyl, dxp, dyp = _jacobian(p, lon, lat)
    par_len, mer_len = _metric(p.ellipsoid, lat)
    det = np.abs(dxl * dyp - dyl * dxp)
    np.testing.assert_allclose(det, par_len * mer_len, rtol=5e-5)


def test_mollweide_known_constants_and_poles():
    m = P.Mollweide(1.0)
    # Snyder 31-1..31-8 at p=pi/2: cx = 2*sqrt(2)/pi, cy = sqrt(2), cp = pi
    assert abs(m.cx - 2.0 * math.sqrt(2.0) / math.pi) < 1e-12
    assert abs(m.cy - math.sqrt(2.0)) < 1e-12
    assert abs(m.cp - math.pi) < 1e-12
    x, y = m.forward(np.array([0.0, 0.0]), np.array([90.0, -90.0]))
    np.testing.assert_allclose(x, [0.0, 0.0], atol=1e-9)
    np.testing.assert_allclose(y, [math.sqrt(2.0), -math.sqrt(2.0)], atol=1e-9)
    # equator: x spans exactly +-cx*pi*R (the 2:1 ellipse), y = 0
    xe, ye = m.forward(np.array([180.0]), np.array([0.0]))
    np.testing.assert_allclose(xe, [m.cx * math.pi], rtol=1e-12)
    assert abs(float(ye[0])) < 1e-12
    w5 = P.Wagner5(1.0)
    assert (w5.cx, w5.cy, w5.cp) == (0.90977, 1.65014, 3.00896)


def test_robinson_published_node_values():
    """Forward at the exact 5-degree nodes reproduces the published USGS
    PROJ table entries: x = 0.8487*R*X[i]*lam, y = 1.3523*R*Y[i]."""
    r = P.Robinson(1.0)
    lam = math.radians(30.0)
    # 90 evaluates the last segment's cubic at z=5 (as USGS PROJ robin.c
    # does), matching the pole row only to the table's fit accuracy ~1e-8
    for lat_deg, xi, yi, tol in [(0.0, 1.0, 0.0, 1e-12), (30.0, 0.96, 0.372, 1e-12),
                                 (60.0, 0.7986, 0.7346, 1e-12), (90.0, 0.5322, 1.0, 1e-7)]:
        x, y = r.forward(np.array([30.0]), np.array([lat_deg]))
        np.testing.assert_allclose(x, [0.8487 * xi * lam], rtol=tol)
        np.testing.assert_allclose(y, [1.3523 * yi], rtol=tol, atol=1e-15 if tol < 1e-9 else 1e-7)
        xs, ys = r.forward(np.array([30.0]), np.array([-lat_deg]))
        np.testing.assert_allclose(ys, [-1.3523 * yi], rtol=tol, atol=1e-15 if tol < 1e-9 else 1e-7)


def test_omerc_conformal_and_center_scale():
    """Hotine oblique Mercator is conformal (h == k) and the scale on the
    projection center equals k0 (Snyder ch. 9)."""
    p = P.HotineObliqueMercator(P.WGS84, lat0=4.0, lonc=115.0,
                                alpha=53.31582, k0=0.99984)
    lon, lat = _grid(108.0, 122.0, -4.0, 12.0, n=7)
    dxl, dyl, dxp, dyp = _jacobian(p, lon, lat)
    par_len, mer_len = _metric(p.ellipsoid, lat)
    k = np.hypot(dxl, dyl) / par_len
    h = np.hypot(dxp, dyp) / mer_len
    np.testing.assert_allclose(h, k, rtol=5e-5)
    dxl, dyl, _, _ = _jacobian(p, np.array([115.0]), np.array([4.0]))
    pc, _ = _metric(p.ellipsoid, np.array([4.0]))
    np.testing.assert_allclose(np.hypot(dxl, dyl) / pc, [0.99984], rtol=1e-6)


def test_omerc_roundtrip_and_false_origin():
    p = P.HotineObliqueMercator(P.WGS84, lat0=4.0, lonc=115.0, alpha=53.3,
                                k0=0.99984, fe=590476.87, fn=442857.65)
    lon, lat = _grid(105.0, 125.0, -10.0, 18.0, n=7)
    x, y = p.forward(lon, lat)
    lon2, lat2 = p.inverse(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9, rtol=0)
    np.testing.assert_allclose(lat2, lat, atol=1e-9, rtol=0)
    # southern-aperture setup exercises the lat0 < 0 u_c sign branch
    s = P.HotineObliqueMercator(P.WGS84, lat0=-20.0, lonc=140.0, alpha=-35.0)
    x, y = s.forward(lon, lat)
    lon2, lat2 = s.inverse(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9, rtol=0)
    np.testing.assert_allclose(lat2, lat, atol=1e-9, rtol=0)


def test_omerc_rejects_degenerate_azimuth():
    for bad in (0.0, 90.0, -90.0):
        with pytest.raises(ValueError):
            P.HotineObliqueMercator(P.WGS84, lat0=4.0, lonc=115.0, alpha=bad)


def test_new_projections_in_parser():
    m = P.crs("+proj=moll +a=6378137 +lon_0=15")
    assert isinstance(m, P.Mollweide) and m.lon0 == 15.0
    assert isinstance(P.crs("+proj=wag4"), P.Wagner4)
    assert isinstance(P.crs("+proj=wag5"), P.Wagner5)
    assert isinstance(P.crs("esri:54009"), P.Mollweide)
    r = P.crs("esri:54030")
    assert isinstance(r, P.Robinson) and r.R == 6378137.0
    o = P.crs("+proj=omerc +lat_0=4 +lonc=115 +alpha=53.3 +k=0.99984"
              " +x_0=590476.87 +y_0=442857.65 +ellps=WGS84")
    assert isinstance(o, P.HotineObliqueMercator)
    assert o.k0 == 0.99984 and o.fe == 590476.87
    # transform() chains through the new CRSs end-to-end
    x, y = P.transform("latlng", "robinson", np.array([12.0]), np.array([45.0]))
    lon, lat = P.transform("robinson", "latlng", x, y)
    np.testing.assert_allclose([float(lon[0]), float(lat[0])], [12.0, 45.0], atol=1e-6)
