"""Geohash codec: canonical vectors, an independent bisection oracle, and
NumPy / Spark SQL / DuckDB lockstep (the engine and the DuckDB correctness
oracle must agree char-for-char)."""

import duckdb
import numpy as np
import pytest

from tilegrid import cell


def _bisect_geohash(lon, lat, precision):
    """Textbook bisection reference (Niemeyer's algorithm), bit by bit —
    deliberately independent of the vectorized quantize+interleave path."""
    lo_lon, hi_lon, lo_lat, hi_lat = -180.0, 180.0, -90.0, 90.0
    bits, out, even = 0, [], True
    ch = 0
    for _ in range(5 * precision):
        if even:
            mid = (lo_lon + hi_lon) / 2
            if lon >= mid:
                ch = (ch << 1) | 1
                lo_lon = mid
            else:
                ch <<= 1
                hi_lon = mid
        else:
            mid = (lo_lat + hi_lat) / 2
            if lat >= mid:
                ch = (ch << 1) | 1
                lo_lat = mid
            else:
                ch <<= 1
                hi_lat = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(cell.GEOHASH32[ch])
            bits, ch = 0, 0
    return "".join(out)


class TestGeohashNumpy:
    def test_canonical_vectors(self):
        assert geohash1(-5.6, 42.6, 5) == "ezs42"
        assert geohash1(-0.1278, 51.5074, 6) == "gcpvj0"
        assert geohash1(139.6917, 35.6895, 6) == "xn774c"

    @pytest.mark.parametrize("precision", [1, 2, 3, 5, 6, 7, 8])
    def test_matches_bisection_reference(self, precision):
        rng = np.random.default_rng(precision)
        lon = rng.uniform(-180, 180, 300)
        lat = rng.uniform(-90, 90, 300)
        got = cell.geohash_encode(lon, lat, precision)
        for g, lo, la in zip(got, lon, lat):
            assert g == _bisect_geohash(lo, la, precision)

    def test_edges_clamp(self):
        lon = np.array([-180.0, 180.0, 179.999999, 0.0])
        lat = np.array([-90.0, 90.0, 89.999999, 0.0])
        got = cell.geohash_encode(lon, lat, 6)
        # +180 / +90 clamp into the last cell rather than overflowing
        assert got[1] == cell.geohash_encode(179.9999999, 89.9999999, 6)

    @pytest.mark.parametrize("precision", [3, 5, 6])
    def test_decode_contains_point(self, precision):
        rng = np.random.default_rng(precision + 100)
        lon = rng.uniform(-180, 180, 200)
        lat = rng.uniform(-90, 90, 200)
        gh = cell.geohash_encode(lon, lat, precision)
        clon, clat, elon, elat = cell.geohash_decode(gh)
        assert np.all(np.abs(clon - lon) <= elon + 1e-12)
        assert np.all(np.abs(clat - lat) <= elat + 1e-12)

    def test_precision_bounds(self):
        with pytest.raises(ValueError):
            cell.geohash_int(0.0, 0.0, 0)
        with pytest.raises(ValueError):
            cell.geohash_int(0.0, 0.0, 12)


def geohash1(lon, lat, precision):
    return str(np.asarray(cell.geohash_encode(lon, lat, precision)).item())


class TestGeohashSqlLockstep:
    def _points(self):
        rng = np.random.default_rng(42)
        lon = np.concatenate(
            [rng.uniform(-180, 180, 150), [-180.0, 180.0, 0.0, 179.999999]]
        )
        lat = np.concatenate(
            [rng.uniform(-90, 90, 150), [-90.0, 90.0, 0.0, 89.999999]]
        )
        return lon, lat

    @pytest.mark.parametrize("precision", [5, 6])
    def test_duckdb_matches_numpy(self, precision):
        lon, lat = self._points()
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE p AS SELECT * FROM (VALUES "
            + ",".join(f"({a!r},{b!r})" for a, b in zip(lon, lat))
            + ") t(lon, lat)"
        )
        ghi = cell.geohash_int_sql("lon", "lat", precision, "duckdb")
        chars = cell.geohash_chars_sql("ghi", precision, "duckdb")
        got = [
            r[0]
            for r in con.execute(
                f"WITH g AS (SELECT {ghi} AS ghi FROM p) "
                f"SELECT {chars} FROM g"
            ).fetchall()
        ]
        assert got == list(cell.geohash_encode(lon, lat, precision))

    @pytest.mark.parametrize("precision", [5, 6])
    def test_spark_matches_numpy(self, spark, precision):
        import pandas as pd
        from pyspark.sql import functions as F

        lon, lat = self._points()
        df = spark.createDataFrame(pd.DataFrame({"lon": lon, "lat": lat}))
        ghi = cell.geohash_int_sql("lon", "lat", precision, "spark")
        chars = cell.geohash_chars_sql("ghi", precision, "spark")
        out = (
            df.withColumn("ghi", F.expr(ghi))
            .withColumn("gh", F.expr(chars))
            .select("lon", "lat", "gh")
            .toPandas()
        )
        want = cell.geohash_encode(
            out.lon.to_numpy(), out.lat.to_numpy(), precision
        )
        assert list(out.gh) == list(want)


class TestGeohashNeighbors:
    def test_canonical_ezs42(self):
        # public canonical neighbor set of ezs42
        assert sorted(cell.geohash_neighbors("ezs42")) == sorted(
            ["ezs48", "ezs49", "ezefx", "ezs40", "ezs43", "ezefp",
             "ezs41", "ezefr"]
        )

    def test_neighbors_by_offset_encoding(self):
        rng = np.random.default_rng(5)
        for lon, lat in zip(
            rng.uniform(-170, 170, 30), rng.uniform(-80, 80, 30)
        ):
            gh = geohash1(lon, lat, 6)
            clon, clat, elon, elat = cell.geohash_decode(gh)
            got = set(cell.geohash_neighbors(gh))
            want = set()
            for dlat in (-1, 0, 1):
                for dlon in (-1, 0, 1):
                    if dlat == dlon == 0:
                        continue
                    want.add(
                        geohash1(
                            float(clon[0] + 2 * dlon * elon[0]),
                            float(clat[0] + 2 * dlat * elat[0]),
                            6,
                        )
                    )
            assert got == want

    def test_pole_clamp_and_antimeridian_wrap(self):
        top = geohash1(0.0, 89.99, 4)
        n = cell.geohash_neighbors(top)
        assert len(n) == 5  # the 3 past-the-pole cells are dropped
        west_edge = geohash1(-179.99, 0.0, 4)
        n2 = cell.geohash_neighbors(west_edge)
        assert len(n2) == 8  # wraps across the antimeridian
        assert any(
            cell.geohash_decode(g)[0][0] > 170 for g in n2
        )


class TestQuadkey:
    def test_canonical_bing_example(self):
        # docs.microsoft.com Bing tile system worked example
        assert str(np.asarray(cell.quadkey_encode(3, 3, 5)).item()) == "213"

    def test_roundtrip(self):
        rng = np.random.default_rng(9)
        for zoom in (1, 4, 8, 12):
            col = rng.integers(0, 1 << zoom, 50)
            row = rng.integers(0, 1 << zoom, 50)
            qk = cell.quadkey_encode(zoom, col, row)
            z2, c2, r2 = cell.quadkey_decode(qk)
            assert (z2 == zoom).all()
            np.testing.assert_array_equal(col, c2)
            np.testing.assert_array_equal(row, r2)

    def test_parent_is_prefix(self):
        qk = str(np.asarray(cell.quadkey_encode(6, 33, 21)).item())
        pqk = str(np.asarray(cell.quadkey_encode(5, 33 >> 1, 21 >> 1)).item())
        assert qk.startswith(pqk)

    def test_sql_lockstep_both_dialects(self, spark):
        import pandas as pd
        from pyspark.sql import functions as F

        rng = np.random.default_rng(10)
        zoom = 7
        pdf = pd.DataFrame(
            {
                "col": rng.integers(0, 1 << zoom, 100),
                "row": rng.integers(0, 1 << zoom, 100),
            }
        )
        want = list(cell.quadkey_encode(zoom, pdf.col.values, pdf.row.values))
        expr = cell.quadkey_sql("col", "row", zoom, "spark")
        got = (
            spark.createDataFrame(pdf)
            .withColumn("qk", F.expr(expr))
            .toPandas()
        )
        assert list(got.qk) == want
        con = duckdb.connect()
        con.register("p", pdf)
        dexpr = cell.quadkey_sql("col", "row", zoom, "duckdb")
        got2 = [r[0] for r in con.execute(f"SELECT {dexpr} FROM p").fetchall()]
        assert got2 == want
