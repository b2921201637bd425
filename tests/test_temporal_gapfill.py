"""temporal_gapfill: per-pixel linear interpolation of NoData gaps across
a space-time layer's time slices (beyond-reference member of the temporal
family — the reference stops at windowed reduces,
spark/src/main/scala/geotrellis/spark/mapalgebra/local/temporal/
LocalTemporalStatistics.scala:34-60)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tilegrid import codec
from tilegrid.operators import LAYER_SCHEMA
from tilegrid.operators.summary import temporal_gapfill

H = W = 4
SCHEMA = LAYER_SCHEMA + ", ts timestamp"


def _layer(spark, days, pixel_series, nodata=np.nan):
    """pixel_series: {(py, px): [v_day0, v_day1, ...]} — unset pixels are
    `nodata` in every slice."""
    rows = []
    for i, d in enumerate(days):
        a = np.full((H, W), nodata, dtype=np.float64)
        for (py, px), vs in pixel_series.items():
            a[py, px] = vs[i]
        rows.append(
            (3, 2, 1, 9, codec.raw_encode(a), H, W, "raw", pd.Timestamp(d))
        )
    pdf = pd.DataFrame(
        rows,
        columns=["zoom", "col", "row", "cell", "tile", "h", "w", "fmt", "ts"],
    )
    return spark.createDataFrame(pdf, schema=SCHEMA)


def _decoded(out):
    out = out.sort_values("ts").reset_index(drop=True)
    return [codec.decode_tile(bytes(t), f) for t, f in zip(out.tile, out.fmt)]


def _py_fill(values, ts_ns):
    """Per-pixel reference replay: the documented formula, interior only."""
    vals = list(values)
    valid = [i for i, v in enumerate(vals) if not np.isnan(v)]
    for i, v in enumerate(vals):
        if not np.isnan(v):
            continue
        before = [j for j in valid if j < i]
        after = [j for j in valid if j > i]
        if before and after:
            p, n = before[-1], after[0]
            vp, vn = values[p], values[n]
            t, tp, tn = float(ts_ns[i]), float(ts_ns[p]), float(ts_ns[n])
            vals[i] = vp + (vn - vp) * ((t - tp) / (tn - tp))
    return vals


class TestTemporalGapfill:
    def test_interior_fill_unequal_spacing(self, spark):
        """Time-weighted (not slice-index) interpolation: a gap closer in
        time to its left neighbour takes more of the left value. Exact
        bit-match vs the python replay of the documented formula."""
        days = ["2024-01-01", "2024-01-02", "2024-01-09"]  # 1-day then 7-day
        series = {(0, 0): [10.0, np.nan, 90.0]}
        out = _decoded(temporal_gapfill(_layer(spark, days, series), "ts").toPandas())
        ts_ns = [pd.Timestamp(d).value for d in days]
        expect = _py_fill(series[(0, 0)], ts_ns)
        got = [a[0, 0] for a in out]
        assert got == expect  # bitwise: same formula, same operand order
        assert abs(got[1] - 20.0) < 1e-9  # 1/8 of the way from 10 to 90

    def test_leading_trailing_and_allgap_stay_nodata(self, spark):
        days = [f"2024-01-0{i}" for i in range(1, 5)]
        series = {
            (0, 0): [10.0, np.nan, np.nan, 40.0],  # both fill
            (1, 1): [np.nan, 5.0, np.nan, np.nan],  # lead+trail stay
        }
        out = _decoded(temporal_gapfill(_layer(spark, days, series), "ts").toPandas())
        assert [a[0, 0] for a in out] == [10.0, 20.0, 30.0, 40.0]
        p11 = [a[1, 1] for a in out]
        assert p11[1] == 5.0 and np.isnan(p11[0]) and np.isnan(p11[2:]).all()
        assert all(np.isnan(a[2, 2]) for a in out)  # all-gap pixel untouched

    def test_sentinel_nodata(self, spark):
        """nodata=0.0 treats zero (the count-raster gap value) as the gap;
        valid values interpolate over it, unfillable zeros survive."""
        days = [f"2024-01-0{i}" for i in range(1, 5)]
        series = {(0, 0): [2.0, 0.0, 0.0, 8.0], (1, 1): [0.0, 0.0, 0.0, 3.0]}
        layer = _layer(spark, days, series, nodata=0.0)
        out = _decoded(temporal_gapfill(layer, "ts", nodata=0.0).toPandas())
        assert [a[0, 0] for a in out] == [2.0, 4.0, 6.0, 8.0]
        assert [a[1, 1] for a in out] == [0.0, 0.0, 0.0, 3.0]

    def test_slice_count_and_metadata_preserved(self, spark):
        days = ["2024-01-01", "2024-01-02"]
        df = _layer(spark, days, {(0, 0): [1.0, 2.0]})
        out = temporal_gapfill(df, "ts").toPandas()
        assert len(out) == 2
        assert (out.zoom == 3).all() and (out.col == 2).all()
        assert (out.fmt == "raw").all() and (out.h == H).all()

    def test_single_shuffle(self, spark):
        """One groupBy on the spatial key is the only Exchange — the same
        distribution shape as temporal_stats; no cartesian, no collect."""
        df = _layer(spark, ["2024-01-01", "2024-01-02"], {(0, 0): [1.0, 2.0]})
        plan = (
            temporal_gapfill(df, "ts")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange hashpartitioning") == 1
        assert "CartesianProduct" not in plan

    def test_rejects_unknown_columns(self, spark):
        df = _layer(spark, ["2024-01-01"], {(0, 0): [1.0]}).withColumn(
            "stray", F.lit(1)
        )
        with pytest.raises(AssertionError):
            temporal_gapfill(df, "ts")


class TestTemporalTrend:
    def _slopes(self, spark, days, series, nodata=np.nan):
        from tilegrid.operators.summary import temporal_trend

        layer = _layer(spark, days, series, nodata=nodata)
        nd = None if np.isnan(nodata) else nodata
        out = temporal_trend(layer, "ts", nodata=nd).toPandas()
        assert len(out) == 1  # one trend tile per spatial key
        return codec.decode_tile(bytes(out.tile[0]), out.fmt[0])

    def test_known_slope(self, spark):
        """y = 2x + 1 over day numbers -> slope exactly 2.0 (all sums are
        exact integers, so OLS is bit-deterministic)."""
        days = ["2024-01-01", "2024-01-03", "2024-01-07"]
        dn = [pd.Timestamp(d).value // 86_400_000_000_000 for d in days]
        series = {(0, 0): [2.0 * d + 1.0 for d in dn]}
        arr = self._slopes(spark, days, series)
        assert arr[0, 0] == 2.0

    def test_matches_python_ols(self, spark):
        days = ["2024-01-01", "2024-01-02", "2024-01-05", "2024-01-09"]
        vals = [3.0, 7.0, 2.0, 11.0]
        arr = self._slopes(spark, days, {(1, 2): vals})
        x = np.array(
            [pd.Timestamp(d).value // 86_400_000_000_000 for d in days],
            dtype=np.float64,
        )
        v = np.array(vals)
        n = float(len(v))
        expect = (n * (x * v).sum() - x.sum() * v.sum()) / (
            n * (x * x).sum() - x.sum() * x.sum()
        )
        assert arr[1, 2] == expect  # bitwise: same exact-integer sums

    def test_under_two_valid_is_nodata(self, spark):
        days = ["2024-01-01", "2024-01-02", "2024-01-03"]
        series = {
            (0, 0): [5.0, np.nan, np.nan],   # 1 valid -> NaN
            (1, 1): [1.0, np.nan, 3.0],      # 2 valid -> slope 1.0
        }
        arr = self._slopes(spark, days, series)
        assert np.isnan(arr[0, 0]) and np.isnan(arr[2, 2])
        assert arr[1, 1] == 1.0

    def test_sentinel_nodata(self, spark):
        days = ["2024-01-01", "2024-01-02", "2024-01-03"]
        series = {(0, 0): [2.0, 0.0, 6.0]}  # 0 is a gap, not a value
        arr = self._slopes(spark, days, series, nodata=0.0)
        assert arr[0, 0] == 2.0  # (6-2)/(d3-d1) = 4/2

    def test_single_shuffle(self, spark):
        from tilegrid.operators.summary import temporal_trend

        df = _layer(spark, ["2024-01-01", "2024-01-02"], {(0, 0): [1.0, 2.0]})
        plan = (
            temporal_trend(df, "ts")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange hashpartitioning") == 1
        assert "CartesianProduct" not in plan


class TestTemporalArgmax:
    def _two_layers(self, spark, days, q_series, v_series):
        return (
            _layer(spark, days, q_series),
            _layer(spark, days, v_series),
        )

    def _composite(self, spark, days, q_series, v_series, nodata=None):
        from tilegrid.operators.summary import temporal_argmax

        q, v = self._two_layers(spark, days, q_series, v_series)
        out = temporal_argmax(q, v, "ts", nodata=nodata).toPandas()
        assert len(out) == 1
        return codec.decode_tile(bytes(out.tile[0]), out.fmt[0])

    def test_max_quality_wins_and_carries_payload(self, spark):
        days = ["2024-01-01", "2024-01-02", "2024-01-03"]
        arr = self._composite(
            spark, days,
            {(0, 0): [1.0, 9.0, 3.0]},        # quality peaks on day 2
            {(0, 0): [100.0, 200.0, 300.0]},  # payload
        )
        assert arr[0, 0] == 200.0

    def test_tie_earliest_slice_wins(self, spark):
        days = ["2024-01-01", "2024-01-02", "2024-01-03"]
        arr = self._composite(
            spark, days,
            {(0, 0): [5.0, 5.0, 2.0]},
            {(0, 0): [111.0, 222.0, 333.0]},
        )
        assert arr[0, 0] == 111.0

    def test_gap_quality_never_wins(self, spark):
        days = ["2024-01-01", "2024-01-02"]
        arr = self._composite(
            spark, days,
            {(0, 0): [np.nan, 1.0], (1, 1): [np.nan, np.nan]},
            {(0, 0): [999.0, 7.0], (1, 1): [4.0, 5.0]},
        )
        assert arr[0, 0] == 7.0          # NaN quality slice skipped
        assert np.isnan(arr[1, 1])       # no valid slice -> NoData
        q_series = {(0, 0): [0.0, 2.0]}
        arr2 = self._composite(
            spark, days, q_series, {(0, 0): [50.0, 60.0]}, nodata=0.0
        )
        assert arr2[0, 0] == 60.0        # sentinel quality skipped too

    def test_single_shuffle_round(self, spark):
        """The q-v equi-join and the groupBy share the spatial key: the
        plan needs one hash-partitioning round per input, no cartesian."""
        from tilegrid.operators.summary import temporal_argmax

        q, v = self._two_layers(
            spark, ["2024-01-01"], {(0, 0): [1.0]}, {(0, 0): [2.0]}
        )
        plan = (
            temporal_argmax(q, v, "ts")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan


class TestKernelDensityStats:
    def _pts(self, spark):
        import pandas as pdlib

        pdf = pdlib.DataFrame(
            {
                "x": [10.0, 10.0, 100.0],
                "y": [40.0, 40.0, -40.0],
                "w": [3.0, 7.0, 2.0],
            }
        )
        return spark.createDataFrame(pdf)

    def test_weighted_sum_and_max(self, spark):
        from tilegrid.grid import LATLNG_WORLD, LayoutDefinition, TileLayout
        from tilegrid.operators.rasterize import kernel_density

        layout = LayoutDefinition(LATLNG_WORLD, TileLayout(4, 4, 8, 8))
        k = np.ones((1, 1))

        def pixel(df, want):
            out = df.toPandas()
            vals = {}
            for t in out.itertuples(index=False):
                arr = codec.decode_tile(bytes(t.tile), t.fmt)
                m = ~np.isnan(arr) & (arr != 0.0) if want == "nz" else ~np.isnan(arr)
                for yy, xx in zip(*np.nonzero(m)):
                    vals[(t.col, t.row, int(xx), int(yy))] = arr[yy, xx]
            return vals

        wsum = pixel(
            kernel_density(self._pts(spark), layout, 2, k, weight="w"), "nz"
        )
        wmax = pixel(
            kernel_density(self._pts(spark), layout, 2, k, weight="w", stat="max"),
            "all",
        )
        assert 10.0 in wsum.values() and 2.0 in wsum.values()  # 3+7 stamp-sum
        assert 7.0 in wmax.values() and 2.0 in wmax.values()   # max, not sum
        assert 10.0 not in wmax.values()

    def test_max_untouched_pixels_are_nan(self, spark):
        from tilegrid.grid import LATLNG_WORLD, LayoutDefinition, TileLayout
        from tilegrid.operators.rasterize import kernel_density

        layout = LayoutDefinition(LATLNG_WORLD, TileLayout(4, 4, 8, 8))
        out = kernel_density(
            self._pts(spark), layout, 2, np.ones((1, 1)), weight="w", stat="max"
        ).toPandas()
        arrs = [codec.decode_tile(bytes(t), f) for t, f in zip(out.tile, out.fmt)]
        assert all(np.isnan(a).sum() >= a.size - 2 for a in arrs)

    def test_rejects_unknown_stat(self, spark):
        from tilegrid.grid import LATLNG_WORLD, LayoutDefinition, TileLayout
        from tilegrid.operators.rasterize import kernel_density

        layout = LayoutDefinition(LATLNG_WORLD, TileLayout(4, 4, 8, 8))
        with pytest.raises(ValueError):
            kernel_density(self._pts(spark), layout, 2, np.ones((1, 1)), stat="mean")
