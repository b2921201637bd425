"""Kriging: variogram fit, exact interpolation, held-out accuracy, and the
per-tile distributed surface."""

import numpy as np
import pandas as pd
import pytest

from tilegrid.kriging import (
    empirical_variogram, fit_spherical, ordinary_kriging, spherical_model,
)


def _field(p):
    return np.sin(p[:, 0] / 20.0) * 10.0 + p[:, 1] * 0.2


class TestKrigingKernel:
    def setup_method(self):
        rng = np.random.default_rng(7)
        self.pts = rng.random((120, 2)) * 100
        self.vals = _field(self.pts)
        h, g = empirical_variogram(self.pts, self.vals)
        self.model = fit_spherical(h, g)

    def test_variogram_monotone_start_and_fit(self):
        h, g = empirical_variogram(self.pts, self.vals)
        assert len(h) >= 6 and (np.diff(h) > 0).all()
        nugget, sill, rng_ = self.model
        assert 0 <= nugget < sill and rng_ > 0
        # fitted curve tracks the empirical one
        resid = spherical_model(h, *self.model) - g
        assert np.abs(resid).mean() < g.mean()

    def test_exact_at_samples(self):
        pred, var = ordinary_kriging(self.pts, self.vals, self.pts[:20], self.model)
        np.testing.assert_allclose(pred, self.vals[:20], atol=1e-8)
        assert (var < 1e-8).all()

    def test_held_out_accuracy(self):
        rng = np.random.default_rng(8)
        q = rng.random((40, 2)) * 100
        pred, var = ordinary_kriging(self.pts, self.vals, q, self.model)
        rmse = float(np.sqrt(((pred - _field(q)) ** 2).mean()))
        assert rmse < 0.1 * float(_field(q).std())
        assert (var >= 0).all()

    def test_duplicate_samples_handled(self):
        pts = np.vstack([self.pts, self.pts[:5]])
        vals = np.concatenate([self.vals, self.vals[:5]])
        pred, _ = ordinary_kriging(pts, vals, self.pts[:5], self.model)
        np.testing.assert_allclose(pred, self.vals[:5], atol=1e-8)


class TestKrigingGrid:
    def test_per_tile_surface(self, spark):
        from tilegrid.grid import Extent, LayoutDefinition, TileLayout
        from tilegrid.operators.interpolate import kriging_grid

        layout = LayoutDefinition(Extent(0.0, 0.0, 100.0, 100.0), TileLayout(4, 4, 8, 8))
        rng = np.random.default_rng(5)
        pts = rng.random((600, 2)) * 100
        vals = _field(pts)
        h, g = empirical_variogram(pts[:150], vals[:150])
        model = fit_spherical(h, g)
        df = spark.createDataFrame(
            pd.DataFrame({"x": pts[:, 0], "y": pts[:, 1], "value": vals})
        )
        out = kriging_grid(df, layout, 0, model, buffer_cells=6.0).toPandas()
        assert len(out) > 0
        # reconstruct pixel-center coords and compare with the true field
        cw = layout.cell_width
        ch = layout.cell_height
        cx = out.col * layout.tile_width + (out.px + 0.5) * cw
        cy = 100.0 - out.row * layout.tile_height - (out.py + 0.5) * ch
        true = _field(np.stack([cx.values, cy.values], axis=1))
        rmse = float(np.sqrt(((out.val.values - true) ** 2).mean()))
        assert rmse < 0.15 * float(true.std())
        assert (out.kvar.values >= 0).all()


class TestSimpleUniversal:
    """Simple / Universal kriging (reference vector/.../interpolation/
    {Simple,Universal}Kriging.scala semantics)."""

    def _samples(self):
        rng = np.random.RandomState(0)
        pts = rng.rand(50, 2) * 10
        vals = 2.0 + 0.5 * pts[:, 0] - 0.3 * pts[:, 1] + rng.rand(50) * 0.05
        return pts, vals

    def test_exact_at_samples(self):
        from tilegrid.kriging import simple_kriging, universal_kriging

        pts, vals = self._samples()
        model = (0.01, 1.0, 5.0)
        for fn, kw in ((simple_kriging, {}), (universal_kriging, {"degree": 1})):
            pred, _ = fn(pts, vals, pts, model, **kw)
            np.testing.assert_allclose(pred, vals, atol=1e-9)

    def test_simple_relaxes_to_mean_far_away(self):
        from tilegrid.kriging import simple_kriging

        pts, vals = self._samples()
        pred, var = simple_kriging(pts, vals, np.array([[1e4, 1e4]]),
                                   (0.01, 1.0, 5.0))
        assert abs(pred[0] - vals.mean()) < 1e-9
        assert abs(var[0] - 1.0) < 1e-9  # full sill variance far out

    def test_universal_extrapolates_linear_drift(self):
        from tilegrid.kriging import ordinary_kriging, universal_kriging

        pts, vals = self._samples()
        q = np.array([[14.0, -3.0]])
        truth = 2.0 + 0.5 * 14.0 - 0.3 * -3.0 + 0.025
        pu, _ = universal_kriging(pts, vals, q, (0.01, 1.0, 5.0), degree=1)
        po, _ = ordinary_kriging(pts, vals, q, (0.01, 1.0, 5.0))
        assert abs(pu[0] - truth) < 0.2          # drift carried outward
        assert abs(po[0] - truth) > abs(pu[0] - truth)  # ordinary cannot

    def test_geo_exact_at_samples_low_nugget(self):
        from tilegrid.kriging import geo_kriging

        pts, vals = self._samples()
        pred, _ = geo_kriging(pts, vals, pts, degree=1)
        # noise is 0.05-uniform; GLS kriging with a fitted (near-zero)
        # nugget honors the data closely at the samples
        assert float(np.abs(pred - vals).max()) < 0.05

    def test_geo_beats_ols_drift_on_quadratic_field(self):
        from tilegrid.kriging import geo_kriging

        rng = np.random.RandomState(3)
        pts = rng.rand(80, 2) * 10

        def field(p):
            return 1.0 + 0.4 * p[:, 0] - 0.2 * p[:, 1] + 0.05 * p[:, 0] * p[:, 1]

        vals = field(pts) + rng.randn(80) * 0.02
        q = rng.rand(30, 2) * 10
        pred, err = geo_kriging(pts, vals, q, degree=2)
        rmse = float(np.sqrt(((pred - field(q)) ** 2).mean()))
        # pure OLS drift fit (no kriging correction) as the bar
        F = np.stack(
            [np.ones(80), pts[:, 0], pts[:, 1], pts[:, 0] * pts[:, 1],
             pts[:, 0] ** 2, pts[:, 1] ** 2], axis=1
        )
        beta, *_ = np.linalg.lstsq(F, vals, rcond=None)
        Fq = np.stack(
            [np.ones(30), q[:, 0], q[:, 1], q[:, 0] * q[:, 1],
             q[:, 0] ** 2, q[:, 1] ** 2], axis=1
        )
        ols_rmse = float(np.sqrt(((Fq @ beta - field(q)) ** 2).mean()))
        assert rmse <= ols_rmse * 1.05
        assert np.isfinite(err).all() and (err >= 0).all()

    def test_kriging_grid_methods(self, spark):
        import pandas as pd

        from tilegrid.grid import Extent, LayoutDefinition, TileLayout
        from tilegrid.operators.interpolate import kriging_grid

        layout = LayoutDefinition(
            Extent(0.0, 0.0, 16.0, 16.0), TileLayout(2, 2, 8, 8)
        )
        pts, vals = self._samples()
        df = spark.createDataFrame(
            pd.DataFrame({"x": pts[:, 0], "y": pts[:, 1], "value": vals})
        )
        for method in ("simple", "universal", "geo"):
            out = kriging_grid(
                df, layout, 1, (0.01, 1.0, 5.0), buffer_cells=16.0,
                method=method,
            ).toPandas()
            assert len(out) > 0
            assert np.isfinite(out.val).all()
