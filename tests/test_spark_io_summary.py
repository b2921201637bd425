"""Tests: layer IO (pruning, manifests, resume), summaries, rasterize,
vectorize, reshape, render."""

import os

import numpy as np
import pandas as pd
import pytest

from tilegrid import codec, fixtures, oracle
from tilegrid.geometry import regular_ngon, wkb_decode, wkb_encode_polygon
from tilegrid.grid import Extent, ZoomedLayoutScheme
from tilegrid.meta import AttributeStore, LayerMeta
from tilegrid.operators import rasterize as R
from tilegrid.operators import reshape as RS
from tilegrid.operators import summary as S
from tilegrid.operators import vectorize as V
from tilegrid.celltype import FLOAT64
from tilegrid.grid import GridBounds, LayoutDefinition, TileLayout
from tilegrid.sources import layer_io as IO
from tilegrid.sources import render as RD

# test layout: an 8x8 grid of 16px tiles over a simple square world
WORLD = Extent(0.0, 0.0, 128.0, 128.0)
LAYOUT = LayoutDefinition(WORLD, TileLayout(8, 8, 16, 16))


def layer_df(spark, variant, tile_size=16):
    return spark.createDataFrame(fixtures.tile_layer_table(variant, tile_size=tile_size))


def stitched(pdf):
    arr, _ = fixtures.stitch_layer_df(pdf)
    return arr


def make_meta(zoom=8):
    return LayerMeta(
        cell_type=FLOAT64, layout=LAYOUT, extent=WORLD, crs="webmercator",
        bounds=GridBounds(*fixtures.TEST_BOUNDS), zoom=zoom,
    )


class TestLayerIO:
    def test_roundtrip_and_pruning(self, spark, tmp_path):
        root = str(tmp_path / "layers")
        df = layer_df(spark, "increasing")
        assert IO.write_layer(df, root, "inc", 8, meta=make_meta())
        back = IO.read_layer(spark, root, "inc", 8)
        assert back.count() == 42
        np.testing.assert_allclose(
            stitched(back.toPandas()), stitched(fixtures.tile_layer_table("increasing"))
        )
        # key-bounds pruning
        q = IO.read_layer(
            spark, root, "inc", 8, where=[IO.Intersects(key_bounds=(2, 2, 3, 3))]
        ).toPandas()
        assert set(zip(q.col, q.row)) == {(c, r) for c in (2, 3) for r in (2, 3)}
        # extent pruning: tile (1,1) extent in layout coords
        ext = LAYOUT.map_transform.extent_for_key(1, 1)
        q2 = IO.read_layer(spark, root, "inc", 8, where=[IO.Intersects(extent=ext)])
        got = {(r["col"], r["row"]) for r in q2.select("col", "row").collect()}
        assert (1, 1) in got and all(1 <= c <= 2 and 1 <= r <= 2 for c, r in got)

    def test_manifest_and_resume(self, spark, tmp_path):
        root = str(tmp_path / "layers")
        df = layer_df(spark, "all-ones")
        assert IO.write_layer(df, root, "ones", 8, meta=make_meta())
        assert IO.verify_manifest(spark, root, "ones", 8)
        m = AttributeStore(root).read_attr("ones", 8, "manifest")
        assert sum(f["n_rows"] for f in m["files"]) == 42
        # non-overlapping sorted cell ranges across files
        spans = sorted((f["min_cell"], f["max_cell"]) for f in m["files"])
        for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
            assert a1 < b0
        # resume: second write is skipped
        assert IO.write_layer(df, root, "ones", 8, resume=True) is False

    def test_murmur3_matches_spark_hash(self, spark):
        from tilegrid.cell import murmur3_int32

        vals = [0, 1, 7, 42, 123456, 2**31 - 1, -5]
        rows = (
            spark.createDataFrame([(v,) for v in vals], "v int")
            .selectExpr("v", "hash(v) AS h")
            .collect()
        )
        for r in rows:
            assert murmur3_int32(r["v"]) == r["h"], r["v"]

    def test_write_layer_even_volume_breaks(self, spark, tmp_path):
        from tilegrid.cell import index_breaks, merge_ranges, zranges

        root = str(tmp_path / "layers")
        df = layer_df(spark, "increasing")
        # SFC ranges of the occupied key bounds drive deterministic breaks
        c0, r0, c1, r1 = fixtures.TEST_BOUNDS
        ranges = zranges(c0, r0, c1, r1)
        assert IO.write_layer(
            df, root, "inc", 8, meta=make_meta(), target_partitions=4,
            index_ranges=ranges,
        )
        back = IO.read_layer(spark, root, "inc", 8)
        assert back.count() == 42
        # each output file's cell span respects the break boundaries:
        # file spans must not straddle a break (break = inclusive bin end)
        m = AttributeStore(root).read_attr("inc", 8, "manifest")
        breaks = index_breaks(merge_ranges(ranges), 3)
        for f in m["files"]:
            for b in breaks:
                assert not (f["min_cell"] <= b < f["max_cell"]), (f, b)
        # deterministic: a second write produces the identical manifest spans
        import shutil

        shutil.rmtree(os.path.join(root, "_checkpoints"))
        IO.write_layer(
            df, root, "inc", 8, meta=make_meta(), target_partitions=4,
            index_ranges=ranges,
        )
        m2 = AttributeStore(root).read_attr("inc", 8, "manifest")
        spans = sorted((f["min_cell"], f["max_cell"], f["n_rows"]) for f in m["files"])
        spans2 = sorted((f["min_cell"], f["max_cell"], f["n_rows"]) for f in m2["files"])
        assert spans == spans2

    def test_pushdown_in_plan(self, spark, tmp_path):
        root = str(tmp_path / "layers")
        IO.write_layer(layer_df(spark, "all-ones"), root, "ones", 8, meta=make_meta())
        q = IO.read_layer(
            spark, root, "ones", 8, where=[IO.Intersects(key_bounds=(2, 2, 3, 3))]
        )
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters" in plan and "cell" in plan


class TestLayerManager:
    """LayerDeleter/Copier/Mover/Reindexer/ValueReader parity
    (spark/.../io/{LayerDeleter,GenericLayerCopier,GenericLayerMover,
    GenericLayerReindexer,ValueReader}.scala)."""

    def _write(self, spark, root, name="src"):
        df = layer_df(spark, "increasing")
        IO.write_layer(df, root, name, 8, meta=make_meta())
        return df

    def test_copy_then_both_readable_and_equal(self, spark, tmp_path):
        root = str(tmp_path / "layers")
        self._write(spark, root)
        IO.copy_layer(spark, root, "src", "dst", 8)
        a = IO.read_layer(spark, root, "src", 8).toPandas()
        b = IO.read_layer(spark, root, "dst", 8).toPandas()
        np.testing.assert_allclose(stitched(a), stitched(b))
        assert AttributeStore(root).read_attr("dst", 8, "manifest")["n_files"] >= 1
        with pytest.raises(ValueError, match="already exists"):
            IO.copy_layer(spark, root, "src", "dst", 8)

    def test_move_removes_source(self, spark, tmp_path):
        root = str(tmp_path / "layers")
        df = self._write(spark, root)
        IO.move_layer(spark, root, "src", "moved", 8)
        assert not AttributeStore(root).layer_exists("src", 8)
        assert not os.path.exists(os.path.join(root, "src", "zoom=8"))
        back = IO.read_layer(spark, root, "moved", 8)
        assert back.count() == df.count()

    def test_delete_removes_data_and_sidecars(self, spark, tmp_path):
        root = str(tmp_path / "layers")
        self._write(spark, root)
        IO.delete_layer(root, "src", 8)
        assert not os.path.exists(os.path.join(root, "src", "zoom=8"))
        assert not os.path.exists(os.path.join(root, "_layers", "src", "8.metadata.json"))
        assert not os.path.exists(os.path.join(root, "_checkpoints", "src", "zoom=8.done"))
        with pytest.raises(ValueError, match="not found"):
            IO.delete_layer(root, "src")
        # resume marker gone: a re-write with resume=True is NOT skipped
        assert IO.write_layer(layer_df(spark, "increasing"), root, "src", 8,
                              meta=make_meta(), resume=True)

    @pytest.mark.parametrize("index", ["hilbert", "rowmajor", "z2"])
    def test_reindex_preserves_content_and_resorts(self, spark, tmp_path, index):
        from tilegrid.cell import hilbert_encode, rowmajor_encode, z2_encode

        root = str(tmp_path / "layers")
        self._write(spark, root)
        IO.reindex_layer(spark, root, "src", 8, index=index)
        back = IO.read_layer(spark, root, "src", 8).toPandas()
        np.testing.assert_allclose(
            stitched(back), stitched(fixtures.tile_layer_table("increasing"))
        )
        col, row = back["col"].to_numpy(), back["row"].to_numpy()
        if index == "hilbert":
            want = hilbert_encode(col, row, 3)
        elif index == "rowmajor":
            want = rowmajor_encode(col, row, LAYOUT.tile_layout.layout_cols)
        else:
            want = z2_encode(col, row)
        np.testing.assert_array_equal(back["cell"].to_numpy(), np.asarray(want))
        ki = AttributeStore(root).read_attr("src", 8, "key_index")
        assert ki["index"] == index
        # manifest spans follow the NEW curve (sorted, non-overlapping)
        m = AttributeStore(root).read_attr("src", 8, "manifest")
        spans = sorted((f["min_cell"], f["max_cell"]) for f in m["files"])
        for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
            assert a1 < b0

    def test_value_reader_single_tile(self, spark, tmp_path):
        root = str(tmp_path / "layers")
        self._write(spark, root)
        read = IO.value_reader(spark, root, "src", 8)
        row = read(2, 3)
        assert row is not None and row["col"] == 2 and row["row"] == 3
        want = fixtures.layer_tile("increasing", 2, 3, 16)
        np.testing.assert_allclose(codec.decode_tile(bytes(row["tile"]), "raw"), want)
        assert read(0, 0) is None  # outside TEST_BOUNDS


class TestSummaries:
    def test_min_max_and_mean(self, spark):
        a = layer_df(spark, "increasing")
        mm = S.min_max(a).collect()[0]
        src = stitched(fixtures.tile_layer_table("increasing"))
        assert mm["vmin"] == 0.0 and mm["vmax"] == src.max()
        ms = S.mean_stddev(a).collect()[0]
        np.testing.assert_allclose(ms["mean"], src.mean())
        np.testing.assert_allclose(ms["stddev"], src.std(), rtol=1e-9)

    def test_exact_histogram(self, spark):
        a = layer_df(spark, "zones")
        got = {r["value"]: r["count"] for r in S.histogram_exact_int(a).collect()}
        src = stitched(fixtures.tile_layer_table("zones"))
        vals, counts = np.unique(src, return_counts=True)
        assert got == {int(v): int(c) for v, c in zip(vals, counts)}

    def test_fixed_histogram_total(self, spark):
        a = layer_df(spark, "mod-10000")
        rows = S.histogram(a, num_buckets=20).collect()
        src = stitched(fixtures.tile_layer_table("mod-10000"))
        assert sum(r["count"] for r in rows) == src.size

    def test_class_breaks_quartiles(self, spark):
        a = layer_df(spark, "increasing")
        br = S.class_breaks(a, 4, exact=True)  # small-int domain: exact opt-in
        src = np.sort(stitched(fixtures.tile_layer_table("increasing")).ravel())
        want = [src[int(q * len(src)) - 1] for q in (0.25, 0.5, 0.75, 1.0)]
        np.testing.assert_allclose(br, want, atol=1.0)
        # bucketed (scale-safe) path: bounded driver traffic, breaks within
        # one bucket width of the exact quantiles
        br2 = S.class_breaks(a, 4, exact=False, num_buckets=512)
        width = (src[-1] - src[0]) / 512
        np.testing.assert_allclose(br2, want, atol=width + 1.0)

    def test_polygonal_summary(self, spark):
        a = layer_df(spark, "increasing")
        # polygon in the test layout's map coords = a square over tiles (2,2)-(3,3)
        ring = np.array([[33.0, 63.0], [63.0, 63.0], [63.0, 33.0], [33.0, 33.0]])
        got = S.polygonal_summary(a, [ring], LAYOUT).collect()[0]
        src = stitched(fixtures.tile_layer_table("increasing"))
        # oracle: mask pixel centers inside polygon over the bounds grid
        cmin, rmin, cmax, rmax = fixtures.TEST_BOUNDS
        full = np.full((8 * 16, 8 * 16), np.nan)
        full[rmin * 16 : (rmax + 1) * 16, cmin * 16 : (cmax + 1) * 16] = src
        m = oracle.rasterize_polygon([ring], WORLD, 128, 128)
        sel = full[m & ~np.isnan(full)]
        assert got["count"] == sel.size
        np.testing.assert_allclose(got["sum"], sel.sum())
        np.testing.assert_allclose(got["mean"], sel.mean())


class TestRasterize:
    def test_scanline_equals_center_pip(self):
        ring = regular_ngon(60.0, 60.0, 7, 25.0, rot=0.3)
        a = R.scanline_rasterize([ring], WORLD, 128, 128)
        b = oracle.rasterize_polygon([ring], WORLD, 128, 128)
        np.testing.assert_array_equal(a, b)

    def test_rasterize_to_layer(self, spark):
        polys = pd.DataFrame(
            {
                "polygon_id": ["p1"],
                "wkb": [wkb_encode_polygon([regular_ngon(40.0, 80.0, 6, 20.0)])],
                "zone": [7],
            }
        )
        out = R.rasterize_to_layer(polys, LAYOUT, 8, spark).toPandas()
        assert len(out) > 0
        total = 0
        for t in out.itertuples(index=False):
            arr = codec.decode_tile(bytes(t.tile), t.fmt)
            total += int((~np.isnan(arr)).sum())
        want = oracle.rasterize_polygon(
            [regular_ngon(40.0, 80.0, 6, 20.0)], WORLD, 128, 128
        ).sum()
        assert total == want

    def test_kernel_density_conserves_mass(self, spark):
        rng = np.random.default_rng(3)
        pts = pd.DataFrame(
            {
                "point_id": [f"p{i}" for i in range(50)],
                "x": rng.uniform(20, 100, 50),
                "y": rng.uniform(20, 100, 50),
            }
        )
        kern = np.ones((3, 3))
        out = R.kernel_density(spark.createDataFrame(pts), LAYOUT, 8, kern).toPandas()
        total = sum(
            np.nansum(codec.decode_tile(bytes(t.tile), t.fmt))
            for t in out.itertuples(index=False)
        )
        # all kernels fully inside the world: mass = 9 per point
        np.testing.assert_allclose(total, 9.0 * 50)


class TestVectorize:
    def test_region_group_labels(self):
        arr = np.array(
            [
                [1.0, 1.0, 2.0],
                [1.0, 2.0, 2.0],
                [3.0, 3.0, np.nan],
            ]
        )
        labels = V.region_group(arr)
        assert labels[0, 0] == labels[1, 0] == labels[0, 1]
        assert labels[0, 2] == labels[1, 1] == labels[1, 2]
        assert labels[2, 0] == labels[2, 1]
        assert labels[2, 2] == -1
        assert len(np.unique(labels[labels >= 0])) == 3

    def test_vectorize_roundtrip_via_pip(self, spark):
        # rasterize a polygon, vectorize it back, check pixel membership
        layer = R.rasterize_to_layer(
            pd.DataFrame(
                {
                    "polygon_id": ["p"],
                    "wkb": [wkb_encode_polygon([regular_ngon(64.0, 64.0, 4, 20.0)])],
                    "zone": [5],
                }
            ),
            LAYOUT, 8, spark,
        )
        feats = V.vectorize(layer, LAYOUT).toPandas()
        assert len(feats) >= 1
        assert (feats.value == 5.0).all()
        # total traced pixels match burned pixels
        burned = oracle.rasterize_polygon(
            [regular_ngon(64.0, 64.0, 4, 20.0)], WORLD, 128, 128
        ).sum()
        assert feats.n_pixels.sum() == burned

    def test_region_group_layer_cross_tile(self, spark):
        """Distributed per-pixel region ids match a whole-raster NumPy
        union-find on a snake that crosses many tile boundaries + NoData."""
        from tilegrid.cell import z2_encode
        from tilegrid import codec as C

        # 64x64 world, 4x4 tiles of 16: an S-snake of value 7 over a 0
        # background, with a NoData moat splitting the background
        g = np.zeros((64, 64), dtype=np.float64)
        g[8:12, 4:60] = 7.0
        g[12:40, 56:60] = 7.0
        g[36:40, 4:60] = 7.0
        g[20:24, 0:30] = np.nan  # moat cuts background partially
        rows = []
        for col in range(4):
            for row in range(4):
                sub = g[row * 16 : row * 16 + 16, col * 16 : col * 16 + 16]
                rows.append(
                    (6, col, row, int(z2_encode(col, row)),
                     C.raw_encode(sub), 16, 16, "raw")
                )
        pdf = pd.DataFrame(
            rows, columns=["zoom", "col", "row", "cell", "tile", "h", "w", "fmt"]
        )
        layout = LayoutDefinition(
            Extent(0.0, 0.0, 64.0, 64.0), TileLayout(4, 4, 16, 16)
        )
        layer = spark.createDataFrame(pdf)
        out = V.region_group_layer(layer, layout).toPandas()
        # NumPy oracle: whole-raster union-find via the per-tile kernel
        labels = V.region_group(g)
        assert len(out) == int((~np.isnan(g)).sum())
        got = {}
        for r in out.itertuples(index=False):
            got[(r.gy, r.gx)] = r.region
        # same-partition structure: two pixels share a distributed region
        # iff they share a whole-raster label; region id = min gid
        import collections

        by_label = collections.defaultdict(list)
        for (i, j), reg in got.items():
            by_label[labels[i, j]].append((reg, i * 64 + j))
        for lab, members in by_label.items():
            regs = {m[0] for m in members}
            assert len(regs) == 1, f"label {lab} split into {regs}"
            assert regs.pop() == min(m[1] for m in members)
        # distinct distributed regions == distinct oracle labels
        assert len({v for v in got.values()}) == len(by_label)

    def test_raster_to_points(self, spark):
        a = layer_df(spark, "every-other-undefined")
        pts = V.raster_to_points(a, LAYOUT).toPandas()
        src = stitched(fixtures.tile_layer_table("every-other-undefined"))
        assert len(pts) == int((~np.isnan(src)).sum())


class TestReshape:
    def test_crop(self, spark):
        a = layer_df(spark, "all-ones")
        ext = Extent(30.0, 30.0, 70.0, 70.0)
        out = RS.crop(a, ext, LAYOUT).toPandas()
        total = sum(
            int((~np.isnan(codec.decode_tile(bytes(t.tile), t.fmt))).sum())
            for t in out.itertuples(index=False)
        )
        # pixel centers inside ext: 40x40 px square at 1 map unit/px
        assert total == 40 * 40

    def test_merge_layers(self, spark):
        a = layer_df(spark, "every-other-undefined")
        b = layer_df(spark, "all-hundreds")
        out = RS.merge_layers(a, b).toPandas()
        got = stitched(out)
        src = stitched(fixtures.tile_layer_table("every-other-undefined"))
        assert not np.isnan(got).any()
        np.testing.assert_allclose(got[np.isnan(src)], 100.0)
        np.testing.assert_allclose(got[~np.isnan(src)], src[~np.isnan(src)])

    def test_zoom_resample(self, spark):
        a = layer_df(spark, "increasing")
        out = RS.zoom_resample(a, 8, 9)
        assert out.count() == 42 * 4
        one = out.where("col = 2 AND row = 2").toPandas().iloc[0]
        arr = codec.decode_tile(bytes(one["tile"]), one["fmt"])
        src = fixtures.layer_tile("increasing", 1, 1, 16)
        np.testing.assert_allclose(arr[0, 0], src[0, 0])
        np.testing.assert_allclose(arr[0, 1], src[0, 0])  # NN upsample repeats

    def test_cell_filter_pushdown_reaches_scan(self, spark, tmp_path):
        """The LayerQuery cell-range predicate must reach the parquet scan
        (PushedFilters on `cell`) — the data-skipping contract behind the
        SFC-sorted write path."""
        root = str(tmp_path / "layers")
        df = layer_df(spark, "increasing")
        IO.write_layer(df, root, "inc", 8, meta=make_meta())
        q = IO.read_layer(
            spark, root, "inc", 8, where=[IO.Intersects(key_bounds=(2, 2, 3, 3))]
        )
        plan = q._jdf.queryExecution().executedPlan().toString()
        import re

        # the plan printer truncates long filter lists, so match the line
        pushed = re.findall(r"PushedFilters: \[[^\n]*", plan)
        assert pushed and any(
            "GreaterThanOrEqual(cell" in p or "cell" in p for p in pushed
        ), plan[:800]

    def test_histogram_matching_hits_target_range(self, spark):
        from tilegrid.operators import reshape as RS2

        a = layer_df(spark, "mod-10000")
        out = stitched(
            RS2.histogram_matching(
                a, [0.0, 10.0, 40.0, 100.0], [0.0, 0.5, 0.9, 1.0], 64
            ).toPandas()
        )
        src = stitched(fixtures.tile_layer_table("mod-10000"))
        assert out.min() >= 0.0 and out.max() <= 100.0
        # monotone: order of source values is preserved
        s, o = src.ravel(), out.ravel()
        idx = np.argsort(s, kind="stable")
        assert (np.diff(o[idx]) >= -1e-9).all()
        # ~50% of pixels should land below 10 (target cdf(10) = 0.5)
        frac = (out <= 10.0).mean()
        assert 0.4 < frac < 0.6

    def test_sigmoidal_contrast_endpoints_and_monotone(self, spark):
        from tilegrid.operators import reshape as RS2

        a = layer_df(spark, "mod-10000")
        out = stitched(RS2.sigmoidal_contrast(a, 0.5, 6.0).toPandas())
        src = stitched(fixtures.tile_layer_table("mod-10000"))
        lo, hi = src.min(), src.max()
        np.testing.assert_allclose(out[src == lo], lo, atol=1e-9)
        np.testing.assert_allclose(out[src == hi], hi, atol=1e-9)
        s, o = src.ravel(), out.ravel()
        idx = np.argsort(s, kind="stable")
        assert (np.diff(o[idx]) >= -1e-9).all()
        # contrast: mid-range slope is steeper than the identity
        mid = (s > lo + 0.4 * (hi - lo)) & (s < lo + 0.6 * (hi - lo))
        span_out = o[mid].max() - o[mid].min()
        span_in = s[mid].max() - s[mid].min()
        assert span_out > 1.5 * span_in

    def test_histogram_equalization_monotone(self, spark):
        a = layer_df(spark, "mod-10000")
        out = stitched(RS.histogram_equalization(a, 64).toPandas())
        src = stitched(fixtures.tile_layer_table("mod-10000"))
        # equalized values preserve order of source values
        s = src.ravel()
        o = out.ravel()
        idx = np.argsort(s)
        assert (np.diff(o[idx]) >= -1e-9).all()

    def test_transfer_stats_fused_single_action_and_identical(self, spark):
        """Discrete imagery takes the fused ONE-stat-action path (the
        reference's RDDHistogramEqualization two-action shape) and its
        output is bit-identical to the legacy min/max + bucket-count
        path (forced via a cardinality cap of 0)."""
        from tilegrid.operators import reshape as RS2

        a = layer_df(spark, "mod-10000")
        fast = stitched(RS2.histogram_equalization(a, 64).toPandas())
        assert RS2.LAST_STAT_ACTIONS[0] == 1
        old_cap = RS2._VALUE_FAST_CAP
        RS2._VALUE_FAST_CAP = 0
        try:
            legacy = stitched(RS2.histogram_equalization(a, 64).toPandas())
            assert RS2.LAST_STAT_ACTIONS[0] == 2
        finally:
            RS2._VALUE_FAST_CAP = old_cap
        np.testing.assert_array_equal(fast, legacy)
        # matching too
        args = ([0.0, 10.0, 40.0, 100.0], [0.0, 0.5, 0.9, 1.0], 64)
        fast_m = stitched(RS2.histogram_matching(a, *args).toPandas())
        assert RS2.LAST_STAT_ACTIONS[0] == 1
        RS2._VALUE_FAST_CAP = 0
        try:
            legacy_m = stitched(RS2.histogram_matching(a, *args).toPandas())
        finally:
            RS2._VALUE_FAST_CAP = old_cap
        np.testing.assert_array_equal(fast_m, legacy_m)


class TestRender:
    def test_render_and_slippy(self, spark, tmp_path):
        a = layer_df(spark, "zones")
        png_layer = RD.render_png(a, RD.ColorMap.ramp(0, 15, 16))
        n = RD.write_slippy(png_layer, str(tmp_path / "tiles"))
        assert n == 42
        p = tmp_path / "tiles" / "8" / "1" / "1.png"
        assert p.exists()
        img = codec.png_decode(p.read_bytes())
        assert img.shape == (16, 16, 4)

    def test_color_ramp_presets(self):
        # ColorRamps.scala presets: endpoints map to the ramp's first/last
        # colors, NoData is transparent, every preset loads
        for name, rgba in RD.COLOR_RAMPS.items():
            cm = RD.ColorMap.preset(name, 0.0, 1.0)
            out = cm.apply(np.array([[0.0, 1.0, np.nan]]))
            first = ((rgba[0] >> 24) & 255, (rgba[0] >> 16) & 255, (rgba[0] >> 8) & 255)
            last = ((rgba[-1] >> 24) & 255, (rgba[-1] >> 16) & 255, (rgba[-1] >> 8) & 255)
            assert tuple(out[0, 0, :3]) == first, name
            assert tuple(out[0, 1, :3]) == last, name
            assert out[0, 2, 3] == 0, name


class TestLayerUpdate:
    def _tile_df(self, spark, keyvals, fill):
        from tilegrid.cell import z2_encode
        rows = []
        for col, row in keyvals:
            arr = np.full((16, 16), float(fill))
            rows.append({
                "zoom": np.int32(8), "col": np.int32(col), "row": np.int32(row),
                "cell": np.int64(z2_encode(col, row)),
                "tile": codec.raw_encode(arr),
                "h": np.int32(16), "w": np.int32(16), "fmt": "raw",
            })
        return spark.createDataFrame(pd.DataFrame(rows))

    def test_replace_mode(self, spark, tmp_path):
        root = str(tmp_path / "layers")
        IO.write_layer(layer_df(spark, "all-ones"), root, "l", 8, meta=make_meta())
        n0 = IO.read_layer(spark, root, "l", 8).count()
        upd = self._tile_df(spark, [(1, 1), (7, 7)], 9.0)  # (1,1) exists
        IO.update_layer(spark, upd, root, "l", 8)
        got = IO.read_layer(spark, root, "l", 8).toPandas()
        assert len(got) == n0 + 1  # one new key appended
        r = got[(got.col == 1) & (got.row == 1)].iloc[0]
        assert (codec.decode_tile(bytes(r["tile"]), r["fmt"]) == 9.0).all()
        assert IO.verify_manifest(spark, root, "l", 8)  # manifest refreshed
        meta = AttributeStore(root).read_meta("l", 8)
        assert meta.bounds.col_max == 7 and meta.bounds.row_max == 7

    def test_merge_mode_fills_nodata(self, spark, tmp_path):
        root = str(tmp_path / "layers")
        base = self._tile_df(spark, [(2, 2)], 1.0)
        IO.write_layer(base, root, "m", 8, meta=make_meta())
        # incoming tile: NaN except one pixel
        from tilegrid.cell import z2_encode
        arr = np.full((16, 16), np.nan)
        arr[3, 4] = 42.0
        upd = spark.createDataFrame(pd.DataFrame([{
            "zoom": np.int32(8), "col": np.int32(2), "row": np.int32(2),
            "cell": np.int64(z2_encode(2, 2)),
            "tile": codec.raw_encode(arr), "h": np.int32(16),
            "w": np.int32(16), "fmt": "raw",
        }]))
        IO.update_layer(spark, upd, root, "m", 8, mode="merge")
        got = IO.read_layer(spark, root, "m", 8).toPandas()
        t = codec.decode_tile(bytes(got.iloc[0]["tile"]), got.iloc[0]["fmt"])
        assert t[3, 4] == 42.0          # incoming wins where it has data
        assert t[0, 0] == 1.0           # stored fills incoming NoData
        assert not np.isnan(t).any()

    def test_empty_update_raises(self, spark, tmp_path):
        root = str(tmp_path / "layers")
        IO.write_layer(layer_df(spark, "all-ones"), root, "e", 8, meta=make_meta())
        empty = spark.createDataFrame(
            [], "zoom int, col int, row int, cell long, tile binary,"
            " h int, w int, fmt string")
        with pytest.raises(ValueError):
            IO.update_layer(spark, empty, root, "e", 8)


class TestLayerManagerRegressions:
    def test_value_reader_follows_reindex(self, spark, tmp_path):
        """value_reader must consult the stored key_index — after a hilbert
        reindex the z2 cell id would never match."""
        root = str(tmp_path / "layers")
        IO.write_layer(layer_df(spark, "increasing"), root, "src", 8, meta=make_meta())
        IO.reindex_layer(spark, root, "src", 8, index="hilbert")
        row = IO.value_reader(spark, root, "src", 8)(2, 3)
        assert row is not None and row["col"] == 2 and row["row"] == 3
        want = fixtures.layer_tile("increasing", 2, 3, 16)
        np.testing.assert_allclose(codec.decode_tile(bytes(row["tile"]), "raw"), want)

    def test_delete_missing_zoom_raises(self, spark, tmp_path):
        root = str(tmp_path / "layers")
        IO.write_layer(layer_df(spark, "all-ones"), root, "ones", 8, meta=make_meta())
        with pytest.raises(ValueError, match="not found"):
            IO.delete_layer(root, "ones", 7)
        with pytest.raises(ValueError, match="not found"):
            IO.delete_layer(root, "nope", 8)


class TestRasterizeLine:
    """Supercover polyline rasterization (Rasterizer.foreachCellByLineString)."""

    def test_axis_aligned_and_diagonal(self):
        ext = Extent(0, 0, 10, 10)
        mh = R.rasterize_line(np.array([[0.2, 5.5], [9.8, 5.5]]), ext, 10, 10)
        assert mh.sum() == 10 and mh[4].all()
        mv = R.rasterize_line(np.array([[3.5, 0.2], [3.5, 9.8]]), ext, 10, 10)
        assert mv.sum() == 10 and mv[:, 3].all()
        md = R.rasterize_line(np.array([[0.5, 0.5], [9.5, 9.5]]), ext, 10, 10)
        assert md.sum() == 10  # perfect diagonal through cell centers

    def test_supercover_is_exactly_the_touched_cells(self):
        """Dense parametric sampling finds the same cell set the traversal
        marks — no misses (holes) and no extras (overshoot)."""
        rng = np.random.default_rng(11)
        ext = Extent(0, 0, 16, 16)
        for _ in range(20):
            p = rng.random((2, 2)) * 15.0 + 0.5
            m = R.rasterize_line(p, ext, 16, 16)
            t = np.linspace(0.0, 1.0, 20001)[:, None]
            pts = p[0] * (1 - t) + p[1] * t
            cx = np.floor(pts[:, 0]).astype(int)
            cy = np.floor(16.0 - pts[:, 1]).astype(int)
            sampled = set(zip(cy.tolist(), cx.tolist()))
            marked = set(zip(*(a.tolist() for a in np.nonzero(m))))
            assert sampled == marked

    def test_polyline_and_degenerate(self):
        ext = Extent(0, 0, 10, 10)
        mp = R.rasterize_line(
            np.array([[0.5, 0.5], [5.5, 0.5], [5.5, 8.5]]), ext, 10, 10
        )
        assert mp.sum() == 14  # 6 along the bottom + 8 more up the column
        # zero-length segment burns its own cell
        m0 = R.rasterize_line(np.array([[2.5, 2.5], [2.5, 2.5]]), ext, 10, 10)
        assert m0.sum() == 1 and m0[7, 2]
        # fully outside the extent burns nothing
        mo = R.rasterize_line(np.array([[-5.0, -5.0], [-1.0, -1.0]]), ext, 10, 10)
        assert mo.sum() == 0


class TestPixelIsArea:
    """PixelIsArea (includePartial) rasterization == the exact
    rectangle-polygon intersection test per pixel (independent oracle:
    geometry.polygon_intersects_extents)."""

    def _oracle(self, rings, ext, cols, rows):
        cw, ch = ext.width / cols, ext.height / rows
        jj, ii = np.mgrid[0:rows, 0:cols]
        xmin = ext.xmin + ii * cw
        xmax = xmin + cw
        ymax = ext.ymax - jj * ch
        ymin = ymax - ch
        from tilegrid.geometry import polygon_intersects_extents

        return polygon_intersects_extents(
            rings, xmin.ravel(), ymin.ravel(), xmax.ravel(), ymax.ravel()
        ).reshape(rows, cols)

    def test_matches_rect_intersection_oracle(self):
        rng = np.random.RandomState(9)
        ext = Extent(0.0, 0.0, 16.0, 16.0)
        for k in range(25):
            n = rng.randint(3, 9)
            cx, cy = rng.uniform(2, 14, 2)
            rad = rng.uniform(0.7, 5.0)
            ring = regular_ngon(cx, cy, rad, n)
            got = R.scanline_rasterize([ring], ext, 16, 16, pixel_is_area=True)
            want = self._oracle([ring], ext, 16, 16)
            np.testing.assert_array_equal(got, want)

    def test_superset_of_center_mask_and_holes(self):
        ext = Extent(0.0, 0.0, 16.0, 16.0)
        outer = regular_ngon(8.0, 8.0, 6.5, 8)
        hole = regular_ngon(8.0, 8.0, 3.1, 8)
        rings = [outer, hole[::-1]]
        area = R.scanline_rasterize(rings, ext, 16, 16, pixel_is_area=True)
        point = R.scanline_rasterize(rings, ext, 16, 16)
        assert (area | point == area).all() and area.sum() > point.sum()
        # the pixel at dead center sits wholly inside the hole -> excluded
        assert not area[8, 8] and not area[7, 7]
        np.testing.assert_array_equal(area, self._oracle(rings, ext, 16, 16))

    def test_sliver_smaller_than_pixel(self):
        # a sliver that covers no pixel center still burns the pixels it
        # touches under PixelIsArea
        ext = Extent(0.0, 0.0, 8.0, 8.0)
        sliver = np.array([[1.2, 1.2], [6.8, 1.45], [6.8, 1.2]])
        point = R.scanline_rasterize([sliver], ext, 8, 8)
        area = R.scanline_rasterize([sliver], ext, 8, 8, pixel_is_area=True)
        assert point.sum() == 0 and area.sum() >= 6
        np.testing.assert_array_equal(area, self._oracle([sliver], ext, 8, 8))

    def test_rasterize_to_layer_include_partial(self, spark):
        from tilegrid.geometry import wkb_encode_polygon
        from tilegrid.cell import z2_decode

        # a sliver polygon thinner than one pixel: zero burned pixels
        # under PixelIsPoint, nonzero under includePartial
        # pixel = 1 map unit here; centers sit at k+0.5 — this sliver lives
        # entirely between the 10.5 and 11.5 center rows
        sliver = np.array([[10.2, 10.6], [100.9, 10.9], [100.9, 10.6]])
        polys = pd.DataFrame(
            [{"polygon_id": 1, "zone": 7.0,
              "wkb": wkb_encode_polygon([sliver])}])
        point_layer = R.rasterize_to_layer(polys, LAYOUT, 8, spark).toPandas()
        area_layer = R.rasterize_to_layer(
            polys, LAYOUT, 8, spark, pixel_is_area=True).toPandas()

        def burned(pdf):
            n = 0
            for t in pdf.itertuples(index=False):
                n += int((~np.isnan(
                    codec.decode_tile(bytes(t.tile), t.fmt))).sum())
            return n

        assert burned(point_layer) == 0
        assert burned(area_layer) > 0
        # area mask per tile == direct scanline with the flag
        mt = LAYOUT.map_transform
        tc = LAYOUT.tile_layout.tile_cols
        tr = LAYOUT.tile_layout.tile_rows
        for t in area_layer.itertuples(index=False):
            ext = mt.extent_for_key(int(t.col), int(t.row))
            want = R.scanline_rasterize([sliver], ext, tc, tr,
                                        pixel_is_area=True)
            got = ~np.isnan(codec.decode_tile(bytes(t.tile), t.fmt))
            np.testing.assert_array_equal(got, want)
