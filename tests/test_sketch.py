"""Ben-Haim/Tom-Tov streaming histogram (tilegrid/sketch.py) vs exact
references: exact below the bucket bound, reference-faithful closest-pair
merging above it, quantile accuracy on large samples, and the distributed
two-level reduce (operators.summary.streaming_histogram)."""

import numpy as np
import pandas as pd
import pytest

from tilegrid.sketch import StreamingHistogram


class TestSketchCore:
    def test_exact_below_bound(self):
        h = StreamingHistogram(10)
        vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
        for v in vals:
            h.count_item(v)
        assert h.buckets() == [(1.0, 2), (2.0, 1), (3.0, 1), (4.0, 1),
                               (5.0, 1), (6.0, 1), (9.0, 1)]
        assert h.total_count() == 8
        assert h.min_value() == 1.0 and h.max_value() == 9.0

    def test_closest_pair_merge(self):
        # size 3: inserting 0, 10, 12, 100 merges (10, 12) -> (11, 2)
        h = StreamingHistogram(3)
        for v in (0.0, 10.0, 12.0, 100.0):
            h.count_item(v)
        assert h.buckets() == [(0.0, 1), (11.0, 2), (100.0, 1)]

    def test_merge_tie_prefers_smaller_left_label(self):
        # gaps (1-0)=1 and (5-4)=1 tie -> DeltaCompare picks left label 0
        h = StreamingHistogram(3)
        for v in (0.0, 1.0, 4.0, 5.0):
            h.count_item(v)
        assert h.buckets() == [(0.5, 2), (4.0, 1), (5.0, 1)]

    def test_duplicate_label_accumulates_without_merge(self):
        h = StreamingHistogram(3)
        for v in (0.0, 5.0, 9.0):
            h.count_item(v)
        h.count_item(5.0, 10)  # duplicate: no overflow, no merge
        assert h.buckets() == [(0.0, 1), (5.0, 11), (9.0, 1)]

    def test_bucket_bound_and_count_preservation(self):
        rng = np.random.RandomState(0)
        vals = rng.normal(50.0, 10.0, 5000)
        h = StreamingHistogram.from_array(vals)
        assert h.bucket_count() <= 80
        assert h.total_count() == 5000
        assert h.min_value() == vals.min() and h.max_value() == vals.max()

    def test_weighted_mean_preserved_exactly_by_compose(self):
        rng = np.random.RandomState(1)
        vals = rng.uniform(0, 1000, 3000)
        h = StreamingHistogram.from_array(vals, 40)
        # compose preserves sum(label*count), so the sketch mean tracks the
        # true mean to FP accumulation error
        assert abs(h.mean() - vals.mean()) < 1e-6 * 1000

    def test_quantile_accuracy_normal(self):
        rng = np.random.RandomState(2)
        vals = rng.normal(0.0, 1.0, 50000)
        h = StreamingHistogram.from_array(vals)
        for q in (0.1, 0.25, 0.5, 0.75, 0.9):
            want = np.quantile(vals, q)
            got = h.percentile(q)
            assert abs(got - want) < 0.08, f"q={q}: {got} vs {want}"

    def test_median_mode_bounds(self):
        rng = np.random.RandomState(3)
        vals = np.concatenate([rng.uniform(0, 1, 1000),
                               np.full(500, 0.5)])
        h = StreamingHistogram.from_array(vals)
        assert 0.3 < h.median() < 0.7
        assert 0.4 < h.mode() < 0.6  # the spike dominates some bucket
        assert h.min_value() <= h.percentile(0.01)
        assert h.percentile(0.99) <= h.max_value()

    def test_cdf_monotone(self):
        rng = np.random.RandomState(4)
        h = StreamingHistogram.from_array(rng.exponential(2.0, 2000))
        cdf = h.cdf()
        ps = [p for _, p in cdf]
        assert all(a <= b for a, b in zip(ps, ps[1:]))
        assert abs(ps[-1] - 1.0) < 1e-9

    def test_merge_equals_combined_insert_order(self):
        rng = np.random.RandomState(5)
        a, b = rng.uniform(0, 10, 800), rng.uniform(5, 15, 800)
        h1 = StreamingHistogram.from_array(a)
        h2 = StreamingHistogram.from_array(b)
        h1.merge(h2)
        assert h1.total_count() == 1600
        assert h1.min_value() == min(a.min(), b.min())
        assert h1.max_value() == max(a.max(), b.max())
        both = np.concatenate([a, b])
        assert abs(h1.percentile(0.5) - np.median(both)) < 0.5

    def test_quantile_breaks_shape(self):
        h = StreamingHistogram.from_array(np.arange(1000, dtype=np.float64))
        br = h.quantile_breaks(5)
        assert len(br) == 5
        assert all(x <= y for x, y in zip(br, br[1:]))
        assert br[-1] == 999.0  # q=1.0 clamps to max

    def test_serialization_round_trip(self):
        rng = np.random.RandomState(6)
        h = StreamingHistogram.from_array(rng.uniform(0, 100, 500), 20)
        labels, counts, vmin, vmax = h.to_arrays()
        h2 = StreamingHistogram.from_arrays(labels, counts, vmin, vmax, 20)
        assert h2.buckets() == h.buckets()
        assert h2.min_value() == h.min_value()


class TestDistributedSketch:
    def test_two_level_reduce_deterministic_and_accurate(self, spark):
        from tilegrid import codec
        from tilegrid.cell import z2_encode
        from tilegrid.operators.summary import streaming_histogram

        rng = np.random.RandomState(9)
        full = rng.normal(100.0, 25.0, (128, 128))
        rows = []
        for r in range(4):
            for c in range(4):
                t = full[r * 32:(r + 1) * 32, c * 32:(c + 1) * 32]
                rows.append({
                    "zoom": np.int32(3), "col": np.int32(c), "row": np.int32(r),
                    "cell": np.int64(z2_encode(c, r)),
                    "tile": codec.raw_encode(np.ascontiguousarray(t)),
                    "h": np.int32(32), "w": np.int32(32), "fmt": "raw",
                })
        layer = spark.createDataFrame(pd.DataFrame(rows)).repartition(4, "cell")
        h1 = streaming_histogram(layer, 60)
        h2 = streaming_histogram(layer, 60)
        assert h1.buckets() == h2.buckets()  # deterministic fold order
        assert h1.total_count() == 128 * 128
        assert h1.min_value() == full.min() and h1.max_value() == full.max()
        for q in (0.25, 0.5, 0.75):
            assert abs(h1.percentile(q) - np.quantile(full, q)) < 3.0
