"""Ben-Haim / Tom-Tov streaming histogram — the reference's primary
histogram sketch (raster/src/main/scala/geotrellis/raster/histogram/
StreamingHistogram.scala:33-629), rebuilt from scratch.

Semantics matched to the reference:
  * bounded bucket list; inserting past `size` merges the two
    closest-together buckets (min gap, ties by smaller left label —
    DeltaCompare :48-57) into their count-weighted mean (compose :118-129)
  * duplicate labels accumulate counts without triggering a merge
    (countItem :197-201 returns early)
  * percentile machinery ports cdfIntervals / percentileBreaks
    (:505-583) including the prepended minimum, the first-bin special
    case, and the q == 0 / q == 1 min/max clamps
  * merge folds one histogram's buckets into the other (:merge :567-573)

Divergence (documented): batch insertion (`extend` / `from_array`)
pre-aggregates equal values with np.unique and inserts in ascending label
order, where the reference's fromTile inserts pixels row-major. Both are
valid B-H/T-T insertion orders; ours is deterministic for a given value
multiset, which the distributed two-level reduce relies on.

At scale the sketch is the map-side state of a two-level reduce: one
sketch per Arrow batch (thousands of pixels folded into <= size buckets),
then a deterministic driver fold over the tiny per-batch sketches —
the same shape as the reference's RDD `.reduce(_ merge _)` but with a
fixed merge order.
"""

from __future__ import annotations

import bisect
import math

import numpy as np

DEFAULT_NUM_BUCKETS = 80  # StreamingHistogram.scala:59


class StreamingHistogram:
    def __init__(self, size: int = DEFAULT_NUM_BUCKETS):
        if size < 2:
            raise ValueError("size must be >= 2")
        self.size = size
        self._labels: list[float] = []   # sorted
        self._counts: list[int] = []     # parallel to _labels
        self._min = math.inf
        self._max = -math.inf

    # ------------------------------------------------------------ insert

    def count_item(self, label: float, count: int = 1) -> None:
        """countItem (:188-236): insert a (label, count) bucket; merge the
        closest pair when the bucket list overflows."""
        label = float(label)
        if count != 0:
            if label < self._min:
                self._min = label
            if label > self._max:
                self._max = label
        i = bisect.bisect_left(self._labels, label)
        if i < len(self._labels) and self._labels[i] == label:
            # duplicate entry: accumulate, no overflow check (:197-201)
            self._counts[i] += count
            return
        self._labels.insert(i, label)
        self._counts.insert(i, int(count))
        if len(self._labels) > self.size:
            self._combine()

    def _combine(self) -> None:
        """combine (:143-181): merge the adjacent pair with the smallest
        gap (ties: smaller left label) into its count-weighted mean."""
        labels, counts = self._labels, self._counts
        best = 0
        best_gap = labels[1] - labels[0]
        for i in range(1, len(labels) - 1):
            gap = labels[i + 1] - labels[i]
            if gap < best_gap:  # strict < keeps the smaller left label on ties
                best_gap = gap
                best = i
        l1, c1 = labels[best], counts[best]
        l2, c2 = labels[best + 1], counts[best + 1]
        # compose (:118-129)
        if c1 + c2 != 0:
            mid, mc = (l1 * c1 + l2 * c2) / (c1 + c2), c1 + c2
        elif c1 == 0:
            mid, mc = l1, c1
        elif c2 == 0:
            mid, mc = l2, c2
        else:
            mid, mc = 0.0, 0
        del labels[best : best + 2]
        del counts[best : best + 2]
        self.count_item(mid, mc)

    def extend(self, values: np.ndarray) -> None:
        """Batch insert: NaNs dropped, equal values pre-aggregated, inserted
        in ascending label order (see module docstring divergence note)."""
        v = np.asarray(values, np.float64).ravel()
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        uniq, cnt = np.unique(v, return_counts=True)
        for label, c in zip(uniq, cnt):
            self.count_item(float(label), int(c))

    @classmethod
    def from_array(
        cls, values: np.ndarray, size: int = DEFAULT_NUM_BUCKETS
    ) -> "StreamingHistogram":
        h = cls(size)
        h.extend(values)
        return h

    def merge(self, other: "StreamingHistogram") -> "StreamingHistogram":
        """In-place update with the other's buckets (update/merge
        :556-573); min/max union. Returns self for fold chaining."""
        if other._min < self._min:
            self._min = other._min
        if other._max > self._max:
            self._max = other._max
        for label, count in zip(list(other._labels), list(other._counts)):
            self.count_item(label, count)
        return self

    # ------------------------------------------------------------- stats

    def buckets(self) -> list[tuple[float, int]]:
        return list(zip(self._labels, self._counts))

    def bucket_count(self) -> int:
        return len(self._labels)

    def total_count(self) -> int:
        return sum(self._counts)

    def min_value(self) -> float | None:
        return None if self._min == math.inf else self._min

    def max_value(self) -> float | None:
        return None if self._max == -math.inf else self._max

    def mean(self) -> float | None:
        n = self.total_count()
        if n <= 0:
            return None
        return sum(l * c for l, c in zip(self._labels, self._counts)) / n

    def mode(self) -> float | None:
        """Label of the most populous bucket; first on ties (:422-427
        keeps the left operand on equal counts)."""
        if self.total_count() <= 0:
            return None
        best = 0
        for i in range(1, len(self._counts)):
            if self._counts[i] > self._counts[best]:
                best = i
        return self._labels[best]

    def median(self) -> float | None:
        if self.total_count() <= 0:
            return None
        return self.percentile(0.5)

    def area_under_curve(self) -> float:
        """Trapezoid area between adjacent buckets (:454-463)."""
        total = 0.0
        for i in range(len(self._labels) - 1):
            c1, c2 = self._counts[i], self._counts[i + 1]
            if c1 >= 0 and c2 >= 0:
                small, big = min(c1, c2), max(c1, c2)
            else:
                small, big = max(c1, c2), min(c1, c2)
            width = abs(self._labels[i + 1] - self._labels[i])
            total += width * small + 0.5 * width * (big - small)
        return total

    def cdf(self) -> list[tuple[float, float]]:
        n = self.total_count()
        out, acc = [], 0.0
        for label, count in zip(self._labels, self._counts):
            acc += count / n
            out.append((label, acc))
        return out

    def _cdf_intervals(self):
        """cdfIntervals (:505-521): ((d1, pct1), (d2, pct2)) pairs with the
        seen-minimum prepended at percentile 0."""
        if len(self._labels) < 2:
            return
        n = self.total_count()
        ds = [self.min_value()] + self._labels
        cdf = [0.0]
        acc = 0.0
        for c in self._counts:
            acc += c / n
            cdf.append(acc)
        for i in range(len(ds) - 1):
            yield (ds[i], cdf[i]), (ds[i + 1], cdf[i + 1])

    def percentile_breaks(self, qs: list[float]) -> list[float]:
        """percentileBreaks (:538-583), ported verbatim."""
        if len(self._labels) == 1:
            return [self._labels[0] for _ in qs]
        data = self._cdf_intervals()
        try:
            curr = next(data)
        except StopIteration:
            return []
        result: list[float] = []

        def get_value(q: float) -> float:
            (d1, pct1), (d2, pct2) = curr
            x = (q - pct1) / (pct2 - pct1)
            return (1 - x) * d1 + x * d2

        if qs and qs[0] < curr[1][1]:
            # first bin IS (or is very close to) the minimum value
            result.append(curr[0][0])
            if curr[0][0] == curr[1][0]:
                curr = (curr[0], next(data)[1])
            else:
                curr = ((curr[0][0], 0.0), curr[1])
            to_check = qs[1:]
        else:
            to_check = qs
        for q in to_check:
            if q == 0.0:
                result.append(self.min_value() if self._min != math.inf
                              else -math.inf)
            elif q == 1.0:
                result.append(self.max_value() if self._max != -math.inf
                              else math.inf)
            else:
                if q < curr[1][1]:
                    result.append(get_value(q))
                else:
                    while curr[1][1] <= q:
                        try:
                            curr = next(data)
                        except StopIteration:
                            break
                    result.append(get_value(q))
        return result

    def percentile(self, q: float) -> float:
        return self.percentile_breaks([q])[0]

    def quantile_breaks(self, num: int) -> list[float]:
        """quantileBreaks (:624-625): num breaks at i/num percentiles."""
        return self.percentile_breaks([i / num for i in range(1, num + 1)])

    # ------------------------------------------------------ serialization

    def to_arrays(self) -> tuple[np.ndarray, np.ndarray, float, float]:
        return (
            np.asarray(self._labels, np.float64),
            np.asarray(self._counts, np.int64),
            self._min,
            self._max,
        )

    @classmethod
    def from_arrays(
        cls, labels, counts, vmin: float, vmax: float, size: int = DEFAULT_NUM_BUCKETS
    ) -> "StreamingHistogram":
        h = cls(size)
        for label, c in zip(labels, counts):
            h.count_item(float(label), int(c))
        h._min = min(h._min, float(vmin))
        h._max = max(h._max, float(vmax))
        return h
