"""Tiling grid math: Extent, TileLayout, LayoutDefinition, MapKeyTransform,
ZoomedLayoutScheme, and WebMercator<->LatLng closed-form reprojection.

Semantics follow the reference engine exactly (parity hotspots):
  - point->key truncation and extent->GridBounds inclusive-N/W / exclusive-S/E
    with the `d == floor(d)` backoff
    (reference: spark/.../tiling/MapKeyTransform.scala:48-112)
  - power-of-2 ZXY pyramid over the CRS world extent, 256px tiles
    (reference: spark/.../tiling/ZoomedLayoutScheme.scala:25-148)

All hot-path functions are NumPy-vectorized so they can run inside Arrow
batches; scalar convenience wrappers delegate to the vector forms.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

EARTH_RADIUS = 6378137.0  # the gdal2tiles value, per the reference
EARTH_CIRCUMFERENCE = 2.0 * math.pi * EARTH_RADIUS
WEBMERCATOR_HALF = math.pi * EARTH_RADIUS  # 20037508.342789244


@dataclass(frozen=True)
class Extent:
    xmin: float
    ymin: float
    xmax: float
    ymax: float

    @property
    def width(self) -> float:
        return self.xmax - self.xmin

    @property
    def height(self) -> float:
        return self.ymax - self.ymin

    @property
    def center(self) -> tuple[float, float]:
        return ((self.xmin + self.xmax) / 2.0, (self.ymin + self.ymax) / 2.0)

    @property
    def area(self) -> float:
        return self.width * self.height

    def intersects(self, other: "Extent") -> bool:
        return (
            self.xmin <= other.xmax
            and self.xmax >= other.xmin
            and self.ymin <= other.ymax
            and self.ymax >= other.ymin
        )

    def contains_point(self, x: float, y: float) -> bool:
        return self.xmin <= x <= self.xmax and self.ymin <= y <= self.ymax

    def contains(self, other: "Extent") -> bool:
        return (
            self.xmin <= other.xmin
            and self.xmax >= other.xmax
            and self.ymin <= other.ymin
            and self.ymax >= other.ymax
        )

    def intersection(self, other: "Extent") -> "Extent | None":
        xmin = max(self.xmin, other.xmin)
        ymin = max(self.ymin, other.ymin)
        xmax = min(self.xmax, other.xmax)
        ymax = min(self.ymax, other.ymax)
        if xmin > xmax or ymin > ymax:
            return None
        return Extent(xmin, ymin, xmax, ymax)

    def expand_to_include(self, other: "Extent") -> "Extent":
        return Extent(
            min(self.xmin, other.xmin),
            min(self.ymin, other.ymin),
            max(self.xmax, other.xmax),
            max(self.ymax, other.ymax),
        )

    def buffer(self, d: float) -> "Extent":
        return Extent(self.xmin - d, self.ymin - d, self.xmax + d, self.ymax + d)

    def to_tuple(self) -> tuple[float, float, float, float]:
        return (self.xmin, self.ymin, self.xmax, self.ymax)


# world extents per CRS
WEBMERCATOR_WORLD = Extent(
    -WEBMERCATOR_HALF, -WEBMERCATOR_HALF, WEBMERCATOR_HALF, WEBMERCATOR_HALF
)
LATLNG_WORLD = Extent(-180.0, -90.0, 180.0, 90.0)


@dataclass(frozen=True)
class GridBounds:
    col_min: int
    row_min: int
    col_max: int
    row_max: int

    @property
    def width(self) -> int:
        return self.col_max - self.col_min + 1

    @property
    def height(self) -> int:
        return self.row_max - self.row_min + 1

    @property
    def size(self) -> int:
        return self.width * self.height

    def coords(self):
        for r in range(self.row_min, self.row_max + 1):
            for c in range(self.col_min, self.col_max + 1):
                yield (c, r)

    def contains(self, col: int, row: int) -> bool:
        return self.col_min <= col <= self.col_max and self.row_min <= row <= self.row_max

    def intersection(self, other: "GridBounds") -> "GridBounds | None":
        cmin, rmin = max(self.col_min, other.col_min), max(self.row_min, other.row_min)
        cmax, rmax = min(self.col_max, other.col_max), min(self.row_max, other.row_max)
        if cmin > cmax or rmin > rmax:
            return None
        return GridBounds(cmin, rmin, cmax, rmax)

    def combine(self, other: "GridBounds") -> "GridBounds":
        return GridBounds(
            min(self.col_min, other.col_min),
            min(self.row_min, other.row_min),
            max(self.col_max, other.col_max),
            max(self.row_max, other.row_max),
        )


@dataclass(frozen=True)
class TileLayout:
    layout_cols: int
    layout_rows: int
    tile_cols: int
    tile_rows: int

    @property
    def total_cols(self) -> int:
        return self.layout_cols * self.tile_cols

    @property
    def total_rows(self) -> int:
        return self.layout_rows * self.tile_rows


@dataclass(frozen=True)
class LayoutDefinition:
    extent: Extent
    tile_layout: TileLayout

    @property
    def tile_width(self) -> float:  # map units per tile
        return self.extent.width / self.tile_layout.layout_cols

    @property
    def tile_height(self) -> float:
        return self.extent.height / self.tile_layout.layout_rows

    @property
    def cell_width(self) -> float:  # map units per pixel
        return self.tile_width / self.tile_layout.tile_cols

    @property
    def cell_height(self) -> float:
        return self.tile_height / self.tile_layout.tile_rows

    @property
    def map_transform(self) -> "MapKeyTransform":
        return MapKeyTransform(
            self.extent, self.tile_layout.layout_cols, self.tile_layout.layout_rows
        )


class MapKeyTransform:
    """(x, y) <-> (col, row) and Extent <-> GridBounds.

    Exact reference semantics (MapKeyTransform.scala:48-112):
      * point->key: floor(((x - xmin) / width) * layoutCols). For points
        inside the layout this equals the reference's Scala `.toInt`; we use
        floor (not trunc) everywhere so the NumPy path and the SQL census
        path (tiler.key_exprs / gridbounds_exprs, which use SQL `floor`)
        agree bit-for-bit even for out-of-layout extents, where trunc(-0.5)=0
        but floor(-0.5)=-1 would otherwise enumerate different covering keys.
      * extent->GridBounds: N/W edges inclusive, S/E edges exclusive, with the
        `d == floor(d) && d != min` backoff so an extent whose max edge lands
        exactly on a tile boundary does not claim the next tile.
    """

    def __init__(self, extent: Extent, layout_cols: int, layout_rows: int):
        self.extent = extent
        self.layout_cols = layout_cols
        self.layout_rows = layout_rows
        self.tile_width = extent.width / layout_cols
        self.tile_height = extent.height / layout_rows

    # ---- point -> key (vectorized) ----
    def keys_for_points(self, x, y) -> tuple[np.ndarray, np.ndarray]:
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        tcol = ((x - self.extent.xmin) / self.extent.width) * self.layout_cols
        trow = ((self.extent.ymax - y) / self.extent.height) * self.layout_rows
        return np.floor(tcol).astype(np.int64), np.floor(trow).astype(np.int64)

    def key_for_point(self, x: float, y: float) -> tuple[int, int]:
        c, r = self.keys_for_points(np.array([x]), np.array([y]))
        return int(c[0]), int(r[0])

    # ---- key -> extent ----
    def extent_for_key(self, col: int, row: int) -> Extent:
        e = self.extent
        return Extent(
            e.xmin + col * self.tile_width,
            e.ymax - (row + 1) * self.tile_height,
            e.xmin + (col + 1) * self.tile_width,
            e.ymax - row * self.tile_height,
        )

    def extents_for_keys(self, col, row):
        """Vectorized: returns (xmin, ymin, xmax, ymax) arrays."""
        col = np.asarray(col, dtype=np.float64)
        row = np.asarray(row, dtype=np.float64)
        e = self.extent
        return (
            e.xmin + col * self.tile_width,
            e.ymax - (row + 1.0) * self.tile_height,
            e.xmin + (col + 1.0) * self.tile_width,
            e.ymax - row * self.tile_height,
        )

    # ---- extent -> GridBounds (reference backoff rules) ----
    def gridbounds_for_extent(self, other: Extent) -> GridBounds:
        col_min, row_min = self.key_for_point(other.xmin, other.ymax)

        d = (other.xmax - self.extent.xmin) / (self.extent.width / self.layout_cols)
        if d == math.floor(d) and d != col_min:
            col_max = int(math.floor(d)) - 1
        else:
            col_max = int(math.floor(d))

        d = (self.extent.ymax - other.ymin) / (self.extent.height / self.layout_rows)
        if d == math.floor(d) and d != row_min:
            row_max = int(math.floor(d)) - 1
        else:
            row_max = int(math.floor(d))

        return GridBounds(col_min, row_min, col_max, row_max)

    def gridbounds_for_extents(self, xmin, ymin, xmax, ymax):
        """Vectorized gridbounds_for_extent over arrays of extents.

        Returns (col_min, row_min, col_max, row_max) int64 arrays with the
        same inclusive/exclusive + floor-backoff rules as the scalar form.
        """
        xmin = np.asarray(xmin, dtype=np.float64)
        ymin = np.asarray(ymin, dtype=np.float64)
        xmax = np.asarray(xmax, dtype=np.float64)
        ymax = np.asarray(ymax, dtype=np.float64)
        col_min, row_min = self.keys_for_points(xmin, ymax)

        d = (xmax - self.extent.xmin) / (self.extent.width / self.layout_cols)
        col_max = np.floor(d).astype(np.int64)
        back = (d == np.floor(d)) & (d != col_min)
        col_max = np.where(back, col_max - 1, col_max)

        d = (self.extent.ymax - ymin) / (self.extent.height / self.layout_rows)
        row_max = np.floor(d).astype(np.int64)
        back = (d == np.floor(d)) & (d != row_min)
        row_max = np.where(back, row_max - 1, row_max)

        return col_min, row_min, col_max, row_max

    def extent_for_gridbounds(self, gb: GridBounds) -> Extent:
        e1 = self.extent_for_key(gb.col_min, gb.row_min)
        e2 = self.extent_for_key(gb.col_max, gb.row_max)
        return e1.expand_to_include(e2)


@dataclass(frozen=True)
class LayoutLevel:
    zoom: int
    layout: LayoutDefinition


class ZoomedLayoutScheme:
    """Power-of-2 ZXY pyramid: at zoom z the world extent is a 2^z x 2^z grid
    of tile_size-px tiles (reference ZoomedLayoutScheme.scala:25-148)."""

    DEFAULT_TILE_SIZE = 256
    DEFAULT_RESOLUTION_THRESHOLD = 0.1

    def __init__(
        self,
        crs: str = "webmercator",
        tile_size: int = DEFAULT_TILE_SIZE,
        resolution_threshold: float = DEFAULT_RESOLUTION_THRESHOLD,
    ):
        if crs not in ("webmercator", "latlng"):
            raise ValueError(f"unsupported crs {crs!r}")
        self.crs = crs
        self.tile_size = tile_size
        self.resolution_threshold = resolution_threshold

    @property
    def world_extent(self) -> Extent:
        return WEBMERCATOR_WORLD if self.crs == "webmercator" else LATLNG_WORLD

    def level_for_zoom(self, zoom: int) -> LayoutLevel:
        if zoom < 0:
            raise ValueError("zoom must be >= 0")
        n = 1 << zoom
        return LayoutLevel(
            zoom,
            LayoutDefinition(
                self.world_extent, TileLayout(n, n, self.tile_size, self.tile_size)
            ),
        )

    def zoom_for_cell_size(self, cell_size: float) -> int:
        """Zoom whose resolution best matches cell_size (map units/pixel),
        with the reference's 0.1 resolution-threshold snap
        (ZoomedLayoutScheme.scala:67-98, haversine branch simplified to the
        planar WebMercator case where cell size is already in meters)."""
        z = int(math.log(EARTH_CIRCUMFERENCE / (cell_size * self.tile_size)) / math.log(2))
        z_res = EARTH_CIRCUMFERENCE / ((2**z) * self.tile_size)
        next_z_res = EARTH_CIRCUMFERENCE / ((2 ** (z + 1)) * self.tile_size)
        delta = z_res - next_z_res
        diff = z_res - cell_size
        return z + 1 if diff / delta > self.resolution_threshold else z

    def zoom_out(self, level: LayoutLevel) -> LayoutLevel:
        tl = level.layout.tile_layout
        return LayoutLevel(
            level.zoom - 1,
            LayoutDefinition(
                level.layout.extent,
                TileLayout(tl.layout_cols // 2, tl.layout_rows // 2, tl.tile_cols, tl.tile_rows),
            ),
        )

    def zoom_in(self, level: LayoutLevel) -> LayoutLevel:
        tl = level.layout.tile_layout
        return LayoutLevel(
            level.zoom + 1,
            LayoutDefinition(
                level.layout.extent,
                TileLayout(tl.layout_cols * 2, tl.layout_rows * 2, tl.tile_cols, tl.tile_rows),
            ),
        )


class FloatingLayoutScheme:
    """Data-extent-anchored layout (no pyramid): grid starts at the data
    extent's NW corner (reference FloatingLayoutScheme.scala)."""

    def __init__(self, tile_size: int = 256):
        self.tile_size = tile_size

    def level_for(self, extent: Extent, cell_width: float, cell_height: float) -> LayoutLevel:
        total_cols = extent.width / cell_width
        total_rows = extent.height / cell_height
        layout_cols = int(math.ceil(total_cols / self.tile_size))
        layout_rows = int(math.ceil(total_rows / self.tile_size))
        layout_extent = Extent(
            extent.xmin,
            extent.ymax - layout_rows * self.tile_size * cell_height,
            extent.xmin + layout_cols * self.tile_size * cell_width,
            extent.ymax,
        )
        return LayoutLevel(
            0,
            LayoutDefinition(
                layout_extent,
                TileLayout(layout_cols, layout_rows, self.tile_size, self.tile_size),
            ),
        )


# ---- WebMercator <-> LatLng closed-form (all the CRS support the ZXY scheme needs) ----

def lnglat_to_webmercator(lon, lat):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = EARTH_RADIUS * np.radians(lon)
    y = EARTH_RADIUS * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def webmercator_to_lnglat(x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / EARTH_RADIUS)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / EARTH_RADIUS)) - np.pi / 2.0)
    return lon, lat


def haversine_m(lon1, lat1, lon2, lat2):
    """Great-circle distance in meters (reference ZoomedLayoutScheme.scala:71-76
    haversine branch)."""
    p = math.pi / 180.0
    lon1, lat1 = np.asarray(lon1, np.float64), np.asarray(lat1, np.float64)
    lon2, lat2 = np.asarray(lon2, np.float64), np.asarray(lat2, np.float64)
    a = (
        0.5
        - np.cos((lat2 - lat1) * p) / 2.0
        + np.cos(lat1 * p) * np.cos(lat2 * p) * (1.0 - np.cos((lon2 - lon1) * p)) / 2.0
    )
    return 2.0 * EARTH_RADIUS * np.arcsin(np.sqrt(a))
