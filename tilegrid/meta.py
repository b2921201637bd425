"""Layer metadata + attribute store.

LayerMeta mirrors TileLayerMetadata (spark/.../TileLayerMetadata.scala:35-41):
cell type + layout + data extent + CRS + key bounds. The reference stores it
as JSON in an AttributeStore (io/AttributeStore.scala); we keep a `_layers/`
sidecar of JSON files next to the parquet data (Iceberg table properties in
production).

collect_metadata (the reference's distributed reduce,
TileLayerMetadata.scala:110-132) becomes a single df.agg.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from . import fsutil
from .celltype import CellType
from .grid import Extent, GridBounds, LayoutDefinition, TileLayout


@dataclass(frozen=True)
class LayerMeta:
    cell_type: CellType
    layout: LayoutDefinition
    extent: Extent              # data footprint (subset of layout extent)
    crs: str                    # 'webmercator' | 'latlng'
    bounds: GridBounds          # key bounds
    zoom: int

    def to_json(self) -> dict:
        le, tl = self.layout.extent, self.layout.tile_layout
        return {
            "cell_type": self.cell_type.to_json(),
            "layout": {
                "extent": le.to_tuple(),
                "tile_layout": [tl.layout_cols, tl.layout_rows, tl.tile_cols, tl.tile_rows],
            },
            "extent": self.extent.to_tuple(),
            "crs": self.crs,
            "bounds": [
                self.bounds.col_min, self.bounds.row_min,
                self.bounds.col_max, self.bounds.row_max,
            ],
            "zoom": self.zoom,
        }

    @staticmethod
    def from_json(d: dict) -> "LayerMeta":
        lay = d["layout"]
        return LayerMeta(
            cell_type=CellType.from_json(d["cell_type"]),
            layout=LayoutDefinition(
                Extent(*lay["extent"]), TileLayout(*lay["tile_layout"])
            ),
            extent=Extent(*d["extent"]),
            crs=d["crs"],
            bounds=GridBounds(*d["bounds"]),
            zoom=d["zoom"],
        )


class AttributeStore:
    """JSON sidecar store: <root>/_layers/<name>/<zoom>.json (+ free-form
    attributes). Plays the role of the reference's AttributeStore."""

    def __init__(self, root: str):
        self.root = root

    def _path(self, name: str, zoom: int, attr: str = "metadata") -> str:
        return os.path.join(self.root, "_layers", name, f"{zoom}.{attr}.json")

    def write_meta(self, name: str, meta: LayerMeta) -> None:
        fsutil.write_text(self._path(name, meta.zoom), json.dumps(meta.to_json(), indent=1))

    def read_meta(self, name: str, zoom: int) -> LayerMeta:
        return LayerMeta.from_json(json.loads(fsutil.read_text(self._path(name, zoom))))

    def write_attr(self, name: str, zoom: int, attr: str, value) -> None:
        fsutil.write_text(self._path(name, zoom, attr), json.dumps(value))

    def read_attr(self, name: str, zoom: int, attr: str):
        return json.loads(fsutil.read_text(self._path(name, zoom, attr)))

    def layer_exists(self, name: str, zoom: int) -> bool:
        return fsutil.exists(self._path(name, zoom))

    def zooms(self, name: str) -> list[int]:
        d = os.path.join(self.root, "_layers", name)
        return sorted(
            int(f.split(".")[0])
            for f in fsutil.listdir(d)
            if f.endswith(".metadata.json")
        )
