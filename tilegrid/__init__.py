"""tilegrid — a from-scratch PySpark-native tiled-raster + spatial-join engine.

Re-expresses the capabilities of GeoTrellis (reference study: SURVEY.md) as
DataFrame ops + vectorized pandas/Arrow UDFs over parquet/Iceberg-style tables.
Not a port: the Scala/RDD execution machinery of the reference is replaced by
Catalyst planning, explicit cell partitioning, and NumPy batch kernels.

Layout:
  grid       — Extent / TileLayout / LayoutDefinition / MapKeyTransform /
               ZoomedLayoutScheme (ZXY pyramid math)
  cell       — hierarchical cell index (Z-order / quadtree), k_ring, cover,
               zranges range decomposition + MergeQueue
  celltype   — (dtype, nodata) cell types + masked NoData arithmetic
  codec      — tile <-> bytes codecs (real PNG incl. indexed palette, real
               baseline JPEG via tilegrid.jpeg, raw, fast 'fjpg' stand-in)
  jpeg       — from-scratch baseline JPEG encoder/decoder (T.81)
  proj       — map projections (proj4 analogue): UTM/TM, LCC, Albers, polar
               stereo, sinusoidal, spherical family; EPSG + proj strings;
               datum shifts (geocentric Helmert + nadgrids grid tables)
  nadgrid    — CTABLE V2 / NTv1 grid-shift tables (nad_cvt/nad_intr)
  avro       — from-scratch Avro binary codec + container files with the
               reference's tile/key record schemas
  geotiff    — GeoTiff/BigTIFF codec: strips/tiles, LZW/deflate/JPEG,
               predictors, windowed reads, chained-IFD overviews, write_cog
  arg        — Azavea Raster Grid sidecar+binary format
  geometry   — from-scratch WKB, ray-casting point-in-polygon, bbox ops
  meta       — layer metadata + attribute store
  oracle     — single-process NumPy reference implementations (test oracle)
  fixtures   — deterministic synthetic corpora (images/points/polygons/layers)
  operators  — Spark operators: tiler, pyramid, local/focal/zonal, joins, knn,
               rasterize/vectorize, summaries, reshaping
  sources    — layer read/write with pruning, lineage manifests, slippy, render
  pipeline   — end-to-end ingest + training-data ops (dedup, text, ann)
"""

__version__ = "0.1.0"
