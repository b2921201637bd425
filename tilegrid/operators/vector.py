"""Distributed vector-geometry operators (§2.9): convex hull, simplify.

Two hull strategies, both exact:
  * convex_hull_points — classic decomposition hull(S) = hull(union of
    per-partition hulls): each partition reduces to <= its hull vertices
    (tiny), the driver finishes on the union. One narrow Arrow pass.
  * convex_hull_envelope — fully relational (zero driver compute): per-x
    extremal candidates, pairwise slope aggregates, and the envelope vertex
    test p-on-upper-hull <=> min over left candidates of slope(a,p) >
    max over right candidates of slope(p,b) (strict: collinear mid-points
    are dropped, matching monotone chain with strict turns). Everything is
    +-*/ and min/max in Catalyst, so the same SQL text is an exact oracle.

(Reference: vector/convexhull delegates to JTS; monotone chain per the
published literature.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..geometry import convex_hull, simplify_dp


def convex_hull_points(df: DataFrame, x: str = "x", y: str = "y") -> pd.DataFrame:
    """Exact convex hull of a distributed point set; returns the CCW hull
    vertices as a (small) pandas frame [x, y]."""

    def partial(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            h = convex_hull(pdf[[x, y]].values)
            yield pd.DataFrame({x: h[:, 0], y: h[:, 1]})

    parts = df.select(x, y).mapInPandas(partial, f"{x} double, {y} double").toPandas()
    if len(parts) == 0:
        return pd.DataFrame({x: [], y: []})
    h = convex_hull(parts[[x, y]].values)
    return pd.DataFrame({x: h[:, 0], y: h[:, 1]})


def convex_hull_envelope(
    df: DataFrame, x: str = "x", y: str = "y", prereduce: bool = True
) -> DataFrame:
    """Exact convex hull as a DataFrame op: rows (hull_side 'U'|'L', x, y).

    Stage 0 (prereduce, distributed, no shuffle): one mapInPandas pass
    replaces every partition with its own hull vertices — hull(S) =
    hull(union of partition hulls), so the survivors are a superset of the
    global hull vertices but at most O(P * h) rows. Without this the per-x
    extremal stage keeps ~N candidates for continuous coordinates and the
    pairwise-slope join below goes quadratic in N.
    Stage 1 (one shuffle): per distinct x keep max-y (upper candidates) and
    min-y (lower candidates) — every hull vertex must be extremal for its
    x. Stage 2 (tiny, O((P*h)^2) pairs): pairwise slopes among candidates
    with min/max aggregates; p is an upper-hull vertex iff min_left(p) >
    max_right(p) (endpoints always in). No collect, no transcendentals;
    coordinates pass through the prereduce bit-exact, so the relational
    envelope test still matches the all-points SQL oracle."""

    def side(cand: DataFrame, is_upper: bool) -> DataFrame:
        a = cand.select(F.col(x).alias("ax"), F.col(y).alias("ay"))
        b = cand.select(F.col(x).alias("bx"), F.col(y).alias("by"))
        pairs = a.join(b, F.col("ax") < F.col("bx")).withColumn(
            "s", (F.col("by") - F.col("ay")) / (F.col("bx") - F.col("ax"))
        )
        lagg = F.min("s") if is_upper else F.max("s")
        ragg = F.max("s") if is_upper else F.min("s")
        left = pairs.groupBy(F.col("bx").alias(x)).agg(lagg.alias("_l"))
        right = pairs.groupBy(F.col("ax").alias(x)).agg(ragg.alias("_r"))
        test = (
            F.col("_l").isNull() | F.col("_r").isNull()
            | ((F.col("_l") > F.col("_r")) if is_upper else (F.col("_l") < F.col("_r")))
        )
        return (
            cand.join(left, x, "left")
            .join(right, x, "left")
            .where(test)
            .select(
                F.lit("U" if is_upper else "L").alias("hull_side"),
                F.col(x), F.col(y),
            )
        )

    pts = df.select(x, y)
    if prereduce:
        def partial(it):
            for pdf in it:
                if len(pdf) == 0:
                    continue
                h = convex_hull(pdf[[x, y]].values)
                yield pd.DataFrame({x: h[:, 0], y: h[:, 1]})

        pts = pts.mapInPandas(partial, f"{x} double, {y} double")
    pts = pts.distinct()
    upper = pts.groupBy(x).agg(F.max(y).alias(y))
    lower = pts.groupBy(x).agg(F.min(y).alias(y))
    return side(upper, True).unionByName(side(lower, False))


def delaunay_per_group(
    df: DataFrame,
    group_col: str,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Per-group Delaunay triangulation (triangulation.delaunay inside
    applyInPandas): each group (tile cell, region, ...) triangulates its
    own points — the TIN-per-partition shape. Output rows: (group, ax, ay,
    bx, by, cx, cy) — one row per triangle, vertices in map coords."""
    from ..triangulation import delaunay

    def tri(pdf: pd.DataFrame) -> pd.DataFrame:
        pts, tris = delaunay(pdf[[x, y]].values)
        g = pdf.iloc[0][group_col]
        if len(tris) == 0:
            return pd.DataFrame(
                {c: [] for c in (group_col, "ax", "ay", "bx", "by", "cx", "cy")}
            )
        a, b, c = pts[tris[:, 0]], pts[tris[:, 1]], pts[tris[:, 2]]
        return pd.DataFrame(
            {
                group_col: [g] * len(tris),
                "ax": a[:, 0], "ay": a[:, 1],
                "bx": b[:, 0], "by": b[:, 1],
                "cx": c[:, 0], "cy": c[:, 1],
            }
        )

    gt = dict(zip(df.schema.fieldNames(), df.schema.fields))[
        group_col
    ].dataType.simpleString()
    return df.groupBy(group_col).applyInPandas(
        tri,
        f"{group_col} {gt}, ax double, ay double, bx double, by double, "
        "cx double, cy double",
    )


def clip_rings(
    df: DataFrame, clip_ring: np.ndarray, wkb_col: str = "wkb"
) -> DataFrame:
    """Clip every polygon's exterior ring against a convex clip ring
    (Sutherland-Hodgman; geometry.clip_polygon_convex). Rows whose
    intersection is empty are dropped."""
    from ..geometry import clip_polygon_convex, wkb_decode, wkb_encode_polygon

    schema = df.schema
    clip = np.asarray(clip_ring, dtype=np.float64)

    def run(it):
        for pdf in it:
            out = pdf.copy()
            new, keep = [], []
            for raw in out[wkb_col]:
                rings = wkb_decode(bytes(raw))
                clipped = clip_polygon_convex(rings[0], clip)
                if len(clipped) >= 3:
                    new.append(wkb_encode_polygon([clipped]))
                    keep.append(True)
                else:
                    new.append(None)
                    keep.append(False)
            out[wkb_col] = new
            yield out[np.asarray(keep, dtype=bool)]

    return df.mapInPandas(run, schema)


def simplify_rings(
    df: DataFrame, tolerance: float, wkb_col: str = "wkb"
) -> DataFrame:
    """Douglas-Peucker simplify every polygon's rings (WKB in/out)."""
    from ..geometry import wkb_decode, wkb_encode_polygon

    schema = df.schema

    def run(it):
        for pdf in it:
            out = pdf.copy()
            new = []
            for raw in out[wkb_col]:
                rings = wkb_decode(bytes(raw))
                new.append(
                    wkb_encode_polygon([simplify_dp(r, tolerance) for r in rings])
                )
            out[wkb_col] = new
            yield out

    return df.mapInPandas(run, schema)


def overlay(
    df: DataFrame,
    other_rings: list[np.ndarray],
    op: str,
    wkb_col: str = "wkb",
) -> DataFrame:
    """Boolean overlay of every row's polygon against a fixed polygon
    (concave / holed both sides — geometry.polygon_overlay; reference
    Polygon.scala:153-406 via JTS). Rows whose result is empty are
    dropped; the result polygon replaces `wkb_col`."""
    from ..geometry import polygon_overlay, wkb_decode, wkb_encode_polygon

    schema = df.schema

    def run(it):
        for pdf in it:
            out = pdf.copy()
            new, keep = [], []
            for raw in out[wkb_col]:
                res = polygon_overlay(wkb_decode(bytes(raw)), other_rings, op)
                if res:
                    new.append(wkb_encode_polygon(res) if len(res) else None)
                    keep.append(True)
                else:
                    new.append(None)
                    keep.append(False)
            out[wkb_col] = pd.Series(new, index=out.index, dtype=object)
            yield out[keep]

    return df.mapInPandas(run, schema)


def buffer(
    df: DataFrame,
    dist: float,
    quad_segs: int = 8,
    cap: str = "round",
    wkb_col: str = "wkb",
) -> DataFrame:
    """Buffer every row's polygon by `dist` (geometry.buffer_polygon —
    concave/holed inputs, positive dilation or negative erosion; the
    reference's Polygon.buffer via JTS, Polygon.scala:153-158). Rows whose
    erosion is empty are dropped; the buffered polygon replaces
    `wkb_col`. Embarrassingly parallel — one mapInPandas pass."""
    from ..geometry import buffer_polygon, wkb_decode, wkb_encode_polygon

    schema = df.schema

    def run(it):
        for pdf in it:
            out = pdf.copy()
            new, keep = [], []
            for raw in out[wkb_col]:
                res = buffer_polygon(wkb_decode(bytes(raw)), dist, quad_segs, cap)
                if res:
                    new.append(wkb_encode_polygon(res))
                    keep.append(True)
                else:
                    new.append(None)
                    keep.append(False)
            out[wkb_col] = pd.Series(new, index=out.index, dtype=object)
            yield out[keep]

    return df.mapInPandas(run, schema)


def dissolve(
    df: DataFrame,
    group_col: str,
    wkb_col: str = "wkb",
) -> DataFrame:
    """Per-group polygon union (the reference's vector/dissolve): fold
    geometry.dissolve_rings over each group's polygons inside
    applyInPandas. Output: (group, wkb) with one merged even-odd ring set
    per group. Groups are the unit of parallelism — pre-bucket inputs by a
    spatial key so each group stays small at scale."""
    from ..geometry import dissolve_rings, wkb_decode, wkb_encode_polygon

    gt = dict(zip(df.schema.fieldNames(), df.schema.fields))[
        group_col
    ].dataType.simpleString()

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        polys = [wkb_decode(bytes(raw)) for raw in pdf[wkb_col]]
        merged = dissolve_rings(polys)
        return pd.DataFrame(
            {
                group_col: [pdf.iloc[0][group_col]],
                wkb_col: [wkb_encode_polygon(merged)],
            }
        )

    return df.groupBy(group_col).applyInPandas(
        run, f"{group_col} {gt}, {wkb_col} binary"
    )


def reproject_geoms(
    df: DataFrame, src_crs: str, dst_crs: str, wkb_col: str = "wkb"
) -> DataFrame:
    """Reproject a WKB geometry column between any two CRS the proj module
    resolves (reference: vector/.../reproject/ReprojectMethods + the
    geotrellis.proj4 Transform). One Arrow batch pass; every ring's
    vertices transform in one vectorized call. Geometry shape (point /
    polygon / multipolygon, holes) is preserved; densify first when the
    transform's curvature matters at edge length scale."""
    from ..geometry import (
        GeometryCollection, MultiLine, MultiPoint, wkb_decode, wkb_encode_geom,
    )
    from ..proj import transform_fn

    fn = transform_fn(src_crs, dst_crs)
    schema = df.schema

    def xform(g):
        if isinstance(g, tuple):  # point
            x, y = fn(np.array([g[0]]), np.array([g[1]]))
            return (float(x[0]), float(y[0]))
        if isinstance(g, np.ndarray):  # linestring vertices
            return np.column_stack(fn(g[:, 0], g[:, 1]))
        if isinstance(g, MultiPoint):
            return MultiPoint(np.column_stack(fn(g.coords[:, 0], g.coords[:, 1])))
        if isinstance(g, MultiLine):
            return MultiLine([xform(ln) for ln in g.lines])
        if isinstance(g, GeometryCollection):
            return GeometryCollection([xform(x) for x in g.geoms])
        if isinstance(g, list) and g and isinstance(g[0], list):  # multipolygon
            return [[xform(r) for r in rings] for rings in g]
        return [xform(r) for r in g]  # polygon rings

    def run(it):
        for pdf in it:
            out = pdf.copy()
            enc = []
            for raw in out[wkb_col]:
                raw = bytes(raw)
                g = wkb_decode(raw)
                if isinstance(g, list) and not g:
                    # EMPTY polygon/multipolygon: transform of empty is
                    # empty — keep the original bytes (preserves the kind)
                    enc.append(raw)
                    continue
                enc.append(wkb_encode_geom(xform(g)))
            out[wkb_col] = enc
            yield out

    return df.mapInPandas(run, schema)


def geojson_features(df: DataFrame, text_col: str = "geojson") -> DataFrame:
    """Parse a column of GeoJSON documents (FeatureCollection, bare
    Feature, or bare geometry — GeoJson.scala's permissive entry) and
    EXPLODE into one row per feature: (doc ordinal columns passthrough,
    fid string, kind string, wkb binary, properties json string). The
    distributed JsonFeatureCollection ingest (FeatureFormats.scala +
    JsonFeatureCollection.scala); one Arrow batch pass."""
    import json

    from ..geometry import (
        GeometryCollection, MultiLine, MultiPoint,
        feature_collection_decode, wkb_encode_geom,
    )

    def kind_of(g):
        if isinstance(g, tuple):
            return "point"
        if isinstance(g, np.ndarray):
            return "linestring"
        if isinstance(g, MultiPoint):
            return "multipoint"
        if isinstance(g, MultiLine):
            return "multilinestring"
        if isinstance(g, GeometryCollection):
            return "geometrycollection"
        if isinstance(g, list) and g and isinstance(g[0], list):
            return "multipolygon"
        return "polygon"

    passthrough = [c for c in df.columns if c != text_col]

    def run(it):
        for pdf in it:
            rows = {c: [] for c in passthrough}
            rows.update({"fid": [], "kind": [], "wkb": [], "properties": []})
            for t in pdf.itertuples(index=False):
                feats, _crs = feature_collection_decode(
                    getattr(t, text_col))
                for geom, props, fid in feats:
                    for c in passthrough:
                        rows[c].append(getattr(t, c))
                    rows["fid"].append(None if fid is None else str(fid))
                    rows["kind"].append(kind_of(geom))
                    rows["wkb"].append(wkb_encode_geom(geom))
                    rows["properties"].append(
                        None if props is None else json.dumps(props))
            yield pd.DataFrame(rows)

    from pyspark.sql.types import BinaryType, StringType, StructField, StructType

    fields = [df.schema[c] for c in passthrough] + [
        StructField("fid", StringType()),
        StructField("kind", StringType()),
        StructField("wkb", BinaryType()),
        StructField("properties", StringType()),
    ]
    return df.mapInPandas(run, StructType(fields))


def clip_lines(
    df: DataFrame,
    rings: list[np.ndarray],
    wkb_col: str = "wkb",
    out: str = "clipped",
    parts_col: str = "n_parts",
) -> DataFrame:
    """Clip a LINESTRING / MULTILINESTRING WKB column to a polygon
    (Line.intersection(Polygon), Line.scala:133-150): appends the clipped
    geometry as MULTILINESTRING WKB (empty -> 0 parts) plus the part count.
    The polygon broadcasts; one Arrow batch pass, no shuffle."""
    from ..geometry import (
        MultiLine, clip_line_to_polygon, wkb_decode, wkb_encode_multilinestring,
    )

    bc = df.sparkSession.sparkContext.broadcast([np.asarray(r).tolist() for r in rings])

    def run(it):
        rr = [np.asarray(r, np.float64) for r in bc.value]
        for pdf in it:
            outp = pdf.copy()
            blobs, counts = [], []
            for raw in outp[wkb_col]:
                g = wkb_decode(bytes(raw))
                lines = g.lines if isinstance(g, MultiLine) else [g]
                parts = []
                for ln in lines:
                    parts.extend(clip_line_to_polygon(ln, rr))
                blobs.append(wkb_encode_multilinestring(parts))
                counts.append(len(parts))
            outp[out] = blobs
            outp[parts_col] = counts
            yield outp

    from pyspark.sql.types import (
        BinaryType, IntegerType, StructField, StructType,
    )

    schema = StructType(list(df.schema.fields)
                        + [StructField(out, BinaryType()),
                           StructField(parts_col, IntegerType())])
    return df.mapInPandas(run, schema)


def line_lengths(df: DataFrame, wkb_col: str = "wkb", out: str = "length") -> DataFrame:
    """Append the geodesic-free (planar) length of a LINESTRING /
    MULTILINESTRING WKB column (reference: vector/.../Line.scala length,
    MultiLine.scala). One Arrow batch pass; each polyline's segment
    lengths reduce in a single vectorized hypot."""
    from ..geometry import MultiLine, line_length, wkb_decode

    def run(it):
        for pdf in it:
            outp = pdf.copy()
            vals = []
            for raw in outp[wkb_col]:
                g = wkb_decode(bytes(raw))
                if not isinstance(g, (np.ndarray, MultiLine)):
                    raise TypeError("line_lengths expects LINESTRING/MULTILINESTRING WKB")
                vals.append(line_length(g))
            outp[out] = vals
            yield outp

    from pyspark.sql.types import DoubleType, StructField, StructType

    # copy, don't .add(): StructType.add mutates df's own schema object
    schema = StructType(list(df.schema.fields) + [StructField(out, DoubleType())])
    return df.mapInPandas(run, schema)
