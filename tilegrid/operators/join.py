"""Spatial joins: layer-layer key joins, point-in-polygon via cell cover,
kNN via cell-ring expansion, plus explicit skew salting.

Reference counterparts:
  * SpatialJoin.join/leftOuterJoin (spark/.../join/SpatialJoin.scala:29-78):
    co-partitioned equi-join on SpatialKey -> a DataFrame join on
    (zoom,col,row); Catalyst reuses an existing hash partitioning, AQE splits
    skewed partitions (the reference handles neither skew nor balance —
    SpacePartitioner.scala:47-52 degrades to modulo).
  * VectorJoin (join/VectorJoin.scala:35-79) builds per-partition R-trees and
    a cartesian pass. We replace that with cell-grid hashing: both sides map
    to covering cells at a chosen zoom, equi-join on cell (small side
    broadcast), then refine with the exact vectorized predicate — no
    cartesian, no tree, and the broadcast path has no shuffle at all.
  * KNearestRDD (knn/KNearestRDD.scala:69-115) does a global takeOrdered /
    one priority queue per center. Our kNN is exact and distributed: ring
    expansion around each query cell (k_ring) until the k-th candidate
    distance is provably inside the ring radius, then a window top-k.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from ..cell import z2_encode, z2_sql
from ..geometry import points_in_polygon, polygon_bbox, wkb_decode
from ..grid import LayoutDefinition
from . import KEY_COLS
from .tiler import key_exprs, with_key_columns


# --------------------------------------------------------- layer-layer joins

def spatial_join(a: DataFrame, b: DataFrame, how: str = "inner", suffix: str = "_b") -> DataFrame:
    """Equi-join two layers on the spatial key. Columns of b (except keys)
    get `suffix`. how in {inner, left, right, full}."""
    dup = [c for c in b.columns if c in a.columns and c not in KEY_COLS + ["cell"]]
    right = b.drop("cell")
    for c in dup:
        right = right.withColumnRenamed(c, c + suffix)
    return a.join(right, KEY_COLS, how)


def salt_column(df: DataFrame, id_col: str, n_salt: int) -> DataFrame:
    """Explicit hot-key salting: shuffle key becomes (cell, salt) while the
    logical key stays intact (north-rule requirement; salt only the shuffle
    key). Use for aggregations over skewed cells: two-phase agg on
    (cell, _salt) then cell."""
    return df.withColumn("_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salt)))


def salted_count_per_cell(df: DataFrame, n_salt: int = 16, id_col: str = "image_id") -> DataFrame:
    """Count rows per cell with a two-phase salted aggregation — immune to
    hot cells (the fixtures' hot box puts ~10% of rows in one 0.1 deg box)."""
    return (
        salt_column(df, id_col, n_salt)
        .groupBy("cell", "_salt")
        .agg(F.count("*").alias("_partial"))
        .groupBy("cell")
        .agg(F.sum("_partial").alias("n"))
    )


# ------------------------------------------------------- point-in-polygon

def polygon_cover_df(
    spark,
    polygons: pd.DataFrame,
    layout: LayoutDefinition,
    zoom: int,
    id_col: str = "polygon_id",
    wkb_col: str = "wkb",
) -> DataFrame:
    """(polygon_id, cell) rows: the covering cells of each polygon at the
    layout zoom (LayerFilter.scala:136-188 rasterizes the polygon to keys;
    we use the exact tile-extent intersection cover)."""
    from ..cell import cover_polygon

    ids, cells = [], []
    for t in polygons.itertuples(index=False):
        rings = wkb_decode(bytes(getattr(t, wkb_col)))
        cs = cover_polygon(layout, rings)
        ids.extend([getattr(t, id_col)] * len(cs))
        cells.extend(int(c) for c in cs)
    return spark.createDataFrame(
        pd.DataFrame({id_col: ids, "cell": np.array(cells, dtype=np.int64)})
    )


def pip_join(
    points: DataFrame,
    polygons: pd.DataFrame,
    layout: LayoutDefinition,
    zoom: int,
    x: str = "x",
    y: str = "y",
    id_col: str = "polygon_id",
    point_cols: tuple[str, ...] = ("point_id",),
    refine: bool = True,
) -> DataFrame:
    """Point-in-polygon join. polygons is a (small) pandas frame with
    [id_col, wkb]; points a DataFrame with map-coordinate columns x,y.

    Plan: points -> cell (Catalyst floor math) |x| broadcast(polygon covers)
    on cell -> vectorized ray-casting refine (Arrow batches). The equi-join
    prunes candidates to tiles the polygon touches, so refine cost is
    ~|boundary tiles| x |points in them|. No shuffle of the points side
    beyond the scan when the cover side broadcasts."""
    spark = points.sparkSession
    keyed = with_key_columns(points, layout, x, y, zoom)
    cover = polygon_cover_df(spark, polygons, layout, zoom, id_col=id_col)
    cand = keyed.join(F.broadcast(cover), "cell")
    if not refine:
        return cand
    polys = {
        getattr(t, id_col): wkb_decode(bytes(t.wkb))
        for t in polygons.itertuples(index=False)
    }
    bc = spark.sparkContext.broadcast(polys)
    out_cols = list(point_cols) + [x, y, id_col]
    schema = cand.select(*out_cols).schema

    def refine_fn(it):
        pp = bc.value
        for pdf in it:
            pdf = pdf.reset_index(drop=True)
            keep = np.zeros(len(pdf), dtype=bool)
            for pid, grp in pdf.groupby(id_col):
                rings = pp[pid]
                m = points_in_polygon(grp[x].values, grp[y].values, rings)
                keep[grp.index.values] = m
            yield pdf.loc[keep, out_cols]

    return cand.select(*out_cols).mapInPandas(refine_fn, schema)


def pip_join_df(
    points: DataFrame,
    polygons: DataFrame,
    layout: LayoutDefinition,
    zoom: int,
    x: str = "x",
    y: str = "y",
    id_col: str = "polygon_id",
    wkb_col: str = "wkb",
    point_cols: tuple[str, ...] = ("point_id",),
    broadcast_polygons: bool = True,
) -> DataFrame:
    """DataFrame-native point-in-polygon join: the polygon side stays a
    DataFrame end-to-end (no driver pandas, no sc.broadcast dict — covers
    are computed in a distributed Arrow pass over polygon partitions, and
    ring geometry reaches the refine through a join on the polygon id).

    Plan: points -> cell (Catalyst floor math) |x| polygon covers on cell
    (broadcast when the polygon side is small, shuffle join otherwise) ->
    join the WKB dim on id -> vectorized ray-casting refine with per-batch
    geometry caching. 10^6+ polygons scale like any other join."""
    from ..cell import cover_polygon

    def emit_covers(it):
        for pdf in it:
            ids, cells = [], []
            for t in pdf.itertuples(index=False):
                rings = wkb_decode(bytes(getattr(t, wkb_col)))
                cs = cover_polygon(layout, rings)
                ids.extend([getattr(t, id_col)] * len(cs))
                cells.extend(int(c) for c in cs)
            if ids:
                yield pd.DataFrame({id_col: ids, "cell": np.array(cells, np.int64)})

    id_type = dict(zip(polygons.schema.fieldNames(), polygons.schema.fields))[
        id_col
    ].dataType.simpleString()
    covers = polygons.mapInPandas(emit_covers, f"{id_col} {id_type}, cell long")
    geom = polygons.select(id_col, wkb_col)
    if broadcast_polygons:
        covers, geom = F.broadcast(covers), F.broadcast(geom)
    keyed = with_key_columns(points, layout, x, y, zoom)
    cand = keyed.join(covers, "cell").join(geom, id_col)
    out_cols = list(point_cols) + [x, y, id_col]
    schema = cand.select(*out_cols).schema

    def refine_fn(it):
        for pdf in it:
            pdf = pdf.reset_index(drop=True)
            keep = np.zeros(len(pdf), dtype=bool)
            cache: dict = {}
            for pid, grp in pdf.groupby(id_col):
                rings = cache.get(pid)
                if rings is None:
                    rings = cache[pid] = wkb_decode(bytes(grp[wkb_col].iloc[0]))
                keep[grp.index.values] = points_in_polygon(
                    grp[x].values, grp[y].values, rings
                )
            yield pdf.loc[keep, out_cols]

    return cand.select(*out_cols, wkb_col).mapInPandas(refine_fn, schema)


# ------------------------------------------------------------------- kNN

def k_nearest(
    df: DataFrame,
    x: float,
    y: float,
    k: int,
    x_col: str = "x",
    y_col: str = "y",
    id_col: str | None = None,
) -> DataFrame:
    """Global top-k by distance to one point (KNearestRDD.kNearest
    :69-91 -> orderBy().limit(k): Spark plans a distributed TakeOrdered).
    id_col breaks distance ties deterministically."""
    d2 = (F.col(x_col) - F.lit(x)) ** 2 + (F.col(y_col) - F.lit(y)) ** 2
    order = ["_d2"] + ([id_col] if id_col else [])
    return df.withColumn("_d2", d2).orderBy(*order).limit(k).drop("_d2")


def knn_join_df(
    points: DataFrame,
    queries: DataFrame,
    layout: LayoutDefinition,
    zoom: int,
    k: int,
    x: str = "x",
    y: str = "y",
    query_id: str = "query_id",
    point_id: str = "point_id",
    max_rounds: int = 8,
) -> DataFrame:
    """DataFrame-native exact multi-center kNN: queries are a DataFrame, the
    per-round candidate cells are a Catalyst sequence-explode, done-ness is
    a per-round aggregate, and results accumulate as unioned DataFrames —
    no driver-side pandas, no per-query Python, no per-round result
    collection. The only driver traffic per round is one tiny count (the
    pending-set emptiness check), so 10^6 queries scale like any other
    join.

    Exactness bound: candidates within Chebyshev cell
    ring r are complete for distances <= d_safe = r * min(tile_w, tile_h)
    - max(tile_w, tile_h); a query finishes when its k-th candidate lies
    within d_safe, else the ring doubles; stragglers get one exhaustive
    broadcast round."""
    spark = points.sparkSession
    tl = layout.tile_layout
    tile_w, tile_h = layout.tile_width, layout.tile_height
    safe_unit = min(tile_w, tile_h)

    keyed = with_key_columns(points, layout, x, y, zoom).select(
        point_id, F.col(x).alias("_px"), F.col(y).alias("_py"), "cell"
    ).persist()
    cx, rx = key_exprs(layout, "_qx", "_qy")
    pending = (
        queries.select(
            query_id, F.col(x).alias("_qx"), F.col(y).alias("_qy")
        )
        .withColumn("_qc", F.expr(cx).cast("int"))
        .withColumn("_qr", F.expr(rx).cast("int"))
        .persist()
    )
    out_cols = [query_id, point_id, "dist", "rank"]
    results: list[DataFrame] = []
    w = Window.partitionBy(query_id).orderBy("dist", point_id)

    def exhaustive(pend: DataFrame) -> DataFrame:
        # final exhaustive round for stragglers: broadcast the (small)
        # residual query set against all points
        cand = keyed.crossJoin(
            F.broadcast(pend.select(query_id, "_qx", "_qy"))
        ).withColumn(
            "dist",
            F.sqrt((F.col("_px") - F.col("_qx")) ** 2
                   + (F.col("_py") - F.col("_qy")) ** 2),
        )
        return (
            cand.withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k)
            .select(*out_cols)
        )

    # smallest ring whose safety bound is positive (skip provably-unfinishable
    # rounds: d_safe = r*min(tw,th) - max(tw,th) <= 0 can never complete)
    r = int(max(tile_w, tile_h) / safe_unit) + 1
    finished = False
    for _ in range(max_rounds):
        cells = (
            pending.withColumn(
                "_cc",
                F.explode(F.expr(
                    f"sequence(greatest(_qc - {r}, 0),"
                    f" least(_qc + {r}, {tl.layout_cols - 1}))"
                )),
            )
            .withColumn(
                "_cr",
                F.explode(F.expr(
                    f"sequence(greatest(_qr - {r}, 0),"
                    f" least(_qr + {r}, {tl.layout_rows - 1}))"
                )),
            )
            .select(
                query_id, "_qx", "_qy",
                F.expr(z2_sql("_cc", "_cr", "spark")).alias("cell"),
            )
        )
        cand = keyed.join(cells, "cell").withColumn(
            "dist",
            F.sqrt((F.col("_px") - F.col("_qx")) ** 2
                   + (F.col("_py") - F.col("_qy")) ** 2),
        )
        topk = (
            cand.withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k)
            .select(*out_cols)
            .persist()
        )
        d_safe = r * safe_unit - max(tile_w, tile_h)
        if d_safe > 0:
            done = (
                topk.groupBy(query_id)
                .agg(F.count("*").alias("_n"), F.max("dist").alias("_dmax"))
                .where((F.col("_n") >= k) & (F.col("_dmax") <= d_safe))
                .select(query_id)
                .persist()
            )
            results.append(topk.join(done, query_id))
            # localCheckpoint, not persist: pending feeds BOTH the candidate
            # explode and the done anti-join, so with persist the logical
            # plan doubles per round (see vectorize._merged_labels rationale)
            pending = pending.join(done, query_id, "left_anti").localCheckpoint()
        if pending.limit(1).count() == 0:
            finished = True
            break
        r *= 2
        if r >= max(tl.layout_cols, tl.layout_rows):
            results.append(exhaustive(pending))
            finished = True
            break
    if not finished:
        # max_rounds exhausted with queries still pending: never drop
        # stragglers silently — run the exhaustive broadcast round for them
        results.append(exhaustive(pending))
    if not results:
        return spark.createDataFrame([], f"{query_id} long, {point_id} string, dist double, rank long")
    out = results[0]
    for df in results[1:]:
        out = out.unionByName(df)
    return out


# ----------------------------------------------------- distance (radius) join

def within_distance_pairs(
    df: DataFrame,
    radius: float,
    id_col: str,
    x: str = "lon",
    y: str = "lat",
) -> DataFrame:
    """All unordered pairs of points within planar distance <= radius —
    the fixed-radius twin of the kNN join (the dedup/conflation primitive:
    "find every observation pair closer than r").

    Cell-blocked, never a cross join: points key to a radius-sized grid
    block (floor(x/r), floor(y/r)); one side explodes to its 3x3 block
    neighborhood, the other stays single-block, so any qualifying pair
    meets in EXACTLY one (block) bucket — an equi-join Catalyst can hash,
    with work O(n x local density) instead of O(n^2). The refine predicate
    and emitted dist2 are the plain IEEE product-sum (dx*dx + dy*dy), so a
    SQL oracle reproduces them bit-for-bit. Output (id_a, id_b, dist2),
    id_a < id_b, each pair exactly once. Skewed blocks (a hot city) are
    AQE-splittable since the join key is the block id."""
    r = float(radius)
    base = (
        df.where(F.col(x).isNotNull() & F.col(y).isNotNull())
        .select(
            F.col(id_col).alias("_id"),
            F.col(x).cast("double").alias("_x"),
            F.col(y).cast("double").alias("_y"),
        )
        .withColumn("_bx", F.expr(f"CAST(floor(_x / {r!r}) AS BIGINT)"))
        .withColumn("_by", F.expr(f"CAST(floor(_y / {r!r}) AS BIGINT)"))
    )
    offs = ",".join(
        f"struct(CAST({dx} AS BIGINT) AS dx, CAST({dy} AS BIGINT) AS dy)"
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
    )
    a = base.select(
        "_id",
        "_x",
        "_y",
        "_bx",
        "_by",
        F.expr(f"explode(array({offs}))").alias("_o"),
    ).select(
        F.col("_id").alias("_ida"),
        F.col("_x").alias("_xa"),
        F.col("_y").alias("_ya"),
        (F.col("_bx") + F.col("_o.dx")).alias("_bx"),
        (F.col("_by") + F.col("_o.dy")).alias("_by"),
    )
    joined = a.join(base, ["_bx", "_by"]).where(F.col("_ida") < F.col("_id"))
    dist2 = (
        (F.col("_xa") - F.col("_x")) * (F.col("_xa") - F.col("_x"))
        + (F.col("_ya") - F.col("_y")) * (F.col("_ya") - F.col("_y"))
    )
    return (
        joined.withColumn("dist2", dist2)
        .where(F.col("dist2") <= F.lit(r * r))
        .select(
            F.col("_ida").alias("id_a"),
            F.col("_id").alias("id_b"),
            "dist2",
        )
    )
