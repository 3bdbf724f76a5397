"""Spatial join: cell-key candidate generation + exact refine.

The engine's core join (SURVEY.md §2.3): instead of the reference's per-layer
prepared-geometry filter loop (ogrlayer.cpp:3902-4067), candidates come from
an equi-join on hierarchical cell keys — broadcast when the polygon side is
small (tile grids always are), shuffle-on-cell otherwise — and the exact
predicate is a vectorized ray-cast refine. Catalyst handles pushdown; the
only custom physics is (a) covering-cell expansion of polygon bboxes, done
JVM-side with sequence/explode, and (b) optional salting for dense cells.

At 100 TB scale: the polygon side of a tile-grid join is ≤ a few MB per zoom
(2^2z tiles) → always broadcast; the point side never shuffles at all. For
polygon sets too big to broadcast, the covering-cell explode keys both sides
so the shuffle is on cell ranges (AQE splits skewed cells; `salt` splits
harder hot spots explicitly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import cells as C
from ..functions.geometry import pip_refine
from ..sql import templates as T


def covering_cells(polys: DataFrame, zoom: int, minx="minx", miny="miny",
                   maxx="maxx", maxy="maxy") -> DataFrame:
    """Explode each polygon row into the tile cells its bbox covers at
    ``zoom``. Pure column math + sequence/explode (JVM-side).

    Coverage rule matches the point-assignment convention (ceil-1): a point
    exactly on a shared edge is assigned to the lower/left tile, so a
    polygon's coverage includes the tile its min edge falls into and the tile
    containing (max - epsilon); we cover [tile(minx), tile_floor(maxx)]
    where tile_floor uses floor (a bbox touching a boundary still covers the
    next tile only if it extends past it).
    """
    z = str(zoom)
    n1 = f"(CAST(power(2.0, {z}) AS BIGINT) - 1)"

    def tmin(p):  # tile of the min edge, by point-assignment convention
        return f"least(greatest({T.sql_pixels_to_tile(T.sql_px(p, z))}, CAST(0 AS BIGINT)), {n1})"

    def tmax(p):  # last tile whose interior intersects [.., max)
        px = T.sql_px(p, z)
        e = f"(CAST(ceiling(({px}) / 256.0) AS BIGINT) - 1)"
        return f"least(greatest({e}, CAST(0 AS BIGINT)), {n1})"

    return (
        polys.withColumn("_cx0", F.expr(tmin(minx)))
        .withColumn("_cx1", F.expr(tmax(maxx)))
        .withColumn("_cy0", F.expr(tmin(miny)))
        .withColumn("_cy1", F.expr(tmax(maxy)))
        .withColumn("cov_x", F.explode(F.expr("sequence(_cx0, _cx1)")))
        .withColumn("cov_y", F.explode(F.expr("sequence(_cy0, _cy1)")))
        .drop("_cx0", "_cx1", "_cy0", "_cy1")
    )


def spatial_join_points_tiles(points: DataFrame, tile_grid: DataFrame,
                              zoom: int, lon="lon", lat="lat",
                              refine: str = "none",
                              broadcast_tiles: bool = True) -> DataFrame:
    """Join points to the tiles containing them at ``zoom``.

    For the tile grid the candidate cell IS the answer (tiles are the cells),
    so refine='none' is exact by construction; refine='raycast' additionally
    runs the even-odd ray cast against each tile's WKB ring (validates the
    boundary convention; used by tests and by non-cell-aligned polygons).
    """
    pts = points.withColumns(
        {
            "_tx": C.tile_x(lon, str(zoom)),
            "_ty": C.tile_y_tms(lat, str(zoom)),
        }
    )
    grid = tile_grid.where(F.col("z") == zoom)
    if broadcast_tiles:
        grid = F.broadcast(grid)
    joined = pts.join(
        grid,
        (pts["_tx"] == grid["x"]) & (pts["_ty"] == grid["y"]),
        "inner",
    ).drop("_tx", "_ty")
    if refine == "raycast":
        joined = (
            joined.withColumn("_mx", C.mercator_x(lon))
            .withColumn("_my", C.mercator_y(lat))
            .where(pip_refine("_mx", "_my", "wkb"))
            .drop("_mx", "_my")
        )
    return joined


def spatial_join_points_polygons(points: DataFrame, polys: DataFrame,
                                 zoom: int, lon="lon", lat="lat",
                                 broadcast_polys: bool = False,
                                 salt: int = 0) -> DataFrame:
    """General polygon containment join: covering-cell candidates + ray-cast
    refine. ``polys`` needs (minx,miny,maxx,maxy,wkb) in EPSG:3857.

    ``salt`` > 0 replicates each polygon-cell row ``salt`` ways and scatters
    points across replicas — use when a single cell holds a hot polygon and
    the join must shuffle (both sides large). With broadcast_polys the salt
    is unnecessary (no shuffle exists).
    """
    cov = covering_cells(polys, zoom)
    pts = points.withColumns(
        {
            "_tx": C.tile_x(lon, str(zoom)),
            "_ty": C.tile_y_tms(lat, str(zoom)),
            "_mx": C.mercator_x(lon),
            "_my": C.mercator_y(lat),
        }
    )
    if salt > 0 and not broadcast_polys:
        cov = cov.withColumn("_s", F.explode(F.expr(f"sequence(0, {salt - 1})")))
        pts = pts.withColumn("_s", F.pmod(F.xxhash64(lon, lat), F.lit(salt)))
        cond = (
            (pts["_tx"] == cov["cov_x"]) & (pts["_ty"] == cov["cov_y"])
            & (pts["_s"] == cov["_s"])
        )
    else:
        cond = (pts["_tx"] == cov["cov_x"]) & (pts["_ty"] == cov["cov_y"])
    if broadcast_polys:
        cov = F.broadcast(cov)
    out = (
        pts.join(cov, cond, "inner")
        .where(pip_refine("_mx", "_my", "wkb"))
        .drop("_tx", "_ty", "_mx", "_my", "cov_x", "cov_y", "_s")
    )
    return out
