"""Single-image tiling kernel — the numpy core shared by the Spark operator
(inside Arrow UDFs) and the driver-side test oracle.

Clones the gdal2tiles base-tile path
(/root/reference/swig/python/gdal-utils/osgeo_utils/gdal2tiles.py):
* native zoom from the pixel size: ``ZoomForPixelSize`` (:504-510, :2455);
* per-zoom tile range over the footprint (:2428-2442 tminmax);
* per-tile source window via ``geo_query`` with querysize (:2968-3010);
* the window is read nearest-decimated to the query canvas (RasterIO default)
  and then scaled to the 256² tile (``scale_query_to_tile`` :838-932) —
  querysize = tile_size for nearest, 2*tile_size for bilinear, matching
  options_post_processing;
* overview tile = 2x2 children mosaic downsampled by average
  (``create_overview_tile`` :1466-1530, grouped by (tx>>1, ty>>1) :1661-1689).

Image georeferencing model (FIXTURES.md): footprint centered at (lon, lat),
``gsd_m`` mercator meters/pixel, north-up: geotransform
[minx, gsd, 0, maxy, 0, -gsd] in EPSG:3857.
"""

from __future__ import annotations

import numpy as np

from . import mercator as M
from .resample import geo_query, resample_nearest

TILE = 256


def image_bounds_3857(lon: float, lat: float, w: int, h: int, gsd_m: float):
    """Footprint (minx, miny, maxx, maxy) in EPSG:3857."""
    mx, my = M.lonlat_to_meters(lon, lat)
    hw = w * gsd_m / 2.0
    hh = h * gsd_m / 2.0
    return float(mx) - hw, float(my) - hh, float(mx) + hw, float(my) + hh


def geotransform_3857(lon: float, lat: float, w: int, h: int, gsd_m: float):
    minx, _, _, maxy = image_bounds_3857(lon, lat, w, h, gsd_m)
    return [minx, gsd_m, 0.0, maxy, 0.0, -gsd_m]


def native_zoom(gsd_m: float) -> int:
    return int(M.zoom_for_pixel_size(gsd_m))


def tile_range(bounds, zoom: int):
    """Inclusive TMS tile range (tminx, tminy, tmaxx, tmaxy) covering the
    bounds, clamped to the grid (gdal2tiles tminmax computation:2428-2442:
    MetersToTile of both corners, clamped)."""
    minx, miny, maxx, maxy = bounds
    tminx, tminy = M.meters_to_tile(minx, miny, zoom)
    tmaxx, tmaxy = M.meters_to_tile(maxx, maxy, zoom)
    n = 2**zoom - 1
    return (
        int(np.clip(tminx, 0, n)),
        int(np.clip(tminy, 0, n)),
        int(np.clip(tmaxx, 0, n)),
        int(np.clip(tmaxy, 0, n)),
    )


def render_base_tile(arr: np.ndarray, gt, tx: int, ty: int, zoom: int,
                     method: str = "nearest") -> np.ndarray:
    """Render one 256² base tile (uint8, same band count as ``arr``).

    Missing coverage is 0-filled (the reference fills via the alpha band;
    v0 carries no alpha and documents 0-fill).
    """
    from .resample import QUERYSIZE_FACTOR, scale_to_tile

    h, w = arr.shape[0], arr.shape[1]
    bminx, bminy, bmaxx, bmaxy = M.tile_bounds(tx, ty, zoom)
    qs = TILE * QUERYSIZE_FACTOR[method]
    (rx, ry, rxs, rys), (wx, wy, wxs, wys) = geo_query(
        gt, w, h, float(bminx), float(bmaxy), float(bmaxx), float(bminy),
        querysize=qs,
    )
    bands = arr.shape[2] if arr.ndim == 3 else 1
    canvas = np.zeros((qs, qs, bands) if arr.ndim == 3 else (qs, qs),
                      dtype=arr.dtype)
    if wxs > 0 and wys > 0 and rxs > 0 and rys > 0:
        win = arr[ry : ry + rys, rx : rx + rxs]
        # ReadRaster at (wxs, wys): RasterIO's default decimation is nearest
        resized = resample_nearest(win, wys, wxs)
        canvas[wy : wy + wys, wx : wx + wxs] = resized
    if qs == TILE:
        return canvas
    # scale_query_to_tile: canvas -> tile with the method's kernel
    return scale_to_tile(canvas, TILE, method)


def render_image_tiles(arr: np.ndarray, lon: float, lat: float,
                       gsd_m: float, method: str = "nearest",
                       zoom: int | None = None):
    """All base tiles of one image at its native zoom (or a given zoom).
    Yields (z, tx, ty, tile_array)."""
    h, w = arr.shape[0], arr.shape[1]
    z = native_zoom(gsd_m) if zoom is None else zoom
    bounds = image_bounds_3857(lon, lat, w, h, gsd_m)
    gt = geotransform_3857(lon, lat, w, h, gsd_m)
    tminx, tminy, tmaxx, tmaxy = tile_range(bounds, z)
    for ty in range(tminy, tmaxy + 1):
        for tx in range(tminx, tmaxx + 1):
            yield z, tx, ty, render_base_tile(arr, gt, tx, ty, z, method)


def overview_tile_from_children(children: dict, dtype=np.uint8, bands: int = 3
                                ) -> np.ndarray:
    """One overview tile from its <=4 children at z+1.

    ``children``: {(dx, dy_tms): 256² array} with dx = x&1, dy = y_tms&1.
    Equivalent to mosaicking a 512² canvas (TMS y: dy=1 is the
    northern/top half) and 2x2-average downsampling it
    (create_overview_tile semantics), but averaged PER OCCUPIED QUADRANT:
    2x2 blocks never straddle the quadrant boundary, so absent children
    contribute exact zeros without being averaged — most overview tiles
    have 1-2 children, making this ~3x less work than the full canvas."""
    from .resample import average_2x2

    half = TILE // 2
    shape = (TILE, TILE, bands) if bands > 1 else (TILE, TILE)
    out = np.zeros(shape, dtype=dtype)
    for (dx, dy), tile in children.items():
        row0 = 0 if dy == 1 else half  # northern child on top
        col0 = dx * half
        out[row0 : row0 + half, col0 : col0 + half] = average_2x2(
            np.asarray(tile, dtype=dtype))
    return out


def build_pyramid(arr, lon, lat, gsd_m, tminz: int, method: str = "nearest"):
    """Full per-image pyramid: base tiles at native zoom + overview levels
    down to ``tminz``. Returns {(z, tx, ty): array} — the reference's
    level-by-level reduction (z depends on z+1)."""
    tiles = {}
    base = list(render_image_tiles(arr, lon, lat, gsd_m, method))
    if not base:
        return tiles
    zmax = base[0][0]
    for z, tx, ty, t in base:
        tiles[(z, tx, ty)] = t
    for z in range(zmax, tminz, -1):
        level = [(k, v) for k, v in tiles.items() if k[0] == z]
        groups = {}
        for (zz, tx, ty), t in level:
            groups.setdefault((tx >> 1, ty >> 1), {})[(tx & 1, ty & 1)] = t
        for (px, py), children in groups.items():
            bands = 3 if next(iter(children.values())).ndim == 3 else 1
            tiles[(z - 1, px, py)] = overview_tile_from_children(
                children, bands=bands
            )
    return tiles
