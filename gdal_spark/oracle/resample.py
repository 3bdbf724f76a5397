"""Resampling kernels + source-window math — pure-numpy clones of the
reference semantics used by the tiling path.

* ``geo_query``: gdal2tiles' source-window computation with its exact
  ``+0.001`` / ``+0.5`` rounding and out-of-bounds adjustment
  (/root/reference/swig/python/gdal-utils/osgeo_utils/gdal2tiles.py:2968-3010).
* nearest: warp-kernel convention — sample the source cell containing the
  destination pixel center (alg/gdalwarpkernel.cpp:6399-6404: floor of the
  center-mapped coordinate).
* bilinear: 4-neighbor weighted sample in pixel-center space with edge clamp
  (alg/gdalwarpkernel.cpp:3106 GWKBilinearResample semantics).
* average 2x2: overview downsample used for pyramid levels
  (gcore/overview.cpp:1980 AverageOrRMS integer path: mean of the 2x2 block,
  rounded half-up for integer types; gdal2tiles create_overview_tile
  gdal2tiles.py:1466-1530).
"""

from __future__ import annotations

import numpy as np


def geo_query(geotransform, raster_x_size, raster_y_size, ulx, uly, lrx, lry,
              querysize=0):
    """Return ``(rx, ry, rxsize, rysize), (wx, wy, wxsize, wysize)``.

    ``geotransform`` is the 6-coefficient affine (gt[5] negative for
    north-up). Exact integer semantics of gdal2tiles.py:2968-3010 including
    the epsilon/rounding constants and the proportional window shrink at the
    raster edges.
    """
    gt = geotransform
    rx = int((ulx - gt[0]) / gt[1] + 0.001)
    ry = int((uly - gt[3]) / gt[5] + 0.001)
    rxsize = max(1, int((lrx - ulx) / gt[1] + 0.5))
    rysize = max(1, int((lry - uly) / gt[5] + 0.5))

    if not querysize:
        wxsize, wysize = rxsize, rysize
    else:
        wxsize, wysize = querysize, querysize

    wx = 0
    if rx < 0:
        rxshift = abs(rx)
        wx = int(wxsize * (float(rxshift) / rxsize))
        wxsize = wxsize - wx
        rxsize = rxsize - int(rxsize * (float(rxshift) / rxsize))
        rx = 0
    if rx + rxsize > raster_x_size:
        wxsize = int(wxsize * (float(raster_x_size - rx) / rxsize))
        rxsize = raster_x_size - rx

    wy = 0
    if ry < 0:
        ryshift = abs(ry)
        wy = int(wysize * (float(ryshift) / rysize))
        wysize = wysize - wy
        rysize = rysize - int(rysize * (float(ryshift) / rysize))
        ry = 0
    if ry + rysize > raster_y_size:
        wysize = int(wysize * (float(raster_y_size - ry) / rysize))
        rysize = raster_y_size - ry

    return (rx, ry, rxsize, rysize), (wx, wy, wxsize, wysize)


def _center_coords(out_n, src_n):
    """Destination pixel centers mapped into source pixel coordinates
    (pixel-center convention: dst center (d+0.5) -> src coord
    (d+0.5)*src/out)."""
    return (np.arange(out_n, dtype=np.float64) + 0.5) * (src_n / float(out_n))


def resample_nearest(src, out_h, out_w):
    """Nearest-neighbor resize of an (H, W[, C]) array: pick the source cell
    containing each destination pixel center (floor of the center-mapped
    coordinate, clamped to the source grid)."""
    src = np.asarray(src)
    h, w = src.shape[0], src.shape[1]
    sy = np.clip(np.floor(_center_coords(out_h, h)).astype(np.int64), 0, h - 1)
    sx = np.clip(np.floor(_center_coords(out_w, w)).astype(np.int64), 0, w - 1)
    return src[np.ix_(sy, sx)]


def resample_bilinear(src, out_h, out_w):
    """Bilinear resize of an (H, W[, C]) array, pixel-center convention with
    edge clamp; float64 accumulation, rounded half-up back to the input dtype
    for integer inputs (GDALCopyWords float->int behavior:
    alg/gdalchecksum.cpp IntFromDouble / gcore rounding)."""
    src = np.asarray(src)
    h, w = src.shape[0], src.shape[1]
    fy = _center_coords(out_h, h) - 0.5
    fx = _center_coords(out_w, w) - 0.5
    y0 = np.clip(np.floor(fy).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(fx).astype(np.int64), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(fy - y0, 0.0, 1.0)
    wx = np.clip(fx - x0, 0.0, 1.0)

    a = src[np.ix_(y0, x0)].astype(np.float64)
    b = src[np.ix_(y0, x1)].astype(np.float64)
    c = src[np.ix_(y1, x0)].astype(np.float64)
    d = src[np.ix_(y1, x1)].astype(np.float64)

    if src.ndim == 3:
        wy_ = wy[:, None, None]
        wx_ = wx[None, :, None]
    else:
        wy_ = wy[:, None]
        wx_ = wx[None, :]

    top = a * (1 - wx_) + b * wx_
    bot = c * (1 - wx_) + d * wx_
    out = top * (1 - wy_) + bot * wy_

    if np.issubdtype(src.dtype, np.integer):
        info = np.iinfo(src.dtype)
        return np.clip(np.floor(out + 0.5), info.min, info.max).astype(src.dtype)
    return out.astype(src.dtype)


def average_2x2(src):
    """2x2 block-average downsample (H, W[, C]) -> (H//2, W//2[, C]).
    Requires even H and W. Integer inputs round half-up like the reference's
    integer average overview (gcore/overview.cpp:1980 region)."""
    src = np.asarray(src)
    h, w = src.shape[0] & ~1, src.shape[1] & ~1
    s = src[:h, :w]
    if s.ndim == 3:
        acc = s.reshape(h // 2, 2, w // 2, 2, s.shape[2]).astype(np.float64).mean(axis=(1, 3))
    else:
        acc = s.reshape(h // 2, 2, w // 2, 2).astype(np.float64).mean(axis=(1, 3))
    if np.issubdtype(src.dtype, np.integer):
        info = np.iinfo(src.dtype)
        return np.clip(np.floor(acc + 0.5), info.min, info.max).astype(src.dtype)
    return acc.astype(src.dtype)


def scale_to_tile(window, tile_size=256, method="nearest"):
    """Resize an extracted source window to a tile_size² tile —
    the role of gdal2tiles' ``scale_query_to_tile`` (gdal2tiles.py:838-932)
    restricted to the v0 kernels."""
    if method == "nearest":
        return resample_nearest(window, tile_size, tile_size)
    if method == "bilinear":
        return resample_bilinear(window, tile_size, tile_size)
    raise ValueError(f"unsupported resampling {method!r}")


def psnr(a, b, peak=255.0):
    """Peak signal-to-noise ratio in dB (inf for identical arrays)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)
