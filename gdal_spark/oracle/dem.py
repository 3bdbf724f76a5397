"""DEM derivatives — numpy kernels with the reference's math.

``gdaldem`` computes hillshade/slope/aspect/TRI/TPI/roughness as 3x3
neighborhood kernels (/root/reference/apps/gdaldem_lib.cpp:317-328
``GDALGeneric3x3Processing``); slope/hillshade use Horn's formula
(GDALHillshade*Alg in the same file). Edges here use replicate padding
(the reference computes edge cells with a folded window — equivalent for
replicated borders on the axes we fold).
"""

from __future__ import annotations

import numpy as np


def _pad(a):
    return np.pad(np.asarray(a, dtype=np.float64), 1, mode="edge")


def _horn_gradients(dem, ew_res=1.0, ns_res=1.0, z_factor=1.0):
    p = _pad(dem) * z_factor
    a = p[:-2, :-2]; b = p[:-2, 1:-1]; c = p[:-2, 2:]
    d = p[1:-1, :-2];                  f = p[1:-1, 2:]
    g = p[2:, :-2];  h = p[2:, 1:-1];  i = p[2:, 2:]
    dzdx = ((c + 2 * f + i) - (a + 2 * d + g)) / (8.0 * ew_res)
    dzdy = ((g + 2 * h + i) - (a + 2 * b + c)) / (8.0 * ns_res)
    return dzdx, dzdy


def slope_degrees(dem, ew_res=1.0, ns_res=1.0, z_factor=1.0):
    dzdx, dzdy = _horn_gradients(dem, ew_res, ns_res, z_factor)
    return np.degrees(np.arctan(np.sqrt(dzdx**2 + dzdy**2)))


def aspect_degrees(dem, ew_res=1.0, ns_res=1.0):
    """Azimuth the slope faces, degrees clockwise from north; flat -> -9999
    (gdaldem aspect nodata convention for flat cells)."""
    dzdx, dzdy = _horn_gradients(dem, ew_res, ns_res)
    asp = np.degrees(np.arctan2(dzdy, -dzdx))
    out = np.where(
        asp > 90.0, 450.0 - asp, 90.0 - asp
    )
    flat = (dzdx == 0) & (dzdy == 0)
    return np.where(flat, -9999.0, out % 360.0)


def hillshade(dem, ew_res=1.0, ns_res=1.0, z_factor=1.0,
              azimuth=315.0, altitude=45.0):
    """Horn hillshade, uint8 1..255 like gdaldem (0 reserved for nodata)."""
    dzdx, dzdy = _horn_gradients(dem, ew_res, ns_res, z_factor)
    az = np.radians(360.0 - azimuth + 90.0)
    alt = np.radians(altitude)
    slope = np.arctan(np.sqrt(dzdx**2 + dzdy**2))
    aspect = np.arctan2(dzdy, -dzdx)
    shade = np.sin(alt) * np.cos(slope) + np.cos(alt) * np.sin(slope) * np.cos(
        az - aspect
    )
    return np.clip(1.0 + 254.0 * np.clip(shade, 0, None), 1, 255).astype(np.uint8)


def tri(dem):
    """Terrain ruggedness: mean |center - neighbor| over the 8 neighbors
    (Wilson/Riley variant used by gdaldem TRI)."""
    p = _pad(dem)
    center = p[1:-1, 1:-1]
    acc = np.zeros_like(center)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            acc += np.abs(p[1 + dy : p.shape[0] - 1 + dy,
                            1 + dx : p.shape[1] - 1 + dx] - center)
    return acc / 8.0


def tpi(dem):
    """Topographic position: center minus mean of the 8 neighbors."""
    p = _pad(dem)
    center = p[1:-1, 1:-1]
    acc = np.zeros_like(center)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            acc += p[1 + dy : p.shape[0] - 1 + dy, 1 + dx : p.shape[1] - 1 + dx]
    return center - acc / 8.0


def roughness(dem):
    """Max - min over the 3x3 window."""
    p = _pad(dem)
    stack = [
        p[1 + dy : p.shape[0] - 1 + dy, 1 + dx : p.shape[1] - 1 + dx]
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
    ]
    s = np.stack(stack)
    return s.max(axis=0) - s.min(axis=0)
