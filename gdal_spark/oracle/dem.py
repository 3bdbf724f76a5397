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


# ---------------------------------------------------------------------------
# gdaldem algorithm variants (apps/gdaldem_lib.cpp): the ZevenbergenThorne
# gradient (z/2, 4-neighbor — GDALSlopeZevenbergenThorneAlg :1390) and the
# hillshade shading variants — combined (:1151), multidirectional (:1255,
# USGS OF 92-422 weights), Igor (:947). Formulas transcribed exactly from
# the reference in ITS sign conventions: x = west-east sums * 1/ew_res,
# y = south-north sums * 1/gt5 (gt5 = -ns_res), z folded as z/8 (Horn) or
# z/2 (ZT).
# ---------------------------------------------------------------------------


def _win(dem):
    p = _pad(dem)
    return [p[:-2, :-2], p[:-2, 1:-1], p[:-2, 2:],
            p[1:-1, :-2], p[1:-1, 1:-1], p[1:-1, 2:],
            p[2:, :-2], p[2:, 1:-1], p[2:, 2:]]


def _grad_ref(dem, ew_res, ns_res, alg):
    """(x, y, denom) in the reference's convention."""
    w = _win(dem)
    inv_ew = 1.0 / ew_res
    inv_ns = 1.0 / (-ns_res)  # geotransform gt5 is negative north-up
    if alg == "horn":
        x = ((w[0] + 2 * w[3] + w[6]) - (w[2] + 2 * w[5] + w[8])) * inv_ew
        y = ((w[6] + 2 * w[7] + w[8]) - (w[0] + 2 * w[1] + w[2])) * inv_ns
        return x, y, 8.0
    if alg == "zt":  # ZevenbergenThorne
        x = (w[3] - w[5]) * inv_ew
        y = (w[7] - w[1]) * inv_ns
        return x, y, 2.0
    raise ValueError(f"unknown gradient alg {alg!r}")


def slope_degrees_zt(dem, ew_res=1.0, ns_res=1.0, z_factor=1.0):
    """gdaldem slope -alg ZevenbergenThorne (:1390)."""
    x, y, denom = _grad_ref(dem, ew_res, ns_res, "zt")
    z = z_factor / denom
    return np.degrees(np.arctan(np.sqrt(x * x + y * y) * z))


def aspect_degrees_zt(dem, ew_res=1.0, ns_res=1.0):
    """gdaldem aspect -alg ZevenbergenThorne (:1482): azimuth convention,
    flat -> -9999."""
    w = _win(dem)
    dx = w[5] - w[3]
    dy = w[7] - w[1]
    asp = np.degrees(np.arctan2(dy, -dx))
    out = np.where(asp > 90.0, 450.0 - asp, 90.0 - asp)
    flat = (dx == 0) & (dy == 0)
    return np.where(flat, -9999.0, out % 360.0)


def hillshade_variant(dem, ew_res=1.0, ns_res=1.0, z_factor=1.0,
                      azimuth=315.0, altitude=45.0,
                      variant="regular", alg="horn"):
    """gdaldem hillshade with -alg Horn|ZevenbergenThorne and the
    -combined / -multidirectional / -igor shading variants; returns the
    1..255 byte scale (0 reserved for nodata)."""
    x, y, denom = _grad_ref(dem, ew_res, ns_res, alg)
    z = z_factor / denom
    sin_alt = np.sin(np.radians(altitude))
    cos_alt = np.cos(np.radians(altitude))
    az = np.radians(azimuth)
    xxyy = x * x + y * y

    if variant in ("regular", "combined"):
        num = sin_alt - (y * np.cos(az) * cos_alt * z
                         - x * np.sin(az) * cos_alt * z)
        cang = num / np.sqrt(1.0 + z * z * xxyy)
        if variant == "regular":
            c254 = 254.0 * cang
            out = np.where(c254 <= 0.0, 1.0, 1.0 + c254)
        else:  # combined shading (:1172)
            inv_half_pi_sq = 1.0 / ((np.pi * np.pi) / 4.0)
            c = 1.0 - (np.arccos(np.clip(cang, -1.0, 1.0))
                       * np.arctan(np.sqrt(z * z * xxyy)) * inv_half_pi_sq)
            out = np.where(c <= 0.0, 1.0, 1.0 + 254.0 * c)
        return np.clip(out, 1, 255).astype(np.uint8)

    if variant == "multidirectional":
        # USGS OF 92-422 weights (:1264-1276)
        cos225 = np.cos(np.radians(225.0))
        v225 = np.maximum(0.0, sin_alt + (x - y) * cos225 * cos_alt * z)
        v270 = np.maximum(0.0, sin_alt - x * cos_alt * z)
        v315 = np.maximum(0.0, sin_alt + (x + y) * cos225 * cos_alt * z)
        v360 = np.maximum(0.0, sin_alt - y * cos_alt * z)
        w225 = 0.5 * xxyy - x * y
        w270 = x * x
        w315 = xxyy - w225
        w360 = y * y
        with np.errstate(divide="ignore", invalid="ignore"):
            cang = ((w225 * v225 + w270 * v270 + w315 * v315 + w360 * v360)
                    / xxyy / np.sqrt(1.0 + z * z * xxyy))
        out = np.where(xxyy == 0.0, 1.0 + 254.0 * sin_alt,
                       1.0 + 254.0 * cang)
        return np.clip(out, 1, 255).astype(np.uint8)

    if variant == "igor":
        slope_deg = np.degrees(np.arctan(np.sqrt(xxyy) * z))
        # aspect from RAW sums, no res scaling (:983-1000)
        w = _win(dem)
        if alg == "horn":
            dx = ((w[2] + 2 * w[5] + w[8]) - (w[0] + 2 * w[3] + w[6]))
            dy = ((w[6] + 2 * w[7] + w[8]) - (w[0] + 2 * w[1] + w[2]))
        else:
            dx = w[5] - w[3]
            dy = w[7] - w[1]
        aspect = np.arctan2(dy, -dx)
        two_pi = 2.0 * np.pi
        target = np.pi * 1.5 - az
        diff = np.abs(np.mod(aspect, two_pi) - np.mod(target, two_pi))
        diff = np.where(diff > np.pi, two_pi - diff, diff)
        aspect_strength = 1.0 - diff / np.pi
        shadowness = 1.0 - (slope_deg / 90.0) * aspect_strength
        return np.clip(255.0 * shadowness, 0, 255).astype(np.uint8)

    raise ValueError(f"unknown hillshade variant {variant!r}")


# gdaldem color-relief / gdal raster color-map (apps/gdaldem_lib.cpp
# GDALColorReliefProcess; apps/gdalalg_raster_color_map.cpp reuses the
# same engine): the default 5-entry elevation ramp used by dem_metrics
# and the pipeline color-map step.
COLOR_RAMP_E = np.array([0.0, 64.0, 128.0, 192.0, 255.0])
COLOR_RAMP_RGB = np.array([
    [0, 0, 128], [0, 128, 255], [0, 255, 0],
    [255, 255, 0], [255, 255, 255],
], dtype=np.float64)


def color_relief_rgb(a, color_mode: str = "interpolate",
                     ramp_e=None, ramp_rgb=None):
    """(H, W) elevations -> (H, W, 3) uint8 colors, all three reference
    color-selection modes: piecewise-LINEAR ramp interpolation (default),
    -nearest_color_entry (closest entry unblended,
    COLOR_SELECTION_NEAREST_ENTRY), -exact_color_entry (exact match or
    transparent black, COLOR_SELECTION_EXACT_ENTRY)."""
    ramp_e = COLOR_RAMP_E if ramp_e is None else np.asarray(ramp_e, float)
    ramp_rgb = (COLOR_RAMP_RGB if ramp_rgb is None
                else np.asarray(ramp_rgb, float))
    a = np.asarray(a, dtype=np.float64)
    if color_mode == "interpolate":
        rgb = np.stack([
            np.interp(a, ramp_e, ramp_rgb[:, c]) for c in range(3)
        ], axis=2)
    elif color_mode == "nearest":
        idx = np.abs(a[..., None] - ramp_e[None, None, :]).argmin(axis=-1)
        rgb = ramp_rgb[idx]
    elif color_mode == "exact":
        idx = np.searchsorted(ramp_e, a)
        idx = np.clip(idx, 0, len(ramp_e) - 1)
        hit = ramp_e[idx] == a
        rgb = np.where(hit[..., None], ramp_rgb[idx], 0.0)
    else:
        raise ValueError(color_mode)
    return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)
