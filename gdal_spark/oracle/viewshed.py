"""Viewshed / line-of-sight — numpy clone of the reference's Wang et al.
reference-plane algorithm (/root/reference/alg/viewshed/viewshed_executor.cpp):

* heights are taken relative to the observer eye (DEM + observer_height at
  the observer cell);
* the minimum height required for visibility at each cell propagates
  outward from the observer: along the axes and diagonals via
  ``CalcHeightLine`` (Za * d / (d-1), viewshed_executor.cpp:61), elsewhere
  via the plane through the origin and the two predecessor cells —
  ``CalcHeightEdge`` ((Za*i + Zb*(j-i)) / (j-1), :94);
* a cell is visible iff its (relative) height + target_height clears the
  required height; the propagated value is max(height, required).

The reference sweeps whole rows outward from the observer (shallow cells
referencing the same row's previous column); this implementation uses the
octant symmetry instead — rows outward own the steep sectors (|dx| <= |dy|),
columns outward own the shallow ones — so every sweep depends only on the
previously-computed ring and vectorizes per row/column. Cell mode = Edge
(the reference default).

LOS (line of sight between two points) uses the same relative-height
marching along the discretized sight line.
"""

from __future__ import annotations

import numpy as np


def _sweep_rows(z, oy, ox, direction, target, req_out=None):
    """Propagate required heights over rows moving away from the observer
    (direction -1 = up / +1 = down). Fills visibility for the steep half
    (|dx| <= |dy|) including the axis and diagonals.  ``req_out`` (h, w)
    additionally collects the propagated minimum required RELATIVE height
    per covered cell (the dfZ of setOutputNormal) for the height-output
    modes."""
    h, w = z.shape
    vis = np.zeros((h, w), dtype=bool)
    A_prev = None
    rows = range(oy + direction, -1, -1) if direction < 0 else range(oy + direction, h)
    for y in rows:
        k = abs(y - oy)
        zrow = z[y]
        req = np.full(w, np.inf)
        dx = np.arange(w) - ox
        adx = np.abs(dx)
        if k == 1:
            # every cell of the first ring is visible (CalcHeightLine d==1)
            sel = adx <= k
            req[sel] = zrow[sel]
        else:
            # steep interior 0 < |dx| < k : plane through origin,
            # (prev toward observer) and (prev same column)
            sel = (adx > 0) & (adx < k)
            if sel.any():
                xs = np.nonzero(sel)[0]
                i = adx[xs]
                s = np.sign(dx[xs])
                za = A_prev[xs - s]   # dfLastPrev
                zb = A_prev[xs]       # dfLast
                req[xs] = (za * i + zb * (k - i)) / (k - 1)
            # axis dx == 0 and diagonals |dx| == k: CalcHeightLine
            if 0 <= ox < w:
                req[ox] = A_prev[ox] * k / (k - 1)
            for sgn in (-1, 1):
                xd = ox + sgn * k
                if 0 <= xd < w:
                    pred = xd - sgn
                    req[xd] = A_prev[pred] * k / (k - 1)
        sel = adx <= k
        vis[y, sel] = (zrow[sel] + target) >= req[sel]
        if req_out is not None:
            req_out[y, sel] = req[sel]
        A = np.where(np.isfinite(req), np.maximum(zrow, req), zrow)
        A_prev = A
    return vis


def viewshed(dem, oy: int, ox: int, observer_height: float = 2.0,
             target_height: float = 0.0, max_distance: float | None = None,
             curve_coeff: float = 0.0, semi_major: float = 6378137.0,
             cell_size: float = 1.0):
    """Visibility mask from an observer cell (Wang reference-plane method,
    Edge cell mode — alg/viewshed/viewshed_executor.cpp semantics).

    ``curve_coeff`` applies the reference's earth-curvature/refraction
    correction before propagation: every cell's height drops by
    curve_coeff / (2 * semi_major) * d^2 with d the georeferenced
    distance from the observer (viewshed_executor.cpp:403
    ``*pdfHeight -= m_dfHeightAdjFactor * dfR2 + m_dfZObserver``,
    calcHeightAdjFactor = curveCoeff / (2 * SemiMajor); the gdal_viewshed
    default coefficient is 0.85714 — 1 minus 1/7 refraction).
    ``max_distance`` marks cells beyond it out-of-range (= not visible in
    the emitted mask, the -md option's oOutOfRange masking)."""
    z = np.asarray(dem, dtype=np.float64)
    h0, w0 = z.shape
    d2 = None
    if curve_coeff or max_distance is not None:
        yy, xx = np.mgrid[0:h0, 0:w0]
        d2 = (((yy - oy) ** 2 + (xx - ox) ** 2).astype(np.float64)
              * cell_size * cell_size)
    if curve_coeff:
        z = z - curve_coeff / (2.0 * semi_major) * d2
    z = z - (z[oy, ox] + observer_height)
    h, w = z.shape
    vis = np.zeros((h, w), dtype=bool)
    vis[oy, ox] = True
    # steep sectors: rows outward
    vis |= _sweep_rows(z, oy, ox, -1, target_height)
    vis |= _sweep_rows(z, oy, ox, +1, target_height)
    # shallow sectors: columns outward == row sweep on the transpose
    vt = np.zeros((w, h), dtype=bool)
    zt = np.ascontiguousarray(z.T)
    vt |= _sweep_rows(zt, ox, oy, -1, target_height)
    vt |= _sweep_rows(zt, ox, oy, +1, target_height)
    vis |= vt.T
    # observer row/column at distance 1 handled by the ring-1 rule; farther
    # axis cells were covered by the sweeps (dx == 0 / transposed dx == 0)
    if max_distance is not None:
        vis &= d2 <= max_distance * max_distance
    return vis


def viewshed_heights(dem, oy: int, ox: int, observer_height: float = 2.0,
                     mode: str = "ground", max_distance: float | None = None,
                     curve_coeff: float = 0.0,
                     semi_major: float = 6378137.0, cell_size: float = 1.0,
                     out_of_range_val: float = -1.0):
    """Height-output viewshed modes (gdal_viewshed -om DEM|GROUND,
    viewshed_executor.cpp:378-418 setOutputNormal non-Normal branch:
    ``result += max(0, dfZ - cur)``):

    * ``mode='ground'``: additional height ABOVE GROUND a target at each
      cell needs to become visible (base 0);
    * ``mode='dem'``: minimum observable ABSOLUTE altitude — the
      PRE-adjustment DEM value plus the same deficit
      (viewshed_executor.cpp:316 ``lines.result = lines.cur``).

    The deficit ignores target_height (the reference applies the target
    only in the Normal visibility test). Cells beyond ``max_distance``
    get ``out_of_range_val``."""
    if mode not in ("ground", "dem"):
        raise ValueError(f"mode must be 'ground' or 'dem', got {mode}")
    raw = np.asarray(dem, dtype=np.float64)
    z = raw.copy()
    h0, w0 = z.shape
    d2 = None
    if curve_coeff or max_distance is not None:
        yy, xx = np.mgrid[0:h0, 0:w0]
        d2 = (((yy - oy) ** 2 + (xx - ox) ** 2).astype(np.float64)
              * cell_size * cell_size)
    if curve_coeff:
        z = z - curve_coeff / (2.0 * semi_major) * d2
    z = z - (z[oy, ox] + observer_height)
    req = np.full(z.shape, -np.inf)
    _sweep_rows(z, oy, ox, -1, 0.0, req_out=req)
    _sweep_rows(z, oy, ox, +1, 0.0, req_out=req)
    reqt = np.full((w0, h0), -np.inf)
    zt = np.ascontiguousarray(z.T)
    _sweep_rows(zt, ox, oy, -1, 0.0, req_out=reqt)
    _sweep_rows(zt, ox, oy, +1, 0.0, req_out=reqt)
    req = np.maximum(req, reqt.T)
    req[oy, ox] = z[oy, ox]
    deficit = np.maximum(req - z, 0.0)
    deficit[~np.isfinite(deficit)] = 0.0
    out = deficit if mode == "ground" else raw + deficit
    if max_distance is not None:
        out = np.where(d2 <= max_distance * max_distance, out,
                       out_of_range_val)
    return out


def line_of_sight(dem, y0: int, x0: int, y1: int, x1: int,
                  observer_height: float = 2.0,
                  target_height: float = 0.0) -> bool:
    """LOS between two cells: march the discretized sight line, tracking
    the max blocking angle (alg/los.cpp semantics, unit-step sampling with
    bilinear terrain interpolation)."""
    z = np.asarray(dem, dtype=np.float64)
    z0 = z[y0, x0] + observer_height
    d = float(np.hypot(y1 - y0, x1 - x0))
    if d == 0:
        return True
    n = max(2, int(np.ceil(d)))
    t = np.linspace(0.0, 1.0, n + 1)[1:-1]
    xs = x0 + t * (x1 - x0)
    ys = y0 + t * (y1 - y0)
    terr = _bilinear(z, ys, xs)
    sight = z0 + t * ((z[y1, x1] + target_height) - z0)
    return bool((terr <= sight + 1e-9).all())


def _bilinear(z, ys, xs):
    h, w = z.shape
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    fx = np.clip(xs - x0, 0, 1)
    fy = np.clip(ys - y0, 0, 1)
    return (z[y0, x0] * (1 - fx) * (1 - fy) + z[y0, x1] * fx * (1 - fy)
            + z[y1, x0] * (1 - fx) * fy + z[y1, x1] * fx * fy)


def viewshed_bruteforce(dem, oy, ox, observer_height=2.0, target_height=0.0):
    """Exact unit-step ray-marching oracle (test twin): a cell is visible
    iff no interpolated terrain sample along its sight line rises above the
    observer->cell sight line."""
    z = np.asarray(dem, dtype=np.float64)
    h, w = z.shape
    out = np.zeros((h, w), dtype=bool)
    for y in range(h):
        for x in range(w):
            out[y, x] = line_of_sight(z, oy, ox, y, x,
                                      observer_height, target_height)
    return out
