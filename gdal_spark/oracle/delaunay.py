"""Delaunay triangulation (Bowyer-Watson) + barycentric TIN interpolation —
numpy, no scipy/qhull in this container.

Backs the ``gdalgrid linear`` algorithm (/root/reference/alg/gdalgrid.cpp
GDALGridLinear: find the Delaunay triangle containing each grid node and
interpolate barycentrically; the reference links qhull the same way GEOS
is linked for geometry — this is the from-scratch equivalent) and the
OGRGeometry::DelaunayTriangulation surface (ogr/ogr_geometry.h:604).

Incremental Bowyer-Watson with a vectorized circumcircle test per
insertion: O(n * T) numpy work, fine for the broadcastable point sets the
TIN path targets (the scatter+combine IDW/average paths remain the
unbounded-scale algorithms).
"""

from __future__ import annotations

import numpy as np


def triangulate(points: np.ndarray) -> np.ndarray:
    """(N,2) points -> (T,3) int triangle vertex indices (Delaunay).
    Duplicate points must be removed by the caller."""
    pts = np.asarray(points, dtype=np.float64)
    n = pts.shape[0]
    if n < 3:
        return np.empty((0, 3), dtype=np.int64)
    # super-triangle comfortably containing everything
    cx, cy = pts[:, 0].mean(), pts[:, 1].mean()
    span = max(np.ptp(pts[:, 0]), np.ptp(pts[:, 1]), 1e-9) * 100.0
    sup = np.array([
        [cx - 2 * span, cy - span],
        [cx + 2 * span, cy - span],
        [cx, cy + 2 * span],
    ])
    allp = np.vstack([pts, sup])
    si = np.array([n, n + 1, n + 2])
    tris = [tuple(si)]

    def circum(tri_arr):
        """Circumcenters + squared radii for an (T,3) index array."""
        a = allp[tri_arr[:, 0]]
        b = allp[tri_arr[:, 1]]
        c = allp[tri_arr[:, 2]]
        d = 2.0 * (a[:, 0] * (b[:, 1] - c[:, 1]) + b[:, 0] * (c[:, 1] - a[:, 1])
                   + c[:, 0] * (a[:, 1] - b[:, 1]))
        d = np.where(np.abs(d) < 1e-30, 1e-30, d)
        a2 = (a ** 2).sum(1)
        b2 = (b ** 2).sum(1)
        c2 = (c ** 2).sum(1)
        ux = (a2 * (b[:, 1] - c[:, 1]) + b2 * (c[:, 1] - a[:, 1])
              + c2 * (a[:, 1] - b[:, 1])) / d
        uy = (a2 * (c[:, 0] - b[:, 0]) + b2 * (a[:, 0] - c[:, 0])
              + c2 * (b[:, 0] - a[:, 0])) / d
        r2 = (ux - a[:, 0]) ** 2 + (uy - a[:, 1]) ** 2
        return ux, uy, r2

    tri_arr = np.array(tris, dtype=np.int64)
    ux, uy, r2 = circum(tri_arr)

    for ip in range(n):
        p = allp[ip]
        bad = ((p[0] - ux) ** 2 + (p[1] - uy) ** 2) <= r2 * (1 + 1e-12)
        bad_tris = tri_arr[bad]
        # boundary polygon of the bad-triangle cavity: edges seen once
        edge_count: dict = {}
        for t in bad_tris:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                k = (min(e), max(e))
                edge_count[k] = edge_count.get(k, 0) + 1
        boundary = [e for e, cnt in edge_count.items() if cnt == 1]
        keep = tri_arr[~bad]
        new = np.array([[e[0], e[1], ip] for e in boundary], dtype=np.int64)
        tri_arr = np.vstack([keep, new]) if new.size else keep
        ux, uy, r2 = circum(tri_arr)

    # drop triangles touching the super-triangle
    mask = (tri_arr < n).all(axis=1)
    return tri_arr[mask]


def tin_interpolate(points: np.ndarray, values: np.ndarray,
                    qx: np.ndarray, qy: np.ndarray,
                    tris: np.ndarray | None = None):
    """Barycentric interpolation of (qx, qy) over the Delaunay TIN.
    Returns (values, inside_mask); queries outside the hull get NaN
    (GDALGridLinear's nodata behavior for radius=0). Pass precomputed
    ``tris`` when interpolating many batches over one triangulation."""
    pts = np.asarray(points, dtype=np.float64)
    vals = np.asarray(values, dtype=np.float64)
    if tris is None:
        tris = triangulate(pts)
    qx = np.asarray(qx, dtype=np.float64)
    qy = np.asarray(qy, dtype=np.float64)
    out = np.full(qx.shape, np.nan)
    if tris.shape[0] == 0:
        return out, np.zeros(qx.shape, dtype=bool)
    a = pts[tris[:, 0]]
    b = pts[tris[:, 1]]
    c = pts[tris[:, 2]]
    det = ((b[:, 1] - c[:, 1]) * (a[:, 0] - c[:, 0])
           + (c[:, 0] - b[:, 0]) * (a[:, 1] - c[:, 1]))
    det = np.where(np.abs(det) < 1e-30, 1e-30, det)
    done = np.zeros(qx.shape, dtype=bool)
    # per-triangle vectorized containment over the remaining queries
    for t in range(tris.shape[0]):
        rem = ~done
        if not rem.any():
            break
        x = qx[rem]
        y = qy[rem]
        l1 = ((b[t, 1] - c[t, 1]) * (x - c[t, 0])
              + (c[t, 0] - b[t, 0]) * (y - c[t, 1])) / det[t]
        l2 = ((c[t, 1] - a[t, 1]) * (x - c[t, 0])
              + (a[t, 0] - c[t, 0]) * (y - c[t, 1])) / det[t]
        l3 = 1.0 - l1 - l2
        inside = (l1 >= -1e-9) & (l2 >= -1e-9) & (l3 >= -1e-9)
        if not inside.any():
            continue
        idx = np.nonzero(rem)[0][inside]
        v = (l1[inside] * vals[tris[t, 0]] + l2[inside] * vals[tris[t, 1]]
             + l3[inside] * vals[tris[t, 2]])
        out.flat[idx] = v
        done.flat[idx] = True
    return out, done
