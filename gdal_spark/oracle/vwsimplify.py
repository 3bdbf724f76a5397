"""Visvalingam-Whyatt polyline simplification for coverage arcs.

The reference's ``gdal vector simplify-coverage``
(apps/gdalalg_vector_simplify_coverage.cpp) delegates to
GEOSCoverageSimplifyVW(coll, tolerance, preserveBoundary): the coverage's
shared boundary arcs are simplified with the Visvalingam-Whyatt criterion
(drop the vertex spanning the smallest effective triangle area while that
area is below tolerance^2), with arc endpoints (coverage nodes) pinned so
both neighbours keep an identical shared border and the coverage stays
valid.  This module is the arc-level kernel; the distributed arc
decomposition/reassembly lives in operators/layer_algebra.py.
"""

from __future__ import annotations

import numpy as np


def _tri_areas(pts: np.ndarray) -> np.ndarray:
    """Effective (triangle) area of each interior vertex of an open
    polyline: 0.5 * |cross(prev->v, prev->next)|."""
    a, b, c = pts[:-2], pts[1:-1], pts[2:]
    return 0.5 * np.abs(
        (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
        - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0]))


def vw_simplify(pts: np.ndarray, tolerance: float,
                closed: bool = False) -> np.ndarray:
    """Simplify one arc with Visvalingam-Whyatt.

    ``pts``: (n, 2) float64 vertex run.  Open arcs keep both endpoints
    (coverage nodes).  ``closed`` arcs (first == last vertex, a ring with
    no junction) keep at least 3 distinct vertices so the ring cannot
    collapse (the GEOS ring guard).

    Deterministic: on ties the LOWEST index is removed first.  Removal
    criterion: effective area < tolerance^2 (the GEOS CoverageSimplifier
    distance-tolerance-to-area convention).
    """
    p = np.asarray(pts, dtype=np.float64)
    if tolerance <= 0.0 or len(p) < 3:
        return p
    tol2 = float(tolerance) * float(tolerance)
    keep = np.ones(len(p), dtype=bool)
    min_keep = 4 if closed else 2  # closed: 3 distinct + closure

    while True:
        idx = np.nonzero(keep)[0]
        if len(idx) <= min_keep:
            break
        cur = p[idx]
        # For closed arcs the start/end vertex is pinned as a
        # deterministic anchor (the arc-decomposition convention that a
        # closed arc's start is its node), so interior candidates are the
        # same slice as for open arcs.
        areas = _tri_areas(cur)
        if len(areas) == 0:
            break
        k = int(np.argmin(areas))
        if areas[k] >= tol2:
            break
        keep[idx[k + 1]] = False
    return p[keep]
