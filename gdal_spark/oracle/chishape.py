"""Concave hull via the chi-shape algorithm (Duckham, Kulik, Worboys &
Galton 2008, "Efficient generation of simple polygons for characterizing
the shape of a set of points in the plane", Pattern Recognition 41 —
public algorithm; the role of ``gdal vector concave-hull`` /
GEOS ConcaveHull, whose exact edge-selection variant lives inside GEOS
and is out of env reach).

Shape: Delaunay triangulation (the engine's own Bowyer-Watson), then
repeatedly remove the longest boundary edge while (a) the edge is longer
than the target length and (b) removal keeps the boundary a simple
polygon (the chi regularity condition: the vertex exposed by the removal
must not already lie on the boundary). ``ratio`` in [0, 1] maps the
target as min + ratio * (max - min) over all triangulation edge lengths
(ratio 1 = convex hull, lower = tighter)."""

from __future__ import annotations

import numpy as np

from .delaunay import triangulate


def _edge(a: int, b: int) -> tuple:
    return (a, b) if a < b else (b, a)


def concave_hull(points: np.ndarray, ratio: float = 0.3) -> np.ndarray:
    """(N,2) points -> (M,2) closed ring (first == last), CCW."""
    pts = np.asarray(points, dtype=np.float64)
    if len(pts) < 3:
        raise ValueError("need >= 3 points")
    tris = {tuple(sorted(t)) for t in triangulate(pts)}

    def length(e):
        return float(np.hypot(*(pts[e[0]] - pts[e[1]])))

    all_edges = {e for t in tris for e in
                 (_edge(t[0], t[1]), _edge(t[1], t[2]), _edge(t[0], t[2]))}
    lens = sorted(length(e) for e in all_edges)
    target = lens[0] + ratio * (lens[-1] - lens[0])

    def edge_tris():
        m: dict = {}
        for t in tris:
            for e in (_edge(t[0], t[1]), _edge(t[1], t[2]),
                      _edge(t[0], t[2])):
                m.setdefault(e, []).append(t)
        return m

    e2t = edge_tris()
    # iterative erosion: longest boundary edge first
    changed = True
    while changed:
        changed = False
        boundary = [e for e, ts in e2t.items() if len(ts) == 1]
        bverts = {v for e in boundary for v in e}
        for e in sorted(boundary, key=length, reverse=True):
            if length(e) <= target:
                break
            ts = e2t.get(e)
            if not ts or len(ts) != 1:
                continue
            t = ts[0]
            apex = next(v for v in t if v not in e)
            if apex in bverts:
                continue  # regularity: would pinch the boundary
            tris.discard(t)
            e2t = edge_tris()
            changed = True
            break
    # trace the boundary ring
    boundary = [e for e, ts in e2t.items() if len(ts) == 1]
    adj: dict = {}
    for a, b in boundary:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    start = boundary[0][0]
    ring = [start]
    prev, cur = None, start
    while True:
        nxts = [v for v in adj[cur] if v != prev]
        nxt = nxts[0]
        if nxt == start:
            break
        ring.append(nxt)
        prev, cur = cur, nxt
    coords = pts[ring]
    # enforce CCW
    area2 = float(np.sum(coords[:, 0] * np.roll(coords[:, 1], -1)
                         - np.roll(coords[:, 0], -1) * coords[:, 1]))
    if area2 < 0:
        coords = coords[::-1]
    return np.vstack([coords, coords[:1]])
