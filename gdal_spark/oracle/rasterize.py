"""Vector -> raster burn + raster connected-component ops, numpy kernels.

* scanline polygon fill, even-odd rule, pixel-center sampling — semantics of
  ``GDALRasterizeGeometries`` (/root/reference/alg/gdalrasterize.cpp:999)
  with the inner loop of ``llrasterize.cpp:29-38`` (dmax/dmin scanline
  crossings at y = row + 0.5, fill [ceil(x0-0.5), floor(x1-0.5)]).
* connected-component labeling (4-connectivity, equal pixel value) — the
  core of ``GDALPolygonize`` (/root/reference/alg/polygonize.cpp) and
  ``GDALSieveFilter`` (alg/gdalsievefilter.cpp); two-pass union-find.
* proximity — two-pass chamfer distance transform approximating
  ``GDALComputeProximity`` (alg/gdalproximity.cpp).
"""

from __future__ import annotations

import numpy as np


def rasterize_polygon(ring_xy, gt, w: int, h: int, burn: float = 1.0,
                      out=None, add: bool = False):
    """Burn one polygon into a (h, w) array. Pixel (r, c) is burned when its
    center (gt-transformed col+0.5, row+0.5) lies inside by the even-odd
    rule — the reference's scanline crossing fill."""
    if out is None:
        out = np.zeros((h, w), dtype=np.float64)
    ring = np.asarray(ring_xy, dtype=np.float64)
    # to pixel space (gt: north-up affine)
    px = (ring[:, 0] - gt[0]) / gt[1]
    py = (ring[:, 1] - gt[3]) / gt[5]
    ys = np.arange(h) + 0.5
    x1, y1 = px[:-1], py[:-1]
    x2, y2 = px[1:], py[1:]
    for r, yc in enumerate(ys):
        # segments straddling the scanline
        m = ((y1 <= yc) & (y2 > yc)) | ((y2 <= yc) & (y1 > yc))
        if not m.any():
            continue
        xi = x1[m] + (yc - y1[m]) / (y2[m] - y1[m]) * (x2[m] - x1[m])
        xi.sort()
        for i in range(0, len(xi) - 1, 2):
            c0 = int(np.ceil(xi[i] - 0.5))
            c1 = int(np.floor(xi[i + 1] - 0.5))
            c0 = max(c0, 0)
            c1 = min(c1, w - 1)
            if c1 >= c0:
                if add:
                    out[r, c0 : c1 + 1] += burn
                else:
                    out[r, c0 : c1 + 1] = burn
    return out


def rasterize_rings(rings_xy, gt, w: int, h: int, burn: float = 1.0,
                    out=None, add: bool = False, all_touched: bool = False,
                    rings_z=None):
    """Burn one (multi-ring) polygon with the gdal_rasterize option set
    (alg/gdalrasterize.cpp:796-811, 999):

    * even-odd fill across ALL rings together (holes un-burned, exactly
      GDALdllImageFilledPolygon's combined crossing list);
    * ``all_touched``: additionally burn every pixel the ring boundary
      passes through (GDALdllImageLineAllTouched) via Amanatides-Woo
      cell traversal;
    * ``rings_z``: BURN_VALUE_FROM=Z — per-span burn value interpolated
      from vertex Z at the span's left crossing (the dfVariant passed to
      gvBurnScanlineBasic, llrasterize.cpp);
    * ``add``: accumulate instead of replace (GRIO_ADD)."""
    if out is None:
        out = np.zeros((h, w), dtype=np.float64)
    segs = []  # (x1, y1, x2, y2, z1, z2) in pixel space
    for ri, ring in enumerate(rings_xy):
        r = np.asarray(ring, dtype=np.float64)
        px = (r[:, 0] - gt[0]) / gt[1]
        py = (r[:, 1] - gt[3]) / gt[5]
        if rings_z is not None:
            z = np.asarray(rings_z[ri], dtype=np.float64)
        else:
            z = np.full(len(px), burn)
        segs.append(np.stack(
            [px[:-1], py[:-1], px[1:], py[1:], z[:-1], z[1:]], axis=1))
    S = np.concatenate(segs, axis=0)
    x1, y1, x2, y2, z1, z2 = S.T

    for r_i in range(h):
        yc = r_i + 0.5
        m = ((y1 <= yc) & (y2 > yc)) | ((y2 <= yc) & (y1 > yc))
        if not m.any():
            continue
        t = (yc - y1[m]) / (y2[m] - y1[m])
        xi = x1[m] + t * (x2[m] - x1[m])
        zi = z1[m] + t * (z2[m] - z1[m])
        order = np.argsort(xi, kind="stable")
        xi, zi = xi[order], zi[order]
        for i in range(0, len(xi) - 1, 2):
            c0 = max(int(np.ceil(xi[i] - 0.5)), 0)
            c1 = min(int(np.floor(xi[i + 1] - 0.5)), w - 1)
            if c1 >= c0:
                v = zi[i] if rings_z is not None else burn
                if add:
                    out[r_i, c0 : c1 + 1] += v
                else:
                    out[r_i, c0 : c1 + 1] = v

    if all_touched:
        for k in range(S.shape[0]):
            sx1, sy1, sx2, sy2, sz1, _sz2 = S[k]
            v = sz1 if rings_z is not None else burn
            for cy, cx in _traverse_cells(sx1, sy1, sx2, sy2):
                if 0 <= cy < h and 0 <= cx < w:
                    if add:
                        out[cy, cx] += v
                    else:
                        out[cy, cx] = v
    return out


def _traverse_cells(x1, y1, x2, y2):
    """Amanatides-Woo: every grid cell a segment passes through (pixel
    space, cell (r, c) spans [c, c+1) x [r, r+1)) — the ALL_TOUCHED line
    semantics of GDALdllImageLineAllTouched (alg/llrasterize.cpp)."""
    cx, cy = int(np.floor(x1)), int(np.floor(y1))
    ex, ey = int(np.floor(x2)), int(np.floor(y2))
    cells = [(cy, cx)]
    dx, dy = x2 - x1, y2 - y1
    sx = 1 if dx > 0 else -1
    sy = 1 if dy > 0 else -1
    tdx = abs(1.0 / dx) if dx != 0 else np.inf
    tdy = abs(1.0 / dy) if dy != 0 else np.inf
    if dx > 0:
        tmx = (np.floor(x1) + 1 - x1) * tdx
    else:
        tmx = (x1 - np.floor(x1)) * tdx
    if dy > 0:
        tmy = (np.floor(y1) + 1 - y1) * tdy
    else:
        tmy = (y1 - np.floor(y1)) * tdy
    guard = 0
    while (cx != ex or cy != ey) and guard < 100000:
        guard += 1
        if tmx < tmy:
            tmx += tdx
            cx += sx
        else:
            tmy += tdy
            cy += sy
        cells.append((cy, cx))
    return cells


def rasterize_points(xs, ys, gt, w: int, h: int, burn: float = 1.0,
                     add: bool = True):
    """Burn points (pixel containing each point; add mode accumulates —
    the gdal_rasterize point path / gdalgrid count metric)."""
    out = np.zeros((h, w), dtype=np.float64)
    cx = np.floor((np.asarray(xs, dtype=np.float64) - gt[0]) / gt[1]).astype(int)
    cy = np.floor((np.asarray(ys, dtype=np.float64) - gt[3]) / gt[5]).astype(int)
    ok = (cx >= 0) & (cx < w) & (cy >= 0) & (cy < h)
    if add:
        np.add.at(out, (cy[ok], cx[ok]), burn)
    else:
        out[cy[ok], cx[ok]] = burn
    return out


def label_components(band, connectivity: int = 4):
    """Connected components of equal pixel value (4- or 8-connected, the
    GDALRasterPolygonEnumerator ``nConnectedness`` option —
    alg/polygonize.cpp:87 ``8CONNECTED``). Returns (labels int32 starting
    at 1, renumbered in first-appearance row-major order, n) — vectorized
    iterative min-label propagation (converges in O(component geodesic
    diameter) full-array passes), the GDALPolygonize enumeration core
    without per-pixel Python."""
    if connectivity not in (4, 8):
        raise ValueError(f"connectivity must be 4 or 8, got {connectivity}")
    a = np.asarray(band)
    h, w = a.shape
    lab = np.arange(h * w, dtype=np.int64).reshape(h, w)
    vsame = a[1:, :] == a[:-1, :]
    hsame = a[:, 1:] == a[:, :-1]
    if connectivity == 8:
        d1same = a[1:, 1:] == a[:-1, :-1]   # ↘ diagonal
        d2same = a[1:, :-1] == a[:-1, 1:]   # ↙ diagonal
    while True:
        new = lab.copy()
        np.minimum(new[1:, :], np.where(vsame, lab[:-1, :], lab[1:, :]),
                   out=new[1:, :])
        np.minimum(new[:-1, :], np.where(vsame, new[1:, :], lab[:-1, :]),
                   out=new[:-1, :])
        np.minimum(new[:, 1:], np.where(hsame, new[:, :-1], new[:, 1:]),
                   out=new[:, 1:])
        np.minimum(new[:, :-1], np.where(hsame, new[:, 1:], new[:, :-1]),
                   out=new[:, :-1])
        if connectivity == 8:
            np.minimum(new[1:, 1:], np.where(d1same, new[:-1, :-1],
                                             new[1:, 1:]), out=new[1:, 1:])
            np.minimum(new[:-1, :-1], np.where(d1same, new[1:, 1:],
                                               new[:-1, :-1]),
                       out=new[:-1, :-1])
            np.minimum(new[1:, :-1], np.where(d2same, new[:-1, 1:],
                                              new[1:, :-1]),
                       out=new[1:, :-1])
            np.minimum(new[:-1, 1:], np.where(d2same, new[1:, :-1],
                                              new[:-1, 1:]),
                       out=new[:-1, 1:])
        if np.array_equal(new, lab):
            break
        lab = new
    # np.unique sorts by the component's min flat index == first-appearance
    # row-major order, so inv+1 is already the renumbering we want
    uniq, inv = np.unique(lab, return_inverse=True)
    out = (inv + 1).reshape(h, w).astype(np.int32)
    return out, int(uniq.size)


def polygonize(band, connectivity: int = 4):
    """Per-component rows: (value, pixel_count, min_row, min_col, max_row,
    max_col) — the tabular form of GDALPolygonize's polygons (bbox instead
    of traced rings in v0)."""
    labels, n = label_components(band, connectivity)
    a = np.asarray(band)
    h, w = a.shape
    flat = labels.ravel() - 1
    rr = np.repeat(np.arange(h), w)
    cc = np.tile(np.arange(w), h)
    counts = np.bincount(flat, minlength=n)
    minr = np.full(n, h); np.minimum.at(minr, flat, rr)
    maxr = np.full(n, -1); np.maximum.at(maxr, flat, rr)
    minc = np.full(n, w); np.minimum.at(minc, flat, cc)
    maxc = np.full(n, -1); np.maximum.at(maxc, flat, cc)
    first = np.full(n, h * w); np.minimum.at(first, flat, np.arange(h * w))
    vals = a.ravel()[first]
    return [
        (float(vals[i]), int(counts[i]), int(minr[i]), int(minc[i]),
         int(maxr[i]), int(maxc[i]))
        for i in range(n)
    ]


def trace_rings(mask, connectivity: int = 4):
    """Trace the boundary rings of a pixel region as closed pixel-corner
    polygons — the ring-building core of GDALPolygonize
    (/root/reference/alg/polygonize_polygonizer.cpp arc collection/joining,
    re-derived as directed-edge chaining).

    Directed edges keep the region on the right (clockwise outer ring in
    row/col coords, counter-clockwise holes). Returns a list of rings, each
    an (N, 2) float array of (col, row) pixel-corner coordinates, closed
    (first == last); the outer ring is the one with the largest |area|.
    At checkerboard-touch corners, connectivity=4 takes the right turn
    (diagonal neighbors stay separate rings) and connectivity=8 the left
    turn, which keeps diagonally-touching squares on ONE self-touching
    ring — the same corner-pinch polygon GDALPolygonize emits in
    8CONNECTED mode (foreground 8-conn implies background 4-conn, so
    holes resolve by the same rule)."""
    m = np.asarray(mask, dtype=bool)
    h, w = m.shape
    up = np.zeros((h + 1, w + 1), dtype=bool)

    # directed boundary edges keyed by start corner: (r, c) -> list of ends
    edges = {}

    def add(a, b):
        edges.setdefault(a, []).append(b)

    for r in range(h):
        for c in range(w):
            if not m[r, c]:
                continue
            if r == 0 or not m[r - 1, c]:
                add((r, c), (r, c + 1))          # top edge, rightward
            if c == w - 1 or not m[r, c + 1]:
                add((r, c + 1), (r + 1, c + 1))  # right edge, downward
            if r == h - 1 or not m[r + 1, c]:
                add((r + 1, c + 1), (r + 1, c))  # bottom edge, leftward
            if c == 0 or not m[r, c - 1]:
                add((r + 1, c), (r, c))          # left edge, upward
    rings = []
    while edges:
        start = next(iter(edges))
        ring = [start]
        cur = start
        prev_dir = None
        while True:
            outs = edges[cur]
            if len(outs) == 1:
                nxt = outs.pop()
            else:
                # turn preference relative to the incoming direction:
                # right for 4-conn (split at the pinch), left for 8-conn
                # (stay on the same component through the pinch)
                def turn_key(cand):
                    d = (cand[0] - cur[0], cand[1] - cur[1])
                    if prev_dir is None:
                        return 0
                    # cross product prev x d: negative = right turn (row down)
                    return prev_dir[0] * d[1] - prev_dir[1] * d[0]
                outs.sort(key=turn_key, reverse=(connectivity == 8))
                nxt = outs.pop(0)
            if not edges[cur]:
                del edges[cur]
            prev_dir = (nxt[0] - cur[0], nxt[1] - cur[1])
            ring.append(nxt)
            cur = nxt
            if cur == start:
                break
        # collapse collinear runs, convert to (col, row)
        pts = []
        for i, p in enumerate(ring):
            if 0 < i < len(ring) - 1:
                a, b, c2 = ring[i - 1], p, ring[i + 1]
                if (b[0] - a[0], b[1] - a[1]) == (c2[0] - b[0], c2[1] - b[1]):
                    continue
            pts.append((p[1], p[0]))
        rings.append(np.asarray(pts, dtype=np.float64))
    return rings


def polygonize_rings(band, connectivity: int = 4):
    """Per-component polygon output: (value, pixel_count, outer_ring) with
    the outer ring in pixel-corner coordinates (col, row). Holes counted but
    not emitted in v0 (GDALPolygonize emits them as interior rings)."""
    labels, n = label_components(band, connectivity)
    a = np.asarray(band)
    out = []
    for lbl in range(1, n + 1):
        m = labels == lbl
        rings = trace_rings(m, connectivity)
        areas = [
            0.5 * abs(np.dot(r[:-1, 0], r[1:, 1]) - np.dot(r[1:, 0], r[:-1, 1]))
            for r in rings
        ]
        outer = rings[int(np.argmax(areas))]
        rs, cs = np.nonzero(m)
        out.append(
            (float(a[rs[0], cs[0]]), int(m.sum()), outer, len(rings) - 1)
        )
    return out


def sieve(band, threshold: int, connectivity: int = 4):
    """Remove components smaller than ``threshold`` px by merging each into
    its most-bordering neighbor component (GDALSieveFilter semantics;
    ``nConnectedness`` 4 or 8 per alg/gdalsievefilter.cpp:166 — with 8,
    diagonal contacts both join components and count as merge borders)."""
    if connectivity not in (4, 8):
        raise ValueError(f"connectivity must be 4 or 8, got {connectivity}")
    a = np.asarray(band).copy()
    nbrs = ((1, 0), (-1, 0), (0, 1), (0, -1))
    if connectivity == 8:
        nbrs = nbrs + ((1, 1), (1, -1), (-1, 1), (-1, -1))
    while True:
        labels, n = label_components(a, connectivity)
        sizes = np.bincount(labels.ravel())[1:]
        small = np.nonzero(sizes < threshold)[0] + 1
        if small.size == 0:
            return a
        changed = False
        for lbl in small:
            m = labels == lbl
            # boundary neighbors
            neigh = {}
            rs, cs = np.nonzero(m)
            for r, c in zip(rs, cs):
                for dr, dc in nbrs:
                    rr, cc = r + dr, c + dc
                    if 0 <= rr < a.shape[0] and 0 <= cc < a.shape[1]:
                        lab2 = labels[rr, cc]
                        if lab2 != lbl:
                            neigh[lab2] = neigh.get(lab2, 0) + 1
            if not neigh:
                continue
            best = max(neigh.items(), key=lambda kv: (kv[1], -kv[0]))[0]
            rs2, cs2 = np.nonzero(labels == best)
            a[m] = a[rs2[0], cs2[0]]
            changed = True
        if not changed:
            return a


def proximity(mask, cell: float = 1.0):
    """Distance to the nearest True pixel — two-pass 3x3 chamfer (weights
    1, sqrt2), the classic approximation GDALComputeProximity implements
    exactly per scanline pair."""
    m = np.asarray(mask, dtype=bool)
    h, w = m.shape
    INF = 1e18
    d = np.where(m, 0.0, INF)
    s2 = np.sqrt(2.0)
    idx = np.arange(w, dtype=np.float64)

    def _row_scan(cand):
        """Serial left-neighbor chain min(cand[j] + (c-j)) vectorized:
        running-min of (cand[j] - j) + c; then the mirrored right chain."""
        left = np.minimum.accumulate(cand - idx) + idx
        right = (np.minimum.accumulate((cand - (w - 1 - idx))[::-1]) + (
            w - 1 - idx
        )[::-1])[::-1]
        return np.minimum(np.minimum(left, right), cand)

    for r in range(h):
        cand = d[r].copy()
        if r > 0:
            up = d[r - 1]
            cand = np.minimum(cand, up + 1.0)
            cand[1:] = np.minimum(cand[1:], up[:-1] + s2)
            cand[:-1] = np.minimum(cand[:-1], up[1:] + s2)
        d[r] = _row_scan(cand)
    for r in range(h - 2, -1, -1):
        dn = d[r + 1]
        cand = np.minimum(d[r], dn + 1.0)
        cand[1:] = np.minimum(cand[1:], dn[:-1] + s2)
        cand[:-1] = np.minimum(cand[:-1], dn[1:] + s2)
        d[r] = _row_scan(cand)
    return d * cell


def rasterize_lines(parts_xy, gt, w: int, h: int, burn: float = 1.0,
                    out=None, add: bool = False, all_touched: bool = False):
    """Burn polylines — GDALdllImageLine's integer Bresenham
    (alg/llrasterize.cpp:256-365): vertices floor to pixel coords, the
    error accumulator steps the minor axis, and intermediate segment
    endpoints burn ONCE (the skip-endpoint-except-last-segment rule that
    keeps Add mode artifact-free).  ``all_touched`` switches to the
    Amanatides-Woo traversal (GDALdllImageLineAllTouched) with the same
    no-double-burn seam handling."""
    if out is None:
        out = np.zeros((h, w), dtype=np.float64)
    for part in parts_xy:
        p = np.asarray(part, dtype=np.float64)
        px = (p[:, 0] - gt[0]) / gt[1]
        py = (p[:, 1] - gt[3]) / gt[5]
        if all_touched:
            prev_last = None
            for j in range(1, len(px)):
                cells = _traverse_cells(px[j - 1], py[j - 1], px[j], py[j])
                if prev_last is not None and cells and cells[0] == prev_last:
                    cells = cells[1:]
                for cy, cx in cells:
                    if 0 <= cy < h and 0 <= cx < w:
                        if add:
                            out[cy, cx] += burn
                        else:
                            out[cy, cx] = burn
                if cells:
                    prev_last = cells[-1]
            continue
        nseg = len(px) - 1
        for j in range(1, len(px)):
            ix, iy = int(np.floor(px[j - 1])), int(np.floor(py[j - 1]))
            ix1, iy1 = int(np.floor(px[j])), int(np.floor(py[j]))
            dx, dy = abs(ix1 - ix), abs(iy1 - iy)
            sx = -1 if ix > ix1 else 1
            sy = -1 if iy > iy1 else 1
            if dx >= dy:
                xerr = dy << 1
                yerr = xerr - (dx << 1)
                err = xerr - dx
                n = dx - 1 if j != nseg else dx
                while n >= 0:
                    n -= 1
                    if 0 <= ix < w and 0 <= iy < h:
                        if add:
                            out[iy, ix] += burn
                        else:
                            out[iy, ix] = burn
                    ix += sx
                    if err > 0:
                        iy += sy
                        err += yerr
                    else:
                        err += xerr
            else:
                yerr2 = dx << 1
                xerr2 = yerr2 - (dy << 1)
                err = yerr2 - dy
                n = dy - 1 if j != nseg else dy
                while n >= 0:
                    n -= 1
                    if 0 <= ix < w and 0 <= iy < h:
                        if add:
                            out[iy, ix] += burn
                        else:
                            out[iy, ix] = burn
                    iy += sy
                    if err > 0:
                        ix += sx
                        err += xerr2
                    else:
                        err += yerr2
    return out
