"""rgb2pct — median-cut palette + error-diffusion dither, the exact
algorithms of ``alg/gdalmediancut.cpp`` (GDALComputeMedianCutPCT) and
``alg/gdaldither.cpp`` (GDALDitherRGB2PCT), re-derived in numpy:

* 3-D color histogram at ``nbits`` per channel (default 5 -> 32^3 cells,
  gdalmediancut.cpp:375);
* one box shrunk to the occupied range, then repeated splits: pick the
  first strictly-largest-population splittable box (largest_box), split
  along the longest axis (red >= green >= blue tie priority) at the first
  index whose cumulative count reaches total/2 (``i++`` when the median
  lands on the first cell), prepend the lower half, shrink both;
* palette entry = ((min + max) << (8 - nbits)) / 2 per box, in USED-BOX
  LIST ORDER (new boxes prepended — gdalmediancut.cpp STEP 4);
* dither: GDAL's integer sixth-split diffusion (gdaldither.cpp:588-624),
  NOT classic Floyd-Steinberg: with e the signed error and s = int(e/6)
  (C truncation), right neighbor += 2s (same-line carry), below-left
  += s, below += e - 5s, below-right = s (assignment, not +=); nearest
  palette entry resolved through the ``nbits`` color cube
  (gdaldither.cpp:552-558 pabyColorMap), ties -> lowest index.
"""

from __future__ import annotations

import numpy as np


def median_cut_pct(arr: np.ndarray, n_colors: int = 256,
                   nbits: int = 5) -> np.ndarray:
    """(H, W, 3) uint8 -> (n<=n_colors, 3) uint8 palette."""
    a = np.asarray(arr)
    if a.ndim != 3 or a.shape[2] < 3:
        raise ValueError("median_cut_pct needs (H, W, 3)")
    shift = 8 - nbits
    lv = 1 << nbits
    q = (a[:, :, :3] >> shift).reshape(-1, 3).astype(np.int64)
    flat = (q[:, 0] * lv + q[:, 1]) * lv + q[:, 2]
    hist = np.bincount(flat, minlength=lv * lv * lv).reshape(lv, lv, lv)

    def shrink(b):
        r0, r1, g0, g1, b0, b1 = b["bounds"]
        sub = hist[r0:r1 + 1, g0:g1 + 1, b0:b1 + 1]
        rr = np.nonzero(sub.sum(axis=(1, 2)))[0]
        gg = np.nonzero(sub.sum(axis=(0, 2)))[0]
        bb = np.nonzero(sub.sum(axis=(0, 1)))[0]
        if rr.size:
            b["bounds"] = (r0 + rr[0], r0 + rr[-1], g0 + gg[0], g0 + gg[-1],
                           b0 + bb[0], b0 + bb[-1])

    boxes = [{"bounds": (0, lv - 1, 0, lv - 1, 0, lv - 1),
              "total": int(hist.sum())}]
    shrink(boxes[0])

    while len(boxes) < n_colors:
        # first strictly-largest splittable box (largest_box semantics)
        best = None
        for b in boxes:
            r0, r1, g0, g1, b0, b1 = b["bounds"]
            if (r1 > r0 or g1 > g0 or b1 > b0) and (
                    best is None or b["total"] > best["total"]):
                best = b
        if best is None:
            break
        r0, r1, g0, g1, b0, b1 = best["bounds"]
        # longest axis, red >= green >= blue priority
        if r1 - r0 >= g1 - g0 and r1 - r0 >= b1 - b0:
            axis, first, last = 0, r0, r1
        elif g1 - g0 >= b1 - b0:
            axis, first, last = 1, g0, g1
        else:
            axis, first, last = 2, b0, b1
        sub = hist[r0:r1 + 1, g0:g1 + 1, b0:b1 + 1]
        h2 = sub.sum(axis=tuple(j for j in range(3) if j != axis))
        half = best["total"] // 2
        csum = np.cumsum(h2)
        i = int(np.searchsorted(csum, half, side="left")) + first
        # reference loop stops once cumsum >= total/2
        if i > last:
            i = last
        if i == first:
            i += 1
        lo = int(csum[i - 1 - first])
        hi = best["total"] - lo
        nb = dict(best)
        bl, bh = list(best["bounds"]), list(nb["bounds"])
        bh[2 * axis], bh[2 * axis + 1] = bh[2 * axis], i - 1   # lower half
        bl[2 * axis] = i                                       # upper half
        nb["bounds"], nb["total"] = tuple(bh), lo
        best["bounds"], best["total"] = tuple(bl), hi
        shrink(nb)
        shrink(best)
        boxes.insert(0, nb)  # new box prepended to usedboxes

    pal = np.empty((len(boxes), 3), dtype=np.uint8)
    for k, b in enumerate(boxes):
        r0, r1, g0, g1, b0, b1 = b["bounds"]
        pal[k] = (((r0 + r1) << shift) // 2, ((g0 + g1) << shift) // 2,
                  ((b0 + b1) << shift) // 2)
    return pal


def _color_cube(palette: np.ndarray, nbits: int) -> np.ndarray:
    """(lv, lv, lv) -> nearest palette index per quantized cell, built
    exactly like the reference's pabyColorMap (gdaldither.cpp:775-793):
    cell representative = (cell * 255) / (nCLevels - 1), MANHATTAN
    distance (the SSE path's _mm_sad_epu8 sums |dR|+|dG|+|dB|), strict
    less -> lowest palette index wins ties."""
    lv = 1 << nbits
    reps = (np.arange(lv) * 255) // (lv - 1)
    rr, gg, bb = np.meshgrid(reps, reps, reps, indexing="ij")
    pts = np.stack([rr, gg, bb], axis=-1).reshape(-1, 3).astype(np.int64)
    d1 = np.abs(pts[:, None, :] - palette[None, :, :].astype(np.int64)
                ).sum(axis=2)
    return d1.argmin(axis=1).astype(np.int64).reshape(lv, lv, lv)


def dither_rgb_to_pct(arr: np.ndarray, palette: np.ndarray,
                      nbits: int = 5) -> np.ndarray:
    """(H, W, 3) uint8 + palette -> (H, W) index raster with GDAL's
    sixth-split integer error diffusion (gdaldither.cpp)."""
    a = np.asarray(arr)[:, :, :3].astype(np.int64)
    h, w = a.shape[:2]
    pal = np.asarray(palette, dtype=np.int64)
    lv = 1 << nbits
    cube = _color_cube(palette, nbits)
    out = np.empty((h, w), dtype=np.uint8)
    err_next = np.zeros((w + 2, 3), dtype=np.int64)  # +1 col offset
    for y in range(h):
        row = np.clip(a[y] + err_next[1:w + 1], 0, 255)
        err_next[:] = 0
        last = np.zeros(3, dtype=np.int64)
        for x in range(w):
            v = np.clip(row[x] + last, 0, 255)
            idx = cube[v[0] * lv // 256, v[1] * lv // 256, v[2] * lv // 256]
            out[y, x] = idx
            e = v - pal[idx]
            s = np.fix(e / 6).astype(np.int64)  # C trunc toward zero
            err_next[x] += s              # below-left
            err_next[x + 1] += e - 5 * s  # below
            err_next[x + 2] = s           # below-right (assignment)
            last = 2 * s
    return out
