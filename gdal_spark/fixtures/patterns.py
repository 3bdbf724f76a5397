"""Closed-form pattern fixtures for raster->vector value oracles.

Unlike the gradient corpus (images.py), these synthetics have component /
distance structure that is enumerable in ANSI SQL, so connected-component
operators (polygonize, sieve) and the chamfer proximity transform can be
value-gated end to end:

- ``checker``: B x B blocks alternating between band values 0 and 64 —
  under 4-connectivity every block is exactly one component (same-value
  blocks touch only at corners), so the polygonize output (comp_id in
  first-appearance row-major order, value, pixel_count, bbox) is closed
  form in the block indices.
- ``checker_defect``: the checkerboard plus one isolated 1-px value-128
  defect at the center of every diagonal block (k, k) — each defect is a
  size-1 component that GDALSieveFilter-style sieving merges back into
  its enclosing block, restoring the exact checkerboard.
- ``stripes``: band value 0 on columns x % S == 0, 200 elsewhere — the
  distance to the nearest target is purely horizontal, where the 3x3
  chamfer transform is exact, so per-image dmax/dmean are closed form.
- ``cone``: band value 200 - 3*chebyshev(center) — terrain strictly
  descending from the center along every ray, so the whole grid is
  visible from the apex (the sightline stays strictly above the cone)
  and the viewshed mask/count/checksum are closed form.
- ``plateau_hole``: constant 200 with a 6x6 zero hole — IDW fill from an
  all-equal boundary returns exactly the constant, so the filled count
  and restored-image checksum are closed form.

Sizes are chosen so SQL replays stay exact: checker sizes are multiples
of B; stripe widths are powers of two (sum_x d / w is a dyadic rational,
exact in IEEE double on both engines).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..codecs.registry import encode

CHECKER_B = 8
CHECKER_W = (16, 24, 32, 40)
CHECKER_H = (16, 32, 48, 24)
STRIPE_W = (32, 64, 128)
STRIPE_H = (32, 16, 64)
STRIPE_S = (3, 5, 7)
CONE_W = (33, 48, 64)
CONE_H = (25, 63, 41)
PLATEAU_W = (32, 48, 64)
PLATEAU_H = (40, 32, 64)
HOLE = (4, 10, 5, 11)  # y0, y1, x0, x1 (exclusive ends): 6x6 = 36 px
FRAME_W = (32, 48, 64)
FRAME_H = (40, 32, 64)
FRAME_K = (2, 3, 4)


def checker_pixels(w: int, h: int, defects: bool = False) -> np.ndarray:
    """(h, w, 3) uint8: band 1 = ((x//B + y//B) % 2) * 64 (+ diagonal
    1-px 128 defects when asked); bands 2/3 constant."""
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    b1 = (((x // CHECKER_B) + (y // CHECKER_B)) % 2).astype(np.uint8) * 64
    b1 = np.broadcast_to(b1, (h, w)).copy()
    if defects:
        half = CHECKER_B // 2
        for k in range(min(w, h) // CHECKER_B):
            b1[k * CHECKER_B + half, k * CHECKER_B + half] = 128
    out = np.empty((h, w, 3), dtype=np.uint8)
    out[..., 0] = b1
    out[..., 1] = 17
    out[..., 2] = 203
    return out


def stripe_pixels(w: int, h: int, s: int) -> np.ndarray:
    """(h, w, 3) uint8: band 1 = 0 on columns x % s == 0, 200 elsewhere."""
    x = np.arange(w)[None, :]
    b1 = np.where(x % s == 0, 0, 200).astype(np.uint8)
    out = np.empty((h, w, 3), dtype=np.uint8)
    out[..., 0] = np.broadcast_to(b1, (h, w))
    out[..., 1] = 17
    out[..., 2] = 203
    return out


def cone_pixels(w: int, h: int) -> np.ndarray:
    """(h, w, 3) uint8: band 1 = 200 - 3*chebyshev distance to center."""
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    cheb = np.maximum(np.abs(x - w // 2), np.abs(y - h // 2))
    out = np.empty((h, w, 3), dtype=np.uint8)
    out[..., 0] = np.clip(200 - 3 * cheb, 0, 255).astype(np.uint8)
    out[..., 1] = 17
    out[..., 2] = 203
    return out


def plateau_pixels(w: int, h: int) -> np.ndarray:
    """(h, w, 3) uint8: band 1 = constant 200 with a 6x6 zero hole."""
    y0, y1, x0, x1 = HOLE
    out = np.empty((h, w, 3), dtype=np.uint8)
    out[..., 0] = 200
    out[y0:y1, x0:x1, 0] = 0
    out[..., 1] = 17
    out[..., 2] = 203
    return out


def frame_pixels(w: int, h: int, k: int) -> np.ndarray:
    """(h, w, 3) uint8: an all-black collar of width k around a bright
    constant interior (200/180/220) — the nearblack fixture.  With the
    default near=15/max_non_black=2 options the reference's two-pass scan
    strips the collar plus exactly two more pixels on every side (the
    grey-area allowance), so the surviving interior is the centered
    (w-2(k+2)) x (h-2(k+2)) rectangle: counts and the band-1 checksum are
    closed form."""
    out = np.zeros((h, w, 3), dtype=np.uint8)
    out[k:h - k, k:w - k] = (200, 180, 220)
    return out


def pattern_images_df(spark: SparkSession, kind: str, n: int) -> DataFrame:
    """Distributed synth of n pattern images: image_id, bytes, w, h (+ s
    for stripes).  Built executor-side from spark.range — no driver data."""
    if kind == "stripes":
        schema = "image_id string, bytes binary, w int, h int, s int"
    else:
        schema = "image_id string, bytes binary, w int, h int"
    defects = kind == "checker_defect"
    prefix = {"checker": "chk", "checker_defect": "svd", "stripes": "stp",
              "cone": "vsh", "plateau_hole": "fnd", "frame": "nbk"}[kind]

    def gen(batches):
        for pdf in batches:
            out = []
            for i in pdf["id"].astype(int):
                if kind == "stripes":
                    w = STRIPE_W[i % 3]
                    h = STRIPE_H[i % 3]
                    s = STRIPE_S[i % 3]
                    px = stripe_pixels(w, h, s)
                    out.append(dict(image_id=f"{prefix}{i:08d}",
                                    bytes=encode(px, "png"), w=w, h=h, s=s))
                    continue
                if kind == "cone":
                    w, h = CONE_W[i % 3], CONE_H[i % 3]
                    px = cone_pixels(w, h)
                elif kind == "plateau_hole":
                    w, h = PLATEAU_W[i % 3], PLATEAU_H[i % 3]
                    px = plateau_pixels(w, h)
                elif kind == "frame":
                    w, h = FRAME_W[i % 3], FRAME_H[i % 3]
                    px = frame_pixels(w, h, FRAME_K[i % 3])
                else:
                    w, h = CHECKER_W[i % 4], CHECKER_H[i % 4]
                    px = checker_pixels(w, h, defects=defects)
                out.append(dict(image_id=f"{prefix}{i:08d}",
                                bytes=encode(px, "png"), w=w, h=h))
            yield pd.DataFrame(out, columns=schema.replace(" string", "")
                               .replace(" binary", "").replace(" int", "")
                               .split(", "))

    return spark.range(n).mapInPandas(gen, schema=schema)
