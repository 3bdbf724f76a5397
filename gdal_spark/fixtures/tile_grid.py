"""WebMercator tile-grid polygon table (broadcast side of the spatial join).

Derived, not random (FIXTURES.md §2): every tile of zoom z ∈ [zmin, zmax] of
the TMS WebMercatorQuad scheme, with EPSG:3857 bounds per the reference's
``TileBounds`` (gdal2tiles.py:480-487) and the 5-point closed ring as WKB —
the exact-geometry side for the ray-cast PIP refine.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

from ..oracle import mercator as M


def wkb_polygon(ring_xy) -> bytes:
    """Little-endian ISO WKB for a single-ring polygon (type 3)."""
    ring = np.asarray(ring_xy, dtype=np.float64)
    out = [struct.pack("<BII", 1, 3, 1), struct.pack("<I", ring.shape[0])]
    out.append(ring.astype("<f8").tobytes())
    return b"".join(out)


def parse_wkb_polygon(data: bytes) -> np.ndarray:
    """Parse a little-endian single-ring WKB polygon -> (N,2) float64."""
    byte_order, geom_type, nrings = struct.unpack_from("<BII", data, 0)
    if byte_order != 1 or geom_type != 3 or nrings < 1:
        raise ValueError("unsupported WKB")
    (npts,) = struct.unpack_from("<I", data, 9)
    return np.frombuffer(data, dtype="<f8", count=npts * 2, offset=13).reshape(npts, 2)


def tile_grid_pdf(zmin: int = 0, zmax: int = 6) -> pd.DataFrame:
    frames = []
    for z in range(zmin, zmax + 1):
        n = 2**z
        ty, tx = np.mgrid[0:n, 0:n]
        tx = tx.ravel().astype(np.int64)
        ty = ty.ravel().astype(np.int64)
        minx, miny, maxx, maxy = M.tile_bounds(tx, ty, z)
        wkb = [
            wkb_polygon(
                [
                    (a, b),
                    (c, b),
                    (c, d),
                    (a, d),
                    (a, b),
                ]
            )
            for a, b, c, d in zip(minx, miny, maxx, maxy)
        ]
        frames.append(
            pd.DataFrame(
                {
                    "z": np.int32(z),
                    "x": tx.astype(np.int32),
                    "y": ty.astype(np.int32),
                    "y_xyz": (n - 1 - ty).astype(np.int32),
                    "minx": minx,
                    "miny": miny,
                    "maxx": maxx,
                    "maxy": maxy,
                    "wkb": wkb,
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


def tile_grid_df(spark, zmin: int = 0, zmax: int = 6):
    """Small dimension table (5461 rows for z<=6) — broadcast it in joins."""
    return spark.createDataFrame(tile_grid_pdf(zmin, zmax))
