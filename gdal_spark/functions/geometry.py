"""Geometry kernels as vectorized pandas UDFs (Arrow-batched, no per-row
Python in the hot path).

The exact-refine step of the spatial join: candidates arrive as
(point mercator x/y, polygon WKB) pairs from the cell-key equi-join; the UDF
ray-casts each batch against the (few, cached) distinct rings — the Spark
translation of installing a prepared geometry on a layer filter
(/root/reference/ogr/ogrsf_frmts/generic/ogrlayer.cpp:3902-4067) with the
even-odd crossing semantics of OGRLinearRing::isPointInRing
(/root/reference/ogr/ogrlinearring.cpp:452-517).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, BooleanType, DoubleType

from ..fixtures.tile_grid import parse_wkb_polygon
from ..oracle.pip import point_in_ring


@F.pandas_udf(BooleanType())
def pip_refine(mx: pd.Series, my: pd.Series, wkb: pd.Series) -> pd.Series:
    """Exact even-odd ray-cast of points against per-row polygon WKB.

    Rings repeat heavily after a cell join (every candidate pair in a cell
    shares the same few polygons), so parse+test once per distinct ring per
    batch — the 'prepared geometry' trick, Arrow-batch style.
    """
    xs = mx.to_numpy(dtype=np.float64)
    ys = my.to_numpy(dtype=np.float64)
    out = np.zeros(len(xs), dtype=bool)
    codes, uniques = pd.factorize(wkb, use_na_sentinel=True)
    for u, blob in enumerate(uniques):
        sel = codes == u
        ring = parse_wkb_polygon(bytes(blob))
        out[sel] = point_in_ring(xs[sel], ys[sel], ring)
    return pd.Series(out)


@F.pandas_udf(BinaryType())
def diamond_wkb(mx: pd.Series, my: pd.Series, s: pd.Series) -> pd.Series:
    """WKB convex polygon: 45°-rotated square (diamond) with half-diagonal
    ``s`` centered at (mx, my) — the generic-convex-overlay test geometry
    (axis-aligned square in (u,v) = (x+y, x-y) rotated coordinates, which is
    what makes its overlay SQL-oracle-able)."""
    from ..oracle import geom as G

    xs = mx.to_numpy(np.float64)
    ys = my.to_numpy(np.float64)
    ss = s.to_numpy(np.float64)
    out = []
    for x, y, r in zip(xs, ys, ss):
        ring = np.array([[x + r, y], [x, y + r], [x - r, y],
                         [x, y - r], [x + r, y]])
        out.append(G.to_wkb("polygon", [ring]))
    return pd.Series(out)


@F.pandas_udf(DoubleType())
def ring_area(wkb: pd.Series) -> pd.Series:
    """Shoelace area of the outer ring (ST_Area analogue for our polygons;
    semantics of OGRSimpleCurve/ogrgeometry get_Area for planar rings)."""
    out = np.empty(len(wkb), dtype=np.float64)
    codes, uniques = pd.factorize(wkb, use_na_sentinel=True)
    areas = np.empty(len(uniques), dtype=np.float64)
    for u, blob in enumerate(uniques):
        r = parse_wkb_polygon(bytes(blob))
        x, y = r[:, 0], r[:, 1]
        areas[u] = 0.5 * abs(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))
    out[:] = areas[codes]
    return pd.Series(out)
