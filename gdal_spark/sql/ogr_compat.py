"""ST_* spatial SQL functions — the engine's analogue of the reference's
SQLite-dialect function registry
(/root/reference/ogr/ogrsf_frmts/sqlite/ogrsqlitesqlfunctions.cpp:876-1125):
registered on the SparkSession so `spark.sql("SELECT ST_Area(wkb) ...")`
works, names kept `ST_*` for SQL parity.

Geometry domain: the engine's WKB (little-endian Point / single-ring
Polygon). Predicates implemented against the exact ray-cast / bbox
semantics the join operators use; everything numpy inside Arrow batches.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType, BooleanType, DoubleType, StringType,
)

from ..fixtures.tile_grid import parse_wkb_polygon, wkb_polygon
from ..oracle.pip import point_in_ring


def wkb_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, 1, x, y)


def _parse_any(blob: bytes):
    """-> ('point', (x, y)) | ('polygon', ring ndarray)."""
    geom_type = struct.unpack_from("<I", blob, 1)[0]
    if geom_type == 1:
        x, y = struct.unpack_from("<dd", blob, 5)
        return "point", (x, y)
    if geom_type == 3:
        return "polygon", parse_wkb_polygon(blob)
    raise ValueError(f"unsupported WKB geometry type {geom_type}")


def _bbox(blob: bytes):
    kind, g = _parse_any(blob)
    if kind == "point":
        return g[0], g[1], g[0], g[1]
    return g[:, 0].min(), g[:, 1].min(), g[:, 0].max(), g[:, 1].max()


def _per_row(fn, out_dtype=object):
    def wrapped(s: pd.Series) -> pd.Series:
        return pd.Series([None if b is None else fn(bytes(b)) for b in s],
                         dtype=out_dtype)

    return wrapped


def _per_pair(fn):
    def wrapped(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if (x is None or y is None) else fn(bytes(x), bytes(y))
                for x, y in zip(a, b)
            ]
        )

    return wrapped


def _st_area(blob):
    kind, g = _parse_any(blob)
    if kind == "point":
        return 0.0
    x, y = g[:, 0], g[:, 1]
    return float(0.5 * abs(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1])))


def _st_centroid(blob):
    kind, g = _parse_any(blob)
    if kind == "point":
        return blob
    # polygon centroid via the standard shoelace-weighted formula
    x, y = g[:-1, 0], g[:-1, 1]
    xn, yn = g[1:, 0], g[1:, 1]
    cross = x * yn - xn * y
    a = cross.sum() / 2.0
    if a == 0:
        return wkb_point(float(x.mean()), float(y.mean()))
    cx = ((x + xn) * cross).sum() / (6.0 * a)
    cy = ((y + yn) * cross).sum() / (6.0 * a)
    return wkb_point(float(cx), float(cy))


def _st_astext(blob):
    kind, g = _parse_any(blob)
    if kind == "point":
        return f"POINT ({g[0]:.10g} {g[1]:.10g})"
    coords = ", ".join(f"{p[0]:.10g} {p[1]:.10g}" for p in g)
    return f"POLYGON (({coords}))"


def _st_geomfromtext(s):
    s = s.strip()
    if s.upper().startswith("POINT"):
        inner = s[s.index("(") + 1 : s.rindex(")")].split()
        return wkb_point(float(inner[0]), float(inner[1]))
    if s.upper().startswith("POLYGON"):
        inner = s[s.index("((") + 2 : s.rindex("))")]
        pts = [tuple(map(float, p.split())) for p in inner.split(",")]
        return wkb_polygon(pts)
    raise ValueError(f"unsupported WKT {s[:30]}")


def _st_intersects(a, b):
    ax0, ay0, ax1, ay1 = _bbox(a)
    bx0, by0, bx1, by1 = _bbox(b)
    if ax0 > bx1 or bx0 > ax1 or ay0 > by1 or by0 > ay1:
        return False
    ka, ga = _parse_any(a)
    kb, gb = _parse_any(b)
    if ka == "point" and kb == "polygon":
        return bool(point_in_ring(np.array([ga[0]]), np.array([ga[1]]), gb)[0])
    if kb == "point" and ka == "polygon":
        return bool(point_in_ring(np.array([gb[0]]), np.array([gb[1]]), ga)[0])
    return True  # bbox overlap (axis-aligned polygon domain: exact)


def _st_within(a, b):
    ka, ga = _parse_any(a)
    kb, gb = _parse_any(b)
    if ka == "point" and kb == "polygon":
        return bool(point_in_ring(np.array([ga[0]]), np.array([ga[1]]), gb)[0])
    ax0, ay0, ax1, ay1 = _bbox(a)
    bx0, by0, bx1, by1 = _bbox(b)
    return ax0 >= bx0 and ay0 >= by0 and ax1 <= bx1 and ay1 <= by1


def _st_distance(a, b):
    ka, ga = _parse_any(a)
    kb, gb = _parse_any(b)
    if ka == "point" and kb == "point":
        return float(np.hypot(ga[0] - gb[0], ga[1] - gb[1]))
    # bbox gap distance for extended geoms (0 when overlapping)
    ax0, ay0, ax1, ay1 = _bbox(a)
    bx0, by0, bx1, by1 = _bbox(b)
    dx = max(bx0 - ax1, ax0 - bx1, 0.0)
    dy = max(by0 - ay1, ay0 - by1, 0.0)
    return float(np.hypot(dx, dy))


def _st_buffer(blob, dist):
    """Axis-aligned buffer (bbox expand) — the envelope-precision buffer our
    rectangle domain supports; full round buffers need a curve domain."""
    x0, y0, x1, y1 = _bbox(blob)
    return wkb_polygon(
        [(x0 - dist, y0 - dist), (x1 + dist, y0 - dist), (x1 + dist, y1 + dist),
         (x0 - dist, y1 + dist), (x0 - dist, y0 - dist)]
    )


def register_st_functions(spark: SparkSession) -> None:
    """Idempotently register the ST_* surface on the session."""
    reg = spark.udf.register
    reg("ST_Area", F.pandas_udf(_per_row(_st_area, np.float64), DoubleType()))
    reg("ST_AsText", F.pandas_udf(_per_row(_st_astext), StringType()))
    reg(
        "ST_GeomFromText",
        F.pandas_udf(
            lambda s: pd.Series([_st_geomfromtext(x) for x in s]), BinaryType()
        ),
    )
    reg("ST_Centroid", F.pandas_udf(_per_row(_st_centroid), BinaryType()))
    reg("ST_Intersects", F.pandas_udf(_per_pair(_st_intersects), BooleanType()))
    reg("ST_Within", F.pandas_udf(_per_pair(_st_within), BooleanType()))
    reg(
        "ST_Contains",
        F.pandas_udf(lambda a, b: _per_pair(_st_within)(b, a), BooleanType()),
    )
    reg("ST_Distance", F.pandas_udf(_per_pair(_st_distance), DoubleType()))

    def _buffer_udf(blobs: pd.Series, dists: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if b is None else _st_buffer(bytes(b), float(d))
                for b, d in zip(blobs, dists)
            ]
        )

    reg("ST_Buffer", F.pandas_udf(_buffer_udf, BinaryType()))

    def _x_udf(blobs: pd.Series) -> pd.Series:
        return pd.Series(
            [_parse_any(bytes(b))[1][0] if b is not None else None for b in blobs],
            dtype=np.float64,
        )

    def _y_udf(blobs: pd.Series) -> pd.Series:
        return pd.Series(
            [_parse_any(bytes(b))[1][1] if b is not None else None for b in blobs],
            dtype=np.float64,
        )

    reg("ST_X", F.pandas_udf(_x_udf, DoubleType()))
    reg("ST_Y", F.pandas_udf(_y_udf, DoubleType()))
