"""ST_* spatial SQL functions — the engine's analogue of the reference's
SQLite-dialect function registry
(/root/reference/ogr/ogrsf_frmts/sqlite/ogrsqlitesqlfunctions.cpp:627-1125):
registered on the SparkSession so `spark.sql("SELECT ST_Area(wkb) ...")`
works, names kept `ST_*` for SQL parity.

Round-2 surface: the full WKB domain of oracle/geom.py (Point, LineString,
Polygon with holes, Multi*), all 8 OGC predicates
(ogrsqlitesqlfunctions.cpp:876-883), validity/simplicity/emptiness
(:903-904), overlay scalars Intersection/Difference/SymDifference/Union
(:930-933), measures incl. geodesic area/length (:627-675,720-828), and
constructions (Buffer/ConvexHull/Simplify/MakeValid/Centroid/Boundary).

Execution shape (the round-1 review's "no per-row Python" mandate): every
UDF factorizes its geometry column(s) first — blobs repeat heavily after
cell joins — parses each DISTINCT blob once per Arrow batch, evaluates the
kernel per distinct (or distinct pair), and scatters results back by code.
Fixed-width Point columns (21-byte WKB) bypass parsing entirely via one
``np.frombuffer`` per batch.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType, BooleanType, DoubleType, IntegerType, StringType,
)

from ..oracle import geom as G

wkb_point = G.wkb_point


def _points_fast(s: pd.Series):
    """If every non-null blob is a 21-byte WKB point, bulk-parse to
    (xs, ys, isnull); else return None."""
    blobs = s.to_numpy(dtype=object)
    lens = np.array([len(b) if b is not None else -1 for b in blobs])
    valid = lens == 21
    if not (valid | (lens == -1)).all() or not valid.any():
        return None
    buf = b"".join(bytes(b) for b in blobs[valid])
    arr = np.frombuffer(buf, dtype=np.uint8).reshape(-1, 21)
    if not (arr[:, 0] == 1).all():
        return None
    xy = arr[:, 5:].copy().view("<f8").reshape(-1, 2)
    xs = np.full(len(blobs), np.nan)
    ys = np.full(len(blobs), np.nan)
    xs[valid] = xy[:, 0]
    ys[valid] = xy[:, 1]
    return xs, ys, lens == -1


def _unary(fn, dtype=None):
    """Factorized unary geometry UDF body: parse each distinct blob once."""

    def wrapped(s: pd.Series) -> pd.Series:
        codes, uniques = pd.factorize(s, use_na_sentinel=True)
        vals = [fn(G.parse_wkb(bytes(b))) for b in uniques]
        out = [None if c < 0 else vals[c] for c in codes]
        return pd.Series(out, dtype=dtype)

    return wrapped


def _binary(fn, dtype=None):
    """Factorized binary geometry UDF body: evaluate per distinct PAIR."""

    def wrapped(a: pd.Series, b: pd.Series) -> pd.Series:
        ca, ua = pd.factorize(a, use_na_sentinel=True)
        cb, ub = pd.factorize(b, use_na_sentinel=True)
        ga = [G.parse_wkb(bytes(x)) for x in ua]
        gb = [G.parse_wkb(bytes(x)) for x in ub]
        pair_key = ca.astype(np.int64) * (len(ub) + 1) + cb
        pair_key[(ca < 0) | (cb < 0)] = -1
        pc, pu = pd.factorize(pair_key, use_na_sentinel=False)
        vals = {}
        for idx, key in enumerate(pu):
            if key < 0:
                vals[idx] = None
                continue
            ia, ib = divmod(int(key), len(ub) + 1)
            vals[idx] = fn(ga[ia], gb[ib])
        return pd.Series([vals[c] for c in pc], dtype=dtype)

    return wrapped


# --- unary measure / inspection kernels ------------------------------------

def _area(g):
    return float(G.area(g))


def _length(g):
    return float(G.length(g))


def _perimeter(g):
    return float(G.perimeter(g))


def _geodesic_area(g):
    return float(G.geodesic_area(g))


def _geodesic_length(g):
    lg = G.geodesic_length(g)
    return float(lg)


def _centroid(g):
    cx, cy = G.centroid(g)
    return G.wkb_point(cx, cy)


def _x(g):
    kind, d = g
    if kind != "point":
        raise ValueError("ST_X needs a point")
    return float(d[0])


def _y(g):
    kind, d = g
    if kind != "point":
        raise ValueError("ST_Y needs a point")
    return float(d[1])


def _envelope(g):
    x0, y0, x1, y1 = G.bbox(g)
    return G.to_wkb("polygon", [np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])])


def _boundary(g):
    kind, d = g
    if kind == "polygon":
        if len(d) == 1:
            return G.to_wkb("linestring", d[0])
        return G.to_wkb("multilinestring", list(d))
    if kind == "multipolygon":
        rings = [r for p in d for r in p]
        return G.to_wkb("multilinestring", rings)
    if kind == "linestring":
        return G.to_wkb("multipoint", np.vstack([d[0], d[-1]]))
    return G.to_wkb("multipoint", np.empty((0, 2)))


# --- binary overlay kernels ------------------------------------------------
# Fast path: both sides single convex rings -> direct Sutherland-Hodgman.
# General path: ear-clipping triangle decomposition (concave + holes exact),
# results emitted as disjoint convex-piece MultiPolygons (coverage-equal to
# the dissolved GEOS result; internal piece boundaries not dissolved).

def _intersection_wkb(a, b):
    if a[0] not in ("polygon", "multipolygon") or b[0] not in (
        "polygon", "multipolygon"
    ):
        raise ValueError("ST_Intersection implemented for polygonal inputs")
    if G._is_simple_convex(a) and G._is_simple_convex(b):
        r = G.clip_convex(a[1][0], b[1][0])
        if r.shape[0] < 4:
            return G.to_wkb("polygon", [])
        return G.to_wkb("polygon", [r])
    pieces = G.polygon_intersection_pieces(a, b)
    return G.to_wkb("multipolygon", [[p] for p in pieces])


def _difference_wkb(a, b):
    if G._is_simple_convex(a) and G._is_simple_convex(b):
        pieces = G.subtract_convex(a[1][0], b[1][0])
    else:
        pieces = G.polygon_difference_pieces(a, b)
    return G.to_wkb("multipolygon", [[p] for p in pieces])


def _symdifference_wkb(a, b):
    if G._is_simple_convex(a) and G._is_simple_convex(b):
        pieces = (G.subtract_convex(a[1][0], b[1][0])
                  + G.subtract_convex(b[1][0], a[1][0]))
    else:
        pieces = (G.polygon_difference_pieces(a, b)
                  + G.polygon_difference_pieces(b, a))
    return G.to_wkb("multipolygon", [[p] for p in pieces])


def _union_wkb(a, b):
    """Coverage union as a disjoint decomposition: (a - b) pieces + b's
    pieces. Same point set as the dissolved GEOS union; boundaries between
    pieces are not dissolved (documented deviation)."""
    if G._is_simple_convex(a) and G._is_simple_convex(b):
        pieces = G.subtract_convex(a[1][0], b[1][0]) + [b[1][0]]
    else:
        pieces = G.polygon_difference_pieces(a, b) + G.decompose_convex(b)
    return G.to_wkb("multipolygon", [[p] for p in pieces])


def register_st_functions(spark: SparkSession) -> None:
    """Idempotently register the ST_* surface on the session."""
    reg = spark.udf.register

    # measures ---------------------------------------------------------------
    reg("ST_Area", F.pandas_udf(_unary(_area, np.float64), DoubleType()))
    reg("ST_Length", F.pandas_udf(_unary(_length, np.float64), DoubleType()))
    reg("ST_Perimeter",
        F.pandas_udf(_unary(_perimeter, np.float64), DoubleType()))
    reg("ST_GeodesicArea",
        F.pandas_udf(_unary(_geodesic_area, np.float64), DoubleType()))
    reg("ST_GeodesicLength",
        F.pandas_udf(_unary(_geodesic_length, np.float64), DoubleType()))
    reg("ST_NPoints",
        F.pandas_udf(_unary(lambda g: int(G.n_points(g)), "Int32"),
                     IntegerType()))
    reg("ST_SRID",
        F.pandas_udf(lambda s: pd.Series(np.where(s.isna(), None, 0),
                                         dtype="Int32"), IntegerType()))

    # inspection -------------------------------------------------------------
    reg("ST_IsEmpty",
        F.pandas_udf(_unary(lambda g: bool(G.is_empty(g)), object),
                     BooleanType()))
    reg("ST_IsValid",
        F.pandas_udf(_unary(lambda g: bool(G.is_valid(g)), object),
                     BooleanType()))
    reg("ST_IsSimple",
        F.pandas_udf(_unary(lambda g: bool(G.is_simple(g)), object),
                     BooleanType()))
    reg("ST_GeometryType",
        F.pandas_udf(_unary(lambda g: {
            "point": "POINT", "linestring": "LINESTRING",
            "polygon": "POLYGON", "multipoint": "MULTIPOINT",
            "multilinestring": "MULTILINESTRING",
            "multipolygon": "MULTIPOLYGON"}[g[0]]), StringType()))

    # accessors: point fast path (one frombuffer per batch) ------------------
    def _x_udf(blobs: pd.Series) -> pd.Series:
        fast = _points_fast(blobs)
        if fast is not None:
            xs, _, isnull = fast
            return pd.Series(np.where(isnull, np.nan, xs), dtype=np.float64)
        return _unary(_x, np.float64)(blobs)

    def _y_udf(blobs: pd.Series) -> pd.Series:
        fast = _points_fast(blobs)
        if fast is not None:
            _, ys, isnull = fast
            return pd.Series(np.where(isnull, np.nan, ys), dtype=np.float64)
        return _unary(_y, np.float64)(blobs)

    reg("ST_X", F.pandas_udf(_x_udf, DoubleType()))
    reg("ST_Y", F.pandas_udf(_y_udf, DoubleType()))

    # conversion -------------------------------------------------------------
    reg("ST_AsText", F.pandas_udf(_unary(G.to_wkt), StringType()))
    reg("ST_AsBinary",
        F.pandas_udf(lambda s: s.map(lambda b: None if b is None else bytes(b)),
                     BinaryType()))
    reg("ST_GeomFromWKB",
        F.pandas_udf(
            lambda s: s.map(
                lambda b: None if b is None else G.to_wkb(*G.parse_wkb(bytes(b)))
            ),
            BinaryType(),
        ))

    def _fromtext(s: pd.Series) -> pd.Series:
        codes, uniques = pd.factorize(s, use_na_sentinel=True)
        vals = [G.to_wkb(*G.from_wkt(str(t))) for t in uniques]
        return pd.Series([None if c < 0 else vals[c] for c in codes])

    reg("ST_GeomFromText", F.pandas_udf(_fromtext, BinaryType()))

    # constructions ----------------------------------------------------------
    reg("ST_Centroid", F.pandas_udf(_unary(_centroid), BinaryType()))
    reg("ST_Envelope", F.pandas_udf(_unary(_envelope), BinaryType()))
    reg("ST_Boundary", F.pandas_udf(_unary(_boundary), BinaryType()))
    reg("ST_ConvexHull", F.pandas_udf(_unary(G.hull_of_geom), BinaryType()))
    reg("ST_MakeValid",
        F.pandas_udf(_unary(lambda g: G.to_wkb(*G.make_valid(g))),
                     BinaryType()))
    def _makepoint_batch(xs: pd.Series, ys: pd.Series) -> pd.Series:
        # batch-wide WKB pack: 21-byte point rows (01 01000000 x y, both
        # f64le) built in one (n, 21) uint8 buffer instead of per-element
        # struct.pack
        null = xs.isna().to_numpy() | ys.isna().to_numpy()
        x = xs.astype(np.float64).fillna(0.0).to_numpy()
        y = ys.astype(np.float64).fillna(0.0).to_numpy()
        n = len(x)
        buf = np.empty((n, 21), dtype=np.uint8)
        buf[:, 0] = 1
        buf[:, 1:5] = np.array([1, 0, 0, 0], dtype=np.uint8)
        buf[:, 5:13] = x.view(np.uint8).reshape(n, 8)
        buf[:, 13:21] = y.view(np.uint8).reshape(n, 8)
        return pd.Series(
            [None if null[i] else buf[i].tobytes() for i in range(n)]
        )

    reg("ST_MakePoint", F.pandas_udf(_makepoint_batch, BinaryType()))

    def _buffer_udf(blobs: pd.Series, dists: pd.Series) -> pd.Series:
        key = pd.Series(list(zip(blobs, dists)))
        codes, uniques = pd.factorize(key, use_na_sentinel=False)
        vals = []
        for b, d in uniques:
            if b is None or d is None:
                vals.append(None)
                continue
            vals.append(G.to_wkb(*G.buffer_geom(G.parse_wkb(bytes(b)), float(d))))
        return pd.Series([vals[c] for c in codes])

    reg("ST_Buffer", F.pandas_udf(_buffer_udf, BinaryType()))

    def _simplify_udf(blobs: pd.Series, tols: pd.Series) -> pd.Series:
        key = pd.Series(list(zip(blobs, tols)))
        codes, uniques = pd.factorize(key, use_na_sentinel=False)
        vals = []
        for b, t in uniques:
            if b is None or t is None:
                vals.append(None)
                continue
            vals.append(G.to_wkb(*G.simplify_geom(G.parse_wkb(bytes(b)), float(t))))
        return pd.Series([vals[c] for c in codes])

    reg("ST_Simplify", F.pandas_udf(_simplify_udf, BinaryType()))
    reg("ST_SimplifyPreserveTopology", F.pandas_udf(_simplify_udf, BinaryType()))

    # predicates (ogr_geometry.h:546-556 / ogrsqlitesqlfunctions.cpp:876-883)
    for name, fn in [
        ("ST_Intersects", G.intersects), ("ST_Disjoint", G.disjoint),
        ("ST_Within", G.within), ("ST_Contains", G.contains),
        ("ST_Touches", G.touches), ("ST_Crosses", G.crosses),
        ("ST_Overlaps", G.overlaps), ("ST_Equals", G.equals),
    ]:
        reg(name, F.pandas_udf(
            _binary(lambda a, b, f=fn: bool(f(a, b)), object), BooleanType()
        ))

    reg("ST_Distance",
        F.pandas_udf(_binary(lambda a, b: float(G.distance(a, b)), np.float64),
                     DoubleType()))

    # overlay scalars (convex polygon domain) --------------------------------
    reg("ST_Intersection", F.pandas_udf(_binary(_intersection_wkb), BinaryType()))
    reg("ST_Difference", F.pandas_udf(_binary(_difference_wkb), BinaryType()))
    reg("ST_SymDifference", F.pandas_udf(_binary(_symdifference_wkb), BinaryType()))
    reg("ST_Union", F.pandas_udf(_binary(_union_wkb), BinaryType()))
