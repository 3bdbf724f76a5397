"""ESRI Shapefile sink/source (.shp + .shx + .dbf) — the reference's
ogr/ogrsf_frmts/shape driver's format, re-derived from the public ESRI
Shapefile Technical Description (July 1998) and the dBASE III header
layout:

* .shp: 100-byte header (file code 9994 big-endian, length in 16-bit
  words, version 1000, shape type, little-endian double bbox), then
  records of (number, content-length-in-words) big-endian headers and
  little-endian shape payloads;
* .shx: the same header plus (offset, content length) word pairs;
* .dbf: version 0x03 header, 32-byte field descriptors (C text / N
  numeric), space-deleted fixed-width records;
* polygon ring convention: OUTER rings clockwise, holes
  counter-clockwise (orientation fixed up from the engine's WKB on
  write, so arbitrary-orientation input round-trips to valid files).

Point, Polygon, and MultiPolygon (rings flattened to parts, grouping by
orientation — the format's own convention) are supported: the shapes a
footprint/overlay pipeline emits.  Single-file family -> driver-streamed
writes like the other io containers.
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame

SHP_POINT = 1
SHP_POLYGON = 5


def _ring_area(r: np.ndarray) -> float:
    return 0.5 * (np.dot(r[:-1, 0], r[1:, 1]) - np.dot(r[1:, 0], r[:-1, 1]))


def _polygon_parts(kind, data):
    """WKB geometry -> list of rings with shapefile orientation (outer
    CW = negative shoelace area with y up, holes CCW)."""
    if kind == "polygon":
        polys = [data]
    elif kind == "multipolygon":
        polys = data
    else:
        raise ValueError(f"not a polygon geometry: {kind}")
    rings = []
    for poly in polys:
        for j, r in enumerate(poly):
            r = np.asarray(r, dtype=np.float64)[:, :2]
            a = _ring_area(r)
            outer = j == 0
            if (outer and a > 0) or (not outer and a < 0):
                r = r[::-1]
            rings.append(r)
    return rings


def _shp_record(kind, data):
    if kind == "point":
        return struct.pack("<idd", SHP_POINT, float(data[0]), float(data[1]))
    rings = _polygon_parts(kind, data)
    allp = np.concatenate(rings, axis=0)
    parts = np.cumsum([0] + [len(r) for r in rings[:-1]]).astype(np.int64)
    buf = [struct.pack("<i4d", SHP_POLYGON,
                       allp[:, 0].min(), allp[:, 1].min(),
                       allp[:, 0].max(), allp[:, 1].max()),
           struct.pack("<ii", len(rings), len(allp))]
    buf.append(np.asarray(parts, dtype="<i4").tobytes())
    buf.append(np.ascontiguousarray(allp, dtype="<f8").tobytes())
    return b"".join(buf)


def _dbf_fields(df: DataFrame, attr_cols):
    fields = []
    for c, t in df.dtypes:
        if c not in attr_cols:
            continue
        if t in ("int", "bigint", "smallint", "tinyint"):
            fields.append((c[:10], "N", 18, 0))
        elif t in ("double", "float"):
            fields.append((c[:10], "N", 18, 6))
        else:
            fields.append((c[:10], "C", 80, 0))
    return fields


def _dbf_value(v, typ, ln, dec):
    if typ == "N":
        if v is None:
            s = ""
        elif dec:
            s = f"{float(v):.{dec}f}"
        else:
            s = str(int(v))
        return s.rjust(ln)[:ln].encode("ascii", "replace")
    s = "" if v is None else str(v)
    return s.ljust(ln)[:ln].encode("utf-8", "replace")[:ln].ljust(ln)


def write_shapefile(df: DataFrame, base_path: str, wkb_col: str = "wkb"
                    ) -> int:
    """Write ``{base_path}.shp/.shx/.dbf``. All features must share one
    shape class (point, or polygon/multipolygon). Returns feature count."""
    from ..oracle import geom as G

    attr_cols = [c for c in df.columns if c != wkb_col]
    fields = _dbf_fields(df, attr_cols)

    records = []   # (shape_bytes, attr_tuple)
    bbox = [np.inf, np.inf, -np.inf, -np.inf]
    shape_type = None
    for row in df.select(wkb_col, *attr_cols).toLocalIterator():
        kind, data = G.parse_wkb(bytes(row[wkb_col]))
        rec = _shp_record(kind, data)
        st = SHP_POINT if kind == "point" else SHP_POLYGON
        if shape_type is None:
            shape_type = st
        elif shape_type != st:
            raise ValueError("mixed shape types in one shapefile")
        if kind == "point":
            xs = np.array([[float(data[0]), float(data[1])]])
        else:
            xs = np.concatenate(
                [np.asarray(r)[:, :2] for r in _polygon_parts(kind, data)])
        bbox[0] = min(bbox[0], xs[:, 0].min())
        bbox[1] = min(bbox[1], xs[:, 1].min())
        bbox[2] = max(bbox[2], xs[:, 0].max())
        bbox[3] = max(bbox[3], xs[:, 1].max())
        records.append((rec, tuple(row[c] for c in attr_cols)))

    n = len(records)
    if n == 0:
        shape_type = SHP_POINT
        bbox = [0.0, 0.0, 0.0, 0.0]

    def header(length_words: int) -> bytes:
        return (struct.pack(">i5i", 9994, 0, 0, 0, 0, 0)
                + struct.pack(">i", length_words)
                + struct.pack("<ii", 1000, shape_type)
                + struct.pack("<4d", *bbox)
                + struct.pack("<4d", 0, 0, 0, 0))

    shp_len = 50 + sum(4 + len(r) // 2 for r, _ in records)
    shx_len = 50 + 4 * n
    with open(base_path + ".shp", "wb") as shp, \
            open(base_path + ".shx", "wb") as shx:
        shp.write(header(shp_len))
        shx.write(header(shx_len))
        off = 50
        for i, (rec, _) in enumerate(records):
            words = len(rec) // 2
            shp.write(struct.pack(">ii", i + 1, words) + rec)
            shx.write(struct.pack(">ii", off, words))
            off += 4 + words

    rec_size = 1 + sum(f[2] for f in fields)
    hdr_size = 32 + 32 * len(fields) + 1
    with open(base_path + ".dbf", "wb") as dbf:
        dbf.write(struct.pack("<B3BIHH20x", 0x03, 26, 8, 17, n,
                              hdr_size, rec_size))
        for name, typ, ln, dec in fields:
            dbf.write(name.encode("ascii").ljust(11, b"\x00")
                      + typ.encode("ascii")
                      + b"\x00" * 4 + bytes([ln, dec]) + b"\x00" * 14)
        dbf.write(b"\x0d")
        for _, attrs in records:
            dbf.write(b" ")
            for (name, typ, ln, dec), v in zip(fields, attrs):
                dbf.write(_dbf_value(v, typ, ln, dec))
        dbf.write(b"\x1a")
    return n


def read_shapefile(spark, base_path: str):
    """Read the trio back to a DataFrame (wkb + typed attributes)."""
    import pandas as pd

    from ..oracle import geom as G

    with open(base_path + ".shp", "rb") as fh:
        blob = fh.read()
    assert struct.unpack(">i", blob[:4])[0] == 9994
    shape_type = struct.unpack("<i", blob[32:36])[0]
    geoms = []
    off = 100
    while off < len(blob):
        _, words = struct.unpack(">ii", blob[off:off + 8])
        body = blob[off + 8:off + 8 + 2 * words]
        off += 8 + 2 * words
        st = struct.unpack("<i", body[:4])[0]
        if st == SHP_POINT:
            x, y = struct.unpack("<dd", body[4:20])
            geoms.append(G.to_wkb("point", np.array([x, y])))
        elif st == SHP_POLYGON:
            nparts, npts = struct.unpack("<ii", body[36:44])
            parts = np.frombuffer(body[44:44 + 4 * nparts], dtype="<i4")
            pts = np.frombuffer(
                body[44 + 4 * nparts:44 + 4 * nparts + 16 * npts],
                dtype="<f8").reshape(npts, 2)
            bounds = list(parts) + [npts]
            rings = [pts[bounds[i]:bounds[i + 1]].copy()
                     for i in range(nparts)]
            # orientation grouping: CW (negative area) = outer starts a
            # new polygon, CCW rings are holes of the last outer
            polys = []
            for r in rings:
                if _ring_area(r) <= 0 or not polys:
                    polys.append([r])
                else:
                    polys[-1].append(r)
            if len(polys) == 1:
                geoms.append(G.to_wkb("polygon", polys[0]))
            else:
                geoms.append(G.to_wkb("multipolygon", polys))
        else:
            raise ValueError(f"unsupported shape type {st}")

    with open(base_path + ".dbf", "rb") as fh:
        dblob = fh.read()
    nrec, hdr_size, rec_size = struct.unpack("<IHH", dblob[4:12])
    fields = []
    p = 32
    while dblob[p] != 0x0D:
        name = dblob[p:p + 11].rstrip(b"\x00").decode("ascii")
        typ = chr(dblob[p + 11])
        ln, dec = dblob[p + 16], dblob[p + 17]
        fields.append((name, typ, ln, dec))
        p += 32
    rows = []
    p = hdr_size
    for _ in range(nrec):
        rec = dblob[p:p + rec_size]
        p += rec_size
        vals = {}
        q = 1
        for name, typ, ln, dec in fields:
            raw = rec[q:q + ln].decode("utf-8", "replace").strip()
            q += ln
            if typ == "N":
                vals[name] = (None if raw == ""
                              else (float(raw) if dec else int(raw)))
            else:
                vals[name] = raw
        rows.append(vals)
    pdf = pd.DataFrame(rows) if rows else pd.DataFrame()
    pdf["wkb"] = geoms
    return spark.createDataFrame(pdf)
