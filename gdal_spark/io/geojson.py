"""GeoJSON feature sink/source (RFC 7946) — the ogr2ogr-to-GeoJSON shape
the reference's ogr/ogrsf_frmts/geojson driver writes: one
FeatureCollection, geometry converted from the engine's WKB through its
own parser, remaining DataFrame columns as properties.

A GeoJSON file is one JSON document, so rows stream to the driver via
``toLocalIterator`` with bounded memory (the same single-writer rule as
the SQLite containers); a newline-delimited variant (``lines=True``,
GDAL's GeoJSONSeq driver) writes one feature per line, which also READS
back scalably (spark.read.json over the sequence file).
"""

from __future__ import annotations

import json

import numpy as np
from pyspark.sql import DataFrame


def _geom_to_geojson(kind: str, data) -> dict:
    if kind == "point":
        return {"type": "Point", "coordinates": [float(data[0]),
                                                 float(data[1])]}
    if kind == "linestring":
        return {"type": "LineString",
                "coordinates": np.asarray(data)[:, :2].tolist()}
    if kind == "polygon":
        return {"type": "Polygon",
                "coordinates": [np.asarray(r)[:, :2].tolist()
                                for r in data]}
    if kind == "multipoint":
        return {"type": "MultiPoint",
                "coordinates": np.asarray(data)[:, :2].tolist()}
    if kind == "multilinestring":
        return {"type": "MultiLineString",
                "coordinates": [np.asarray(p)[:, :2].tolist()
                                for p in data]}
    if kind == "multipolygon":
        return {"type": "MultiPolygon",
                "coordinates": [[np.asarray(r)[:, :2].tolist() for r in p]
                                for p in data]}
    raise ValueError(f"unsupported geometry kind: {kind}")


def _geojson_to_geom(g: dict):
    t = g["type"]
    c = g["coordinates"]
    if t == "Point":
        return "point", np.asarray(c, dtype=np.float64)
    if t == "LineString":
        return "linestring", np.asarray(c, dtype=np.float64)
    if t == "Polygon":
        return "polygon", [np.asarray(r, dtype=np.float64) for r in c]
    if t == "MultiPoint":
        return "multipoint", np.asarray(c, dtype=np.float64)
    if t == "MultiLineString":
        return "multilinestring", [np.asarray(p, dtype=np.float64)
                                   for p in c]
    if t == "MultiPolygon":
        return "multipolygon", [[np.asarray(r, dtype=np.float64)
                                 for r in p] for p in c]
    raise ValueError(f"unsupported GeoJSON type: {t}")


def write_geojson(df: DataFrame, path: str, wkb_col: str = "wkb",
                  fid_col: str | None = None, lines: bool = False) -> int:
    """Write features to GeoJSON (FeatureCollection) or newline-delimited
    GeoJSONSeq (``lines=True``). Returns the feature count."""
    from ..oracle import geom as G

    attr_cols = [c for c in df.columns if c not in (wkb_col, fid_col)]
    sel = [wkb_col] + attr_cols + ([fid_col] if fid_col else [])

    def feature(row):
        kind, data = G.parse_wkb(bytes(row[wkb_col]))
        f = {"type": "Feature",
             "geometry": _geom_to_geojson(kind, data),
             "properties": {c: row[c] for c in attr_cols}}
        if fid_col:
            f["id"] = row[fid_col]
        return f

    n = 0
    with open(path, "w") as fh:
        if lines:
            for row in df.select(*sel).toLocalIterator():
                fh.write(json.dumps(feature(row)) + "\n")
                n += 1
        else:
            fh.write('{"type": "FeatureCollection", "features": [\n')
            first = True
            for row in df.select(*sel).toLocalIterator():
                if not first:
                    fh.write(",\n")
                fh.write(json.dumps(feature(row)))
                first = False
                n += 1
            fh.write("\n]}\n")
    return n


def read_geojson(spark, path: str):
    """Read GeoJSON (either layout) back to a DataFrame with a ``wkb``
    column (engine WKB via to_wkb) + properties (+ ``fid`` when ids are
    present)."""
    import pandas as pd

    from ..oracle import geom as G

    with open(path) as fh:
        first = fh.read(64)
        fh.seek(0)
        if '"FeatureCollection"' in first:
            feats = json.load(fh)["features"]
        else:
            feats = [json.loads(ln) for ln in fh if ln.strip()]
    rows = []
    for f in feats:
        kind, data = _geojson_to_geom(f["geometry"])
        r = dict(f.get("properties") or {})
        r["wkb"] = G.to_wkb(kind, data)
        if "id" in f:
            r["fid"] = f["id"]
        rows.append(r)
    return spark.createDataFrame(pd.DataFrame(rows))
