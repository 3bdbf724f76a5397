"""FlatGeobuf source/sink (ogr/ogrsf_frmts/flatgeobuf: magic +
size-prefixed flatbuffer header + packed Hilbert R-tree + size-prefixed
feature records; tree layout packedrtree.cpp/h)."""

import numpy as np
import pytest

from gdal_spark.io.flatgeobuf import (COL_LONG, MAGIC, GEOM_POLYGON,
                                      encode_feature, hilbert_of_boxes,
                                      parse_feature, parse_header,
                                      read_flatgeobuf, rtree_search,
                                      rtree_size, write_flatgeobuf)
from gdal_spark.oracle.geom import parse_wkb, to_wkb


def _boxes(n, seed=3):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        x, y = rng.uniform(0, 1000, 2)
        s = float(rng.uniform(1, 20))
        ring = [(x, y), (x + s, y), (x + s, y + s), (x, y + s), (x, y)]
        rows.append((f"img{i:04d}", to_wkb("polygon", [ring]), int(i * 3),
                     (x, y, x + s, y + s)))
    return rows


class TestFeatureRecord:
    def test_polygon_with_hole_roundtrip(self):
        ring = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]
        hole = [(2, 2), (4, 2), (4, 4), (2, 4), (2, 2)]
        wkb = to_wkb("polygon", [ring, hole])
        rec, bbox = encode_feature(wkb, [(0, 11, "a"), (1, COL_LONG, 7)])
        cols = [("image_id", 11), ("n_valid", COL_LONG)]
        w2, props, nxt = parse_feature(rec, 0, cols, GEOM_POLYGON)
        assert w2 == wkb and nxt == len(rec)
        assert props == {"image_id": "a", "n_valid": 7}
        assert bbox == (0.0, 0.0, 10.0, 10.0)

    def test_multipolygon_roundtrip(self):
        ring = [(0, 0), (10, 0), (10, 10), (0, 0)]
        mp = to_wkb("multipolygon",
                    [[ring], [[(20, 20), (30, 20), (30, 30), (20, 20)]]])
        rec, _ = encode_feature(mp, [(0, 11, "m")])
        w2, _, _ = parse_feature(rec, 0, [("image_id", 11)], 6)
        assert w2 == mp


class TestSparkRoundtrip:
    @pytest.fixture(scope="class")
    def fgb_file(self, spark, tmp_path_factory):
        rows = _boxes(37)
        df = spark.createDataFrame(
            [(r[0], r[1], r[2]) for r in rows],
            "image_id string, wkb binary, n_valid long")
        path = str(tmp_path_factory.mktemp("fgb") / "t.fgb")
        n = write_flatgeobuf(df, path, extra_cols={"n_valid": COL_LONG})
        assert n == 37
        return path, rows

    def test_roundtrip_exact(self, spark, fgb_file):
        path, rows = fgb_file
        back, hdr = read_flatgeobuf(spark, path)
        assert hdr["features_count"] == 37
        got = {r["image_id"]: (bytes(r["wkb"]), r["n_valid"])
               for r in back.collect()}
        assert got == {r[0]: (r[1], r[2]) for r in rows}

    def test_features_stored_hilbert_descending(self, spark, fgb_file):
        path, rows = fgb_file
        with open(path, "rb") as f:
            data = f.read()
        assert data[:8] == MAGIC
        hdr = parse_header(data, 8)
        pos = hdr["_end"] + rtree_size(hdr["features_count"],
                                       hdr["index_node_size"])
        bb = np.array([r[3] for r in rows])
        ext = (bb[:, 0].min(), bb[:, 1].min(), bb[:, 2].max(),
               bb[:, 3].max())
        import struct
        keys = []
        while pos < len(data):
            (n,) = struct.unpack_from("<I", data, pos)
            wkb, props, pos = parse_feature(data, pos, hdr["columns"],
                                            hdr["geometry_type"])
            _, d = parse_wkb(wkb)
            pts = np.asarray(d[0])
            h = hilbert_of_boxes([pts[:, 0].min()], [pts[:, 1].min()],
                                 [pts[:, 0].max()], [pts[:, 1].max()], ext)
            keys.append(int(h[0]))
        assert len(keys) == 37
        assert keys == sorted(keys, reverse=True)

    def test_bbox_search_matches_brute_force(self, spark, fgb_file):
        path, rows = fgb_file
        q = (200.0, 200.0, 600.0, 600.0)
        back, _ = read_flatgeobuf(spark, path, bbox=q)
        got = sorted(r["image_id"] for r in back.collect())
        want = sorted(
            r[0] for r in rows
            if not (r[3][0] > q[2] or r[3][2] < q[0]
                    or r[3][1] > q[3] or r[3][3] < q[1]))
        assert got == want
        assert 0 < len(want) < len(rows)  # the filter actually prunes

    def test_index_search_direct(self, fgb_file):
        path, rows = fgb_file
        with open(path, "rb") as f:
            data = f.read()
        hdr = parse_header(data, 8)
        isz = rtree_size(hdr["features_count"], hdr["index_node_size"])
        idx = data[hdr["_end"]:hdr["_end"] + isz]
        # whole-extent query returns every feature offset exactly once
        offs = rtree_search(idx, hdr["features_count"],
                            (-1e9, -1e9, 1e9, 1e9))
        assert len(offs) == 37 and len(set(offs)) == 37
        # empty-region query returns nothing
        assert rtree_search(idx, hdr["features_count"],
                            (5000, 5000, 6000, 6000)) == []

    def test_large_count_multilevel_tree(self, spark, tmp_path):
        rows = _boxes(300, seed=9)  # 300 leaves -> 19 + 2 + 1 level nodes
        df = spark.createDataFrame(
            [(r[0], r[1], r[2]) for r in rows],
            "image_id string, wkb binary, n_valid long")
        path = str(tmp_path / "big.fgb")
        write_flatgeobuf(df, path, extra_cols={"n_valid": COL_LONG})
        q = (100.0, 100.0, 300.0, 300.0)
        back, _ = read_flatgeobuf(spark, path, bbox=q)
        got = sorted(r["image_id"] for r in back.collect())
        want = sorted(
            r[0] for r in rows
            if not (r[3][0] > q[2] or r[3][2] < q[0]
                    or r[3][1] > q[3] or r[3][3] < q[1]))
        assert got == want
