"""FlatGeobuf source/sink (the reference's ogr/ogrsf_frmts/flatgeobuf
driver; format spec at flatgeobuf.org — magic, size-prefixed flatbuffer
Header, optional packed Hilbert R-tree index, size-prefixed Feature
records).

Spark shape: feature records are ENCODED EXECUTOR-SIDE (one Arrow pass
turns each WKB row into its flatbuffer record + bbox), the spatial order
is a distributed sort on the Hilbert key, and only the final single-file
assembly streams through the driver with one partition in flight — the
same writer split as the GeoPackage sink (io/containers.py).  The reader
scans record boundaries driver-side (u32 hops over the feature section,
no parsing) and decodes the records executor-parallel.

Flatbuffers encoding is hand-rolled against the public wire format
(little-endian; tables = i32 soffset to a vtable of u16 slots; vectors /
strings = u32 count + payload; uoffsets point forward), so the container
has no dependency beyond numpy.  The packed R-tree matches
ogr/ogrsf_frmts/flatgeobuf/packedrtree.cpp: 40-byte nodes
(4 x f64 bbox + u64 offset) stored top-down, leaf offsets into the
feature section, items Hilbert-sorted DESCENDING (packedrtree.cpp:101
comparator), node size 16.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"fgb\x03fgb\x00"
NODE_SIZE = 16

# header.fbs GeometryType enum (spec)
GEOM_UNKNOWN, GEOM_POINT, GEOM_LINESTRING, GEOM_POLYGON = 0, 1, 2, 3
GEOM_MULTIPOLYGON = 6
# header.fbs ColumnType enum (spec)
COL_LONG, COL_DOUBLE, COL_STRING = 7, 10, 11


# ---------------------------------------------------------------------------
# minimal flatbuffers builder: each table is one relocatable blob whose
# internal uoffsets/soffsets are relative, so parents embed children verbatim
# ---------------------------------------------------------------------------

class _Blob:
    """A relocatable flatbuffer object: ``data`` laid out assuming its
    START sits at an 8-aligned position; ``entry`` is the offset of the
    root struct (table soffset / vector count word) inside ``data``.
    Internal uoffsets/soffsets are relative, so parents embed children
    verbatim at any 8-aligned position."""

    __slots__ = ("data", "entry")

    def __init__(self, data: bytes, entry: int):
        self.data = data
        self.entry = entry


def _pad8(buf: bytearray):
    while len(buf) % 8:
        buf.append(0)


def _scalar_fmt(kind: str):
    return {"u8": ("<B", 1), "u16": ("<H", 2), "u32": ("<I", 4),
            "u64": ("<Q", 8), "i64": ("<q", 8), "f64": ("<d", 8)}[kind]


def _vector(elem_bytes: bytes, count: int, elem_align: int) -> _Blob:
    """u32 count + payload; entry at the count word, payload
    elem-aligned given an 8-aligned blob start."""
    buf = bytearray()
    pre = 4 if elem_align == 8 else 0
    buf += b"\0" * pre
    buf += struct.pack("<I", count)
    buf += elem_bytes
    return _Blob(bytes(buf), pre)


def _string(s: str) -> _Blob:
    b = s.encode("utf-8")
    return _Blob(struct.pack("<I", len(b)) + b + b"\0", 0)


def _table(fields) -> _Blob:
    """fields: list of (slot_id, kind, value); kind in scalar kinds or
    'ref' (value = _Blob appended after the table).  Returns a blob whose
    entry is the table struct (its leading i32 soffset)."""
    max_id = max(i for i, _, _ in fields) if fields else -1
    n_slots = max_id + 1
    # inline part: fields at offsets where (4 + off) is size-aligned,
    # valid because the table struct itself lands 8-aligned
    inline = bytearray()
    slot_off = [0] * n_slots
    refs = []  # (field_pos_in_inline, blob)
    order = sorted(fields, key=lambda f: -(_scalar_fmt(f[1])[1]
                                           if f[1] != "ref" else 4))
    for fid, kind, val in order:
        sz = 4 if kind == "ref" else _scalar_fmt(kind)[1]
        while (4 + len(inline)) % sz:
            inline.append(0)
        slot_off[fid] = 4 + len(inline)
        if kind == "ref":
            refs.append((len(inline), val))
            inline += b"\0\0\0\0"  # patched on assembly
        else:
            inline += struct.pack(_scalar_fmt(kind)[0], val)
    vt = struct.pack("<HH", 4 + 2 * n_slots, 4 + len(inline))
    vt += b"".join(struct.pack("<H", o) for o in slot_off)
    # assemble: [vtable][pad][table soffset + inline][children...]
    buf = bytearray(vt)
    _pad8(buf)
    entry = len(buf)
    buf += struct.pack("<i", entry - 0)  # soffset: table_pos - vtable_pos
    buf += inline
    for pos, blob in refs:
        _pad8(buf)
        child_entry = len(buf) + blob.entry
        field_pos = entry + 4 + pos
        struct.pack_into("<I", buf, field_pos, child_entry - field_pos)
        buf += blob.data
    return _Blob(bytes(buf), entry)


def _vector_of_tables(blobs) -> _Blob:
    buf = bytearray()
    buf += struct.pack("<I", len(blobs))
    buf += b"\0\0\0\0" * len(blobs)
    for i, blob in enumerate(blobs):
        _pad8(buf)
        entry = len(buf) + blob.entry
        pos = 4 + 4 * i
        struct.pack_into("<I", buf, pos, entry - pos)
        buf += blob.data
    return _Blob(bytes(buf), 0)


def _finish(root: _Blob) -> bytes:
    """size-prefixed flatbuffer: u32 total size + u32 root uoffset + data."""
    buf = bytearray(b"\0\0\0\0")  # root uoffset placeholder
    _pad8(buf)
    entry = len(buf) + root.entry
    struct.pack_into("<I", buf, 0, entry - 0)
    buf += root.data
    return struct.pack("<I", len(buf)) + bytes(buf)


# ---------------------------------------------------------------------------
# minimal flatbuffers reader
# ---------------------------------------------------------------------------

class _Tab:
    __slots__ = ("buf", "pos", "vt", "vt_len")

    def __init__(self, buf, pos):
        self.buf = buf
        self.pos = pos
        (so,) = struct.unpack_from("<i", buf, pos)
        self.vt = pos - so
        (self.vt_len,) = struct.unpack_from("<H", buf, self.vt)

    def _slot(self, fid):
        off = 4 + 2 * fid
        if off + 2 > self.vt_len:
            return 0
        (rel,) = struct.unpack_from("<H", self.buf, self.vt + off)
        return rel

    def scalar(self, fid, fmt, default=0):
        rel = self._slot(fid)
        if not rel:
            return default
        return struct.unpack_from(fmt, self.buf, self.pos + rel)[0]

    def _indirect(self, fid):
        rel = self._slot(fid)
        if not rel:
            return None
        p = self.pos + rel
        (uo,) = struct.unpack_from("<I", self.buf, p)
        return p + uo

    def string(self, fid):
        p = self._indirect(fid)
        if p is None:
            return None
        (n,) = struct.unpack_from("<I", self.buf, p)
        return self.buf[p + 4 : p + 4 + n].decode("utf-8")

    def vector(self, fid, dtype):
        p = self._indirect(fid)
        if p is None:
            return None
        (n,) = struct.unpack_from("<I", self.buf, p)
        return np.frombuffer(self.buf, dtype=dtype, count=n, offset=p + 4)

    def table(self, fid):
        p = self._indirect(fid)
        return None if p is None else _Tab(self.buf, p)

    def table_vector(self, fid):
        p = self._indirect(fid)
        if p is None:
            return []
        (n,) = struct.unpack_from("<I", self.buf, p)
        out = []
        for i in range(n):
            q = p + 4 + 4 * i
            (uo,) = struct.unpack_from("<I", self.buf, q)
            out.append(_Tab(self.buf, q + uo))
        return out


# ---------------------------------------------------------------------------
# Hilbert curve + packed R-tree (packedrtree.cpp:74-146, public flatbush
# algorithm; vectorized uint32 re-derivation)
# ---------------------------------------------------------------------------

HILBERT_MAX = (1 << 16) - 1


def hilbert_u32(x, y):
    """Interleaved Hilbert index of 16-bit (x, y) — flatbush / FlatGeobuf
    packedrtree.cpp:74 bit-twiddling, vectorized."""
    x = np.asarray(x, dtype=np.uint32)
    y = np.asarray(y, dtype=np.uint32)
    M = np.uint32(0xFFFF)
    a = x ^ y
    b = M ^ a
    c = M ^ (x | y)
    d = x & (y ^ M)
    A = a | (b >> 1)
    B = (a >> 1) ^ a
    C = ((c >> 1) ^ (b & (d >> 1))) ^ c
    D = ((a & (c >> 1)) ^ (d >> 1)) ^ d
    a, b, c, d = A, B, C, D
    A = (a & (a >> 2)) ^ (b & (b >> 2))
    B = (a & (b >> 2)) ^ (b & ((a ^ b) >> 2))
    C = c ^ ((a & (c >> 2)) ^ (b & (d >> 2)))
    D = d ^ ((b & (c >> 2)) ^ ((a ^ b) & (d >> 2)))
    a, b, c, d = A, B, C, D
    A = (a & (a >> 4)) ^ (b & (b >> 4))
    B = (a & (b >> 4)) ^ (b & ((a ^ b) >> 4))
    C = c ^ ((a & (c >> 4)) ^ (b & (d >> 4)))
    D = d ^ ((b & (c >> 4)) ^ ((a ^ b) & (d >> 4)))
    a, b, c, d = A, B, C, D
    C = c ^ ((a & (c >> 8)) ^ (b & (d >> 8)))
    D = d ^ ((b & (c >> 8)) ^ ((a ^ b) & (d >> 8)))
    a = C ^ (C >> 1)
    b = D ^ (D >> 1)
    i0 = x ^ y
    i1 = b | (M ^ (i0 | a))
    for sh, m in ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333),
                  (1, 0x55555555)):
        i0 = (i0 | (i0 << sh)) & np.uint32(m)
        i1 = (i1 | (i1 << sh)) & np.uint32(m)
    return (i1 << 1) | i0


def hilbert_of_boxes(minx, miny, maxx, maxy, extent):
    ex0, ey0, ex1, ey1 = extent
    w = ex1 - ex0
    h = ey1 - ey0
    cx = (np.asarray(minx) + np.asarray(maxx)) / 2.0
    cy = (np.asarray(miny) + np.asarray(maxy)) / 2.0
    x = (np.floor(HILBERT_MAX * (cx - ex0) / w).astype(np.uint32)
         if w != 0.0 else np.zeros(len(cx), np.uint32))
    y = (np.floor(HILBERT_MAX * (cy - ey0) / h).astype(np.uint32)
         if h != 0.0 else np.zeros(len(cy), np.uint32))
    return hilbert_u32(x, y)


def _level_num_nodes(num_items: int, node_size: int = NODE_SIZE):
    """Bottom-up node counts per level (packedrtree.cpp:218)."""
    levels = [num_items]
    n = num_items
    while n != 1:
        n = (n + node_size - 1) // node_size
        levels.append(n)
    return levels


def rtree_size(num_items: int, node_size: int = NODE_SIZE) -> int:
    return sum(_level_num_nodes(num_items, node_size)) * 40


def build_rtree(boxes: np.ndarray, feat_offsets: np.ndarray,
                node_size: int = NODE_SIZE) -> bytes:
    """Packed R-tree bytes (40-byte nodes, top-down storage): ``boxes``
    (n, 4) already in final (Hilbert-sorted) feature order,
    ``feat_offsets`` = byte offset of each feature in the feature
    section (packedrtree.cpp generateNodes)."""
    n = boxes.shape[0]
    levels = _level_num_nodes(n, node_size)
    num_nodes = sum(levels)
    nodes = np.zeros((num_nodes, 5), dtype=np.float64)
    offs_u64 = np.zeros(num_nodes, dtype=np.uint64)
    # level bounds in top-down storage order
    level_offsets = []
    acc = num_nodes
    for sz in levels:
        acc -= sz
        level_offsets.append(acc)
    # leaves
    start = level_offsets[0]
    nodes[start : start + n, :4] = boxes
    offs_u64[start : start + n] = feat_offsets.astype(np.uint64)
    # parents: each upper node spans node_size children, offset = index of
    # its first child node
    for lvl in range(len(levels) - 1):
        c0, csz = level_offsets[lvl], levels[lvl]
        p0 = level_offsets[lvl + 1]
        for j in range((csz + node_size - 1) // node_size):
            lo = c0 + j * node_size
            hi = min(lo + node_size, c0 + csz)
            nodes[p0 + j, 0] = nodes[lo:hi, 0].min()
            nodes[p0 + j, 1] = nodes[lo:hi, 1].min()
            nodes[p0 + j, 2] = nodes[lo:hi, 2].max()
            nodes[p0 + j, 3] = nodes[lo:hi, 3].max()
            offs_u64[p0 + j] = lo
    out = bytearray()
    for i in range(num_nodes):
        out += struct.pack("<4dQ", nodes[i, 0], nodes[i, 1], nodes[i, 2],
                           nodes[i, 3], int(offs_u64[i]))
    return bytes(out)


def rtree_search(index: bytes, num_items: int, bbox,
                 node_size: int = NODE_SIZE):
    """Search the packed R-tree bytes for items intersecting ``bbox`` —
    the streamSearch traversal of packedrtree.cpp: walk top-down from the
    root; internal node offsets index their first child, leaf offsets are
    feature byte offsets.  Returns feature byte offsets (ascending)."""
    qx0, qy0, qx1, qy1 = bbox
    levels = _level_num_nodes(num_items, node_size)
    num_nodes = sum(levels)
    arr = np.frombuffer(index, dtype="<f8", count=num_nodes * 5).reshape(
        num_nodes, 5)
    offs = np.frombuffer(index, dtype="<u8", count=num_nodes * 5).reshape(
        num_nodes, 5)[:, 4]
    leaf_start = num_nodes - num_items
    if num_items == 0:
        return []
    # top-down level bounds, to clamp a parent's child run to its level
    bounds = []
    acc = num_nodes
    for sz in levels:
        bounds.append((acc - sz, acc))
        acc -= sz
    hits = []
    queue = [0]
    while queue:
        i = queue.pop()
        if (arr[i, 0] > qx1 or arr[i, 2] < qx0
                or arr[i, 1] > qy1 or arr[i, 3] < qy0):
            continue
        if i >= leaf_start:
            hits.append(int(offs[i]))
        else:
            first = int(offs[i])
            level_end = next(e for s, e in bounds if s <= first < e)
            queue.extend(range(first, min(first + node_size, level_end)))
    return sorted(hits)


# ---------------------------------------------------------------------------
# geometry <-> flatbuffer
# ---------------------------------------------------------------------------

def _rings_to_geometry(rings) -> _Blob:
    """Polygon rings -> Geometry table (ends + xy, spec geometry.fbs)."""
    xy = np.concatenate([np.asarray(r, np.float64).reshape(-1, 2)
                         for r in rings])
    ends = np.cumsum([len(np.asarray(r).reshape(-1, 2))
                      for r in rings]).astype(np.uint32)
    fields = [(1, "ref", _vector(xy.astype("<f8").tobytes(),
                                 xy.shape[0] * 2, 8)),
              (6, "u8", GEOM_POLYGON)]
    if len(rings) > 1:
        fields.append((0, "ref", _vector(ends.astype("<u4").tobytes(),
                                         len(ends), 4)))
    return _table(fields)


def _geometry_blob(kind: str, data) -> _Blob:
    if kind == "polygon":
        return _rings_to_geometry(data)
    # multipolygon: parts vector of Polygon geometries
    parts = _vector_of_tables([_rings_to_geometry(rings) for rings in data])
    return _table([(6, "u8", GEOM_MULTIPOLYGON), (7, "ref", parts)])


def _geometry_to_wkb(g: _Tab, outer_type: int):
    from ..oracle.geom import to_wkb

    t = g.scalar(6, "<B", 0) or outer_type
    if t == GEOM_MULTIPOLYGON:
        polys = []
        for part in g.table_vector(7):
            polys.append(_decode_rings(part))
        return to_wkb("multipolygon", polys)
    return to_wkb("polygon", _decode_rings(g))


def _decode_rings(g: _Tab):
    xy = g.vector(1, "<f8")
    pts = np.asarray(xy, np.float64).reshape(-1, 2)
    ends = g.vector(0, "<u4")
    if ends is None:
        return [pts]
    rings = []
    s = 0
    for e in ends:
        rings.append(pts[s : int(e)])
        s = int(e)
    return rings


def encode_feature(wkb: bytes, props: list) -> tuple:
    """WKB polygon/multipolygon + [(col_idx, kind, value)] -> size-prefixed
    Feature record bytes + (minx, miny, maxx, maxy)."""
    from ..oracle.geom import parse_wkb

    kind, data = parse_wkb(wkb)
    rings_all = data if kind == "polygon" else [r for p in data for r in p]
    pts = np.concatenate([np.asarray(r, np.float64).reshape(-1, 2)
                          for r in rings_all])
    bbox = (float(pts[:, 0].min()), float(pts[:, 1].min()),
            float(pts[:, 0].max()), float(pts[:, 1].max()))
    prop = bytearray()
    for idx, ckind, val in props:
        prop += struct.pack("<H", idx)
        if ckind == COL_STRING:
            b = str(val).encode("utf-8")
            prop += struct.pack("<I", len(b)) + b
        elif ckind == COL_LONG:
            prop += struct.pack("<q", int(val))
        elif ckind == COL_DOUBLE:
            prop += struct.pack("<d", float(val))
        else:
            raise ValueError(f"unsupported column type {ckind}")
    fields = [(0, "ref", _geometry_blob(kind, data))]
    if prop:
        fields.append((1, "ref", _vector(bytes(prop), len(prop), 1)))
    return _finish(_table(fields)), bbox


def build_header(name: str, geometry_type: int, columns: list,
                 features_count: int, envelope=None,
                 index_node_size: int = NODE_SIZE) -> bytes:
    """columns: [(name, ColumnType)] -> size-prefixed Header flatbuffer."""
    cols = _vector_of_tables([
        _table([(0, "ref", _string(cn)), (1, "u8", ct)])
        for cn, ct in columns])
    fields = [(0, "ref", _string(name)),
              (2, "u8", geometry_type),
              (7, "ref", cols),
              (8, "u64", features_count),
              (9, "u16", index_node_size)]
    if envelope is not None:
        fields.append((1, "ref", _vector(
            np.asarray(envelope, "<f8").tobytes(), 4, 8)))
    return _finish(_table(fields))


def parse_header(buf: bytes, pos: int):
    (n,) = struct.unpack_from("<I", buf, pos)
    root_pos = pos + 4
    (uo,) = struct.unpack_from("<I", buf, root_pos)
    t = _Tab(buf, root_pos + uo)
    cols = [(c.string(0), c.scalar(1, "<B", 0)) for c in t.table_vector(7)]
    return dict(
        name=t.string(0),
        geometry_type=t.scalar(2, "<B", 0),
        columns=cols,
        features_count=t.scalar(8, "<Q", 0),
        index_node_size=t.scalar(9, "<H", NODE_SIZE),
        _end=pos + 4 + n,
    )


def parse_feature(buf: bytes, pos: int, columns: list, geometry_type: int):
    """Size-prefixed Feature record -> (wkb, {col: value}, next_pos)."""
    (n,) = struct.unpack_from("<I", buf, pos)
    root_pos = pos + 4
    (uo,) = struct.unpack_from("<I", buf, root_pos)
    t = _Tab(buf, root_pos + uo)
    wkb = _geometry_to_wkb(t.table(0), geometry_type)
    props = {}
    pv = t.vector(1, "<u1")
    if pv is not None:
        raw = pv.tobytes()
        i = 0
        while i < len(raw):
            (idx,) = struct.unpack_from("<H", raw, i)
            i += 2
            cname, ckind = columns[idx]
            if ckind == COL_STRING:
                (ln,) = struct.unpack_from("<I", raw, i)
                props[cname] = raw[i + 4 : i + 4 + ln].decode("utf-8")
                i += 4 + ln
            elif ckind == COL_LONG:
                (props[cname],) = struct.unpack_from("<q", raw, i)
                i += 8
            elif ckind == COL_DOUBLE:
                (props[cname],) = struct.unpack_from("<d", raw, i)
                i += 8
            else:
                raise ValueError(f"unsupported column type {ckind}")
    return wkb, props, pos + 4 + n


# ---------------------------------------------------------------------------
# Spark sink / source
# ---------------------------------------------------------------------------

def write_flatgeobuf(feats, path: str, name: str = "gdal_spark",
                     id_col: str = "image_id", wkb_col: str = "wkb",
                     extra_cols: dict | None = None) -> int:
    """FlatGeobuf sink: per-row flatbuffer records encoded executor-side,
    Hilbert order as a distributed sort, packed R-tree + single-file
    assembly driver-streamed (one partition in flight).  ``extra_cols``
    maps column name -> ColumnType for additional property columns.
    Returns the feature count."""
    import pandas as pd
    from pyspark.sql import functions as F

    extra = extra_cols or {}
    columns = [(id_col, COL_STRING)] + [(c, t) for c, t in extra.items()]

    def enc(batches):
        for pdf in batches:
            recs, bb = [], []
            for r in pdf.itertuples(index=False):
                props = [(0, COL_STRING, getattr(r, id_col))]
                for j, (c, t) in enumerate(extra.items()):
                    props.append((j + 1, t, getattr(r, c)))
                rec, bbox = encode_feature(bytes(getattr(r, wkb_col)), props)
                recs.append(rec)
                bb.append(bbox)
            out = pd.DataFrame({
                "rec": recs,
                "minx": [b[0] for b in bb], "miny": [b[1] for b in bb],
                "maxx": [b[2] for b in bb], "maxy": [b[3] for b in bb],
            })
            yield out

    cols = [id_col, wkb_col] + list(extra)
    enc_df = feats.select(*cols).mapInPandas(
        enc, schema="rec binary, minx double, miny double, "
                    "maxx double, maxy double").persist()
    ext = enc_df.agg(F.min("minx"), F.min("miny"),
                     F.max("maxx"), F.max("maxy")).first()
    extent = (float(ext[0]), float(ext[1]), float(ext[2]), float(ext[3]))

    def add_hilbert(batches):
        for pdf in batches:
            h = hilbert_of_boxes(pdf["minx"].to_numpy(),
                                 pdf["miny"].to_numpy(),
                                 pdf["maxx"].to_numpy(),
                                 pdf["maxy"].to_numpy(), extent)
            pdf = pdf.copy()
            pdf["hkey"] = h.astype(np.int64)
            yield pdf

    with_key = enc_df.mapInPandas(
        add_hilbert, schema="rec binary, minx double, miny double, "
                            "maxx double, maxy double, hkey long")
    # packedrtree.cpp hilbertSort comparator is DESCENDING
    ordered = with_key.orderBy(F.col("hkey").desc())

    boxes, offsets, sizes = [], [], []
    import os
    import tempfile

    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".")
    n = 0
    try:
        with os.fdopen(fd, "wb") as tf:
            off = 0
            for row in ordered.toLocalIterator():
                rec = bytes(row["rec"])
                tf.write(rec)
                boxes.append((row["minx"], row["miny"],
                              row["maxx"], row["maxy"]))
                offsets.append(off)
                off += len(rec)
                n += 1
        enc_df.unpersist()
        header = build_header(name, GEOM_POLYGON, columns, n,
                              envelope=extent)
        index = (build_rtree(np.asarray(boxes, np.float64),
                             np.asarray(offsets, np.int64))
                 if n else b"")
        with open(path, "wb") as f:
            f.write(MAGIC)
            f.write(header)
            f.write(index)
            with open(tmp, "rb") as tf:
                while True:
                    chunk = tf.read(1 << 20)
                    if not chunk:
                        break
                    f.write(chunk)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return n


def read_flatgeobuf(spark, path: str, bbox=None):
    """FlatGeobuf source: the driver hops record sizes (u32 scans, no
    decode) to split the feature section into spans; records decode
    executor-parallel.  ``bbox`` = (minx, miny, maxx, maxy) prunes the
    spans through the packed Hilbert R-tree BEFORE any feature bytes are
    touched (the format's spatial-filter contract, packedrtree.cpp
    streamSearch).  Returns (DataFrame[wkb, props...], header dict)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:8] != MAGIC:
        raise ValueError("not a FlatGeobuf file")
    hdr = parse_header(data, 8)
    pos = hdr["_end"]
    has_index = hdr["features_count"] and hdr["index_node_size"] >= 2
    isz = (rtree_size(hdr["features_count"], hdr["index_node_size"])
           if has_index else 0)
    feat0 = pos + isz
    if bbox is not None:
        if not has_index:
            raise ValueError("bbox filter needs an indexed file")
        offs = rtree_search(data[pos:feat0], hdr["features_count"], bbox,
                            hdr["index_node_size"])
        spans = []
        for o in offs:
            p = feat0 + o
            (n,) = struct.unpack_from("<I", data, p)
            spans.append((p, 4 + n))
    else:
        spans = []
        pos = feat0
        while pos < len(data):
            (n,) = struct.unpack_from("<I", data, pos)
            spans.append((pos, 4 + n))
            pos += 4 + n

    import pandas as pd

    columns = hdr["columns"]
    gtype = hdr["geometry_type"]
    col_names = [c for c, _ in columns]
    bpath = path

    def dec(batches):
        with open(bpath, "rb") as f:
            blob = f.read()
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                wkb, props, _ = parse_feature(blob, int(r.pos), columns,
                                              gtype)
                rows.append(dict(wkb=wkb, **{c: props.get(c)
                                             for c in col_names}))
            yield pd.DataFrame(rows, columns=["wkb"] + col_names)

    schema_parts = ["wkb binary"]
    for c, t in columns:
        schema_parts.append(
            f"{c} " + {COL_STRING: "string", COL_LONG: "long",
                       COL_DOUBLE: "double"}[t])
    spans_df = spark.createDataFrame(
        [(p, s) for p, s in spans], "pos long, size long")
    return spans_df.mapInPandas(dec, schema=", ".join(schema_parts)), hdr
