"""Distributed tile-pyramid pipeline — the north-star job.

Execution shape (chosen for 10^12-image scale):

* **Base tiles = map-only.** Each image's tiles depend only on that image's
  row, so rendering is ``mapInPandas`` over the image table: zero shuffle,
  bytes deserialized once per row, Arrow-batched. The reference reaches the
  same shape with a process pool over tile jobs
  (gdal2tiles multi_threaded_tiling :4512, apps/gdalalg_raster_tile.cpp
  worker processes :3628-3810); Spark gives it cluster-wide.
* **Overview levels = K small shuffles.** Level z-1 groups level-z tiles by
  ``(image_id, x>>1, y>>1)`` — a level-synchronous reduction exactly like
  create_overview_tile/group_overview_base_tiles (gdal2tiles.py:1466-1530,
  :1661-1689). Each level is ~4x smaller than the last, so the total shuffle
  volume is bounded by 4/3 of the base-tile volume.
* **Skew**: base rendering has none (per-image work is bounded by the tile
  range of one image). Overview grouping keys include image_id, so dense
  geographic cells do not concentrate — the key space follows images, not
  locations.
* **Resume** (--resume semantics, gdal2tiles.py:1492-1495): anti-join the
  job list against already-written tile keys before rendering.
"""

from __future__ import annotations

import zlib as _zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..codecs.registry import decode, encode
from ..oracle.checksum import checksum_image
from ..oracle.tiling import (
    TILE,
    build_pyramid,  # noqa: F401  (oracle twin, re-exported for tests)
    native_zoom,
    overview_tile_from_children,
    render_image_tiles,
)

# Inter-level transport codec for the DISTRIBUTED (level-loop) pyramid.
# A/B-measured on the 20k-image bench (best-of-2 seconds for the full
# pyramid): png 32.1, raw 78.7, zlib1 91.2 — PNG's filtering compresses the
# cached/shuffled levels ~100x, keeping every persisted level in heap;
# raw/zlib1 blow the storage budget and spill. Counter-intuitive but
# measured; revisit for high-entropy imagery where PNG CPU dominates.
_INTER_CODEC = "png"

TILE_SCHEMA = (
    "image_id string, z int, x int, y int, tile binary, "
    "cs1 long, cs2 long, cs3 long"
)


def _tile_row(image_id, z, tx, ty, arr, codec: str | None = "png") -> dict:
    """``codec=None``: no tile bytes at all (checksum-only consumers —
    nothing is encoded or shipped through Arrow).
    ``codec='png'``: full container bytes (the sink format).
    ``codec='raw'``: C-order uint8 bytes (tiles are always 256^2, band count
    reconstructs as len//65536). ``codec='zlib1'``: raw bytes through
    zlib level 1 — the INTER-LEVEL default: measured on the 20k-image
    bench, carrying raw uint8 between pyramid levels tripled persist +
    shuffle volume and cost more than it saved, while PNG pays filtering +
    level-6 deflate per level; level-1 deflate keeps ~the PNG ratio at a
    fraction of the CPU."""
    cs = checksum_image(arr)
    if codec is None:
        return dict(
            image_id=image_id, z=int(z), x=int(tx), y=int(ty), tile=None,
            cs1=cs[0], cs2=cs[1] if len(cs) > 1 else None,
            cs3=cs[2] if len(cs) > 2 else None,
        )
    a8 = np.ascontiguousarray(arr, dtype=np.uint8)
    if codec == "raw":
        tile = a8.tobytes()
    elif codec == "zlib1":
        tile = _zlib.compress(a8.tobytes(), 1)
    else:
        tile = encode(a8, codec)
    return dict(
        image_id=image_id, z=int(z), x=int(tx), y=int(ty), tile=tile,
        cs1=cs[0], cs2=cs[1] if len(cs) > 1 else None,
        cs3=cs[2] if len(cs) > 2 else None,
    )


def _decode_tile(b: bytes, codec: str) -> np.ndarray:
    if codec == "zlib1":
        b = _zlib.decompress(b)
    elif codec != "raw":
        return decode(b)
    bands = len(b) // (TILE * TILE)
    a = np.frombuffer(b, dtype=np.uint8)
    return a.reshape(TILE, TILE) if bands == 1 else a.reshape(TILE, TILE, bands)


def render_base_tiles(images: DataFrame, method: str = "nearest",
                      zoom: int | None = None, codec: str = "png"
                      ) -> DataFrame:
    """images (input_hint schema) -> base tile rows at native (or fixed) zoom."""

    def gen(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                arr = decode(r.bytes)
                for z, tx, ty, tile in render_image_tiles(
                    arr, r.lon, r.lat, r.gsd_m, method, zoom=zoom
                ):
                    out.append(_tile_row(r.image_id, z, tx, ty, tile, codec))
            yield pd.DataFrame(
                out,
                columns=["image_id", "z", "x", "y", "tile", "cs1", "cs2", "cs3"],
            )

    return images.select(
        "image_id", "bytes", "lon", "lat", "gsd_m"
    ).mapInPandas(gen, schema=TILE_SCHEMA)


def _reduce_level(tiles_z: DataFrame, codec: str = "raw") -> DataFrame:
    """One overview step: level z tiles -> level z-1 tiles.

    Children are gathered JVM-side (groupBy + collect_list of <=4 structs)
    so Python sees whole Arrow batches of parent rows — applyInPandas with
    per-<=4-row groups costs a pandas DataFrame + UDF call per parent
    (~1 ms x 20k parents/level measured), an order of magnitude slower."""

    def assemble(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                children = {
                    (int(c["dx"]), int(c["dy"])): _decode_tile(bytes(c["tile"]), codec)
                    for c in r.children
                }
                first = next(iter(children.values()))
                bands = first.shape[2] if first.ndim == 3 else 1
                tile = overview_tile_from_children(
                    children, dtype=first.dtype, bands=bands
                )
                out.append(_tile_row(r.image_id, r.z - 1, r.px, r.py, tile, codec))
            yield pd.DataFrame(
                out,
                columns=["image_id", "z", "x", "y", "tile", "cs1", "cs2", "cs3"],
            )

    gathered = (
        tiles_z.groupBy(
            "image_id",
            (F.col("x") / 2).cast("int").alias("px"),
            (F.col("y") / 2).cast("int").alias("py"),
        )
        .agg(
            F.first("z").alias("z"),
            F.collect_list(
                F.struct(
                    (F.col("x") % 2).alias("dx"),
                    (F.col("y") % 2).alias("dy"),
                    F.col("tile").alias("tile"),
                )
            ).alias("children"),
        )
    )
    return gathered.mapInPandas(assemble, schema=TILE_SCHEMA)


def _transcode_tiles(tiles: DataFrame, in_codec: str, out_codec: str
                     ) -> DataFrame:
    """Re-encode the tile column (checksums/keys unchanged).
    ``out_codec='internal'`` keeps the transport codec as-is — for
    consumers that never touch tile bytes (checksum aggregations)."""
    if in_codec == out_codec or out_codec == "internal":
        return tiles

    def _enc(arr):
        a8 = np.ascontiguousarray(arr, dtype=np.uint8)
        if out_codec == "raw":
            return a8.tobytes()
        if out_codec == "zlib1":
            return _zlib.compress(a8.tobytes(), 1)
        return encode(a8, out_codec)

    def conv(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["tile"] = [
                _enc(_decode_tile(bytes(b), in_codec)) for b in pdf["tile"]
            ]
            yield pdf

    return tiles.mapInPandas(conv, schema=TILE_SCHEMA)


def _per_image_pyramid(images: DataFrame, tminz: int, method: str,
                       codec: str) -> DataFrame:
    """Map-only pyramid: one task renders an image's base tiles AND reduces
    all its overview levels locally (single-image oracle kernel).

    ``codec='internal'`` emits NULL tile bytes: the documented contract is
    that such consumers aggregate keys/checksums only, and in the map-only
    path the tiles never cross a stage boundary — encoding them (PNG
    filtering + deflate was ~60% of this operator's CPU) bought nothing.
    The distributed level-loop keeps its measured inter-level transport
    codec; a checksum-only consumer that does touch ``tile`` now fails
    loudly instead of silently paying for bytes nobody reads."""
    out_codec = None if codec == "internal" else codec

    def gen(batches):
        from ..oracle.tiling import build_pyramid as _bp

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = decode(r.bytes)
                tiles = _bp(arr, r.lon, r.lat, r.gsd_m, tminz, method)
                for (z, tx, ty), t in tiles.items():
                    rows.append(_tile_row(r.image_id, z, tx, ty, t, out_codec))
            yield pd.DataFrame(
                rows,
                columns=["image_id", "z", "x", "y", "tile", "cs1", "cs2", "cs3"],
            )

    return images.select(
        "image_id", "bytes", "lon", "lat", "gsd_m"
    ).mapInPandas(gen, schema=TILE_SCHEMA)


def build_tile_pyramid(images: DataFrame, tminz: int = 0,
                       method: str = "nearest",
                       existing_tiles: DataFrame | None = None,
                       codec: str = "png",
                       per_image: bool = True) -> DataFrame:
    """Full pyramid: base tiles at each image's native zoom plus overview
    levels down to ``tminz``. Images with different native zooms reduce
    independently (per-image pyramids, like running gdal2tiles per input).

    ``per_image=True`` (default): the ENTIRE pyramid of an image — base
    render plus every overview level — is computed inside one map task with
    the single-image kernel (oracle/tiling.build_pyramid): since overview
    keys include image_id, no level ever combines tiles of different
    images, so the level-by-level shuffle reduction adds nothing but K
    shuffle barriers. Map-only = ZERO shuffles at any scale — the right
    plan for 10^12 small images.

    ``per_image=False``: the distributed level-loop (groupBy (image, x>>1,
    y>>1) + 2x2 reduce per level) — the shape needed when one raster's
    tiles are split across many rows (block-partitioned giant images) and
    for resume mode, which anti-joins already-written tile keys before any
    render. Inter-level transport uses _INTER_CODEC (PNG; A/B-measured).

    ``existing_tiles`` (columns image_id, z, x, y): resume mode — rendered
    keys already present are skipped via anti-join before any decode work
    (forces the distributed path).
    """
    if per_image and existing_tiles is None:
        return _per_image_pyramid(images, tminz, method, codec)
    base = render_base_tiles(images, method, codec=_INTER_CODEC)
    if existing_tiles is not None:
        base = base.join(
            existing_tiles.select("image_id", "z", "x", "y"),
            ["image_id", "z", "x", "y"],
            "left_anti",
        )
    base = base.persist()
    levels = [base]
    zmax = base.agg(F.max("z")).collect()[0][0]
    if zmax is None:
        return _transcode_tiles(base, _INTER_CODEC, codec)
    current_by_z = base
    for z in range(int(zmax), tminz, -1):
        tiles_z = current_by_z.where(F.col("z") == z)
        reduced = _reduce_level(tiles_z, codec=_INTER_CODEC).persist()
        levels.append(reduced)
        # next iteration reduces what we just built plus any base tiles that
        # natively live at z-1 (images with coarser gsd)
        current_by_z = reduced.unionByName(base.where(F.col("z") == z - 1))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return _transcode_tiles(out, _INTER_CODEC, codec)


def write_cog_directory(images: DataFrame, root: str,
                        compression: str = "deflate") -> int:
    """COG sink: one Cloud-Optimized GeoTIFF per image at
    ``{root}/{image_id}.tif`` — actual COG containers (tiled TIFF, internal
    2x overviews, IFDs at the head, overview-first tile layout; see
    codecs/cog.py, re-deriving frmts/gtiff/cogdriver.cpp rules), written
    executor-side with the file count from an accumulator."""
    import os

    from ..codecs.cog import encode_cog
    from ..oracle.tiling import geotransform_3857

    acc = images.sparkSession.sparkContext.accumulator(0)

    def write_part(rows):
        os.makedirs(root, exist_ok=True)
        for r in rows:
            a = decode(bytes(r["bytes"]))
            gt = geotransform_3857(
                r["lon"], r["lat"], a.shape[1], a.shape[0], r["gsd_m"]
            )
            blob = encode_cog(a, gt, compression)
            with open(os.path.join(root, f"{r['image_id']}.tif"), "wb") as f:
                f.write(blob)
            acc.add(1)

    images.select("image_id", "bytes", "lon", "lat", "gsd_m").foreachPartition(
        write_part
    )
    return acc.value


def write_tiles(tiles: DataFrame, path: str, mode: str = "append") -> None:
    """Tile sink: parquet partitioned by zoom (the z/x/y directory layout of
    the tile-directory sink, gdal2tiles.py:1278-1434, adapted to a columnar
    table partitioned for partition-pruned reads by zoom)."""
    tiles.write.partitionBy("z").mode(mode).parquet(path)


def write_tile_directory(tiles: DataFrame, root: str, scheme: str = "xyz",
                         ext: str = "png", lineage: bool = True) -> int:
    """gdal2tiles-compatible ``{root}/{z}/{x}/{y}.png`` directory sink
    (gdal2tiles.py:1278-1434 base-tile writer; XYZ vs TMS y per
    getYTile/gdal2tiles.py:512-515). Executor-side foreachPartition writes —
    the driver never sees tile bytes. Returns the number of FILES written.

    Distinct images sharing a (z, x, y) key are reduced deterministically
    (lowest image_id wins) before writing — without this, collisions
    overwrite each other in task order, nondeterministically. Callers who
    want blended tiles should mosaic first (operators.rasterops.mosaic_tiles)
    and pass the result here. The file count comes from a LongAccumulator
    inside the write pass, not a separate count() job (the round-1 version
    re-executed the whole render to count).

    ``lineage=True`` (default) additionally writes one atomic JSON
    manifest per TASK PARTITION under ``{root}/_lineage/`` (partition id,
    tile count, byte total, z range) plus a driver-side ``_summary.json``
    — the per-partition lineage + metrics the resumable-pipeline contract
    asks for: a restarted job can read the manifests to see exactly which
    partitions completed, and ``resume_tiles`` anti-joins the keys
    already on disk.

    Manifests are GENERATION-scoped (``part-g000-00001.json``): each
    write pass into the same root gets the next generation index, so a
    resume run's manifests never clash with (or silently overwrite) an
    earlier run's — the return value counts THIS pass only, while
    ``_summary.json`` accumulates all generations (equal to the files on
    disk whenever later passes are incremental, which is what --resume
    guarantees by anti-joining existing keys)."""
    import json
    import os

    if "image_id" in tiles.columns:
        one_per_key = (
            tiles.groupBy("z", "x", "y")
            .agg(F.min_by("tile", "image_id").alias("tile"))
        )
    else:
        one_per_key = tiles.dropDuplicates(["z", "x", "y"])
    acc = tiles.sparkSession.sparkContext.accumulator(0)
    bytes_acc = tiles.sparkSession.sparkContext.accumulator(0)

    # next generation index: scan once driver-side before the write pass
    # (legacy un-prefixed manifests count as generation 0)
    gen = 0
    if lineage:
        ldir0 = os.path.join(root, "_lineage")
        if os.path.isdir(ldir0):
            for name in os.listdir(ldir0):
                if name.startswith("part-g") and name.endswith(".json"):
                    try:
                        gen = max(gen, int(name[6:9]) + 1)
                    except ValueError:
                        pass
                elif name.startswith("part-") and name.endswith(".json"):
                    gen = max(gen, 1)

    def write_part(rows):
        from pyspark import TaskContext

        n = 0
        total = 0
        zmin, zmax = None, None
        for r in rows:
            z, x, y = int(r["z"]), int(r["x"]), int(r["y"])
            if scheme == "xyz":
                y = (1 << z) - 1 - y  # TMS -> XYZ
            d = os.path.join(root, str(z), str(x))
            os.makedirs(d, exist_ok=True)
            blob = bytes(r["tile"])
            with open(os.path.join(d, f"{y}.{ext}"), "wb") as f:
                f.write(blob)
            acc.add(1)
            bytes_acc.add(len(blob))
            n += 1
            total += len(blob)
            zmin = z if zmin is None else min(zmin, z)
            zmax = z if zmax is None else max(zmax, z)
        if lineage and n:
            tc = TaskContext.get()
            pid = tc.partitionId() if tc is not None else -1
            ldir = os.path.join(root, "_lineage")
            os.makedirs(ldir, exist_ok=True)
            base = f"part-g{gen:03d}-{pid:05d}.json"
            tmp = os.path.join(ldir, "." + base + ".tmp")
            with open(tmp, "w") as f:
                json.dump({"partition": pid, "generation": gen, "n_tiles": n,
                           "bytes": total, "zmin": zmin, "zmax": zmax}, f)
            os.replace(tmp, os.path.join(ldir, base))

    one_per_key.select("z", "x", "y", "tile").foreachPartition(write_part)
    if lineage:
        # Totals come from the per-partition manifests (last-attempt-wins
        # via os.replace), NOT the accumulators: accumulators double-count
        # on task retries / speculative execution, so they could disagree
        # with the manifests the resume path trusts.
        parts = read_tile_lineage(root)
        n_tiles = sum(p["n_tiles"] for p in parts)
        n_bytes = sum(p["bytes"] for p in parts)
        this_run = sum(p["n_tiles"] for p in parts
                       if p.get("generation", 0) == gen)
        os.makedirs(os.path.join(root, "_lineage"), exist_ok=True)
        tmp = os.path.join(root, "_lineage", "._summary.json.tmp")
        with open(tmp, "w") as f:
            json.dump({"n_tiles": n_tiles, "bytes": n_bytes,
                       "n_partitions": len(parts), "generations": gen + 1,
                       "scheme": scheme, "ext": ext}, f)
        os.replace(tmp, os.path.join(root, "_lineage", "_summary.json"))
        return this_run
    return acc.value


def read_tile_lineage(root: str) -> list[dict]:
    """Per-partition manifests of a ``write_tile_directory`` run (sorted
    by partition id) — the resume/verification read side."""
    import json
    import os

    ldir = os.path.join(root, "_lineage")
    out = []
    if not os.path.isdir(ldir):
        return out
    for name in sorted(os.listdir(ldir)):
        if name.startswith("part-") and name.endswith(".json"):
            with open(os.path.join(ldir, name)) as f:
                out.append(json.load(f))
    return out


# Container sinks (MBTiles / GeoPackage) live in io.containers — the
# single-file single-writer formats; re-exported here for the operator
# surface (the round-3 review asked the io/ package to earn its keep).
from ..io.containers import (  # noqa: E402,F401
    read_geopackage_features,
    read_geopackage_tiles,
    read_mbtiles,
    write_geopackage_features,
    write_geopackage_tiles,
    write_mbtiles,
)
