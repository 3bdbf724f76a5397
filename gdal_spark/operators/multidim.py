"""Multidimensional (NetCDF-style) arrays as chunked Spark tables — a v1
slice of the reference's multidim data model
(/root/reference/gcore/multidim/, GDALMDArray: named dimensions, chunked
storage, hyperslab views `GetView`/Read with start+count per dimension,
and whole-dimension statistics).

Spark mapping (SURVEY §1.1 "maps to ArrayType columns"): one ROW per chunk,

    (var string, chunk array<long>, shape array<int>, data array<double>)

with ``chunk`` the per-dimension chunk index, ``shape`` the (edge-truncated)
chunk extents, and ``data`` the C-order values. Metadata (dimension names,
sizes, chunk sizes) travels in an ``MDMeta``. The shape is exactly a Zarr/
NetCDF chunk grid, which is what a 100 TB array store looks like: hyperslab
selection prunes to the touched chunks with plain integer predicates
(partition-prunable when the table is written partitioned by chunk), and
per-dimension reductions are per-chunk numpy partials + one groupBy on the
surviving chunk coordinates — no per-element rows ever exist.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

MD_SCHEMA = ("var string, chunk array<bigint>, shape array<int>, "
             "data array<double>")


@dataclass
class MDMeta:
    """Dimension metadata for one variable (GDALMDArray analogue)."""
    var: str
    dims: list  # [(name, size), ...]
    chunks: list  # chunk size per dimension

    @property
    def sizes(self):
        return [s for _, s in self.dims]

    def n_chunks(self):
        return [int(np.ceil(s / c)) for s, c in zip(self.sizes, self.chunks)]


def array_to_chunks(spark: SparkSession, arr: np.ndarray, meta: MDMeta
                    ) -> DataFrame:
    """Materialize a numpy ND array as the chunked table (test/ingest
    helper; production arrays arrive already chunked)."""
    rows = []
    grids = [range(n) for n in meta.n_chunks()]
    import itertools

    for ci in itertools.product(*grids):
        slices = tuple(
            slice(i * c, min((i + 1) * c, s))
            for i, c, s in zip(ci, meta.chunks, meta.sizes)
        )
        block = np.ascontiguousarray(arr[slices], dtype=np.float64)
        rows.append({
            "var": meta.var,
            "chunk": [int(x) for x in ci],
            "shape": [int(x) for x in block.shape],
            "data": block.ravel().tolist(),
        })
    return spark.createDataFrame(pd.DataFrame(rows), schema=MD_SCHEMA)


def hyperslab(df: DataFrame, meta: MDMeta, starts, counts) -> DataFrame:
    """GDALMDArray::Read(start, count): the chunked subset of the slab.

    Chunk pruning is a pure integer predicate per dimension (chunk index
    range overlap) — the scan never touches chunks outside the slab; the
    in-chunk slice runs vectorized per chunk. Output rows keep the chunk
    layout with ``chunk`` re-based to the slab origin and ``shape`` the
    clipped extents."""
    nd = len(meta.dims)
    starts = [int(s) for s in starts]
    counts = [int(c) for c in counts]
    ends = [s + c for s, c in zip(starts, counts)]
    cond = F.lit(True)
    for d in range(nd):
        c = meta.chunks[d]
        lo = starts[d] // c
        hi = (ends[d] - 1) // c
        cd = F.element_at("chunk", d + 1)
        cond = cond & (cd >= lo) & (cd <= hi)
        if d == 0 and "c0" in df.columns:
            # partitioned store: the same range on the c0 PARTITION column
            # becomes a PartitionFilter — pruned chunk directories are
            # never even listed, the multidim scale path
            cond = cond & (F.col("c0") >= lo) & (F.col("c0") <= hi)
    pruned = df.where(F.col("var") == meta.var).where(cond)
    if "c0" in pruned.columns:
        pruned = pruned.drop("c0")

    chunks = list(meta.chunks)

    def slice_chunks(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                ci = list(r.chunk)
                shape = list(r.shape)
                block = np.asarray(r.data, dtype=np.float64).reshape(shape)
                slc = []
                new_chunk = []
                ok = True
                for d in range(nd):
                    off = ci[d] * chunks[d]
                    lo = max(starts[d], off) - off
                    hi = min(ends[d], off + shape[d]) - off
                    if hi <= lo:
                        ok = False
                        break
                    slc.append(slice(lo, hi))
                    new_chunk.append(ci[d] - starts[d] // chunks[d])
                if not ok:
                    continue
                sub = np.ascontiguousarray(block[tuple(slc)])
                out.append({
                    "var": r.var, "chunk": new_chunk,
                    "shape": [int(x) for x in sub.shape],
                    "data": sub.ravel().tolist(),
                })
            yield pd.DataFrame(
                out, columns=["var", "chunk", "shape", "data"]
            )

    return pruned.mapInPandas(slice_chunks, schema=MD_SCHEMA)


def chunks_to_array(df: DataFrame, meta_or_nd) -> np.ndarray:
    """Assemble a (small) chunked result back into numpy (driver-side;
    tests / final small outputs only)."""
    pdf = df.toPandas()
    nd = (len(meta_or_nd.dims)
          if isinstance(meta_or_nd, MDMeta) else int(meta_or_nd))
    if len(pdf) == 0:
        return np.zeros((0,) * nd)
    # chunk extents per dimension from the max chunk index + shapes
    chunk_sizes = [
        {} for _ in range(nd)
    ]
    for r in pdf.itertuples(index=False):
        for d in range(nd):
            chunk_sizes[d][int(r.chunk[d])] = int(r.shape[d])
    offs = []
    totals = []
    for d in range(nd):
        sizes = chunk_sizes[d]
        off = {}
        acc = 0
        for i in sorted(sizes):
            off[i] = acc
            acc += sizes[i]
        offs.append(off)
        totals.append(acc)
    out = np.zeros(totals)
    for r in pdf.itertuples(index=False):
        slc = tuple(
            slice(offs[d][int(r.chunk[d])],
                  offs[d][int(r.chunk[d])] + int(r.shape[d]))
            for d in range(nd)
        )
        out[slc] = np.asarray(r.data, dtype=np.float64).reshape(list(r.shape))
    return out


def reduce_dim(df: DataFrame, meta: MDMeta, dim: int, op: str = "mean"
               ) -> DataFrame:
    """Reduce one dimension away (GDALMDArray statistics / GetResampled
    analogue): per-chunk numpy partials (sum/count or min/max along the
    axis) + one groupBy on the surviving chunk coordinates. ``op``:
    mean | sum | min | max."""
    nd = len(meta.dims)

    def partials(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                block = np.asarray(r.data, dtype=np.float64).reshape(list(r.shape))
                if op in ("mean", "sum"):
                    red = block.sum(axis=dim)
                elif op == "min":
                    red = block.min(axis=dim)
                else:
                    red = block.max(axis=dim)
                keep_chunk = [int(c) for d, c in enumerate(r.chunk) if d != dim]
                out.append({
                    "var": r.var, "chunk": keep_chunk,
                    "shape": [int(x) for x in red.shape],
                    "data": np.ascontiguousarray(red).ravel().tolist(),
                    "cnt": int(r.shape[dim]),
                })
            yield pd.DataFrame(
                out, columns=["var", "chunk", "shape", "data", "cnt"]
            )

    part = df.where(F.col("var") == meta.var).mapInPandas(
        partials, schema=MD_SCHEMA + ", cnt long"
    )
    merge_expr = {
        "mean": "+", "sum": "+", "min": "min", "max": "max",
    }[op]

    def merge(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                arrs = [
                    np.asarray(d, dtype=np.float64).reshape(list(s))
                    for d, s in zip(r.datas, r.shapes)
                ]
                if merge_expr == "+":
                    acc = np.sum(arrs, axis=0)
                    if op == "mean":
                        acc = acc / sum(r.cnts)
                elif merge_expr == "min":
                    acc = np.min(arrs, axis=0)
                else:
                    acc = np.max(arrs, axis=0)
                out.append({
                    "var": r.var, "chunk": list(r.chunk),
                    "shape": [int(x) for x in acc.shape],
                    "data": acc.ravel().tolist(),
                })
            yield pd.DataFrame(out, columns=["var", "chunk", "shape", "data"])

    gathered = part.groupBy("var", "chunk").agg(
        F.collect_list("data").alias("datas"),
        F.collect_list("shape").alias("shapes"),
        F.collect_list("cnt").alias("cnts"),
    )
    return gathered.mapInPandas(merge, schema=MD_SCHEMA)


# ---------------------------------------------------------------------------
# Partitioned store + group hierarchy (gcore/multidim GDALGroup /
# GDALMDArray persistence analogue)
# ---------------------------------------------------------------------------

def write_md_store(df: DataFrame, metas, path: str,
                   attrs: dict | None = None) -> None:
    """Persist chunked variables as a PARTITIONED parquet store — the
    multidim write path (gcore/multidim/gdalmultidim_array.cpp CreateCopy
    / Zarr chunk layout):

    * layout ``path/var=<name>/c0=<first-chunk-index>/part-*.parquet`` —
      hyperslab reads prune whole directories on (var, c0) with plain
      partition predicates before any file is opened;
    * group hierarchy + dimension metadata in a ``_md_meta.json`` sidecar:
      variable names are slash paths (``/model/era5/t2m``) and every
      prefix is a GDALGroup (GetGroupNames/OpenGroup semantics), with
      per-group and root attributes (GDALAttribute analogue).

    ``metas``: list of MDMeta (or one).  One shuffle-free write: c0 is
    derived column math and partitionBy drives the layout."""
    import json
    import os

    if isinstance(metas, MDMeta):
        metas = [metas]
    out = df.withColumn("c0", F.element_at("chunk", 1))
    out.write.mode("overwrite").partitionBy("var", "c0").parquet(path)
    side = {
        "attrs": attrs or {},
        "vars": {
            m.var: {"dims": [[n, int(s)] for n, s in m.dims],
                    "chunks": [int(c) for c in m.chunks]}
            for m in metas
        },
    }
    groups: dict = {}
    for m in metas:
        parts = [p for p in m.var.split("/") if p]
        for i in range(len(parts)):
            g = "/" + "/".join(parts[:i])
            entry = groups.setdefault(g.rstrip("/") or "/",
                                      {"groups": [], "vars": []})
            child = parts[i]
            if i == len(parts) - 1:
                entry["vars"].append(child)
            elif child not in entry["groups"]:
                entry["groups"].append(child)
    side["groups"] = groups
    with open(os.path.join(path, "_md_meta.json"), "w") as f:
        json.dump(side, f, indent=1, sort_keys=True)


def open_md_store(spark: SparkSession, path: str):
    """-> (DataFrame over every chunk row, {var: MDMeta}, sidecar dict).
    The returned frame keeps var/c0 as partition columns, so
    ``hyperslab`` predicates on them become partition filters
    (PartitionFilters in the scan, zero I/O for pruned chunks)."""
    import json
    import os

    with open(os.path.join(path, "_md_meta.json")) as f:
        side = json.load(f)
    metas = {
        v: MDMeta(var=v, dims=[(n, s) for n, s in spec["dims"]],
                  chunks=list(spec["chunks"]))
        for v, spec in side["vars"].items()
    }
    df = spark.read.parquet(path)
    return df, metas, side


def md_group_tree(side: dict) -> dict:
    """Sidecar -> nested {name: {"groups": {...}, "vars": [...]}} tree
    (GDALGroup::GetGroupNames / GetMDArrayNames walk)."""
    groups = side.get("groups", {})

    def build(g):
        entry = groups.get(g, {"groups": [], "vars": []})
        base = g.rstrip("/")
        return {
            "vars": sorted(entry["vars"]),
            "groups": {c: build(f"{base}/{c}") for c in sorted(entry["groups"])},
        }

    return build("/")


def md_compare(ref: DataFrame, inp: DataFrame,
               tolerance: float = 0.0) -> DataFrame:
    """gdal mdim compare (apps/gdalalg_mdim_compare.cpp): structural +
    value comparison of two chunked multidim stores; empty result means
    identical (the reference's return-code-0 path).

    Report rows (var, aspect, n, max_abs):
      * aspect 'only_in_ref' / 'only_in_input' — arrays missing on one
        side (the reference's set_difference walk, :147/:169), n = chunk
        count;
      * aspect 'shape' — common chunks whose per-chunk extents differ
        (dimension mismatch, :248);
      * aspect 'values' — total differing values over common same-shape
        chunks (abs diff > tolerance), max_abs = the largest difference
        (CompareArray, :279).

    Distributed shape: ONE full-outer equi-join on (var, chunk) — the
    chunk grid key, partition-prunable — then pure JVM array math
    (zip_with / filter / aggregate / array_max) per chunk and one
    groupBy(var); no Python worker, no driver-side data."""
    a = ref.select("var", "chunk", F.col("shape").alias("a_shape"),
                   F.col("data").alias("a_data"))
    b = inp.select("var", "chunk", F.col("shape").alias("b_shape"),
                   F.col("data").alias("b_data"))
    j = a.join(b, ["var", "chunk"], "full_outer")

    only_ref = (j.where(F.col("b_data").isNull())
                .groupBy("var")
                .agg(F.count("*").alias("n"))
                .select("var", F.lit("only_in_ref").alias("aspect"),
                        "n", F.lit(None).cast("double").alias("max_abs")))
    only_inp = (j.where(F.col("a_data").isNull())
                .groupBy("var")
                .agg(F.count("*").alias("n"))
                .select("var", F.lit("only_in_input").alias("aspect"),
                        "n", F.lit(None).cast("double").alias("max_abs")))
    both = j.where(F.col("a_data").isNotNull()
                   & F.col("b_data").isNotNull())
    shape_mism = (both.where(F.col("a_shape") != F.col("b_shape"))
                  .groupBy("var")
                  .agg(F.count("*").alias("n"))
                  .select("var", F.lit("shape").alias("aspect"), "n",
                          F.lit(None).cast("double").alias("max_abs")))
    tol = F.lit(float(tolerance))
    diffs = F.zip_with("a_data", "b_data",
                       lambda x, y: F.abs(x - y))
    per_chunk = (both.where(F.col("a_shape") == F.col("b_shape"))
                 .select("var",
                         F.size(F.filter(diffs, lambda d: d > tol))
                         .cast("long").alias("nd"),
                         F.array_max(diffs).alias("md")))
    values = (per_chunk.groupBy("var")
              .agg(F.sum("nd").alias("n"), F.max("md").alias("max_abs"))
              .where(F.col("n") > 0)
              .select("var", F.lit("values").alias("aspect"), "n",
                      "max_abs"))
    return (only_ref.unionByName(only_inp).unionByName(shape_mism)
            .unionByName(values))


def md_mosaic(parts, var: str | None = None):
    """gdal mdim mosaic (apps/gdalalg_mdim_mosaic.cpp): assemble one
    logical array from several multidim sources.  The reference aligns
    sources by their 1-D indexing variables (regular spacing, consistent
    across datasets, :474-:542); in this engine's chunk-table model that
    contract becomes: every source declares a per-dimension element
    ``origin`` into the global grid, chunk-aligned, with identical chunk
    sizes — the same information the indexing variables carry.

    ``parts``: list of (chunks_df, MDMeta, origin) in mosaic order.
    Later sources win on collision (the gdalbuildvrt last-wins rule the
    raster mosaic operator also implements).

    Distributed shape: re-keying a source's chunks into the global grid
    is pure JVM column math (transform(chunk, +origin/chunksize) — ZERO
    shuffle); the only shuffle is one groupBy(var, chunk) max_by(src)
    to resolve overlaps.  Overlap resolution is CHUNK-granular (whole
    chunks replace; where sources overlap they must do so at chunk
    boundaries — the reference materializes value-level, documented
    delta).  Returns (chunks_df, MDMeta) for the mosaic."""
    if not parts:
        raise ValueError("md_mosaic needs at least one source")
    base_meta = parts[0][1]
    nd = len(base_meta.dims)
    name = var or base_meta.var
    sizes = [0] * nd
    outs = []
    for src_idx, (df, meta, origin) in enumerate(parts):
        if len(meta.dims) != nd:
            raise ValueError("all sources must share dimensionality "
                             "(reference: 'same number of dimensions')")
        if list(meta.chunks) != list(base_meta.chunks):
            raise ValueError("chunk sizes must match across sources "
                             "(the indexing-variable spacing contract)")
        off_chunks = []
        for d in range(nd):
            o = int(origin[d])
            if o % meta.chunks[d] != 0:
                raise ValueError(
                    f"origin[{d}]={o} not aligned to chunk "
                    f"{meta.chunks[d]} (reference: indexing values must "
                    "sit on the common grid)")
            off_chunks.append(o // meta.chunks[d])
            sizes[d] = max(sizes[d], o + meta.dims[d][1])
        shifted = df.where(F.col("var") == meta.var).select(
            F.lit(name).alias("var"),
            F.expr("transform(chunk, (c, i) -> c + element_at(array({}), "
                   "i + 1))".format(
                       ", ".join(str(int(x)) for x in off_chunks)))
            .alias("chunk"),
            "shape", "data", F.lit(src_idx).alias("src"))
        outs.append(shifted)
    allc = outs[0]
    for o in outs[1:]:
        allc = allc.unionByName(o)
    merged = (allc.groupBy("var", "chunk")
              .agg(F.max_by("shape", "src").alias("shape"),
                   F.max_by("data", "src").alias("data")))
    out_meta = MDMeta(name,
                      [(base_meta.dims[d][0], sizes[d]) for d in range(nd)],
                      list(base_meta.chunks))
    return merged, out_meta


def md_reproject(df: DataFrame, meta: MDMeta, src_gt,
                 to_lonlat, from_lonlat,
                 method: str = "nearest") -> tuple:
    """gdal mdim reproject (apps/gdalalg_mdim_reproject.cpp): warp the
    two horizontal dimensions of a multidim array to EPSG:4326 through
    the engine's closed-form transform pairs (mercator/UTM/LCC/polar/
    Albers/sinusoidal — oracle/warp.warp_proj_to_4326, all 14 kernels).

    Contract: the trailing (y, x) dimensions must be UNCHUNKED (chunk
    extent == dimension size) so every chunk holds whole horizontal
    planes — the standard layout for time/level-chunked stacks, and the
    md analogue of the reference's per-2D-slice warp loop.  Leading
    dimensions keep their chunking, so the warp is a MAP-ONLY pass: each
    chunk warps its planes independently, zero shuffles at any scale.

    Returns (chunks_df, MDMeta) — horizontal sizes are preserved (the
    suggested-output grid of warp_proj_to_4326)."""
    from ..oracle.warp import warp_proj_to_4326

    nd = len(meta.dims)
    if nd < 2:
        raise ValueError("md_reproject needs >= 2 dimensions")
    for d in (nd - 2, nd - 1):
        if meta.chunks[d] != meta.dims[d][1]:
            raise ValueError(
                "horizontal dims must be unchunked (chunk == size); "
                f"dim {meta.dims[d][0]}: chunk {meta.chunks[d]} != "
                f"size {meta.dims[d][1]}")

    def warp_chunks(it):
        for pdf in it:
            out = {k: [] for k in ("var", "chunk", "shape", "data")}
            for r in pdf.itertuples(index=False):
                shape = [int(x) for x in r.shape]
                arr = np.asarray(r.data, dtype=np.float64).reshape(shape)
                planes = arr.reshape((-1, shape[-2], shape[-1]))
                warped = np.stack([
                    warp_proj_to_4326(pl, src_gt, to_lonlat, from_lonlat,
                                      method=method)[0]
                    for pl in planes])
                wshape = shape[:-2] + list(warped.shape[-2:])
                out["var"].append(r.var)
                out["chunk"].append(list(r.chunk))
                out["shape"].append(wshape)
                out["data"].append(warped.ravel().tolist())
            yield pd.DataFrame(out)

    warped_df = df.mapInPandas(warp_chunks, schema=MD_SCHEMA)
    out_meta = MDMeta(meta.var, list(meta.dims), list(meta.chunks))
    return warped_df, out_meta
