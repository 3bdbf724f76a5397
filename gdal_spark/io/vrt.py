"""VRT (virtual raster) XML sink/source — the reference's ``frmts/vrt``
serialized-mosaic format, the file gdalbuildvrt actually writes
(``apps/gdalbuildvrt_lib.cpp`` CreateVRTSeparate/CreateVRTNonSeparate):
a ``<VRTDataset>`` with the target grid (rasterXSize/YSize +
GeoTransform) and one ``<SimpleSource>`` per input with SrcRect→DstRect
placement; later sources paint on top (the last-wins rule the engine's
``mosaic_merge`` implements).

The VRT is an INDEX, not pixels — gdalbuildvrt itself builds it
driver-side from source metadata, and so do we: extents come from one
executor metadata pass (no decode), the XML is a small driver-side
artifact. Materialization re-enters the distributed mosaic pipeline.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, functions as F


def write_vrt(images: DataFrame, path: str, zoom: int | None = None,
              src_nodata: float | None = None) -> dict:
    """Build a .vrt for the image set at ``zoom`` (default: the
    -resolution 'highest' rule). Returns the dataset-level dict
    (size + geotransform + source count)."""
    from ..operators.rasterops import mosaic_resolution_zoom
    from ..oracle.mercator import resolution

    z = zoom if zoom is not None else mosaic_resolution_zoom(images, "highest")
    res = float(resolution(z))
    # one metadata-only executor pass: per-source extent in 3857 meters
    meta = images.select("image_id", "w", "h", "gsd_m", "lon", "lat")
    rows = sorted(
        _source_extents(meta.toPandas()), key=lambda r: r["image_id"])
    minx = min(r["minx"] for r in rows)
    maxy = max(r["maxy"] for r in rows)
    maxx = max(r["maxx"] for r in rows)
    miny = min(r["miny"] for r in rows)
    xsize = int(round((maxx - minx) / res))
    ysize = int(round((maxy - miny) / res))
    root = ET.Element("VRTDataset",
                      rasterXSize=str(xsize), rasterYSize=str(ysize))
    ET.SubElement(root, "SRS").text = "EPSG:3857"
    ET.SubElement(root, "GeoTransform").text = (
        f"{minx:.12f}, {res:.12f}, 0.0, {maxy:.12f}, 0.0, {-res:.12f}")
    band = ET.SubElement(root, "VRTRasterBand", dataType="Byte", band="1")
    for r in rows:
        tag = "ComplexSource" if src_nodata is not None else "SimpleSource"
        s = ET.SubElement(band, tag)
        ET.SubElement(s, "SourceFilename",
                      relativeToVRT="0").text = str(r["image_id"])
        ET.SubElement(s, "SourceBand").text = "1"
        ET.SubElement(s, "SrcRect", xOff="0", yOff="0",
                      xSize=str(r["w"]), ySize=str(r["h"]))
        ET.SubElement(
            s, "DstRect",
            xOff=f"{(r['minx'] - minx) / res:.6f}",
            yOff=f"{(maxy - r['maxy']) / res:.6f}",
            xSize=f"{(r['maxx'] - r['minx']) / res:.6f}",
            ySize=f"{(r['maxy'] - r['miny']) / res:.6f}")
        if src_nodata is not None:
            ET.SubElement(s, "NODATA").text = f"{src_nodata:g}"
    ET.indent(root)
    tmp = path + ".tmp"
    ET.ElementTree(root).write(tmp, encoding="utf-8",
                               xml_declaration=True)
    os.replace(tmp, path)
    return {"xsize": xsize, "ysize": ysize,
            "gt": [minx, res, 0.0, maxy, 0.0, -res], "zoom": z,
            "n_sources": len(rows)}


def _source_extents(pdf):
    """Per-source 3857 extents from metadata only (no decode)."""
    from ..oracle.tiling import image_bounds_3857

    out = []
    for r in pdf.itertuples(index=False):
        minx, miny, maxx, maxy = image_bounds_3857(
            r.lon, r.lat, r.w, r.h, r.gsd_m)
        out.append(dict(image_id=r.image_id, minx=minx, maxx=maxx,
                        miny=miny, maxy=maxy, w=int(r.w), h=int(r.h)))
    return out


def parse_vrt(path: str) -> dict:
    """.vrt -> dict(xsize, ysize, gt, srs, sources=[{id, src_rect,
    dst_rect, nodata}]). Validates the shape gdalbuildvrt writes."""
    root = ET.parse(path).getroot()
    if root.tag != "VRTDataset":
        raise ValueError("not a VRTDataset")
    gt = [float(v) for v in root.findtext("GeoTransform").split(",")]
    sources = []
    for band in root.findall("VRTRasterBand"):
        for s in band:
            if s.tag not in ("SimpleSource", "ComplexSource"):
                continue
            sr, dr = s.find("SrcRect"), s.find("DstRect")
            nod = s.findtext("NODATA")
            sources.append({
                "id": s.findtext("SourceFilename"),
                "src_rect": [float(sr.get(k))
                             for k in ("xOff", "yOff", "xSize", "ySize")],
                "dst_rect": [float(dr.get(k))
                             for k in ("xOff", "yOff", "xSize", "ySize")],
                "nodata": float(nod) if nod is not None else None,
            })
    return {"xsize": int(root.get("rasterXSize")),
            "ysize": int(root.get("rasterYSize")),
            "gt": gt, "srs": root.findtext("SRS"), "sources": sources}


def materialize_vrt(spark, images: DataFrame, path: str,
                    reducer: str = "last", zoom: int | None = None
                    ) -> DataFrame:
    """Open a .vrt and materialize its mosaic DISTRIBUTED: the parsed
    source list filters the image table (semi-join on source ids), the
    target zoom comes from the VRT's own GeoTransform resolution, and
    the pixels flow through the engine's render + last-wins merge —
    exactly how GDAL's VRT driver composes SimpleSources, but as one
    Spark plan."""
    from ..operators.rasterops import mosaic_tiles
    from ..oracle.mercator import zoom_for_pixel_size

    spec = parse_vrt(path)
    ids = spark.createDataFrame(
        [(s["id"],) for s in spec["sources"]], "image_id string")
    nodata = next((s["nodata"] for s in spec["sources"]), None)
    subset = images.join(F.broadcast(ids), "image_id", "left_semi")
    if zoom is None:  # native resolution from the VRT's own GeoTransform
        zoom = int(zoom_for_pixel_size(spec["gt"][1] * 0.999))
    return mosaic_tiles(subset, zoom=zoom,
                        reducer=reducer, src_nodata=nodata)
