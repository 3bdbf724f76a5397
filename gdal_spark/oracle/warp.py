"""Reprojection warp kernel — the gdalwarp analogue, numpy core.

Clones the dst→src inverse-mapping structure of the reference
(/root/reference/apps/gdalwarp_lib.cpp + alg/gdalwarpkernel.cpp): build the
destination pixel grid, transform every dst pixel center back into source
coordinates, sample per band (nearest: floor of the center-mapped coord,
gdalwarpkernel.cpp:6399-6404; bilinear: 4-sample, :3106).

Coordinate transforms are our own closed-form spherical-mercator<->WGS84
(no PROJ in this container; same formulas the tile pyramid uses). The
approximate transformer — exact transform on a coarse column grid + linear
interpolation between, with a max-error contract — clones
``GDALCreateApproxTransformer2`` (alg/gdaltransformer.cpp:58).

Output sizing mirrors ``GDALSuggestedWarpOutput2`` (alg/gdaltransformer.cpp:342):
transform the source corners, take the bbox, keep the pixel count of the
longer axis.
"""

from __future__ import annotations

import numpy as np

from . import mercator as M


def masked_float(arr, src_nodata):
    """Float64 working copy with NaN at invalid pixels — the validity-mask
    entry point of the reference's "Masking Semantics"
    (alg/gdalwarpkernel.cpp:614).  UNIFIED_SRC_NODATA semantics (the
    gdalwarp utility default, apps/gdalwarp_lib.cpp): a pixel is invalid
    only when ALL bands equal the nodata value."""
    a = np.asarray(arr, dtype=np.float64).copy()
    if a.ndim == 3:
        inv = np.all(a == float(src_nodata), axis=2)
        a[inv] = np.nan
    else:
        a[a == float(src_nodata)] = np.nan
    return a


def _build_masked(arr, src_gt, src_nodata, cutline):
    """Combined validity for the warp kernels: nodata invalidity
    (UNIFIED_SRC_NODATA) AND-ed with the rasterized cutline interior —
    the reference transforms the cutline to source pixel coords and burns
    it into the source validity mask (apps/gdalwarp_lib.cpp:5236
    CutlineTransformer + GDALWarpCutlineMaskerEx).  ``cutline`` is a list
    of rings in source georeferenced coords; even-odd fill, so holes are
    excluded exactly like gdal_rasterize."""
    if src_nodata is not None:
        a = masked_float(arr, src_nodata)
    else:
        a = np.asarray(arr, dtype=np.float64).copy()
    if cutline is not None:
        from .rasterize import rasterize_rings

        h, w = a.shape[0], a.shape[1]
        inside = rasterize_rings(cutline, src_gt, w, h, burn=1.0) > 0
        a[~inside] = np.nan
    return a


def cutline_blend_density(shape, src_gt, rings, blend_dist):
    """Feathered cutline validity mask (alg/gdalcutline.cpp
    BlendMaskGenerator, the CUTLINE_BLEND_DIST option): the polygon is
    forced to lines so distance is measured from the EDGE on both sides;
    for each source pixel center within ``blend_dist`` (source pixels) of
    the boundary the density ramps 0.5 + (d/BD)*0.5 inside /
    0.5 - (d/BD)*0.5 outside; beyond it the mask is the hard rasterized
    interior (1 in / 0 out).  Distance is exact point-to-segment
    Euclidean, vectorized over all pixels x all ring segments."""
    from .rasterize import rasterize_rings

    h, w = shape
    inside = rasterize_rings(rings, src_gt, w, h, burn=1.0) > 0
    # ring vertices -> source pixel coords (north-up inverse geotransform,
    # the reference's CutlineTransformer works in source pixel space)
    px = np.arange(w, dtype=np.float64) + 0.5
    py = np.arange(h, dtype=np.float64) + 0.5
    PX, PY = np.meshgrid(px, py)
    d = np.full((h, w), np.inf)
    for ring in rings:
        rv = np.asarray(ring, dtype=np.float64)
        rx = (rv[:, 0] - src_gt[0]) / src_gt[1]
        ry = (rv[:, 1] - src_gt[3]) / src_gt[5]
        for i in range(len(rx) - 1):
            ax, ay, bx, by = rx[i], ry[i], rx[i + 1], ry[i + 1]
            dx, dy = bx - ax, by - ay
            L2 = dx * dx + dy * dy
            if L2 <= 0.0:
                di = np.hypot(PX - ax, PY - ay)
            else:
                t = np.clip(((PX - ax) * dx + (PY - ay) * dy) / L2, 0.0, 1.0)
                di = np.hypot(PX - (ax + t * dx), PY - (ay + t * dy))
            np.minimum(d, di, out=d)
    dens = inside.astype(np.float64)
    band = d <= float(blend_dist)
    ratio = np.where(inside, 0.5 + (d / blend_dist) * 0.5,
                     0.5 - (d / blend_dist) * 0.5)
    dens[band] = ratio[band]
    return dens


def _resolve_dst_nodata(src_nodata, dst_nodata, fill):
    """gdalwarp -dstnodata defaulting: explicit value wins; else the
    srcnodata value; else the plain fill."""
    if dst_nodata is not None:
        return float(dst_nodata)
    if src_nodata is not None:
        return float(src_nodata)
    return float(fill)


def mercator_to_lonlat_xy(mx, my):
    return M.meters_to_lonlat(mx, my)


def lonlat_to_mercator_xy(lon, lat):
    return M.lonlat_to_meters(lon, lat)


def suggested_output(src_gt, w, h):
    """dst geotransform + size for a 3857 -> 4326 warp of a north-up image."""
    xs = np.array([src_gt[0], src_gt[0] + w * src_gt[1]])
    ys = np.array([src_gt[3], src_gt[3] + h * src_gt[5]])
    lon, lat = M.meters_to_lonlat(
        np.array([xs[0], xs[1], xs[0], xs[1]]),
        np.array([ys[0], ys[0], ys[1], ys[1]]),
    )
    minlon, maxlon = lon.min(), lon.max()
    minlat, maxlat = lat.min(), lat.max()
    # preserve the dominant pixel count (SuggestedWarpOutput keeps the
    # diagonal pixel distance; for axis-aligned mercator the max axis is it)
    out_w = w
    out_h = h
    res_x = (maxlon - minlon) / out_w
    res_y = (maxlat - minlat) / out_h
    dst_gt = [minlon, res_x, 0.0, maxlat, 0.0, -res_y]
    return dst_gt, out_w, out_h


def warp_utm_to_4326(arr, src_gt, zone: int, method: str = "nearest",
                     south: bool = False, fill=0,
                     src_nodata=None, dst_nodata=None, cutline=None):
    """Warp a north-up UTM image (EPSG:326xx/327xx) to EPSG:4326 — the
    reference's benchmark workload (autotest/benchmark/test_gdalwarp.py:24,
    EPSG:32631 -> 4326), powered by the closed-form Krüger transform
    (oracle/utm.py; PROJ-free).  Thin wrapper over the generic
    projected-CRS warp below."""
    from . import utm as U

    return warp_proj_to_4326(
        arr, src_gt,
        to_lonlat=lambda E, N: U.utm_to_lonlat(E, N, zone, south),
        from_lonlat=lambda lo, la: U.lonlat_to_utm(lo, la, zone, south),
        method=method, fill=fill,
        src_nodata=src_nodata, dst_nodata=dst_nodata, cutline=cutline,
    )


def warp_proj_to_4326(arr, src_gt, to_lonlat, from_lonlat,
                      method: str = "nearest", fill=0,
                      src_nodata=None, dst_nodata=None, cutline=None):
    """Warp a north-up image in ANY projected CRS (given its closed-form
    transform pair) to EPSG:4326 — UTM (oracle/utm.py), Lambert conformal
    conic and polar stereographic (oracle/conic.py), or any other
    callable pair ``to_lonlat(E, N) -> (lon, lat)`` /
    ``from_lonlat(lon, lat) -> (E, N)``.

    These mappings are NOT separable, so every destination pixel center is
    inverse-projected individually (vectorized meshgrid) — the full
    GDALWarpKernel shape (transform dst centers, sample src).  ``method``:
    all 14 warp kernels (point kernels + box statistics).
    Output sizing samples the source boundary at 21 points per edge, the
    GDALSuggestedWarpOutput2 grid density (alg/gdaltransformer.cpp:342).

    ``src_nodata`` enables the reference's validity-mask semantics
    (alg/gdalwarpkernel.cpp:614, UNIFIED_SRC_NODATA): invalid source
    pixels are excluded from every kernel — nearest propagates invalidity,
    bilinear/cubic/lanczos drop invalid taps and renormalize over the
    remaining weight (GWKBilinearResample4Sample's accumulator/divisor),
    box statistics reduce over valid pixels only with the per-pixel valid
    count — and destination pixels with no valid contributor get
    ``dst_nodata`` (defaults to ``src_nodata``).
    """
    h, w = arr.shape[0], arr.shape[1]
    masked = src_nodata is not None or cutline is not None
    arrf = _build_masked(arr, src_gt, src_nodata, cutline) if masked else None
    ts = np.linspace(0.0, 1.0, 21)
    bx = np.concatenate([ts * w, ts * w, np.zeros(21), np.full(21, float(w))])
    by = np.concatenate([np.zeros(21), np.full(21, float(h)), ts * h, ts * h])
    be = src_gt[0] + bx * src_gt[1]
    bn = src_gt[3] + by * src_gt[5]
    lon_b, lat_b = to_lonlat(be, bn)
    minlon, maxlon = lon_b.min(), lon_b.max()
    minlat, maxlat = lat_b.min(), lat_b.max()
    out_w, out_h = w, h
    dst_gt = [minlon, (maxlon - minlon) / out_w, 0.0,
              maxlat, 0.0, -(maxlat - minlat) / out_h]

    lon_c = dst_gt[0] + (np.arange(out_w) + 0.5) * dst_gt[1]
    lat_c = dst_gt[3] + (np.arange(out_h) + 0.5) * dst_gt[5]
    lon_g, lat_g = np.meshgrid(lon_c, lat_c)
    E, N = from_lonlat(lon_g, lat_g)
    fx = (E - src_gt[0]) / src_gt[1]
    fy = (N - src_gt[3]) / src_gt[5]

    if method == "nearest":
        ix = np.floor(fx).astype(np.int64)
        iy = np.floor(fy).astype(np.int64)
        mask = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        src = arrf if masked else arr
        out = src[np.clip(iy, 0, h - 1), np.clip(ix, 0, w - 1)].astype(np.float64)
    elif method == "bilinear":
        gx = fx - 0.5
        gy = fy - 0.5
        x0 = np.clip(np.floor(gx).astype(np.int64), 0, w - 1)
        y0 = np.clip(np.floor(gy).astype(np.int64), 0, h - 1)
        x1 = np.clip(x0 + 1, 0, w - 1)
        y1 = np.clip(y0 + 1, 0, h - 1)
        wx = np.clip(gx - x0, 0.0, 1.0)
        wy = np.clip(gy - y0, 0.0, 1.0)
        if arr.ndim == 3:
            wx = wx[:, :, None]
            wy = wy[:, :, None]
        if masked:
            # drop invalid taps, renormalize over the remaining weight
            # (GWKBilinearResample4Sample accumulator/divisor)
            num = 0.0
            den = 0.0
            for yy, xx, ww_ in ((y0, x0, (1 - wx) * (1 - wy)),
                                (y0, x1, wx * (1 - wy)),
                                (y1, x0, (1 - wx) * wy),
                                (y1, x1, wx * wy)):
                t = arrf[yy, xx]
                v = ~np.isnan(t)
                num = num + np.where(v, t, 0.0) * ww_
                den = den + v * ww_
            with np.errstate(invalid="ignore", divide="ignore"):
                out = np.where(den > 0, num / np.where(den == 0, 1.0, den),
                               np.nan)
        else:
            out = (
                arr[y0, x0].astype(np.float64) * (1 - wx) * (1 - wy)
                + arr[y0, x1].astype(np.float64) * wx * (1 - wy)
                + arr[y1, x0].astype(np.float64) * (1 - wx) * wy
                + arr[y1, x1].astype(np.float64) * wx * wy
            )
        mask = (fx >= 0) & (fx <= w) & (fy >= 0) & (fy <= h)
    elif method in ("cubic", "cubicspline", "lanczos"):
        # full 2-D convolution gather: the UTM mapping is NOT separable,
        # so each destination pixel accumulates (2r)^2 taps with 2-D
        # weights — the GWKResample general path (alg/gdalwarpkernel.cpp)
        from .resample import _KERNELS

        kernel, radius = _KERNELS[method]
        gx = fx - 0.5
        gy = fy - 0.5
        x0 = np.floor(gx).astype(np.int64)
        y0 = np.floor(gy).astype(np.int64)
        shape = arr.shape if arr.ndim == 3 else arr.shape + (1,)
        a3 = (arrf.reshape(shape) if masked
              else arr.reshape(shape).astype(np.float64))
        acc = np.zeros(gx.shape + (shape[2],))
        offs = np.arange(-radius + 1, radius + 1)
        if masked:
            # per-tap validity: invalid taps contribute no weight, the
            # divisor is the accumulated VALID weight (GWKResample with
            # masks); all-invalid -> NaN -> dst nodata
            wsum = np.zeros(gx.shape + (shape[2],))
            for dy in offs:
                wy = kernel(gy - (y0 + dy))
                yi = np.clip(y0 + dy, 0, h - 1)
                for dx in offs:
                    wgt = wy * kernel(gx - (x0 + dx))
                    xi = np.clip(x0 + dx, 0, w - 1)
                    t = a3[yi, xi]
                    v = ~np.isnan(t)
                    acc += wgt[:, :, None] * np.where(v, t, 0.0)
                    wsum += wgt[:, :, None] * v
            with np.errstate(invalid="ignore", divide="ignore"):
                out = np.where(wsum != 0,
                               acc / np.where(wsum == 0, 1.0, wsum), np.nan)
        else:
            wsum = np.zeros(gx.shape)
            for dy in offs:
                wy = kernel(gy - (y0 + dy))
                yi = np.clip(y0 + dy, 0, h - 1)
                for dx in offs:
                    wgt = wy * kernel(gx - (x0 + dx))
                    xi = np.clip(x0 + dx, 0, w - 1)
                    acc += wgt[:, :, None] * a3[yi, xi]
                    wsum += wgt
            out = acc / np.where(wsum == 0, 1.0, wsum)[:, :, None]
        if arr.ndim == 2:
            out = out[:, :, 0]
        mask = (fx >= 0) & (fx <= w) & (fy >= 0) & (fy <= h)
    elif method in BOX_STATS:
        # non-separable: transform the full (out_h+1, out_w+1) corner grid
        # and take per-pixel min/max over each cell's four corners — the
        # GWKAverageOrMode corner-box construction (gdalwarpkernel.cpp:7841)
        lon_e = dst_gt[0] + np.arange(out_w + 1) * dst_gt[1]
        lat_e = dst_gt[3] + np.arange(out_h + 1) * dst_gt[5]
        lon_cg, lat_cg = np.meshgrid(lon_e, lat_e)
        Ec, Nc = from_lonlat(lon_cg, lat_cg)
        cfx = (Ec - src_gt[0]) / src_gt[1]
        cfy = (Nc - src_gt[3]) / src_gt[5]
        fx_min = np.minimum.reduce(
            [cfx[:-1, :-1], cfx[:-1, 1:], cfx[1:, :-1], cfx[1:, 1:]])
        fx_max = np.maximum.reduce(
            [cfx[:-1, :-1], cfx[:-1, 1:], cfx[1:, :-1], cfx[1:, 1:]])
        fy_min = np.minimum.reduce(
            [cfy[:-1, :-1], cfy[:-1, 1:], cfy[1:, :-1], cfy[1:, 1:]])
        fy_max = np.maximum.reduce(
            [cfy[:-1, :-1], cfy[:-1, 1:], cfy[1:, :-1], cfy[1:, 1:]])
        x0, x1 = _box_bounds(fx_min, fx_max, w)
        y0, y1 = _box_bounds(fy_min, fy_max, h)
        out = _warp_box_stat(arrf if masked else arr, x0, x1, y0, y1, method)
        mask = (fx >= 0) & (fx <= w) & (fy >= 0) & (fy <= h)
    else:
        raise ValueError(method)

    out = _finalize_warp(out, mask, arr.dtype, arr.ndim, fill,
                         masked, src_nodata, dst_nodata)
    return out, dst_gt


def _finalize_warp(out, mask, dtype, ndim, fill, masked, src_nodata,
                   dst_nodata):
    """Fill out-of-bounds and (when masking) no-valid-contributor pixels,
    then cast back to the source dtype (half-up rounding for integers)."""
    mm = mask[:, :, None] if ndim == 3 else mask
    if masked:
        dnd = _resolve_dst_nodata(src_nodata, dst_nodata, fill)
        out = np.where(mm & ~np.isnan(out), out, dnd)
    else:
        out = np.where(mm, out, float(fill))
    if np.issubdtype(dtype, np.integer):
        info = np.iinfo(dtype)
        out = np.clip(np.floor(out + 0.5), info.min, info.max).astype(dtype)
    else:
        out = out.astype(dtype)
    return out


BOX_STATS = ("average", "mode", "min", "max", "med", "q1", "q3", "sum", "rms")


def _warp_box_stat(arr, x0, x1, y0, y1, stat):
    """Box-statistic warp gather (GWKAverageOrModeThread,
    alg/gdalwarpkernel.cpp:7784-8400): per destination pixel, reduce the
    source pixels inside its corner-transformed box [x0, x1) x [y0, y1).

    ``x0/x1/y0/y1`` are int64 arrays broadcastable to the (H, W) output
    (1-D per-axis for separable transforms, 2-D for general ones), already
    clipped to the raster and guaranteed non-empty.  Gathers box values
    into a (H, W, k) NaN-padded tensor (boxes are small — same-resolution
    warps touch 1-4 source pixels) and reduces nan-aware: average, mode
    (ties -> smallest, matching resample_mode), min/max/sum, rms, and the
    reference's sorted-pick quantile index ceil(q*n - 1) with the
    PER-PIXEL count n (gdalwarpkernel.cpp:8337-8341)."""
    h, w = arr.shape[0], arr.shape[1]
    nb = arr.shape[2] if arr.ndim == 3 else 1
    a3 = arr.reshape(h, w, nb).astype(np.float64)
    x0b, x1b, y0b, y1b = np.broadcast_arrays(x0, x1, y0, y1)
    bw = int((x1b - x0b).max())
    bh = int((y1b - y0b).max())
    H, W = x0b.shape
    k = bh * bw
    vals = np.full((H, W, nb, k), np.nan)
    for dy in range(bh):
        yi = np.clip(y0b + dy, 0, h - 1)
        vy = dy < (y1b - y0b)
        for dx in range(bw):
            xi = np.clip(x0b + dx, 0, w - 1)
            v = vy & (dx < (x1b - x0b))
            slot = dy * bw + dx
            vals[:, :, :, slot] = np.where(
                v[:, :, None], a3[yi, xi], np.nan)
    # per-(pixel, band) VALID count: equals the box size for unmasked
    # input (padding slots are the only NaNs), and the number of valid
    # contributors under nodata masking — the reference collects valid
    # values into a vector and reduces over its length
    # (GWKAverageOrModeThread); zero valid -> NaN -> dst nodata.
    n = np.count_nonzero(~np.isnan(vals), axis=-1)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        out = _box_reduce(vals, n, k, stat)
    return out if arr.ndim == 3 else out[:, :, 0]


def _box_reduce(vals, n, k, stat):
    H, W, nb = vals.shape[:3]
    if stat == "average":
        out = np.nanmean(vals, axis=-1)
    elif stat == "min":
        out = np.nanmin(vals, axis=-1)
    elif stat == "max":
        out = np.nanmax(vals, axis=-1)
    elif stat == "sum":
        out = np.where(n > 0, np.nansum(vals, axis=-1), np.nan)
    elif stat == "rms":
        out = np.sqrt(np.nanmean(vals * vals, axis=-1))
    elif stat == "mode":
        # uint8 domain: count occurrences per value, ties -> smallest.
        # Guard the domain explicitly — float / negative / >255 values
        # would otherwise index the count table out of range (np.add.at
        # with a negative index silently wraps -> wrong mode, no error).
        finite = vals[~np.isnan(vals)]
        if finite.size and (
            (finite != np.floor(finite)).any()
            or finite.min() < 0 or finite.max() > 255
        ):
            raise ValueError(
                "mode box-stat requires integer values in [0, 255] "
                "(uint8 raster domain); got values outside it")
        iv = np.where(np.isnan(vals), 256, vals).astype(np.int64)
        flat = iv.reshape(-1, k)
        counts = np.zeros((flat.shape[0], 257), dtype=np.int32)
        rows = np.arange(flat.shape[0])
        for j in range(k):
            np.add.at(counts, (rows, flat[:, j]), 1)
        out = counts[:, :256].argmax(axis=1).astype(np.float64).reshape(H, W, nb)
        out = np.where(n > 0, out, np.nan)
    elif stat in ("med", "q1", "q3"):
        q = {"med": 0.5, "q1": 0.25, "q3": 0.75}[stat]
        s = np.sort(vals, axis=-1)  # NaNs sort last
        qi = np.maximum(np.ceil(q * n - 1).astype(np.int64), 0)
        out = np.take_along_axis(s, qi[:, :, :, None], axis=-1)[..., 0]
        out = np.where(n > 0, out, np.nan)
    else:
        raise ValueError(stat)
    return out


def _box_bounds(e0, e1, n):
    """Corner-transformed fractional src coords of box edges -> clipped,
    non-empty integer pixel bounds (the GWKAverageOrMode
    floor(min+1e-10)/ceil(max-1e-10) snap)."""
    lo = np.minimum(e0, e1)
    hi = np.maximum(e0, e1)
    i0 = np.floor(lo + 1e-10).astype(np.int64)
    i1 = np.ceil(hi - 1e-10).astype(np.int64)
    i0 = np.clip(i0, 0, n - 1)
    i1 = np.clip(i1, 1, n)
    i1 = np.maximum(i1, i0 + 1)
    return i0, i1


def _convolve_irregular(src, centers, axis, kernel, radius):
    """1-D convolution resize along ``axis`` with arbitrary (monotonic)
    fractional source centers (pixel-center space), edge clamp and
    per-output weight normalization — the irregular-grid analogue of
    resample._convolve_axis used by the warp path."""
    src_n = src.shape[axis]
    centers = np.asarray(centers, dtype=np.float64)
    # local scale: widen the kernel when the warp downsamples
    d = np.abs(np.gradient(centers)) if centers.size > 1 else np.ones(1)
    ksc = max(float(d.mean()), 1.0)
    half = int(np.ceil(radius * ksc))
    offs = np.arange(-half, half + 1)
    idx = np.floor(centers)[:, None] + offs[None, :]
    w = kernel((idx - centers[:, None]) / ksc)
    s = w.sum(axis=1, keepdims=True)
    s[s == 0] = 1.0
    w = w / s
    idx = np.clip(idx, 0, src_n - 1).astype(np.int64)
    moved = np.moveaxis(src, axis, 0)
    gathered = moved[idx]
    out = np.einsum("ok,ok...->o...", w, gathered)
    return np.moveaxis(out, 0, axis)


def warp_3857_to_4326(arr, src_gt, method="nearest", approx_every=0,
                      fill=0, src_nodata=None, dst_nodata=None,
                      cutline=None, te=None, tr=None, ts=None,
                      blend_dist=0.0):
    """Warp a north-up EPSG:3857 image to EPSG:4326.

    ``method``: nearest, bilinear, cubic, cubicspline, or lanczos (the
    warp kernels that sample a point neighborhood; the box-statistic
    kernels min/max/med/q1/q3/sum/rms apply to the tiling/overview path,
    oracle/resample.resample_stat).

    approx_every > 0 enables the approximate transformer: exact inverse
    transform every ``approx_every``-th column, linear interpolation between
    (per dst row the transform is separable for this CRS pair: lon depends
    only on x, lat only on y — the approximation grid still exercises the
    generic machinery).

    ``src_nodata`` enables the reference's validity-mask semantics
    (alg/gdalwarpkernel.cpp:614, UNIFIED_SRC_NODATA): invalid pixels are
    excluded from every kernel (renormalized point kernels, valid-count
    box statistics) and no-valid-contributor destinations get
    ``dst_nodata`` (defaults to ``src_nodata``).
    """
    h, w = arr.shape[0], arr.shape[1]
    masked = src_nodata is not None or cutline is not None
    dens = None
    if cutline is not None and blend_dist:
        # CUTLINE_BLEND_DIST (alg/gdalcutline.cpp BlendMaskGenerator):
        # the cutline becomes a fractional density, not a hard mask —
        # outside-but-near source pixels still contribute, feathered.
        # Supported for the nearest kernel (seam-feathering mosaics).
        if method != "nearest":
            raise ValueError("blend_dist requires method='nearest'")
        arrf = _build_masked(arr, src_gt, src_nodata, None)
        dens = cutline_blend_density((h, w), src_gt, cutline, blend_dist)
    else:
        arrf = (_build_masked(arr, src_gt, src_nodata, cutline)
                if masked else None)
    dst_gt, out_w, out_h = suggested_output(src_gt, w, h)
    if te is not None or tr is not None or ts is not None:
        # explicit target grid (gdalwarp -te/-tr/-ts,
        # apps/gdalwarp_lib.cpp target-extent/resolution handling):
        # -te fixes the extent (target-SRS units), -tr the resolution
        # (size = round(extent/res)), -ts the size (res = extent/size);
        # -tr and -ts are mutually exclusive like the reference
        if tr is not None and ts is not None:
            raise ValueError("-tr and -ts are mutually exclusive")
        if te is not None:
            xmin, ymin, xmax, ymax = (float(v) for v in te)
        else:
            xmin = dst_gt[0]
            ymax = dst_gt[3]
            xmax = dst_gt[0] + out_w * dst_gt[1]
            ymin = dst_gt[3] + out_h * dst_gt[5]
        if tr is not None:
            xres, yres = float(tr[0]), abs(float(tr[1]))
            out_w = max(1, int((xmax - xmin) / xres + 0.5))
            out_h = max(1, int((ymax - ymin) / yres + 0.5))
        elif ts is not None:
            out_w, out_h = int(ts[0]), int(ts[1])
            xres = (xmax - xmin) / out_w
            yres = (ymax - ymin) / out_h
        else:
            xres, yres = dst_gt[1], -dst_gt[5]
            out_w = max(1, int((xmax - xmin) / xres + 0.5))
            out_h = max(1, int((ymax - ymin) / yres + 0.5))
        dst_gt = [xmin, xres, 0.0, ymax, 0.0, -yres]

    # dst pixel centers -> lon/lat
    lon_c = dst_gt[0] + (np.arange(out_w) + 0.5) * dst_gt[1]
    lat_c = dst_gt[3] + (np.arange(out_h) + 0.5) * dst_gt[5]

    if approx_every and approx_every > 1:
        # exact at sample columns, linear interp between (approx transformer)
        idx = np.arange(0, out_w, approx_every)
        if idx[-1] != out_w - 1:
            idx = np.append(idx, out_w - 1)
        mx_s, _ = M.lonlat_to_meters(lon_c[idx], np.zeros(idx.size))
        mx = np.interp(np.arange(out_w), idx, mx_s)
        idyx = np.arange(0, out_h, approx_every)
        if idyx[-1] != out_h - 1:
            idyx = np.append(idyx, out_h - 1)
        _, my_s = M.lonlat_to_meters(np.zeros(idyx.size), lat_c[idyx])
        my = np.interp(np.arange(out_h), idyx, my_s)
    else:
        mx, _ = M.lonlat_to_meters(lon_c, np.zeros(out_w))
        _, my = M.lonlat_to_meters(np.zeros(out_h), lat_c)

    # src fractional pixel coords of each dst center
    fx = (mx - src_gt[0]) / src_gt[1]
    fy = (my - src_gt[3]) / src_gt[5]

    if method == "nearest":
        ix = np.floor(fx).astype(np.int64)
        iy = np.floor(fy).astype(np.int64)
        ok_x = (ix >= 0) & (ix < w)
        ok_y = (iy >= 0) & (iy < h)
        ixc = np.clip(ix, 0, w - 1)
        iyc = np.clip(iy, 0, h - 1)
        src = arrf if masked else arr
        out = src[np.ix_(iyc, ixc)].astype(np.float64)
        if dens is not None:
            # nearest-sample the density at the same source pixel; the
            # output value is src * density (feather against the empty
            # canvas), zero density -> invalid (dst_nodata)
            ds = dens[np.ix_(iyc, ixc)]
            if out.ndim == 3:
                ds = ds[:, :, None]
            out = np.where(ds > 0.0, out * ds, np.nan)
        mask = np.outer(ok_y, ok_x)
    elif method == "bilinear":
        gx = fx - 0.5
        gy = fy - 0.5
        x0 = np.clip(np.floor(gx).astype(np.int64), 0, w - 1)
        y0 = np.clip(np.floor(gy).astype(np.int64), 0, h - 1)
        x1 = np.clip(x0 + 1, 0, w - 1)
        y1 = np.clip(y0 + 1, 0, h - 1)
        wx = np.clip(gx - x0, 0.0, 1.0)
        wy = np.clip(gy - y0, 0.0, 1.0)
        src = arrf if masked else arr
        a = src[np.ix_(y0, x0)].astype(np.float64)
        b = src[np.ix_(y0, x1)].astype(np.float64)
        c = src[np.ix_(y1, x0)].astype(np.float64)
        d = src[np.ix_(y1, x1)].astype(np.float64)
        if arr.ndim == 3:
            wxx = wx[None, :, None]
            wyy = wy[:, None, None]
        else:
            wxx = wx[None, :]
            wyy = wy[:, None]
        if masked:
            # drop invalid taps, renormalize over the remaining weight
            # (GWKBilinearResample4Sample accumulator/divisor)
            num = 0.0
            den = 0.0
            for t, ww_ in ((a, (1 - wxx) * (1 - wyy)), (b, wxx * (1 - wyy)),
                           (c, (1 - wxx) * wyy), (d, wxx * wyy)):
                v = ~np.isnan(t)
                num = num + np.where(v, t, 0.0) * ww_
                den = den + v * ww_
            with np.errstate(invalid="ignore", divide="ignore"):
                out = np.where(den > 0, num / np.where(den == 0, 1.0, den),
                               np.nan)
        else:
            out = ((a * (1 - wxx) + b * wxx) * (1 - wyy)
                   + (c * (1 - wxx) + d * wxx) * wyy)
        ok_x = (fx >= 0) & (fx <= w)
        ok_y = (fy >= 0) & (fy <= h)
        mask = np.outer(ok_y, ok_x)
    elif method in ("cubic", "cubicspline", "lanczos"):
        # separable convolution warp: the 3857->4326 transform maps dst x
        # only to src x and dst y only to src y, so the 2-D kernel factors
        # into two 1-D passes with irregular sample centers — the structure
        # of GWKResampleNoMasks (alg/gdalwarpkernel.cpp convolution path)
        from .resample import _KERNELS

        kernel, radius = _KERNELS[method]
        if masked:
            # numerator/denominator pair: because the 2-D weight is a
            # product wx*wy, convolving value*valid and valid separately
            # then dividing reproduces the exact 2-D masked
            # renormalization (GWKResample with masks) in two 1-D passes
            valid = (~np.isnan(arrf)).astype(np.float64)
            num = _convolve_irregular(np.nan_to_num(arrf), fy - 0.5, 0,
                                      kernel, radius)
            num = _convolve_irregular(num, fx - 0.5, 1, kernel, radius)
            den = _convolve_irregular(valid, fy - 0.5, 0, kernel, radius)
            den = _convolve_irregular(den, fx - 0.5, 1, kernel, radius)
            with np.errstate(invalid="ignore", divide="ignore"):
                out = np.where(den > 1e-10,
                               num / np.where(den == 0, 1.0, den), np.nan)
        else:
            out = _convolve_irregular(np.asarray(arr, np.float64), fy - 0.5,
                                      0, kernel, radius)
            out = _convolve_irregular(out, fx - 0.5, 1, kernel, radius)
        ok_x = (fx >= 0) & (fx <= w)
        ok_y = (fy >= 0) & (fy <= h)
        mask = np.outer(ok_y, ok_x)
    elif method in BOX_STATS:
        # separable transform: box edges per axis from dst pixel corners
        lon_e = dst_gt[0] + np.arange(out_w + 1) * dst_gt[1]
        lat_e = dst_gt[3] + np.arange(out_h + 1) * dst_gt[5]
        mx_e, _ = M.lonlat_to_meters(lon_e, np.zeros(out_w + 1))
        _, my_e = M.lonlat_to_meters(np.zeros(out_h + 1), lat_e)
        ex = (mx_e - src_gt[0]) / src_gt[1]
        ey = (my_e - src_gt[3]) / src_gt[5]
        x0, x1 = _box_bounds(ex[:-1], ex[1:], w)
        y0, y1 = _box_bounds(ey[:-1], ey[1:], h)
        out = _warp_box_stat(arrf if masked else arr,
                             x0[None, :], x1[None, :],
                             y0[:, None], y1[:, None], method)
        ok_x = (fx >= 0) & (fx <= w)
        ok_y = (fy >= 0) & (fy <= h)
        mask = np.outer(ok_y, ok_x)
    else:
        raise ValueError(method)

    out = _finalize_warp(out, mask, arr.dtype, arr.ndim, fill,
                         masked, src_nodata, dst_nodata)
    return out, dst_gt
