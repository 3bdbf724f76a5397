"""``gdal raster blend`` compositing kernels — exact integer-math clone of
the reference's ``apps/gdalalg_raster_blend.cpp`` (Mapserver/PDF
premultiplied Porter-Duff formulas), vectorized over whole images.

Scale-factor conventions copied for bit parity:
  MulScale255(a, b) = (a*b + 255) >> 8                (:183)
  DivScale255(a, b) = 0 if a==0; 255 if b==0; a*255//b (:233)
  opacity255 = (opacity*255 + 50) // 100              (:2791)
  src-over unpremultiply via the (255<<8 + k//2)//k table (:872-884)
  alpha:  Da' = Sa + Da - Sa.Da                        (:216-222)
  hsv-value derives from hsv_merge.py (rgb_to_hs :398, hsv_to_rgb :482)

Modes: src-over, multiply, screen, overlay, hard-light (overlay with the
roles swapped, :1158-1173), darken, lighten, color-dodge (:1366-1399),
color-burn (:1495-1530), hsv-value (base hue/saturation + overlay band-1
value, :2480-2524).
"""

from __future__ import annotations

import numpy as np

MODES = ("src-over", "multiply", "screen", "overlay", "hard-light",
         "darken", "lighten", "color-dodge", "color-burn", "hsv-value")

_INV_DSTA = np.zeros(256, dtype=np.uint32)
for _k in range(1, 256):
    _INV_DSTA[_k] = ((255 << 8) + _k // 2) // _k


def _mul255(a, b):
    return (a.astype(np.int64) * b + 255) >> 8


def _div255(a, b):
    a = a.astype(np.int64)
    b = np.asarray(b, dtype=np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        q = np.where(b == 0, 255, (a * 255) // np.maximum(b, 1))
    return np.where(a == 0, 0, q)


def _planes(img):
    """HxWxC uint8 -> (R, G, B, A int64 planes). Gray aliases G/B to R;
    missing alpha is opaque (PremultiplyChannels conventions)."""
    a = np.asarray(img, dtype=np.int64)
    c = a.shape[2]
    if c == 1:
        r = g = b = a[:, :, 0]
        al = np.full(r.shape, 255, dtype=np.int64)
    elif c == 2:
        r = g = b = a[:, :, 0]
        al = a[:, :, 1]
    elif c == 3:
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        al = np.full(r.shape, 255, dtype=np.int64)
    else:
        r, g, b, al = (a[:, :, 0], a[:, :, 1], a[:, :, 2], a[:, :, 3])
    return r, g, b, al


def _premul(c, a):
    return np.where(a == 255, c, _mul255(c, a))


def blend(base: np.ndarray, overlay: np.ndarray, mode: str = "src-over",
          opacity: int = 100) -> np.ndarray:
    """Composite ``overlay`` onto ``base`` (both HxWxC uint8, same H/W).
    Returns HxWx4 RGBA uint8 (hsv-value returns HxWx3)."""
    if mode not in MODES:
        raise ValueError(f"unknown blend mode {mode!r}")
    if base.shape[:2] != overlay.shape[:2]:
        raise ValueError("base/overlay size mismatch")
    op255 = (opacity * 255 + 50) // 100

    br, bg, bb, ba = _planes(base)
    orr, og, ob, oa = _planes(overlay)

    if mode == "hsv-value":
        # base hue/saturation + overlay band-1 value (hsv_merge.py math)
        v = np.asarray(overlay, dtype=np.int64)[:, :, 0]
        minc = np.minimum(np.minimum(br, bg), bb)
        maxc = np.maximum(np.maximum(br, bg), bb)
        d = maxc - minc
        s = d / np.maximum(1, maxc)
        d6 = np.where(d == 0, 1.0, 6.0 * d)
        h = np.where(
            maxc == bb, 4.0 / 6.0 + (br - bg) / d6,
            np.where(maxc == bg, 2.0 / 6.0 + (bb - br) / d6,
                     np.where((bg - bb) / d6 < 0, (bg - bb) / d6 + 1.0,
                              (bg - bb) / d6)))
        i = (6.0 * h).astype(np.int64)
        f = 6.0 * h - i
        p = (v * (1.0 - s) + 0.5).astype(np.int64)
        q = (v * (1.0 - s * f) + 0.5).astype(np.int64)
        t = (v * (1.0 - s * (1.0 - f)) + 0.5).astype(np.int64)
        idx = np.clip(i, 0, 5)
        r_ch = np.choose(idx, [v, q, p, p, t, v])
        g_ch = np.choose(idx, [t, v, v, q, p, p])
        b_ch = np.choose(idx, [p, p, t, v, v, q])
        return np.clip(np.stack([r_ch, g_ch, b_ch], axis=2), 0,
                       255).astype(np.uint8)

    if mode == "hard-light":
        # Overlay with the roles of source and overlay swapped (:1158)
        br, bg, bb, ba, orr, og, ob, oa = orr, og, ob, oa, br, bg, bb, ba
        # swapped opacity: applies to what is now the BASE (:199-225)
        sa = _mul255(ba, op255)
        ba = sa
    else:
        oa = _mul255(oa, op255)

    final_a = oa + ba - _mul255(oa, ba)
    pr, pg, pb = (_premul(br, ba), _premul(bg, ba), _premul(bb, ba))
    qr, qg, qb = (_premul(orr, oa), _premul(og, oa), _premul(ob, oa))

    def comp(C, OC):
        if mode == "multiply":
            return _div255(_mul255(C, OC) + _mul255(C, 255 - oa)
                           + _mul255(OC, 255 - ba), final_a)
        if mode == "screen":
            return _div255(C + OC - _mul255(C, OC), final_a)
        if mode in ("overlay", "hard-light"):
            am = _mul255(oa, ba)
            lt = _div255(2 * _mul255(C, OC) + _mul255(C, 255 - oa)
                         + _mul255(OC, 255 - ba), final_a)
            ge = _div255(am - 2 * _mul255(ba - C, oa - OC)
                         + _mul255(C, 255 - oa) + _mul255(OC, 255 - ba),
                         final_a)
            return np.where(2 * C < ba, lt, ge)
        if mode == "darken":
            return _div255(np.minimum(_mul255(OC, ba), _mul255(C, oa))
                           + _mul255(C, 255 - oa) + _mul255(OC, 255 - ba),
                           final_a)
        if mode == "lighten":
            return _div255(np.maximum(_mul255(OC, ba), _mul255(C, oa))
                           + _mul255(C, 255 - oa) + _mul255(OC, 255 - ba),
                           final_a)
        if mode == "color-dodge":
            am = _mul255(oa, ba)
            ge = _div255(am + _mul255(C, 255 - oa) + _mul255(OC, 255 - ba),
                         final_a)
            lt = _div255(_div255(_mul255(C, oa), 255 - _div255(OC, oa))
                         + _mul255(C, 255 - oa) + _mul255(OC, 255 - ba),
                         final_a)
            cond = _mul255(OC, ba) + _mul255(C, oa) >= am
            return np.where(cond, ge, lt)
        if mode == "color-burn":
            am = _mul255(oa, ba)
            le = _div255(_mul255(C, 255 - oa) + _mul255(OC, 255 - ba),
                         final_a)
            cu = _div255(C, ba)
            ou = _div255(OC, oa)
            gt = _div255(_mul255(am, cu + ou - 255)
                         + _mul255(C, 255 - oa) + _mul255(OC, 255 - ba),
                         final_a)
            cond = _mul255(OC, ba) + _mul255(C, oa) <= am
            return np.where(cond, le, gt)
        raise AssertionError(mode)

    if mode == "src-over":
        # BlendSrcOverRGBA_Generic (:1711-1780): unpremultiplied channels,
        # nDstA = overlayA + MulScale255(srcA, 255-overlayA), table-based
        # divide by Da'
        s255 = _mul255(ba, 255 - oa)
        final_a = oa + s255
        inv = _INV_DSTA[np.clip(final_a, 0, 255)]
        out = []
        for C, OC in ((br, orr), (bg, og), (bb, ob)):
            d = (OC * oa + C * s255 + 255) >> 8
            out.append((d * inv + 255) >> 8)
        r_ch, g_ch, b_ch = out
    else:
        r_ch = comp(pr, qr)
        g_ch = comp(pg, qg)
        b_ch = comp(pb, qb)

    return np.clip(
        np.stack([r_ch, g_ch, b_ch, final_a], axis=2), 0, 255
    ).astype(np.uint8)
