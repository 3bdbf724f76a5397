"""RPC (rational polynomial coefficient) transformer — numpy.

The RPC00B camera model of the reference's RPC transformer
(/root/reference/alg/gdal_rpc.cpp): normalized (long, lat, height) map to
normalized (line, sample) through ratios of 20-term cubic polynomials;
the term order below is RPCTransformerComputeTerms verbatim
(gdal_rpc.cpp:196-216), and the forward evaluation is
num . terms / den . terms (gdal_rpc.cpp:337 RPCEvaluate), denormalized
by the scale/offset pairs.

The inverse (pixel -> lon/lat) is iterative like the reference's
RPCInverseTransformPoint: start from the lon/lat offsets and Newton-step
a 2x2 system whose Jacobian comes from central finite differences —
vectorized over whole pixel arrays.

Coefficients dict keys follow the RPC00B metadata names: LINE_OFF,
SAMP_OFF, LAT_OFF, LONG_OFF, HEIGHT_OFF, *_SCALE, LINE_NUM_COEFF (20),
LINE_DEN_COEFF, SAMP_NUM_COEFF, SAMP_DEN_COEFF.
"""

from __future__ import annotations

import numpy as np


def _terms(L, P, H):
    """20 cubic monomials in gdal_rpc.cpp:196-216 order; stacked last."""
    one = np.ones_like(L)
    return np.stack([
        one, L, P, H,
        L * P, L * H, P * H, L * L, P * P, H * H,
        L * P * H, L * L * L, L * P * P, L * H * H, L * L * P,
        P * P * P, P * H * H, L * L * H, P * P * H, H * H * H,
    ], axis=-1)


def rpc_forward(rpc: dict, lon, lat, height=0.0):
    """(lon, lat, h) -> (line, sample) pixel coordinates."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    h = np.broadcast_to(np.asarray(height, dtype=np.float64), lon.shape)
    L = (lon - rpc["LONG_OFF"]) / rpc["LONG_SCALE"]
    P = (lat - rpc["LAT_OFF"]) / rpc["LAT_SCALE"]
    H = (h - rpc["HEIGHT_OFF"]) / rpc["HEIGHT_SCALE"]
    t = _terms(L, P, H)
    line = (t @ np.asarray(rpc["LINE_NUM_COEFF"])
            ) / (t @ np.asarray(rpc["LINE_DEN_COEFF"]))
    samp = (t @ np.asarray(rpc["SAMP_NUM_COEFF"])
            ) / (t @ np.asarray(rpc["SAMP_DEN_COEFF"]))
    return (line * rpc["LINE_SCALE"] + rpc["LINE_OFF"],
            samp * rpc["SAMP_SCALE"] + rpc["SAMP_OFF"])


def rpc_inverse(rpc: dict, line, samp, height=0.0, iterations: int = 10,
                tol: float = 1e-10):
    """(line, sample) -> (lon, lat) at fixed height: vectorized Newton on
    the 2x2 system with central-difference Jacobian (the reference's
    iterative RPCInverseTransformPoint shape, gdal_rpc.cpp)."""
    line = np.asarray(line, dtype=np.float64)
    samp = np.asarray(samp, dtype=np.float64)
    lon = np.full_like(line, float(rpc["LONG_OFF"]))
    lat = np.full_like(line, float(rpc["LAT_OFF"]))
    eps_lon = rpc["LONG_SCALE"] * 1e-7
    eps_lat = rpc["LAT_SCALE"] * 1e-7
    for _ in range(iterations):
        l0, s0 = rpc_forward(rpc, lon, lat, height)
        fl = l0 - line
        fs = s0 - samp
        if max(np.abs(fl).max(initial=0.0),
               np.abs(fs).max(initial=0.0)) < tol:
            break
        lp, sp = rpc_forward(rpc, lon + eps_lon, lat, height)
        lm, sm = rpc_forward(rpc, lon - eps_lon, lat, height)
        dl_dlon = (lp - lm) / (2 * eps_lon)
        ds_dlon = (sp - sm) / (2 * eps_lon)
        lp, sp = rpc_forward(rpc, lon, lat + eps_lat, height)
        lm, sm = rpc_forward(rpc, lon, lat - eps_lat, height)
        dl_dlat = (lp - lm) / (2 * eps_lat)
        ds_dlat = (sp - sm) / (2 * eps_lat)
        det = dl_dlon * ds_dlat - dl_dlat * ds_dlon
        det = np.where(np.abs(det) < 1e-300, 1e-300, det)
        lon = lon - (fl * ds_dlat - fs * dl_dlat) / det
        lat = lat - (fs * dl_dlon - fl * ds_dlon) / det
    return lon, lat


def synthetic_rpc(w: int, h: int, lon0: float = 10.0, lat0: float = 45.0,
                  span_deg: float = 0.05, bend: float = 0.02) -> dict:
    """Deterministic well-conditioned RPC model for fixtures/tests: a
    linear lon/lat -> sample/line mapping plus a mild rational bend
    (nonzero quadratic numerator and denominator terms), the shape of a
    pushbroom sensor's RPC00B."""
    z = [0.0] * 20
    line_num = list(z)
    line_den = list(z)
    samp_num = list(z)
    samp_den = list(z)
    # normalized: line ~ -P with a small L*P twist over 1 + bend terms
    line_num[0], line_num[2], line_num[4] = 0.0, -1.0, 0.1 * bend
    line_den[0], line_den[7] = 1.0, bend * 0.05
    samp_num[0], samp_num[1], samp_num[8] = 0.0, 1.0, bend * 0.1
    samp_den[0], samp_den[8] = 1.0, bend * 0.05
    return dict(
        LONG_OFF=lon0, LONG_SCALE=span_deg,
        LAT_OFF=lat0, LAT_SCALE=span_deg,
        HEIGHT_OFF=0.0, HEIGHT_SCALE=500.0,
        LINE_OFF=(h - 1) / 2.0, LINE_SCALE=(h - 1) / 2.0 or 1.0,
        SAMP_OFF=(w - 1) / 2.0, SAMP_SCALE=(w - 1) / 2.0 or 1.0,
        LINE_NUM_COEFF=line_num, LINE_DEN_COEFF=line_den,
        SAMP_NUM_COEFF=samp_num, SAMP_DEN_COEFF=samp_den,
    )


# flat column layout for shipping the model as an array<double>[90]
# (RPC00B block as plain numbers — the per-dataset RPC metadata shape)
_SCALARS = ("LINE_OFF", "SAMP_OFF", "LAT_OFF", "LONG_OFF", "HEIGHT_OFF",
            "LINE_SCALE", "SAMP_SCALE", "LAT_SCALE", "LONG_SCALE",
            "HEIGHT_SCALE")
_VECTORS = ("LINE_NUM_COEFF", "LINE_DEN_COEFF", "SAMP_NUM_COEFF",
            "SAMP_DEN_COEFF")


def rpc_pack(rpc: dict) -> list:
    out = [float(rpc[k]) for k in _SCALARS]
    for k in _VECTORS:
        v = list(rpc[k])
        assert len(v) == 20, k
        out.extend(float(c) for c in v)
    return out


def rpc_unpack(flat) -> dict:
    flat = list(flat)
    assert len(flat) == 90
    rpc = {k: flat[i] for i, k in enumerate(_SCALARS)}
    for j, k in enumerate(_VECTORS):
        rpc[k] = flat[10 + 20 * j: 30 + 20 * j]
    return rpc
