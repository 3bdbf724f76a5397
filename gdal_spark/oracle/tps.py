"""GCP transformers — polynomial and thin plate spline (numpy).

* Polynomial orders 1-3: the monomial bases of the reference's GCP
  transformer (/root/reference/alg/gdal_crs.cpp:608 CRS_georef — order 1:
  [1, e, n]; order 2: + [e2, en, n2]; order 3: + [e3, e2n, en2, n3]),
  fitted by least squares over the control points.
* Thin plate spline: the reference's VizGeorefSpline2D
  (/root/reference/alg/thinplatespline.cpp:175 base function
  U(d) = d2 * log(d2) on the SQUARED distance, zero at coincident
  points) with the classic augmented linear system (radial part + affine
  polynomial, side conditions sum(w) = sum(w*x) = sum(w*y) = 0 —
  Bookstein, IEEE TPAMI 1989, public algorithm).

Both directions (pixel->georef and georef->pixel) are fitted
independently from the same GCPs, exactly how the reference builds its
forward and reverse transforms by swapping the point roles
(gdal_crs.cpp CRS_compute_georef_equations computes E12/N12 and
E21/N21).  Solves are tiny (n_gcps + 3 square), so at corpus scale one
solve per image runs inside the decode UDF — embarrassingly parallel.
"""

from __future__ import annotations

import numpy as np


def polynomial_terms(x, y, order: int) -> np.ndarray:
    """Design matrix columns in CRS_georef order (gdal_crs.cpp:608)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    cols = [np.ones_like(x), x, y]
    if order >= 2:
        cols += [x * x, x * y, y * y]
    if order >= 3:
        cols += [x * x * x, x * x * y, x * y * y, y * y * y]
    if order not in (1, 2, 3):
        raise ValueError("polynomial order must be 1, 2 or 3")
    return np.stack(cols, axis=-1)


def gcp_polynomial_fit(src: np.ndarray, dst: np.ndarray,
                       order: int = 1) -> np.ndarray:
    """Least-squares GCP polynomial (k, 2) coefficients: src (n, 2)
    control coordinates -> dst (n, 2).  Needs n >= k terms."""
    src = np.asarray(src, dtype=np.float64)
    dst = np.asarray(dst, dtype=np.float64)
    A = polynomial_terms(src[:, 0], src[:, 1], order)
    if src.shape[0] < A.shape[1]:
        raise ValueError(
            f"order-{order} fit needs >= {A.shape[1]} GCPs, got {src.shape[0]}")
    coef, *_ = np.linalg.lstsq(A, dst, rcond=None)
    return coef


def gcp_polynomial_eval(coef: np.ndarray, pts: np.ndarray,
                        order: int) -> np.ndarray:
    pts = np.asarray(pts, dtype=np.float64)
    return polynomial_terms(pts[..., 0], pts[..., 1], order) @ coef


def _tps_base(d2: np.ndarray) -> np.ndarray:
    """U = d2 * log(d2), 0 at d2 == 0 (thinplatespline.cpp:175-182)."""
    out = np.zeros_like(d2)
    nz = d2 > 0.0
    out[nz] = d2[nz] * np.log(d2[nz])
    return out


class ThinPlateSpline:
    """2-D -> 2-D thin plate spline through all control points."""

    def __init__(self, src: np.ndarray, dst: np.ndarray,
                 regularization: float = 0.0):
        src = np.asarray(src, dtype=np.float64)
        dst = np.asarray(dst, dtype=np.float64)
        n = src.shape[0]
        if n < 3:
            raise ValueError("TPS needs >= 3 GCPs")
        d2 = ((src[:, None, :] - src[None, :, :]) ** 2).sum(-1)
        K = _tps_base(d2)
        if regularization:
            K += regularization * np.eye(n)
        P = np.concatenate([np.ones((n, 1)), src], axis=1)  # (n, 3)
        A = np.zeros((n + 3, n + 3))
        A[:n, :n] = K
        A[:n, n:] = P
        A[n:, :n] = P.T
        rhs = np.zeros((n + 3, 2))
        rhs[:n] = dst
        sol = np.linalg.solve(A, rhs)
        self.src = src
        self.w = sol[:n]       # radial weights (n, 2)
        self.a = sol[n:]       # affine part (3, 2)

    def __call__(self, pts: np.ndarray) -> np.ndarray:
        pts = np.asarray(pts, dtype=np.float64)
        flat = pts.reshape(-1, 2)
        d2 = ((flat[:, None, :] - self.src[None, :, :]) ** 2).sum(-1)
        out = (_tps_base(d2) @ self.w
               + np.concatenate([np.ones((flat.shape[0], 1)), flat], 1)
               @ self.a)
        return out.reshape(pts.shape)


def gcp_transformer(src: np.ndarray, dst: np.ndarray, method="tps",
                    order: int = 1):
    """Callable pts -> pts transformer from GCPs; method 'tps' or 'poly'.
    Fit the reverse direction by swapping src/dst (the reference's E21/N21
    construction)."""
    if method == "tps":
        return ThinPlateSpline(src, dst)
    coef = gcp_polynomial_fit(src, dst, order)
    return lambda pts: gcp_polynomial_eval(coef, pts, order)
