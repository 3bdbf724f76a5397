"""Closed-form WGS84 <-> UTM transverse-Mercator transform (no PROJ in this
container). Krüger series, 6th order in n — the published formulation PROJ
itself uses for `etmerc/utm` (Karney 2011, "Transverse Mercator with an
accuracy of a few nanometers"); sub-micrometer agreement within a zone.

Covers the reference's benchmark warp workload EPSG:32631 -> EPSG:4326
(/root/reference/autotest/benchmark/test_gdalwarp.py:24); the engine's
transform role is OGRCoordinateTransformation (ogr/ogrct.cpp:2359,2684)
restricted to the UTM<->geographic pair.

Vectorized over numpy arrays throughout (the batch shape the warp and
ST-layer UDFs use).
"""

from __future__ import annotations

import numpy as np

_A = 6378137.0
_F = 1.0 / 298.257223563
_K0 = 0.9996
_FE = 500000.0
_FN_SOUTH = 10000000.0

_n = _F / (2.0 - _F)
_n2, _n3, _n4, _n5, _n6 = _n**2, _n**3, _n**4, _n**5, _n**6
# rectifying radius
_AR = _A / (1 + _n) * (1 + _n2 / 4 + _n4 / 64 + _n6 / 256)

# Krüger alpha (forward) / beta (inverse) series, 6th order (Karney 2011)
_ALPHA = np.array([
    _n / 2 - 2 * _n2 / 3 + 5 * _n3 / 16 + 41 * _n4 / 180 - 127 * _n5 / 288
    + 7891 * _n6 / 37800,
    13 * _n2 / 48 - 3 * _n3 / 5 + 557 * _n4 / 1440 + 281 * _n5 / 630
    - 1983433 * _n6 / 1935360,
    61 * _n3 / 240 - 103 * _n4 / 140 + 15061 * _n5 / 26880
    + 167603 * _n6 / 181440,
    49561 * _n4 / 161280 - 179 * _n5 / 168 + 6601661 * _n6 / 7257600,
    34729 * _n5 / 80640 - 3418889 * _n6 / 1995840,
    212378941 * _n6 / 319334400,
])
_BETA = np.array([
    _n / 2 - 2 * _n2 / 3 + 37 * _n3 / 96 - _n4 / 360 - 81 * _n5 / 512
    + 96199 * _n6 / 604800,
    _n2 / 48 + _n3 / 15 - 437 * _n4 / 1440 + 46 * _n5 / 105
    - 1118711 * _n6 / 3870720,
    17 * _n3 / 480 - 37 * _n4 / 840 - 209 * _n5 / 4480 + 5569 * _n6 / 90720,
    4397 * _n4 / 161280 - 11 * _n5 / 504 - 830251 * _n6 / 7257600,
    4583 * _n5 / 161280 - 108847 * _n6 / 3991680,
    20648693 * _n6 / 638668800,
])
_E2SQN = 2.0 * np.sqrt(_n) / (1.0 + _n)


def utm_zone_lon0(zone: int) -> float:
    """Central meridian (degrees) of UTM zone 1..60."""
    return -183.0 + 6.0 * zone


def lonlat_to_utm(lon, lat, zone: int, south: bool = False):
    """WGS84 degrees -> UTM easting/northing (meters) in the given zone."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    lam = np.radians(lon - utm_zone_lon0(zone))
    phi = np.radians(lat)
    s = np.sin(phi)
    # conformal latitude
    t = np.sinh(np.arcsinh(np.tan(phi)) - _E2SQN * np.arctanh(_E2SQN * s))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j in range(6):
        k = 2.0 * (j + 1)
        xi += _ALPHA[j] * np.sin(k * xi_p) * np.cosh(k * eta_p)
        eta += _ALPHA[j] * np.cos(k * xi_p) * np.sinh(k * eta_p)
    easting = _FE + _K0 * _AR * eta
    northing = _K0 * _AR * xi + (_FN_SOUTH if south else 0.0)
    return easting, northing


def utm_to_lonlat(easting, northing, zone: int, south: bool = False):
    """UTM meters -> WGS84 degrees. Inverse series + 2-step Newton on the
    conformal-to-geodetic latitude (converges to ~1e-12 rad)."""
    e = np.asarray(easting, dtype=np.float64)
    nn = np.asarray(northing, dtype=np.float64)
    xi = (nn - (_FN_SOUTH if south else 0.0)) / (_K0 * _AR)
    eta = (e - _FE) / (_K0 * _AR)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j in range(6):
        k = 2.0 * (j + 1)
        xi_p -= _BETA[j] * np.sin(k * xi) * np.cosh(k * eta)
        eta_p -= _BETA[j] * np.cos(k * xi) * np.sinh(k * eta)
    s = np.sinh(eta_p)
    lam = np.arctan2(s, np.cos(xi_p))
    tau_p = np.sin(xi_p) / np.sqrt(s * s + np.cos(xi_p) ** 2)
    # invert conformal latitude tau' -> tau by Newton (Karney eq. 19-21)
    tau = tau_p.copy()
    e2 = _F * (2.0 - _F)
    for _ in range(3):
        sig = np.sinh(_E2SQN * np.arctanh(_E2SQN * tau / np.sqrt(1.0 + tau**2)))
        f_tau = tau * np.sqrt(1.0 + sig**2) - sig * np.sqrt(1.0 + tau**2) - tau_p
        # dτ'/dτ per Karney eq. 21
        dtau = (
            (np.sqrt((1.0 + sig**2) * (1.0 + tau**2)) - sig * tau)
            * (1.0 - e2) * np.sqrt(1.0 + tau**2)
            / (1.0 + (1.0 - e2) * tau**2)
        )
        tau = tau - f_tau / dtau
    phi = np.arctan(tau)
    return np.degrees(lam) + utm_zone_lon0(zone), np.degrees(phi)


def utm_zone_for_lon(lon: float) -> int:
    return int(np.clip((np.floor((lon + 180.0) / 6.0) + 1), 1, 60))
