"""Closed-form WGS84 <-> Lambert Conformal Conic (2SP) and Polar
Stereographic (variant B) transforms — the two most common non-cylindrical
projected CRS families (regional mapping grids, EPSG:3031/3413 polar
grids).  No PROJ in this container, so these are the published ellipsoidal
closed forms from Snyder, *Map Projections — A Working Manual* (USGS PP
1395): LCC pp. 104-110 (eqs 15-1..15-11), polar stereographic pp. 160-163
(eqs 21-33..21-41, 7-9).  The engine's transform role is
OGRCoordinateTransformation (/root/reference/ogr/ogrct.cpp:2359,2684)
restricted to these closed-form pairs, alongside oracle/utm.py and
oracle/mercator.py.

Vectorized over numpy arrays; inverses iterate the standard conformal
latitude fixed point to double-precision convergence (<= 10 rounds).
"""

from __future__ import annotations

import numpy as np

_A = 6378137.0
_F = 1.0 / 298.257223563
_E2 = _F * (2.0 - _F)
_E = np.sqrt(_E2)


def _m(phi):
    """Snyder 14-15: cos(phi) / sqrt(1 - e^2 sin^2 phi)."""
    s = np.sin(phi)
    return np.cos(phi) / np.sqrt(1.0 - _E2 * s * s)


def _t(phi):
    """Snyder 15-9: tan(pi/4 - phi/2) / ((1 - e sin)/(1 + e sin))^(e/2)."""
    s = np.sin(phi)
    return (np.tan(np.pi / 4.0 - phi / 2.0)
            / np.power((1.0 - _E * s) / (1.0 + _E * s), _E / 2.0))


def _phi_from_t(t):
    """Invert Snyder 15-9 / 7-9: conformal-latitude fixed point."""
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(10):
        s = np.sin(phi)
        phi_new = (np.pi / 2.0 - 2.0 * np.arctan(
            t * np.power((1.0 - _E * s) / (1.0 + _E * s), _E / 2.0)))
        if np.all(np.abs(phi_new - phi) < 1e-14):
            phi = phi_new
            break
        phi = phi_new
    return phi


class LambertConformalConic:
    """LCC 2SP (EPSG method 9802).  Parameters in degrees/meters."""

    def __init__(self, lat1: float, lat2: float, lat0: float, lon0: float,
                 fe: float = 0.0, fn: float = 0.0):
        p1, p2, p0 = np.deg2rad([lat1, lat2, lat0])
        self.lon0 = np.deg2rad(lon0)
        self.fe, self.fn = fe, fn
        m1, m2 = _m(p1), _m(p2)
        t1, t2, t0 = _t(p1), _t(p2), _t(p0)
        if abs(lat1 - lat2) < 1e-12:  # 1SP degenerate: n = sin(lat1)
            self.n = np.sin(p1)
        else:
            self.n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
        self.F = m1 / (self.n * np.power(t1, self.n))
        self.rho0 = _A * self.F * np.power(t0, self.n)

    def forward(self, lon, lat):
        lon = np.deg2rad(np.asarray(lon, dtype=np.float64))
        lat = np.deg2rad(np.asarray(lat, dtype=np.float64))
        rho = _A * self.F * np.power(_t(lat), self.n)
        th = self.n * (lon - self.lon0)
        return (self.fe + rho * np.sin(th),
                self.fn + self.rho0 - rho * np.cos(th))

    def inverse(self, E, N):
        E = np.asarray(E, dtype=np.float64) - self.fe
        N = np.asarray(N, dtype=np.float64) - self.fn
        sgn = 1.0 if self.n >= 0 else -1.0
        rho = sgn * np.hypot(E, self.rho0 - N)
        t = np.power(rho / (_A * self.F), 1.0 / self.n)
        th = np.arctan2(sgn * E, sgn * (self.rho0 - N))
        lat = _phi_from_t(t)
        lon = th / self.n + self.lon0
        return np.rad2deg(lon), np.rad2deg(lat)


class PolarStereographic:
    """Polar stereographic, variant B (EPSG method 9829): standard
    parallel lat_ts, central meridian lon0.  ``south=True`` is the
    EPSG:3031 aspect (lat_ts = -71), ``south=False`` the EPSG:3413 one."""

    def __init__(self, lat_ts: float, lon0: float, south: bool = True,
                 fe: float = 0.0, fn: float = 0.0):
        self.south = south
        self.lon0 = np.deg2rad(lon0)
        self.fe, self.fn = fe, fn
        pts = np.deg2rad(abs(lat_ts))
        # work in the north aspect internally; mirror for south
        self.mc = _m(pts)
        self.tc = _t(pts)

    def forward(self, lon, lat):
        lon = np.deg2rad(np.asarray(lon, dtype=np.float64))
        lat = np.deg2rad(np.asarray(lat, dtype=np.float64))
        if self.south:
            lon, lat = -lon, -lat
            lon0 = -self.lon0
        else:
            lon0 = self.lon0
        rho = _A * self.mc * _t(lat) / self.tc
        x = rho * np.sin(lon - lon0)
        y = -rho * np.cos(lon - lon0)
        if self.south:
            x, y = -x, -y
        return self.fe + x, self.fn + y

    def inverse(self, E, N):
        x = np.asarray(E, dtype=np.float64) - self.fe
        y = np.asarray(N, dtype=np.float64) - self.fn
        if self.south:
            x, y = -x, -y
            lon0 = -self.lon0
        else:
            lon0 = self.lon0
        rho = np.hypot(x, y)
        t = rho * self.tc / (_A * self.mc)
        lat = _phi_from_t(t)
        lon = lon0 + np.arctan2(x, -y)
        if self.south:
            lon, lat = -lon, -lat
        return np.rad2deg(lon), np.rad2deg(lat)


def _q(phi):
    """Snyder 3-12: the equal-area authalic q function."""
    s = np.sin(phi)
    return (1.0 - _E2) * (s / (1.0 - _E2 * s * s)
                          - (1.0 / (2.0 * _E))
                          * np.log((1.0 - _E * s) / (1.0 + _E * s)))


def _phi_from_q(q):
    """Invert Snyder 3-12 via the 3-16 fixed point (<= 10 rounds to
    double precision)."""
    phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
    for _ in range(10):
        s = np.sin(phi)
        d = 1.0 - _E2 * s * s
        phi_new = phi + (d * d / (2.0 * np.cos(phi))) * (
            q / (1.0 - _E2) - s / d
            + (1.0 / (2.0 * _E)) * np.log((1.0 - _E * s) / (1.0 + _E * s)))
        if np.all(np.abs(phi_new - phi) < 1e-14):
            phi = phi_new
            break
        phi = phi_new
    return phi


class AlbersEqualArea:
    """Albers equal-area conic, 2SP (EPSG method 9822; Snyder PP 1395
    pp. 98-103, eqs 14-1..14-19) — the standard continental statistics
    grid family (the EPSG:5070 CONUS shape, here on the WGS84
    ellipsoid)."""

    def __init__(self, lat1: float, lat2: float, lat0: float, lon0: float,
                 fe: float = 0.0, fn: float = 0.0):
        p1, p2, p0 = np.deg2rad([lat1, lat2, lat0])
        self.lon0 = np.deg2rad(lon0)
        self.fe, self.fn = fe, fn
        m1, m2 = _m(p1), _m(p2)
        q1, q2, q0 = _q(p1), _q(p2), _q(p0)
        if abs(lat1 - lat2) < 1e-12:
            self.n = np.sin(p1)
        else:
            self.n = (m1 * m1 - m2 * m2) / (q2 - q1)
        self.C = m1 * m1 + self.n * q1
        self.rho0 = _A * np.sqrt(self.C - self.n * q0) / self.n

    def forward(self, lon, lat):
        lon = np.deg2rad(np.asarray(lon, dtype=np.float64))
        lat = np.deg2rad(np.asarray(lat, dtype=np.float64))
        rho = _A * np.sqrt(self.C - self.n * _q(lat)) / self.n
        th = self.n * (lon - self.lon0)
        return (self.fe + rho * np.sin(th),
                self.fn + self.rho0 - rho * np.cos(th))

    def inverse(self, E, N):
        x = np.asarray(E, dtype=np.float64) - self.fe
        y = np.asarray(N, dtype=np.float64) - self.fn
        sgn = 1.0 if self.n >= 0 else -1.0
        rho = sgn * np.hypot(x, self.rho0 - y)
        q = (self.C - (rho * self.n / _A) ** 2) / self.n
        th = np.arctan2(sgn * x, sgn * (self.rho0 - y))
        lat = _phi_from_q(q)
        lon = th / self.n + self.lon0
        return np.rad2deg(lon), np.rad2deg(lat)


class Sinusoidal:
    """Spherical sinusoidal (Sanson-Flamsteed; Snyder pp. 243-248) on the
    authalic radius the MODIS land grid uses (R = 6371007.181 m) — the
    projection of the most widely distributed satellite raster tiling
    scheme.  Equal-area; forward/inverse are exact closed forms."""

    def __init__(self, lon0: float = 0.0, radius: float = 6371007.181,
                 fe: float = 0.0, fn: float = 0.0):
        self.lon0 = np.deg2rad(lon0)
        self.R = radius
        self.fe, self.fn = fe, fn

    def forward(self, lon, lat):
        lon = np.deg2rad(np.asarray(lon, dtype=np.float64))
        lat = np.deg2rad(np.asarray(lat, dtype=np.float64))
        return (self.fe + self.R * (lon - self.lon0) * np.cos(lat),
                self.fn + self.R * lat)

    def inverse(self, E, N):
        x = np.asarray(E, dtype=np.float64) - self.fe
        y = np.asarray(N, dtype=np.float64) - self.fn
        lat = y / self.R
        lon = self.lon0 + x / (self.R * np.cos(lat))
        return np.rad2deg(lon), np.rad2deg(lat)


# canonical instances for the driver queries / operators
def epsg_3031() -> PolarStereographic:
    """Antarctic Polar Stereographic."""
    return PolarStereographic(lat_ts=-71.0, lon0=0.0, south=True)


def albers_conus() -> AlbersEqualArea:
    """CONUS Albers (the EPSG:5070 parameter set on WGS84)."""
    return AlbersEqualArea(lat1=29.5, lat2=45.5, lat0=23.0, lon0=-96.0)


def sinu_modis() -> Sinusoidal:
    """MODIS sinusoidal land grid (SR-ORG:6974 shape)."""
    return Sinusoidal(lon0=0.0, radius=6371007.181)


def epsg_3413() -> PolarStereographic:
    """NSIDC Sea Ice Polar Stereographic North (lat_ts=70, lon0=-45)."""
    return PolarStereographic(lat_ts=70.0, lon0=-45.0, south=False)


def lcc_europe() -> LambertConformalConic:
    """ETRS89-extent LCC (EPSG:3034-style parameters)."""
    return LambertConformalConic(lat1=35.0, lat2=65.0, lat0=52.0,
                                 lon0=10.0, fe=4000000.0, fn=2800000.0)
