"""gdaltransform analogue — batch point coordinate transforms as columns.

The reference's apps/gdaltransform.cpp pipes stdin points through
OGRCoordinateTransformation; here each supported CRS family is either
pure JVM column math (3857, the benchmark hot path) or a vectorized
Arrow batch over the closed-form oracles (UTM Krüger series, Lambert
conformal conic 2SP, polar stereographic B — oracle/utm.py,
oracle/conic.py). Every transform routes through EPSG:4326 as the hub,
like PROJ's pipeline hub.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import ArrayType, DoubleType

R = 6378137.0


def lonlat_to_3857_cols(lon: Column, lat: Column) -> tuple[Column, Column]:
    """EPSG:4326 -> 3857, pure JVM expressions (whole-stage codegen)."""
    x = F.radians(lon) * R
    y = F.log(F.tan(F.radians(lat) / 2 + float(np.pi / 4))) * R
    return x, y


def m3857_to_lonlat_cols(x: Column, y: Column) -> tuple[Column, Column]:
    lon = F.degrees(x / R)
    lat = F.degrees(F.atan(F.sinh(y / R)))
    return lon, lat


def _family_udf(family: str):
    """(lon, lat) -> [x, y, round_trip_err_m] for the numpy families."""

    @F.pandas_udf(ArrayType(DoubleType()))
    def _udf(lon: pd.Series, lat: pd.Series) -> pd.Series:
        lo = lon.to_numpy(dtype=np.float64)
        la = lat.to_numpy(dtype=np.float64)
        if family == "utm31":
            from ..oracle.utm import lonlat_to_utm, utm_to_lonlat

            x, y = lonlat_to_utm(lo, la, 31)
            blo, bla = utm_to_lonlat(x, y, 31)
        elif family == "lcc_eu":
            from ..oracle.conic import lcc_europe

            prj = lcc_europe()
            x, y = prj.forward(lo, la)
            blo, bla = prj.inverse(x, y)
        elif family == "stereo_s":
            from ..oracle.conic import epsg_3031

            prj = epsg_3031()
            x, y = prj.forward(lo, la)
            blo, bla = prj.inverse(x, y)
        elif family == "albers_conus":
            from ..oracle.conic import albers_conus

            prj = albers_conus()
            x, y = prj.forward(lo, la)
            blo, bla = prj.inverse(x, y)
        elif family == "sinu_modis":
            from ..oracle.conic import sinu_modis

            prj = sinu_modis()
            x, y = prj.forward(lo, la)
            blo, bla = prj.inverse(x, y)
        else:
            raise ValueError(f"unknown family {family!r}")
        # round-trip error in degrees, reported in micro-degrees
        err = np.hypot(blo - lo, bla - la) * 1e6
        return pd.Series(
            [[float(a), float(b), float(e)] for a, b, e in zip(x, y, err)])

    return _udf


def transform_points(df: DataFrame, family: str,
                     lon_col: str = "lon", lat_col: str = "lat"
                     ) -> DataFrame:
    """Add (x, y, rt_err_udeg) columns for the requested projection
    family: '3857' (JVM column math, zero Python), 'utm31', 'lcc_eu',
    'stereo_s' (Arrow batches over the closed-form oracles)."""
    if family == "3857":
        x, y = lonlat_to_3857_cols(F.col(lon_col), F.col(lat_col))
        blon, blat = m3857_to_lonlat_cols(x, y)
        err = F.sqrt(
            F.pow(blon - F.col(lon_col), 2)
            + F.pow(blat - F.col(lat_col), 2)) * 1e6
        return df.withColumns({"x": x, "y": y, "rt_err_udeg": err})
    arr = _family_udf(family)(F.col(lon_col), F.col(lat_col))
    return (df.withColumn("_t", arr)
            .withColumns({"x": F.col("_t")[0], "y": F.col("_t")[1],
                          "rt_err_udeg": F.col("_t")[2]})
            .drop("_t"))
