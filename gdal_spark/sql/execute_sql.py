"""ExecuteSQL — the engine's analogue of ``GDALDataset::ExecuteSQL``
(/root/reference/gcore/gdaldataset.cpp:7411).

The reference routes SQL through either its own OGR SQL engine (swq) or the
SQLite dialect; here both land on Spark SQL (Catalyst plays the role of the
swq parser/binder + SQLite VM, SURVEY §3.1), with:

* the driver's tables registered as views;
* the ST_* function surface registered (SQLite-dialect parity);
* OGR SQL special fields mapped: ``FID`` (stable row id) and
  ``OGR_GEOM_AREA`` (ogr/ogrfeaturequery.cpp:37, ogr/ogr_p.h:169) are
  available on geometry-bearing views via ``with_special_fields``;
* dialect="OGRSQL" applies the reference's restrictions (single SELECT,
  no GROUP BY — whole-table summary aggregates only, matching
  SWQM_SUMMARY_RECORD; gdaldataset.cpp:7416 routes everything else to the
  SQLite dialect which Spark SQL supersedes).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, functions as F

from .geoviews import register_tpch_views
from .ogr_compat import register_st_functions


def with_special_fields(df: DataFrame, geom_col: str | None = "wkb",
                        style_col: str | None = "style") -> DataFrame:
    """Attach OGR special fields: FID (64-bit feature id), OGR_GEOM_AREA
    when a geometry column exists, and OGR_STYLE (ogrfeaturestyle.cpp;
    ogr/ogrfeaturequery.cpp special-field list) when a style column
    exists."""
    out = df.withColumn("FID", F.monotonically_increasing_id())
    if geom_col and geom_col in df.columns:
        out = out.withColumn("OGR_GEOM_AREA", F.expr(f"ST_Area({geom_col})"))
    if style_col and style_col in df.columns:
        out = out.withColumn("OGR_STYLE", F.col(style_col))
    return out


_OGRSQL_FORBIDDEN = re.compile(
    r"\b(GROUP\s+BY|HAVING|INTERSECT|EXCEPT|WINDOW|OVER\s*\()", re.IGNORECASE
)


def execute_sql(spark: SparkSession, sql: str, sf_dir: str | None = None,
                dialect: str = "SPARKSQL") -> DataFrame:
    """Run SQL over the engine's registered layers.

    dialect="OGRSQL" enforces the reference's OGR SQL surface (no GROUP BY /
    set ops / windows — those exist only via its SQLite dialect); anything
    richer needs dialect="SPARKSQL" (the default), mirroring how callers of
    the reference choose dialects per query.
    """
    if sf_dir is not None:
        register_tpch_views(spark, sf_dir)
    register_st_functions(spark)
    if dialect.upper() == "OGRSQL":
        if _OGRSQL_FORBIDDEN.search(sql):
            raise ValueError(
                "OGR SQL dialect does not support GROUP BY/set ops/window "
                "functions (reference routes these to the SQLite dialect; "
                "use dialect='SPARKSQL')"
            )
        if sql.count("SELECT") > 1 and "UNION ALL" not in sql.upper():
            raise ValueError("OGR SQL supports a single SELECT (plus UNION ALL)")
    return spark.sql(sql)
