"""Deterministic geo-derived views over the driver's TPC-H-ish tables.

The external correctness harness can only oracle-check SQL that DuckDB can run
on the pre-registered views (region nation customer supplier part orders
lineitem events documents embeddings). So the spatial operators are exercised
over point sets derived *deterministically, with integer arithmetic only*,
from those tables — the same CTE text runs in Spark and DuckDB, making every
spatial query oracle-checkable end to end.

The derivation bakes in a skew hot-spot (20% of customers collapse into a
~0.1° box around (2.3, 48.8)) so the spatial join exercises the same dense-
cell skew the north rule calls out.
"""

from __future__ import annotations

# lon/lat from integer keys: modular scatter at 0.01° granularity (exact in
# binary-compatible double arithmetic in both engines), hot cluster for
# key % 5 = 0.
CUSTOMER_POINTS_CTE = """
customer_points AS (
  SELECT
    c_custkey AS pid,
    CASE WHEN c_custkey % 5 = 0
         THEN 2.3 + CAST((c_custkey * 13) % 100 AS DOUBLE) / 1000.0
         ELSE CAST((c_custkey * 9973) % 36000 AS DOUBLE) / 100.0 - 180.0
    END AS lon,
    CASE WHEN c_custkey % 5 = 0
         THEN 48.8 + CAST((c_custkey * 17) % 100 AS DOUBLE) / 1000.0
         ELSE CAST((c_custkey * 7919) % 17000 AS DOUBLE) / 100.0 - 85.0
    END AS lat
  FROM customer
)"""

SUPPLIER_POINTS_CTE = """
supplier_points AS (
  SELECT
    s_suppkey AS sid,
    CAST((s_suppkey * 7129) % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon,
    CAST((s_suppkey * 3571) % 17000 AS DOUBLE) / 100.0 - 85.0 AS lat
  FROM supplier
)"""

ORDERS_POINTS_CTE = """
orders_points AS (
  SELECT
    o_orderkey AS oid,
    o_totalprice,
    CASE WHEN o_orderkey % 5 = 0
         THEN 2.3 + CAST((o_orderkey * 13) % 100 AS DOUBLE) / 1000.0
         ELSE CAST((o_orderkey * 104729) % 36000 AS DOUBLE) / 100.0 - 180.0
    END AS lon,
    CASE WHEN o_orderkey % 5 = 0
         THEN 48.8 + CAST((o_orderkey * 17) % 100 AS DOUBLE) / 1000.0
         ELSE CAST((o_orderkey * 15485863) % 17000 AS DOUBLE) / 100.0 - 85.0
    END AS lat
  FROM orders
)"""

# Rect layers for layer-algebra queries: boxes centered on the derived
# points, size keyed off the id (meters, EPSG:3857). Shared text — both
# engines compute identical doubles. Template placeholders {MX}/{MY} are
# filled by queries.py with the mercator expressions.
CUSTOMER_RECTS_TEMPLATE = """
customer_rects AS (
  SELECT pid AS aid,
         {MX} - (200000.0 + (pid % 7) * 50000.0) AS minx,
         {MY} - (150000.0 + (pid % 5) * 50000.0) AS miny,
         {MX} + (200000.0 + (pid % 7) * 50000.0) AS maxx,
         {MY} + (150000.0 + (pid % 5) * 50000.0) AS maxy
  FROM customer_points
)"""

SUPPLIER_RECTS_TEMPLATE = """
supplier_rects AS (
  SELECT sid AS bid,
         {MX} - 1200000.0 AS minx,
         {MY} - 900000.0 AS miny,
         {MX} + 1200000.0 AS maxx,
         {MY} + 900000.0 AS maxy
  FROM supplier_points
)"""

TPCH_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def register_tpch_views(spark, sf_dir: str) -> None:
    """Register the driver's parquet tables as temp views (idempotent), so
    shared SQL text resolves identically in Spark and the DuckDB oracle.
    Also hardens foreign sessions (executor imports, Arrow/AQE tuning)."""
    from ..runtime import ensure_runtime

    ensure_runtime(spark)
    for t in TPCH_TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
