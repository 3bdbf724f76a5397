"""Arrow-native database connector — the ADBC role (reference:
/root/reference/gcore/gdal_adbc.cpp, which plugs Arrow-stream database
drivers into the dataset model; its canonical target is DuckDB/SQLite).

DuckDB is exactly such an engine and ships in this environment, so the
connector is real, not a stub: SQL executes inside DuckDB and the results
cross into Spark as ARROW BATCHES (no row-at-a-time Python), either in one
driver-side stream for small results or PARTITIONED — the JDBC
partitionColumn pattern — where each Spark task opens its own DuckDB
connection and fetches one predicate range, so a large extract scales with
the cluster.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def read_sql(spark: SparkSession, sql: str, database: str | None = None
             ) -> DataFrame:
    """One-shot Arrow read: run ``sql`` in DuckDB, hand the Arrow table to
    Spark. For results that fit the driver (dimension tables, pushdown-
    aggregated extracts); use :func:`read_sql_partitioned` for big ones."""
    import duckdb

    con = duckdb.connect(database or ":memory:")
    try:
        tbl = con.execute(sql).arrow()
    finally:
        con.close()
    return spark.createDataFrame(tbl.to_pandas())


def read_sql_partitioned(spark: SparkSession, sql: str, partition_column: str,
                         lower: int, upper: int, num_partitions: int,
                         database: str | None = None) -> DataFrame:
    """Distributed Arrow read: each task runs the query against its own
    DuckDB connection restricted to one ``partition_column`` range
    (half-open strides over [lower, upper]; the first/last partitions are
    unbounded below/above so no rows are lost) — the partitioned-read
    contract of JDBC/ADBC sources.

    ``sql`` must be a SELECT; it is wrapped as a subquery, so pushdown of
    the range predicate happens inside DuckDB."""
    bounds = np.linspace(lower, upper, num_partitions + 1)
    parts = []
    for i in range(num_partitions):
        lo = None if i == 0 else int(np.floor(bounds[i]))
        hi = None if i == num_partitions - 1 else int(np.floor(bounds[i + 1]))
        parts.append((i, lo, hi))
    pdf = pd.DataFrame(parts, columns=["pid", "lo", "hi"])
    # nullable int64 for the open-ended first/last ranges
    pdf["lo"] = pdf["lo"].astype("Int64")
    pdf["hi"] = pdf["hi"].astype("Int64")
    ranges = spark.createDataFrame(pdf).repartition(num_partitions, "pid")

    db = database

    def fetch(batches):
        import duckdb

        for b in batches:
            for r in b.itertuples(index=False):
                conds = []
                if not pd.isna(r.lo):
                    conds.append(f"{partition_column} >= {int(r.lo)}")
                if not pd.isna(r.hi):
                    conds.append(f"{partition_column} < {int(r.hi)}")
                where = " AND ".join(conds) or "TRUE"
                if pd.isna(r.lo):
                    # NULL keys fail every range predicate; route them to the
                    # first partition so "no rows are lost" holds (the JDBC
                    # partitionColumn NULL caveat, solved not documented).
                    where = f"({where}) OR {partition_column} IS NULL"
                con = duckdb.connect(db or ":memory:")
                try:
                    out = con.execute(
                        f"SELECT * FROM ({sql}) _q WHERE {where}"
                    ).df()
                finally:
                    con.close()
                if len(out):
                    yield out

    # infer the schema from a 1-row probe on the driver (Spark cannot infer
    # from an empty frame)
    import duckdb

    con = duckdb.connect(db or ":memory:")
    try:
        probe = con.execute(f"SELECT * FROM ({sql}) _q LIMIT 1").df()
    finally:
        con.close()
    if len(probe) == 0:
        raise ValueError("read_sql_partitioned: query returned no rows to "
                         "infer a schema from")
    schema = spark.createDataFrame(probe).schema
    return ranges.mapInPandas(fetch, schema=schema)
