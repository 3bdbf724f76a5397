import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from gdal_spark.session import get_spark

    s = get_spark(cores=8, app_name="gdal_spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tpch(spark):
    from gdal_spark.sql.geoviews import register_tpch_views

    register_tpch_views(spark, SF_DIR)
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def assert_frames_match(spark_df, duck_rel, sort_cols=None, float_cols=(), rtol=1e-9):
    """Mirror of the driver's compare: row count + column names + values
    (order-insensitive; columns sorted by name)."""
    import pandas as pd

    a = spark_df.toPandas()
    b = duck_rel.df()
    assert sorted(a.columns) == sorted(b.columns), (a.columns, b.columns)
    a = a[sorted(a.columns)]
    b = b[sorted(b.columns)]
    assert len(a) == len(b), f"row count {len(a)} vs {len(b)}"
    sort_by = sort_cols or list(a.columns)
    a = a.sort_values(sort_by, ignore_index=True)
    b = b.sort_values(sort_by, ignore_index=True)
    for c in a.columns:
        if c in float_cols:
            import numpy as np

            np.testing.assert_allclose(
                a[c].to_numpy(dtype=float), b[c].to_numpy(dtype=float), rtol=rtol
            )
        else:
            av, bv = a[c], b[c]
            if av.dtype != bv.dtype:
                av = av.astype(object)
                bv = bv.astype(object)
            pd.testing.assert_series_equal(av, bv, check_names=False, check_dtype=False)
