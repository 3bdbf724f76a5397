"""Bucketed tables — shuffle-free co-located joins.

The engine's big-joins story at 100 TB (SURVEY §4 "Chunking to memory
budget" / the north rule's explicit partitioning mandate): when two fact
tables are repeatedly joined on the same key (images ↔ annotations,
tiles ↔ labels), pre-bucketing both sides on that key lets Spark plan a
SortMergeJoin with NO Exchange on either side — the join runs entirely
within co-located buckets. This is the local-warehouse analogue of
Iceberg's ``bucket(N, key)`` partition transform the production deployment
would use; the reference has no equivalent (its joins are per-feature
nested loops, ogr_gensql.cpp:1516-1546).

Spark only recognizes bucketing through the session catalog
(``saveAsTable``), not plain parquet paths — hence the table-name API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int,
                   sort: bool = True, mode: str = "overwrite") -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.
    Sorting within buckets lets the join skip its Sort as well."""
    w = df.write.mode(mode).bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str, how: str = "inner",
                  force_sort_merge: bool = False) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With equal bucket
    counts the sort-merge plan contains no Exchange — verify with
    ``assert_no_shuffle``. ``force_sort_merge`` adds the MERGE hint: at
    demo scales the planner would otherwise broadcast the small side and
    skip the bucketed scan entirely (real fact-fact joins exceed the
    broadcast threshold and pick SMJ on their own)."""
    left = spark.table(left_table)
    if force_sort_merge:
        left = left.hint("MERGE")
    return left.join(spark.table(right_table), key, how)


def assert_no_shuffle(df: DataFrame) -> None:
    """Raise if the physical plan of ``df`` contains any Exchange node."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange" in plan:
        raise AssertionError(
            "plan contains a shuffle Exchange; expected bucket-co-located "
            "execution:\n" + plan[:2000]
        )
