"""Bucketed-table layout for co-located (shuffle-free) joins.

The reference's B-tree indexes amortize repeated lookups; the Spark
analog for repeated BIG-big joins is bucketing: both fact tables
hash-clustered into the same number of buckets on the join key at
WRITE time, so every subsequent join/groupBy on that key skips its
Exchange entirely — the shuffle is paid once, at layout time.

tests/test_bucketing.py asserts the resulting join plan really has
no Exchange on either side (that assertion IS the point of this
module — a layout that silently falls back to shuffling is a
regression at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
) -> None:
    """Persist as a bucketed+sorted managed table. One shuffle now;
    zero on every future equi-join or aggregation on bucket_col."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With
    matching bucket counts Catalyst plans SortMergeJoin with NO
    Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on)
