"""Streaming sinks: keyed upsert via foreachBatch.

Structured Streaming's file sinks are append-only; an upserted table
(the reference's S9 semantics, SURVEY §2.1) needs foreachBatch + the
same last-wins window rewrite the batch engine uses
(operators/wilayah.py::upsert). Each micro-batch is merged
transactionally (staged write + atomic swap), so the table is always
a consistent snapshot; the checkpoint makes re-processing idempotent
— a replayed batch produces the same winners.

At scale the rewrite's shuffle is keyed on the merge key; AQE sizes
the post-shuffle partitions. (With a Delta/Iceberg table this whole
module collapses to MERGE INTO — this is the storage-format-free
equivalent.)
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_last_wins(
    spark: SparkSession,
    table_path: str,
    batch: DataFrame,
    keys: list[str],
    order_cols: list[str],
) -> None:
    """Generic keyed last-wins merge into a parquet table: the
    greatest `order_cols` value wins per key (event-time truth — a
    late-arriving older row never overwrites a newer one); batch rows
    win exact order ties against existing rows. One shuffle on the
    key."""
    from pyspark.sql.window import Window

    batch = batch.withColumn("_prio", F.lit(1))
    if os.path.exists(table_path):
        existing = spark.read.parquet(table_path).withColumn(
            "_prio", F.lit(0)
        )
        merged = batch.unionByName(existing)
    else:
        merged = batch
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in order_cols], F.col("_prio").desc()
    )
    winners = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_prio")
    )
    tmp = table_path + "._staged"
    winners.write.mode("overwrite").parquet(tmp)
    if os.path.exists(table_path):
        shutil.rmtree(table_path)
    os.rename(tmp, table_path)


def upsert_stream(
    stream: DataFrame,
    table_path: str,
    checkpoint: str,
    keys: list[str],
    order_cols: list[str],
):
    """writeStream → keyed upserted parquet table. Returns the
    StreamingQuery (caller picks the trigger/awaits)."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_last_wins(
            batch_df.sparkSession, table_path, batch_df, keys, order_cols
        )

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
    )
