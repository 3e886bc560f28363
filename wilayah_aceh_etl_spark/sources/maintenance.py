"""Table maintenance: small-file compaction.

Every incremental writer (streaming upsert sink, repeated syncs)
fragments a parquet table into many small files; at 100 TB the
resulting per-file open/footer overhead dominates scan time and
executors starve on listing. Compaction rewrites the table at a
target file size, preserving the partition layout and re-sorting
rows within files so min/max row-group pruning keeps working.

(Delta/Iceberg expose this as OPTIMIZE; this is the plain-parquet
equivalent with the same staged-write + atomic-swap discipline as
the upsert path.)
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def _tree_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith((".", "_")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_table(
    spark: SparkSession,
    table_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by: tuple[str, ...] = (),
    sort_within: tuple[str, ...] = (),
) -> int:
    """Rewrite `table_path` with ≈target-sized files. Returns the
    output file-count target. Data is byte-identical (same rows);
    only the physical layout changes."""
    df = spark.read.parquet(table_path)
    n_files = max(1, math.ceil(_tree_bytes(table_path) / target_file_bytes))
    out: DataFrame
    if partition_by:
        out = df.repartition(n_files, *partition_by)
    else:
        out = df.repartition(n_files)
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    tmp = table_path + "._compacting"
    writer.parquet(tmp)
    shutil.rmtree(table_path)
    os.rename(tmp, table_path)
    return n_files


def data_file_count(table_path: str) -> int:
    n = 0
    for _root, _dirs, files in os.walk(table_path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_cols: tuple[str, ...],
    num_files: int | None = None,
) -> None:
    """Globally range-sorted table layout WITHOUT a single-reducer
    sort: repartitionByRange samples the sort keys and assigns each
    output file a disjoint key range; sortWithinPartitions orders
    rows inside each file. Files are therefore globally ordered
    (file i's max < file i+1's min) and every file's min/max footer
    stats prune range predicates — the plain-parquet analog of a
    clustered index, and the write layout the wilayah `kode` table
    uses conceptually (X1 replacement at corpus scale).

    At 100 TB this is THE way to produce sorted output: orderBy()
    before a write would still distribute (Spark's sort is a range
    exchange too) but repartitionByRange makes the file-count and
    boundary contract explicit."""
    out = df
    if num_files:
        out = out.repartitionByRange(num_files, *sort_cols)
    else:
        out = out.repartitionByRange(*sort_cols)
    out.sortWithinPartitions(*sort_cols).write.mode("overwrite").parquet(path)


def zorder_key(cols, mins, maxs, bits: int = 16):
    """Morton (Z-order) key: min-max scale each column to `bits`-bit
    integers, then interleave their bits. Rows close in EVERY listed
    dimension get close keys, so range-partitioning on the key gives
    each file a bounded hyper-rectangle — parquet min/max footer
    stats then prune scans filtered on ANY of the dimensions, not
    just the leading sort column. This is the multi-dimensional
    clustering Delta exposes as OPTIMIZE ZORDER BY, built from plain
    column expressions (static bit unroll — stays inside whole-stage
    codegen; no UDF).

    `mins`/`maxs` are the per-column bounds (one cheap agg pass at
    write time). Degenerate columns (min == max) contribute zeros."""
    from pyspark.sql import functions as F

    n = len(cols)
    scaled = []
    top = (1 << bits) - 1
    for c, lo, hi in zip(cols, mins, maxs):
        col = F.col(c) if isinstance(c, str) else c
        if hi == lo:
            scaled.append(F.lit(0).cast("long"))
        else:
            frac = (col.cast("double") - float(lo)) / (float(hi) - float(lo))
            scaled.append(
                F.least(
                    F.lit(top),
                    F.greatest(F.lit(0), F.floor(frac * (top + 1))),
                ).cast("long")
            )
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, s in enumerate(scaled):
            bit = F.shiftright(s, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * n + i))
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: tuple[str, ...],
    num_files: int = 8,
    bits: int = 16,
) -> None:
    """Write `df` clustered on the Z-order key of `zorder_cols`:
    one stats pass for the bounds, then repartitionByRange +
    sortWithinPartitions on the key (same no-single-reducer
    discipline as write_range_sorted). Compared with a linear sort
    on the first column, every file's footer now bounds a small
    rectangle in ALL z-dimensions — the layout to choose when scans
    filter on more than one column (the 100 TB replacement for
    secondary indexes)."""
    from pyspark.sql import functions as F

    aggs = []
    for c in zorder_cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    stats = df.agg(*aggs).head()
    mins = [stats[f"min_{c}"] for c in zorder_cols]
    maxs = [stats[f"max_{c}"] for c in zorder_cols]
    key = zorder_key(list(zorder_cols), mins, maxs, bits=bits)
    (
        df.withColumn("_zkey", key)
        .repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
