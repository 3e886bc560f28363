"""Interchange-format connectors: CSV, JSON-lines, ORC (+ parquet).

The reference's only interchange surface is whole-file GeoJSON
(SURVEY S3) and its HTTP JSON responses (S10); a Spark engine serving
the same users must also speak the bulk formats data actually arrives
in. These helpers pin the engine's reading discipline:

  * **explicit schema always** — schema inference is a full extra
    pass over the data (fatal at 100 TB) and type-unstable between
    runs; `read_table` therefore REQUIRES a schema for text formats.
  * **JSON is JSON-lines** (one record per line, splittable) — the
    multiLine whole-document mode is reserved for the GeoJSON source
    where the file IS the record.
  * **ORC/parquet get pushdown** — filters and column pruning reach
    the stripe/row-group level; CSV/JSON get column pruning only
    (their readers still parse every line — the docstring-level
    reason bulk data should land in a columnar format once, at
    ingest, mirroring the reference's simplify-once X3 lever).
  * timestamps serialize as ISO-8601 UTC in text formats
    (session timezone is pinned UTC in session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from wilayah_aceh_etl_spark.session import ensure_session_defaults

TEXT_FORMATS = ("csv", "json", "xml")
COLUMNAR_FORMATS = ("orc", "parquet")
FORMATS = TEXT_FORMATS + COLUMNAR_FORMATS

_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"


def write_table(df: DataFrame, path: str, fmt: str, **options: str) -> None:
    """Write df at path in fmt with engine-default options."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format: {fmt!r}")
    writer = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        writer = writer.option("header", "true").option("timestampFormat", _TS_FMT)
    if fmt == "json":
        writer = writer.option("timestampFormat", _TS_FMT)
    if fmt == "xml":
        # native XML source (Spark 4): one element per row
        writer = writer.option("rowTag", "row").option(
            "timestampFormat", _TS_FMT
        )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: T.StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Schema-explicit read. Text formats REQUIRE a schema; columnar
    formats carry their own (passing one still skips footer merging)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format: {fmt!r}")
    if fmt in TEXT_FORMATS and schema is None:
        raise ValueError(
            f"{fmt} read requires an explicit schema (inference is a "
            "full extra pass over the data; never at scale)"
        )
    ensure_session_defaults(spark)
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true").option("timestampFormat", _TS_FMT)
    if fmt == "json":
        reader = reader.option("timestampFormat", _TS_FMT)
    if fmt == "xml":
        reader = reader.option("rowTag", "row").option("timestampFormat", _TS_FMT)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)
