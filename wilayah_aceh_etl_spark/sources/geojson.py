"""GeoJSON FeatureCollection source (SURVEY S1-S5, S7 collapse).

One declarative read replaces the reference's readdirSync + per-file
JSON.parse loop (server.js:347-368): multiLine JSON with an explicit
schema (no inference scan — mandatory at 100 TB), pathGlobFilter for
the filename-prefix predicate, input_file_name()/_metadata for
filename- and size-derived columns, posexplode for the in-file
feature index that the distributed upsert uses as the last-wins
tiebreaker (SURVEY §7 hard-problem 3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wilayah_aceh_etl_spark.functions.geometry import GEOMETRY_SCHEMA
from wilayah_aceh_etl_spark.session import ensure_session_defaults

# Union of the four per-level property shapes (SURVEY §1.3); absent
# keys are null per level.
PROPERTIES_SCHEMA = T.StructType(
    [
        T.StructField("kd_propinsi", T.StringType()),
        T.StructField("kd_dati2", T.StringType()),
        T.StructField("kd_kecamatan", T.StringType()),
        T.StructField("kd_kelurahan", T.StringType()),
        T.StructField("nm_propinsi", T.StringType()),
        T.StructField("nm_dati2", T.StringType()),
        T.StructField("nm_kecamatan", T.StringType()),
        T.StructField("nm_kelurahan", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("properties", PROPERTIES_SCHEMA),
        T.StructField("geometry", GEOMETRY_SCHEMA),
    ]
)

FEATURE_COLLECTION_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("features", T.ArrayType(FEATURE_SCHEMA)),
    ]
)

# level-1 filename shape: "11_Aceh.geojson" (reference server.js:366,523)
_LEVEL1_RE = r"^\d{2}_[^_]+\.geojson$"


def read_feature_collections(
    spark: SparkSession, geojson_dir: str, code: str | None = None
) -> DataFrame:
    """S1+S3: one row per file, with source filename and byte size.

    `code` reproduces the reference's filename-prefix filter
    (file.startsWith(code), server.js:347) via pathGlobFilter — the
    filter happens at file listing, before any bytes are read."""
    reader = (
        spark.read.option("multiLine", True)
        .schema(FEATURE_COLLECTION_SCHEMA)
    )
    ensure_session_defaults(spark)
    if code:
        reader = reader.option("pathGlobFilter", f"{code}*.geojson")
    else:
        reader = reader.option("pathGlobFilter", "*.geojson")
    return (
        reader.json(geojson_dir)
        .withColumn(
            "source_file",
            F.element_at(F.split(F.input_file_name(), "/"), -1),
        )
        .withColumn("file_size", F.col("_metadata.file_size"))
    )


def classify_level(source_file_col) -> "F.Column":
    """S2: filename → administrative level (reference
    server.js:363-366 rules, identical precedence)."""
    return (
        F.when(source_file_col.rlike(_LEVEL1_RE), F.lit(1))
        .when(source_file_col.endswith("_kecamatan.geojson"), F.lit(3))
        .when(source_file_col.endswith("_kelurahan.geojson"), F.lit(4))
        .otherwise(F.lit(2))
    )


def explode_features(collections: DataFrame) -> DataFrame:
    """S4: one row per feature, keeping (source_file, feature_index)
    so a distributed write can reproduce the reference's sequential
    last-write-wins ordering."""
    return (
        collections.select(
            "source_file",
            "file_size",
            classify_level(F.col("source_file")).alias("level"),
            F.posexplode("features").alias("feature_index", "feature"),
        )
        .select(
            "source_file",
            "file_size",
            "level",
            "feature_index",
            F.col("feature.properties").alias("props"),
            F.to_json(F.col("feature.geometry")).alias("geometry_json"),
        )
    )


def derive_codes(features: DataFrame) -> DataFrame:
    """P1: transformProperties (reference server.js:160-185) as one
    when/otherwise column pair — concat with '.', last-2 substring
    for kecamatan, literal '2' prefix for kelurahan."""
    p = F.col("props")
    last2_kec = F.expr("right(props.kd_kecamatan, 2)")
    kode = (
        F.when(F.col("level") == 1, p["kd_propinsi"])
        .when(
            F.col("level") == 2,
            F.concat_ws(".", p["kd_propinsi"], p["kd_dati2"]),
        )
        .when(
            F.col("level") == 3,
            F.concat_ws(".", p["kd_propinsi"], p["kd_dati2"], last2_kec),
        )
        .otherwise(
            F.concat_ws(
                ".",
                p["kd_propinsi"],
                p["kd_dati2"],
                last2_kec,
                F.concat(F.lit("2"), p["kd_kelurahan"]),
            )
        )
    )
    nama = (
        F.when(F.col("level") == 1, p["nm_propinsi"])
        .when(F.col("level") == 2, p["nm_dati2"])
        .when(F.col("level") == 3, p["nm_kecamatan"])
        .otherwise(p["nm_kelurahan"])
    )
    return features.select(
        kode.alias("kode_wilayah_kemendagri"),
        nama.alias("nama_wilayah_kemendagri"),
        "level",
        "geometry_json",
        "source_file",
        "feature_index",
        "file_size",
    )


def read_features(
    spark: SparkSession, geojson_dir: str, code: str | None = None
) -> DataFrame:
    """S1-S5 + P1 composed: the raw-feature relation the ETL ingests."""
    return derive_codes(explode_features(read_feature_collections(spark, geojson_dir, code)))
