"""The geojson_features Python DataSource (Spark 4 PDS API) matches
the declarative JSON-reader path feature-for-feature on the real
reference corpus, and its pushFilters prunes whole files."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThan, In, StringStartsWith

from wilayah_aceh_etl_spark.functions.geometry import GEOMETRY_SCHEMA
from wilayah_aceh_etl_spark.sources.geojson import (
    derive_codes,
    explode_features,
    read_feature_collections,
)
from wilayah_aceh_etl_spark.sources.geojson_datasource import (
    GeoJSONFeaturesReader,
    classify_level_py,
    register_geojson_datasource,
)

GEOJSON_DIR = "/root/reference/geojson"


@pytest.fixture(scope="module")
def pds(spark):
    register_geojson_datasource(spark)
    return spark.read.format("geojson_features").load(GEOJSON_DIR)


def _canon_geometry(col):
    # both sides through the same parse→serialize so float formatting
    # and key order can't differ
    return F.to_json(F.from_json(col, GEOMETRY_SCHEMA))


def test_matches_declarative_reader(spark, pds):
    builtin = derive_codes(
        explode_features(read_feature_collections(spark, GEOJSON_DIR))
    ).select(
        "source_file",
        "feature_index",
        "kode_wilayah_kemendagri",
        "level",
        "file_size",
        _canon_geometry(F.col("geometry_json")).alias("geom"),
    )
    custom = derive_codes(pds).select(
        "source_file",
        "feature_index",
        "kode_wilayah_kemendagri",
        "level",
        "file_size",
        _canon_geometry(F.col("geometry_json")).alias("geom"),
    )
    assert builtin.count() == 388
    assert custom.exceptAll(builtin).count() == 0
    assert builtin.exceptAll(custom).count() == 0


def test_level_filter_returns_correct_rows(pds):
    rows = pds.filter(F.col("level") == 3).select("source_file").distinct().collect()
    assert len(rows) > 0
    assert all(r.source_file.endswith("_kecamatan.geojson") for r in rows)


def test_pushdown_prunes_files():
    r = GeoJSONFeaturesReader({"path": GEOJSON_DIR})
    total = len(r.partitions())

    r = GeoJSONFeaturesReader({"path": GEOJSON_DIR})
    leftovers = list(
        r.pushFilters([EqualTo(("level",), 3), GreaterThan(("feature_index",), 1)])
    )
    # the level filter is absorbed; the unsupported one comes back
    assert leftovers == [GreaterThan(("feature_index",), 1)]
    pruned = r.partitions()
    assert 0 < len(pruned) < total
    assert all(p.level == 3 for p in pruned)

    r = GeoJSONFeaturesReader({"path": GEOJSON_DIR})
    assert list(r.pushFilters([In(("level",), (1, 2))])) == []
    assert all(p.level in (1, 2) for p in r.partitions())

    r = GeoJSONFeaturesReader({"path": GEOJSON_DIR})
    assert list(r.pushFilters([StringStartsWith(("source_file",), "11.01")])) == []
    assert 0 < len(r.partitions()) < total


def test_code_option_matches_reference_prefix_rule(spark):
    register_geojson_datasource(spark)
    df = (
        spark.read.format("geojson_features")
        .option("code", "11.01")
        .load(GEOJSON_DIR)
    )
    files = {r.source_file for r in df.select("source_file").distinct().collect()}
    assert files and all(f.startswith("11.01") for f in files)


def test_classify_level_py_matches_rules():
    assert classify_level_py("11_Aceh.geojson") == 1
    assert classify_level_py("11.01_Aceh_Selatan.geojson") == 2
    assert classify_level_py("11.01_kecamatan.geojson") == 3
    assert classify_level_py("11.73_kelurahan.geojson") == 4


def test_writer_roundtrip(spark, tmp_path):
    """Write derived features through the connector sink, read the
    files back with stdlib json AND with the connector: counts, codes
    and geometries survive the round trip."""
    import json as _json
    import os as _os

    register_geojson_datasource(spark)
    src = derive_codes(
        spark.read.format("geojson_features").load(GEOJSON_DIR)
    ).select(
        F.col("kode_wilayah_kemendagri").alias("kode"),
        F.col("nama_wilayah_kemendagri").alias("nama"),
        "level",
        "geometry_json",
    )
    out = str(tmp_path / "out_geojson")
    src.repartition(4).write.format("geojson_features").mode(
        "overwrite"
    ).save(out)

    files = [f for f in _os.listdir(out) if f.endswith(".geojson")]
    assert len(files) == 4
    n, codes = 0, set()
    for f in files:
        with open(_os.path.join(out, f), encoding="utf-8") as fh:
            fc = _json.load(fh)
        assert fc["type"] == "FeatureCollection"
        n += len(fc["features"])
        codes |= {ft["properties"]["id"] for ft in fc["features"]}
    assert n == 388
    assert "11.01" in codes

    # connector read-back: every written file classifies level 2 by
    # filename rules (part-*.geojson), so read raw features and count
    back = spark.read.format("geojson_features").load(out)
    assert back.count() == 388
    geoms = back.select(
        F.to_json(
            F.from_json("geometry_json", GEOMETRY_SCHEMA)
        ).alias("g")
    )
    src_geoms = src.select(
        F.to_json(F.from_json("geometry_json", GEOMETRY_SCHEMA)).alias("g")
    )
    assert geoms.exceptAll(src_geoms).count() == 0


def test_writer_overwrite_replaces_files(spark, tmp_path):
    register_geojson_datasource(spark)
    src = derive_codes(
        spark.read.format("geojson_features").option("code", "11_").load(GEOJSON_DIR)
    ).select(
        F.col("kode_wilayah_kemendagri").alias("kode"),
        F.col("nama_wilayah_kemendagri").alias("nama"),
        "level",
        "geometry_json",
    )
    out = str(tmp_path / "ow_geojson")
    src.repartition(3).write.format("geojson_features").mode("overwrite").save(out)
    src.repartition(1).write.format("geojson_features").mode("overwrite").save(out)
    import os as _os

    files = [f for f in _os.listdir(out) if f.endswith(".geojson")]
    assert len(files) == 1


def test_stream_reader_exactly_once_across_restarts(spark, tmp_path):
    """Streaming side of the connector: each file's features emit
    exactly once; a checkpointed restart picks up only files added
    since the last committed offset."""
    import shutil

    register_geojson_datasource(spark)
    src = str(tmp_path / "feed")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    import os as _os

    _os.makedirs(src)
    shutil.copy(f"{GEOJSON_DIR}/11_Aceh.geojson", src)

    def run():
        q = (
            spark.readStream.format("geojson_features")
            .load(src)
            .select("source_file", "feature_index", "level")
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return [
            (r.source_file, r.feature_index, r.level)
            for r in spark.read.parquet(out).collect()
        ]

    got1 = run()
    assert got1 == [("11_Aceh.geojson", 0, 1)]  # 1 feature, level 1

    shutil.copy(f"{GEOJSON_DIR}/11.01_kecamatan.geojson", src)
    got2 = run()
    assert len([g for g in got2 if g[0] == "11_Aceh.geojson"]) == 1  # no re-emit
    new = [g for g in got2 if g[0] == "11.01_kecamatan.geojson"]
    assert len(new) == 18 and all(lvl == 3 for _, _, lvl in new)


def test_streaming_etl_pipeline_end_to_end(spark, tmp_path):
    """The reference's POST /api/db/sync as a CONTINUOUS pipeline:
    streaming connector → code derivation (P1) → keyed upsert sink.
    A new region file landing in the directory flows into the
    upserted table on the next trigger; re-delivered features stay
    idempotent (last-wins on the merge key)."""
    import shutil

    from pyspark.sql import functions as F

    from wilayah_aceh_etl_spark.streaming.sinks import upsert_stream

    register_geojson_datasource(spark)
    src = str(tmp_path / "feed")
    table = str(tmp_path / "wilayah_table")
    ckpt = str(tmp_path / "ckpt")
    import os as _os

    _os.makedirs(src)
    shutil.copy(f"{GEOJSON_DIR}/11_Aceh.geojson", src)

    def run_once():
        stream = spark.readStream.format("geojson_features").load(src)
        derived = derive_codes(stream).select(
            "kode_wilayah_kemendagri",
            "nama_wilayah_kemendagri",
            "level",
            "geometry_json",
            "source_file",
            "feature_index",
        )
        q = (
            upsert_stream(
                derived,
                table,
                ckpt,
                keys=["kode_wilayah_kemendagri"],
                order_cols=["source_file", "feature_index"],
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(table)

    t1 = run_once()
    assert t1.count() == 1
    assert t1.collect()[0].kode_wilayah_kemendagri == "11"

    shutil.copy(f"{GEOJSON_DIR}/11.01_kecamatan.geojson", src)
    t2 = run_once()
    assert t2.count() == 1 + 18  # province + 18 kecamatan features
    assert (
        t2.filter(F.col("level") == 3)
        .filter(~F.col("kode_wilayah_kemendagri").rlike(r"^11\.01\.\d{2}$"))
        .count()
        == 0
    )

    # third trigger with no new files: table unchanged (idempotent)
    t3 = run_once()
    assert t3.count() == 19


def test_stream_writer_batches_are_atomic_and_idempotent(spark, tmp_path):
    """Streaming sink quadrant: each micro-batch commits as a
    batch-{id} directory of FeatureCollection files."""
    import json as _json
    import os as _os
    import shutil

    register_geojson_datasource(spark)
    src = str(tmp_path / "feed")
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    _os.makedirs(src)
    shutil.copy(f"{GEOJSON_DIR}/11.01_kecamatan.geojson", src)

    stream = spark.readStream.format("geojson_features").load(src)
    derived = derive_codes(stream).select(
        F.col("kode_wilayah_kemendagri").alias("kode"),
        F.col("nama_wilayah_kemendagri").alias("nama"),
        "level",
        "geometry_json",
    )
    q = (
        derived.coalesce(2)
        .writeStream.format("geojson_features")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batches = sorted(d for d in _os.listdir(out) if d.startswith("batch-"))
    assert len(batches) == 1
    n = 0
    for f in _os.listdir(_os.path.join(out, batches[0])):
        assert f.endswith(".geojson")
        with open(_os.path.join(out, batches[0], f), encoding="utf-8") as fh:
            fc = _json.load(fh)
        assert fc["type"] == "FeatureCollection"
        n += len(fc["features"])
    assert n == 18
    # no stray tmp files outside batch dirs
    assert all(
        d.startswith("batch-") for d in _os.listdir(out)
    ), _os.listdir(out)
