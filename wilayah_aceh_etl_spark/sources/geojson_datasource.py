"""GeoJSON feature source as a Spark 4 Python DataSource (PDS).

The declarative reader in `sources/geojson.py` (multiLine JSON +
pathGlobFilter) covers SURVEY S1-S5 with built-in machinery; this
module provides the same relation as a first-class *pluggable
connector* — `spark.read.format("geojson_features").load(dir)` —
using the public `pyspark.sql.datasource` API (added in Spark 4).
What the connector adds over the plain JSON read:

  * **file-pruning filter pushdown** (`pushFilters`): `level = n` /
    `level IN (...)` and `source_file LIKE 'prefix%'` predicates are
    resolved against FILENAMES during planning (the reference's
    filename rules, server.js:363-366), so pruned files are never
    opened — the PDS equivalent of partition pruning;
  * **one input partition per file** with the file's size attached —
    Spark schedules files across executors; at 100 TB-scale corpora
    the partition unit would become (file, feature-range) splits, the
    same evolution parquet took;
  * the feature index (posexplode twin) comes free from enumeration
    order, preserving the last-wins upsert tiebreaker (SURVEY §7.3).

Schema is identical to `geojson.explode_features` output, so
`geojson.derive_codes` composes on top of either source unchanged.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
    StringStartsWith,
    WriterCommitMessage,
)
from pyspark.sql import types as T

# level-1 filename shape (reference server.js:366,523)
_LEVEL1_RE = re.compile(r"^\d{2}_[^_]+\.geojson$")

SCHEMA = T.StructType(
    [
        T.StructField("source_file", T.StringType()),
        T.StructField("file_size", T.LongType()),
        T.StructField("level", T.IntegerType()),
        T.StructField("feature_index", T.IntegerType()),
        T.StructField(
            "props",
            T.StructType(
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
            ),
        ),
        T.StructField("geometry_json", T.StringType()),
    ]
)

_PROP_KEYS = (
    "kd_propinsi",
    "kd_dati2",
    "kd_kecamatan",
    "kd_kelurahan",
    "nm_propinsi",
    "nm_dati2",
    "nm_kecamatan",
    "nm_kelurahan",
)


def classify_level_py(filename: str) -> int:
    """Python twin of geojson.classify_level (same precedence)."""
    if _LEVEL1_RE.match(filename):
        return 1
    if filename.endswith("_kecamatan.geojson"):
        return 3
    if filename.endswith("_kelurahan.geojson"):
        return 4
    return 2


class GeoJSONFilePartition(InputPartition):
    def __init__(self, path: str, size: int, level: int):
        self.path = path
        self.size = size
        self.level = level


class GeoJSONFeaturesReader(DataSourceReader):
    def __init__(self, options):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("geojson_features: .load(<directory>) is required")
        # reference S1 prefix filter (server.js:347) as a reader option
        self.code = options.get("code")
        # populated by pushFilters; lists because the pushed filters
        # are a CONJUNCTION — every absorbed predicate must hold
        # (overwriting state would silently drop earlier conjuncts,
        # which Spark never re-checks once absorbed)
        self.level_sets: list[set[int]] = []
        self.prefixes: list[str] = []

    def pushFilters(self, filters):
        """Accept level-equality/IN and source_file-prefix filters;
        they prune whole FILES in partitions() (filename rules decide
        both columns), which is strictly stronger than row filtering —
        the filters are still returned as leftovers only when partial.
        """
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("level",):
                self.level_sets.append({int(f.value)})
            elif isinstance(f, In) and f.attribute == ("level",):
                self.level_sets.append({int(v) for v in f.value})
            elif isinstance(f, StringStartsWith) and f.attribute == ("source_file",):
                self.prefixes.append(str(f.value))
            else:
                yield f

    def partitions(self):
        levels: set[int] | None = None
        for s in self.level_sets:
            levels = s if levels is None else levels & s
        parts = []
        for name in sorted(os.listdir(self.dir)):
            if not name.endswith(".geojson"):
                continue
            if self.code and not name.startswith(self.code):
                continue
            if any(not name.startswith(p) for p in self.prefixes):
                continue
            level = classify_level_py(name)
            if levels is not None and level not in levels:
                continue
            full = os.path.join(self.dir, name)
            parts.append(GeoJSONFilePartition(full, os.path.getsize(full), level))
        return parts

    def read(self, partition):
        with open(partition.path, encoding="utf-8") as fh:
            collection = json.load(fh)
        source_file = os.path.basename(partition.path)
        for idx, feature in enumerate(collection.get("features") or []):
            props = feature.get("properties") or {}
            geom = feature.get("geometry")
            yield (
                source_file,
                partition.size,
                partition.level,
                idx,
                tuple(props.get(k) for k in _PROP_KEYS),
                None if geom is None else json.dumps(geom, separators=(",", ":")),
            )


class GeoJSONCommit(WriterCommitMessage):
    def __init__(self, path: str, n_features: int):
        self.path = path
        self.n_features = n_features


class GeoJSONFeaturesWriter(DataSourceWriter):
    """Sink side (SURVEY S10 as a connector): each task serializes
    its partition into ONE FeatureCollection file — the engine twin
    of toFeatureCollection (reference server.js:486-506), but
    partition-parallel: no driver-side collect, no single giant
    document. Expects rows (kode, nama, level, geometry_json)."""

    def __init__(self, options, overwrite: bool):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("geojson_features write: .save(<directory>) required")
        self.overwrite = overwrite

    def write(self, iterator):
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        features = []
        for row in iterator:
            geom = row["geometry_json"]
            features.append(
                {
                    "type": "Feature",
                    "properties": {"id": row["kode"], "name": row["nama"],
                                   "level": row["level"]},
                    "geometry": None if geom is None else json.loads(geom),
                }
            )
        os.makedirs(self.dir, exist_ok=True)
        # unique temp name: append never clobbers an earlier write,
        # and retried/speculative attempts can't race on one path;
        # readers never see it (pattern filters on .geojson)
        out = os.path.join(
            self.dir, f"part-{pid:05d}-{uuid.uuid4().hex}.geojson.tmp"
        )
        with open(out, "w", encoding="utf-8") as fh:
            json.dump(
                {"type": "FeatureCollection", "features": features},
                fh,
                separators=(",", ":"),
            )
        return GeoJSONCommit(out, len(features))

    def commit(self, messages):
        """Job-success finalization on the driver: promote each task's
        temp file, and for overwrite delete the PRIOR files only now —
        a failed job therefore never destroys existing data."""
        final = set()
        for m in messages:
            if m is None:
                continue
            dest = m.path[: -len(".tmp")]
            os.replace(m.path, dest)
            final.add(os.path.basename(dest))
        if self.overwrite:
            for name in os.listdir(self.dir):
                if name.endswith(".geojson") and name not in final:
                    os.remove(os.path.join(self.dir, name))

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class GeoJSONFeaturesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "geojson_features"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return GeoJSONFeaturesReader(self.options)

    def simpleStreamReader(self, schema):
        return GeoJSONStreamReader(self.options)

    def streamWriter(self, schema, overwrite: bool):
        return GeoJSONStreamWriter(self.options)

    def writer(self, schema, overwrite: bool):
        # overwrite cleanup is deferred to commit() so a failed job
        # leaves the previous data intact
        return GeoJSONFeaturesWriter(self.options, overwrite)


def register_geojson_datasource(spark) -> None:
    """Idempotent format registration; after this,
    spark.read.format('geojson_features').load(dir) works."""
    spark.dataSource.register(GeoJSONFeaturesDataSource)


from wilayah_aceh_etl_spark.serde import pickle_module_by_value  # noqa: E402

pickle_module_by_value(__name__)  # reader closures must not need repo on worker path


class GeoJSONStreamReader(SimpleDataSourceStreamReader):
    """Streaming side of the connector: treats the directory as an
    append-only feed (the reference's operational reality — new
    region files land over time) and emits each file's features
    exactly once. Offsets are the sorted list of files already
    processed, so a checkpointed restart resumes precisely;
    readBetweenOffsets replays a committed range deterministically.

    SimpleDataSourceStreamReader reads on the driver — right for
    this corpus-sized feed; a partition-parallel DataSourceStreamReader
    drops in behind the same offset contract when file volume demands
    executor-side reads."""

    def __init__(self, options):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("geojson_features stream: .load(<directory>) required")
        self.code = options.get("code")

    def _files(self):
        return sorted(
            f
            for f in os.listdir(self.dir)
            if f.endswith(".geojson")
            and (not self.code or f.startswith(self.code))
        )

    def initialOffset(self) -> dict:
        return {"seen": []}

    def _rows_for(self, names):
        for name in names:
            full = os.path.join(self.dir, name)
            size = os.path.getsize(full)
            level = classify_level_py(name)
            with open(full, encoding="utf-8") as fh:
                collection = json.load(fh)
            for idx, feature in enumerate(collection.get("features") or []):
                props = feature.get("properties") or {}
                geom = feature.get("geometry")
                yield (
                    name,
                    size,
                    level,
                    idx,
                    tuple(props.get(k) for k in _PROP_KEYS),
                    None
                    if geom is None
                    else json.dumps(geom, separators=(",", ":")),
                )

    def read(self, start: dict):
        seen = set(start.get("seen", []))
        new = [f for f in self._files() if f not in seen]
        end = {"seen": sorted(seen | set(new))}
        # a LIST ITERATOR, not a bare generator or list: the simple-
        # stream prefetch cache both advances it (next) and pickles it
        # for replay — list iterators support both, generators neither
        return iter(list(self._rows_for(new))), end

    def readBetweenOffsets(self, start: dict, end: dict):
        seen = set(start.get("seen", []))
        return iter(
            list(self._rows_for([f for f in end.get("seen", []) if f not in seen]))
        )

    def commit(self, end: dict) -> None:
        pass  # offsets fully describe progress; nothing external to ack


class GeoJSONStreamWriter(DataSourceStreamWriter):
    """Streaming sink quadrant of the connector: every micro-batch
    lands as FeatureCollection files, promoted atomically at batch
    commit. Exactly-once comes from idempotent batch directories —
    a replayed batchId rewrites batch-{id}/ wholesale instead of
    appending duplicates. (For keyed UPSERT semantics use
    streaming/sinks.upsert_stream; this sink is the append-feed
    form — each batch is a new delivery of files.)"""

    def __init__(self, options):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("geojson_features stream write: path required")

    def write(self, iterator):
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        features = []
        for row in iterator:
            geom = row["geometry_json"]
            features.append(
                {
                    "type": "Feature",
                    "properties": {"id": row["kode"], "name": row["nama"],
                                   "level": row["level"]},
                    "geometry": None if geom is None else json.loads(geom),
                }
            )
        os.makedirs(self.dir, exist_ok=True)
        out = os.path.join(
            self.dir, f"task-{pid:05d}-{uuid.uuid4().hex}.geojson.tmp"
        )
        with open(out, "w", encoding="utf-8") as fh:
            json.dump(
                {"type": "FeatureCollection", "features": features},
                fh,
                separators=(",", ":"),
            )
        return GeoJSONCommit(out, len(features))

    def commit(self, messages, batchId: int) -> None:
        batch_dir = os.path.join(self.dir, f"batch-{batchId:05d}")
        # idempotent replay: the batch directory is rebuilt wholesale
        if os.path.isdir(batch_dir):
            for name in os.listdir(batch_dir):
                os.remove(os.path.join(batch_dir, name))
        os.makedirs(batch_dir, exist_ok=True)
        for i, m in enumerate(m for m in messages if m is not None):
            os.replace(
                m.path, os.path.join(batch_dir, f"part-{i:05d}.geojson")
            )

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)
