"""The wilayah engine: full reference-service parity, Spark-first.

Every entry point of the reference (SURVEY §3) as a DataFrame
operation over one managed Parquet table:

  ingest          — POST /api/db/sync (server.js:339-383): read →
                    derive codes → normalize geometry (one pandas-UDF
                    stage) → last-wins MERGE. One distributed job vs
                    the reference's 388 sequential round-trips.
  search          — GET /api/search (server.js:290-336)
  status          — GET /api/db/status (server.js:188-287)
  geojson_envelope— GET /api/db/geojson (server.js:386-483) with the
                    code-length dispatch (SURVEY §2.7)
  file_envelope   — GET /api/geojson DB-less fallback (server.js:509-565)
  seed_if_empty   — startup seed (server.js:103-157)

Storage: Parquet partitioned by `level` (partition pruning replaces
the B-tree on level), rows sorted by kode within partitions (row-group
min/max pruning replaces the kode index — SURVEY §4 X1). Upsert is
the pure-Parquet last-wins window rewrite (no Delta available): the
same shuffle a MERGE would do, with an explicit (source_file,
feature_index) tiebreaker reproducing the reference's sequential
last-write-wins (SURVEY §7 hard-problem 3).
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wilayah_aceh_etl_spark.functions.geometry import (
    DEFAULT_TOLERANCE,
    geometry_struct,
    make_normalize_udf,
)
from wilayah_aceh_etl_spark.sources.geojson import read_features

TABLE_COLUMNS = [
    "kode_wilayah_kemendagri",
    "nama_wilayah_kemendagri",
    "level",
    "geometry",
    "created_at",
    "updated_at",
]

_KODE = "kode_wilayah_kemendagri"
_NAMA = "nama_wilayah_kemendagri"


def _now(clock: datetime.datetime | None) -> F.Column:
    return (
        F.lit(clock.isoformat()).cast("timestamp")
        if clock is not None
        else F.current_timestamp()
    )


# ---------------------------------------------------------------------------
# Ingest (ETL)
# ---------------------------------------------------------------------------


def ingest_features(
    spark: SparkSession,
    geojson_dir: str,
    code: str | None = None,
    tolerance: float = DEFAULT_TOLERANCE,
    clock: datetime.datetime | None = None,
) -> DataFrame:
    """The ETL transform: raw features → normalized table rows.

    Geometry normalization (G1-G5) is the single Python stage,
    Arrow-batched and map-side; everything else is Catalyst. The
    in-batch last-wins dedup keyed on (source_file, feature_index)
    reproduces the reference's sequential loop ordering."""
    from pyspark.sql.window import Window

    normalize = make_normalize_udf(tolerance)
    raw = read_features(spark, geojson_dir, code)
    w = Window.partitionBy(_KODE).orderBy(
        F.col("source_file").desc(), F.col("feature_index").desc()
    )
    return (
        raw.withColumn("geometry", normalize(F.col("geometry_json")))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            _KODE,
            _NAMA,
            "level",
            "geometry",
            _now(clock).alias("created_at"),
            _now(clock).alias("updated_at"),
        )
    )


def upsert(
    spark: SparkSession,
    table_path: str,
    batch: DataFrame,
    clock: datetime.datetime | None = None,
) -> int:
    """S9: INSERT .. ON CONFLICT DO UPDATE as the pure-Parquet
    last-wins rewrite. Batch rows win over existing rows; existing
    created_at is preserved for matched keys (the reference updates
    nama/geometry/updated_at only, server.js:93-97).

    Returns the number of batch rows applied (A5 processed counter).
    The counter rides the first batch action via the Observation API —
    the batch lineage (GeoJSON scan + geometry kernel, the expensive
    part of ingest) executes exactly once (it is persisted before the
    level probe). This is the Spark twin of the reference's
    totalProcessed++ (server.js:357,374) and of Delta's
    operationMetrics.numOutputRows.

    Scale design — FILE-SCOPED MERGE (Delta's add-file pruning on
    plain Parquet), not a table rewrite:

      1. probe the batch's distinct levels (≤4 values, a domain
         bound) — a batch can only conflict inside its own level
         partitions because `kode` determines `level` by construction
         (code-length dispatch, SURVEY §2.7);
      2. read each candidate file's `kode` min/max from its Parquet
         FOOTER (metadata-scale: one row per file, no data read) and
         join that stats relation against the batch's distinct keys —
         only files whose key range intersects a batch key are
         "affected" (a file with absent/truncated stats is treated as
         affected, conservatively);
      3. union the batch with ONLY the affected files (basePath read
         keeps the partition column), re-window last-wins, and write
         replacement files range-partitioned on (level, kode) so
         future merges prune tightly;
      4. swap at FILE granularity: delete the affected files, move
         the staged files in. Every other file in the table — even
         inside the batch's own level partition — keeps its bytes and
         inode (asserted by tests).

    At 100 TB a single-kelurahan sync rewrites one file, not a
    partition and not the world. The per-batch driver cost is one
    footer read per candidate file plus one metadata-scale join —
    exactly the add-file pruning a Delta MERGE does from its
    transaction log, sourced from footers instead.
    """
    from pyspark.sql import Observation
    from pyspark.sql.window import Window

    obs = Observation()
    batch = batch.observe(obs, F.count(F.lit(1)).alias("n_batch"))
    batch = batch.withColumn("_prio", F.lit(1)).persist()
    try:
        affected: list[str] | None = None
        if _table_exists(table_path):
            levels = [
                r["level"]
                for r in batch.select("level").distinct().collect()
            ]
            if not levels:  # empty batch: nothing to rewrite
                return int(obs.get["n_batch"])
            affected = _affected_files(spark, table_path, levels, batch)
        if affected:
            existing = (
                spark.read.option("basePath", table_path)
                .parquet(*affected)
                .withColumn("_prio", F.lit(0))
            )
            merged = batch.unionByName(existing)
        else:
            merged = batch
        w = Window.partitionBy(_KODE).orderBy(F.col("_prio").desc())
        winners = (
            merged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        # preserve created_at of pre-existing keys: a matched key
        # always lives in an affected file (its own footer range
        # contains it), so the slice is sufficient
        if affected:
            old_created = (
                spark.read.option("basePath", table_path)
                .parquet(*affected)
                .groupBy(_KODE)
                .agg(F.min("created_at").alias("_old_created"))
            )
            winners = (
                winners.join(old_created, _KODE, "left")
                .withColumn(
                    "created_at",
                    F.coalesce("_old_created", F.col("created_at")),
                )
                .drop("_old_created")
            )
        out = winners.select(*TABLE_COLUMNS)
        # write-stage layout: partition pruning on level; disjoint
        # kode ranges per file + kode-sorted row groups, so both
        # min/max pruning on prefix predicates AND the next merge's
        # file scoping stay tight
        tmp = table_path + "._staged"
        (
            out.repartitionByRange(
                UPSERT_RANGE_PARTITIONS, F.col("level"), F.col(_KODE)
            )
            .sortWithinPartitions("level", _KODE)
            .write.mode("overwrite")
            .partitionBy("level")
            .parquet(tmp)
        )
        _swap_files(table_path, tmp, affected, action="merge")
        return int(obs.get["n_batch"])
    finally:
        batch.unpersist()


# Staged-write fan-out. At test scale this simply yields a handful of
# kode-ranged files per level; at 100 TB size it as
# ceil(merged_bytes / target_file_bytes) (e.g. 512 MB targets).
UPSERT_RANGE_PARTITIONS = 8


def _table_exists(path: str) -> bool:
    return os.path.exists(path)


def _file_kode_stats(
    table_path: str, levels: list
) -> list[tuple[str, int, str | None, str | None]]:
    """(path, level, kode_min, kode_max) per data file in the given
    level partitions, from Parquet footers only. None stats mean
    'unknown' → the caller treats the file as affected."""
    import pyarrow.parquet as pq

    out = []
    for lv in levels:
        d = os.path.join(table_path, f"level={lv}")
        if not os.path.isdir(d):
            continue
        for f in os.listdir(d):
            if not f.endswith(".parquet"):
                continue
            path = os.path.join(d, f)
            kmin = kmax = None
            try:
                md = pq.ParquetFile(path).metadata
                idx = md.schema.names.index(_KODE)
                mins, maxs = [], []
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    if st is None or not st.has_min_max:
                        mins = []
                        break
                    mins.append(st.min)
                    maxs.append(st.max)
                if mins:
                    kmin, kmax = min(mins), max(maxs)
            except Exception:
                pass  # unreadable footer → conservative (affected)
            out.append((path, int(lv), kmin, kmax))
    return out


def _log_kode_stats(
    table_path: str, levels: list
) -> list[tuple[str, int, str | None, str | None]] | None:
    """The same (path, level, kmin, kmax) relation sourced from the
    latest commit record's stats — zero footer reads. None when the
    table predates the log or the log is missing stats."""
    v = table_version(table_path)
    if v is None:
        return None
    rec = _read_commit(table_path, v)
    stats = rec.get("stats")
    if stats is None:
        return None
    lv_set = {int(x) for x in levels}
    out = []
    for rel in rec["manifest"]:
        lv = int(rel.split("/", 1)[0].split("=", 1)[1])
        if lv not in lv_set:
            continue
        s = stats.get(rel)
        kmin, kmax = (s[0], s[1]) if s else (None, None)
        out.append((os.path.join(table_path, rel), lv, kmin, kmax))
    return out


def _affected_files(
    spark: SparkSession, table_path: str, levels: list, batch: DataFrame
) -> list[str]:
    """Delta-style file pruning: the file-stats relation (one row per
    candidate file) range-joined against the batch's distinct keys.
    Stats come from the COMMIT LOG when available (captured once at
    write time — no footer I/O on the merge path) and fall back to
    footer reads for pre-log tables. Both sides are metadata-scale;
    the collect returns only the files that must be rewritten."""
    stats = _log_kode_stats(table_path, levels)
    if stats is None:
        stats = _file_kode_stats(table_path, levels)
    if not stats:
        return []
    no_stats = [p for p, _, kmin, _ in stats if kmin is None]
    with_stats = [s for s in stats if s[2] is not None]
    if not with_stats:
        return no_stats
    stats_df = spark.createDataFrame(
        with_stats, "path string, level int, kmin string, kmax string"
    )
    keys = batch.select(F.col(_KODE).alias("_k"), F.col("level").alias("_lv"))
    hit = (
        F.broadcast(stats_df)
        .join(
            keys,
            (stats_df.level == keys._lv)
            & (keys._k >= stats_df.kmin)
            & (keys._k <= stats_df.kmax),
            "left_semi",
        )
        .select("path")
        .collect()
    )
    return no_stats + [r["path"] for r in hit]


# ---------------------------------------------------------------------------
# Commit log (Delta-lite): versioned manifests + time travel
# ---------------------------------------------------------------------------
#
# Every mutation commits `_log/v{N}.json` holding the FULL relative-
# path manifest after the commit (at 100 TB you would log deltas and
# checkpoint periodically — the small-table simplification is the
# manifest-per-commit). Files a commit removes are MOVED to
# `_history/v{N}/...` instead of deleted: the underscore prefix hides
# them from plain `spark.read.parquet(table)` (which therefore always
# sees exactly the LATEST version), while `read_table_version`
# resolves any manifest against live + history files for snapshot
# reads. `vacuum_history` enforces retention. Single-writer, like the
# rest of the table; a real multi-writer log needs the atomic
# rename-if-absent Delta builds on.

_LOG_DIR = "_log"
_HISTORY_DIR = "_history"


def _log_dir(table_path: str) -> str:
    return os.path.join(table_path, _LOG_DIR)


def table_version(table_path: str) -> int | None:
    """Latest committed version, or None for a pre-log/absent table."""
    d = _log_dir(table_path)
    if not os.path.isdir(d):
        return None
    versions = [
        int(f[1:-5])
        for f in os.listdir(d)
        if f.startswith("v") and f.endswith(".json")
    ]
    return max(versions) if versions else None


def _read_commit(table_path: str, version: int) -> dict:
    import json

    with open(os.path.join(_log_dir(table_path), f"v{version:06d}.json")) as f:
        return json.load(f)


def _footer_stats_for(table_path: str, rel_paths: list[str]) -> dict:
    """{relpath: [kode_min, kode_max] | None} read once at commit
    time so the LOG carries the pruning stats (Delta's add-file
    stats) and later merges never re-open footers."""
    import pyarrow.parquet as pq

    out = {}
    for rel in rel_paths:
        full = os.path.join(table_path, rel)
        stat = None
        try:
            md = pq.ParquetFile(full).metadata
            idx = md.schema.names.index(_KODE)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    mins = []
                    break
                mins.append(st.min)
                maxs.append(st.max)
            if mins:
                stat = [min(mins), max(maxs)]
        except Exception:
            pass
        out[rel] = stat
    return out


def _commit(
    table_path: str,
    action: str,
    added: list[str],
    removed: list[str],
    version: int | None = None,
) -> int:
    import json

    prev = table_version(table_path)
    if version is None:
        version = 0 if prev is None else prev + 1
    prev_rec = _read_commit(table_path, prev) if prev is not None else {}
    prev_manifest = prev_rec.get("manifest", [])
    gone = set(removed)
    manifest = [p for p in prev_manifest if p not in gone] + sorted(added)
    prev_stats = prev_rec.get("stats", {})
    stats = {p: s for p, s in prev_stats.items() if p not in gone}
    stats.update(_footer_stats_for(table_path, sorted(added)))
    os.makedirs(_log_dir(table_path), exist_ok=True)
    record = {
        "version": version,
        "action": action,
        "manifest": manifest,
        "added": sorted(added),
        "removed": sorted(removed),
        "stats": stats,
    }
    final = os.path.join(_log_dir(table_path), f"v{version:06d}.json")
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        json.dump(record, f)
    os.rename(tmp, final)  # atomic publish of the commit record
    return version


def _live_files(path: str) -> list[str]:
    out = []
    for entry in sorted(os.listdir(path)):
        d = os.path.join(path, entry)
        if entry.startswith("level=") and os.path.isdir(d):
            out += [
                f"{entry}/{f}"
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            ]
    return out


class ConcurrentWriteError(RuntimeError):
    """A second writer attempted to mutate the table while a commit
    was in flight."""


class _commit_lock:
    """Single-writer ENFORCEMENT (not just an assumption): an
    O_CREAT|O_EXCL lock file taken for the swap-and-commit critical
    section. Works on any POSIX filesystem; on object stores the
    equivalent primitive is the atomic put-if-absent Delta builds its
    multi-writer protocol on. A crashed writer leaves the lock behind
    — `vacuum_staging` clears it along with the orphaned staging
    trees."""

    def __init__(self, table_path: str):
        self._path = table_path + "._commit_lock"
        self._fd = None

    def __enter__(self):
        try:
            self._fd = os.open(
                self._path, os.O_CREAT | os.O_EXCL | os.O_WRONLY
            )
        except FileExistsError:
            raise ConcurrentWriteError(
                f"another writer holds {self._path}; if it crashed, "
                "run vacuum_staging() to clear the stale lock"
            ) from None
        return self

    def __exit__(self, *exc):
        if self._fd is not None:
            os.close(self._fd)
            os.remove(self._path)
        return False


def _swap_files(
    path: str, tmp: str, affected: list[str] | None, action: str = "write"
) -> int:
    """Move staged data files into their level directories, retiring
    exactly the affected files they replace into `_history/v{N}/`
    (hidden from plain reads, kept for time travel), and commit the
    new manifest — all under the commit lock. `affected is None`
    means initial load → the staged tree becomes version 0 wholesale.
    Spark part filenames embed the write-job UUID, so staged names
    never collide with kept files. Returns the committed version."""
    with _commit_lock(path):
        return _swap_files_locked(path, tmp, affected, action)


def _swap_files_locked(
    path: str, tmp: str, affected: list[str] | None, action: str
) -> int:
    import shutil

    if affected is None or not os.path.exists(path):
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)
        return _commit(path, action, _live_files(path), [])
    prev = table_version(path)
    version = 0 if prev is None else prev + 1
    hist = os.path.join(path, _HISTORY_DIR, f"v{version:06d}")
    removed_rel = []
    for old in affected:
        if os.path.exists(old):
            rel = os.path.relpath(old, path)
            dst = os.path.join(hist, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.rename(old, dst)
            removed_rel.append(rel)
    added_rel = []
    for entry in os.listdir(tmp):
        src = os.path.join(tmp, entry)
        if not (entry.startswith("level=") and os.path.isdir(src)):
            continue
        dst_dir = os.path.join(path, entry)
        os.makedirs(dst_dir, exist_ok=True)
        for f in os.listdir(src):
            if f.endswith(".parquet"):
                os.rename(os.path.join(src, f), os.path.join(dst_dir, f))
                added_rel.append(f"{entry}/{f}")
    shutil.rmtree(tmp)
    if prev is None:
        # Pre-log upgrade: the table existed before the commit log,
        # so v0's manifest must cover the FULL live tree, not just
        # this commit's delta — otherwise untouched pre-existing
        # files never appear in _log_kode_stats, are never pruning
        # candidates for later merges, and their stale rows silently
        # survive last-wins MERGE / delete_keys (and read_table_version
        # loses them). _live_files runs after the moves, so it sees
        # the added files plus every untouched legacy file; _commit
        # captures footer stats for all of them.
        return _commit(path, action, _live_files(path), [], version)
    return _commit(path, action, added_rel, removed_rel, version)


def read_table_version(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """Snapshot (time-travel) read: reconstruct the file set of
    `version` from its manifest, resolving each entry against the
    live tree first and `_history/v*/` second (where later commits
    retired it). The `level` partition column is rebuilt from the
    manifest paths, so live and historical files read identically.
    Raises if a needed file was vacuumed."""
    import glob as _glob

    from functools import reduce

    v = table_version(table_path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no commit log at {table_path}")
    manifest = _read_commit(table_path, v)["manifest"]
    by_level: dict[int, list[str]] = {}
    for rel in manifest:
        level_dir, name = rel.split("/", 1)
        lv = int(level_dir.split("=", 1)[1])
        live = os.path.join(table_path, rel)
        if os.path.exists(live):
            by_level.setdefault(lv, []).append(live)
            continue
        hits = _glob.glob(
            os.path.join(table_path, _HISTORY_DIR, "v*", level_dir, name)
        )
        if not hits:
            raise FileNotFoundError(
                f"{rel} of version {v} has been vacuumed"
            )
        by_level.setdefault(lv, []).append(hits[0])
    parts = [
        spark.read.parquet(*files).withColumn("level", F.lit(lv))
        for lv, files in sorted(by_level.items())
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


def table_history(table_path: str) -> list[dict]:
    """The commit log, oldest first: version, action, file deltas."""
    v = table_version(table_path)
    if v is None:
        return []
    out = []
    for i in range(v + 1):
        c = _read_commit(table_path, i)
        out.append(
            {
                "version": c["version"],
                "action": c["action"],
                "n_files": len(c["manifest"]),
                "n_added": len(c["added"]),
                "n_removed": len(c["removed"]),
            }
        )
    return out


def restore_table(table_path: str, version: int) -> int:
    """RESTORE (Delta-style rollback): make `version`'s file set the
    new LATEST, as a new commit — history is never rewritten, so
    every intermediate version stays readable and a restore is
    itself restorable. Mechanics: files of the target manifest that
    were retired are COPIED back from `_history/` to their original
    live paths (copy, not move — the history copy keeps serving older
    snapshot reads); live files not in the target manifest are
    retired. Also the crash-recovery tool: after a writer died
    mid-swap, restoring the last committed version reassembles
    exactly its file set. Returns the new version number."""
    import glob as _glob
    import shutil

    with _commit_lock(table_path):
        target = _read_commit(table_path, version)["manifest"]
        prev = table_version(table_path)
        new_version = prev + 1
        hist = os.path.join(table_path, _HISTORY_DIR, f"v{new_version:06d}")
        target_set = set(target)
        added = []
        for rel in target:
            live = os.path.join(table_path, rel)
            if os.path.exists(live):
                continue
            level_dir, name = rel.split("/", 1)
            hits = _glob.glob(
                os.path.join(table_path, _HISTORY_DIR, "v*", level_dir, name)
            )
            if not hits:
                raise FileNotFoundError(
                    f"{rel} of version {version} has been vacuumed — "
                    "cannot restore"
                )
            os.makedirs(os.path.dirname(live), exist_ok=True)
            shutil.copy2(hits[0], live)
            added.append(rel)
        removed = []
        for rel in _live_files(table_path):
            if rel in target_set:
                continue
            src = os.path.join(table_path, rel)
            dst = os.path.join(hist, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.rename(src, dst)
            removed.append(rel)
        return _commit(
            table_path, f"restore(v{version})", added, removed, new_version
        )


def vacuum_history(table_path: str, keep_versions: int = 2) -> list[str]:
    """Retention: drop `_history/v{N}` trees retired more than
    `keep_versions` commits ago. Versions whose files are vacuumed
    remain listed in the log but raise on read — same contract as
    Delta's VACUUM vs its retained log."""
    import shutil

    current = table_version(table_path)
    hist_root = os.path.join(table_path, _HISTORY_DIR)
    removed = []
    if current is None or not os.path.isdir(hist_root):
        return removed
    cutoff = current - keep_versions
    for entry in sorted(os.listdir(hist_root)):
        if entry.startswith("v") and int(entry[1:]) <= cutoff:
            full = os.path.join(hist_root, entry)
            shutil.rmtree(full, ignore_errors=True)
            removed.append(full)
    return removed


def compact_table(
    spark: SparkSession,
    table_path: str,
    small_bytes: int = 8 * 1024 * 1024,
    target_bytes: int = 128 * 1024 * 1024,
) -> dict[int, tuple[int, int]]:
    """OPTIMIZE: bin-pack the small files that file-scoped upserts
    accumulate. Per level partition, every data file under
    `small_bytes` is read back and rewritten as
    ceil(total_small_bytes / target_bytes) kode-sorted files; files
    already at size are NOT touched (same bytes, same inodes). Row
    content is invariant — compaction moves bytes, never changes
    them. Returns {level: (n_files_before, n_files_after)} for the
    compacted levels.

    Scale notes: the decision input is pure file metadata (one stat
    per file); each level compacts independently, so a 100 TB table's
    maintenance job parallelizes per partition and a partition with
    one big file costs nothing. The small-file rewrite pays the same
    one coalesce shuffle OPTIMIZE pays anywhere. Defaults: compact
    below 8 MB, aim for 128 MB outputs (one input split).

    Relationship to `sources/maintenance.compact_table`: that is the
    generic whole-table re-layout (rewrites everything at a target
    size, any parquet table). This is the MANAGED-table OPTIMIZE:
    scoped to small files only, inode-preserving for at-size files,
    aware of the level partitioning and kode sort the merge/delete
    paths maintain."""
    report: dict[int, tuple[int, int]] = {}
    if not _table_exists(table_path):
        return report
    for entry in sorted(os.listdir(table_path)):
        d = os.path.join(table_path, entry)
        if not (entry.startswith("level=") and os.path.isdir(d)):
            continue
        files = [
            os.path.join(d, f)
            for f in os.listdir(d)
            if f.endswith(".parquet")
        ]
        small = [f for f in files if os.path.getsize(f) < small_bytes]
        if len(small) < 2:
            continue  # nothing to gain from rewriting 0-1 files
        level = int(entry.split("=", 1)[1])
        total = sum(os.path.getsize(f) for f in small)
        n_out = max(1, -(-total // target_bytes))
        tmp = table_path + f"._compact_{level}"
        (
            spark.read.option("basePath", table_path)
            .parquet(*small)
            .coalesce(n_out)
            .sortWithinPartitions(_KODE)
            .write.mode("overwrite")
            .partitionBy("level")
            .parquet(tmp)
        )
        _swap_files(table_path, tmp, small, action=f"compact(level={level})")
        n_after = len(
            [f for f in os.listdir(d) if f.endswith(".parquet")]
        )
        report[level] = (len(files), n_after)
    return report


def delete_keys(
    spark: SparkSession, table_path: str, keys: DataFrame
) -> int:
    """DELETE WHERE key IN (...) at file scope — the erasure
    counterpart of the file-scoped MERGE (and the right-to-be-
    forgotten primitive at 100 TB): footer-stats pruning finds the
    files that can contain the keys, ONLY those are rewritten with an
    anti-join, every other file keeps its bytes and inode. Returns
    the number of rows actually deleted (Observation-free: the count
    is the difference of two metadata-cheap aggregates over the
    affected slice only).

    `keys` must carry the table's key column (kode_wilayah_kemendagri)
    and `level` (derivable from the kode by the length dispatch —
    callers can use `F.length` mapping if they only hold kodes).

    Isolation caveat (applies to every file-scoped rewrite here,
    merge included): a plain-read DataFrame resolved against the OLD
    file set fails with FILE_NOT_EXIST if executed after a rewrite
    retired those files. Either re-resolve (re-read the path) after
    any merge/delete/compact, or read through the commit log —
    `read_table_version` pins a snapshot whose files survive until
    `vacuum_history` drops them."""
    if not _table_exists(table_path):
        return 0
    keys = keys.select(_KODE, "level").distinct().persist()
    try:
        levels = [r["level"] for r in keys.select("level").distinct().collect()]
        if not levels:
            return 0
        affected = _affected_files(spark, table_path, levels, keys)
        if not affected:
            return 0
        existing = (
            spark.read.option("basePath", table_path)
            .parquet(*affected)
            .persist()
        )
        survivors = existing.join(keys, [_KODE, "level"], "left_anti")
        n_before = existing.count()
        n_survivors = survivors.count()  # slice-sized; reuses the cache
        tmp = table_path + "._staged"
        (
            survivors.select(*TABLE_COLUMNS)
            .repartitionByRange(
                UPSERT_RANGE_PARTITIONS, F.col("level"), F.col(_KODE)
            )
            .sortWithinPartitions("level", _KODE)
            .write.mode("overwrite")
            .partitionBy("level")
            .parquet(tmp)
        )
        existing.unpersist()
        _swap_files(table_path, tmp, affected, action="delete")
        return int(n_before - n_survivors)
    finally:
        keys.unpersist()


def vacuum_staging(table_path: str) -> list[str]:
    """VACUUM: remove orphaned staging trees (`._staged`,
    `._compact_*`) and a stale `._commit_lock` left behind if a merge
    or compaction died mid-flight. Safe when no writer is running —
    the table directory proper is never written in place, so staging
    artifacts are garbage the moment no upsert/compact call is live.
    Returns the paths removed. (Retired data files live under
    `_history/` and are governed by vacuum_history instead.)"""
    import shutil

    parent = os.path.dirname(table_path) or "."
    base = os.path.basename(table_path)
    removed = []
    if not os.path.isdir(parent):
        return removed
    for entry in os.listdir(parent):
        full = os.path.join(parent, entry)
        if entry.startswith(f"{base}._staged") or entry.startswith(
            f"{base}._compact_"
        ):
            # covers the fixed `._staged` dir, the per-invocation
            # `._staged_<token>` merge stagings, and `._staged_compact`
            shutil.rmtree(full, ignore_errors=True)
            removed.append(full)
        elif entry == f"{base}._commit_lock":
            os.remove(full)
            removed.append(full)
    return removed


def sync(
    spark: SparkSession,
    geojson_dir: str,
    table_path: str,
    code: str,
    clock: datetime.datetime | None = None,
) -> int:
    """POST /api/db/sync: ingest all files with filename prefix
    `code` and merge. Returns processed-feature count (A5)."""
    return upsert(
        spark, table_path, ingest_features(spark, geojson_dir, code, clock=clock)
    )


def seed_if_empty(
    spark: SparkSession,
    geojson_dir: str,
    table_path: str,
    clock: datetime.datetime | None = None,
) -> bool:
    """S11: ingest the province file iff no level-1 row exists
    (reference server.js:103-157). Returns True if seeding ran."""
    if _table_exists(table_path):
        table = spark.read.parquet(table_path)
        if table.filter(F.col("level") == 1).limit(1).count() > 0:
            return False
    batch = ingest_features(spark, geojson_dir, clock=clock).filter(
        F.col("level") == 1
    )
    upsert(spark, table_path, batch, clock=clock)
    return True


# ---------------------------------------------------------------------------
# Queries over the table
# ---------------------------------------------------------------------------


def load_wilayah(spark: SparkSession, table_path: str) -> DataFrame:
    """Default read path. When the table has a commit log, the file
    set is resolved from the LATEST committed manifest
    (read_table_version) instead of a directory listing — so a
    reader that races a writer's post-lock swap still sees exactly
    the last committed snapshot (retired-but-not-yet-replaced files
    resolve through _history/, not-yet-committed staged files are
    invisible), closing the crash window STORAGE.md documents.
    Pre-log tables fall back to the plain directory read.

    At 100 TB this is exactly Delta/Iceberg's reader contract:
    manifest-resolved reads are the default, directory listing is
    never trusted for a mutating table."""
    if table_version(table_path) is not None:
        return read_table_version(spark, table_path)
    return spark.read.parquet(table_path)


def search(table: DataFrame, q: str, limit: int = 10) -> DataFrame:
    """GET /api/search: case-insensitive substring, (level, name)
    order, top-10; query shorter than 3 chars → empty (F6 guard)."""
    spark = table.sparkSession
    if q is None or len(q) < 3:
        return spark.createDataFrame(
            [], "id string, name string, level int"
        )
    return (
        table.filter(F.lower(F.col(_NAMA)).contains(q.lower()))
        .select(
            F.col(_KODE).alias("id"),
            F.col(_NAMA).alias("name"),
            "level",
        )
        .orderBy("level", "name", "id")
        .limit(limit)
    )


def status_counts(table: DataFrame, code: str | None = None) -> DataFrame:
    """GET /api/db/status: one-row envelope of per-level counts under
    an optional prefix (A1 group-count + A3 pivot in one pass)."""
    if code:
        table = table.filter(F.col(_KODE).startswith(code))

    def cnt(lvl: int):
        return F.count(F.when(F.col("level") == lvl, 1))

    return table.agg(
        (F.count(F.lit(1)) > 0).alias("available"),
        cnt(1).alias("provinsi"),
        cnt(2).alias("kabupaten"),
        cnt(3).alias("kecamatan"),
        cnt(4).alias("kelurahan"),
    )


def get_wilayah_geojson(table: DataFrame, code: str) -> DataFrame:
    """§2.8 UDTF twin of plpgsql get_wilayah_geojson(code)
    (reference init_db.sql:40-60; declared but unused by server.js —
    implemented for full parity scope): rows under a code prefix with
    the GeoJSON geometry projected out."""
    return (
        table.filter(F.col(_KODE).startswith(code))
        .select(
            F.col(_KODE).alias("id"),
            F.col(_NAMA).alias("name"),
            "level",
            F.col("geometry").alias("geom"),
        )
        .orderBy("level", "id")
    )


def get_wilayah_by_level(
    table: DataFrame, level: int, parent: str | None = None
) -> DataFrame:
    """§2.8 UDTF twin of get_wilayah_by_level(level, parent)
    (reference init_db.sql:63-84): F1 ∧ F4 (null-escaped prefix) with
    the id/name/geom projection."""
    pred = F.col("level") == level
    if parent is not None:
        pred = pred & F.col(_KODE).startswith(parent)
    return table.filter(pred).select(
        F.col(_KODE).alias("id"),
        F.col(_NAMA).alias("name"),
        F.col("geometry").alias("geom"),
    )


def get_wilayah_counts(table: DataFrame) -> DataFrame:
    """§2.8 UDTF twin of get_wilayah_counts()
    (reference init_db.sql:109-120): TABLE(level, count) — the
    long-form of status_counts' pivoted envelope."""
    return (
        table.groupBy("level")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy("level")
    )


def _dispatch(code: str) -> list[tuple[str, int, str]]:
    """SURVEY §2.7: code length → (envelope_key, level, prefix)
    fetch plan (reference server.js:424-476)."""
    n = len(code)
    if n == 2:
        return [("provinsi", 1, code), ("kabupaten", 2, code)]
    if n == 5:
        return [
            ("kabupaten", 2, code),
            ("kecamatan", 3, code),
            ("kelurahan", 4, code),
        ]
    if n == 8:
        return [
            ("kabupaten", 2, code[:5]),
            ("kecamatan", 3, code),
            ("kelurahan", 4, code),
        ]
    return [("kecamatan", 3, code[:8]), ("kelurahan", 4, code)]


def geojson_envelope(table: DataFrame, code: str) -> DataFrame:
    """GET /api/db/geojson: the per-level envelope, each level's rows
    reassembled into a FeatureCollection JSON string (P3/P4/A4,
    toFeatureCollection server.js:486-506).

    One scan: the 2-3 level fetches become one OR-of-conjunctions
    predicate plus a group-by on the envelope key."""
    parts = _dispatch(code)
    pred = None
    part_col = None
    for key, lvl, prefix in parts:
        cond = (F.col("level") == lvl) & F.col(_KODE).startswith(prefix)
        pred = cond if pred is None else (pred | cond)
        part_col = (
            F.when(cond, F.lit(key))
            if part_col is None
            else part_col.when(cond, F.lit(key))
        )
    feature = F.struct(
        F.lit("Feature").alias("type"),
        F.struct(
            F.col(_NAMA).alias("name"), F.col(_KODE).alias("id")
        ).alias("properties"),
        geometry_struct(F.col("geometry")).alias("geometry"),
    )
    return (
        table.filter(pred)
        .select(part_col.alias("part"), F.col(_KODE).alias("kode"), feature.alias("feature"))
        .groupBy("part")
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.to_json(
                F.struct(
                    F.lit("FeatureCollection").alias("type"),
                    F.array_sort(
                        F.collect_list(F.struct(F.col("kode"), F.col("feature")))
                    )["feature"].alias("features"),
                )
            ).alias("feature_collection"),
        )
        .orderBy("part")
    )


def envelope_auto(
    spark: SparkSession,
    table_path: str,
    geojson_dir: str,
    code: str,
) -> DataFrame:
    """§2.9 dual-source fallback collapsed into one operator: serve
    the envelope from the managed table when it exists and has rows
    (the reference's DB path), else straight from the raw files (the
    reference's /api/geojson file fallback when the DB is down —
    server.js:282-286 + public/app.js:108-112)."""
    if _table_exists(table_path):
        table = load_wilayah(spark, table_path)
        if table.limit(1).count() > 0:
            return geojson_envelope(table, code)
    return file_envelope(spark, geojson_dir, code)


def file_envelope(
    spark: SparkSession, geojson_dir: str, code: str
) -> DataFrame:
    """GET /api/geojson (DB-less fallback, server.js:509-565): the
    same envelope computed straight from the files, with file sizes
    (S5) — the dual-source reader behind one logical operator."""
    from wilayah_aceh_etl_spark.sources.geojson import (
        classify_level,
        read_feature_collections,
    )

    fc = read_feature_collections(spark, geojson_dir, code)
    return (
        fc.select(
            "source_file",
            classify_level(F.col("source_file")).alias("level"),
            F.col("file_size"),
            F.size("features").alias("n_features"),
        )
        .orderBy("source_file")
    )
