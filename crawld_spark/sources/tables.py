"""Snapshot-versioned table catalog — the engine's Iceberg stand-in.

On a real cluster the engine state tables (frontier, seen_shards, host_state,
rounds, fetched — SURVEY.md §1.4) are Iceberg tables and every write is an
Iceberg `MERGE INTO` / append with an atomic snapshot commit. This sandbox has
no Iceberg runtime jar, so this module provides the same *contract* on plain
parquet (SURVEY.md §7.1 fallback), behind one small API so the swap is local:

  - every write produces a new immutable snapshot = a manifest file
    ``<tbl>/v<NNNN>.json`` listing immutable data directories
    ``<tbl>/d<NNNN>/``; an **append writes only its delta directory** and a
    manifest that extends the previous one (Iceberg's append semantics — the
    alternative, read-union-rewrite, is O(table) per round and O(rounds²)
    over a crawl: a non-starter for the ``fetched``/``rounds`` logs at scale)
  - a table's current version is a pointer file ``<tbl>/_VERSION`` written via
    write-tmp + ``os.replace`` (atomic on POSIX)
  - a *round commit* (``commit_round``) records {table: version} in the
    ``_commits`` log **last**, making the multi-table round commit atomic:
    a crash before the log write leaves orphan snapshots that the next
    ``restore_last_commit`` simply ignores/rolls back.

This mirrors the reference's checkpointing discipline: crawld records the
last *completed* id, success-only, after the work is durable
(/root/reference/crawld.go:236-239, 429-454); resume rolls back to that point
(crawld.go:412-421).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_PTR = "_VERSION"
_COMMITS = "_commits.json"


class Catalog:
    """A warehouse of snapshot-versioned parquet tables with atomic
    multi-table round commits."""

    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    # ---------- paths / versions ----------
    def _tdir(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    def _manifest_path(self, name: str, version: int) -> str:
        return os.path.join(self._tdir(name), f"v{version:06d}.json")

    def _ddir(self, name: str, version: int) -> str:
        return os.path.join(self._tdir(name), f"d{version:06d}")

    def _read_manifest(self, name: str, version: int) -> list[str]:
        with open(self._manifest_path(name, version)) as f:
            return json.load(f)["data_dirs"]

    def _write_manifest(self, name: str, version: int, data_dirs: list[str]) -> None:
        p = self._manifest_path(name, version)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": version, "data_dirs": data_dirs}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, p)

    def current_version(self, name: str) -> int:
        """0 = table does not exist yet."""
        ptr = os.path.join(self._tdir(name), _PTR)
        if not os.path.exists(ptr):
            return 0
        with open(ptr) as f:
            return int(f.read().strip())

    def _set_version(self, name: str, version: int) -> None:
        tdir = self._tdir(name)
        os.makedirs(tdir, exist_ok=True)
        tmp = os.path.join(tdir, _PTR + ".tmp")
        with open(tmp, "w") as f:
            f.write(f"{version:020d}")  # zero-pad ≙ crawld.go:451 checkpoint format
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(tdir, _PTR))

    def exists(self, name: str) -> bool:
        return self.current_version(name) > 0

    # ---------- read / write ----------
    def read(self, name: str, schema: StructType | None = None) -> DataFrame:
        v = self.current_version(name)
        if v == 0:
            if schema is None:
                raise FileNotFoundError(f"table {name} does not exist and no schema given")
            return self.spark.createDataFrame([], schema)
        return self.read_version(name, v)

    def read_version(self, name: str, version: int) -> DataFrame:
        dirs = [os.path.join(self._tdir(name), d) for d in self._read_manifest(name, version)]
        return self.spark.read.parquet(*dirs)

    def write(self, name: str, df: DataFrame, advance_pointer: bool = True) -> int:
        """Write a new immutable snapshot; optionally advance the pointer.

        With ``advance_pointer=False`` the snapshot is staged but invisible —
        a later ``commit_round`` (or explicit ``_set_version``) publishes it.
        """
        v = self._next_free_version(name)
        ddir = self._ddir(name, v)
        df.write.mode("overwrite").parquet(ddir)
        self._write_manifest(name, v, [os.path.basename(ddir)])
        if advance_pointer:
            self._set_version(name, v)
        return v

    def _next_free_version(self, name: str) -> int:
        # find a free version slot even if orphan snapshots exist from a crash
        v = self.current_version(name) + 1
        while os.path.exists(self._manifest_path(name, v)) or os.path.exists(
            self._ddir(name, v)
        ):
            v += 1
        return v

    def append(self, name: str, df: DataFrame, schema: StructType | None = None,
               advance_pointer: bool = True) -> int:
        """Iceberg-style append: write ONLY the delta data dir; the new
        manifest = previous manifest + delta. O(delta), never O(table)."""
        cur_v = self.current_version(name)
        base = self._read_manifest(name, cur_v) if cur_v > 0 else []
        v = self._next_free_version(name)
        ddir = self._ddir(name, v)
        df.write.mode("overwrite").parquet(ddir)
        self._write_manifest(name, v, base + [os.path.basename(ddir)])
        if advance_pointer:
            self._set_version(name, v)
        return v

    # ---------- MERGE (Iceberg `MERGE INTO` stand-in; SURVEY.md §2.4) ----------
    def merge(
        self,
        name: str,
        updates: DataFrame,
        keys: Iterable[str],
        schema: StructType | None = None,
        advance_pointer: bool = True,
    ) -> int:
        """``MERGE INTO name USING updates ON keys WHEN MATCHED THEN UPDATE *
        WHEN NOT MATCHED THEN INSERT *``.

        ≙ the reference's probe-then-INSERT/UPDATE upsert pattern
        (crawlers/github.go:475-516 and friends), collapsed into one
        declarative op. Implemented as target-anti-join(updates) ∪ updates so
        it is a pure DataFrame plan (shuffled hash/sort-merge join on the
        keys; Catalyst/AQE pick the physical strategy). Updates must be
        unique on the keys.
        """
        keys = list(keys)
        target = self.read(name, schema)
        survivors = target.join(updates.select(*keys).distinct(), on=keys, how="left_anti")
        merged = survivors.unionByName(updates, allowMissingColumns=True)
        return self.write(name, merged, advance_pointer=advance_pointer)

    # ---------- atomic multi-table round commits ----------
    def _commits_path(self) -> str:
        return os.path.join(self.warehouse, _COMMITS)

    def read_commits(self) -> list[dict]:
        p = self._commits_path()
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return json.load(f)

    def last_committed_round(self) -> int:
        """≙ read-back of last_fetched_id (crawld.go:412-421). -1 = none."""
        commits = self.read_commits()
        return commits[-1]["round_id"] if commits else -1

    def commit_round(self, round_id: int, table_versions: dict[str, int]) -> None:
        """Publish a round: advance all pointers, then append the commit log
        entry (the durable marker) atomically. Success-only semantics ≙
        crawld.go:236-239."""
        for name, v in table_versions.items():
            self._set_version(name, v)
        commits = self.read_commits()
        commits.append({"round_id": round_id, "tables": dict(table_versions)})
        tmp = self._commits_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(commits, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._commits_path())

    def restore_last_commit(self) -> int:
        """Roll every table pointer back to the last committed round's
        versions (resume path, ≙ crawld.go:412-421). Returns that round_id,
        or -1 if nothing was ever committed (pointers reset to 0)."""
        commits = self.read_commits()
        if not commits:
            for name in os.listdir(self.warehouse):
                tdir = self._tdir(name)
                if os.path.isdir(tdir) and os.path.exists(os.path.join(tdir, _PTR)):
                    os.remove(os.path.join(tdir, _PTR))
            return -1
        last = commits[-1]
        for name, v in last["tables"].items():
            self._set_version(name, v)
        return last["round_id"]

    def drop(self, name: str) -> None:
        shutil.rmtree(self._tdir(name), ignore_errors=True)


def with_row_hash(df: DataFrame, cols: Iterable[str], out: str = "row_hash") -> DataFrame:
    """Stable JVM-side 64-bit hash over columns (xxhash64) — used for
    shard routing and dedup keys. Never Python ``hash()`` (SURVEY.md §7.7.5).
    """
    return df.withColumn(out, F.xxhash64(*[F.col(c) for c in cols]))
