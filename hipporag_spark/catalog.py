"""Thin table catalog: parquet-backed stand-in for an Iceberg catalog.

The engine's state (chunks, entities, facts, membership, edges, stores)
lives in named tables.  On a production cluster these are Iceberg tables
(``df.writeTo(name).createOrReplace()``, ``MERGE INTO``, ``DELETE FROM``,
snapshot time travel); the Iceberg runtime jars are not available in this
sandbox, so :class:`Catalog` provides the same verbs over parquet data
directories tracked by a per-version JSON **file manifest** — exactly
Iceberg's physical model (immutable data files + manifest lists + an
atomically swapped current-snapshot pointer), minus the jars.  The engine
code above it is storage-agnostic.

Physical layout per table::

    <root>/<name>/d<seq>-<uuid>/   immutable parquet data directories
    <root>/<name>/v<ts>.json       version manifest: {"files": [...]}
    <root>/<name>/current.json     atomic pointer to the live manifest

Cost model (the round-1 full-table-rewrite upsert was a scale defect,
VERDICT.md "What's wrong" #4):

- ``append``/``upsert`` write ONE new data dir holding only the batch's
  rows and commit a manifest referencing old files + the new one —
  O(batch), prior files untouched (Iceberg fast-append);
- ``delete_where``/``delete_keys`` rewrite ONLY the data files that
  contain matching rows (Iceberg copy-on-write delete); untouched files
  carry over by reference;
- ``compact`` folds all live files into one (the maintenance job a real
  deployment schedules; here it keeps long-running streams' file counts
  bounded).

Mapping to Iceberg (what changes on a real cluster, and nothing else):

================  ======================================================
Catalog verb       Iceberg equivalent
================  ======================================================
``write``          ``df.writeTo(t).createOrReplace()``
``append``         ``df.writeTo(t).append()``
``upsert``         ``MERGE INTO t USING s ON t.key = s.key WHEN NOT
                   MATCHED THEN INSERT *`` (content-hash keys make
                   matched-update a no-op, reference semantics)
``delete_where``   ``DELETE FROM t WHERE <cond>``
``delete_keys``    ``DELETE FROM t WHERE key IN (SELECT key FROM s)``
``compact``        rewrite_data_files maintenance procedure
versions/          table snapshots + time travel
================  ======================================================

Reference analog: one parquet file per embedding-store namespace
(``/root/reference/src/hipporag/embedding_store.py:109-120``) and a
pickled igraph (``HippoRAG.py:1079-1084``) — here every store is a table.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Catalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- internals ---------------------------------------------------------
    def _tdir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _current(self, name: str) -> str | None:
        meta = os.path.join(self._tdir(name), "current.json")
        if not os.path.exists(meta):
            return None
        with open(meta) as f:
            return json.load(f)["version"]

    def _files(self, name: str) -> list[str]:
        """Live data-dir names (relative to the table dir) of the current
        version."""
        v = self._current(name)
        if v is None:
            raise FileNotFoundError(f"table {name!r} does not exist in {self.root}")
        with open(os.path.join(self._tdir(name), v)) as f:
            return json.load(f)["files"]

    def _new_data_dir(self, name: str) -> tuple[str, str]:
        rel = f"d{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}"
        return rel, os.path.join(self._tdir(name), rel)

    def _commit(self, name: str, files: list[str]) -> None:
        tdir = self._tdir(name)
        os.makedirs(tdir, exist_ok=True)
        vname = f"v{int(time.time() * 1000)}-{uuid.uuid4().hex[:6]}.json"
        with open(os.path.join(tdir, vname), "w") as f:
            json.dump({"files": files, "committed_at": time.time()}, f)
        meta = os.path.join(tdir, "current.json")
        tmp = meta + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": vname}, f)
        os.replace(tmp, meta)  # atomic pointer swap = the "snapshot commit"

    def _write_data(self, name: str, df: DataFrame) -> str:
        rel, path = self._new_data_dir(name)
        df.write.mode("overwrite").parquet(path)
        return rel

    # -- verbs -------------------------------------------------------------
    def exists(self, name: str) -> bool:
        return self._current(name) is not None

    def read(self, name: str) -> DataFrame:
        tdir = self._tdir(name)
        paths = [os.path.join(tdir, rel) for rel in self._files(name)]
        return self.spark.read.parquet(*paths)

    def file_count(self, name: str) -> int:
        """Number of live data files — lets tests assert append-only cost."""
        return len(self._files(name))

    def write(self, name: str, df: DataFrame) -> None:
        """Full snapshot replace (createOrReplace)."""
        rel = self._write_data(name, df)
        self._commit(name, [rel])

    def append(self, name: str, df: DataFrame) -> None:
        """Fast-append: one new data dir, prior files untouched."""
        if not self.exists(name):
            self.write(name, df)
            return
        files = self._files(name)
        rel = self._write_data(name, df)
        self._commit(name, files + [rel])

    def upsert(self, name: str, df: DataFrame, key: str) -> int:
        """Insert rows whose ``key`` is absent (content-hash MERGE INTO —
        the reference's insert-only-missing semantics,
        ``embedding_store.py:63-90``).  Returns rows inserted.  O(batch)
        write: the anti-join scans the table, but only the new rows are
        written (one appended data file)."""
        return self.upsert_delta(name, df, key)[0]

    def upsert_delta(self, name: str, df: DataFrame, key: str) -> tuple[int, DataFrame | None]:
        """:meth:`upsert`, additionally returning the inserted rows as a
        DataFrame backed by the freshly appended data file (``None`` if
        nothing was inserted).  The incremental indexer uses this delta to
        do per-batch graph maintenance without re-deriving 'what was new'
        with a second table scan."""
        if not self.exists(name):
            new = df.dropDuplicates([key])
            n = new.count()
            if n == 0:
                self.write(name, new)
                return 0, None
            rel = self._write_data(name, new)
            self._commit(name, [rel])
            return n, self.spark.read.parquet(os.path.join(self._tdir(name), rel))
        cur = self.read(name)
        missing = (
            df.dropDuplicates([key])
            .join(cur.select(key), key, "left_anti")
            .select(cur.columns)
        )
        n = missing.count()
        if n == 0:
            return 0, None
        files = self._files(name)
        rel = self._write_data(name, missing)
        self._commit(name, files + [rel])
        return n, self.spark.read.parquet(os.path.join(self._tdir(name), rel))

    def delete_where(self, name: str, condition) -> int:
        """DELETE FROM name WHERE condition; returns rows deleted.
        Copy-on-write per data file: files with no matching row carry over
        by reference, only affected files are rewritten."""
        tdir = self._tdir(name)
        new_files: list[str] = []
        removed = 0
        for rel in self._files(name):
            fdf = self.spark.read.parquet(os.path.join(tdir, rel))
            total = fdf.count()
            keep = fdf.where(~condition)
            kept = keep.count()
            if kept == total:
                new_files.append(rel)
                continue
            removed += total - kept
            if kept:
                new_files.append(self._write_data(name, keep))
        if removed:
            if not new_files:  # table emptied: keep schema via an empty file
                new_files = [self._write_data(name, self.read(name).limit(0))]
            self._commit(name, new_files)
        return removed

    def _key_df(self, keys: DataFrame, key: str) -> DataFrame:
        """The deduplicated key column, selected BY NAME.  A positional
        ``columns[0]`` would silently match on the wrong column for a
        multi-column or reordered input (ADVICE r2); a single-column input
        under a different name is accepted and aliased."""
        if key in keys.columns:
            kdf = keys.select(key)
        elif len(keys.columns) == 1:
            kdf = keys.select(F.col(keys.columns[0]).alias(key))
        else:
            raise ValueError(
                f"key column {key!r} not found in {keys.columns}; "
                "pass a DataFrame containing it (or exactly one column)")
        return kdf.dropDuplicates([key])

    def _rewrite_without_keys(self, name: str, kdf: DataFrame, key: str) -> tuple[list[str], int]:
        """Copy-on-write pass: rewrite only data files containing a key
        match; untouched files carry over by reference.  Returns the new
        file list and the number of rows removed (no commit)."""
        tdir = self._tdir(name)
        new_files: list[str] = []
        removed = 0
        for rel in self._files(name):
            fdf = self.spark.read.parquet(os.path.join(tdir, rel))
            n_match = fdf.join(kdf, key, "left_semi").count()
            if n_match == 0:
                new_files.append(rel)
                continue
            removed += n_match
            keep = fdf.join(kdf, key, "left_anti")
            if keep.count():
                new_files.append(self._write_data(name, keep))
        return new_files, removed

    def delete_keys(self, name: str, keys: DataFrame, key: str) -> int:
        """DELETE FROM name WHERE key IN (SELECT key FROM keys) — the
        anti-join form of :meth:`delete_where` (no driver-side key list,
        VERDICT.md round-1 item 5).  ``keys`` is broadcast per file."""
        kdf = F.broadcast(self._key_df(keys, key))
        new_files, removed = self._rewrite_without_keys(name, kdf, key)
        if removed:
            if not new_files:
                new_files = [self._write_data(name, self.read(name).limit(0))]
            self._commit(name, new_files)
        return removed

    def replace_keys(self, name: str, keys: DataFrame, df: DataFrame, key: str) -> int:
        """Atomic DELETE-keys + INSERT in ONE snapshot commit (Iceberg
        ``MERGE INTO t USING s ON t.key = s.key WHEN MATCHED THEN UPDATE *
        WHEN NOT MATCHED THEN INSERT *``).  Files containing a matching key
        are rewritten without those rows, the replacement rows land in one
        new data file, and both changes publish in a single manifest swap —
        a crash leaves either the old snapshot or the new one, never a
        deleted-but-not-yet-appended middle state (ADVICE r2,
        engine.py:287).  Returns rows removed."""
        if not self.exists(name):
            self.write(name, df)
            return 0
        kdf = F.broadcast(self._key_df(keys, key))
        new_files, removed = self._rewrite_without_keys(name, kdf, key)
        new_files.append(self._write_data(name, df))
        self._commit(name, new_files)
        return removed

    def compact(self, name: str) -> int:
        """Fold all live data files into one; returns the file count before
        compaction (Iceberg ``rewrite_data_files``)."""
        files = self._files(name)
        if len(files) <= 1:
            return len(files)
        rel = self._write_data(name, self.read(name))
        self._commit(name, [rel])
        return len(files)

    def vacuum(self, name: str, keep_versions: int = 1) -> int:
        """Delete data directories referenced only by expired version
        manifests (Iceberg ``expire_snapshots``): keeps the newest
        ``keep_versions`` manifests' files plus the current pointer's.
        Returns the number of data dirs removed.  Never required for
        correctness — bounds disk growth for long-lived catalogs."""
        tdir = self._tdir(name)
        if not self.exists(name):
            return 0
        manifests = sorted(
            f for f in os.listdir(tdir) if f.startswith("v") and f.endswith(".json")
        )
        keep_manifests = set(manifests[-max(keep_versions, 1):])
        keep_manifests.add(self._current(name))
        live: set[str] = set()
        for m in keep_manifests:
            p = os.path.join(tdir, m)
            if os.path.exists(p):
                with open(p) as f:
                    live.update(json.load(f)["files"])
        removed = 0
        for entry in os.listdir(tdir):
            if entry.startswith("d") and os.path.isdir(os.path.join(tdir, entry)) \
                    and entry not in live:
                shutil.rmtree(os.path.join(tdir, entry), ignore_errors=True)
                removed += 1
        for m in manifests:
            if m not in keep_manifests:
                os.unlink(os.path.join(tdir, m))
        return removed

    def drop(self, name: str) -> None:
        shutil.rmtree(self._tdir(name), ignore_errors=True)
