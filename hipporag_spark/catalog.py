"""Thin table catalog: parquet-backed stand-in for an Iceberg catalog.

The engine's state (chunks, entities, facts, membership, edges, stores)
lives in named tables.  On a production cluster these are Iceberg tables
(``df.writeTo(name).createOrReplace()``, ``MERGE INTO``, ``DELETE FROM``,
snapshot time travel); the Iceberg runtime jars are not available in this
sandbox, so :class:`Catalog` provides the same four verbs over parquet
directories with atomic-rename versioning — the engine code above it is
storage-agnostic.

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

from pyspark.sql import DataFrame, SparkSession


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

    def _commit(self, name: str, version: str) -> None:
        meta = os.path.join(self._tdir(name), "current.json")
        tmp = meta + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": version, "committed_at": time.time()}, f)
        os.replace(tmp, meta)  # atomic pointer swap = the "snapshot commit"

    # -- verbs -------------------------------------------------------------
    def exists(self, name: str) -> bool:
        return self._current(name) is not None

    def read(self, name: str) -> DataFrame:
        v = self._current(name)
        if v is None:
            raise FileNotFoundError(f"table {name!r} does not exist in {self.root}")
        return self.spark.read.parquet(os.path.join(self._tdir(name), v))

    def write(self, name: str, df: DataFrame) -> None:
        v = f"v{int(time.time() * 1000)}"
        path = os.path.join(self._tdir(name), v)
        df.write.mode("overwrite").parquet(path)
        self._commit(name, v)

    def upsert(self, name: str, df: DataFrame, key: str) -> int:
        """Insert rows whose ``key`` is absent (content-hash MERGE INTO —
        the reference's insert-only-missing semantics,
        ``embedding_store.py:63-90``).  Returns rows inserted."""
        if not self.exists(name):
            new = df.dropDuplicates([key])
            n = new.count()
            self.write(name, new)
            return n
        cur = self.read(name)
        missing = df.dropDuplicates([key]).join(cur.select(key), key, "left_anti")
        n = missing.count()
        if n:
            self.write(name, cur.unionByName(missing))
        return n

    def delete_where(self, name: str, condition) -> int:
        """DELETE FROM name WHERE condition; returns rows deleted."""
        cur = self.read(name)
        keep = cur.where(~condition)
        removed = cur.count() - keep.count()
        if removed:
            self.write(name, keep)
        return removed

    def drop(self, name: str) -> None:
        shutil.rmtree(self._tdir(name), ignore_errors=True)
