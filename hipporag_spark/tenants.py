"""Multi-tenant registry over per-tenant catalog roots (SURVEY.md §2.6 M5).

Reference: ``/root/reference/src/hipporag/MultiTenantHippoRAGManager.py:24-158``
— a manager that lazily creates one engine instance per tenant under
``<base_save_dir>/<tenant_id>``, persists the tenant registry to
``tenant_config.json``, stamps access times, and evicts the
least-recently-used instance when more than ``max_concurrent_tenants``
are resident (eviction drops the cached instance, never the data).

Engine mapping: isolation is physical — every tenant's
:class:`~hipporag_spark.engine.HippoIndex` owns a disjoint
:class:`~hipporag_spark.catalog.Catalog` root, so there is no shared
mutable state to police; this wrapper only manages the instance cache.
:class:`HippoIndex` pins no long-lived Spark state (every ``persist``
inside ``index``/``delete``/retrieval is released before the call
returns), so eviction is exactly the reference's: drop the resident
instance, keep the data.
"""

from __future__ import annotations

import json
import os
import threading
import time

from pyspark.sql import SparkSession

from .engine import HippoIndex

__all__ = ["MultiTenantManager"]

_CONFIG_NAME = "tenant_config.json"


class MultiTenantManager:
    """LRU-bounded registry of per-tenant :class:`HippoIndex` instances.

    ``get(tenant_id)`` returns (creating on first use) the tenant's index
    rooted at ``<root>/<tenant_id>``; at most ``max_loaded`` instances
    stay resident, the least-recently-used being evicted first
    (reference ``_cleanup_least_recently_used``,
    ``MultiTenantHippoRAGManager.py:108-117``).  Per-tenant engine
    options given at first ``get`` are persisted in the registry file
    and reused on every later instantiation, mirroring the reference's
    ``tenant_config.json`` round-trip (lines 55-66).
    """

    def __init__(self, spark: SparkSession, root: str, max_loaded: int = 600):
        if not root:
            raise ValueError("root is required")
        if max_loaded < 1:
            raise ValueError("max_loaded must be >= 1")
        self.spark = spark
        self.root = root
        self.max_loaded = max_loaded
        self._configs: dict[str, dict] = {}
        self._instances: dict[str, HippoIndex] = {}
        self._access: dict[str, float] = {}
        self._lock = threading.RLock()
        os.makedirs(root, exist_ok=True)
        self._load_configs()

    # -- registry persistence ------------------------------------------

    @property
    def _config_path(self) -> str:
        return os.path.join(self.root, _CONFIG_NAME)

    def _load_configs(self) -> None:
        if os.path.exists(self._config_path):
            with open(self._config_path) as f:
                self._configs = json.load(f)

    def _save_configs(self) -> None:
        tmp = self._config_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._configs, f, indent=2, sort_keys=True)
        os.replace(tmp, self._config_path)

    # -- instance lifecycle --------------------------------------------

    def get(self, tenant_id: str, **engine_opts) -> HippoIndex:
        """The tenant's index, created/loaded on demand.

        ``engine_opts`` (``embed_dim``, ``synonyms``, …) are recorded on
        first use and must not conflict with the persisted registry on
        later calls — silently rebuilding a tenant's index with a
        different embedding dimension would corrupt its stores.
        """
        if not tenant_id or os.sep in tenant_id or tenant_id.startswith("."):
            raise ValueError(f"invalid tenant_id: {tenant_id!r}")
        with self._lock:
            cfg = self._configs.get(tenant_id)
            if cfg is None:
                cfg = {"tenant_id": tenant_id,
                       "save_dir": os.path.join(self.root, tenant_id),
                       "engine_opts": engine_opts}
                self._configs[tenant_id] = cfg
                self._save_configs()
            elif engine_opts and engine_opts != cfg["engine_opts"]:
                raise ValueError(
                    f"tenant {tenant_id!r} already registered with "
                    f"{cfg['engine_opts']}; refusing {engine_opts}")
            self._access[tenant_id] = time.monotonic()
            inst = self._instances.get(tenant_id)
            if inst is None:
                while len(self._instances) >= self.max_loaded:
                    self._evict_lru()
                inst = HippoIndex(self.spark, cfg["save_dir"],
                                  **cfg["engine_opts"])
                self._instances[tenant_id] = inst
            return inst

    def _evict_lru(self) -> None:
        resident = [t for t in self._access if t in self._instances]
        if not resident:
            return
        oldest = min(resident, key=self._access.__getitem__)
        self.evict(oldest)

    def evict(self, tenant_id: str) -> None:
        """Drop the tenant's resident instance (data stays on disk)."""
        with self._lock:
            self._instances.pop(tenant_id, None)
            self._access.pop(tenant_id, None)

    def active_tenants(self) -> list[str]:
        with self._lock:
            return sorted(self._instances)

    def tenants(self) -> list[str]:
        """All registered tenants (resident or not)."""
        with self._lock:
            return sorted(self._configs)

    def evict_all(self) -> None:
        with self._lock:
            for t in list(self._instances):
                self.evict(t)

    def __enter__(self) -> "MultiTenantManager":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        self.evict_all()
