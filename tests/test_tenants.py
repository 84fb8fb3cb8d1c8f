"""Multi-tenant manager: isolation, registry round-trip, LRU eviction
(reference semantics from MultiTenantHippoRAGManager.py:24-158)."""

import pytest

from hipporag_spark.tenants import MultiTenantManager


_SCHEMA = "repo string, path string, commit string, lang string, content string"


def _docs(spark, rows):
    return spark.createDataFrame(
        [("o/r", p, "c1", "py", t) for p, t in rows], _SCHEMA)


def test_tenant_isolation_no_cross_reads(spark, tmp_path):
    mgr = MultiTenantManager(spark, str(tmp_path / "tenants"))
    a = mgr.get("acme")
    b = mgr.get("globex")
    a.index(_docs(spark, [("a.py", "alpha rows in table one")]))
    b.index(_docs(spark, [("b.py", "beta keys in table two")]))
    a_chunks = a.cat.read("chunks").collect()
    b_chunks = b.cat.read("chunks").collect()
    assert len(a_chunks) == 1 and len(b_chunks) == 1
    assert "alpha" in a_chunks[0]["content"] and "beta keys" in b_chunks[0]["content"]
    # physically disjoint roots
    assert a.cat.root != b.cat.root


def test_registry_persists_and_opts_conflict(spark, tmp_path):
    root = str(tmp_path / "t2")
    mgr = MultiTenantManager(spark, root)
    mgr.get("acme", embed_dim=64)
    # re-open: registry round-trips from tenant_config.json
    mgr2 = MultiTenantManager(spark, root)
    assert mgr2.tenants() == ["acme"]
    assert mgr2.get("acme").embed_dim == 64
    with pytest.raises(ValueError):
        mgr2.get("acme", embed_dim=128)


def test_lru_eviction_keeps_data(spark, tmp_path):
    mgr = MultiTenantManager(spark, str(tmp_path / "t3"), max_loaded=2)
    mgr.get("t_a").index(_docs(spark, [("a.py", "alpha beta")]))
    mgr.get("t_b")
    mgr.get("t_c")  # evicts t_a (least recently used)
    assert mgr.active_tenants() == ["t_b", "t_c"]
    assert sorted(mgr.tenants()) == ["t_a", "t_b", "t_c"]
    # re-acquiring the evicted tenant reloads its persisted data
    assert mgr.get("t_a").cat.read("chunks").count() == 1
    assert "t_a" in mgr.active_tenants() and "t_b" not in mgr.active_tenants()


def test_context_manager_and_invalid_ids(spark, tmp_path):
    with MultiTenantManager(spark, str(tmp_path / "t4")) as mgr:
        mgr.get("ok")
        assert mgr.active_tenants() == ["ok"]
    assert mgr.active_tenants() == []
    with pytest.raises(ValueError):
        mgr.get("../escape")
    with pytest.raises(ValueError):
        mgr.get("")


def test_eviction_leaves_tables_on_disk_bit_identical(spark, tmp_path):
    """The "eviction keeps data" claim, checked at the storage layer
    (VERDICT r3 next-round item 8): after the LRU drops a tenant, every
    one of its catalog tables still exists on disk, and a fresh manager
    (fresh registry load, nothing cached) reads back row sets identical
    to those snapshotted before eviction."""
    root = str(tmp_path / "t5")
    mgr = MultiTenantManager(spark, root, max_loaded=1)
    a = mgr.get("t_a")
    a.index(_docs(spark, [("a.py", "alpha rows in table one"),
                          ("b.py", "beta keys join scan")]))
    tables = ["chunks", "entities", "facts", "membership", "edges"]
    before = {
        t: sorted(map(tuple, (r for r in a.cat.read(t).collect())))
        for t in tables if a.cat.exists(t)
    }
    assert before, "expected at least one persisted table"
    mgr.get("t_b")  # evicts t_a
    assert "t_a" not in mgr.active_tenants()
    # a brand-new manager over the same root: no resident instance, no
    # in-memory state — everything must come from disk
    mgr2 = MultiTenantManager(spark, root, max_loaded=1)
    a2 = mgr2.get("t_a")
    for t, rows in before.items():
        assert a2.cat.exists(t), t
        after = sorted(map(tuple, (r for r in a2.cat.read(t).collect())))
        assert after == rows, f"table {t} changed across eviction"
