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
