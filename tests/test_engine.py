"""Lifecycle semantics: incremental index, idempotency, cascading delete
with orphan detection — mirroring HippoRAG.index/delete
(/root/reference/src/hipporag/HippoRAG.py:215-358)."""

import pytest
from pyspark.sql import functions as F

from hipporag_spark.engine import HippoIndex

BATCH1 = [
    ("o/r1", "a.py", "c1", "py", "alpha beta gamma"),
    ("o/r1", "b.py", "c2", "py", "beta gamma delta"),
    ("o/r2", "c.py", "c3", "py", "epsilon zeta"),
]
BATCH2 = [
    ("o/r2", "d.py", "c4", "py", "delta epsilon"),
    ("o/r3", "e.py", "c5", "py", "solo unique tokens"),
]
SCHEMA = "repo string, path string, commit string, lang string, content string"


@pytest.fixture()
def engine(spark, tmp_path):
    return HippoIndex(spark, str(tmp_path / "cat"))


def test_index_and_reindex_idempotent(spark, engine):
    c1 = engine.index(spark.createDataFrame(BATCH1, SCHEMA))
    assert c1["chunks"] == 3
    # alpha beta gamma delta epsilon zeta = 6 entities
    assert c1["entities"] == 6
    again = engine.index(spark.createDataFrame(BATCH1, SCHEMA))
    assert all(v == 0 for v in again.values()), again
    s = engine.stats()
    assert s["num_passage_nodes"] == 3 and s["num_phrase_nodes"] == 6
    # fact pairs: {ab,ag,bg} ∪ {bd,bg,dg} ∪ {ez} → 6 distinct triples
    assert s["num_extracted_triples"] == 6
    # fact edge rows = distinct ordered pairs × 2 directions
    assert s["num_fact_edges"] == 12


def test_incremental_index_accumulates(spark, engine):
    engine.index(spark.createDataFrame(BATCH1, SCHEMA))
    c2 = engine.index(spark.createDataFrame(BATCH2, SCHEMA))
    assert c2["chunks"] == 2
    # new entities: solo, unique, tokens (delta/epsilon already present)
    assert c2["entities"] == 3
    s = engine.stats()
    assert s["num_passage_nodes"] == 5 and s["num_phrase_nodes"] == 9


def test_delete_cascades_orphans(spark, engine):
    engine.index(spark.createDataFrame(BATCH1 + BATCH2, SCHEMA))
    # delete the only doc containing zeta (and epsilon appears elsewhere)
    dels = engine.delete(
        spark.createDataFrame([BATCH1[2]], SCHEMA)
    )
    assert dels["chunks"] == 1
    ents = {r["phrase"] for r in engine.cat.read("entities").collect()}
    assert "zeta" not in ents          # orphan entity removed
    assert "epsilon" in ents           # still owned by d.py
    # orphan triple (epsilon, zeta) removed from the fact store
    triples = {(r["subject"], r["object"]) for r in engine.cat.read("fact_store").collect()}
    assert ("epsilon", "zeta") not in triples
    s = engine.stats()
    assert s["num_passage_nodes"] == 4
    # graph edges no longer reference the deleted chunk
    edges = engine.cat.read("edges")
    doomed_chunk = edges.where(F.col("src").contains("zeta")).count()
    assert doomed_chunk == 0


def test_sha_invariant_through_engine(spark, engine):
    """input_hint per-row invariant: sha256(content) preserved row-for-row
    into the chunk table (chunk_id = 'chunk-' + sha256(content))."""
    import hashlib

    engine.index(spark.createDataFrame(BATCH1, SCHEMA))
    rows = engine.cat.read("chunks").select("chunk_id", "content").collect()
    assert len(rows) == 3
    for r in rows:
        assert r["chunk_id"] == "chunk-" + hashlib.sha256(r["content"].encode()).hexdigest()


def test_retriever_over_catalog(spark, engine):
    engine.index(spark.createDataFrame(BATCH1 + BATCH2, SCHEMA))
    from hipporag_spark.retrieve import RetrievalConfig

    r = engine.retriever(RetrievalConfig(retrieval_top_k=3))
    q = spark.createDataFrame([("q0", "beta gamma")], "query_id string, question string")
    out = r.retrieve(q).toPandas()
    assert len(out) == 3
    # the two docs containing both beta and gamma should rank highest
    top2 = set(out[out["rank"] <= 2]["doc_id"])
    import hashlib

    expect = {
        "chunk-" + hashlib.sha256(b"alpha beta gamma").hexdigest(),
        "chunk-" + hashlib.sha256(b"beta gamma delta").hexdigest(),
    }
    assert top2 == expect
