"""Engine lifecycle: incremental ``index`` / cascading ``delete`` over the
catalog — the reference's continual-memory operators re-expressed as
set-based DataFrame jobs.

Reference flow (``/root/reference/src/hipporag/HippoRAG.py``):

- ``index(docs)`` (215-275): content-hash chunk upsert → OpenIE only for
  chunks not already indexed (881-924 resume) → entity/fact store upserts
  → fact/passage/synonym edge accumulation → graph materialization →
  persist.  Idempotent per chunk (756: fact edges only for new chunks).
- ``delete(docs)`` (277-358): chunk ids → orphan triples = triples whose
  EVERY owning doc is deleted (312-329) → orphan entities = entities
  whose every owning chunk is deleted (331-342) → store deletes + vertex
  deletes → persist.

Engine mapping — every step is an anti-join or aggregate over catalog
tables (SURVEY.md §2.6 M1/M2, §2.3 J2/J6):

- upserts are content-hash ``MERGE INTO`` (left_anti + append);
- "only new chunks" falls out of storing facts/membership per chunk:
  re-indexing an existing chunk inserts nothing, so fact-edge counts
  never double (the reference's ``HippoRAG.py:756`` guard);
- orphan detection is ``left_anti`` against the *surviving* membership /
  fact rows — no driver-side set algebra;
- the edge table is rebuilt from base tables by ``build_graph`` (exact
  §1.4 weight semantics) — on Iceberg this is an incremental MERGE, here
  a deterministic full derivation (cheap relative to extraction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import Catalog
from .extract import extract_all
from .graph import build_graph
from .retrieve import GraphRetriever, RetrievalConfig

def _fact_key():
    return F.sha2(F.concat_ws("\x1f", "subject", "predicate", "object"), 256)


class HippoIndex:
    """Persistent knowledge-graph index over a :class:`Catalog` root."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.cat = Catalog(spark, root)

    # ------------------------------------------------------------------
    def index(self, corpus: DataFrame) -> dict:
        """Incrementally index a corpus batch ``(repo, path, commit, lang,
        content)``; returns per-table inserted-row counts."""
        t = extract_all(corpus)
        counts = {}
        counts["chunks"] = self.cat.upsert("chunks", t["chunks"], key="chunk_id")

        # restrict downstream inserts to chunks not previously indexed is
        # automatic: per-chunk rows upsert on their composite key
        counts["entities"] = self.cat.upsert("entities", t["entities"], key="entity_id")
        membership = t["membership"].withColumn(
            "mkey", F.concat_ws("\x1f", "entity_id", "chunk_id")
        )
        counts["membership"] = self.cat.upsert("membership", membership, key="mkey")
        facts = t["facts"].withColumn(
            "fkey", F.concat_ws("\x1f", "chunk_id", "subject", "predicate", "object")
        )
        counts["facts"] = self.cat.upsert("facts", facts, key="fkey")
        fact_store = (
            t["facts"].dropDuplicates(["subject", "predicate", "object"])
            .select(_fact_key().alias("fact_id"), "subject", "predicate", "object")
        )
        counts["fact_store"] = self.cat.upsert("fact_store", fact_store, key="fact_id")
        self._rebuild_graph()
        return counts

    # ------------------------------------------------------------------
    def delete(self, corpus: DataFrame) -> dict:
        """Cascading delete of a corpus batch (by content hash), mirroring
        ``HippoRAG.delete`` orphan semantics."""
        doomed = corpus.select(
            F.concat(F.lit("chunk-"), F.sha2("content", 256)).alias("chunk_id")
        ).distinct()
        counts = {}

        # orphan triples: no surviving fact row carries the triple
        facts = self.cat.read("facts")
        surviving = facts.join(doomed, "chunk_id", "left_anti")
        orphan_triples = (
            facts.select(_fact_key().alias("fact_id")).distinct()
            .join(surviving.select(_fact_key().alias("fact_id")).distinct(),
                  "fact_id", "left_anti")
        )
        n_orphan_facts = orphan_triples.count()
        if n_orphan_facts:
            fs = self.cat.read("fact_store")
            keep = fs.join(orphan_triples, "fact_id", "left_anti")
            self.cat.write("fact_store", keep)
        counts["fact_store"] = n_orphan_facts

        # orphan entities: membership only in doomed chunks
        membership = self.cat.read("membership")
        surviving_m = membership.join(doomed, "chunk_id", "left_anti")
        orphan_entities = (
            membership.select("entity_id").distinct()
            .join(surviving_m.select("entity_id").distinct(), "entity_id", "left_anti")
        )
        n_orphan_entities = orphan_entities.count()
        if n_orphan_entities:
            ents = self.cat.read("entities")
            self.cat.write("entities", ents.join(orphan_entities, "entity_id", "left_anti"))
        counts["entities"] = n_orphan_entities

        doomed_ids = [r["chunk_id"] for r in doomed.collect()]
        counts["chunks"] = self.cat.delete_where("chunks", F.col("chunk_id").isin(doomed_ids))
        counts["membership"] = self.cat.delete_where(
            "membership", F.col("chunk_id").isin(doomed_ids)
        )
        counts["facts"] = self.cat.delete_where("facts", F.col("chunk_id").isin(doomed_ids))
        self._rebuild_graph()
        return counts

    # ------------------------------------------------------------------
    def _rebuild_graph(self) -> None:
        tables = {
            "chunks": self.cat.read("chunks"),
            "entities": self.cat.read("entities"),
            "membership": self.cat.read("membership").select("entity_id", "chunk_id"),
            "facts": self.cat.read("facts").select("chunk_id", "subject", "predicate", "object"),
        }
        nodes, edges = build_graph(tables)
        self.cat.write("nodes", nodes)
        self.cat.write("edges", edges)

    # ------------------------------------------------------------------
    def stats(self) -> dict:
        """Graph statistics (reference ``get_graph_info``,
        ``HippoRAG.py:1086-1139``)."""
        nodes = self.cat.read("nodes")
        edges = self.cat.read("edges")
        by_type = {r["node_type"]: r["cnt"] for r in
                   nodes.groupBy("node_type").agg(F.count(F.lit(1)).alias("cnt")).collect()}
        by_rel = {r["relation"]: r["cnt"] for r in
                  edges.groupBy("relation").agg(F.count(F.lit(1)).alias("cnt")).collect()}
        return {
            "num_phrase_nodes": by_type.get("entity", 0),
            "num_passage_nodes": by_type.get("chunk", 0),
            "num_total_nodes": sum(by_type.values()),
            "num_extracted_triples": self.cat.read("fact_store").count(),
            "num_fact_edges": by_rel.get("fact", 0),
            "num_passage_edges": by_rel.get("passage", 0),
            "num_synonym_edges": by_rel.get("synonym", 0),
            "num_total_edges": sum(by_rel.values()),
        }

    # ------------------------------------------------------------------
    def retriever(self, config: RetrievalConfig | None = None) -> GraphRetriever:
        return GraphRetriever(
            self.spark,
            self.cat.read("nodes"),
            self.cat.read("edges"),
            self.cat.read("chunks"),
            self.cat.read("entities"),
            self.cat.read("facts").select("chunk_id", "subject", "predicate", "object"),
            self.cat.read("membership").select("entity_id", "chunk_id"),
            config=config,
        )
