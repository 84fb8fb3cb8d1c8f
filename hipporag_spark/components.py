"""Connected components — iterative min-label propagation.

North_rule algorithm #2.  The reference holds its component structure
implicitly inside the pickled igraph object (``/root/reference/src/
hipporag/HippoRAG.py:164-195, 1600``); the engine computes it explicitly
over the edge table and labels every node with the **minimum node id in
its component** — a canonical labeling that igraph's ``components()``
membership is compared against as a partition (same groups ⇒ exact
match; tested against a union-find oracle in
``tests/reference_impl.py``).

Physical plan per superstep: ``labels ⋈ edges → min(label) per node``
(SURVEY.md §4.3.3) — propagate each node's current label to its
neighbors, take the min of (own, incoming).  Hash-join on ``src``
against the persisted pre-partitioned edge table; ``groupBy(node).min``
does map-side partial aggregation so hub nodes never concentrate a
shuffle partition.  Converges in O(component diameter) supersteps;
local union-find fast path for small graphs (same result, one collect).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class CCResult:
    components: DataFrame  # (node_id string, component string)
    iterations: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def _undirected_pairs(edges: DataFrame) -> DataFrame:
    fwd = edges.select("src", "dst")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return fwd.unionByName(rev).where(F.col("src") != F.col("dst")).distinct()


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    extra_nodes: DataFrame | None = None,  # (node_id) — isolated vertices
    max_iter: int = 200,
    mode: str = "auto",
    local_edge_limit: int = 2_000_000,
) -> CCResult:
    und = _undirected_pairs(edges).persist()
    n_edges = und.count()
    nodes = und.select(F.col("src").alias("node_id")).distinct()
    if extra_nodes is not None:
        nodes = nodes.unionByName(extra_nodes.select("node_id")).distinct()

    if mode == "auto":
        mode = "local" if n_edges <= local_edge_limit else "dataframe"

    if mode == "local":
        res = _cc_local(spark, und, nodes)
    else:
        res = _cc_dataframe(spark, und, nodes, max_iter)
    und.unpersist()
    return res


def _cc_local(spark, und, nodes) -> CCResult:
    """Union-find on the driver (small graphs)."""
    pairs = und.toPandas()
    node_list = nodes.toPandas()["node_id"].tolist()
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for u, v in zip(pairs["src"], pairs["dst"]):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    for x in node_list:
        find(x)
    groups: dict = {}
    for x in parent:
        groups.setdefault(find(x), []).append(x)
    rows = []
    for members in groups.values():
        lab = min(members)
        rows.extend((m, lab) for m in members)
    out = spark.createDataFrame(pd.DataFrame(rows, columns=["node_id", "component"]))
    return CCResult(out, 1, True, [{"mode": "local", "edges": len(pairs)}])


def _cc_dataframe(spark, und, nodes, max_iter) -> CCResult:
    labels = nodes.select("node_id", F.col("node_id").alias("component"))
    labels = labels.localCheckpoint(eager=True)
    metrics: list[dict] = []
    converged = False
    it = 0
    for it in range(max_iter):
        t0 = time.time()
        msgs = (
            und.join(labels.withColumnRenamed("node_id", "src"), "src")
            .select(F.col("dst").alias("node_id"), "component")
        )
        new = (
            msgs.unionByName(labels)
            .groupBy("node_id")
            .agg(F.min("component").alias("component"))
        )
        new = new.localCheckpoint(eager=True)
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "node_id")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new
        metrics.append({"superstep": it, "labels_changed": int(changed),
                        "wall_ms": (time.time() - t0) * 1000, "mode": "dataframe"})
        if changed == 0:
            converged = True
            break
    return CCResult(labels, it + 1, converged, metrics)
