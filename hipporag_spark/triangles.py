"""Triangle counting — graph-density diagnostic (north_rule algorithm #4).

The reference's only density-ish output is ``get_graph_info``
(``/root/reference/src/hipporag/HippoRAG.py:1086-1139``); the engine adds
the standard oriented two-join DataFrame formulation (SURVEY.md §4.3.5):

    E' = distinct undirected pairs oriented src < dst
    triangles(a,b,c) = E'(a,b) ⋈ E'(b,c) ⋈ E'(a,c),  a < b < c

Orienting by id bounds each join's fan-out by the *oriented* degree
(every triangle counted exactly once, no post-hoc /6), and the degree
of a vertex in E' under id-ordering is ≤ its true degree — the classic
mitigation that keeps hub vertices from exploding the first join.  At
cluster scale the further refinement is degree-ordering instead of
id-ordering; id-ordering is kept here because the oracle comparison and
the DuckDB SQL mirror must be bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def oriented_edges(edges: DataFrame) -> DataFrame:
    """Distinct undirected pairs oriented ``src < dst`` (self-loops and
    multiplicities dropped)."""
    fwd = edges.select("src", "dst")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return (
        fwd.unionByName(rev)
        .where(F.col("src") < F.col("dst"))
        .distinct()
    )


def triangle_list(edges: DataFrame) -> DataFrame:
    """All triangles as ``(a, b, c)`` with a < b < c."""
    e = oriented_edges(edges)
    e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    return e1.join(e2, "b").join(e3, ["a", "c"]).select("a", "b", "c")


def triangle_count(edges: DataFrame) -> int:
    """Global triangle count."""
    return triangle_list(edges).count()


def triangles_per_vertex(edges: DataFrame) -> DataFrame:
    """``(node_id, triangles)`` — per-vertex participation count."""
    tl = triangle_list(edges)
    v = (
        tl.select(F.col("a").alias("node_id"))
        .unionByName(tl.select(F.col("b").alias("node_id")))
        .unionByName(tl.select(F.col("c").alias("node_id")))
    )
    return v.groupBy("node_id").agg(F.count(F.lit(1)).alias("triangles"))
