"""Connected components / LPA / triangles vs exact oracles (FIXTURES.md §6)."""

import pytest

from hipporag_spark.components import connected_components
from hipporag_spark.lpa import label_propagation
from hipporag_spark.triangles import triangle_count, triangles_per_vertex
from tests.reference_impl import components_exact, lpa_exact, triangles_exact

GRAPHS = [
    ("two_components", [("a", "b", 1.0), ("b", "c", 2.0), ("x", "y", 1.0)]),
    ("triangle_plus_tail", [("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 1.0), ("c", "d", 1.0)]),
    (
        "hub_with_ring",
        [(f"l{i:02d}", "hub", 1.0) for i in range(12)]
        + [(f"l{i:02d}", f"l{(i + 1) % 12:02d}", 1.0) for i in range(12)],
    ),
    ("parallel_edges", [("a", "b", 1.0), ("b", "a", 3.0), ("b", "c", 1.0), ("c", "a", 1.0)]),
]
_IDS = [g[0] for g in GRAPHS]


def _edges_df(spark, rows):
    return spark.createDataFrame(
        [(u, v, float(w), "fact") for u, v, w in rows],
        "src string, dst string, weight double, relation string",
    )


@pytest.mark.parametrize("name,rows", GRAPHS, ids=_IDS)
@pytest.mark.parametrize("mode", ["local", "dataframe"])
def test_connected_components(spark, name, rows, mode):
    res = connected_components(spark, _edges_df(spark, rows), mode=mode)
    assert res.converged
    got = {r["node_id"]: r["component"] for r in res.components.collect()}
    assert got == components_exact(rows)


def test_connected_components_isolated_nodes(spark):
    rows = [("a", "b", 1.0)]
    extra = spark.createDataFrame([("z",)], "node_id string")
    res = connected_components(spark, _edges_df(spark, rows), extra_nodes=extra, mode="local")
    got = {r["node_id"]: r["component"] for r in res.components.collect()}
    assert got == {"a": "a", "b": "a", "z": "z"}


@pytest.mark.parametrize("name,rows", GRAPHS, ids=_IDS)
def test_label_propagation_local_matches_reference(spark, name, rows):
    res = label_propagation(spark, _edges_df(spark, rows), max_iter=20, mode="local")
    got = {r["node_id"]: r["label"] for r in res.labels.collect()}
    assert got == lpa_exact(rows, max_iter=20)


@pytest.mark.parametrize("name,rows", GRAPHS[1:3], ids=_IDS[1:3])
def test_label_propagation_dataframe_matches_reference(spark, name, rows):
    res = label_propagation(spark, _edges_df(spark, rows), max_iter=8, mode="dataframe")
    got = {r["node_id"]: r["label"] for r in res.labels.collect()}
    assert got == lpa_exact(rows, max_iter=8)


@pytest.mark.parametrize("name,rows", GRAPHS, ids=_IDS)
def test_triangle_count(spark, name, rows):
    assert triangle_count(_edges_df(spark, rows)) == triangles_exact(rows)


def test_triangles_per_vertex(spark):
    rows = [("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 1.0), ("c", "d", 1.0)]
    got = {r["node_id"]: r["triangles"] for r in triangles_per_vertex(_edges_df(spark, rows)).collect()}
    assert got == {"a": 1, "b": 1, "c": 1}
