"""Edge-construction parity with the reference rules (SURVEY.md §1.4,
FIXTURES.md §4): weight accumulation, both-direction fact rows, overwrite
priority fact→passage→synonym, self-loop drop, endpoint validation,
parallel-edge doubling under symmetrize."""

import hashlib

from pyspark.sql import functions as F

from hipporag_spark.extract import extract_all
from hipporag_spark.graph import (
    build_graph,
    fact_edges,
    merge_edges,
    symmetrize,
    validate_edges,
)


def _eid(phrase: str) -> str:
    return "entity-" + hashlib.sha256(phrase.encode()).hexdigest()


def _corpus(spark, contents):
    rows = [
        (f"org{i}", f"src/f{i}.py", f"c{i}", "py", c) for i, c in enumerate(contents)
    ]
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )


def test_fact_edge_weight_is_cooccurrence_count_both_directions(spark):
    # pair (alpha,beta) co-occurs in 2 chunks; (alpha,gamma) in 1
    t = extract_all(_corpus(spark, ["alpha beta", "beta alpha gamma", "alpha delta? delta"]))
    fe = {(r["src"], r["dst"]): r["weight"] for r in fact_edges(t["facts"]).collect()}
    assert fe[(_eid("alpha"), _eid("beta"))] == 2.0
    assert fe[(_eid("beta"), _eid("alpha"))] == 2.0  # HippoRAG.py:763-766 both directions
    assert fe[(_eid("alpha"), _eid("gamma"))] == 1.0
    assert fe[(_eid("alpha"), _eid("delta"))] == 1.0  # per-chunk dedup: 'delta' twice counts once


def test_merge_overwrite_priority(spark):
    # same ordered pair appears as fact(5.0) and synonym(0.9) → synonym wins
    # (HippoRAG.py:876 `=` overwrites); distinct pair keeps fact weight
    fact = spark.createDataFrame(
        [("e1", "e2", 5.0, "fact"), ("e2", "e1", 5.0, "fact"), ("e1", "e3", 2.0, "fact")],
        "src string, dst string, weight double, relation string",
    )
    syn = spark.createDataFrame(
        [("e1", "e2", 0.9, "synonym")],
        "src string, dst string, weight double, relation string",
    )
    got = {(r["src"], r["dst"]): (r["weight"], r["relation"]) for r in merge_edges(fact, syn).collect()}
    assert got[("e1", "e2")] == (0.9, "synonym")
    assert got[("e2", "e1")] == (5.0, "fact")  # only the ordered pair is overwritten
    assert got[("e1", "e3")] == (2.0, "fact")


def test_validate_drops_self_loops_and_unknown_endpoints(spark):
    edges = spark.createDataFrame(
        [("a", "a", 1.0, "fact"), ("a", "b", 1.0, "fact"), ("a", "ghost", 1.0, "fact")],
        "src string, dst string, weight double, relation string",
    )
    nodes = spark.createDataFrame([("a",), ("b",)], "node_id string")
    got = [(r["src"], r["dst"]) for r in validate_edges(edges, nodes).collect()]
    assert got == [("a", "b")]  # HippoRAG.py:1055 self-loop, 1066-1073 endpoint check


def test_symmetrize_doubles_parallel_fact_pairs(spark):
    # fact rows exist in both directions → undirected conductance 2×count
    # (SURVEY.md §1.4 item 4); passage rows are single-direction → 1×
    edges = spark.createDataFrame(
        [("e1", "e2", 3.0, "fact"), ("e2", "e1", 3.0, "fact"), ("chunk1", "e1", 1.0, "passage")],
        "src string, dst string, weight double, relation string",
    )
    got = {(r["src"], r["dst"]): r["weight"] for r in symmetrize(edges).collect()}
    assert got[("e1", "e2")] == 6.0
    assert got[("e2", "e1")] == 6.0
    assert got[("chunk1", "e1")] == 1.0
    assert got[("e1", "chunk1")] == 1.0


def test_build_graph_end_to_end_shape(spark):
    t = extract_all(_corpus(spark, ["alpha beta", "beta gamma"]))
    nodes, edges = build_graph(t)
    by_rel = {r["relation"]: r["cnt"] for r in edges.groupBy("relation").agg(F.count("*").alias("cnt")).collect()}
    # 3 entities: alpha-beta, beta-gamma pairs → 4 directed fact rows
    assert by_rel["fact"] == 4
    # 4 memberships (2 per chunk) → 4 passage rows
    assert by_rel["passage"] == 4
    types = {r["node_type"] for r in nodes.collect()}
    assert types == {"entity", "chunk"}
