"""LLM-responses → extraction tables → graph (reference index() flow,
HippoRAG.py:215-268): the tables_from_llm_responses adapter must produce
extract_all-shaped tables whose build_graph edge weights match the
reference's per-triple node_to_node_stats accumulation
(HippoRAG.py:758-766), with text_processing applied AFTER the raw-triple
dedup so post-normalization duplicates still count twice."""

import pytest
from pyspark.sql import functions as F

from hipporag_spark.graph import build_graph
from hipporag_spark.llmjson import tables_from_llm_responses


@pytest.fixture(scope="module")
def tables(spark):
    chunks = spark.createDataFrame(
        [("chunk-1", "alpha Beta gamma", "r", "p", "c", "py"),
         ("chunk-2", "delta", "r", "p2", "c", "py")],
        "chunk_id string, content string, repo string, path string, "
        "commit string, lang string")
    # chunk-1: "Alpha"/"alpha!" collide only after text_processing ->
    # two rows, edge weight 2 (reference += 1 per triple); plus a
    # truncated generation on chunk-2 repaired down to its first triple
    responses = spark.createDataFrame(
        [("chunk-1",
          '{"triples": [["Alpha", "is", "Beta"], ["alpha!", "IS", "beta"], '
          '["bad"]]}', "stop"),
         ("chunk-2",
          '{"triples": [["delta", "near", "gamma"], ["delta", "x', "length")],
        "chunk_id string, response string, finish_reason string")
    return tables_from_llm_responses(chunks, responses, "response",
                                     "finish_reason")


def test_facts_keep_post_normalization_duplicates(tables):
    rows = sorted(
        (r["chunk_id"], r["subject"], r["predicate"], r["object"])
        for r in tables["facts"].collect())
    assert rows == [
        ("chunk-1", "alpha", "is", "beta"),
        ("chunk-1", "alpha", "is", "beta"),
        ("chunk-2", "delta", "near", "gamma"),
    ]


def test_entities_and_membership(tables):
    phrases = sorted(r["phrase"] for r in tables["entities"].collect())
    assert phrases == ["alpha", "beta", "delta", "gamma"]
    n_members = tables["membership"].count()
    # chunk-1: alpha, beta; chunk-2: delta, gamma
    assert n_members == 4


def test_graph_weights_match_reference_accumulation(tables):
    nodes, edges = build_graph(tables)
    eid = lambda p: "entity-" + __import__("hashlib").sha256(
        p.encode()).hexdigest()
    w = {(r["src"], r["dst"]): r["weight"]
         for r in edges.where(F.col("relation") == "fact").collect()}
    # the duplicated (post-normalization) triple counts twice, both ways
    assert w[(eid("alpha"), eid("beta"))] == 2.0
    assert w[(eid("beta"), eid("alpha"))] == 2.0
    assert w[(eid("delta"), eid("gamma"))] == 1.0
    names = {r["node_id"] for r in nodes.collect()}
    assert eid("alpha") in names and "chunk-1" in names
