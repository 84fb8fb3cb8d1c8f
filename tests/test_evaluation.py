"""Evaluation operators vs hand-computed values (reference semantics from
/root/reference/src/hipporag/evaluation/)."""

import pytest
from pyspark.sql import functions as F

from hipporag_spark.evaluation import (
    normalize_answer_col,
    qa_exact_match,
    qa_token_f1,
    recall_at_k,
)


def test_recall_at_k(spark):
    retrieved = spark.createDataFrame(
        [("q0", "d1", 1), ("q0", "d2", 2), ("q0", "d3", 3),
         ("q1", "d9", 1), ("q1", "d1", 2)],
        "query_id string, doc_id string, rank int",
    )
    gold = spark.createDataFrame(
        [("q0", "d1"), ("q0", "d3"), ("q1", "d1")],
        "query_id string, doc_id string",
    )
    out = {r["k"]: r["recall"] for r in recall_at_k(retrieved, gold, ks=[1, 2, 3]).collect()}
    # k=1: q0 hits d1 → 1/2; q1 top1=d9 → 0 → mean 0.25
    assert out[1] == pytest.approx(0.25)
    # k=2: q0 1/2, q1 1/1 → 0.75
    assert out[2] == pytest.approx(0.75)
    # k=3: q0 2/2, q1 1/1 → 1.0
    assert out[3] == pytest.approx(1.0)


def test_normalize_answer(spark):
    df = spark.createDataFrame([("The  Quick, Brown Fox!",)], "s string")
    got = df.select(normalize_answer_col(F.col("s")).alias("n")).first()["n"]
    assert got == "quick brown fox"


def test_exact_match_pooling(spark):
    answers = spark.createDataFrame(
        [("q0", "the Eiffel Tower"), ("q1", "Paris, France")],
        "query_id string, answer string",
    )
    golds = spark.createDataFrame(
        [("q0", "eiffel tower"), ("q0", "tower"), ("q1", "Lyon")],
        "query_id string, gold_answer string",
    )
    em = qa_exact_match(answers, golds).first()["exact_match"]
    assert em == pytest.approx(0.5)  # q0 matches one gold; q1 none


def test_token_f1(spark):
    answers = spark.createDataFrame(
        [("q0", "brown fox fox"), ("q1", "exact answer")],
        "query_id string, answer string",
    )
    golds = spark.createDataFrame(
        [("q0", "the brown fox"), ("q1", "exact answer")],
        "query_id string, gold_answer string",
    )
    f1 = qa_token_f1(answers, golds).first()["token_f1"]
    # q0: answer toks [brown fox fox], gold [brown fox] (article dropped):
    #   overlap = min(1,1)+min(2,1) = 2 → p=2/3, r=1 → f1 = 0.8
    # q1: perfect → 1.0 ; pooled mean = 0.9
    assert f1 == pytest.approx(0.9)


# --------------------------------------------------------------------------
# QA readout (reference HippoRAG.py:667-724)
# --------------------------------------------------------------------------

def _qa_frames(spark):
    retrieved = spark.createDataFrame(
        [("q0", "d1", 1), ("q0", "d2", 2), ("q0", "d3", 3),
         ("q1", "d2", 1)],
        "query_id string, doc_id string, rank int",
    )
    passages = spark.createDataFrame(
        [("d1", "alpha text"), ("d2", "beta text"), ("d3", "gamma text")],
        "doc_id string, text string",
    )
    questions = spark.createDataFrame(
        [("q0", "what is alpha?"), ("q1", "what is beta?"),
         ("q2", "no docs at all?")],
        "query_id string, question string",
    )
    return retrieved, passages, questions


def test_qa_contexts_assembly(spark):
    from hipporag_spark.evaluation import qa_contexts

    retrieved, passages, questions = _qa_frames(spark)
    rows = {r["query_id"]: r for r in
            qa_contexts(retrieved, passages, questions, qa_top_k=2).collect()}
    # rank order, qa_top_k truncation, reference prompt shape
    assert rows["q0"]["n_passages"] == 2
    assert rows["q0"]["prompt"] == (
        "Wikipedia Title: alpha text\n\nWikipedia Title: beta text\n\n"
        "Question: what is alpha?\nThought: "
    )
    # empty retrieval still yields a (docless) prompt, as in the reference
    assert rows["q2"]["n_passages"] == 0
    assert rows["q2"]["prompt"] == "Question: no docs at all?\nThought: "


def test_extract_answer_marker_semantics(spark):
    from hipporag_spark.evaluation import extract_answer_col

    df = spark.createDataFrame(
        [("one", "Thought: x\nAnswer:  Paris \n"),
         ("two", "Answer: a Answer: b"),       # split on FIRST marker
         ("none", "no marker here")],          # fallback: whole response
        "query_id string, response string",
    )
    got = {r["query_id"]: r["ans"] for r in df.select(
        "query_id", extract_answer_col(F.col("response")).alias("ans")
    ).collect()}
    assert got["one"] == "Paris"
    assert got["two"] == "a"        # == python "…".split('Answer:')[1].strip()
    assert got["none"] == "no marker here"


def test_rag_qa_end_to_end(spark):
    from hipporag_spark.evaluation import rag_qa

    retrieved, passages, questions = _qa_frames(spark)
    golds = spark.createDataFrame(
        [("q0", "alpha text"), ("q1", "wrong"), ("q2", "anything")],
        "query_id string, gold_answer string",
    )
    answers, metrics = rag_qa(retrieved, passages, questions, golds=golds)
    a = {r["query_id"]: r["answer"] for r in answers.collect()}
    # default reader answers with the top-ranked passage's text
    assert a["q0"] == "alpha text"
    assert a["q1"] == "beta text"
    assert a["q2"] == ""
    m = metrics.first()
    assert m["exact_match"] == pytest.approx(1.0 / 3.0)


def test_rag_qa_custom_reader_hook(spark):
    from hipporag_spark.evaluation import rag_qa

    retrieved, passages, questions = _qa_frames(spark)

    def reader(ctx):
        return ctx.select(
            "query_id",
            F.concat(F.lit("Answer: custom:"), F.col("query_id")).alias("response"),
        )

    answers, _ = rag_qa(retrieved, passages, questions, qa_fn=reader)
    a = {r["query_id"]: r["answer"] for r in answers.collect()}
    assert a == {"q0": "custom:q0", "q1": "custom:q1", "q2": "custom:q2"}
