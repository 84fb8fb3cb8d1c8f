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
