"""Retrieval / QA evaluation operators (SURVEY.md §2.4 A8/A9).

Reference: ``/root/reference/src/hipporag/evaluation/retrieval_eval.py:24-74``
(Recall@k: per-example recall over gold docs, then mean over examples) and
``qa_eval.py:19-95`` (normalize answers → per-example max EM / token-F1
over gold answers, then mean).  Answer normalization mirrors
``eval_utils.py:4-31``: lowercase, strip punctuation, drop articles
(a/an/the), collapse whitespace.

Spark mapping: per-example aggregates are ``groupBy(query_id)`` with
map-side combine; the final mean is a single-row aggregate.  Token-F1
needs multiset token overlap — a Catalyst expression over split arrays
(``aggregate`` over the distinct-token union), no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "recall_at_k", "normalize_answer_col", "qa_exact_match", "qa_token_f1",
    "qa_contexts", "extract_answer_col", "rag_qa",
]


def recall_at_k(
    retrieved: DataFrame,   # (query_id, doc_id, rank)
    gold: DataFrame,        # (query_id, doc_id)
    ks: list[int] = (1, 2, 5, 10, 20, 50, 100, 200),
) -> DataFrame:
    """Pooled Recall@k for each k: one row ``(k, recall)``.

    Per example: |gold ∩ top-k| / |gold|; pooled: mean over examples
    (reference pooling at ``retrieval_eval.py:58-74``).
    """
    gold_sizes = gold.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_gold"))
    hits = retrieved.join(gold, ["query_id", "doc_id"], "left_semi")
    out = []
    for k in ks:
        per_q = (
            hits.where(F.col("rank") <= k)
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n_hit"))
        )
        pooled = (
            gold_sizes.join(per_q, "query_id", "left")
            .select(
                (F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_gold")).alias("r")
            )
            .agg(F.avg("r").alias("recall"))
            .withColumn("k", F.lit(k))
        )
        out.append(pooled.select("k", "recall"))
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res


def normalize_answer_col(col):
    """Reference ``normalize_answer`` (``eval_utils.py:4-31``): lower →
    strip punctuation → drop articles → collapse whitespace."""
    lowered = F.lower(col)
    no_punct = F.regexp_replace(lowered, "[^a-z0-9 ]", " ")
    no_articles = F.regexp_replace(no_punct, "\\b(a|an|the)\\b", " ")
    return F.trim(F.regexp_replace(no_articles, " +", " "))


def _toks(col):
    return F.filter(F.split(normalize_answer_col(col), " "), lambda x: x != F.lit(""))


def qa_exact_match(
    answers: DataFrame,  # (query_id, answer)
    golds: DataFrame,    # (query_id, gold_answer) — may have several per query
) -> DataFrame:
    """Pooled EM: per query the max over golds of exact normalized match,
    then mean (reference ``qa_eval.py:19-47``)."""
    j = answers.join(golds, "query_id").select(
        "query_id",
        (normalize_answer_col(F.col("answer"))
         == normalize_answer_col(F.col("gold_answer"))).cast("double").alias("em"),
    )
    return (
        j.groupBy("query_id").agg(F.max("em").alias("em"))
        .agg(F.avg("em").alias("exact_match"))
    )


def qa_token_f1(answers: DataFrame, golds: DataFrame) -> DataFrame:
    """Pooled token-F1: per (answer, gold), multiset token overlap →
    precision/recall/F1; per query max over golds; then mean
    (reference ``qa_eval.py:55-95``).  Pure Catalyst: overlap = Σ over
    distinct tokens of min(count_in_answer, count_in_gold).
    """
    a = _toks(F.col("answer"))
    g = _toks(F.col("gold_answer"))

    def count_in(arr, tok):
        return F.size(F.filter(arr, lambda x: x == tok))

    overlap = F.aggregate(
        F.array_distinct(a),
        F.lit(0),
        lambda acc, tok: acc + F.least(count_in(a, tok), count_in(g, tok)),
    )
    j = answers.join(golds, "query_id").select(
        "query_id",
        overlap.cast("double").alias("ov"),
        F.size(a).cast("double").alias("na"),
        F.size(g).cast("double").alias("ng"),
    )
    f1 = (
        F.when((F.col("ov") == 0) | (F.col("na") == 0) | (F.col("ng") == 0), F.lit(0.0))
        .otherwise(
            2.0 * (F.col("ov") / F.col("na")) * (F.col("ov") / F.col("ng"))
            / (F.col("ov") / F.col("na") + F.col("ov") / F.col("ng"))
        )
    )
    return (
        j.withColumn("f1", f1)
        .groupBy("query_id").agg(F.max("f1").alias("f1"))
        .agg(F.avg("f1").alias("token_f1"))
    )


# --------------------------------------------------------------------------
# QA readout (reference HippoRAG.qa, ``HippoRAG.py:667-724``) — the
# deterministic half of rag_qa: context assembly and answer-string
# post-processing as DataFrame ops, with the LLM call a pluggable fn
# (the same hook pattern as ``retrieve.rerank_fn``).
# --------------------------------------------------------------------------

def qa_contexts(
    retrieved: DataFrame,   # (query_id, doc_id, rank)
    passages: DataFrame,    # (doc_id, text)
    questions: DataFrame,   # (query_id, question)
    qa_top_k: int = 5,
) -> DataFrame:
    """Per-query QA reading prompt: ``(query_id, question, n_passages,
    prompt)``.

    Reference ``HippoRAG.py:688-696``: take the top ``qa_top_k`` retrieved
    docs in rank order, render each as ``'Wikipedia Title: {passage}\\n\\n'``,
    concatenate, then append ``'Question: {q}\\nThought: '``.  Queries whose
    retrieval came back empty still get a (docless) prompt, as in the
    reference's loop over an empty ``docs`` list.

    Spark shape: one ``groupBy(query_id)`` over the rank-filtered
    (retrieved ⋈ passages) join — ``array_sort`` over
    ``collect_list(struct(rank, text))`` makes the concatenation order
    deterministic regardless of partitioning; the per-query passage count
    is bounded by ``qa_top_k``, so collect_list cannot blow up a task.
    """
    top = (
        retrieved.where(F.col("rank") <= qa_top_k)
        .join(passages, "doc_id")
        .groupBy("query_id")
        .agg(F.array_sort(F.collect_list(F.struct("rank", "text"))).alias("ps"))
        .select(
            "query_id",
            F.size("ps").alias("n_passages"),
            F.concat_ws(
                "",
                F.transform(
                    "ps", lambda p: F.concat(
                        F.lit("Wikipedia Title: "), p["text"], F.lit("\n\n"))
                ),
            ).alias("ctx"),
        )
    )
    return (
        questions.join(top, "query_id", "left")
        .select(
            "query_id",
            "question",
            F.coalesce(F.col("n_passages"), F.lit(0)).alias("n_passages"),
            F.concat(
                F.coalesce(F.col("ctx"), F.lit("")),
                F.lit("Question: "), F.col("question"), F.lit("\nThought: "),
            ).alias("prompt"),
        )
    )


def extract_answer_col(response_col, marker: str = "Answer:"):
    """Predicted answer from a raw reader response (reference
    ``HippoRAG.py:717-721``): the segment after the FIRST ``marker``
    (``split(marker)[1]``), whitespace-stripped; if the marker is absent
    the whole response is the answer (the reference's except-path)."""
    parts = F.split(response_col, marker)
    second = F.element_at(parts, 2)
    stripped = F.regexp_replace(F.regexp_replace(second, r"^\s+", ""), r"\s+$", "")
    return F.when(F.size(parts) >= 2, stripped).otherwise(response_col)


def _default_reader(contexts: DataFrame) -> DataFrame:
    """Deterministic stand-in for the LLM reader: answers with the
    top-ranked passage's text (extractive-oracle readout).  This is the
    plug point for a real model — swap via ``rag_qa(qa_fn=...)``; the
    response format ('Thought: ...\\nAnswer: ...') matches what the
    reference parses."""
    first_seg = F.substring_index(F.col("prompt"), "\n\n", 1)
    return contexts.select(
        "query_id",
        F.concat(
            F.lit("Thought: read "), F.col("n_passages").cast("string"),
            F.lit(" passages.\nAnswer: "),
            # first passage = first '\n\n'-segment minus the 17-char
            # 'Wikipedia Title: ' prefix (positional, so a passage that
            # itself contains the prefix string cannot skew the cut)
            F.when(F.col("n_passages") > 0, F.substr(first_seg, F.lit(18)))
            .otherwise(F.lit("")),
        ).alias("response"),
    )


def rag_qa(
    retrieved: DataFrame,
    passages: DataFrame,
    questions: DataFrame,
    golds: DataFrame | None = None,   # (query_id, gold_answer)
    qa_fn=None,
    qa_top_k: int = 5,
):
    """The full QA readout loop as dataflow (reference ``rag_qa``,
    ``HippoRAG.py:448-520``): contexts → reader (``qa_fn``, default
    deterministic extractive stub) → answer extraction → optional pooled
    EM / token-F1 against golds.

    Returns ``(answers_df, metrics_df_or_None)`` where ``answers_df`` is
    ``(query_id, answer)`` and metrics is one row ``(exact_match,
    token_f1)`` when ``golds`` is given.
    """
    ctx = qa_contexts(retrieved, passages, questions, qa_top_k=qa_top_k)
    responses = (qa_fn or _default_reader)(ctx)
    answers = responses.select(
        "query_id", extract_answer_col(F.col("response")).alias("answer"))
    if golds is None:
        return answers, None
    em = qa_exact_match(answers, golds)
    f1 = qa_token_f1(answers, golds)
    return answers, em.crossJoin(f1)
