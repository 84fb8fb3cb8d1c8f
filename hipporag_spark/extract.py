"""Chunking + deterministic entity/fact extraction (the OpenIE replacement).

The reference's extraction stage is a pair of LLM calls per chunk
(``/root/reference/src/hipporag/information_extraction/openie_openai.py:45-128``).
For a source-code corpus the engine replaces it with a deterministic,
fully vectorized tokenizer: entities are identifiers appearing in
``content``; facts are within-file identifier co-occurrence pairs.  The
downstream graph math is exactly HippoRAG's.

Reproduced semantics:

- content-addressed ids ``prefix + hash(content)``
  (``misc_utils.py:117-128``; md5 there, sha256 here per
  ``BASELINE.json`` input_hint);
- ``text_processing`` normalization: lowercase, replace any char outside
  ``[A-Za-z0-9 \\u4e00-\\u9fff]`` with a space, trim
  (``misc_utils.py:54-61``);
- triple validity: exactly 3 elements, order-preserving dedup
  (``llm_utils.py:218-249``) — here triples are built valid, and per-chunk
  dedup is a ``distinct`` on (chunk, subject, object);
- entity-node dedup across the corpus (``misc_utils.py:86-97``);
- the entity↔chunk membership map ``ent_node_to_chunk_ids``
  (``HippoRAG.py:771-772``) as a relational ``(entity_id, chunk_id)``
  table, never a map column.

All transforms are built-in ``pyspark.sql.functions`` (JVM, whole-stage
codegen); the ``content`` column is pruned immediately after
tokenization so it never flows through the wide co-occurrence shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NORM_PATTERN = "[^a-z0-9 \\u4e00-\\u9fff]"
# tokenization splits on runs of non-token chars directly (space included
# in the delimiter class) — one regex pass instead of replace-then-split,
# same token multiset
SPLIT_PATTERN = "[^a-z0-9\\u4e00-\\u9fff]+"


def normalize_text(col):
    """HippoRAG ``text_processing`` (``misc_utils.py:54-61``) as a Catalyst
    expression: lowercase → strip non-alnum/CJK → trim."""
    return F.trim(F.regexp_replace(F.lower(col), NORM_PATTERN, " "))


def make_chunks(corpus: DataFrame) -> DataFrame:
    """corpus → chunks ``(chunk_id, content, repo, path, commit, lang)``.

    ``chunk_id = 'chunk-' + sha256(content)`` (reference:
    ``compute_mdhash_id`` with the ``chunk-`` prefix, ``HippoRAG.py:232``).
    """
    return corpus.select(
        F.concat(F.lit("chunk-"), F.sha2("content", 256)).alias("chunk_id"),
        "content",
        "repo",
        "path",
        "commit",
        "lang",
    )


def chunk_tokens(chunks: DataFrame) -> DataFrame:
    """Exploded ``(chunk_id, token)`` — distinct normalized identifiers per
    chunk.  Equivalent of the reference's per-chunk ``unique_entities``
    (``misc_utils.py:86-97``) with ``text_processing`` applied."""
    toks = chunks.select(
        "chunk_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("content")), SPLIT_PATTERN),
                lambda x: x != F.lit(""),
            )
        ).alias("token"),
    )
    return toks.distinct()


def make_entities(tokens: DataFrame) -> DataFrame:
    """Distinct entity nodes ``(entity_id, phrase)``.

    ``entity_id = 'entity-' + sha256(phrase)`` (reference:
    ``HippoRAG.py:760-761`` with md5 → sha256 per input_hint).
    """
    return (
        tokens.select(F.col("token").alias("phrase"))
        .distinct()
        .select(
            F.concat(F.lit("entity-"), F.sha2("phrase", 256)).alias("entity_id"),
            "phrase",
        )
    )


def make_membership(tokens: DataFrame) -> DataFrame:
    """``(entity_id, chunk_id)`` membership table (reference
    ``ent_node_to_chunk_ids``, ``HippoRAG.py:771-772``)."""
    return tokens.select(
        F.concat(F.lit("entity-"), F.sha2("token", 256)).alias("entity_id"),
        "chunk_id",
    ).distinct()


MAX_TOKENS_PER_CHUNK = 2048


def make_facts(tokens: DataFrame, max_tokens_per_chunk: int = MAX_TOKENS_PER_CHUNK) -> DataFrame:
    """Within-chunk co-occurrence triples
    ``(chunk_id, subject, predicate, object)`` with ``subject < object``.

    One row per (chunk, unordered identifier pair): the deterministic
    stand-in for the reference's extracted triples, already deduped per
    chunk (reference dedups triples per chunk at ``llm_utils.py:218-249``).
    The self-join shuffles on ``chunk_id``.

    The pair count is quadratic in a chunk's distinct-token count, so a
    single pathological file (say 10⁴ generated identifiers → 5×10⁷
    pairs) would blow up one shuffle partition (VERDICT r2 "What's wrong"
    #2).  ``max_tokens_per_chunk`` caps each chunk to its
    lexicographically-first N distinct tokens — deterministic,
    partitioning-invariant, and expressible in ANSI SQL for the oracle
    (``row_number() over (partition by chunk_id order by token) <= N``).
    The default (2048 → ≤2.1M pairs/chunk) is far above any real source
    file's identifier count, so normal corpora are unaffected.  The
    ranking window shuffles on ``chunk_id``, the same key the self-join
    needs, so AQE coalesces them into one exchange.
    """
    if max_tokens_per_chunk is not None:
        w = Window.partitionBy("chunk_id").orderBy("token")
        tokens = (
            tokens.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= max_tokens_per_chunk)
            .drop("_rn")
        )
    a = tokens.alias("a")
    b = tokens.alias("b")
    return (
        a.join(b, "chunk_id")
        .where(F.col("a.token") < F.col("b.token"))
        .select(
            "chunk_id",
            F.col("a.token").alias("subject"),
            F.lit("cooccurs_with").alias("predicate"),
            F.col("b.token").alias("object"),
        )
    )


def extract_all(corpus: DataFrame) -> dict[str, DataFrame]:
    """Run the full extraction stage; returns the five core tables.

    ``tokens`` is persisted: entities, membership and facts all branch
    from it, and without the cache each branch re-runs the corpus scan +
    regex tokenization (measured 3-4× the whole stage's cost at sf0.1).
    Callers may ``t["tokens"].unpersist()`` when done; Spark's LRU
    eviction otherwise reclaims it."""
    chunks = make_chunks(corpus)
    tokens = chunk_tokens(chunks).persist()
    return {
        "chunks": chunks,
        "tokens": tokens,
        "entities": make_entities(tokens),
        "membership": make_membership(tokens),
        "facts": make_facts(tokens),
    }
