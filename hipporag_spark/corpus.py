"""Source-code corpus input table ``(repo, path, commit, lang, content)``.

Per ``BASELINE.json`` ``input_hint`` the engine's primary input is an
Iceberg table of source-code repositories with exactly these columns.  Two
deterministic ways to obtain one in the sandbox (no external data):

- :func:`corpus_from_documents` derives it from the driver-provided
  ``documents`` parquet (``doc_id, text, lang, source, n_chars``) so the
  DuckDB correctness oracle can reproduce the same derivation in SQL.
- :func:`synthesize_corpus` generates an arbitrary-size corpus with a
  Zipf-distributed identifier vocabulary (hub identifiers like ``main`` /
  ``init`` appear in most files, exercising skew handling) — used for the
  scale benchmarks.

Both preserve the per-row invariant ``sha256(content)`` through every
downstream stage (checked by ``tests/test_extract.py``).

Reference analog: the passage corpus ``{"title","text","idx"}`` loaded at
``/root/reference/main.py:92-96``; content-addressed ids computed at
``/root/reference/src/hipporag/utils/misc_utils.py:117-128`` (md5 there,
sha256 here per input_hint).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]

# Closed identifier vocabulary for synthesis: ~500 identifiers built from
# stems × suffixes; the first few stems are "hub" identifiers drawn with
# Zipf-like probability so a handful of tokens appear in most files.
_STEMS = [
    "main", "init", "util", "data", "node", "edge", "graph", "index",
    "query", "parse", "token", "hash", "merge", "join", "scan", "sort",
    "read", "write", "cache", "batch", "shard", "block", "frame", "table",
    "plan", "exec", "task", "pool", "lock", "heap", "list", "tree",
    "map", "set", "queue", "stack", "ring", "slot", "page", "file",
    "path", "repo", "base", "core", "meta", "spec", "conf", "args",
    "ctx", "env",
]
_SUFFIXES = ["", "_id", "_ptr", "_len", "_buf", "_idx", "_cnt", "_key", "_val", "_fn"]
_LANGS = ["py", "java", "c", "go", "js"]


def vocabulary() -> list[str]:
    """The closed identifier vocabulary (500 identifiers, deterministic)."""
    return [s + x for s in _STEMS for x in _SUFFIXES]


def synthesize_corpus(
    spark: SparkSession,
    n_files: int,
    seed: int = 42,
    tokens_per_file: int = 40,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic synthetic corpus of ``n_files`` source files.

    Generated distributively with ``mapInPandas`` over ``spark.range`` —
    no driver-side materialization, so it scales to any ``n_files``.
    Identifier choice is a seeded per-file hash draw over a Zipf-ish rank
    distribution (rank r has weight 1/(r+1)), giving the hub-skew the
    north_rule requires the engine to handle.
    """
    vocab = vocabulary()
    nv = len(vocab)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                rng = np.random.default_rng(seed * 1_000_003 + int(i))
                # Zipf-ish: P(rank r) ∝ 1/(r+1)
                w = 1.0 / (np.arange(nv) + 1.0)
                w /= w.sum()
                toks = rng.choice(nv, size=tokens_per_file, p=w)
                content = " ".join(vocab[t] for t in toks)
                lang = _LANGS[int(i) % len(_LANGS)]
                rows.append(
                    (
                        f"org{int(i) % 7}/repo{int(i) % 97}",
                        f"src/mod{int(i) % 13}/file{int(i)}.{lang}",
                        lang,
                        content,
                    )
                )
            out = pd.DataFrame(rows, columns=["repo", "path", "lang", "content"])
            yield out

    parts = partitions or max(spark.sparkContext.defaultParallelism, 8)
    base = spark.range(0, n_files, numPartitions=parts)
    df = base.mapInPandas(gen, schema="repo string, path string, lang string, content string")
    return df.select(
        "repo",
        "path",
        F.substring(F.sha2(F.concat_ws("/", "repo", "path"), 256), 1, 40).alias("commit"),
        "lang",
        "content",
    )


def corpus_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the corpus table from the driver's ``documents`` parquet.

    Deterministic column mapping (mirrored exactly by the DuckDB oracle SQL
    in ``__spark_entry__.py``): each document is one source file.

    The driver parquet is a single file, which Spark reads as ONE input
    partition — the downstream regex tokenization would run on one core
    (it was 9 of graph_build's 11 s at sf0.1).  Repartition to the
    session's parallelism right after the scan; results are
    partitioning-invariant.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs = docs.repartition(max(spark.sparkContext.defaultParallelism, 8))
    return docs.select(
        F.concat(F.lit("org"), (F.col("doc_id") % 7).cast("string")).alias("repo"),
        F.concat(F.lit("src/f"), F.col("doc_id").cast("string"), F.lit("."), F.col("lang")).alias("path"),
        F.substring(
            F.sha2(
                F.concat(
                    F.lit("org"), (F.col("doc_id") % 7).cast("string"),
                    F.lit("/src/f"), F.col("doc_id").cast("string"), F.lit("."), F.col("lang"),
                ),
                256,
            ),
            1,
            40,
        ).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )


def corpus_from_json(spark: SparkSession, path: str) -> DataFrame:
    """Load a corpus in the reference's own JSON shape — an array of
    ``{"title": ..., "text": ...}`` objects, each document rendered as
    ``"title\\ntext"`` (reference ``main.py:92-96``) — into the engine's
    corpus table ``(repo, path, commit, lang, content)``.

    Lets a reference user point their existing ``*_corpus.json`` files at
    this engine unchanged.  Provenance columns are synthesized
    deterministically: ``repo`` = source file name, ``path`` = title,
    ``commit`` = sha of the rendered content (so the engine's
    content-hash invariants hold row-for-row), ``lang`` = ``"text"``.

    ``multiLine`` is set because the reference files are one JSON array
    per file; at scale prefer JSONL (one object per line), which Spark
    splits across executors — this reader accepts both.
    """
    df = spark.read.option("multiLine", "true").json(path)
    content = F.concat_ws("\n", F.col("title"), F.col("text"))
    return df.select(
        F.element_at(F.split(F.input_file_name(), "/"), -1).alias("repo"),
        F.col("title").alias("path"),
        F.substring(F.sha2(content, 256), 1, 40).alias("commit"),
        F.lit("text").alias("lang"),
        content.alias("content"),
    )
