"""Deterministic embedding featurizer (the neural-encoder replacement).

The reference encodes phrases with an external embedding service
(``/root/reference/src/hipporag/embedding_model/*``, float32 vectors per
``embedding_store.py:152,169-178``).  The engine substitutes a
deterministic hashed character-n-gram featurizer so KNN / threshold /
top-k semantics stay exactly testable with no model or network:

    vec(s)[h(g) % dim] += 1  for each char-3-gram g of " s ",  then L2-norm

Similar identifiers (``main`` / ``main_id``) share most n-grams → high
cosine; unrelated ones are near-orthogonal.  Emitted as
``array<float>`` (float32) matching the reference store schema.

``h`` is the first 8 bytes of ``md5(gram)`` little-endian — chosen so the
bucket index is SQL-expressible for the DuckDB correctness oracle: with
``dim`` dividing 256, ``h % dim`` equals ``first_md5_byte % dim``, i.e.
``('0x' || substr(md5(g), 1, 2))::INT % dim`` (md5 hex is big-endian per
byte, so hex chars 1-2 are exactly the little-endian integer's low byte).

Implemented as an Arrow-batched ``pandas_udf`` (SURVEY.md §2.8) — the
loop over strings is batch-local Python on the executor, never a
row-at-a-time Spark UDF.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

DEFAULT_DIM = 128
_NGRAM = 3


def _embed_one(s: str, dim: int) -> np.ndarray:
    v = np.zeros(dim, dtype=np.float64)
    t = f" {s} "
    for i in range(max(len(t) - _NGRAM + 1, 1)):
        g = t[i : i + _NGRAM]
        h = int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "little")
        v[h % dim] += 1.0
    n = np.linalg.norm(v)
    if n > 0:
        v /= n
    return v.astype(np.float32)


def embed_batch(texts, dim: int = DEFAULT_DIM) -> np.ndarray:
    """numpy batch version (used by kernels and tests)."""
    return np.stack([_embed_one(str(s), dim) for s in texts])


def embedding_udf(dim: int = DEFAULT_DIM):
    @F.pandas_udf(ArrayType(FloatType()))
    def _udf(s: pd.Series) -> pd.Series:
        mat = embed_batch(s.fillna("").tolist(), dim)
        return pd.Series(list(mat))

    return _udf


def with_embeddings(df, text_col: str, out_col: str = "embedding", dim: int = DEFAULT_DIM):
    """Add a deterministic embedding column (``hash_id, content, embedding``
    store shape, reference ``embedding_store.py:109-120``)."""
    return df.withColumn(out_col, embedding_udf(dim)(F.col(text_col)))
