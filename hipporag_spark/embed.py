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
    """Scalar reference implementation — the semantics contract.  The
    vectorized :func:`embed_batch` must stay bit-identical to this (see
    tests/test_knn.py::test_embed_batch_matches_scalar); the DuckDB
    ``retrieve`` oracle depends on it."""
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


# packed-gram → bucket memo.  A 3-gram's code points each fit in 21 bits
# (Unicode max 0x10FFFF), so the gram packs losslessly into one int64:
# c0 | c1<<21 | c2<<42.  The gram universe is corpus-bounded (identifier
# alphabet 3-grams ≤ 37³ ≈ 5×10⁴), so after warm-up the md5 cost of
# encoding drops to zero.  Per-dim dicts; entry counts capped so a
# pathological binary-ish corpus can't grow them unboundedly.
_PACK_SHIFT = 21
_BUCKET_CACHE: dict = {}
_BUCKET_CACHE_MAX = 1 << 20


def _bucket_of_packed(packed: int, dim: int, width: int = _NGRAM) -> int:
    g = "".join(
        chr((packed >> (_PACK_SHIFT * k)) & ((1 << _PACK_SHIFT) - 1))
        for k in range(width))
    return int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "little") % dim


def embed_batch(texts, dim: int = DEFAULT_DIM) -> np.ndarray:
    """Vectorized batch featurizer, bit-identical to :func:`_embed_one`.

    The round-2 version called ``hashlib.md5`` once per gram per string
    inside a Python loop — the slowest per-byte code on the
    ``graph_build``/``retrieve`` hot path (VERDICT r2 "What's wrong" #3).
    This version extracts all grams in numpy (utf-32 code points →
    ``sliding_window_view`` → one packed int64 per gram), deduplicates
    them across the whole Arrow batch with ``np.unique``, md5-hashes each
    UNIQUE gram once through a persistent memo, and accumulates counts
    with one ``bincount``.  Counts are exact integers in float64, so
    accumulation order is irrelevant and the result is bitwise equal to
    the scalar path."""
    padded = [f" {s if s is not None else ''} " for s in texts]
    n = len(padded)
    out = np.zeros((n, dim), dtype=np.float64)
    if n == 0:
        return out.astype(np.float32)
    cache = _BUCKET_CACHE.setdefault(dim, {})
    lens = np.fromiter((len(t) for t in padded), dtype=np.int64, count=n)
    ends = np.cumsum(lens)
    cp = np.frombuffer("".join(padded).encode("utf-32-le"), dtype=np.uint32)
    if len(cp) >= _NGRAM:
        packed = cp[: len(cp) - _NGRAM + 1].astype(np.int64)
        for k in range(1, _NGRAM):
            packed |= cp[k : len(cp) - _NGRAM + 1 + k].astype(np.int64) << (_PACK_SHIFT * k)
        pos = np.arange(len(packed))
        owner = np.searchsorted(ends, pos, side="right")
        valid = pos + _NGRAM <= ends[owner]
        vpacked = packed[valid]
        vown = owner[valid]
        if len(vpacked):
            uniq, inv = np.unique(vpacked, return_inverse=True)

            def _lookup(u):
                b = cache.get(u)
                if b is None:
                    b = _bucket_of_packed(u, dim)
                    if len(cache) < _BUCKET_CACHE_MAX:
                        cache[u] = b
                return b

            ubuckets = np.fromiter(
                map(_lookup, uniq.tolist()), dtype=np.int64, count=len(uniq))
            flat = np.bincount(vown * dim + ubuckets[inv], minlength=n * dim)
            out += flat.reshape(n, dim)
    # strings shorter than the gram width (only s == "" → t == "  "):
    # the scalar path emits the whole short string as the single gram
    for i in np.nonzero(lens < _NGRAM)[0]:
        g = padded[i]
        out[i, int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "little") % dim] += 1.0
    norms = np.linalg.norm(out, axis=1)
    nz = norms > 0
    out[nz] /= norms[nz, None]
    return out.astype(np.float32)


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
