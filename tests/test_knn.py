"""Exact blocked KNN vs numpy brute force; synonym-edge acceptance
semantics (threshold / self-exclusion / eligibility / cap — SURVEY.md
§1.4 item 6)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hipporag_spark.embed import embed_batch, with_embeddings
from hipporag_spark.knn import cosine_topk, synonym_edges


def test_cosine_topk_matches_bruteforce(spark):
    rng = np.random.default_rng(3)
    q = rng.normal(size=(17, 16)).astype(np.float32)
    kv = rng.normal(size=(53, 16)).astype(np.float32)
    qdf = spark.createDataFrame(
        [(f"q{i:02d}", v.tolist()) for i, v in enumerate(q)], "id string, embedding array<float>"
    )
    kdf = spark.createDataFrame(
        [(f"k{i:02d}", v.tolist()) for i, v in enumerate(kv)], "id string, embedding array<float>"
    )
    got = cosine_topk(spark, qdf, kdf, k=5, tile_size=7, n_blocks=4).collect()
    q64, k64 = q.astype(np.float64), kv.astype(np.float64)
    qs = q64 / np.linalg.norm(q64, axis=1, keepdims=True)
    ks = k64 / np.linalg.norm(k64, axis=1, keepdims=True)
    sims = qs @ ks.T
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["key_id"], r["score"]))
    for i in range(17):
        mine = sorted(by_q[f"q{i:02d}"])
        assert len(mine) == 5
        want_order = np.argsort(-sims[i], kind="stable")[:5]
        for (rank, key_id, score), wj in zip(mine, want_order):
            assert abs(score - sims[i, wj]) < 1e-9
            assert key_id == f"k{wj:02d}"


def test_synonym_edges_semantics(spark):
    ents = spark.createDataFrame(
        [("e-main", "main"), ("e-main2", "main line"), ("e-ab", "ab"), ("e-zzz", "zzz qqq vvv")],
        "entity_id string, phrase string",
    )
    ents = with_embeddings(ents, "phrase")
    edges = synonym_edges(spark, ents, topk=10, threshold=0.5).collect()
    pairs = {(r["src"], r["dst"]): r for r in edges}
    # 'ab' has ≤2 alnum chars → not eligible as a query (HippoRAG.py:861)
    assert not any(s == "e-ab" for s, _ in pairs)
    # no self edges (HippoRAG.py:871)
    assert not any(s == d for s, d in pairs)
    # main ↔ "main line" share n-grams: mutual edges above a loose threshold
    assert ("e-main", "e-main2") in pairs
    for r in edges:
        assert r["relation"] == "synonym"
        assert r["weight"] >= 0.5


def test_embed_deterministic_and_normalized():
    a = embed_batch(["main", "main", "other"])
    assert np.allclose(a[0], a[1])
    assert not np.allclose(a[0], a[2])
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0, atol=1e-6)


def test_embed_batch_matches_scalar():
    """The vectorized featurizer must stay BIT-identical to the scalar
    reference path — the DuckDB retrieve/synonym oracles encode the same
    md5-bucket semantics (VERDICT r2 item 5 vectorization)."""
    import numpy as np

    from hipporag_spark.embed import _embed_one, embed_batch

    texts = [
        "", "a", "ab", "alpha", "alpha_beta", "ALPHA beta-9",
        "def scan(x): return x+1", "日本語テキスト", " spaces  inside ",
        "x" * 500, "ident00042 ident00043 " * 40,
    ]
    for dim in (16, 128, 100):  # 100 does NOT divide 256 — generic-h path
        got = embed_batch(texts, dim)
        want = np.stack([_embed_one(t, dim) for t in texts])
        assert got.dtype == np.float32 and got.shape == want.shape
        assert np.array_equal(got, want), f"dim={dim}"
