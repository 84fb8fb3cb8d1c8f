"""Similarity search: exact baseline vs numpy; ANN recall vs exact."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from hipporag_spark import similarity as sim

N, DIM, NCLUST = 300, 16, 6


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((NCLUST, DIM)) * 3
    vecs = centers[np.arange(N) % NCLUST] + rng.standard_normal((N, DIM))
    pdf = pd.DataFrame(
        {"vec_id": range(N), "embedding": [v.astype(np.float32).tolist() for v in vecs]}
    )
    return spark.createDataFrame(pdf).persist()


@pytest.fixture(scope="module")
def exact(spark, emb):
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return sim.brute_force_topk(q, emb, k=10).toPandas()


def test_brute_force_matches_numpy(spark, emb, exact):
    pdf = emb.orderBy("vec_id").toPandas()
    v = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    cos = vn @ vn.T
    for q in range(10):
        order = np.lexsort((np.arange(N), -cos[q]))[:10]
        got = exact[exact.query_id == q].sort_values("rank")["vec_id"].to_numpy()
        assert (got == order).all(), q


def _recall(approx, exact):
    r = []
    for q in exact["query_id"].unique():
        e = set(exact[exact.query_id == q]["vec_id"])
        a = set(approx[approx.query_id == q]["vec_id"])
        r.append(len(a & e) / len(e))
    return float(np.mean(r))


def test_ivf_recall(spark, emb, exact):
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = sim.ivf_topk(spark, q, emb, k=10, n_centroids=8, nprobe=3).toPandas()
    assert _recall(approx, exact) >= 0.8


def test_lsh_recall(spark, emb, exact):
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = sim.lsh_topk(spark, q, emb, k=10, n_bits=8).toPandas()
    assert _recall(approx, exact) >= 0.6


def test_ivf_scores_are_exact_within_probed(spark, emb, exact):
    """IVF re-ranks exactly: any (query, key) it returns must carry the
    same cosine as the brute-force path."""
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = sim.ivf_topk(spark, q, emb, k=10, n_centroids=8, nprobe=3).toPandas()
    ex = exact.set_index(["query_id", "vec_id"])["cos"]
    for r in approx.itertuples():
        if (r.query_id, r.vec_id) in ex.index:
            assert r.cos == pytest.approx(ex.loc[(r.query_id, r.vec_id)], abs=1e-12)


def test_local_train_parity_with_distributed(spark, emb):
    """The driver-numpy Lloyd fast path (keys ≤ local_train_limit) must
    agree with the distributed DataFrame Lloyd loop: same seeds (both use
    the distributed md5 top-k), centroids equal to fp summation order,
    and — the property the IVF layout actually depends on — identical
    bucket assignments."""
    keys = emb.select("vec_id", "embedding")
    local = sim.train_centroids(spark, keys, n_centroids=8)  # N=300 ≤ limit
    dist = sim.train_centroids(spark, keys, n_centroids=8, local_train_limit=0)

    lp = local.orderBy("centroid_id").toPandas()
    dp = dist.orderBy("centroid_id").toPandas()
    lc = np.stack(lp["centroid"].to_numpy())
    dc = np.stack(dp["centroid"].to_numpy())
    assert lc.shape == dc.shape == (8, DIM)
    np.testing.assert_allclose(lc, dc, atol=1e-9)

    la = {r["vec_id"]: r["centroid_id"]
          for r in sim._assign(keys, local).collect()}
    da = {r["vec_id"]: r["centroid_id"]
          for r in sim._assign(keys, dist).collect()}
    assert la == da


def test_persisted_ivf_index_matches_inline(spark, tmp_path):
    """build_ivf_index + ivf_topk_from_index ≡ ivf_topk with the same
    trained centroids — the persisted layout changes the physical scan
    (partition-pruned), never the result."""
    from hipporag_spark.similarity import (
        build_ivf_index,
        ivf_topk,
        ivf_topk_from_index,
        train_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    keys = emb.select("vec_id", "embedding")
    q = emb.where("vec_id < 5").select(F.col("vec_id").alias("query_id"), "embedding")

    d = str(tmp_path / "ivf")
    meta = build_ivf_index(spark, keys, d, n_centroids=8)
    assert meta["n_keys"] == keys.count()

    got = {(r["query_id"], r["rank"]): r["vec_id"]
           for r in ivf_topk_from_index(spark, d, q, k=10, nprobe=3).collect()}
    cents = train_centroids(spark, keys, n_centroids=8)
    want = {(r["query_id"], r["rank"]): r["vec_id"]
            for r in ivf_topk(spark, q, keys, k=10, n_centroids=8, nprobe=3,
                              centroids=cents).collect()}
    assert got == want
