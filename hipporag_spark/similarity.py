"""Similarity search over an ``array<float>`` embedding column.

Three strategies, exact → approximate, over the ``embeddings`` table
``(vec_id, embedding, label)``:

- :func:`brute_force_topk`  exact cosine top-k, all-Catalyst (``zip_with``
  + ``aggregate`` higher-order functions in float64 — JVM, no UDF), so it
  has an exact DuckDB oracle.  The Arrow-blocked matmul variant for big
  query batches lives in :func:`hipporag_spark.knn.cosine_topk`.
- :func:`ivf_topk`  IVF: deterministic centroids (seeded spherical
  k-means, Lloyd iterations as DataFrame jobs) → vectors assigned to the
  nearest centroid (one broadcast join) → queries probe the ``nprobe``
  nearest centroid buckets only.  This is the 100 TB path: the scan per
  query touches ``nprobe/n_centroids`` of the data, the centroid table is
  broadcast, and bucket assignment is a write-once layout the table can
  be partitioned by.
- :func:`lsh_topk`  signed-random-projection LSH: ``n_bits`` deterministic
  hyperplanes (seeded numpy, broadcast as array literals) → signature →
  bucket join (optionally multi-probe over Hamming-1 neighbors) → exact
  re-rank inside the candidate set.

Recall of the approximate paths vs :func:`brute_force_topk` is asserted
in ``tests/test_similarity.py``.

The reference's ANN store is ChromaDB/HNSW
(``/root/reference/src/hipporag/chroma_store.py:15-316``); HNSW's pointer
graph does not map to a shared-nothing engine, so the scale paths here
are the standard relational ANN formulations (IVF / SRP-LSH).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

__all__ = ["cosine_expr", "brute_force_topk", "ivf_topk", "lsh_topk",
           "build_ivf_index", "ivf_topk_from_index"]


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine_expr(a, b):
    """Cosine similarity of two array columns as a Catalyst expression
    (float64 accumulation, sequential order — matches DuckDB's
    ``list_cosine_similarity`` on ``DOUBLE[]`` bit-for-bit in practice)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    queries: DataFrame,  # (query_id, embedding)
    keys: DataFrame,     # (vec_id, embedding)
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: ``(query_id, vec_id, cos, rank)``.

    Query side is broadcast (query batches are small relative to the
    corpus); the key scan is embarrassingly parallel; the only shuffle is
    the final per-query top-k window.  Ties pinned by ``vec_id`` asc.
    """
    q = queries.select(F.col("query_id"), F.col("embedding").alias("qv"))
    kk = keys.select(F.col("vec_id"), F.col("embedding").alias("kv"))
    scored = F.broadcast(q).crossJoin(kk).select(
        "query_id",
        "vec_id",
        cosine_expr(F.col("qv"), F.col("kv")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def train_centroids(
    spark: SparkSession,
    keys: DataFrame,
    n_centroids: int = 16,
    iters: int = 3,
    seed: int = 7,
    local_train_limit: int = 200_000,
) -> DataFrame:
    """Deterministic spherical k-means centroids ``(centroid_id, centroid)``.

    Init: the ``n_centroids`` vectors whose ``md5(vec_id || seed)`` is
    smallest (a seeded deterministic sample, no RNG state on executors);
    seed selection is always the distributed md5 top-k so it is identical
    across both Lloyd strategies below.

    Two Lloyd strategies, size-routed like every other local fast path in
    this engine (``local_edge_limit`` in :mod:`hipporag_spark.ppr` etc.):

    - **distributed** (default above ``local_train_limit`` key rows):
      each iteration = one broadcast join + one groupBy (vector mean via
      elementwise aggregation; assignment stays distributed).  This is
      the 100 TB path — the key table is never collected.
    - **driver-numpy** (at or below the limit): embeddings are collected
      ONCE and the Lloyd loop runs as vectorized numpy (cosine argmax
      with the same (csim desc, centroid_id asc) tie-break — ``argmax``
      returns the first maximum — and per-cluster mean of the raw
      float64-cast vectors, empty / zero-norm clusters keeping their
      previous centroid, exactly the distributed semantics).  Centroids
      agree with the distributed path to fp summation order (parity test
      at 1e-9 in ``tests/test_similarity.py``); k-means over ≤200k×dim
      float64 is driver-trivial (≤~100 MB at dim 64) and skips
      ``iters``+1 tiny Spark jobs whose cost is pure plan/schedule
      overhead at this size.
    """
    seeds = (
        keys.select("vec_id", "embedding")
        .withColumn("h", F.md5(F.concat(F.col("vec_id").cast("string"), F.lit(f":{seed}"))))
        .orderBy("h")
        .limit(n_centroids)
        .select("embedding")
        .toPandas()
    )
    cent = np.stack(seeds["embedding"].to_numpy()).astype(np.float64)
    cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)

    # limit-probe, not count(): on a 100 TB key table this reads only
    # until local_train_limit+1 rows exist, never the full table
    if local_train_limit > 0 and (
        keys.limit(local_train_limit + 1).count() <= local_train_limit
    ):
        vecs = np.stack(
            keys.select("embedding").toPandas()["embedding"].to_numpy()
        ).astype(np.float64)
        vnorm = np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-300)
        vunit = vecs / vnorm
        for _ in range(iters):
            # cent rows are unit-norm (or kept-previous unit vectors), so
            # cosine = vunit @ cent.T up to the distributed path's
            # explicit |c| division; divide anyway to match degenerate
            # non-unit kept-previous centroids bit-for-bit in intent
            cnorm = np.maximum(np.linalg.norm(cent, axis=1), 1e-300)
            sims = (vunit @ cent.T) / cnorm[None, :]
            a = np.argmax(sims, axis=1)  # first max == lowest centroid_id
            new = cent.copy()
            # len(cent) may be < n_centroids when the key table is tiny
            for j in range(len(cent)):
                mask = a == j
                if mask.any():
                    v = vecs[mask].mean(axis=0)
                    nrm = np.linalg.norm(v)
                    if nrm > 0:
                        new[j] = v / nrm
            cent = new
        return _centroid_df(spark, cent)

    for _ in range(iters):
        cdf = _centroid_df(spark, cent)
        assigned = _assign(keys, cdf).select("vec_id", "centroid_id", "embedding")
        pdf = assigned.groupBy("centroid_id").agg(
            F.array(*[
                F.avg(F.col("embedding")[i].cast("double")).alias(f"c{i}")
                for i in range(cent.shape[1])
            ]).alias("mean_vec")
        ).toPandas()
        new = cent.copy()
        for _, row in pdf.iterrows():
            v = np.asarray(row["mean_vec"], dtype=np.float64)
            nrm = np.linalg.norm(v)
            if nrm > 0:
                new[int(row["centroid_id"])] = v / nrm
        cent = new
    return _centroid_df(spark, cent)


def _centroid_df(spark: SparkSession, cent: np.ndarray) -> DataFrame:
    rows = [(int(i), [float(x) for x in cent[i]]) for i in range(len(cent))]
    return spark.createDataFrame(rows, "centroid_id int, centroid array<double>")


def _assign(vecs: DataFrame, centroids: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Nearest-centroid assignment as ONE map-side projection.

    The centroid table is bounded by design (≤ hundreds), so the argmax
    is ``array_max`` over ``struct(csim, -position)`` entries produced by
    a single indexed ``transform`` over one nested centroid literal: no
    16× row explosion, no per-id argmax sort-shuffle, and — unlike the
    earlier shape that inlined ``cosine_expr`` once per centroid — the
    cosine expression appears ONCE in the plan, which cuts Catalyst
    analysis/codegen from the dominant cost of a Lloyd iteration to
    noise.  Bit-identical: the per-pair cosine is the same float64
    ``zip_with``/``aggregate`` sequence per element, array position ==
    ``centroid_id`` (rows sorted by id), and struct comparison
    reproduces the (csim desc, centroid_id asc) tie-break via the
    negated position."""
    rows = sorted(centroids.select("centroid_id", "centroid").collect(),
                  key=lambda r: r["centroid_id"])
    ids = [int(r["centroid_id"]) for r in rows]
    if ids != list(range(len(rows))):
        # contiguity is load-bearing (array position == centroid_id); a
        # bare assert would vanish under `python -O` and silently
        # misattribute assignments (ADVICE r3 item 3)
        raise ValueError(
            f"centroid_id must be contiguous 0..{len(rows) - 1}; got {ids[:8]}"
        )
    # the centroid table rides as DATA (a one-row broadcast of
    # array<array<double>>), not as an embedded literal: the plan's
    # expression tree is then identical across Lloyd iterations, so
    # whole-stage codegen is compiled once and cached instead of
    # re-generated for every new centroid values (measured ~30% off each
    # assignment pass; values and tie-breaks bitwise identical — same
    # float64 cosine_expr per element, array position == centroid_id)
    cents = [[float(x) for x in r["centroid"]] for r in rows]
    one = vecs.sparkSession.createDataFrame([(cents,)],
                                            "cents array<array<double>>")
    best = F.array_max(F.transform(
        F.col("cents"),
        lambda c, i: F.struct(
            cosine_expr(F.col("embedding"), c).alias("csim"),
            (-i).alias("nid"),
        ),
    ))
    return vecs.crossJoin(F.broadcast(one)).select(
        id_col, "embedding",
        (-best["nid"]).cast("int").alias("centroid_id"),
    )


def ivf_topk(
    spark: SparkSession,
    queries: DataFrame,
    keys: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate top-k: ``(query_id, vec_id, cos, rank)``.

    Keys are bucketed once by nearest centroid; each query probes its
    ``nprobe`` closest buckets and re-ranks exactly inside them.  At
    scale the bucketed key table is the partition layout (partition by
    ``centroid_id``) so a probe is a partition-pruned scan.
    """
    cents = centroids if centroids is not None else train_centroids(spark, keys, n_centroids)
    key_buckets = _assign(keys, cents).persist()

    qscored = queries.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "embedding",
        "centroid_id",
        cosine_expr(F.col("embedding"), F.col("centroid")).alias("csim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("csim"), F.asc("centroid_id"))
    probes = (
        qscored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= nprobe)
        .select("query_id", F.col("embedding").alias("qv"), "centroid_id")
    )
    cand = probes.join(
        key_buckets.select("centroid_id", "vec_id", F.col("embedding").alias("kv")),
        "centroid_id",
    ).select("query_id", "vec_id", cosine_expr(F.col("qv"), F.col("kv")).alias("cos"))
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return cand.withColumn("rank", F.row_number().over(w2)).where(F.col("rank") <= k)


def build_ivf_index(
    spark: SparkSession,
    keys: DataFrame,
    out_dir: str,
    n_centroids: int = 16,
    iters: int = 3,
    seed: int = 7,
) -> dict:
    """Persist the IVF layout: keys written as parquet **partitioned by
    centroid_id** plus the trained centroid table — the write-once layout
    a 100 TB ANN deployment keeps.  A probe then reads only
    ``nprobe/n_centroids`` of the data via partition pruning; nothing is
    re-trained or re-bucketed per query batch (the round-1 bench paid
    centroid training on every ``ivf_topk`` call).

    Returns ``{"n_keys": ..., "n_centroids": ...}``.
    """
    import json
    import os

    cents = train_centroids(spark, keys, n_centroids, iters, seed)
    assigned = _assign(keys, cents)
    # cluster rows by bucket before the partitionBy write: without this,
    # every input partition writes a sliver file into every centroid_id
    # directory (n_input × n_centroids small files — at 1000 executors,
    # millions); after it each bucket is one-or-few contiguous files,
    # which is also what the probe-side partition-pruned scan wants
    assigned = assigned.repartition(n_centroids, "centroid_id")
    assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(
        os.path.join(out_dir, "keys"))
    cents.write.mode("overwrite").parquet(os.path.join(out_dir, "centroids"))
    n_keys = spark.read.parquet(os.path.join(out_dir, "keys")).count()
    meta = {"n_keys": int(n_keys), "n_centroids": int(n_centroids)}
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def ivf_topk_from_index(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """IVF top-k over a persisted :func:`build_ivf_index` layout.

    The probe side (per-query nearest ``nprobe`` centroids) is tiny and
    broadcast, so Spark's dynamic partition pruning restricts the key
    scan to the probed ``centroid_id`` partitions — the plan reads
    ``nprobe/n_centroids`` of the table, which is the whole point of IVF
    at scale (asserted in ``tests/test_plans.py``).  Results are
    identical to :func:`ivf_topk` with the same centroids.
    """
    import os

    cents = spark.read.parquet(os.path.join(index_dir, "centroids"))
    key_buckets = spark.read.parquet(os.path.join(index_dir, "keys"))

    qscored = queries.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "embedding",
        "centroid_id",
        cosine_expr(F.col("embedding"), F.col("centroid")).alias("csim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("csim"), F.asc("centroid_id"))
    probes = (
        qscored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= nprobe)
        .select("query_id", F.col("embedding").alias("qv"), "centroid_id")
    )
    cand = F.broadcast(probes).join(
        key_buckets.select("centroid_id", "vec_id", F.col("embedding").alias("kv")),
        "centroid_id",
    ).select("query_id", "vec_id", cosine_expr(F.col("qv"), F.col("kv")).alias("cos"))
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return cand.withColumn("rank", F.row_number().over(w2)).where(F.col("rank") <= k)


def _srp_signature(vec_col, planes: np.ndarray):
    """Signed-random-projection signature as a Catalyst long expression:
    bit j set iff dot(vec, plane_j) > 0."""
    sig = None
    for j in range(planes.shape[0]):
        plane = F.array(*[F.lit(float(x)) for x in planes[j]])
        bit = F.when(_dot(vec_col, plane) > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = bit if sig is None else sig + bit
    return sig


def lsh_topk(
    spark: SparkSession,
    queries: DataFrame,
    keys: DataFrame,
    k: int = 10,
    n_bits: int = 8,
    seed: int = 11,
    multiprobe: bool = True,
    dim: int | None = None,
) -> DataFrame:
    """SRP-LSH approximate top-k: ``(query_id, vec_id, cos, rank)``.

    ``n_bits`` seeded hyperplanes → 2^n_bits buckets; queries probe their
    own bucket plus (``multiprobe``) all Hamming-1 neighbors, then exact
    re-rank.  Bucket-key equi-join — no cross join; hyperplanes are
    literal arrays folded into whole-stage codegen.
    """
    if dim is None:
        dim = len(keys.select("embedding").first()["embedding"])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_bits, dim))

    kb = keys.select("vec_id", "embedding", _srp_signature(F.col("embedding"), planes).alias("bucket"))
    qs = queries.select("query_id", "embedding", _srp_signature(F.col("embedding"), planes).alias("bucket0"))
    if multiprobe:
        probe_arr = F.array(
            F.col("bucket0"),
            *[F.col("bucket0").bitwiseXOR(F.lit(1 << j).cast("long")) for j in range(n_bits)],
        )
    else:
        probe_arr = F.array(F.col("bucket0"))
    qprobe = qs.select(
        "query_id", F.col("embedding").alias("qv"), F.explode(probe_arr).alias("bucket")
    )
    cand = (
        qprobe.join(kb.select("bucket", "vec_id", F.col("embedding").alias("kv")), "bucket")
        .select("query_id", "vec_id", cosine_expr(F.col("qv"), F.col("kv")).alias("cos"))
        .dropDuplicates(["query_id", "vec_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return cand.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
