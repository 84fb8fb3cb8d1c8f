"""Exact blocked top-k cosine similarity + synonym-edge construction.

Reproduces the reference's ``retrieve_knn``
(``/root/reference/src/hipporag/utils/embed_utils.py:6-94``): batched
dense matmul over query tiles × key blocks with two-level top-k (partial
top-k per block, final top-k over the concatenation).  Spark-first shape
(SURVEY.md §2.3 J7 / §2.5 T5):

- key side stays distributed: ``mapInPandas`` over key blocks, each block
  computing ``K_block @ Q_tileᵀ`` in numpy and emitting only its local
  top-k rows per query (map-side pruning: a block of B keys emits ≤ k
  rows per query, never B);
- query side is tiled driver-side and broadcast per tile, bounding
  executor memory at ``tile × dim`` floats regardless of query count;
- final top-k via ``row_number`` window per query, ties pinned by
  ``key_id`` ascending for determinism (torch.topk tie order in the
  reference is unpinned; SURVEY.md §4.3.7).

:func:`synonym_edges` applies HippoRAG's acceptance rules on top
(``HippoRAG.py:856-877``): query eligibility >2 alphanumeric chars
(``861``), score ≥ threshold (0.8, ``config_utils.py:160-163``),
neighbor ≠ self and non-empty (``871``), topk=2047 candidates
(``config_utils.py:148-151``), and the accepted-neighbor cap — the
reference breaks when ``num_nns > 100`` *after* incrementing per accept,
so at most **101** neighbors are accepted per node.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .extract import normalize_text


def cosine_topk(
    spark: SparkSession,
    queries: DataFrame,  # (id string, embedding array<float>)
    keys: DataFrame,     # (id string, embedding array<float>)
    k: int,
    tile_size: int = 8192,
    n_blocks: int | None = None,
    id_col: str = "id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for every query: returns
    ``(query_id, key_id, score, rank)`` with rank 1..k per query."""
    sc = spark.sparkContext
    n_blocks = n_blocks or max(sc.defaultParallelism, 8)
    keys_b = keys.select(
        F.col(id_col).alias("key_id"), F.col(vec_col).alias("vec")
    ).repartition(n_blocks).persist()
    keys_b.count()

    q_iter = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("vec"))
    q_pdf_full = q_iter.toPandas()  # query tiling: driver holds ids + vectors tile-by-tile
    results = []
    for start in range(0, len(q_pdf_full), tile_size):
        tile = q_pdf_full.iloc[start : start + tile_size]
        q_ids = tile["query_id"].to_numpy()
        q_mat = np.stack(tile["vec"].to_numpy()).astype(np.float64)
        qn = np.linalg.norm(q_mat, axis=1, keepdims=True)
        qn[qn == 0] = 1.0
        q_mat = q_mat / qn
        bc = sc.broadcast((q_ids, q_mat))

        def block_topk(batches, _bc=bc, _k=k):
            for pdf in batches:
                if not len(pdf):
                    continue
                kk_ids = pdf["key_id"].to_numpy()
                k_mat = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
                kn = np.linalg.norm(k_mat, axis=1, keepdims=True)
                kn[kn == 0] = 1.0
                k_mat = k_mat / kn
                qi, qm = _bc.value
                sims = k_mat @ qm.T  # (block_keys, tile_queries)
                kb = min(_k, sims.shape[0])
                part = np.argpartition(-sims, kb - 1, axis=0)[:kb]  # per-query block top-k
                rows = {
                    "query_id": np.repeat(qi[None, :], kb, axis=0).ravel(),
                    "key_id": kk_ids[part].ravel(),
                    "score": np.take_along_axis(sims, part, axis=0).ravel(),
                }
                yield pd.DataFrame(rows)

        part_df = keys_b.mapInPandas(block_topk, schema="query_id string, key_id string, score double")
        results.append(part_df)
        # tile results are unioned lazily; broadcasts cleaned up after action

    all_parts = results[0]
    for r in results[1:]:
        all_parts = all_parts.unionByName(r)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("key_id"))
    out = all_parts.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
    return out


def cosine_topk_with_stats(
    spark: SparkSession,
    queries: DataFrame,
    keys: DataFrame,
    k: int,
    tile_size: int = 8192,
    n_blocks: int | None = None,
    id_col: str = "id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Like :func:`cosine_topk` but additionally returns per-query global
    ``(min, max)`` over ALL key scores — needed by the reference's
    ``min_max_normalize`` (``misc_utils.py:106-115``) which normalizes over
    the full score vector, not just the survivors.  Single pass: each key
    block emits its local top-k rows plus one stats row per query; global
    stats are a tiny agg, so the full q×K score matrix never materializes.
    """
    sc = spark.sparkContext
    n_blocks = n_blocks or max(sc.defaultParallelism, 8)
    keys_b = keys.select(
        F.col(id_col).alias("key_id"), F.col(vec_col).alias("vec")
    ).repartition(n_blocks).persist()
    keys_b.count()

    q_pdf_full = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("vec")
    ).toPandas()
    top_parts, stat_parts = [], []
    for start in range(0, len(q_pdf_full), tile_size):
        tile = q_pdf_full.iloc[start : start + tile_size]
        q_ids = tile["query_id"].to_numpy()
        q_mat = np.stack(tile["vec"].to_numpy()).astype(np.float64)
        qn = np.linalg.norm(q_mat, axis=1, keepdims=True)
        qn[qn == 0] = 1.0
        q_mat = q_mat / qn
        bc = sc.broadcast((q_ids, q_mat))

        def block_kernel(batches, _bc=bc, _k=k):
            for pdf in batches:
                if not len(pdf):
                    continue
                kk_ids = pdf["key_id"].to_numpy()
                k_mat = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
                kn = np.linalg.norm(k_mat, axis=1, keepdims=True)
                kn[kn == 0] = 1.0
                k_mat = k_mat / kn
                qi, qm = _bc.value
                sims = k_mat @ qm.T
                kb = min(_k, sims.shape[0])
                part = np.argpartition(-sims, kb - 1, axis=0)[:kb]
                yield pd.DataFrame({
                    "query_id": np.repeat(qi[None, :], kb, axis=0).ravel(),
                    "key_id": kk_ids[part].ravel(),
                    "score": np.take_along_axis(sims, part, axis=0).ravel(),
                    "is_stat": False,
                    "smin": 0.0,
                    "smax": 0.0,
                })
                yield pd.DataFrame({
                    "query_id": qi,
                    "key_id": "",
                    "score": 0.0,
                    "is_stat": True,
                    "smin": sims.min(axis=0),
                    "smax": sims.max(axis=0),
                })

        out = keys_b.mapInPandas(
            block_kernel,
            schema="query_id string, key_id string, score double, is_stat boolean, smin double, smax double",
        ).persist()
        out.count()
        top_parts.append(out.where(~F.col("is_stat")).select("query_id", "key_id", "score"))
        stat_parts.append(out.where(F.col("is_stat")).select("query_id", "smin", "smax"))

    tops = top_parts[0]
    stats = stat_parts[0]
    for t, s in zip(top_parts[1:], stat_parts[1:]):
        tops = tops.unionByName(t)
        stats = stats.unionByName(s)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("key_id"))
    topk = tops.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
    gstats = stats.groupBy("query_id").agg(
        F.min("smin").alias("score_min"), F.max("smax").alias("score_max")
    )
    return topk, gstats


def minmax_normalize(df: DataFrame, stats: DataFrame, score_col: str = "score") -> DataFrame:
    """Reference ``min_max_normalize`` (``misc_utils.py:106-115``): scale by
    the per-query global (min, max); all-equal vectors → 1.0."""
    return df.join(stats, "query_id").withColumn(
        score_col + "_norm",
        F.when(
            F.col("score_max") == F.col("score_min"), F.lit(1.0)
        ).otherwise(
            (F.col(score_col) - F.col("score_min"))
            / (F.col("score_max") - F.col("score_min"))
        ),
    ).drop("score_min", "score_max")


def synonym_edges(
    spark: SparkSession,
    entities: DataFrame,  # (entity_id, phrase, embedding)
    topk: int = 2047,
    threshold: float = 0.8,
    max_neighbors: int = 101,
) -> DataFrame:
    """Entity→entity synonym edges ``(src, dst, weight, relation)`` per
    HippoRAG's acceptance semantics (see module docstring)."""
    eligible = entities.where(
        F.length(F.regexp_replace(F.col("phrase"), "[^A-Za-z0-9]", "")) > 2
    )
    knn = cosine_topk(
        spark,
        eligible.select(F.col("entity_id").alias("id"), "embedding"),
        entities.select(F.col("entity_id").alias("id"), "embedding"),
        k=topk,
    )
    phrases = entities.select(F.col("entity_id").alias("key_id"), F.col("phrase").alias("nn_phrase"))
    accepted = (
        knn.where(F.col("score") >= threshold)
        .where(F.col("key_id") != F.col("query_id"))
        .join(phrases, "key_id")
        .where(normalize_text(F.col("nn_phrase")) != "")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("key_id"))
    return (
        accepted.withColumn("nn_rank", F.row_number().over(w))
        .where(F.col("nn_rank") <= max_neighbors)
        .select(
            F.col("query_id").alias("src"),
            F.col("key_id").alias("dst"),
            F.col("score").alias("weight"),
            F.lit("synonym").alias("relation"),
        )
    )
