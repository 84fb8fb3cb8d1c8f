"""Driver contract: entry / queries / oracle_sql for the hipporag_spark engine.

Every oracle-checked query is written twice with the SAME expression tree:
once as DataFrame ops (Spark) and once as ANSI SQL (DuckDB).  Per-row
scalar expressions (hashes, ratios of integer counts, blended scores) are
bit-identical across engines, so they ship unrounded; only values that
cross rows through variable-order floating-point summation (PPR
contributions, cosine similarities) are rounded (9 / 6 decimals) before
the driver's value-hash compare.

Every registered query carries an exact DuckDB oracle — including
`media_features` (the fake decoder's sha256-chain payload reproduces in
SQL; the real-codec plug point stays stubbed).  The iterative graph
algorithms are recursive CTEs (power
iteration for PPR, min-label closure for components, two-phase
semi-synchronous LPA via a self-loop-sentinel single-reference trick);
IVF unrolls its seeded k-means training into chained CTEs; the full
retrieval flow composes featurizer embeddings, fact linking, reset
blending and batched PPR in one statement.  Iterative gate queries are
pinned to the DISTRIBUTED physical modes (csr / dataframe) so the
oracles verify the Spark kernels, not the driver-local fallback.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hipporag_spark.corpus import corpus_from_documents
from hipporag_spark.extract import make_chunks, chunk_tokens, extract_all
from hipporag_spark import dedup as dd
from hipporag_spark import textstats as ts
from hipporag_spark import curation as cur
from hipporag_spark import llmjson as lj
from hipporag_spark import events as ev
from hipporag_spark import similarity as sim
from hipporag_spark.graph import build_graph
from hipporag_spark.knn import cosine_topk
from hipporag_spark.ppr import personalized_pagerank
from hipporag_spark.components import connected_components
from hipporag_spark.kcore import bfs_distances, core_decomposition
from hipporag_spark.lpa import label_propagation
from hipporag_spark.multimodal import attach_media, decode_features
from hipporag_spark.evaluation import (
    qa_contexts,
    qa_exact_match,
    rag_qa,
    recall_at_k,
)
from hipporag_spark.retrieve import GraphRetriever, RetrievalConfig

SEED_PHRASES = ["key", "row", "table"]

# One constant drives BOTH the engine's max_iter and the DuckDB oracle's
# fixed recursive-CTE round count for the kcore gate, set far above any
# plausible diameter of the phrase graph; q_kcore additionally asserts
# CoreResult.converged so a graph needing more rounds fails loudly
# instead of silently diverging from the oracle (ADVICE r3 item 2).
KCORE_ORACLE_ROUNDS = 60
NEARDUP_COS = 0.45
JACCARD_TH = 0.7


# --------------------------------------------------------------------------
# shared Spark building blocks
# --------------------------------------------------------------------------

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(chunk_id, token) distinct — the extraction stage over the corpus."""
    return chunk_tokens(make_chunks(corpus_from_documents(spark, sf_dir)))


def _pair_counts(tokens: DataFrame) -> DataFrame:
    """(subject, object, weight) phrase co-occurrence counts, subject<object —
    with the same per-chunk token cap as extract.make_facts (mirrored in
    the oracle's `capped` CTE)."""
    from pyspark.sql import Window
    from hipporag_spark.extract import MAX_TOKENS_PER_CHUNK

    w = Window.partitionBy("chunk_id").orderBy("token")
    capped = (
        tokens.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= MAX_TOKENS_PER_CHUNK)
        .drop("_rn")
    )
    a, b = capped.alias("a"), capped.alias("b")
    return (
        a.join(b, "chunk_id")
        .where(F.col("a.token") < F.col("b.token"))
        .groupBy(F.col("a.token").alias("subject"), F.col("b.token").alias("object"))
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )


def _phrase_edges(tokens: DataFrame) -> DataFrame:
    """Phrase-level edge table: fact pairs both directions + passage edges."""
    counts = _pair_counts(tokens)
    fwd = counts.select(F.col("subject").alias("src"), F.col("object").alias("dst"), "weight")
    rev = counts.select(F.col("object").alias("src"), F.col("subject").alias("dst"), "weight")
    passage = tokens.select(
        F.col("chunk_id").alias("src"), F.col("token").alias("dst"), F.lit(1.0).alias("weight")
    )
    return fwd.unionByName(rev).unionByName(passage)


# --------------------------------------------------------------------------
# flagship entry
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build the knowledge graph from sf0.001 documents and run
    converged PPR from a fixed seed-phrase reset vector; top-50 nodes."""
    sf_dir = "/root/testdata/sf0.001"
    tokens = _tokens(spark, sf_dir)
    edges = _phrase_edges(tokens)
    seeds = (
        edges.select(F.col("src").alias("node_id")).distinct()
        .where(F.col("node_id").isin(SEED_PHRASES))
        .withColumn("reset_weight", F.lit(1.0))
    )
    res = personalized_pagerank(spark, edges, seeds, damping=0.85, tol=1e-9)
    return (
        res.ranks.orderBy(F.desc("score"), F.asc("node_id"))
        .limit(50)
        .select("node_id", F.round("score", 8).alias("score"))
    )


# --------------------------------------------------------------------------
# oracle-checked queries
# --------------------------------------------------------------------------

def q_corpus_sha(spark, sf_dir):
    c = corpus_from_documents(spark, sf_dir)
    return c.select("repo", "path", "commit", "lang", F.sha2("content", 256).alias("content_sha"))


def q_chunks(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(F.lit("chunk-"), F.sha2("text", 256)).alias("chunk_id"),
        "lang",
    )


def q_entities(spark, sf_dir):
    return (
        _tokens(spark, sf_dir)
        .select(F.col("token").alias("phrase"))
        .distinct()
        .select(F.concat(F.lit("entity-"), F.sha2("phrase", 256)).alias("entity_id"), "phrase")
    )


def q_entity_degree(spark, sf_dir):
    return (
        _tokens(spark, sf_dir)
        .groupBy(F.col("token").alias("phrase"))
        .agg(F.count_distinct("chunk_id").alias("chunk_degree"))
    )


def q_fact_edges(spark, sf_dir):
    counts = _pair_counts(_tokens(spark, sf_dir))
    fwd = counts.select(
        F.col("subject").alias("src_phrase"), F.col("object").alias("dst_phrase"), "weight"
    )
    rev = counts.select(
        F.col("object").alias("src_phrase"), F.col("subject").alias("dst_phrase"), "weight"
    )
    return fwd.unionByName(rev)


def q_graph_stats(spark, sf_dir):
    tokens = _tokens(spark, sf_dir).persist()
    n_chunks = tokens.select("chunk_id").distinct().count()
    n_entities = tokens.select("token").distinct().count()
    n_pairs = _pair_counts(tokens).count()
    n_passage = tokens.count()
    tokens.unpersist()
    return spark.createDataFrame(
        [(n_chunks, n_entities, n_pairs * 2, n_passage)],
        "n_chunks long, n_entities long, n_fact_edge_rows long, n_passage_edges long",
    )


def q_degree_dist(spark, sf_dir):
    counts = _pair_counts(_tokens(spark, sf_dir))
    und = counts.select(F.col("subject").alias("src"), F.col("object").alias("dst")).unionByName(
        counts.select(F.col("object").alias("src"), F.col("subject").alias("dst"))
    )
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))


def q_ppr_step1(spark, sf_dir):
    """ONE PPR superstep with the exact engine update rule — SQL-checkable
    slice of the flagship iterative operator (damping 0.5, uniform seeds)."""
    edges = _phrase_edges(_tokens(spark, sf_dir))
    sym = (
        edges.select("src", "dst", "weight")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"))
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
        .persist()
    )
    nodes = sym.select(F.col("src").alias("node_id")).distinct()
    seeds = nodes.where(F.col("node_id").isin(SEED_PHRASES))
    n_seeds = seeds.count()
    r = seeds.withColumn("rw", F.lit(1.0) / F.lit(float(n_seeds)))
    p0 = nodes.join(r, "node_id", "left").select(
        "node_id", F.coalesce(F.col("rw"), F.lit(0.0)).alias("p")
    )
    outw = sym.groupBy("src").agg(F.sum("weight").alias("out_w"))
    contrib = (
        sym.join(p0.withColumnRenamed("node_id", "src"), "src")
        .join(outw, "src")
        .groupBy(F.col("dst").alias("node_id"))
        .agg(F.sum(F.col("p") / F.col("out_w") * F.col("weight")).alias("c"))
    )
    out = (
        p0.join(contrib, "node_id", "left")
        .join(r.select("node_id", "rw"), "node_id", "left")
        .select(
            "node_id",
            F.round(
                F.lit(0.5) * F.coalesce(F.col("c"), F.lit(0.0))
                + F.lit(0.5) * F.coalesce(F.col("rw"), F.lit(0.0)),
                9,
            ).alias("p1"),
        )
    )
    return out


def q_triangle_count(spark, sf_dir):
    pairs = _pair_counts(_tokens(spark, sf_dir)).select(
        F.col("subject").alias("a"), F.col("object").alias("b")
    )
    e1 = pairs
    e2 = pairs.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = pairs.select(F.col("a"), F.col("b").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"]).count()
    return spark.createDataFrame([(tri,)], "n_triangles long")


def q_clustering_coeff(spark, sf_dir):
    """Global clustering coefficient over the phrase co-occurrence graph
    (3·triangles / wedges) — the density diagnostic the north_star pairs
    with triangle counting."""
    from hipporag_spark.triangles import clustering_coefficient

    pairs = _pair_counts(_tokens(spark, sf_dir)).select(
        F.col("subject").alias("src"), F.col("object").alias("dst"),
        F.lit(1.0).alias("weight"))
    out = clustering_coefficient(pairs)
    return out.select("n_triangles", "n_wedges", F.round("global_cc", 9).alias("global_cc"))


def q_dedup_exact(spark, sf_dir):
    return dd.exact_duplicates(_docs(spark, sf_dir))


def q_minhash_sigs(spark, sf_dir):
    return dd.minhash_signatures(dd.shingles(_docs(spark, sf_dir), n=3), num_perm=8)


def q_lsh_pairs(spark, sf_dir):
    sh = dd.shingles(_docs(spark, sf_dir), n=1)
    return dd.lsh_candidate_pairs(sh, num_perm=8, bands=4, threshold=JACCARD_TH, max_bucket=50)


def q_jaccard_pairs(spark, sf_dir):
    return dd.jaccard_pairs(_docs(spark, sf_dir), n=1, threshold=JACCARD_TH, max_shingle_docs=1000)


def q_simhash_sigs(spark, sf_dir):
    return dd.simhash_signatures(_docs(spark, sf_dir), bits=16)


def q_embed_neardup(spark, sf_dir):
    # mode pinned to the exact all-pairs variant — it IS the oracle;
    # production defaults to mode="auto" (LSH-bucketed above 100k rows)
    out = dd.embedding_neardup_pairs(
        _emb(spark, sf_dir), threshold=NEARDUP_COS, mode="exact")
    return out.select("id_a", "id_b", F.round("cos", 6).alias("cos"))


def q_ann_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "embedding")
    out = sim.brute_force_topk(q, emb.select("vec_id", "embedding"), k=10)
    return out.select("query_id", "vec_id", F.round("cos", 6).alias("cos"), "rank")


def q_knn_arrow_topk(spark, sf_dir):
    """Same result as q_ann_topk but through the Arrow-blocked matmul kernel
    (hipporag_spark.knn.cosine_topk) — validates the scale path vs DuckDB."""
    emb = _emb(spark, sf_dir)
    sid = F.format_string("%08d", F.col("vec_id"))  # zero-pad: string tie-order == numeric
    q = emb.where(F.col("vec_id") < 5).select(sid.alias("id"), "embedding")
    k = emb.select(sid.alias("id"), "embedding")
    out = cosine_topk(spark, q, k, k=10)
    return out.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("key_id").cast("long").alias("vec_id"),
        F.round("score", 6).alias("cos"),
        "rank",
    )


def q_token_counts(spark, sf_dir):
    return ts.token_counts(_docs(spark, sf_dir))


def q_quality(spark, sf_dir):
    return ts.quality_scores(_docs(spark, sf_dir))


def q_langid(spark, sf_dir):
    return ts.language_id(_docs(spark, sf_dir))


def q_fingerprints(spark, sf_dir):
    return ts.fingerprints(_docs(spark, sf_dir), n=3)


def q_pii_scrub(spark, sf_dir):
    return ts.pii_scrub(_docs(spark, sf_dir))


# P9 gates: a deterministic synthetic LLM-response table over documents —
# per doc a JSON answer wrapped in prose; doc_id%4==0 rows are truncated
# mid-generation (finish_reason='length', exercising the blind-last-comma
# + brace-closing repair of llm_utils.py:146-215), doc_id%4==1 rows have
# no JSON at all (the empty-list failure contract).  The oracle states the
# reference-algorithm OUTCOME per branch, so the gate checks the repair
# and extraction semantics end to end, not a reimplementation of them.
def q_llm_entities(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    t = [F.concat(F.lit(f"tok{i}_"), h) for i in (1, 2, 3, 4)]
    full = F.concat(
        F.lit('Sure! {"named_entities": ["'), t[0], F.lit('", "'), t[1],
        F.lit('", "'), t[2], F.lit('", "'), t[3], F.lit('"]} -- done'))
    trunc = F.concat(
        F.lit('Sure! {"named_entities": ["'), t[0], F.lit('", "'), t[1],
        F.lit('", "to'))
    b = F.col("doc_id") % 4
    resp = (F.when(b == 0, trunc)
            .when(b == 1, F.lit("I found no entities in this passage."))
            .otherwise(full))
    fin = F.when(b == 0, F.lit("length")).otherwise(F.lit("stop"))
    rdf = docs.select("doc_id", resp.alias("response"),
                      fin.alias("finish_reason"))
    out = lj.extract_entities_json(rdf, "response", "finish_reason")
    return out.select("doc_id", F.explode("named_entities").alias("entity"))


def q_llm_triples(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    s1, o1 = F.concat(F.lit("s_"), h), F.concat(F.lit("o_"), h)
    s2, o2 = F.concat(F.lit("x_"), h), F.concat(F.lit("y_"), h)
    t1 = F.concat(F.lit('["'), s1, F.lit('", "rel", "'), o1, F.lit('"]'))
    t2 = F.concat(F.lit('["'), s2, F.lit('", "rel2", "'), o2, F.lit('"]'))
    # full: arity-1 junk triple + a duplicate of t1 (filter + dedup);
    # trunc: cut mid-third-triple, so the blind-comma repair leaves an
    # arity-1 remnant the validity filter must then drop
    full = F.concat(F.lit('{"triples": ['), t1, F.lit(", "), t2,
                    F.lit(', ["bad"], '), t1, F.lit("]}"))
    trunc = F.concat(F.lit('{"triples": ['), t1, F.lit(", "), t2,
                     F.lit(', ["'), s1, F.lit('", "re'))
    b = F.col("doc_id") % 4
    resp = (F.when(b == 0, trunc)
            .when(b == 1, F.lit("no triples extracted"))
            .otherwise(full))
    fin = F.when(b == 0, F.lit("length")).otherwise(F.lit("stop"))
    rdf = docs.select("doc_id", resp.alias("response"),
                      fin.alias("finish_reason"))
    out = lj.extract_triples_json(rdf, "response", "finish_reason")
    ex = out.select("doc_id", F.explode("triples").alias("t"))
    return ex.select("doc_id",
                     F.col("t")[0].alias("subject"),
                     F.col("t")[1].alias("predicate"),
                     F.col("t")[2].alias("object"))


# the benchmark/eval set for the decontamination gate: a deterministic
# 5% slice of the corpus itself (every 20th doc) — guarantees overlap
# exists so both join legs of the operator are exercised
def q_decontam(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    bench = docs.where(F.col("doc_id") % 20 == 0)
    return cur.decontaminate(docs, bench, n=5)


def q_event_windows(spark, sf_dir):
    return ev.windowed_stats(
        spark.read.parquet(f"{sf_dir}/events.parquet"), window="10 minutes")


def q_sessions(spark, sf_dir):
    return ev.sessionize(
        spark.read.parquet(f"{sf_dir}/events.parquet"), gap_minutes=30)


STRAT_RATES = {"src0": 0.8, "src1": 0.5, "src2": 0.25, "src3": 0.9, "src4": 0.1}


def q_strat_sample(spark, sf_dir):
    out = cur.stratified_sample(_docs(spark, sf_dir), STRAT_RATES, "source")
    return out.select("doc_id", "source")


def q_repetition(spark, sf_dir):
    return ts.repetition_stats(_docs(spark, sf_dir))


def _occurrences(token):
    """#occurrences of `token` in text — identical formula in both engines:
    (len(text) - len(replace(text, token, ''))) / len(token)."""
    return (
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit(token))))
        / F.lit(len(token))
    ).cast("int")


def q_eval_recall(spark, sf_dir):
    """recall_at_k over a deterministic token-frequency retrieval: per query
    token, docs ranked by occurrence count; gold = docs with ≥2 occurrences."""
    docs = _docs(spark, sf_dir)
    frames = []
    golds = []
    for tok in ["key", "table", "row"]:
        occ = docs.select(
            F.lit(tok).alias("query_id"),
            F.col("doc_id").cast("string").alias("doc_id"),
            _occurrences(tok).alias("occ"),
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("occ"), F.asc("doc_id"))
        frames.append(
            occ.where(F.col("occ") >= 1)
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 20)
            .select("query_id", "doc_id", "rank")
        )
        golds.append(occ.where(F.col("occ") >= 2).select("query_id", "doc_id"))
    retrieved = frames[0].unionByName(frames[1]).unionByName(frames[2])
    gold = golds[0].unionByName(golds[1]).unionByName(golds[2])
    out = recall_at_k(retrieved, gold, ks=[1, 5, 10, 20])
    return out.select("k", F.round("recall", 9).alias("recall"))


def q_qa_em(spark, sf_dir):
    """qa_exact_match pooled over per-doc answer/gold pairs: gold is the
    doc text for even doc_ids and the word-reversed text for odd ones."""
    docs = _docs(spark, sf_dir)
    answers = docs.select(
        F.col("doc_id").cast("string").alias("query_id"), F.col("text").alias("answer")
    )
    golds = docs.select(
        F.col("doc_id").cast("string").alias("query_id"),
        F.when(F.col("doc_id") % 2 == 0, F.col("text"))
        .otherwise(F.array_join(F.reverse(F.split(F.col("text"), " ")), " "))
        .alias("gold_answer"),
    )
    return qa_exact_match(answers, golds).select(
        F.round("exact_match", 9).alias("exact_match")
    )


def q_qa_context(spark, sf_dir):
    """QA readout dataflow (reference ``HippoRAG.py:667-724``): the
    token-frequency retrieval (top-5, the eval_recall ranking) → per-query
    prompt assembly ('Wikipedia Title: …\\n\\n' × docs + 'Question: …\\n
    Thought: ') → deterministic extractive reader → 'Answer:'-split
    extraction.  One row per query; long strings ship as sha256."""
    docs = _docs(spark, sf_dir)
    frames = []
    for tok in ["key", "table", "row"]:
        occ = docs.select(
            F.lit(tok).alias("query_id"),
            F.col("doc_id").cast("string").alias("doc_id"),
            _occurrences(tok).alias("occ"),
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("occ"), F.asc("doc_id"))
        frames.append(
            occ.where(F.col("occ") >= 1)
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 5)
            .select("query_id", "doc_id", "rank")
        )
    retrieved = frames[0].unionByName(frames[1]).unionByName(frames[2])
    passages = docs.select(F.col("doc_id").cast("string").alias("doc_id"), "text")
    questions = spark.createDataFrame(
        [(t, f'What does "{t}" refer to?') for t in ["key", "table", "row"]],
        "query_id string, question string",
    )
    ctx = qa_contexts(retrieved, passages, questions, qa_top_k=5)
    answers = rag_qa(retrieved, passages, questions, qa_top_k=5)[0]
    return (
        ctx.join(answers, "query_id")
        .select(
            "query_id",
            F.col("n_passages").cast("long").alias("n_passages"),
            F.sha2("prompt", 256).alias("prompt_sha"),
            F.sha2("answer", 256).alias("answer_sha"),
        )
    )


# --------------------------------------------------------------------------
# rows-only queries (non-SQL-expressible; igraph oracles live in tests/)
# --------------------------------------------------------------------------

def q_ppr_scores(spark, sf_dir):
    """Converged PPR, oracle-checked: a DuckDB recursive-CTE power
    iteration reproduces the same fixed point.  tol=1e-12 keeps the
    convergence gap (~tol/(1-d)) three orders below the 1e-6 rounding
    granularity, so both sides round identically.  mode='csr' pins the
    gate to the distributed Spark kernel (broadcast rank + mapInPandas
    bincount blocks + shuffle agg) — auto would route this sf to the
    driver-local fast path and the oracle would verify numpy, not Spark
    (ADVICE.md round-1)."""
    edges = _phrase_edges(_tokens(spark, sf_dir))
    seeds = (
        edges.select(F.col("src").alias("node_id")).distinct()
        .where(F.col("node_id").isin(SEED_PHRASES))
        .withColumn("reset_weight", F.lit(1.0))
    )
    res = personalized_pagerank(spark, edges, seeds, damping=0.85, tol=1e-12, mode="csr")
    # all nodes, no top-k cut: a limit boundary would fall inside a plateau
    # of near-equal chunk scores where engine-level 1e-12 noise flips
    # membership; the full vector compares robustly after round-6
    return res.ranks.select("node_id", F.round("score", 6).alias("score"))


def q_pagerank(spark, sf_dir):
    """Global PageRank (uniform teleport — the north_rule's first named
    algorithm) at the same tol/rounding discipline as q_ppr_scores;
    distributed csr kernel pinned."""
    from hipporag_spark.ppr import pagerank

    edges = _phrase_edges(_tokens(spark, sf_dir))
    res = pagerank(spark, edges, damping=0.85, tol=1e-12, mode="csr")
    return res.ranks.select("node_id", F.round("score", 6).alias("score"))


def q_components(spark, sf_dir):
    """mode='dataframe' pins the distributed min-label hash-join loop (the
    oracle must verify the Spark implementation, not the local union-find
    fallback)."""
    edges = _phrase_edges(_tokens(spark, sf_dir))
    return connected_components(spark, edges, mode="dataframe").components.select(
        "node_id", "component")


def q_kcore(spark, sf_dir):
    """Coreness of every phrase-graph node via the distributed h-index
    fixpoint (mode='dataframe' pins the join+window superstep loop, not
    the local peel); oracle = the same synchronous iteration as a
    recursive CTE run for KCORE_ORACLE_ROUNDS fixed rounds (converged
    supersteps are no-ops).  The engine iterates to convergence and we
    ASSERT it converged within the oracle's round budget, so gate and
    engine cannot silently diverge on a high-diameter graph (ADVICE r3
    item 2: h-index convergence is O(diameter))."""
    edges = _phrase_edges(_tokens(spark, sf_dir))
    res = core_decomposition(spark, edges, mode="dataframe",
                             max_iter=KCORE_ORACLE_ROUNDS)
    if not res.converged:
        raise RuntimeError(
            f"h-index fixpoint did not converge within KCORE_ORACLE_ROUNDS="
            f"{KCORE_ORACLE_ROUNDS} supersteps; oracle parity would be void")
    return res.coreness


def q_bfs_dist(spark, sf_dir):
    """Min hop distance from the SEED_PHRASES ball, max 4 hops —
    multi-source frontier BFS; oracle = recursive-CTE reachability with
    min(dist) aggregation."""
    edges = _phrase_edges(_tokens(spark, sf_dir))
    return bfs_distances(spark, edges, SEED_PHRASES, max_hops=4)


def q_lpa(spark, sf_dir):
    counts = _pair_counts(_tokens(spark, sf_dir))
    edges = counts.select(
        F.col("subject").alias("src"), F.col("object").alias("dst"), "weight"
    ).withColumn("relation", F.lit("fact"))
    return label_propagation(spark, edges, mode="dataframe").labels.select("node_id", "label")


def q_retrieve(spark, sf_dir):
    """Full HippoRAG retrieval flow: extraction → graph → fact scoring →
    reset vector → batched PPR → ranked passages for 3 fixed queries."""
    corpus = corpus_from_documents(spark, sf_dir)
    tables = extract_all(corpus)
    nodes, edges = build_graph(tables)
    retriever = GraphRetriever(
        spark, nodes, edges, tables["chunks"], tables["entities"],
        tables["facts"], tables["membership"],
        # ppr_mode='dataframe' pins the distributed batch-PPR kernel (the
        # (query_id, node_id)-keyed salted aggregation), not the
        # small-graph driver fallback
        config=RetrievalConfig(retrieval_top_k=10, ppr_mode="dataframe"),
    )
    queries = spark.createDataFrame(
        [("q0", "table row key"), ("q1", "merge join scan"), ("q2", "vector window batch")],
        "query_id string, question string",
    )
    out = retriever.retrieve(queries)
    return out.select("query_id", "doc_id", F.round("score", 6).alias("score"), "rank")


def q_retrieve_dpr(spark, sf_dir):
    """Graph-free DPR baseline — the reference's StandardRAG
    (StandardRAG.py:37-196) / HippoRAG.retrieve_dpr (HippoRAG.py:522-592):
    dense passage scoring alone (cosine vs every passage, full-vector
    min-max normalization, top-k), no fact linking, no graph, no PPR.
    VERDICT r4 "What's missing" #1 — the named one-call pure-DPR flow."""
    corpus = corpus_from_documents(spark, sf_dir)
    tables = extract_all(corpus)
    nodes, edges = build_graph(tables)
    retriever = GraphRetriever(
        spark, nodes, edges, tables["chunks"], tables["entities"],
        tables["facts"], tables["membership"],
        config=RetrievalConfig(retrieval_top_k=10),
    )
    queries = spark.createDataFrame(
        [("q0", "table row key"), ("q1", "merge join scan"), ("q2", "vector window batch")],
        "query_id string, question string",
    )
    out = retriever.retrieve_dpr(queries)
    return out.select("query_id", "doc_id", F.round("score", 6).alias("score"), "rank")


def q_ivf_ann(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "embedding")
    out = sim.ivf_topk(spark, q, emb.select("vec_id", "embedding"), k=10, n_centroids=16, nprobe=4)
    return out.select("query_id", "vec_id", F.round("cos", 6).alias("cos"), "rank")


def q_ivf_index_ann(spark, sf_dir):
    """The PRODUCTION IVF path: persist the index once with
    build_ivf_index (keys parquet partitioned by centroid_id + trained
    centroid table), then probe it with ivf_topk_from_index, whose plan
    reaches the keys through dynamic partition pruning.  VERDICT r3
    "What's wrong" #4: the ivf_ann gate calls bare ivf_topk (re-trains
    per call), so the persisted-probe path was plan-asserted but not
    correctness-pinned; this gate closes that.  Same centroids/seed as
    ivf_ann, so the oracle is the same unrolled-Lloyd SQL."""
    import os
    import tempfile

    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "embedding")
    idx_dir = os.path.join(tempfile.gettempdir(), "hipporag_ivf_gate_index")
    sim.build_ivf_index(spark, emb.select("vec_id", "embedding"), idx_dir,
                        n_centroids=16, iters=3, seed=7)
    out = sim.ivf_topk_from_index(spark, idx_dir, q, k=10, nprobe=4)
    return out.select("query_id", "vec_id", F.round("cos", 6).alias("cos"), "rank")


def q_lsh_ann(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "embedding")
    out = sim.lsh_topk(spark, q, emb.select("vec_id", "embedding"), k=10, n_bits=8)
    return out.select("query_id", "vec_id", F.round("cos", 6).alias("cos"), "rank")


def q_dedup_clusters(spark, sf_dir):
    """Transitive near-dup clusters over the verified LSH pair set —
    pinned to the large-star/small-star distributed components mode so
    the gate exercises the cluster-scale path."""
    sh = dd.shingles(_docs(spark, sf_dir), n=1)
    pairs = dd.lsh_candidate_pairs(sh, num_perm=8, bands=4, threshold=JACCARD_TH,
                                   max_bucket=50)
    return dd.duplicate_clusters(spark, pairs, mode="star")


def q_dedup_corpus(spark, sf_dir):
    """End-to-end duplicate removal — the composed pipeline op a training
    corpus runs: exact content-hash dedup (keep min doc_id) + transitive
    near-dup removal (LSH pairs -> components, keep cluster-min doc_id);
    output = the surviving doc_ids.  Oracle = the dedup_clusters CTE
    chain extended with the exact-loser set and an anti-filter."""
    docs = _docs(spark, sf_dir)
    sh = dd.shingles(docs, n=1)
    pairs = dd.lsh_candidate_pairs(sh, num_perm=8, bands=4, threshold=JACCARD_TH,
                                   max_bucket=50)
    return dd.dedup_corpus(spark, docs, pairs, mode="star").select("doc_id")


def q_dataset_split(spark, sf_dir):
    return ts.dataset_split(_docs(spark, sf_dir))


def q_corpus_profile(spark, sf_dir):
    """Per-language corpus size/length profile with EXACT percentiles
    (Spark `percentile` ≡ DuckDB `quantile_cont` on float64)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return ts.corpus_profile(docs)


def q_synonym_edges(spark, sf_dir):
    """HippoRAG synonym-edge construction (HippoRAG.py:818-879 acceptance
    rules: eligibility, threshold, self/empty exclusion, 2047-candidate
    cut, 101-neighbor cap) over the embeddings table as the entity store.
    Threshold lowered to the near-dup level so the sf0.01 vectors produce
    a non-trivial edge set; all rules stay live."""
    from hipporag_spark.knn import synonym_edges as _syn

    emb = _emb(spark, sf_dir)
    sid = F.format_string("vec%04d", F.col("vec_id"))
    ents = emb.select(sid.alias("entity_id"), sid.alias("phrase"), "embedding")
    out = _syn(spark, ents, topk=2047, threshold=NEARDUP_COS, max_neighbors=101)
    return out.select("src", "dst", F.round("weight", 6).alias("weight"), "relation")


def q_media_features(spark, sf_dir):
    media = attach_media(spark, n=64)
    feats = decode_features(media, dim=16)
    return feats.select(
        "media_id", "kind", F.size("features").alias("dim"),
        F.round(F.col("features")[0], 6).alias("f0"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "corpus_sha": q_corpus_sha,
        "chunks": q_chunks,
        "entities": q_entities,
        "entity_degree": q_entity_degree,
        "fact_edges": q_fact_edges,
        "graph_stats": q_graph_stats,
        "degree_dist": q_degree_dist,
        "ppr_step1": q_ppr_step1,
        "triangle_count": q_triangle_count,
        "clustering_coeff": q_clustering_coeff,
        "dedup_exact": q_dedup_exact,
        "minhash_sigs": q_minhash_sigs,
        "lsh_pairs": q_lsh_pairs,
        "jaccard_pairs": q_jaccard_pairs,
        "simhash_sigs": q_simhash_sigs,
        "embed_neardup": q_embed_neardup,
        "ann_topk": q_ann_topk,
        "knn_arrow_topk": q_knn_arrow_topk,
        "token_counts": q_token_counts,
        "quality": q_quality,
        "langid": q_langid,
        "fingerprints": q_fingerprints,
        "pii_scrub": q_pii_scrub,
        "llm_entities": q_llm_entities,
        "llm_triples": q_llm_triples,
        "repetition": q_repetition,
        "decontam": q_decontam,
        "strat_sample": q_strat_sample,
        "event_windows": q_event_windows,
        "sessions": q_sessions,
        "eval_recall": q_eval_recall,
        "qa_em": q_qa_em,
        "qa_context": q_qa_context,
        "ppr_scores": q_ppr_scores,
        "pagerank_scores": q_pagerank,
        "components": q_components,
        "kcore": q_kcore,
        "bfs_dist": q_bfs_dist,
        "lpa": q_lpa,
        "retrieve": q_retrieve,
        "retrieve_dpr": q_retrieve_dpr,
        "ivf_ann": q_ivf_ann,
        "ivf_index_ann": q_ivf_index_ann,
        "lsh_ann": q_lsh_ann,
        "synonym_edges": q_synonym_edges,
        "dedup_clusters": q_dedup_clusters,
        "dedup_corpus": q_dedup_corpus,
        "dataset_split": q_dataset_split,
        "corpus_profile": q_corpus_profile,
        "media_features": q_media_features,
    }


# --------------------------------------------------------------------------
# DuckDB oracle SQL (shared fragments built once)
# --------------------------------------------------------------------------

# graph-path tokenization: HippoRAG text_processing (lower, strip
# non-[a-z0-9 CJK], trim) then split/dedup per chunk
_TOKS = (
    "toks AS (SELECT DISTINCT ('chunk-' || sha256(text)) AS chunk_id, t.tok AS token "
    "FROM documents, unnest(string_split_regex(trim(regexp_replace(lower(text), "
    "'[^a-z0-9 一-鿿]', ' ', 'g')), ' +')) AS t(tok) WHERE t.tok <> '')"
)

# pair CTE mirrors extract.make_facts's pathological-chunk guard: each
# chunk contributes only its 2048 lexicographically-first distinct tokens
# to co-occurrence pairs (no-op on real corpora; bounds the quadratic)
_PAIRS = (
    "capped AS (SELECT chunk_id, token FROM ("
    "SELECT chunk_id, token, row_number() OVER ("
    "PARTITION BY chunk_id ORDER BY token) AS _rn FROM toks) WHERE _rn <= 2048), "
    "pairs AS (SELECT a.chunk_id, a.token AS subject, b.token AS object "
    "FROM capped a JOIN capped b USING (chunk_id) WHERE a.token < b.token), "
    "counts AS (SELECT subject, object, count(*)::DOUBLE AS weight FROM pairs GROUP BY 1, 2)"
)

# dedup-path normalization: [^a-z0-9]+ → single space
_DARR = (
    "darr AS (SELECT doc_id, string_split(trim(regexp_replace(lower(text), "
    "'[^a-z0-9]+', ' ', 'g')), ' ') AS arr FROM documents)"
)


def _shingle_cte(n: int) -> str:
    """Distinct word n-gram shingles per doc from darr."""
    if n == 1:
        return (
            "sh AS (SELECT DISTINCT doc_id, t.s AS shingle FROM darr, "
            "unnest(arr) AS t(s) WHERE t.s <> '')"
        )
    return (
        f"sh AS (SELECT DISTINCT doc_id, array_to_string(arr[i.i:i.i+{n - 1}], ' ') AS shingle "
        f"FROM darr, unnest(range(1, len(arr) - {n - 2})) AS i(i) "
        f"WHERE array_to_string(arr[i.i:i.i+{n - 1}], ' ') <> '')"
    )


_QARR = (
    "qarr AS (SELECT doc_id, text, list_filter(string_split(trim(regexp_replace(lower(text), "
    "'[^a-z0-9]+', ' ', 'g')), ' '), x -> x <> '') AS arr FROM documents)"
)

def _pii_oracle() -> str:
    """Chained-CTE DuckDB mirror of textstats.pii_scrub, generated from the
    SAME ``PII_PATTERNS`` list the Spark side uses (RE2-compatible patterns,
    so Java regex and DuckDB RE2 agree; counts measured on the remaining
    text at each pattern's turn in the fixed masking order)."""
    ctes = ["p0 AS (SELECT doc_id, text AS t FROM documents)"]
    for i, (name, pat, repl) in enumerate(ts.PII_PATTERNS):
        ctes.append(
            f"p{i + 1} AS (SELECT * EXCLUDE (t), "
            f"len(regexp_extract_all(t, '{pat}')) AS n_{name}, "
            f"regexp_replace(t, '{pat}', '{repl}', 'g') AS t FROM p{i})"
        )
    last = len(ts.PII_PATTERNS)
    names = ", ".join(f"n_{n}" for n, _, _ in ts.PII_PATTERNS)
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT doc_id, t AS text_scrubbed, {names} FROM p{last}"
    )


_EN_STOP = "'the','and','of','to','in','is','that','for','with','was'"
_LANG_WORDS = {
    "code": "'def','return','import','void','int','func','var','class','self','const'",
    "de": "'der','die','und','das','ist','nicht','von','mit','den','ein'",
    "en": _EN_STOP,
    "es": "'el','la','los','las','es','una','por','con','para','del'",
    "fr": "'le','la','les','des','est','une','dans','pour','que','qui'",
}

_COS = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


def _minhash_cols(num_perm: int) -> str:
    return ", ".join(f"min(md5('{j}:' || shingle)) AS mh{j}" for j in range(num_perm))


_TOKS_MAT = _TOKS.replace("toks AS (", "toks AS MATERIALIZED (")
_PAIRS_MAT = _PAIRS.replace("counts AS (", "counts AS MATERIALIZED (")


def _lsh_oracle_sql() -> str:
    """Exact oracle for q_lsh_ann: the SRP hyperplanes are deterministic
    (seed 11, 8×64 standard normals), so the bucket computation, Hamming-1
    multiprobe and cosine re-rank are all literal-expressible in SQL."""
    import numpy as np

    planes = np.random.default_rng(11).standard_normal((8, 64))

    def bucket_expr(col):
        bits = []
        for j in range(8):
            lits = ", ".join(repr(float(x)) for x in planes[j])
            bits.append(
                f"CASE WHEN list_dot_product({col}, [{lits}]) > 0 "
                f"THEN {1 << j} ELSE 0 END"
            )
        return " + ".join(bits)

    cos_qk = _COS.format(a="p.qv", b="kb.kv")
    return f"""
        WITH k AS MATERIALIZED (
            SELECT vec_id, embedding::DOUBLE[] AS kv FROM embeddings),
        kb AS MATERIALIZED (
            SELECT vec_id, kv, ({bucket_expr('kv')}) AS bucket FROM k),
        qb AS (SELECT vec_id AS query_id, kv AS qv,
                      ({bucket_expr('kv')}) AS bucket0
               FROM k WHERE vec_id < 5),
        probes AS (
            SELECT query_id, qv,
                   CASE WHEN t.j = -1 THEN bucket0
                        ELSE xor(bucket0, (1 << t.j)) END AS bucket
            FROM qb, unnest([-1, 0, 1, 2, 3, 4, 5, 6, 7]) AS t(j)),
        cand AS (
            SELECT DISTINCT p.query_id, kb.vec_id, {cos_qk} AS cos
            FROM probes p JOIN kb USING (bucket)),
        r AS (SELECT query_id, vec_id, cos,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cos DESC, vec_id) AS rank
              FROM cand)
        SELECT query_id, vec_id, round(cos, 6) AS cos, rank FROM r
        WHERE rank <= 10"""


def _ivf_oracle_sql() -> str:
    """Exact oracle for q_ivf_ann: the seeded spherical k-means of
    similarity.train_centroids is fully deterministic (md5-ordered init,
    3 Lloyd iterations, cosine-argmax assignment with pinned ties), so the
    whole training loop unrolls into chained CTEs — init → (assign → mean
    → renormalize) × 3 → bucket → probe → exact re-rank."""
    cos = "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"

    def assign(cent_cte: str, out: str) -> str:
        c = cos.format(a="v.ve", b="c.cv")
        return (
            f"{out} AS (SELECT vec_id, ve, cid FROM ("
            f"SELECT v.vec_id, v.ve, c.cid, "
            f"row_number() OVER (PARTITION BY v.vec_id ORDER BY {c} DESC, c.cid) AS rn "
            f"FROM v, {cent_cte} c) WHERE rn = 1)"
        )

    def lloyd(k: int) -> str:
        # mean per (centroid, dim) → re-assembled list → renormalize;
        # empty centroids keep their previous vector (similarity.py
        # train_centroids keeps `cent` rows untouched when no member)
        return (
            f"x{k} AS (SELECT cid, generate_subscripts(ve, 1) AS pos, unnest(ve) AS val FROM a{k}), "
            f"g{k} AS (SELECT cid, pos, avg(val) AS mval FROM x{k} GROUP BY 1, 2), "
            f"m{k} AS (SELECT cid, list(mval ORDER BY pos) AS mv FROM g{k} GROUP BY cid), "
            f"c{k} AS (SELECT c.cid, CASE WHEN m.mv IS NOT NULL "
            f"AND sqrt(list_dot_product(m.mv, m.mv)) > 0 "
            f"THEN list_transform(m.mv, x -> x / sqrt(list_dot_product(m.mv, m.mv))) "
            f"ELSE c.cv END AS cv FROM c{k - 1} c LEFT JOIN m{k} m USING (cid))"
        )

    cq = cos.format(a="q.ve", b="c.cv")
    ck = cos.format(a="p.qv", b="kb.kv")
    return f"""
        WITH v AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings),
        init AS (SELECT row_number() OVER (ORDER BY md5(vec_id::VARCHAR || ':7')) - 1 AS cid, ve
                 FROM v ORDER BY md5(vec_id::VARCHAR || ':7') LIMIT 16),
        c0 AS (SELECT cid, list_transform(ve, x -> x /
                   greatest(sqrt(list_dot_product(ve, ve)), 1e-12)) AS cv FROM init),
        {assign('c0', 'a1')}, {lloyd(1)},
        {assign('c1', 'a2')}, {lloyd(2)},
        {assign('c2', 'a3')}, {lloyd(3)},
        {assign('c3', 'a4')},
        kb AS (SELECT vec_id, ve AS kv, cid FROM a4),
        probes AS (
            SELECT query_id, qv, cid FROM (
                SELECT q.vec_id AS query_id, q.ve AS qv, c.cid,
                       row_number() OVER (PARTITION BY q.vec_id
                                          ORDER BY {cq} DESC, c.cid) AS rn
                FROM v q, c3 c WHERE q.vec_id < 5) WHERE rn <= 4),
        cand AS (SELECT p.query_id, kb.vec_id, {ck} AS cos
                 FROM probes p JOIN kb USING (cid)),
        r AS (SELECT query_id, vec_id, cos,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cos DESC, vec_id) AS rank
              FROM cand)
        SELECT query_id, vec_id, round(cos, 6) AS cos, rank FROM r WHERE rank <= 10"""


def _lpa_oracle_sql() -> str:
    """Exact oracle for q_lpa: 20 two-phase supersteps of deterministic
    semi-synchronous LPA as a recursive CTE.  The self-loop sentinel rows
    carry each node's own label through the single allowed reference to
    the recursive table (phase-0 and phase-1 helpers nest inside the
    recursive member); masses are sums of integer pair counts, so the
    max-mass/min-label pick is float-exact on both engines.  Early
    convergence on the Spark side is equivalent — converged supersteps
    are no-ops, and the oracle always runs the full 20."""
    parity = "('0x' || substr(md5(o.node_id), 1, 2))::INT % 2"

    def phase(src_cte: str, tag: str) -> str:
        return f"""
   j{tag} AS (SELECT a.src AS node_id, c.label, a.weight, a.is_self, c.it
          FROM aug a JOIN {src_cte} c ON c.node_id = a.dst),
   own{tag} AS (SELECT node_id, min(label) FILTER (WHERE is_self) AS own_label,
                   max(it) AS it FROM j{tag} GROUP BY node_id),
   nb{tag} AS (SELECT node_id, label, sum(weight) AS mass
               FROM j{tag} WHERE NOT is_self GROUP BY 1, 2),
   mm{tag} AS (SELECT node_id, max(mass) AS mm FROM nb{tag} GROUP BY 1),
   pk{tag} AS (SELECT n.node_id, min(n.label) AS best
          FROM nb{tag} n JOIN mm{tag} m USING (node_id)
          WHERE n.mass = m.mm GROUP BY 1)"""

    return f"""
        WITH RECURSIVE {_TOKS_MAT}, {_PAIRS_MAT},
        symm AS MATERIALIZED (SELECT src, dst, sum(weight) AS weight FROM (
            SELECT subject AS src, object AS dst, weight FROM counts
            UNION ALL SELECT object, subject, weight FROM counts)
            GROUP BY 1, 2),
        aug AS MATERIALIZED (
            SELECT src, dst, weight, FALSE AS is_self FROM symm
            UNION ALL
            SELECT n.node_id, n.node_id, 0.0, TRUE
            FROM (SELECT DISTINCT src AS node_id FROM symm) n),
        pr(it, node_id, label) AS (
            SELECT 0, node_id, node_id
            FROM (SELECT DISTINCT src AS node_id FROM symm)
            UNION ALL
            (WITH cur AS (SELECT * FROM pr WHERE it < 20),
             {phase('cur', '0')},
             s0 AS (SELECT o.node_id,
                        CASE WHEN {parity} = 0 AND p.best IS NOT NULL
                             THEN p.best ELSE o.own_label END AS label,
                        o.it
                    FROM own0 o LEFT JOIN pk0 p USING (node_id)),
             {phase('s0', '1')}
             SELECT o.it + 1, o.node_id,
                    CASE WHEN {parity} = 1 AND p.best IS NOT NULL
                         THEN p.best ELSE o.own_label END
             FROM own1 o LEFT JOIN pk1 p USING (node_id)))
        SELECT node_id, label FROM pr WHERE it = 20"""


def _emb_cte(name: str, src: str) -> str:
    """Sparse deterministic featurizer (hipporag_spark.embed) in SQL:
    char-3-grams of ' '||txt||' ', bucket = first md5 byte % 128 (equal to
    the little-endian 8-byte hash % 128 because 256 ≡ 0 mod 128), counts
    L2-normalized then float32-rounded (::REAL) exactly like the engine's
    array<float> storage.  Integer counts make the norm exact in float64,
    so stored values match the Spark side bit-for-bit."""
    return f"""{name} AS MATERIALIZED (
        SELECT id, bucket, (cnt / nrm)::REAL::DOUBLE AS val FROM (
          SELECT id, bucket, cnt, sqrt(sum(cnt * cnt) OVER (PARTITION BY id)) AS nrm
          FROM (
            SELECT id,
                   ('0x' || substr(md5(substr(pt, i.i, 3)), 1, 2))::INT % 128 AS bucket,
                   count(*)::DOUBLE AS cnt
            FROM (SELECT id, ' ' || txt || ' ' AS pt FROM {src}),
                 unnest(range(1, greatest(length(pt) - 2, 1) + 1)) AS i(i)
            GROUP BY 1, 2)))"""


def _retrieve_oracle_sql() -> str:
    """Exact oracle for q_retrieve — the full HippoRAG retrieval flow in
    one statement: featurizer embeddings (bit-exact, see _emb_cte) → fact
    cosine top-5 per query with full-vector min-max normalization
    (misc_utils.py:106-115) → phrase weights (÷ chunk-degree, mean over
    occurrences, link_top_k mask) → DPR passage scores × 0.05 → per-query
    normalized reset vector → 150-step batched PPR power iteration
    (damping 0.5; residual 0.5^150 ≪ the engine's tol=1e-9 convergence
    gap ≪ the 1e-6 rounding granularity) → top-10 passages.  The corpus
    has no dangling nodes (every chunk tokenizes non-empty, every entity
    has a passage edge), so the dangling-mass term is identically zero."""
    qsrc = ("(SELECT 'q0' AS id, 'table row key' AS txt UNION ALL "
            "SELECT 'q1', 'merge join scan' UNION ALL "
            "SELECT 'q2', 'vector window batch')")
    return f"""
        WITH RECURSIVE {_TOKS_MAT}, {_PAIRS_MAT},
        fmeta AS MATERIALIZED (
            SELECT sha256(subject || chr(31) || 'cooccurs_with' || chr(31) || object) AS fact_id,
                   subject, object,
                   subject || ' cooccurs_with ' || object AS ftext
            FROM counts),
        {_emb_cte('qemb', qsrc)},
        {_emb_cte('femb', "(SELECT fact_id AS id, ftext AS txt FROM fmeta)")},
        {_emb_cte('pemb',
                  "(SELECT 'chunk-' || sha256(text) AS id, text AS txt FROM documents)")},
        qn AS MATERIALIZED (SELECT id, sqrt(sum(val * val)) AS n FROM qemb GROUP BY 1),
        fn AS MATERIALIZED (SELECT id, sqrt(sum(val * val)) AS n FROM femb GROUP BY 1),
        pn AS MATERIALIZED (SELECT id, sqrt(sum(val * val)) AS n FROM pemb GROUP BY 1),
        -- fact scores: every (query, fact) pair, orthogonal pairs at 0
        fdot AS (SELECT q.id AS query_id, f.id AS fact_id, sum(q.val * f.val) AS dot
                 FROM qemb q JOIN femb f USING (bucket) GROUP BY 1, 2),
        fs AS MATERIALIZED (
            SELECT qn.id AS query_id, fn.id AS fact_id,
                   coalesce(d.dot, 0.0) / (qn.n * fn.n) AS score
            FROM qn CROSS JOIN fn
            LEFT JOIN fdot d ON d.query_id = qn.id AND d.fact_id = fn.id),
        fstat AS (SELECT query_id, min(score) AS smin, max(score) AS smax
                  FROM fs GROUP BY 1),
        ftop AS (SELECT query_id, fact_id, score FROM (
                   SELECT query_id, fact_id, score,
                          row_number() OVER (PARTITION BY query_id
                                             ORDER BY score DESC, fact_id) AS rn
                   FROM fs) WHERE rn <= 5),
        fnorm AS (SELECT t.query_id, t.fact_id,
                         CASE WHEN s.smax = s.smin THEN 1.0
                              ELSE (t.score - s.smin) / (s.smax - s.smin) END AS fact_score
                  FROM ftop t JOIN fstat s USING (query_id)),
        -- phrase weights: explode top facts into subject/object phrases,
        -- ÷ chunk-degree, mean over occurrences, link_top_k mask
        deg AS MATERIALIZED (SELECT token AS phrase, count(DISTINCT chunk_id) AS cd
                             FROM toks GROUP BY 1),
        pexp AS (SELECT n.query_id, n.fact_score, p.phrase
                 FROM fnorm n JOIN fmeta m USING (fact_id),
                      unnest([lower(m.subject), lower(m.object)]) AS p(phrase)),
        pwq AS (SELECT e.query_id,
                       'entity-' || sha256(e.phrase) AS node_id, e.phrase,
                       sum(CASE WHEN coalesce(d.cd, 0) > 0
                                THEN e.fact_score / d.cd ELSE e.fact_score END)
                       / count(*) AS weight
                FROM pexp e JOIN deg d ON d.phrase = e.phrase
                GROUP BY 1, 2, 3),
        pw AS MATERIALIZED (SELECT query_id, node_id, weight FROM (
                 SELECT query_id, node_id, weight,
                        row_number() OVER (PARTITION BY query_id
                                           ORDER BY weight DESC, phrase) AS rn
                 FROM pwq) WHERE rn <= 5),
        -- DPR: normalized cosine over ALL passages
        pdot AS (SELECT q.id AS query_id, p.id AS chunk_id, sum(q.val * p.val) AS dot
                 FROM qemb q JOIN pemb p USING (bucket) GROUP BY 1, 2),
        ps AS MATERIALIZED (
            SELECT qn.id AS query_id, pn.id AS chunk_id,
                   coalesce(d.dot, 0.0) / (qn.n * pn.n) AS score
            FROM qn CROSS JOIN pn
            LEFT JOIN pdot d ON d.query_id = qn.id AND d.chunk_id = pn.id),
        pstat AS (SELECT query_id, min(score) AS smin, max(score) AS smax
                  FROM ps GROUP BY 1),
        dpr AS MATERIALIZED (
            SELECT p.query_id, p.chunk_id,
                   CASE WHEN s.smax = s.smin THEN 1.0
                        ELSE (p.score - s.smin) / (s.smax - s.smin) END AS score_norm
            FROM ps p JOIN pstat s USING (query_id)),
        -- reset vector: phrase weights + 0.05 × DPR, normalized per query
        rraw AS (SELECT query_id, node_id, sum(w) AS w FROM (
                   SELECT query_id, node_id, weight AS w FROM pw
                   UNION ALL
                   SELECT query_id, chunk_id, score_norm * 0.05 FROM dpr)
                 GROUP BY 1, 2),
        r AS MATERIALIZED (
            SELECT query_id, node_id,
                   w / sum(w) OVER (PARTITION BY query_id) AS rw
            FROM rraw),
        -- graph: fact edges (count weight, both directions) + passage
        -- edges, symmetrized conductance, out-weight normalized
        gedges AS (
            SELECT 'entity-' || sha256(subject) AS src,
                   'entity-' || sha256(object) AS dst, weight FROM counts
            UNION ALL
            SELECT 'entity-' || sha256(object), 'entity-' || sha256(subject), weight FROM counts
            UNION ALL
            SELECT chunk_id, 'entity-' || sha256(token), 1.0 FROM toks),
        sym AS MATERIALIZED (SELECT src, dst, sum(weight) AS weight FROM (
            SELECT src, dst, weight FROM gedges
            UNION ALL SELECT dst, src, weight FROM gedges) GROUP BY 1, 2),
        outw AS (SELECT src, sum(weight) AS out_w FROM sym GROUP BY 1),
        nw AS MATERIALIZED (
            SELECT e.src, e.dst, e.weight / o.out_w AS wn
            FROM sym e JOIN outw o ON o.src = e.src),
        nodes AS MATERIALIZED (SELECT DISTINCT src AS node_id FROM sym),
        qids AS MATERIALIZED (SELECT DISTINCT query_id FROM pw),
        pr(it, query_id, node_id, p) AS (
            SELECT 0, q.query_id, n.node_id, coalesce(r.rw, 0.0)
            FROM qids q CROSS JOIN nodes n
            LEFT JOIN r ON r.query_id = q.query_id AND r.node_id = n.node_id
            UNION ALL
            SELECT c.it + 1, c.query_id, c.node_id,
                   0.5 * c.contrib + 0.5 * coalesce(r.rw, 0.0)
            FROM (SELECT pr.it, pr.query_id, e.dst AS node_id,
                         sum(pr.p * e.wn) AS contrib
                  FROM pr JOIN nw e ON e.src = pr.node_id
                  WHERE pr.it < 150
                  GROUP BY 1, 2, 3) c
            LEFT JOIN r ON r.query_id = c.query_id AND r.node_id = c.node_id),
        ranked AS (
            SELECT query_id, node_id AS doc_id, p AS score,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY p DESC, node_id) AS rank
            FROM pr WHERE it = 150 AND node_id LIKE 'chunk-%')
        SELECT query_id, doc_id, round(score, 6) AS score, rank
        FROM ranked WHERE rank <= 10"""


def _retrieve_dpr_oracle_sql() -> str:
    """Exact oracle for q_retrieve_dpr — the graph-free StandardRAG /
    retrieve_dpr baseline: featurizer embeddings (bit-exact, see
    _emb_cte) → cosine against EVERY passage → full-vector per-query
    min-max normalization (misc_utils.py:106-115) → top-10, ties pinned
    (score desc, doc_id asc).  The DPR CTE chain is the same fragment
    the full-retrieve oracle uses for its reset vector's passage half."""
    qsrc = ("(SELECT 'q0' AS id, 'table row key' AS txt UNION ALL "
            "SELECT 'q1', 'merge join scan' UNION ALL "
            "SELECT 'q2', 'vector window batch')")
    return f"""
        WITH {_emb_cte('qemb', qsrc)},
        {_emb_cte('pemb',
                  "(SELECT 'chunk-' || sha256(text) AS id, text AS txt FROM documents)")},
        qn AS MATERIALIZED (SELECT id, sqrt(sum(val * val)) AS n FROM qemb GROUP BY 1),
        pn AS MATERIALIZED (SELECT id, sqrt(sum(val * val)) AS n FROM pemb GROUP BY 1),
        pdot AS (SELECT q.id AS query_id, p.id AS chunk_id, sum(q.val * p.val) AS dot
                 FROM qemb q JOIN pemb p USING (bucket) GROUP BY 1, 2),
        ps AS MATERIALIZED (
            SELECT qn.id AS query_id, pn.id AS chunk_id,
                   coalesce(d.dot, 0.0) / (qn.n * pn.n) AS score
            FROM qn CROSS JOIN pn
            LEFT JOIN pdot d ON d.query_id = qn.id AND d.chunk_id = pn.id),
        pstat AS (SELECT query_id, min(score) AS smin, max(score) AS smax
                  FROM ps GROUP BY 1),
        dpr AS (
            SELECT p.query_id, p.chunk_id,
                   CASE WHEN s.smax = s.smin THEN 1.0
                        ELSE (p.score - s.smin) / (s.smax - s.smin) END AS score_norm
            FROM ps p JOIN pstat s USING (query_id)),
        ranked AS (
            SELECT query_id, chunk_id AS doc_id, score_norm AS score,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY score_norm DESC, chunk_id) AS rank
            FROM dpr)
        SELECT query_id, doc_id, round(score, 6) AS score, rank
        FROM ranked WHERE rank <= 10"""


def _lsh_reach_cte() -> str:
    """Shared oracle CTE chain: LSH candidate pairs -> verified Jaccard
    -> symmetric pair graph -> recursive min-label reachability (the
    dedup_clusters device), reused by the dedup_corpus gate."""
    return f"""{_DARR}, {_shingle_cte(1)},
            sig AS (SELECT doc_id, {_minhash_cols(8)} FROM sh GROUP BY doc_id),
            bands AS (
                SELECT doc_id, 0 AS band, md5(mh0 || '|' || mh1) AS band_key FROM sig
                UNION ALL SELECT doc_id, 1, md5(mh2 || '|' || mh3) FROM sig
                UNION ALL SELECT doc_id, 2, md5(mh4 || '|' || mh5) FROM sig
                UNION ALL SELECT doc_id, 3, md5(mh6 || '|' || mh7) FROM sig),
            ok AS (SELECT band, band_key FROM bands GROUP BY 1, 2
                   HAVING count(*) BETWEEN 2 AND 50),
            small AS (SELECT b.* FROM bands b JOIN ok USING (band, band_key)),
            cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                     FROM small a JOIN small b USING (band, band_key)
                     WHERE a.doc_id < b.doc_id),
            sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
            inter AS (SELECT c.doc_a, c.doc_b, count(*) AS inter
                      FROM cand c
                      JOIN sh sa ON sa.doc_id = c.doc_a
                      JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
                      GROUP BY 1, 2),
            lshp AS MATERIALIZED (
                SELECT i.doc_a, i.doc_b
                FROM inter i
                JOIN sizes za ON za.doc_id = i.doc_a
                JOIN sizes zb ON zb.doc_id = i.doc_b
                WHERE i.inter::DOUBLE / (za.sz + zb.sz - i.inter)::DOUBLE >= {JACCARD_TH}),
            dnodes AS MATERIALIZED (
                SELECT doc_a AS id FROM lshp UNION SELECT doc_b FROM lshp),
            de AS MATERIALIZED (
                SELECT doc_a AS src, doc_b AS dst FROM lshp
                UNION ALL SELECT doc_b, doc_a FROM lshp),
            reach(id, lbl) AS (
                SELECT id, id FROM dnodes
                UNION
                SELECT de.dst, r.lbl FROM reach r JOIN de ON de.src = r.id)"""


def oracle_sql() -> dict[str, str]:
    corpus_path = "'org' || (doc_id % 7)::VARCHAR || '/src/f' || doc_id::VARCHAR || '.' || lang"
    simhash_votes = ", ".join(
        f"sum(CASE WHEN ('0x' || substr(h, {i + 1}, 1))::INT >= 8 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(16)
    )
    simhash_assemble = " + ".join(
        f"(CASE WHEN v{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(16)
    )
    lang_scores = " UNION ALL ".join(
        f"SELECT doc_id, '{lang}' AS lang, CASE WHEN len(arr) = 0 THEN 0.0 ELSE "
        f"len(list_filter(arr, t -> t IN ({words})))::DOUBLE / len(arr) END AS score FROM qarr"
        for lang, words in _LANG_WORDS.items()
    )
    cos_qk = _COS.format(a="qv", b="kv")
    return {
        "corpus_sha": f"""
            SELECT 'org' || (doc_id % 7)::VARCHAR AS repo,
                   'src/f' || doc_id::VARCHAR || '.' || lang AS path,
                   substr(sha256({corpus_path}), 1, 40) AS "commit",
                   lang,
                   sha256(text) AS content_sha
            FROM documents""",
        "chunks": """
            SELECT doc_id, 'chunk-' || sha256(text) AS chunk_id, lang FROM documents""",
        "entities": f"""
            WITH {_TOKS}
            SELECT DISTINCT 'entity-' || sha256(token) AS entity_id, token AS phrase FROM toks""",
        "entity_degree": f"""
            WITH {_TOKS}
            SELECT token AS phrase, count(DISTINCT chunk_id) AS chunk_degree FROM toks GROUP BY 1""",
        "fact_edges": f"""
            WITH {_TOKS}, {_PAIRS}
            SELECT subject AS src_phrase, object AS dst_phrase, weight FROM counts
            UNION ALL
            SELECT object, subject, weight FROM counts""",
        "graph_stats": f"""
            WITH {_TOKS}, {_PAIRS}
            SELECT (SELECT count(DISTINCT chunk_id) FROM toks) AS n_chunks,
                   (SELECT count(DISTINCT token) FROM toks) AS n_entities,
                   (SELECT 2 * count(*) FROM counts) AS n_fact_edge_rows,
                   (SELECT count(*) FROM toks) AS n_passage_edges""",
        "degree_dist": f"""
            WITH {_TOKS}, {_PAIRS},
            und AS (SELECT subject AS src FROM counts UNION ALL SELECT object FROM counts),
            deg AS (SELECT src, count(*) AS degree FROM und GROUP BY 1)
            SELECT degree, count(*) AS n_nodes FROM deg GROUP BY 1""",
        "ppr_step1": f"""
            WITH {_TOKS}, {_PAIRS},
            edges AS (
                SELECT subject AS src, object AS dst, weight FROM counts
                UNION ALL SELECT object, subject, weight FROM counts
                UNION ALL SELECT chunk_id, token, 1.0 FROM toks),
            sym AS (SELECT src, dst, sum(weight) AS weight FROM (
                SELECT src, dst, weight FROM edges
                UNION ALL SELECT dst, src, weight FROM edges) GROUP BY 1, 2),
            nodes AS (SELECT DISTINCT src AS node_id FROM sym),
            seeds AS (SELECT node_id FROM nodes WHERE node_id IN ('key', 'row', 'table')),
            r AS (SELECT node_id, 1.0 / (SELECT count(*) FROM seeds) AS rw FROM seeds),
            p0 AS (SELECT n.node_id, coalesce(r.rw, 0.0) AS p
                   FROM nodes n LEFT JOIN r USING (node_id)),
            outw AS (SELECT src, sum(weight) AS out_w FROM sym GROUP BY 1),
            contrib AS (
                SELECT e.dst AS node_id, sum(p0.p / o.out_w * e.weight) AS c
                FROM sym e JOIN p0 ON p0.node_id = e.src JOIN outw o ON o.src = e.src
                GROUP BY 1)
            SELECT p0.node_id,
                   round(0.5 * coalesce(c.c, 0.0) + 0.5 * coalesce(r.rw, 0.0), 9) AS p1
            FROM p0 LEFT JOIN contrib c USING (node_id) LEFT JOIN r USING (node_id)""",
        "triangle_count": f"""
            WITH {_TOKS}, {_PAIRS},
            e AS (SELECT subject AS a, object AS b FROM counts)
            SELECT count(*) AS n_triangles
            FROM e e1 JOIN e e2 ON e1.b = e2.a JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b""",
        # converged PPR: recursive-CTE power iteration to the same fixed
        # point (150 steps ⇒ residual ~2·0.85^150 ≈ 5e-11, far below both
        # the Spark side's tol=1e-12-converged answer and the 1e-6
        # rounding granularity).  AS MATERIALIZED pins each upstream CTE
        # to evaluate once — inlined they would re-run every iteration.
        "ppr_scores": f"""
            WITH RECURSIVE {_TOKS_MAT}, {_PAIRS_MAT},
            edges AS (
                SELECT subject AS src, object AS dst, weight FROM counts
                UNION ALL SELECT object, subject, weight FROM counts
                UNION ALL SELECT chunk_id, token, 1.0 FROM toks),
            sym AS MATERIALIZED (SELECT src, dst, sum(weight) AS weight FROM (
                SELECT src, dst, weight FROM edges
                UNION ALL SELECT dst, src, weight FROM edges) GROUP BY 1, 2),
            nodes AS MATERIALIZED (SELECT DISTINCT src AS node_id FROM sym),
            seeds AS (SELECT node_id FROM nodes WHERE node_id IN ('key', 'row', 'table')),
            r AS MATERIALIZED (
                SELECT node_id, 1.0 / (SELECT count(*) FROM seeds) AS rw FROM seeds),
            outw AS MATERIALIZED (SELECT src, sum(weight) AS out_w FROM sym GROUP BY 1),
            nw AS MATERIALIZED (
                SELECT e.src, e.dst, e.weight / o.out_w AS wn,
                       coalesce(r.rw, 0.0) AS dst_rw
                FROM sym e JOIN outw o ON o.src = e.src
                LEFT JOIN r ON r.node_id = e.dst),
            pr(it, node_id, p) AS (
                SELECT 0, n.node_id, coalesce(r.rw, 0.0)
                FROM nodes n LEFT JOIN r USING (node_id)
                UNION ALL
                SELECT pr.it + 1, e.dst,
                       0.85 * sum(pr.p * e.wn) + 0.15 * any_value(e.dst_rw)
                FROM pr JOIN nw e ON e.src = pr.node_id
                WHERE pr.it < 150
                GROUP BY e.dst, pr.it)
            SELECT node_id, round(p, 6) AS score FROM pr WHERE it = 150""",
        # global PageRank: the ppr_scores power iteration with a uniform
        # teleport vector over every node
        "pagerank_scores": f"""
            WITH RECURSIVE {_TOKS_MAT}, {_PAIRS_MAT},
            edges AS (
                SELECT subject AS src, object AS dst, weight FROM counts
                UNION ALL SELECT object, subject, weight FROM counts
                UNION ALL SELECT chunk_id, token, 1.0 FROM toks),
            sym AS MATERIALIZED (SELECT src, dst, sum(weight) AS weight FROM (
                SELECT src, dst, weight FROM edges
                UNION ALL SELECT dst, src, weight FROM edges) GROUP BY 1, 2),
            nodes AS MATERIALIZED (SELECT DISTINCT src AS node_id FROM sym),
            r AS MATERIALIZED (
                SELECT node_id, 1.0 / (SELECT count(*) FROM nodes) AS rw FROM nodes),
            outw AS MATERIALIZED (SELECT src, sum(weight) AS out_w FROM sym GROUP BY 1),
            nw AS MATERIALIZED (
                SELECT e.src, e.dst, e.weight / o.out_w AS wn,
                       coalesce(r.rw, 0.0) AS dst_rw
                FROM sym e JOIN outw o ON o.src = e.src
                LEFT JOIN r ON r.node_id = e.dst),
            pr(it, node_id, p) AS (
                SELECT 0, n.node_id, coalesce(r.rw, 0.0)
                FROM nodes n LEFT JOIN r USING (node_id)
                UNION ALL
                SELECT pr.it + 1, e.dst,
                       0.85 * sum(pr.p * e.wn) + 0.15 * any_value(e.dst_rw)
                FROM pr JOIN nw e ON e.src = pr.node_id
                WHERE pr.it < 150
                GROUP BY e.dst, pr.it)
            SELECT node_id, round(p, 6) AS score FROM pr WHERE it = 150""",
        # connected components: min-label transitive closure (same
        # canonical labeling — minimum node id per component)
        "components": f"""
            WITH RECURSIVE {_TOKS_MAT}, {_PAIRS_MAT},
            edges AS MATERIALIZED (
                SELECT subject AS src, object AS dst FROM counts
                UNION ALL SELECT object, subject FROM counts
                UNION ALL SELECT chunk_id AS src, token AS dst FROM toks
                UNION ALL SELECT token AS src, chunk_id AS dst FROM toks),
            nodes AS (SELECT DISTINCT src AS node_id FROM edges),
            reach(node_id, lbl) AS (
                SELECT node_id, node_id FROM nodes
                UNION
                SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node_id)
            SELECT node_id, min(lbl) AS component FROM reach GROUP BY node_id""",
        "kcore": f"""
            WITH RECURSIVE {_TOKS_MAT}, {_PAIRS_MAT},
            und AS MATERIALIZED (
                SELECT DISTINCT src, dst FROM (
                    SELECT subject AS src, object AS dst FROM counts
                    UNION ALL SELECT object, subject FROM counts
                    UNION ALL SELECT chunk_id, token FROM toks
                    UNION ALL SELECT token, chunk_id FROM toks)
                WHERE src <> dst),
            pr(it, node_id, c) AS (
                SELECT 0, src, count(*)::BIGINT FROM und GROUP BY 2
                UNION ALL
                (WITH cur AS (SELECT * FROM pr WHERE it < {KCORE_ORACLE_ROUNDS}),
                 j AS (SELECT und.src AS node_id, cur.c, cur.it
                       FROM und JOIN cur ON cur.node_id = und.dst),
                 r AS (SELECT node_id, it,
                              least(c, row_number() OVER (
                                  PARTITION BY node_id ORDER BY c DESC)) AS hc
                       FROM j),
                 h AS (SELECT node_id, max(it) AS it, max(hc)::BIGINT AS c
                       FROM r GROUP BY 1)
                 SELECT it + 1, node_id, c FROM h))
            SELECT node_id, c AS coreness FROM pr WHERE it = {KCORE_ORACLE_ROUNDS}""",
        "bfs_dist": f"""
            WITH RECURSIVE {_TOKS_MAT}, {_PAIRS_MAT},
            und AS MATERIALIZED (
                SELECT DISTINCT src, dst FROM (
                    SELECT subject AS src, object AS dst FROM counts
                    UNION ALL SELECT object, subject FROM counts
                    UNION ALL SELECT chunk_id, token FROM toks
                    UNION ALL SELECT token, chunk_id FROM toks)
                WHERE src <> dst),
            reach(node_id, d) AS (
                SELECT src, 0 FROM (SELECT DISTINCT src FROM und)
                WHERE src IN ({", ".join(f"'{s}'" for s in SEED_PHRASES)})
                UNION
                SELECT und.dst, r.d + 1 FROM reach r
                JOIN und ON und.src = r.node_id WHERE r.d < 4)
            SELECT node_id, min(d)::BIGINT AS dist FROM reach GROUP BY 1""",
        "clustering_coeff": f"""
            WITH {_TOKS}, {_PAIRS},
            und AS (SELECT subject AS src, object AS dst FROM counts
                    UNION ALL SELECT object, subject FROM counts),
            deg AS (SELECT src, count(*) AS deg FROM und GROUP BY 1),
            w AS (SELECT sum(deg * (deg - 1) / 2)::BIGINT AS n_wedges FROM deg),
            e AS (SELECT subject AS a, object AS b FROM counts),
            t AS (SELECT count(*) AS n_triangles
                  FROM e e1 JOIN e e2 ON e1.b = e2.a
                  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
            SELECT t.n_triangles, w.n_wedges,
                   round(CASE WHEN w.n_wedges > 0
                              THEN 3.0 * t.n_triangles / w.n_wedges
                              ELSE 0.0 END, 9) AS global_cc
            FROM t, w""",
        "dedup_exact": """
            SELECT sha256(text) AS content_sha, min(doc_id) AS keeper_id, count(*) AS n_dups
            FROM documents GROUP BY 1 HAVING count(*) >= 2""",
        "minhash_sigs": f"""
            WITH {_DARR}, {_shingle_cte(3)}
            SELECT doc_id, {_minhash_cols(8)} FROM sh GROUP BY doc_id""",
        "lsh_pairs": f"""
            WITH {_DARR}, {_shingle_cte(1)},
            sig AS (SELECT doc_id, {_minhash_cols(8)} FROM sh GROUP BY doc_id),
            bands AS (
                SELECT doc_id, 0 AS band, md5(mh0 || '|' || mh1) AS band_key FROM sig
                UNION ALL SELECT doc_id, 1, md5(mh2 || '|' || mh3) FROM sig
                UNION ALL SELECT doc_id, 2, md5(mh4 || '|' || mh5) FROM sig
                UNION ALL SELECT doc_id, 3, md5(mh6 || '|' || mh7) FROM sig),
            ok AS (SELECT band, band_key FROM bands GROUP BY 1, 2
                   HAVING count(*) BETWEEN 2 AND 50),
            small AS (SELECT b.* FROM bands b JOIN ok USING (band, band_key)),
            cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                     FROM small a JOIN small b USING (band, band_key)
                     WHERE a.doc_id < b.doc_id),
            sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
            inter AS (SELECT c.doc_a, c.doc_b, count(*) AS inter
                      FROM cand c
                      JOIN sh sa ON sa.doc_id = c.doc_a
                      JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
                      GROUP BY 1, 2)
            SELECT i.doc_a, i.doc_b,
                   i.inter::DOUBLE / (za.sz + zb.sz - i.inter)::DOUBLE AS jaccard
            FROM inter i
            JOIN sizes za ON za.doc_id = i.doc_a
            JOIN sizes zb ON zb.doc_id = i.doc_b
            WHERE i.inter::DOUBLE / (za.sz + zb.sz - i.inter)::DOUBLE >= {JACCARD_TH}""",
        # transitive closure over the SAME verified LSH pair set as
        # `lsh_pairs`, canonical label = cluster-minimum doc_id
        "dedup_clusters": f"""
            WITH RECURSIVE {_lsh_reach_cte()}
            SELECT id AS doc_id, min(lbl) AS cluster_id,
                   (id = min(lbl)) AS is_keeper
            FROM reach GROUP BY id""",
        "dedup_corpus": f"""
            WITH RECURSIVE {_lsh_reach_cte()},
            clusters AS (SELECT id, min(lbl) AS lbl FROM reach GROUP BY id),
            near_losers AS (SELECT id AS doc_id FROM clusters WHERE id <> lbl),
            ex AS (SELECT doc_id, sha256(text) AS h FROM documents),
            exact_losers AS (
                SELECT e.doc_id FROM ex e
                JOIN (SELECT h, min(doc_id) AS keeper FROM ex GROUP BY h) k
                  ON k.h = e.h
                WHERE e.doc_id <> k.keeper)
            SELECT doc_id FROM documents
            WHERE doc_id NOT IN (SELECT doc_id FROM near_losers)
              AND doc_id NOT IN (SELECT doc_id FROM exact_losers)""",
        "dataset_split": """
            SELECT doc_id,
                   CASE WHEN u < 0.9 THEN 'train'
                        WHEN u < 0.95 THEN 'val'
                        ELSE 'test' END AS split
            FROM (SELECT doc_id,
                         ('0x' || substr(md5(doc_id::VARCHAR || ':42'), 1, 8))::BIGINT
                         / 4294967296.0 AS u
                  FROM documents)""",
        "corpus_profile": """
            SELECT lang AS stratum, count(*) AS n_docs,
                   sum(n_chars)::DOUBLE AS total_chars,
                   quantile_cont(n_chars::DOUBLE, 0.5) AS p50,
                   quantile_cont(n_chars::DOUBLE, 0.9) AS p90,
                   quantile_cont(n_chars::DOUBLE, 0.99) AS p99
            FROM documents GROUP BY lang""",
        "jaccard_pairs": f"""
            WITH {_DARR}, {_shingle_cte(1)},
            rare AS (SELECT shingle FROM sh GROUP BY 1 HAVING count(*) <= 1000),
            shr AS (SELECT sh.* FROM sh JOIN rare USING (shingle)),
            inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
                      FROM shr a JOIN shr b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
            sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1)
            SELECT i.doc_a, i.doc_b,
                   i.inter::DOUBLE / (za.sz + zb.sz - i.inter)::DOUBLE AS jaccard
            FROM inter i
            JOIN sizes za ON za.doc_id = i.doc_a
            JOIN sizes zb ON zb.doc_id = i.doc_b
            WHERE i.inter::DOUBLE / (za.sz + zb.sz - i.inter)::DOUBLE >= {JACCARD_TH}""",
        "simhash_sigs": f"""
            WITH tok AS (SELECT DISTINCT doc_id, t.s AS tok
                         FROM (SELECT doc_id, string_split(trim(regexp_replace(lower(text),
                              '[^a-z0-9]+', ' ', 'g')), ' ') AS arr FROM documents) d,
                              unnest(arr) AS t(s) WHERE t.s <> ''),
            h AS (SELECT doc_id, md5(tok) AS h FROM tok),
            v AS (SELECT doc_id, {simhash_votes} FROM h GROUP BY 1)
            SELECT doc_id, ({simhash_assemble})::BIGINT AS simhash FROM v""",
        "lsh_ann": _lsh_oracle_sql(),
        "ivf_ann": _ivf_oracle_sql(),
        "ivf_index_ann": _ivf_oracle_sql(),
        "retrieve": _retrieve_oracle_sql(),
        "retrieve_dpr": _retrieve_dpr_oracle_sql(),
        "lpa": _lpa_oracle_sql(),
        "synonym_edges": f"""
            WITH v AS MATERIALIZED (
                SELECT printf('vec%04d', vec_id) AS id, embedding::DOUBLE[] AS ve
                FROM embeddings),
            s AS (SELECT q.id AS src, k.id AS dst,
                         {_COS.format(a="q.ve", b="k.ve")} AS cos
                  FROM v q, v k),
            cand AS (SELECT src, dst, cos,
                            row_number() OVER (PARTITION BY src
                                               ORDER BY cos DESC, dst) AS knn_rank
                     FROM s),
            acc AS (SELECT src, dst, cos FROM cand
                    WHERE knn_rank <= 2047 AND cos >= {NEARDUP_COS} AND dst <> src),
            r AS (SELECT src, dst, cos,
                         row_number() OVER (PARTITION BY src
                                            ORDER BY cos DESC, dst) AS nn_rank
                  FROM acc)
            SELECT src, dst, round(cos, 6) AS weight, 'synonym' AS relation
            FROM r WHERE nn_rank <= 101""",
        "embed_neardup": f"""
            WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings),
            s AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                         {_COS.format(a="a.ve", b="b.ve")} AS cos
                  FROM v a, v b WHERE a.vec_id < b.vec_id)
            SELECT id_a, id_b, round(cos, 6) AS cos FROM s WHERE cos >= {NEARDUP_COS}""",
        "ann_topk": f"""
            WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id < 5),
            k AS (SELECT vec_id, embedding::DOUBLE[] AS kv FROM embeddings),
            s AS (SELECT query_id, vec_id, {cos_qk} AS cos FROM q, k),
            r AS (SELECT query_id, vec_id, cos,
                         row_number() OVER (PARTITION BY query_id
                                            ORDER BY cos DESC, vec_id) AS rank
                  FROM s)
            SELECT query_id, vec_id, round(cos, 6) AS cos, rank FROM r WHERE rank <= 10""",
        "knn_arrow_topk": f"""
            WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id < 5),
            k AS (SELECT vec_id, embedding::DOUBLE[] AS kv FROM embeddings),
            s AS (SELECT query_id, vec_id, {cos_qk} AS cos FROM q, k),
            r AS (SELECT query_id, vec_id, cos,
                         row_number() OVER (PARTITION BY query_id
                                            ORDER BY cos DESC, vec_id) AS rank
                  FROM s)
            SELECT query_id, vec_id, round(cos, 6) AS cos, rank FROM r WHERE rank <= 10""",
        "token_counts": """
            SELECT doc_id,
                   len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS ws_tokens,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS bpe_tokens,
                   length(text) AS chars
            FROM documents""",
        "quality": f"""
            WITH {_QARR},
            base AS (SELECT doc_id,
                length(text) AS n_chars,
                len(arr) AS n_words,
                CASE WHEN len(arr) > 0
                     THEN length(array_to_string(arr, ''))::DOUBLE / len(arr)
                     ELSE 0.0 END AS mean_word_len,
                CASE WHEN length(text) > 0
                     THEN length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))::DOUBLE / length(text)
                     ELSE 0.0 END AS punct_ratio,
                CASE WHEN len(arr) > 0
                     THEN len(list_filter(arr, t -> t IN ({_EN_STOP})))::DOUBLE / len(arr)
                     ELSE 0.0 END AS stopword_ratio,
                CASE WHEN len(arr) > 0
                     THEN len(list_distinct(arr))::DOUBLE / len(arr)
                     ELSE 0.0 END AS uniq_ratio
                FROM qarr)
            SELECT doc_id, n_chars, n_words, mean_word_len, punct_ratio, stopword_ratio,
                   uniq_ratio,
                   least(n_words::DOUBLE / 50.0, 1.0) * 0.25
                   + (1.0 - least(punct_ratio * 4.0, 1.0)) * 0.25
                   + least(stopword_ratio * 5.0, 1.0) * 0.25
                   + uniq_ratio * 0.25 AS quality
            FROM base""",
        "langid": f"""
            WITH {_QARR},
            s AS ({lang_scores}),
            r AS (SELECT doc_id, lang, score,
                         row_number() OVER (PARTITION BY doc_id
                                            ORDER BY score DESC, lang DESC) AS rn
                  FROM s)
            SELECT doc_id, lang AS pred_lang, score AS lang_score FROM r WHERE rn = 1""",
        "fingerprints": f"""
            WITH {_QARR},
            g AS (SELECT doc_id, min(md5(array_to_string(arr[i.i:i.i+2], ' '))) AS mg
                  FROM qarr, unnest(range(1, len(arr) - 1)) AS i(i) GROUP BY 1)
            SELECT q.doc_id, sha256(q.text) AS content_sha, g.mg AS min_shingle_hash
            FROM qarr q LEFT JOIN g ON g.doc_id = q.doc_id""",
        "pii_scrub": _pii_oracle(),
        # P9 — oracle states the reference-algorithm outcome per branch:
        # b=0 truncated+repaired keeps the first two entities / first two
        # triples, b=1 has no JSON (no rows), the rest parse fully
        "llm_entities": """
            WITH d AS (SELECT doc_id, doc_id % 4 AS b,
                              substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS h
                       FROM documents),
            e AS (SELECT doc_id,
                         CASE WHEN b = 0
                              THEN ['tok1_' || h, 'tok2_' || h]
                              ELSE ['tok1_' || h, 'tok2_' || h,
                                    'tok3_' || h, 'tok4_' || h]
                         END AS ents
                  FROM d WHERE b <> 1)
            SELECT doc_id, unnest(ents) AS entity FROM e""",
        "llm_triples": """
            WITH d AS (SELECT doc_id,
                              substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS h
                       FROM documents WHERE doc_id % 4 <> 1)
            SELECT doc_id, 's_' || h AS subject, 'rel' AS predicate,
                   'o_' || h AS object FROM d
            UNION ALL
            SELECT doc_id, 'x_' || h, 'rel2', 'y_' || h FROM d""",
        "decontam": f"""
            WITH {_DARR}, {_shingle_cte(5)},
            bg AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 20 = 0),
            sizes AS (SELECT doc_id, count(*) AS n_grams FROM sh GROUP BY 1),
            hits AS (SELECT sh.doc_id, count(*) AS n_hits
                     FROM sh JOIN bg USING (shingle) GROUP BY 1)
            SELECT d.doc_id,
                   coalesce(s.n_grams, 0) AS n_grams,
                   coalesce(h.n_hits, 0) AS n_hits,
                   CASE WHEN coalesce(s.n_grams, 0) > 0
                        THEN coalesce(h.n_hits, 0)::DOUBLE / s.n_grams
                        ELSE 0.0 END AS contam_frac,
                   coalesce(h.n_hits, 0) > 0 AS contaminated
            FROM documents d
            LEFT JOIN sizes s USING (doc_id) LEFT JOIN hits h USING (doc_id)""",
        "event_windows": """
            SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
                   event_type, count(*) AS n_events,
                   sum(value::DECIMAL(18,2))::DOUBLE AS sum_value,
                   sum(value::DECIMAL(18,2))::DOUBLE / count(*) AS avg_value
            FROM events GROUP BY 1, 2""",
        "sessions": """
            WITH l AS (SELECT user_id, event_id, ts, value, epoch_us(ts) AS us,
                              lag(epoch_us(ts)) OVER
                                (PARTITION BY user_id ORDER BY ts, event_id) AS pus
                       FROM events),
            s AS (SELECT *, sum(CASE WHEN pus IS NULL OR us - pus > 1800000000
                                     THEN 1 ELSE 0 END)
                            OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_seq
                  FROM l)
            SELECT user_id, session_seq::BIGINT AS session_seq,
                   min(ts) AS session_start, max(ts) AS session_end,
                   count(*) AS n_events,
                   sum(value::DECIMAL(18,2))::DOUBLE AS total_value
            FROM s GROUP BY 1, 2""",
        "strat_sample": """
            SELECT doc_id, source FROM (
                SELECT doc_id, source,
                       ('0x' || substr(md5(doc_id::VARCHAR || ':42'), 1, 8))::BIGINT
                       / 4294967296.0 AS u
                FROM documents)
            WHERE u < CASE source WHEN 'src0' THEN 0.8 WHEN 'src1' THEN 0.5
                                  WHEN 'src2' THEN 0.25 WHEN 'src3' THEN 0.9
                                  WHEN 'src4' THEN 0.1 ELSE 0.0 END""",
        "repetition": f"""
            WITH {_QARR},
            l AS (SELECT doc_id,
                         list_filter(string_split(text, chr(10)), x -> trim(x) <> '') AS lines,
                         arr
                  FROM qarr)
            SELECT doc_id,
                   len(lines) AS n_lines,
                   CASE WHEN len(lines) > 0
                        THEN 1.0 - len(list_distinct(lines))::DOUBLE / len(lines)
                        ELSE 0.0 END AS dup_line_frac,
                   CASE WHEN len(arr) > 0
                        THEN list_max(list_transform(list_distinct(arr),
                                 x -> len(list_filter(arr, y -> y = x))))::DOUBLE / len(arr)
                        ELSE 0.0 END AS top_word_frac
            FROM l""",
        "eval_recall": """
            WITH toks(tok) AS (VALUES ('key'), ('table'), ('row')),
            occ AS (SELECT t.tok AS query_id, d.doc_id::VARCHAR AS doc_id,
                    ((length(d.text) - length(replace(d.text, t.tok, '')))
                     / length(t.tok))::INT AS occ
                    FROM documents d, toks t),
            retrieved AS (SELECT query_id, doc_id, rank FROM (
                SELECT query_id, doc_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY occ DESC, doc_id) AS rank
                FROM occ WHERE occ >= 1) WHERE rank <= 20),
            gold AS (SELECT query_id, doc_id FROM occ WHERE occ >= 2),
            gold_sizes AS (SELECT query_id, count(*) AS n_gold FROM gold GROUP BY 1),
            hits AS (SELECT r.query_id, r.rank FROM retrieved r
                     JOIN gold g ON g.query_id = r.query_id AND g.doc_id = r.doc_id),
            ks(k) AS (VALUES (1), (5), (10), (20)),
            hc AS (SELECT ks.k, h.query_id, count(*) AS n_hit
                   FROM ks JOIN hits h ON h.rank <= ks.k GROUP BY 1, 2),
            pooled AS (SELECT ks.k,
                              avg(coalesce(hc.n_hit, 0)::DOUBLE / gs.n_gold) AS recall
                       FROM ks CROSS JOIN gold_sizes gs
                       LEFT JOIN hc ON hc.k = ks.k AND hc.query_id = gs.query_id
                       GROUP BY 1)
            SELECT k, round(recall, 9) AS recall FROM pooled""",
        # fake-decoder features are sha256-derived from a sha256-chain
        # payload, so the whole media pipeline reproduces in SQL: payload
        # = concat of 8 sha256 hex digests (ASCII), digest = sha256 of
        # that string, f0 = little-endian first-uint64 % 10000 / 10000
        "media_features": f"""
            WITH m AS (SELECT unnest(range(0, 64)) AS media_id),
            dig AS (SELECT media_id,
                           (['image', 'audio', 'video'])[(media_id % 3) + 1] AS kind,
                           sha256({" || ".join(f"sha256('5:' || media_id::VARCHAR || ':{k}')" for k in range(8))}) AS h
                    FROM m)
            SELECT media_id, kind, 16 AS dim,
                   round((('0x' || {"||".join(f"substr(h, {j}, 2)" for j in (15, 13, 11, 9, 7, 5, 3, 1))})::UBIGINT
                          % 10000) / 10000.0, 6) AS f0
            FROM dig""",
        "qa_em": """
            WITH pairs AS (
                SELECT doc_id::VARCHAR AS query_id, text AS answer,
                       CASE WHEN doc_id % 2 = 0 THEN text
                            ELSE array_to_string(list_reverse(string_split(text, ' ')), ' ')
                       END AS gold_answer
                FROM documents),
            norm AS (SELECT query_id,
                trim(regexp_replace(regexp_replace(regexp_replace(lower(answer),
                     '[^a-z0-9 ]', ' ', 'g'), '\\b(a|an|the)\\b', ' ', 'g'),
                     ' +', ' ', 'g')) AS na,
                trim(regexp_replace(regexp_replace(regexp_replace(lower(gold_answer),
                     '[^a-z0-9 ]', ' ', 'g'), '\\b(a|an|the)\\b', ' ', 'g'),
                     ' +', ' ', 'g')) AS ng
                FROM pairs),
            per AS (SELECT query_id, max(CASE WHEN na = ng THEN 1.0 ELSE 0.0 END) AS em
                    FROM norm GROUP BY 1)
            SELECT round(avg(em), 9) AS exact_match FROM per""",
        "qa_context": """
            WITH toks(tok) AS (VALUES ('key'), ('table'), ('row')),
            occ AS (SELECT t.tok AS query_id, d.doc_id::VARCHAR AS doc_id, d.text,
                    ((length(d.text) - length(replace(d.text, t.tok, '')))
                     / length(t.tok))::INT AS occ
                    FROM documents d, toks t),
            retrieved AS (SELECT query_id, doc_id, text, rank FROM (
                SELECT query_id, doc_id, text,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY occ DESC, doc_id) AS rank
                FROM occ WHERE occ >= 1) WHERE rank <= 5),
            ctx AS (SELECT query_id, count(*) AS n_passages,
                           string_agg('Wikipedia Title: ' || text
                                      || chr(10) || chr(10), ''
                                      ORDER BY rank) AS ctxs
                    FROM retrieved GROUP BY 1),
            q AS (SELECT tok AS query_id,
                         'What does "' || tok || '" refer to?' AS question
                  FROM toks),
            prompts AS (SELECT q.query_id,
                               coalesce(c.n_passages, 0) AS n_passages,
                               coalesce(c.ctxs, '') || 'Question: ' || q.question
                               || chr(10) || 'Thought: ' AS prompt
                        FROM q LEFT JOIN ctx c USING (query_id)),
            resp AS (SELECT query_id, n_passages, prompt,
                            'Thought: read ' || n_passages::VARCHAR
                            || ' passages.' || chr(10) || 'Answer: ' ||
                            CASE WHEN n_passages > 0
                                 THEN substr(split_part(prompt,
                                             chr(10) || chr(10), 1), 18)
                                 ELSE '' END AS response
                     FROM prompts),
            ans AS (SELECT query_id, n_passages, prompt,
                           CASE WHEN len(string_split(response, 'Answer:')) >= 2
                                THEN regexp_replace(regexp_replace(
                                     string_split(response, 'Answer:')[2],
                                     '^\\s+', ''), '\\s+$', '')
                                ELSE response END AS answer
                    FROM resp)
            SELECT query_id, n_passages, sha256(prompt) AS prompt_sha,
                   sha256(answer) AS answer_sha
            FROM ans""",
    }
