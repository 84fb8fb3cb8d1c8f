"""Dedup operators vs plain-python references on hand-built corpora."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from hipporag_spark import dedup as dd

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),          # exact dup of 0
    (2, "the quick brown fox leaps over the lazy dog"),          # near dup
    (3, "completely different text about spark dataframes here"),
    (4, "tiny"),                                                  # < 3 tokens
    (5, "Spark DataFrames!! here; completely different text about"),  # shuffled 3
    (6, ""),                                                      # empty
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_shingles(text, n):
    import re

    toks = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().split(" ")
    if toks == [""]:
        toks = []
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_exact_duplicates(spark, docs):
    out = dd.exact_duplicates(docs).collect()
    assert len(out) == 1
    assert out[0]["keeper_id"] == 0 and out[0]["n_dups"] == 2


def test_shingles_short_doc_guard(spark, docs):
    sh = dd.shingles(docs, n=3).toPandas()
    # doc 4 ("tiny") and doc 6 ("") produce no 3-gram shingles
    assert set(sh["doc_id"]) == {0, 1, 2, 3, 5}
    for did, text in DOCS:
        got = set(sh[sh.doc_id == did]["shingle"])
        assert got == _py_shingles(text, 3), did


def test_minhash_identical_docs_equal_sigs(spark, docs):
    sig = dd.minhash_signatures(dd.shingles(docs, n=3), num_perm=8).toPandas()
    s = sig.set_index("doc_id")
    assert (s.loc[0] == s.loc[1]).all()
    assert not (s.loc[0] == s.loc[3]).all()


def test_lsh_finds_planted_near_dup(spark, docs):
    pairs = dd.lsh_candidate_pairs(
        dd.shingles(docs, n=1), num_perm=8, bands=4, threshold=0.6
    ).toPandas()
    found = set(zip(pairs.doc_a, pairs.doc_b))
    assert (0, 1) in found           # exact dup always survives
    assert (3, 5) in found           # token-set permutation: jaccard 1.0 at n=1
    jac = dict(zip(zip(pairs.doc_a, pairs.doc_b), pairs.jaccard))
    assert jac[(0, 1)] == 1.0
    assert jac[(3, 5)] == 1.0


def test_jaccard_pairs_matches_python(spark, docs):
    out = dd.jaccard_pairs(docs, n=1, threshold=0.0 + 1e-9).toPandas()
    got = {(r.doc_a, r.doc_b): r.jaccard for r in out.itertuples()}
    sets = {d: _py_shingles(t, 1) for d, t in DOCS}
    for a in range(7):
        for b in range(a + 1, 7):
            inter = len(sets[a] & sets[b])
            if inter == 0:
                assert (a, b) not in got
            else:
                expect = inter / len(sets[a] | sets[b])
                assert got[(a, b)] == pytest.approx(expect, abs=1e-12)


def test_simhash_identical_and_near(spark, docs):
    sig = dd.simhash_signatures(docs, bits=16).toPandas().set_index("doc_id")["simhash"]
    assert sig[0] == sig[1]
    assert sig[3] == sig[5]  # same token set → same simhash
    ham = bin(int(sig[0]) ^ int(sig[2])).count("1")
    assert ham <= 6  # near-dup: small hamming distance


def test_embedding_neardup_vs_numpy(spark):
    rng = np.random.default_rng(3)
    base = rng.standard_normal((4, 8)).astype(np.float32)
    vecs = np.vstack([base, base[0] + rng.standard_normal(8).astype(np.float32) * 0.01])
    pdf = pd.DataFrame({"vec_id": range(5), "embedding": [v.tolist() for v in vecs]})
    emb = spark.createDataFrame(pdf)
    out = dd.embedding_neardup_pairs(emb, threshold=0.99).toPandas()
    v = vecs.astype(np.float64)
    cos = (v @ v.T) / (np.linalg.norm(v, axis=1)[:, None] * np.linalg.norm(v, axis=1)[None, :])
    expect = {(a, b) for a in range(5) for b in range(a + 1, 5) if cos[a, b] >= 0.99}
    assert set(zip(out.id_a, out.id_b)) == expect
    assert expect == {(0, 4)}


def test_duplicate_clusters_transitive(spark):
    """A≈B, B≈C (A and C never paired) must land in ONE cluster with a
    single keeper — the transitive-closure property pairwise dedup lacks."""
    from hipporag_spark.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long")
    for mode in ("local", "star", "dataframe"):
        got = {r["doc_id"]: (r["cluster_id"], r["is_keeper"])
               for r in duplicate_clusters(spark, pairs, mode=mode).collect()}
        assert got == {1: (1, True), 2: (1, False), 3: (1, False),
                       10: (10, True), 11: (10, False)}, mode


def test_dataset_split_deterministic_and_proportional(spark):
    from hipporag_spark.textstats import dataset_split

    docs = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: r["split"] for r in dataset_split(docs).collect()}
    b = {r["doc_id"]: r["split"] for r in dataset_split(docs).collect()}
    assert a == b  # rerun-stable
    from collections import Counter

    c = Counter(a.values())
    assert 0.85 < c["train"] / 2000 < 0.95
    assert 0.02 < c["val"] / 2000 < 0.09
    assert 0.02 < c["test"] / 2000 < 0.09
    # adding documents never moves existing ones (hash is per-id)
    more = spark.range(0, 4000).select(F.col("id").alias("doc_id"))
    m = {r["doc_id"]: r["split"] for r in dataset_split(more).collect()}
    assert all(m[k] == v for k, v in a.items())


def test_embedding_neardup_lsh_mode_matches_exact(spark):
    """mode='lsh' (the scale path) recovers the exact near-dup pair set on
    a clustered input, and its plan contains NO cartesian product
    (VERDICT r2 #6)."""
    rng = np.random.default_rng(7)
    base = rng.standard_normal((12, 16)).astype(np.float32)
    rows = []
    vid = 0
    for i in range(12):
        for _ in range(3):  # 3 near-copies per base vector
            rows.append((vid, (base[i] + rng.standard_normal(16).astype(np.float32) * 0.005).tolist()))
            vid += 1
    emb = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    exact = dd.embedding_neardup_pairs(emb, threshold=0.99, mode="exact")
    lsh = dd.embedding_neardup_pairs(emb, threshold=0.99, mode="lsh")
    e = {(r["id_a"], r["id_b"]) for r in exact.collect()}
    l = {(r["id_a"], r["id_b"]) for r in lsh.collect()}
    assert len(e) >= 12  # every cluster contributes pairs
    assert l == e  # full recall at near-dup cosine on this input
    import contextlib
    import io

    def plan_of(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    lp = plan_of(lsh)
    assert "CartesianProduct" not in lp and "NestedLoop" not in lp
    # the pinned oracle mode IS all-pairs (cartesian, or its broadcast
    # nested-loop form when one side is small enough to broadcast)
    ep = plan_of(exact)
    assert "CartesianProduct" in ep or "NestedLoop" in ep


def test_dedup_corpus_removes_exact_and_transitive(spark):
    """dedup_corpus = docs minus exact losers minus transitive near-dup
    losers, keeping the min doc_id of every group.  Chain a~b~c with
    jaccard(a,c) possibly below threshold must still collapse to one
    keeper (the transitive property pairwise filters miss)."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, base),
        (1, base),                                    # exact dup of 0
        (2, base.replace("kappa", "lambda")),         # near dup of 0
        (3, base.replace("kappa", "lambda")
               .replace("alpha", "omega")),           # near dup of 2
        (4, "completely unrelated text about spark shuffles and joins"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dd.jaccard_pairs(docs, n=1, threshold=0.7)
    got = sorted(r["doc_id"] for r in
                 dd.dedup_corpus(spark, docs, pairs).collect())
    # 1 exact-loses to 0; 2 and 3 transitively cluster with 0 (cluster
    # min = 0) and lose; 4 survives alone
    assert got == [0, 4], got
    # full input schema is preserved
    out = dd.dedup_corpus(spark, docs, pairs)
    assert out.columns == docs.columns


def test_lsh_pairs_match_python_mirror_randomized(spark):
    """Seeded randomized sweep: lsh_candidate_pairs over random shingle
    tables must equal an exact Python mirror of the same banded-MinHash
    scheme (same keyed md5 per permutation, same band keys, same
    [2, max_bucket] bucket filter, same exact-Jaccard verification) —
    the same sweep discipline the LPA randomized test uses."""
    import hashlib
    import itertools
    import random

    def mirror(shingle_sets, num_perm, bands, threshold, max_bucket):
        rows_per_band = num_perm // bands
        md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
        sig = {
            d: [min(md5(f"{j}:{s}") for s in ss) for j in range(num_perm)]
            for d, ss in shingle_sets.items() if ss
        }
        buckets = {}
        for d, mh in sig.items():
            for b in range(bands):
                key = (b, md5("|".join(mh[b * rows_per_band:(b + 1) * rows_per_band])))
                buckets.setdefault(key, []).append(d)
        cand = set()
        for members in buckets.values():
            if 2 <= len(members) <= max_bucket:
                for x, y in itertools.combinations(sorted(members), 2):
                    cand.add((x, y))
        out = {}
        for x, y in cand:
            a, b = shingle_sets[x], shingle_sets[y]
            j = len(a & b) / len(a | b)
            if j >= threshold:
                out[(x, y)] = j
        return out

    rng = random.Random(1234)
    universe = [f"tok{i}" for i in range(40)]
    for case in range(4):
        num_perm, bands = rng.choice([(8, 4), (12, 3), (8, 2)])
        threshold = rng.choice([0.3, 0.5, 0.7])
        n_docs = rng.randint(8, 16)
        shingle_sets = {}
        base = set(rng.sample(universe, rng.randint(5, 12)))
        for d in range(n_docs):
            if rng.random() < 0.5:  # perturbed copy of base → collisions
                ss = set(base)
                for _ in range(rng.randint(0, 3)):
                    if rng.random() < 0.5 and len(ss) > 2:
                        ss.discard(rng.choice(sorted(ss)))
                    else:
                        ss.add(rng.choice(universe))
            else:
                ss = set(rng.sample(universe, rng.randint(3, 12)))
            shingle_sets[d] = ss
        sdf = spark.createDataFrame(
            [(d, s) for d, ss in shingle_sets.items() for s in ss],
            "doc_id long, shingle string",
        )
        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in dd.lsh_candidate_pairs(
                sdf, num_perm=num_perm, bands=bands, threshold=threshold
            ).collect()
        }
        want = mirror(shingle_sets, num_perm, bands, threshold, 50)
        assert set(got) == set(want), (case, set(got) ^ set(want))
        for k in want:
            assert abs(got[k] - want[k]) < 1e-12, (case, k)
