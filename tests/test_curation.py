"""Decontamination + stratified-sampling operators vs hand-computed facts."""

import hashlib

import pytest

from hipporag_spark.curation import decontaminate, stratified_sample

BENCH = [
    (100, "the quick brown fox jumps over the lazy dog"),
]
DOCS = [
    # contains the benchmark 4-gram "quick brown fox jumps" twice-normalized
    (0, "A QUICK brown fox JUMPS over fences daily, it is said"),
    # exact copy of the benchmark row -> fully contaminated
    (1, "the quick brown fox jumps over the lazy dog"),
    # no overlap
    (2, "completely unrelated words about spark catalyst planning"),
    # too short to form a 4-gram
    (3, "tiny doc"),
]


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    bench = spark.createDataFrame(BENCH, "doc_id long, text string")
    return docs, bench


def test_decontaminate_counts(spark, frames):
    docs, bench = frames
    out = decontaminate(docs, bench, n=4).toPandas().set_index("doc_id")
    # doc 0 normalizes to 11 tokens -> 8 distinct 4-grams, 2 of which
    # ("a quick brown fox" no;) -- grams present in benchmark:
    # "quick brown fox jumps", "brown fox jumps over" -> 2 hits
    assert out.loc[0, "n_hits"] == 2
    assert out.loc[0, "contaminated"]
    assert out.loc[0, "contam_frac"] == pytest.approx(2 / out.loc[0, "n_grams"])
    # exact copy: every 4-gram hits
    assert out.loc[1, "n_hits"] == out.loc[1, "n_grams"] > 0
    assert out.loc[1, "contam_frac"] == 1.0
    assert out.loc[2, "n_hits"] == 0 and not out.loc[2, "contaminated"]
    assert out.loc[3, "n_grams"] == 0 and out.loc[3, "contam_frac"] == 0.0
    # one row per corpus doc, always
    assert sorted(out.index) == [0, 1, 2, 3]


def test_decontaminate_broadcasts_benchmark(spark, frames):
    docs, bench = frames
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        decontaminate(docs, bench, n=4).explain("formatted")
    assert "BroadcastHashJoin" in buf.getvalue()


def _u(doc_id, seed=42):
    h = hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()[:8]
    return int(h, 16) / 2**32


def test_stratified_sample_exact_membership(spark):
    rows = [(i, "s" + str(i % 3)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    rates = {"s0": 0.5, "s1": 1.0}  # s2 missing -> dropped
    got = sorted(
        x["doc_id"]
        for x in stratified_sample(df, rates, "source").collect()
    )
    want = sorted(
        i for i, s in rows if _u(i) < rates.get(s, 0.0)
    )
    assert got == want
    # every s1 row kept (rate 1.0 > any u), every s2 row dropped
    assert all(i % 3 != 2 for i in got)
    assert sum(1 for i in got if i % 3 == 1) == 100


def test_stratified_sample_partition_invariant(spark):
    rows = [(i, "a" if i % 2 else "b") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    rates = {"a": 0.3, "b": 0.7}
    one = sorted(x["doc_id"] for x in
                 stratified_sample(df.coalesce(1), rates, "source").collect())
    many = sorted(x["doc_id"] for x in
                  stratified_sample(df.repartition(16), rates, "source").collect())
    assert one == many
