"""Text-analysis operators vs plain-python references."""

import pytest

from hipporag_spark import textstats as ts

DOCS = [
    (0, "The quick brown fox and the lazy dog, with style."),
    (1, "der hund und die katze ist nicht mit dem ball"),
    (2, "le chat est dans la maison pour les vacances"),
    (3, "def main(): return import os  # python code self class"),
    (4, ""),
    (5, "aaa bbb aaa bbb aaa bbb"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_token_counts(spark, docs):
    out = ts.token_counts(docs).toPandas().set_index("doc_id")
    assert out.loc[0, "ws_tokens"] == 10
    assert out.loc[4, "ws_tokens"] == 0
    assert out.loc[0, "chars"] == len(DOCS[0][1])
    # BPE-ish: "def main(): return import os  # python code self class"
    # words: def main return import os python code self class (9) + ( ) : # (4)
    assert out.loc[3, "bpe_tokens"] == 13


def test_quality_bounds_and_uniq(spark, docs):
    out = ts.quality_scores(docs).toPandas().set_index("doc_id")
    assert ((out["quality"] >= 0) & (out["quality"] <= 1)).all()
    assert out.loc[5, "uniq_ratio"] == pytest.approx(2 / 6)
    # empty doc: only the no-punctuation term contributes → 0.25
    assert out.loc[4, "n_words"] == 0 and out.loc[4, "quality"] == pytest.approx(0.25)
    # doc 0 has 3 English stopwords (the, and, the) + "with" → 4/10
    assert out.loc[0, "stopword_ratio"] == pytest.approx(4 / 10)


def test_language_id(spark, docs):
    out = ts.language_id(docs).toPandas().set_index("doc_id")
    assert out.loc[0, "pred_lang"] == "en"
    assert out.loc[1, "pred_lang"] == "de"
    assert out.loc[2, "pred_lang"] == "fr"
    assert out.loc[3, "pred_lang"] == "code"


def test_fingerprints(spark, docs):
    import hashlib

    out = ts.fingerprints(docs, n=3).toPandas().set_index("doc_id")
    assert out.loc[0, "content_sha"] == hashlib.sha256(DOCS[0][1].encode()).hexdigest()
    # empty doc → no shingles → null fingerprint
    assert out.loc[4, "min_shingle_hash"] is None
    toks = "the quick brown fox and the lazy dog with style".split()
    grams = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
    expect = min(hashlib.md5(g.encode()).hexdigest() for g in grams)
    assert out.loc[0, "min_shingle_hash"] == expect


PII_DOCS = [
    (10, "mail alice.smith+x@example.co.uk or bob@test.org today"),
    (11, "server at 10.0.0.1 and 192.168.100.200, call 555-123-4567"),
    (12, "account 123456789012 ref 999888777, short 12345 stays"),
    (13, "plain text with no pii at all"),
    (14, ""),
]


@pytest.fixture(scope="module")
def pii_docs(spark):
    return spark.createDataFrame(PII_DOCS, "doc_id long, text string")


def test_pii_scrub_counts_and_masking(spark, pii_docs):
    out = ts.pii_scrub(pii_docs).toPandas().set_index("doc_id")
    assert out.loc[10, "n_email"] == 2
    assert "<EMAIL>" in out.loc[10, "text_scrubbed"]
    assert "alice" not in out.loc[10, "text_scrubbed"]
    assert out.loc[11, "n_ipv4"] == 2 and out.loc[11, "n_phone"] == 1
    assert "<IP>" in out.loc[11, "text_scrubbed"]
    assert "<PHONE>" in out.loc[11, "text_scrubbed"]
    # 12-digit and 9-digit runs hit idnum; 5-digit run survives
    assert out.loc[12, "n_idnum"] == 2
    assert "12345 stays" in out.loc[12, "text_scrubbed"]
    assert out.loc[13, "text_scrubbed"] == PII_DOCS[3][1]
    assert (out.loc[13, ["n_email", "n_ipv4", "n_phone", "n_idnum"]] == 0).all()


def test_pii_scrub_order_no_double_count(spark):
    # an email containing digit runs + a dotted domain must count ONLY as
    # an email — masking order shields ip/phone/id from its remains
    df = spark.createDataFrame(
        [(0, "reach user.123456789@host10.0.0.1.example.com please")],
        "doc_id long, text string")
    row = ts.pii_scrub(df).toPandas().iloc[0]
    assert row["n_email"] == 1
    assert row["n_ipv4"] == 0 and row["n_idnum"] == 0 and row["n_phone"] == 0


REP_DOCS = [
    (20, "same line\nsame line\nsame line\nunique line"),
    (21, "spam spam spam spam ham"),
    (22, "all words differ here truly"),
    (23, ""),
]


def test_repetition_stats(spark):
    df = spark.createDataFrame(REP_DOCS, "doc_id long, text string")
    out = ts.repetition_stats(df).toPandas().set_index("doc_id")
    assert out.loc[20, "n_lines"] == 4
    assert out.loc[20, "dup_line_frac"] == pytest.approx(1 - 2 / 4)
    assert out.loc[21, "top_word_frac"] == pytest.approx(4 / 5)
    assert out.loc[22, "dup_line_frac"] == 0.0
    assert out.loc[22, "top_word_frac"] == pytest.approx(1 / 5)
    assert out.loc[23, "n_lines"] == 0
    assert out.loc[23, "dup_line_frac"] == 0.0 and out.loc[23, "top_word_frac"] == 0.0


def test_corpus_profile_exact_percentiles(spark):
    from hipporag_spark.textstats import corpus_profile

    rows = [(f"d{i}", "x", "en", "s", n) for i, n in enumerate([10, 20, 30, 40, 100])]
    docs = spark.createDataFrame(
        rows, "doc_id string, text string, lang string, source string, n_chars long")
    got = corpus_profile(docs).collect()[0]
    assert got["stratum"] == "en" and got["n_docs"] == 5
    assert got["total_chars"] == 200.0
    assert got["p50"] == 30.0            # exact median
    assert got["p90"] == 76.0            # 40 + 0.6*(100-40)
    assert abs(got["p99"] - 97.6) < 1e-9  # 40 + 0.96*60
