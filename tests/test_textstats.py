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
