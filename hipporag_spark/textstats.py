"""Text-analysis operators for training-data curation at corpus scale.

All pure Catalyst expressions (``pyspark.sql.functions`` only — JVM-side,
whole-stage codegen, no Python UDFs), so each has an exact DuckDB oracle
in ``__spark_entry__.py`` and scales as a single projection over the
document scan (no shuffle at all except the optional aggregations):

- :func:`token_counts`     whitespace tokens + BPE-ish regex word pieces
- :func:`quality_scores`   length / punctuation / stopword / repetition
                           heuristics → composite quality in [0, 1]
- :func:`language_id`      stopword-hit n-gram heuristic over a small
                           built-in profile table (en/de/fr/es + code)
- :func:`fingerprints`     content sha256 + shingle min-hash fingerprint
                           (1-perm MinHash ≙ deterministic rolling-hash
                           document sketch)
- :func:`pii_scrub`        ordered PII masking (email/IPv4/phone/id) with
                           per-pattern counts, RE2-compatible patterns
- :func:`repetition_stats` Gopher-style dup-line / top-word repetition
                           fractions
- :func:`dataset_split`    leakage-safe train/val/test by id hash

The reference computes corpus character/word statistics at
``/root/reference/src/hipporag/HippoRAG.py:977-988``; the rest follows
standard public data-curation heuristics (e.g. Gopher/C4 quality rules)
re-expressed relationally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["token_counts", "quality_scores", "language_id", "fingerprints",
           "dataset_split", "pii_scrub", "repetition_stats", "corpus_profile",
           "BPE_PATTERN"]

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-alnum-non-space
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

# tiny public stopword profiles (top function words per language)
_PROFILES = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "von", "mit", "den", "ein"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "pour", "que", "qui"],
    "es": ["el", "la", "los", "las", "es", "una", "por", "con", "para", "del"],
}
_CODE_MARKERS = ["def", "return", "import", "void", "int", "func", "var", "class", "self", "const"]


def _tokens(text_col):
    return F.filter(
        F.split(F.trim(F.regexp_replace(F.lower(text_col), "[^a-z0-9]+", " ")), " "),
        lambda t: t != F.lit(""),
    )


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(doc_id, ws_tokens, bpe_tokens, chars)`` — whitespace-token count,
    BPE-ish regex word-piece count, character count.  Pure projection."""
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        F.size(F.filter(F.split(F.trim(t), "\\s+"), lambda x: x != F.lit(""))).alias("ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_PATTERN), 0)).alias("bpe_tokens"),
        F.length(t).alias("chars"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality heuristics per doc.

    Columns: ``n_chars``, ``n_words``, ``mean_word_len``, ``punct_ratio``
    (non-alnum-non-space chars / chars), ``stopword_ratio`` (English
    profile), ``uniq_ratio`` (distinct words / words) and a blended
    ``quality`` score in [0,1] (C4/Gopher-style gates re-expressed as
    smooth penalties).  Pure projection — runs inside the document scan.
    """
    t = F.col(text_col)
    toks = _tokens(t)
    n_words = F.size(toks)
    n_chars = F.length(t)
    n_punct = F.length(F.regexp_replace(t, "[A-Za-z0-9\\s]", ""))
    stop_hits = F.size(
        F.filter(toks, lambda x: x.isin(*_PROFILES["en"]))
    )
    uniq = F.size(F.array_distinct(toks))
    word_chars = F.length(F.concat_ws("", toks))
    out = docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        F.when(n_words > 0, word_chars.cast("double") / n_words).otherwise(F.lit(0.0)).alias("mean_word_len"),
        F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(F.lit(0.0)).alias("punct_ratio"),
        F.when(n_words > 0, stop_hits.cast("double") / n_words).otherwise(F.lit(0.0)).alias("stopword_ratio"),
        F.when(n_words > 0, uniq.cast("double") / n_words).otherwise(F.lit(0.0)).alias("uniq_ratio"),
    )
    quality = (
        F.least(F.col("n_words").cast("double") / F.lit(50.0), F.lit(1.0)) * F.lit(0.25)
        + (F.lit(1.0) - F.least(F.col("punct_ratio") * F.lit(4.0), F.lit(1.0))) * F.lit(0.25)
        + F.least(F.col("stopword_ratio") * F.lit(5.0), F.lit(1.0)) * F.lit(0.25)
        + F.col("uniq_ratio") * F.lit(0.25)
    )
    return out.withColumn("quality", quality)


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(doc_id, pred_lang, lang_score)`` — stopword-profile voting.

    Score per language = fraction of tokens hitting that language's
    profile; ``code`` wins when code-marker hits beat every natural
    language.  Deterministic ties: highest score, then language name.
    """
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    scores = []
    for lang, words in sorted({**_PROFILES, "code": _CODE_MARKERS}.items()):
        hits = F.size(F.filter(toks, lambda x: x.isin(*words)))
        score = F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))
        scores.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return docs.select(
        "doc_id",
        best["lang"].alias("pred_lang"),
        best["score"].alias("lang_score"),
    )


def fingerprints(docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """``(doc_id, content_sha, min_shingle_hash)`` — exact content hash
    plus a 1-permutation MinHash over word ``n``-grams (a deterministic
    rolling-hash-style sketch; equal sketches ⇒ likely near-dups)."""
    toks = _tokens(F.col(text_col))
    # Spark sequence(1, 0) is descending — guard short docs explicitly.
    grams = F.when(F.size(toks) >= n, F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, n))),
    )).otherwise(F.array().cast("array<string>"))
    return docs.select(
        "doc_id",
        F.sha2(F.col(text_col), 256).alias("content_sha"),
        F.array_min(grams).alias("min_shingle_hash"),
    )


# PII-style patterns: RE2-compatible (no lookaround/backrefs) so the
# identical pattern runs in Spark's Java regex AND the DuckDB oracle.
# Masking order matters (emails contain dots like IPs; long digit runs
# overlap phone shapes) and is fixed: email → ipv4 → phone → id-number.
PII_PATTERNS = [
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    ("phone", "\\b[0-9]{3}[- ][0-9]{3,4}[- ][0-9]{4}\\b", "<PHONE>"),
    ("idnum", "\\b[0-9]{9,16}\\b", "<ID>"),
]


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Mask PII-shaped spans (emails, IPv4s, phone-shaped and long id-shaped
    digit runs) and count what was masked — the standard scrub pass a
    training-data pipeline runs before anything else touches raw text.

    Returns ``(doc_id, text_scrubbed, n_email, n_ipv4, n_phone, n_idnum)``;
    counts are measured per pattern ON THE REMAINING TEXT at its turn in
    the masking order (an email's digits are never double-counted as an id
    number).  Pure projection — whole-stage codegen inside the scan, and
    at 100 TB it stays a map-only pass with no shuffle.
    """
    t = F.col(text_col)
    out_cols = ["doc_id"]
    counts = []
    scrubbed = t
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(scrubbed, F.lit(pat), 0))
            .alias(f"n_{name}"))
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return docs.select("doc_id", scrubbed.alias("text_scrubbed"), *counts)


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Intra-document repetition measures (Gopher-style repetition gates):
    ``(doc_id, n_lines, dup_line_frac, top_word_frac)``.

    ``dup_line_frac`` = 1 − distinct/total over non-empty lines (the
    boilerplate signal); ``top_word_frac`` = occurrences of the most
    frequent word / total words (the degenerate-repetition signal).
    Array expressions only, so the whole thing is one projection; the
    per-row cost of the top-word scan is O(distinct·words), bounded by
    document length, never by corpus size.
    """
    t = F.col(text_col)
    lines = F.filter(F.split(t, "\n"), lambda x: F.trim(x) != F.lit(""))
    toks = _tokens(t)
    n_lines = F.size(lines)
    n_words = F.size(toks)
    top = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda x: F.size(F.filter(toks, lambda y: y == x)),
        )
    )
    return docs.select(
        "doc_id",
        n_lines.alias("n_lines"),
        F.when(n_lines > 0,
               F.lit(1.0) - F.size(F.array_distinct(lines)).cast("double") / n_lines)
        .otherwise(F.lit(0.0)).alias("dup_line_frac"),
        F.when(n_words > 0, top.cast("double") / n_words)
        .otherwise(F.lit(0.0)).alias("top_word_frac"),
    )


def dataset_split(
    docs: DataFrame,
    splits: list[tuple[str, float]] = (("train", 0.9), ("val", 0.05), ("test", 0.05)),
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment by content-independent id
    hash — the standard leakage-safe split for a training corpus (a
    document lands in the same split on every run, every cluster size,
    and every re-partitioning; adding documents never moves old ones).

    ``u = (first 8 md5 hex chars of "id:seed") / 2^32`` ∈ [0, 1); split
    boundaries are the cumulative weights in the given order.  The hash
    is md5 so the DuckDB oracle computes the identical assignment.
    Returns ``(doc_id, split)``.
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))), 1, 8),
        16, 10,
    ).cast("long")
    u = h / F.lit(float(1 << 32))
    total = sum(w for _, w in splits)
    expr = None
    acc = 0.0
    for name, w in splits[:-1]:
        acc += w / total
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = splits[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return docs.select(F.col(id_col).alias("doc_id"), expr.alias("split"))


def corpus_profile(
    docs: DataFrame,
    strata_col: str = "lang",
    length_col: str = "n_chars",
) -> DataFrame:
    """Per-stratum corpus profile ``(stratum, n_docs, total_chars, p50,
    p90, p99)`` — the size/length distribution readout every curation
    decision starts from (mixing weights, truncation limits, outlier
    gates).

    Percentiles are Spark's EXACT ``percentile`` (sort-based linear
    interpolation, not the t-digest ``approx_percentile``), which matches
    DuckDB's ``quantile_cont`` bit-for-bit on float64 — that exactness is
    what lets the driver gate carry an exact oracle.  At 100 TB the
    single-pass profile is one map-side-combinable agg per stratum for
    the counts/sums; the exact percentile collects each stratum's length
    column (ints, not documents) — for corpora where even that is too
    large, swap ``approx_percentile`` in and drop the gate expectation.
    The char sum runs in decimal so it is partitioning-order exact.
    """
    lc = F.col(length_col).cast("double")
    return (
        docs.groupBy(F.col(strata_col).alias("stratum"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col(length_col).cast("decimal(18,0)")).cast("double").alias("total_chars"),
            F.percentile(lc, F.lit(0.5)).alias("p50"),
            F.percentile(lc, F.lit(0.9)).alias("p90"),
            F.percentile(lc, F.lit(0.99)).alias("p99"),
        )
    )
