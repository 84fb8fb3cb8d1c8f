"""LLM-output JSON extraction (SURVEY §2 P9).

The reference's OpenIE stage asks an LLM for JSON and then has to dig a
``{"named_entities": [...]}`` / ``{"triples": [[...], ...]}`` object out
of free-form model text, repairing truncated generations:

- ``openie_openai.py:30-36`` — ``_extract_ner_from_response``: first
  regex match of ``\\{[^{}]*"named_entities"\\s*:\\s*\\[[^\\]]*\\][^{}]*\\}``
  in the response, parse it, take ``named_entities``; no match or parse
  failure → empty list; order-preserving dedup (``dict.fromkeys``,
  ``openie_openai.py:60``).
- ``openie_openai.py:82-88`` — the same for ``"triples"`` (array of
  arrays), then arity-3 validity filter + order-preserving dedup with
  ``str()`` item coercion (``llm_utils.py:218-249``).
- ``llm_utils.py:146-215`` — ``fix_broken_generated_json``: a valid JSON
  string is returned unchanged; otherwise truncate at the LAST comma
  (deliberately blind — a comma inside a string literal counts too),
  then close unclosed braces/brackets found by a string-literal- and
  escape-aware scan.  The repair runs only when the generation stopped
  on ``finish_reason == 'length'`` (``openie_openai.py:56-59``).

Spark-first design (NOT a port of the reference's per-response Python
loop): the hot path is pure Catalyst — ``regexp_extract`` pulls the
candidate object and ``from_json`` parses it inside whole-stage codegen,
so a 100 TB response table never leaves the JVM.  Python runs only where
the semantics genuinely need it, and only for the rows that need it:

- the truncation repair, as an Arrow-batched ``pandas_udf`` fed NULL for
  every non-``length`` row (so the batch does no work on the fast path);
- a literal-eval fallback for responses the reference's ``eval()`` would
  accept but strict JSON rejects (e.g. single-quoted items), again fed
  NULL unless ``from_json`` failed on a non-empty match.

Known intentional divergence: the reference ``eval()``s model output —
arbitrary code execution on attacker-controlled text.  We parse with
``json.loads`` then ``ast.literal_eval``, which covers every literal
``eval`` accepts and nothing else.
"""

from __future__ import annotations

import ast
import json

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Java-regex ports of the reference patterns (openie_openai.py:31,83).
# No dots, so Python's re.DOTALL has no Java equivalent to carry over;
# character classes already cross newlines in both engines.
NER_PATTERN = r'\{[^{}]*"named_entities"\s*:\s*\[[^\]]*\][^{}]*\}'
TRIPLE_PATTERN = r'\{[^{}]*"triples"\s*:\s*\[[^\]]*\][^{}]*\}'


def fix_broken_generated_json(json_str: str) -> str:
    """Repair a truncated JSON generation (``llm_utils.py:146-215``).

    Valid JSON is returned unchanged.  Otherwise: drop everything from
    the last comma on (blind — the reference's ``rfind(',')`` does not
    care whether the comma sits inside a string literal, and neither do
    we), then append closers for every brace/bracket left open, where
    "open" is decided by a scan that tracks string literals and
    backslash escapes so quoted braces don't count.
    """
    try:
        json.loads(json_str)
        return json_str
    except (ValueError, TypeError):
        pass

    last_comma = json_str.rfind(",")
    if last_comma != -1:
        json_str = json_str[:last_comma]

    unclosed: list[str] = []
    inside_string = False
    escape_next = False
    for ch in json_str:
        if inside_string:
            if escape_next:
                escape_next = False
            elif ch == "\\":
                escape_next = True
            elif ch == '"':
                inside_string = False
        else:
            if ch == '"':
                inside_string = True
            elif ch in "{[":
                unclosed.append(ch)
            elif ch in "}]":
                if unclosed and (
                    (ch == "}" and unclosed[-1] == "{")
                    or (ch == "]" and unclosed[-1] == "[")
                ):
                    unclosed.pop()

    closing = {"{": "}", "[": "]"}
    return json_str + "".join(closing[c] for c in reversed(unclosed))


def _repair_col(col: Column) -> Column:
    """Arrow-batched repair; NULL in → NULL out, so callers gate it with
    ``F.when(needs_repair, col)`` and the batch skips untouched rows."""

    @F.pandas_udf("string")
    def fix(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: None if x is None else fix_broken_generated_json(x))

    return fix(col)


def _literal_entities(col: Column) -> Column:
    """Literal-eval fallback for the matched object (NULL-gated like the
    repair).  Mirrors ``eval(match.group())["named_entities"]`` minus the
    code execution: json first, then ``ast.literal_eval``."""

    @F.pandas_udf("array<string>")
    def fb(s: pd.Series) -> pd.Series:
        def parse(x):
            if not x:
                return None
            for loader in (json.loads, ast.literal_eval):
                try:
                    ents = loader(x).get("named_entities")
                    if isinstance(ents, list):
                        return [str(e) for e in ents]
                except Exception:
                    continue
            return None

        return s.map(parse)

    return fb(col)


def _literal_triples(col: Column) -> Column:
    @F.pandas_udf("array<array<string>>")
    def fb(s: pd.Series) -> pd.Series:
        def parse(x):
            if not x:
                return None
            for loader in (json.loads, ast.literal_eval):
                try:
                    trips = loader(x).get("triples")
                    if isinstance(trips, list):
                        return [[str(i) for i in t] for t in trips
                                if isinstance(t, (list, tuple))]
                except Exception:
                    continue
            return None

        return s.map(parse)

    return fb(col)


def _fixed_response(df_col: Column, finish_reason_col: str | None) -> Column:
    if finish_reason_col is None:
        return df_col
    needs_fix = F.col(finish_reason_col) == F.lit("length")
    # NULL-gate the UDF input: non-length rows ship NULL through Arrow
    # and the Python side does nothing for them
    repaired = _repair_col(F.when(needs_fix, df_col))
    return F.when(needs_fix, repaired).otherwise(df_col)


def extract_entities_json(
    df: DataFrame,
    response_col: str = "response",
    finish_reason_col: str | None = None,
    out_col: str = "named_entities",
) -> DataFrame:
    """Add ``out_col: array<string>`` — the reference's NER extraction
    (``openie_openai.py:30-36,49-60``) over a whole response table.

    Fast path is JVM-only: ``regexp_extract`` + ``from_json`` in
    whole-stage codegen.  Rows flagged ``finish_reason == 'length'`` are
    repaired first (``fix_broken_generated_json``); rows whose matched
    object defeats strict JSON fall back to literal-eval.  No match, a
    NULL response, or an unparseable object all yield ``[]`` (the
    reference returns an empty entity list on any failure).  Dedup is
    order-preserving (``array_distinct`` ≡ ``dict.fromkeys``).
    """
    fixed = _fixed_response(F.col(response_col), finish_reason_col)
    obj = F.regexp_extract(fixed, NER_PATTERN, 0)
    fast = F.from_json(obj, "named_entities ARRAY<STRING>")["named_entities"]
    needs_fb = (obj != F.lit("")) & fast.isNull()
    fb = _literal_entities(F.when(needs_fb, obj))
    ents = F.coalesce(fast, fb, F.array().cast("array<string>"))
    return df.withColumn(out_col, F.array_distinct(ents))


def extract_triples_json(
    df: DataFrame,
    response_col: str = "response",
    finish_reason_col: str | None = None,
    out_col: str = "triples",
) -> DataFrame:
    """Add ``out_col: array<array<string>>`` — the reference's triple
    extraction (``openie_openai.py:82-88``) plus
    ``filter_invalid_triples`` (``llm_utils.py:218-249``): keep arity-3
    triples only, order-preserving dedup, items coerced to string
    (``from_json``'s StringType reads non-string JSON scalars as their
    literal text, matching the reference's ``str(item)``).
    """
    fixed = _fixed_response(F.col(response_col), finish_reason_col)
    obj = F.regexp_extract(fixed, TRIPLE_PATTERN, 0)
    fast = F.from_json(obj, "triples ARRAY<ARRAY<STRING>>")["triples"]
    needs_fb = (obj != F.lit("")) & fast.isNull()
    fb = _literal_triples(F.when(needs_fb, obj))
    trips = F.coalesce(fast, fb, F.array().cast("array<array<string>>"))
    valid = F.filter(trips, lambda t: F.size(t) == 3)
    return df.withColumn(out_col, F.array_distinct(valid))


def tables_from_llm_responses(
    chunks: DataFrame,
    triple_responses: DataFrame,
    response_col: str = "response",
    finish_reason_col: str | None = None,
) -> dict[str, DataFrame]:
    """LLM-backed variant of ``extract_all`` — the reference's actual
    ``index()`` pipeline (``HippoRAG.py:215-268``) for users who DO run
    an LLM OpenIE stage: raw per-chunk triple responses → parsed/repaired
    triples (this module) → ``text_processing`` on every element
    (``misc_utils.py:54-61``, our ``normalize_text``) → the same five
    tables ``extract_all`` produces, consumable by ``build_graph`` and
    ``HippoIndex`` unchanged.

    Ordering is the reference's: arity-filter + dedup happen on the RAW
    triples (``filter_invalid_triples``, inside
    :func:`extract_triples_json`) and normalization comes AFTER, so
    triples that collide only post-normalization are kept as separate
    rows — ``fact_edges``'s row count per (subject, object) then
    reproduces ``add_fact_edges``'s ``node_to_node_stats += 1`` per
    triple exactly (``HippoRAG.py:758-766``).  Entity nodes are the
    subjects and objects of the surviving triples
    (``extract_entity_nodes``, ``misc_utils.py:86-97``), including ones
    that normalize to ``""`` — the reference hashes those too.

    ``triple_responses`` must carry ``chunk_id`` plus the response
    column; all plumbing is Catalyst (the only Python is the NULL-gated
    repair/fallback inside :func:`extract_triples_json`).
    """
    from .extract import make_entities, make_membership, normalize_text

    parsed = extract_triples_json(
        triple_responses, response_col, finish_reason_col)
    ex = parsed.select("chunk_id", F.explode("triples").alias("t"))
    facts = ex.select(
        "chunk_id",
        normalize_text(F.col("t")[0]).alias("subject"),
        normalize_text(F.col("t")[1]).alias("predicate"),
        normalize_text(F.col("t")[2]).alias("object"),
    )
    tokens = (
        facts.select("chunk_id", F.col("subject").alias("token"))
        .unionByName(facts.select("chunk_id", F.col("object").alias("token")))
        .distinct()
    )
    return {
        "chunks": chunks,
        "tokens": tokens,
        "entities": make_entities(tokens),
        "membership": make_membership(tokens),
        "facts": facts,
    }
