"""P9 — LLM-output JSON extraction + broken-JSON repair.

Expected values are hand-derived from the reference algorithms
(`openie_openai.py:30-36,82-88`, `llm_utils.py:146-215`): regex-match the
object, repair `length`-truncated generations by blind last-comma
truncation + string-aware brace closing, empty list on any failure,
order-preserving dedup, arity-3 triple filter with str() coercion.
"""

import pytest

from hipporag_spark.llmjson import (
    extract_entities_json,
    extract_triples_json,
    fix_broken_generated_json,
)


# ---------------------------------------------------------------- repair

@pytest.mark.parametrize("s", [
    '{"named_entities": ["a", "b"]}',
    '{"triples": [["a", "b", "c"]]}',
    '[1, 2, 3]',
    '"just a string"',
])
def test_fix_valid_passthrough(s):
    assert fix_broken_generated_json(s) == s


def test_fix_truncated_mid_item():
    # last comma is after "b"; truncate there, close [ and {
    assert (fix_broken_generated_json('{"named_entities": ["a", "b", "c')
            == '{"named_entities": ["a", "b"]}')


def test_fix_no_comma():
    # nothing to truncate; the scan sees { then an unterminated string,
    # so only { is open -> appends } (result still invalid JSON, which
    # the extraction layer maps to an empty list)
    assert fix_broken_generated_json('{"a": "b') == '{"a": "b}'


def test_fix_blind_comma_inside_string():
    # the reference rfind(',') doesn't care that the comma is inside a
    # string literal — the repair truncates mid-literal, the closers
    # land inside the still-open quote, and the result stays invalid
    # (the extraction layer maps it to an empty list)
    assert (fix_broken_generated_json('{"named_entities": ["a", "x,y')
            == '{"named_entities": ["a", "x]}')


def test_fix_braces_inside_string_not_counted():
    broken = '{"named_entities": ["br{ck]et", "b", "c'
    assert (fix_broken_generated_json(broken)
            == '{"named_entities": ["br{ck]et", "b"]}')


def test_fix_escaped_quote_stays_in_string():
    broken = '{"named_entities": ["a\\"b", "c", "d'
    assert (fix_broken_generated_json(broken)
            == '{"named_entities": ["a\\"b", "c"]}')


def test_fix_nested_arrays():
    broken = '{"triples": [["a", "b", "c"], ["d", "e'
    assert (fix_broken_generated_json(broken)
            == '{"triples": [["a", "b", "c"], ["d"]]}')


def test_fix_properties_hypothesis():
    """Two reference-semantics invariants over generated inputs:
    valid JSON passes through unchanged, and any truncation of a
    serialized nested-int-array document whose prefix still contains a
    comma repairs to valid JSON — in this grammar a comma only ever
    follows a COMPLETE value, so the blind last-comma cut always lands
    on an element boundary.  (Without a comma the reference algorithm
    genuinely leaves partial tokens behind — fix('[[-') == '[[-]]' —
    which the extraction layer maps to an empty list; hypothesis found
    that counterexample when this property was stated too strongly.)"""
    import json

    from hypothesis import assume, given, settings, strategies as st

    nested = st.recursive(
        st.integers(-999, 999),
        lambda c: st.lists(c, max_size=4), max_leaves=12)

    @settings(max_examples=200, deadline=None)
    @given(nested)
    def valid_passthrough(doc):
        s = json.dumps(doc)
        assert fix_broken_generated_json(s) == s

    @settings(max_examples=200, deadline=None)
    @given(st.lists(nested, min_size=1, max_size=5), st.data())
    def truncation_repairs(doc, data):
        s = json.dumps(doc)
        k = data.draw(st.integers(1, len(s)))
        assume("," in s[:k])
        json.loads(fix_broken_generated_json(s[:k]))  # must not raise

    valid_passthrough()
    truncation_repairs()


# ------------------------------------------------------------- entities

def _ents(spark, rows):
    df = spark.createDataFrame(rows, "id int, response string, finish_reason string")
    out = extract_entities_json(df, "response", "finish_reason")
    return {r["id"]: r["named_entities"] for r in out.collect()}


def test_extract_entities_paths(spark):
    got = _ents(spark, [
        # clean JSON, prose around it (regex digs it out)
        (0, 'Sure! {"named_entities": ["alpha", "beta"]} hope that helps', "stop"),
        # truncated + length -> repaired to the first two entities
        (1, '{"named_entities": ["alpha", "beta", "gam', "length"),
        # truncated + stop -> NOT repaired; regex needs "]...}" -> []
        (2, '{"named_entities": ["alpha", "beta", "gam', "stop"),
        # no JSON at all
        (3, "I could not find any entities.", "stop"),
        # NULL response
        (4, None, "stop"),
        # eval-style single-quoted items: regex matches, strict JSON
        # fails, literal-eval fallback parses (reference eval() accepts)
        (5, '{"named_entities": [\'alpha\', \'beta\']}', "stop"),
        # duplicates -> order-preserving dedup
        (6, '{"named_entities": ["b", "a", "b"]}', "stop"),
        # valid JSON + length: fix() returns valid input unchanged
        (7, '{"named_entities": ["keep", "all"]}', "length"),
    ])
    assert got[0] == ["alpha", "beta"]
    assert got[1] == ["alpha", "beta"]
    assert got[2] == []
    assert got[3] == []
    assert got[4] == []
    assert got[5] == ["alpha", "beta"]
    assert got[6] == ["b", "a"]
    assert got[7] == ["keep", "all"]


def test_extract_entities_no_finish_column(spark):
    df = spark.createDataFrame(
        [(0, '{"named_entities": ["x"]}')], "id int, response string")
    out = extract_entities_json(df, "response")
    assert out.collect()[0]["named_entities"] == ["x"]


# -------------------------------------------------------------- triples

def _trips(spark, rows):
    df = spark.createDataFrame(rows, "id int, response string, finish_reason string")
    out = extract_triples_json(df, "response", "finish_reason")
    return {r["id"]: [list(t) for t in r["triples"]] for r in out.collect()}


def test_extract_triples_paths(spark):
    t1 = ["s1", "rel", "o1"]
    t2 = ["s2", "rel2", "o2"]
    got = _trips(spark, [
        # arity filter (["bad"] dropped) + dedup (second t1 dropped)
        (0, '{"triples": [["s1", "rel", "o1"], ["s2", "rel2", "o2"], '
            '["bad"], ["s1", "rel", "o1"]]}', "stop"),
        # truncated mid-third-triple + length: blind last-comma
        # truncation leaves ["s3"] which the arity filter then drops
        (1, '{"triples": [["s1", "rel", "o1"], ["s2", "rel2", "o2"], '
            '["s3", "re', "length"),
        # numeric item -> str coercion (reference str(item))
        (2, '{"triples": [["a", 1, "b"]]}', "stop"),
        (3, "no triples here", "stop"),
    ])
    assert got[0] == [t1, t2]
    assert got[1] == [t1, t2]
    assert got[2] == [["a", "1", "b"]]
    assert got[3] == []
