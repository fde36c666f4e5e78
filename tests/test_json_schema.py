"""Nested JSON-Schema validation: conformance against the installed
``jsonschema`` package (the reference's actual validator backend,
reference prompture/extraction/validator.py:10-31) on the vocabulary the
reference's conformance suite exercises (specs/schema_validation.json)."""

import json

import jsonschema
import pyarrow as pa
import pytest

from prompture_ray.stages.json_schema import (
    compile_schema, json_schema_errors, validate_json_strings,
)

# schemas modeled on reference specs/schema_validation.json
NESTED_ADDRESS = {
    "type": "object",
    "properties": {
        "name": {"type": "string"},
        "address": {
            "type": "object",
            "properties": {
                "street": {"type": "string"},
                "city": {"type": "string"},
                "state": {"type": "string"},
                "zip": {"type": "string"},
                "country": {"type": "string"},
            },
            "required": ["street", "city", "state"],
        },
    },
    "required": ["name", "address"],
}
ENUM_SENTIMENT = {
    "type": "object",
    "properties": {
        "sentiment": {"type": "string",
                      "enum": ["positive", "negative", "neutral"]},
        "confidence": {"type": "number", "minimum": 0, "maximum": 1},
        "summary": {"type": "string"},
    },
    "required": ["sentiment", "confidence"],
}
ARRAY_SKILLS = {
    "type": "object",
    "properties": {
        "name": {"type": "string"},
        "technical_skills": {"type": "array", "items": {"type": "string"},
                             "minItems": 1},
        "years_experience": {"type": "integer"},
    },
    "required": ["name", "technical_skills"],
}
NULLABLE_UNION = {
    "type": "object",
    "properties": {
        "title": {"type": "string"},
        "venue": {"type": ["string", "null"]},
        "attendees": {"type": ["integer", "null"], "minimum": 0},
    },
    "required": ["title", "venue"],
}
COMBINATORS = {
    "type": "object",
    "properties": {
        "id": {"anyOf": [{"type": "integer"}, {"type": "string",
                                               "pattern": "^[a-f0-9]+$"}]},
        "pair": {"type": "array",
                 "prefixItems": [{"type": "string"}, {"type": "number"}],
                 "items": False},
        "tags": {"type": "array", "items": {"type": "string"},
                 "uniqueItems": True},
    },
    "additionalProperties": False,
}

SCHEMAS = [NESTED_ADDRESS, ENUM_SENTIMENT, ARRAY_SKILLS, NULLABLE_UNION,
           COMBINATORS]

INSTANCES = [
    # address family
    {"name": "Jane", "address": {"street": "s", "city": "c", "state": "IL"}},
    {"name": "Jane", "address": {"street": "s", "city": "c"}},
    {"name": "Jane"},
    {"name": 3, "address": {"street": "s", "city": "c", "state": "IL"}},
    {"name": "Jane", "address": "not an object"},
    # sentiment family
    {"sentiment": "positive", "confidence": 0.9},
    {"sentiment": "meh", "confidence": 0.9},
    {"sentiment": "neutral", "confidence": 1.5},
    {"sentiment": "neutral", "confidence": -0.1, "summary": "x"},
    {"sentiment": "negative", "confidence": 1},       # int in number slot
    {"sentiment": "negative", "confidence": True},    # bool is NOT a number
    {"confidence": 0.5},
    # skills family
    {"name": "Sarah", "technical_skills": ["py", "ts"], "years_experience": 3},
    {"name": "Sarah", "technical_skills": []},
    {"name": "Sarah", "technical_skills": ["py", 7]},
    {"name": "Sarah", "technical_skills": "py", "years_experience": 3.0},
    {"name": "Tom", "technical_skills": ["java"], "years_experience": 2.5},
    # nullable family
    {"title": "t", "venue": None, "attendees": None},
    {"title": "t", "venue": "hall", "attendees": 10},
    {"title": "t", "venue": 4},
    {"title": "t"},
    {"title": "t", "venue": None, "attendees": -3},
    # combinator family
    {"id": 7, "pair": ["x", 1.5], "tags": ["a", "b"]},
    {"id": "deadbeef", "pair": ["x", 1.5]},
    {"id": "zzz"},
    {"id": 7, "pair": ["x", 1.5, "extra"]},
    {"id": 7, "tags": ["a", "a"]},
    {"id": 7, "extra_key": 1},
    {"pair": [1.5, "x"]},
    # cross-family junk
    [], "string", 7, None, True, {"deep": {"nest": [1, {"x": None}]}},
]


@pytest.mark.parametrize("schema_idx", range(len(SCHEMAS)))
def test_conformance_vs_jsonschema(schema_idx):
    schema = SCHEMAS[schema_idx]
    validator = jsonschema.Draft202012Validator(schema)
    ours = compile_schema(schema)
    for inst in INSTANCES:
        expected = validator.is_valid(inst)
        got = not ours(inst)
        assert got == expected, (
            f"schema {schema_idx} disagrees on {inst!r}: "
            f"ours={got} jsonschema={expected} errs={ours(inst)}")


def test_error_paths():
    errs = compile_schema(NESTED_ADDRESS)(
        {"name": 3, "address": {"street": "s"}})
    assert "$.name:type" in errs
    assert "$.address.city:required" in errs
    assert "$.address.state:required" in errs


def test_integer_accepts_integral_float_rejects_bool():
    ours = compile_schema({"type": "integer"})
    assert not ours(3)
    assert not ours(3.0)
    assert ours(3.5)
    assert ours(True)  # bool is not an integer (jsonschema semantics)


def test_enum_bool_number_distinct():
    ours = compile_schema({"enum": [1, "x"]})
    assert not ours(1)
    assert ours(True)


def test_nullable_extension():
    ours = compile_schema({"type": "string", "nullable": True})
    assert not ours(None)
    assert not ours("s")
    assert ours(3)


def test_validate_json_strings_batch():
    col = pa.array([
        json.dumps({"sentiment": "positive", "confidence": 0.5}),
        json.dumps({"sentiment": "meh", "confidence": 0.5}),
        "not json{",
        None,
    ])
    ok, nerr, first = validate_json_strings(col, ENUM_SENTIMENT)
    assert ok.to_pylist() == [True, False, False, None]
    assert nerr.to_pylist() == [0, 1, 1, None]
    assert first.to_pylist() == [None, "$.sentiment:enum",
                                 "$:invalid_json", None]


def test_json_schema_errors_expansion():
    col = pa.array([json.dumps({"name": 1, "address": {}}), "{}"])
    pairs = json_schema_errors(col, NESTED_ADDRESS)
    rows = {i for i, _ in pairs}
    assert rows == {0, 1}
    assert (0, "$.name:type") in pairs


def test_check_kind_integration():
    from prompture_ray.specs import Suite
    from prompture_ray.stages.validate import ValidateBatch

    suite = Suite.from_dict({
        "meta": {},
        "checks": [{"id": "props-schema", "column": "props",
                    "kind": "json_schema",
                    "schema": {"type": "object",
                               "properties": {"k": {"type": "integer",
                                                    "minimum": 0}},
                               "required": ["k"]}}],
    })
    vb = ValidateBatch(suite, key_col="eid")
    batch = pa.table({
        "eid": ["a", "b", "c", "d"],
        "props": ['{"k": 3}', '{"k": -1}', '{}', None],
    })
    masks = vb.masks(batch)
    assert masks["props-schema"].to_pylist() == [True, False, False, True]
    viol = vb.violations(batch, masks)
    assert viol.num_rows == 2


def test_spec_time_schema_validation():
    from prompture_ray.specs import CheckSpec, SpecError
    with pytest.raises(SpecError):
        CheckSpec(id="x", column="c", kind="json_schema")  # no schema


def test_hypothesis_conformance():
    from hypothesis import given, settings, strategies as st

    json_scalars = st.one_of(st.none(), st.booleans(),
                             st.integers(-5, 5),
                             st.floats(-5, 5, allow_nan=False),
                             st.text(max_size=6))
    json_values = st.recursive(
        json_scalars,
        lambda inner: st.one_of(
            st.lists(inner, max_size=4),
            st.dictionaries(st.sampled_from(
                ["name", "address", "street", "city", "state",
                 "sentiment", "confidence", "venue", "k"]),
                inner, max_size=4)),
        max_leaves=12)

    validators = [(jsonschema.Draft202012Validator(s), compile_schema(s))
                  for s in SCHEMAS]

    @settings(max_examples=300, deadline=None)
    @given(inst=json_values)
    def check(inst):
        for js, ours in validators:
            assert (not ours(inst)) == js.is_valid(inst)

    check()
