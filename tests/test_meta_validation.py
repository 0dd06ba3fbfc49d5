"""Engine-dogfooded meta-schema validation (Validator.java:459-474
analog): the spec format's own constraints expressed as an engine spec
over a shredded node table, compiled and executed by the engine."""

from __future__ import annotations

import pytest

from snowy_json_spark.plans.compiler import SpecError
from snowy_json_spark.spec.meta import assert_valid_spec, meta_validate, spec_nodes


def _pointers(rows):
    return {(r["pointer"], r["constraint_id"]) for r in rows}


def test_clean_spec_passes(spark):
    spec = {
        "required": ["url"],
        "properties": {
            "url": {"type": "string", "pattern": "^https://", "maxLength": 2048},
            "n": {"minimum": 0, "multipleOf": 2},
            "tags": {"type": "array", "items": {"enum": ["a", "b"]},
                     "minItems": 1, "uniqueItems": True},
        },
        "allOf": [{"if": {"properties": {"n": {"const": 0}}},
                   "then": {"required": ["url"]}}],
    }
    assert meta_validate(spark, spec) == []
    assert_valid_spec(spark, spec)  # no raise


def test_negative_multiple_of(spark):
    bad = {"properties": {"n": {"multipleOf": -2}}}
    rows = meta_validate(spark, bad)
    assert ("#/properties/n", "#/properties/multipleOf_num/exclusiveMinimum") in _pointers(rows)


def test_string_typed_max_length(spark):
    bad = {"properties": {"s": {"maxLength": "long"}}}
    rows = meta_validate(spark, bad)
    assert any(r["pointer"] == "#/properties/s" and "maxLength_jtype" in r["constraint_id"] for r in rows)


def test_unknown_type_name_and_duplicate_required(spark):
    bad = {
        "properties": {"x": {"type": "strnig"}},
        "required": ["a", "a"],
    }
    rows = meta_validate(spark, bad)
    ptrs = _pointers(rows)
    assert any(p == "#/properties/x" and "type_names" in c for p, c in ptrs)
    assert any(p == "#" and "required_names" in c for p, c in ptrs)


def test_empty_combinator_and_empty_enum(spark):
    bad = {"properties": {"x": {"anyOf": [], "enum": []}}}
    rows = meta_validate(spark, bad)
    ptrs = _pointers(rows)
    assert any("anyOf_size" in c for _, c in ptrs)
    assert any("enum_size" in c for _, c in ptrs)


def test_draft04_boolean_exclusive_and_nonobject_properties(spark):
    bad = {
        "properties": {"x": {"exclusiveMinimum": True}},
        "allOf": [{"properties": ["not", "an", "object"]}],
    }
    rows = meta_validate(spark, bad)
    ptrs = _pointers(rows)
    assert any(p == "#/properties/x" and "exclusiveMinimum_jtype" in c for p, c in ptrs)
    assert any(p == "#/allOf/0" and "properties_jtype" in c for p, c in ptrs)


def test_required_items_must_be_strings(spark):
    bad = {"required": ["a", 3]}
    rows = meta_validate(spark, bad)
    assert any("required_item_jtypes" in r["constraint_id"] for r in rows)


def test_assert_raises_with_pointer_paths(spark):
    bad = {"properties": {"n": {"multipleOf": -2, "minItems": -1}}}
    with pytest.raises(SpecError, match=r"#/properties/n"):
        assert_valid_spec(spark, bad)


def test_node_walker_covers_nested_positions():
    spec = {
        "properties": {"a": {"items": [{"not": {"minimum": 1}}]}},
        "anyOf": [{"dependencies": {"k": {"pattern": "x"}}}],
    }
    ptrs = {r["pointer"] for r in spec_nodes(spec)}
    assert "#/properties/a/items/0/not" in ptrs
    assert "#/anyOf/0/dependencies/k" in ptrs
