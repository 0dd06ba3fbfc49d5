"""Operator goldens for §2.5 combinators and §2.6 references.

- oneOf exactly-one (`OneOf.java:74`)
- absent then/else passes (`If.java:67-78`)
- $ref pointer + anchor resolution, cycle → compile error
"""

from __future__ import annotations

import pytest

from snowy_json_spark.plans.compiler import SpecError, compile_spec
from snowy_json_spark.plans.report import violations, with_verdict


def verdicts(spark, spec, rows, schema):
    df = spark.createDataFrame(rows, schema=schema)
    plan = compile_spec(spec, df.schema)
    return [r["passed"] for r in with_verdict(df, plan).collect()]


def test_all_any_one_not(spark):
    schema = "x double"
    assert verdicts(
        spark,
        {"properties": {"x": {"allOf": [{"minimum": 0}, {"maximum": 10}]}}},
        [(5.0,), (-1.0,), (11.0,)],
        schema,
    ) == [True, False, False]
    assert verdicts(
        spark,
        {"properties": {"x": {"anyOf": [{"maximum": 0}, {"minimum": 10}]}}},
        [(-5.0,), (5.0,), (15.0,)],
        schema,
    ) == [True, False, True]
    # oneOf: exactly one branch may pass
    assert verdicts(
        spark,
        {"properties": {"x": {"oneOf": [{"maximum": 5}, {"minimum": 3}]}}},
        [(1.0,), (4.0,), (9.0,)],
        schema,
    ) == [True, False, True]
    assert verdicts(
        spark,
        {"properties": {"x": {"not": {"minimum": 0}}}},
        [(-1.0,), (1.0,)],
        schema,
    ) == [True, False]


def test_if_then_else(spark):
    schema = "x double"
    spec = {
        "properties": {
            "x": {"if": {"minimum": 0}, "then": {"maximum": 10}, "else": {"minimum": -5}}
        }
    }
    assert verdicts(spark, spec, [(5.0,), (20.0,), (-3.0,), (-9.0,)], schema) == [
        True,
        False,
        True,
        False,
    ]
    # absent else → negative passes unconditionally
    spec2 = {"properties": {"x": {"if": {"minimum": 0}, "then": {"maximum": 10}}}}
    assert verdicts(spark, spec2, [(20.0,), (-99.0,)], schema) == [False, True]


def test_if_leaves_guarded(spark):
    spec = {
        "properties": {
            "x": {"if": {"minimum": 0}, "then": {"maximum": 10}, "else": {"minimum": -5}}
        }
    }
    df = spark.createDataFrame([(20.0,), (-9.0,)], "x double")
    plan = compile_spec(spec, df.schema)
    v = violations(df, plan, ["x"]).collect()
    got = {(r["x"], r["constraint_id"]) for r in v}
    assert got == {
        (20.0, "#/properties/x/then/maximum"),
        (-9.0, "#/properties/x/else/minimum"),
    }


def test_ref_pointer_and_anchor(spark):
    spec = {
        "$defs": {
            "pos": {"minimum": 0},
            "named": {"$anchor": "small", "maximum": 5},
        },
        "properties": {
            "x": {"allOf": [{"$ref": "#/$defs/pos"}, {"$ref": "#small"}]}
        },
    }
    assert verdicts(spark, spec, [(3.0,), (-1.0,), (9.0,)], "x double") == [
        True,
        False,
        False,
    ]


def test_ref_cycle_detected(spark):
    spec = {
        "$defs": {"a": {"allOf": [{"$ref": "#/$defs/b"}]}, "b": {"$ref": "#/$defs/a"}},
        "properties": {"x": {"$ref": "#/$defs/a"}},
    }
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(SpecError, match="cycle"):
        compile_spec(spec, df.schema)


def test_ref_unresolvable(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(SpecError, match="unresolvable"):
        compile_spec({"properties": {"x": {"$ref": "#/$defs/nope"}}}, df.schema)


def test_boolean_subschemas_in_combinators(spark):
    assert verdicts(
        spark,
        {"properties": {"x": {"anyOf": [False, {"minimum": 0}]}}},
        [(1.0,), (-1.0,)],
        "x double",
    ) == [True, False]
