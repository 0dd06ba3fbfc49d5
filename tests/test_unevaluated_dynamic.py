"""Dynamic-branch `unevaluatedProperties` / `unevaluatedItems`.

Round 1 raised SpecError whenever the evaluated set depended on a
runtime anyOf/oneOf/if branch; the compiler now enumerates branches at
compile time and gates each branch's evaluated names on the branch's
own validity Column — the static analog of the reference's runtime
annotation dataflow (`UnevaluatedProperties.java:69-92`,
`UnevaluatedItems.java:65-110`, retraction of failed-branch annotations
`ValidatorContext.java:1276-1295`).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from snowy_json_spark.plans.compiler import compile_spec
from snowy_json_spark.plans.report import with_verdict


def verdicts(spark, spec, rows, schema):
    df = spark.createDataFrame(rows, schema=schema)
    plan = compile_spec(spec, df.schema)
    return [r["passed"] for r in with_verdict(df, plan).collect()]


META_AB = StructType(
    [
        StructField(
            "meta",
            StructType(
                [
                    StructField("a", IntegerType()),
                    StructField("b", StringType()),
                    StructField("c", IntegerType()),
                ]
            ),
        )
    ]
)


def test_unevaluated_properties_anyof_branches(spark):
    spec = {
        "properties": {
            "meta": {
                "anyOf": [
                    {"properties": {"a": {"minimum": 0}}, "required": ["a"]},
                    {"properties": {"b": {"minLength": 1}}, "required": ["b"]},
                ],
                "unevaluatedProperties": False,
            }
        }
    }
    rows = [
        ((1, None, None),),  # arm1 passes → a evaluated → pass
        ((1, "x", None),),  # both arms pass → a,b evaluated → pass
        ((None, "x", None),),  # arm1 fails → only b evaluated → pass
        ((1, "x", 5),),  # c never evaluated → fail
        ((1, None, 5),),  # arm2 fails, c unevaluated → fail
    ]
    assert verdicts(spark, spec, rows, META_AB) == [True, True, True, False, False]


def test_unevaluated_properties_failed_arm_retracted(spark):
    """A failing arm's evaluated names are retracted: b present but
    arm2 (the only evaluator of b) fails on its other constraint."""
    spec = {
        "properties": {
            "meta": {
                "anyOf": [
                    {"properties": {"a": {}}, "required": ["a"]},
                    {"properties": {"b": {"minLength": 5}}, "required": ["b"]},
                ],
                "unevaluatedProperties": False,
            }
        }
    }
    rows = [
        ((1, "long enough", None),),  # arm2 passes → b evaluated → pass
        ((1, "xx", None),),  # arm2 FAILS (too short) → b unevaluated → fail
    ]
    assert verdicts(spark, spec, rows, META_AB) == [True, False]


KIND = StructType(
    [
        StructField(
            "meta",
            StructType(
                [
                    StructField("kind", StringType()),
                    StructField("a", IntegerType()),
                    StructField("b", IntegerType()),
                ]
            ),
        )
    ]
)


def test_unevaluated_properties_if_then_else(spark):
    spec = {
        "properties": {
            "meta": {
                "properties": {"kind": {}},
                "if": {"properties": {"kind": {"const": "x"}}, "required": ["kind"]},
                "then": {"properties": {"a": {}}},
                "else": {"properties": {"b": {}}},
                "unevaluatedProperties": False,
            }
        }
    }
    rows = [
        (("x", 1, None),),  # then-branch evaluates a → pass
        (("x", None, 2),),  # b only evaluated by else (inactive) → fail
        (("y", None, 2),),  # else-branch evaluates b → pass
        (("y", 1, None),),  # a only evaluated by then (inactive) → fail
    ]
    assert verdicts(spark, spec, rows, KIND) == [True, False, True, False]


MAP = StructType([StructField("m", MapType(StringType(), IntegerType()))])


def test_unevaluated_properties_map_dynamic(spark):
    spec = {
        "properties": {
            "m": {
                "anyOf": [
                    {"properties": {"a": {}}, "required": ["a"]},
                    {"properties": {"b": {}}, "required": ["b"]},
                ],
                "unevaluatedProperties": False,
            }
        }
    }
    rows = [
        ({"a": 1},),  # pass (a evaluated by arm1)
        ({"a": 1, "c": 1},),  # fail (c leftover)
        ({"b": 2},),  # pass
        ({"a": 1, "b": 2},),  # pass (both arms)
    ]
    assert verdicts(spark, spec, rows, MAP) == [True, False, True, True]


ARR = StructType([StructField("xs", ArrayType(IntegerType()))])


def test_unevaluated_items_anyof_prefixes(spark):
    spec = {
        "properties": {
            "xs": {
                "anyOf": [
                    {"items": [{"const": 0}, {"const": 0}]},
                    {"items": [{"const": 1}]},
                ],
                "unevaluatedItems": {"maximum": 10},
            }
        }
    }
    rows = [
        ([0, 0, 5],),  # arm1 prefix 2 → tail [5] ok → pass
        ([0, 0, 50],),  # tail [50] > 10 → fail
        ([1, 5],),  # arm2 prefix 1 → tail [5] ok → pass
        ([1, 50],),  # tail [50] → fail
        ([0, 0],),  # no tail → pass
    ]
    assert verdicts(spark, spec, rows, ARR) == [True, False, True, False, True]


def test_unevaluated_items_schema_form_in_branch(spark):
    """An arm with schema-form items evaluates everything when it holds."""
    spec = {
        "properties": {
            "xs": {
                "anyOf": [
                    {"items": {"minimum": 0}},
                    {"items": [{"maximum": 100}]},
                ],
                "unevaluatedItems": {"maximum": 10},
            }
        }
    }
    rows = [
        ([1, 99],),  # arm1 (all >= 0) passes → all evaluated → pass
        ([-1, 99],),  # arm1 fails; arm2 prefix 1 → tail [99] > 10 → fail
        ([-1, 5],),  # arm2 prefix 1 → tail [5] ok → pass
    ]
    assert verdicts(spark, spec, rows, ARR) == [True, False, True]


def test_unevaluated_properties_sibling_ref(spark):
    """An adjacent sibling $ref is an evaluation source: properties
    evaluated by the ref target must not count as unevaluated
    (UnevaluatedProperties.java:69-92 counts the ref's annotations)."""
    spec = {
        "$defs": {"base": {"properties": {"a": {"minimum": 0}}}},
        "properties": {
            "meta": {
                "$ref": "#/$defs/base",
                "unevaluatedProperties": False,
            }
        },
    }
    rows = [
        ({"a": 1, "b": None, "c": None},),  # only `a` present → evaluated by ref
        ({"a": 1, "b": "x", "c": None},),  # `b` unevaluated → fail
    ]
    assert verdicts(spark, spec, rows, META_AB) == [True, False]


def test_unevaluated_properties_dependent_schemas_source(spark):
    """dependentSchemas subschemas evaluate properties when their
    trigger key is present (gated source)."""
    spec = {
        "properties": {
            "meta": {
                "properties": {"a": {"minimum": 0}},
                "dependentSchemas": {
                    "a": {"properties": {"b": {"minLength": 1}}}
                },
                "unevaluatedProperties": False,
            }
        }
    }
    rows = [
        ({"a": 1, "b": "x", "c": None},),  # a present → dep schema evaluates b
        ({"a": None, "b": "x", "c": None},),  # a absent → b unevaluated → fail
        ({"a": 1, "b": "x", "c": 3},),  # c never evaluated → fail
    ]
    assert verdicts(spark, spec, rows, META_AB) == [True, False, False]


def test_unevaluated_properties_recursive_ref_source(spark):
    """$recursiveRef re-applies the outermost anchored schema, so its
    properties count as evaluated at this location."""
    spec = {
        "$recursiveAnchor": True,
        "properties": {
            "meta": {
                "allOf": [{"$recursiveRef": "#"}],
                "unevaluatedProperties": False,
            },
            "a": {"type": ["integer", "null"]},
            "b": {"type": ["string", "null"]},
        },
    }
    # the anchor schema declares properties meta/a/b → a and b inside
    # meta are evaluated by the recursive re-application; c is not
    rows = [
        ({"a": 1, "b": "x", "c": None},),
        ({"a": 1, "b": "x", "c": 3},),
    ]
    assert verdicts(spark, spec, rows, META_AB) == [True, False]
