"""Operator goldens for §2.3 object applicators and §2.4 array applicators.

Edge semantics pinned to the reference:
- additionalProperties excludes both properties and patternProperties
  matches (`AdditionalProperties.java:58-67`)
- array-form items prefix semantics (`Items.java:64-87`)
- minContains:0 makes contains pass on no match (`Contains.java:66-75`)
- uniqueItems deep equality (`UniqueItems.java:65-68`)
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from snowy_json_spark.plans.compiler import compile_spec
from snowy_json_spark.plans.report import violations, with_verdict


def verdicts(spark, spec, rows, schema):
    df = spark.createDataFrame(rows, schema=schema)
    plan = compile_spec(spec, df.schema)
    return [r["passed"] for r in with_verdict(df, plan).collect()]


# ---------------------------------------------------------------------------
# object applicators over struct-typed columns
# ---------------------------------------------------------------------------

NESTED = StructType(
    [
        StructField("id", StringType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("a", IntegerType()),
                    StructField("b", StringType()),
                    StructField("extra", StringType()),
                ]
            ),
        ),
    ]
)


def test_nested_properties(spark):
    spec = {
        "properties": {
            "meta": {
                "type": "object",
                "required": ["a"],
                "properties": {"a": {"minimum": 0}, "b": {"maxLength": 3}},
            }
        }
    }
    rows = [
        ("r1", (1, "ok", None)),
        ("r2", (-1, "ok", None)),
        ("r3", (1, "toolong", None)),
        ("r4", (None, "x", None)),  # required a missing
        ("r5", None),  # meta absent entirely → properties doesn't apply
    ]
    assert verdicts(spark, spec, rows, NESTED) == [True, False, False, False, True]


def test_additional_properties_struct_static(spark):
    # declared: id; pattern m.*: meta → extra fields under meta: 'extra'
    spec = {
        "properties": {
            "meta": {
                "properties": {"a": {}},
                "patternProperties": {"^b$": {}},
                "additionalProperties": False,
            }
        }
    }
    rows = [("r1", (1, "x", None)), ("r2", (1, "x", "boom"))]
    assert verdicts(spark, spec, rows, NESTED) == [True, False]


def test_property_names_and_counts_on_map(spark):
    schema = StructType([StructField("m", MapType(StringType(), IntegerType()))])
    spec = {
        "properties": {
            "m": {
                "propertyNames": {"pattern": "^[a-z]+$"},
                "maxProperties": 2,
                "minProperties": 1,
            }
        }
    }
    rows = [
        ({"a": 1},),
        ({"a": 1, "b": 2, "c": 3},),  # too many
        ({"A1": 1},),  # bad name
        ({},),  # too few
    ]
    assert verdicts(spark, spec, rows, schema) == [True, False, False, False]


def test_map_properties_and_additional(spark):
    schema = StructType([StructField("m", MapType(StringType(), IntegerType()))])
    spec = {
        "properties": {
            "m": {
                "properties": {"a": {"minimum": 10}},
                "additionalProperties": {"maximum": 5},
            }
        }
    }
    rows = [
        ({"a": 10, "x": 3},),
        ({"a": 5},),  # a below minimum
        ({"x": 9},),  # additional above maximum
    ]
    assert verdicts(spark, spec, rows, schema) == [True, False, False]


def test_dependent_required(spark):
    spec = {"dependentRequired": {"credit_card": ["billing_address"]}}
    schema = "credit_card string, billing_address string"
    rows = [("cc", "addr"), ("cc", None), (None, None)]
    assert verdicts(spark, spec, rows, schema) == [True, False, True]


def test_dependencies_draft7_both_forms(spark):
    spec = {
        "dependencies": {
            "a": ["b"],
            "c": {"properties": {"b": {"const": "z"}}},
        }
    }
    schema = "a string, b string, c string"
    rows = [
        ("x", "y", None),  # a→b ok, c absent
        ("x", None, None),  # a present, b missing
        (None, "y", "p"),  # c present → b must be 'z'
        (None, "z", "p"),
    ]
    assert verdicts(spark, spec, rows, schema) == [True, False, False, True]


# ---------------------------------------------------------------------------
# array applicators
# ---------------------------------------------------------------------------

ARR = StructType([StructField("xs", ArrayType(IntegerType()))])


def test_items_schema_form(spark):
    spec = {"properties": {"xs": {"items": {"minimum": 0}}}}
    rows = [([1, 2],), ([1, -2],), ([],), (None,)]
    assert verdicts(spark, spec, rows, ARR) == [True, False, True, True]


def test_items_array_form_prefix_and_additional(spark):
    # first element >= 10, second <= 0; tail elements must equal 7
    spec = {
        "properties": {
            "xs": {
                "items": [{"minimum": 10}, {"maximum": 0}],
                "additionalItems": {"const": 7},
            }
        }
    }
    rows = [
        ([10, -1],),  # exact prefix
        ([10],),  # shorter than prefix: fine (Items.java:64-87)
        ([10, -1, 7, 7],),
        ([10, -1, 8],),  # bad tail
        ([9, -1],),  # bad first
    ]
    assert verdicts(spark, spec, rows, ARR) == [True, True, True, False, False]


def test_contains_min_max(spark):
    spec = {
        "properties": {
            "xs": {"contains": {"minimum": 5}, "minContains": 2, "maxContains": 3}
        }
    }
    rows = [
        ([5, 6, 1],),  # 2 matches
        ([5, 1],),  # 1 match < minContains
        ([5, 6, 7, 8],),  # 4 matches > maxContains
        ([],),  # 0 matches, contains fails
    ]
    assert verdicts(spark, spec, rows, ARR) == [True, False, False, False]


def test_min_contains_zero_allows_empty(spark):
    spec = {"properties": {"xs": {"contains": {"minimum": 5}, "minContains": 0}}}
    rows = [([],), ([1],), ([5],)]
    assert verdicts(spark, spec, rows, ARR) == [True, True, True]


def test_min_max_items_unique(spark):
    spec = {"properties": {"xs": {"minItems": 1, "maxItems": 3, "uniqueItems": True}}}
    rows = [([1, 2],), ([],), ([1, 2, 3, 4],), ([1, 1],)]
    assert verdicts(spark, spec, rows, ARR) == [True, False, False, False]


def test_unique_items_deep_equality(spark):
    schema = StructType([StructField("xs", ArrayType(ArrayType(IntegerType())))])
    spec = {"properties": {"xs": {"uniqueItems": True}}}
    rows = [([[1, 2], [1, 3]],), ([[1, 2], [1, 2]],)]
    assert verdicts(spark, spec, rows, schema) == [True, False]


def test_unevaluated_items_static(spark):
    spec = {
        "properties": {
            "xs": {"items": [{"minimum": 0}], "unevaluatedItems": {"maximum": 10}}
        }
    }
    rows = [([1, 5],), ([1, 50],), ([1],)]
    assert verdicts(spark, spec, rows, ARR) == [True, False, True]


def test_unevaluated_properties_static(spark):
    spec = {
        "properties": {
            "meta": {
                "properties": {"a": {}},
                "unevaluatedProperties": False,
            }
        }
    }
    rows = [("r1", (1, None, None)), ("r2", (1, "present", None))]
    assert verdicts(spark, spec, rows, NESTED) == [True, False]


def test_violation_rows_for_array(spark):
    spec = {"properties": {"xs": {"maxItems": 2}}}
    df = spark.createDataFrame([([1, 2, 3],)], ARR)
    plan = compile_spec(spec, df.schema)
    v = violations(df.withColumn("rid", F.lit("r1")), plan, ["rid"]).collect()
    assert len(v) == 1
    assert v[0]["constraint_id"] == "#/properties/xs/maxItems"
    assert v[0]["observed_value"] == "3"


def test_map_null_member_is_absent(spark):
    """'null = absent member' holds for MapType too (round-1 advice):
    a key mapped to null is absent for required / properties / counts,
    matching the StructType convention."""
    schema = StructType([StructField("m", MapType(StringType(), IntegerType()))])
    rows = [({"a": None},), ({"a": 1},), ({},)]
    assert verdicts(
        spark, {"properties": {"m": {"required": ["a"]}}}, rows, schema
    ) == [False, True, False]
    # subschemas never apply to a null member
    assert verdicts(
        spark,
        {"properties": {"m": {"properties": {"a": {"minimum": 5}}}}},
        rows,
        schema,
    ) == [True, False, True]
    # property counts ignore null-valued keys
    assert verdicts(
        spark, {"properties": {"m": {"minProperties": 1}}}, rows, schema
    ) == [False, True, False]
    # open-object applicators skip null members as well
    assert verdicts(
        spark,
        {"properties": {"m": {"additionalProperties": {"minimum": 5}}}},
        rows,
        schema,
    ) == [True, False, True]
