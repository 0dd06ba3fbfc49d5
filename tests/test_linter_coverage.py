"""Linter + coverage tests (SURVEY.md §3.3)."""

from __future__ import annotations

from snowy_json_spark.operators.coverage import (
    coverage_report,
    unexercised_constraints,
)
from snowy_json_spark.plans.compiler import compile_spec
from snowy_json_spark.plans.report import violations
from snowy_json_spark.spec.linter import errors, lint


def _msgs(diags):
    return [f"{d.path}:{d.message}" for d in diags]


def test_lint_contradictory_bounds():
    diags = lint({"properties": {"x": {"minimum": 10, "maximum": 5}}})
    assert any("unsatisfiable" in d.message for d in diags)
    assert errors({"properties": {"x": {"minimum": 10, "maximum": 5}}})


def test_lint_wrong_types():
    diags = lint(
        {
            "properties": {
                "a": {"maximum": "high"},
                "b": {"minLength": -1},
                "c": {"enum": []},
                "d": {"type": "strnig"},
                "e": {"required": ["x", "x"]},
            }
        }
    )
    m = " ".join(_msgs(diags))
    assert "must be a number" in m
    assert "non-negative integer" in m
    assert "non-empty array" in m
    assert "unknown type name 'strnig'" in m
    assert "duplicate names" in m


def test_lint_structural_warnings():
    diags = lint(
        {
            "properties": {
                "a": {"then": {"minimum": 0}},
                "b": {"maxContains": 3},
                "c": {"additionalItems": {"minimum": 0}},
            }
        }
    )
    m = " ".join(_msgs(diags))
    assert "then/else without if" in m
    assert "without contains" in m
    assert "without array-form items" in m
    assert not errors(
        {"properties": {"a": {"then": {"minimum": 0}}}}
    )  # warnings, not errors


def test_lint_bad_regex_and_format():
    diags = lint({"properties": {"s": {"pattern": "(unclosed", "format": "emial"}}})
    m = " ".join(_msgs(diags))
    assert "does not compile" in m
    assert "unknown format 'emial'" in m


def test_lint_clean_spec():
    spec = {
        "required": ["url"],
        "properties": {
            "url": {"type": "string", "pattern": "^https://", "maxLength": 2048},
            "xs": {"items": {"minimum": 0}, "maxItems": 10},
        },
    }
    assert lint(spec) == []


def test_coverage_report(spark):
    spec = {
        "required": ["a"],
        "properties": {"a": {"minimum": 0}, "b": {"maxLength": 2}},
    }
    df = spark.createDataFrame([(-1.0, "x"), (2.0, "y")], "a double, b string")
    plan = compile_spec(spec, df.schema)
    v = violations(df, plan, [])
    rep = {r["constraint_id"]: r["n_violations"] for r in coverage_report(spark, plan, v).collect()}
    assert rep["#/properties/a/minimum"] == 1
    assert rep["#/required"] == 0
    assert rep["#/properties/b/maxLength"] == 0
    unex = unexercised_constraints(spark, plan, v)
    assert "#/required" in unex and "#/properties/a/minimum" not in unex


def test_lint_meta_schema_shapes():
    """Meta-schema analog rules (CoreSchema.java:103-132 closes the same
    loop by validating the schema against the draft meta-schema)."""
    diags = lint(
        {
            "$ref": 5,
            "uniqueItems": "yes",
            "dependentRequired": {"a": "b"},
            "exclusiveMinimum": True,
            "contentMediaType": "not a media type",
            "items": 3,
        }
    )
    msgs = {d.path: d.severity for d in diags}
    assert msgs["#/$ref"] == "error"
    assert msgs["#/uniqueItems"] == "error"
    assert msgs["#/dependentRequired"] == "error"
    assert msgs["#/exclusiveMinimum"] == "error"
    assert msgs["#/contentMediaType"] == "error"
    assert msgs["#/items"] == "error"


def test_lint_draft_mismatches():
    d7 = {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "properties": {"x": {"dependentRequired": {"a": ["b"]}}},
    }
    warns = [d for d in lint(d7) if d.severity == "warn"]
    assert any("2019-09 keyword" in d.message for d in warns)
    d19 = {
        "$schema": "https://json-schema.org/draft/2019-09/schema",
        "dependencies": {"a": ["b"]},
    }
    warns = [d for d in lint(d19) if d.severity == "warn"]
    assert any("dependentRequired" in d.message for d in warns)


def test_lint_valid_media_type_passes():
    assert lint({"contentMediaType": "application/json; charset=utf-8"}) == []


def test_unseen_instance_paths(spark):
    """Instance-side coverage: schema locations no constraint touches
    are reported; constrained ones (and array element paths reached by
    items) are not."""
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from snowy_json_spark.operators.coverage import (
        schema_instance_paths,
        unseen_instance_paths,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("lang", StringType()),
            StructField("tags", ArrayType(StringType())),
            StructField(
                "meta",
                StructType(
                    [
                        StructField("source", StringType()),
                        StructField("rank", LongType()),
                    ]
                ),
            ),
        ]
    )
    assert set(schema_instance_paths(schema)) == {
        "", "/doc_id", "/lang", "/tags", "/tags/*",
        "/meta", "/meta/source", "/meta/rank",
    }

    spec = {
        "required": ["doc_id"],
        "properties": {
            "lang": {"pattern": "^[a-z]{2}$"},
            "tags": {"items": {"minLength": 1}},
            "meta": {"properties": {"source": {"minLength": 1}}},
        },
    }
    plan = compile_spec(spec, schema)
    unseen = unseen_instance_paths(plan, schema)
    # required touches the root; pattern touches /lang; items (an
    # element applicator attributed to /tags) marks /tags and /tags/*;
    # nested properties touches /meta/source exactly (NOT /meta —
    # reference exact-path semantics)
    assert unseen == ["/doc_id", "/meta", "/meta/rank"]
