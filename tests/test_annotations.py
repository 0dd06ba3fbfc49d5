"""Annotation output surface (processAnnotations analog).

Snow returns annotations keyed (instance location → name → schema
location) from `Validator.java:485-494`, sorted by `Results.java:107-123`
and printed by `Main.java:198-245`; annotations under a failed schema
application are retracted (`ValidatorContext.java:1276-1295`).  The
engine collects them at compile time as guarded columns and emits an
annotations DataFrame.
"""

from __future__ import annotations

from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from snowy_json_spark.plans.compiler import compile_spec
from snowy_json_spark.plans.report import annotation_catalog, annotations

SCHEMA = StructType(
    [
        StructField("rid", StringType()),
        StructField("lang", StringType()),
        StructField("n", IntegerType()),
    ]
)

SPEC = {
    "title": "docs",
    "properties": {
        "lang": {"title": "language code", "pattern": "^[a-z]{2}$"},
        "n": {"default": 0, "maximum": 100},
    },
}


def _rows(spark, spec, data):
    df = spark.createDataFrame(data, SCHEMA)
    plan = compile_spec(spec, df.schema)
    out = annotations(df, plan, ["rid"]).collect()
    return sorted((r["rid"], r["instance_path"], r["name"], r["value_json"]) for r in out)


def test_annotations_applied_on_valid_rows(spark):
    got = _rows(spark, SPEC, [("r1", "en", 5)])
    assert got == [
        ("r1", "", "title", '"docs"'),
        ("r1", "/lang", "title", '"language code"'),
        ("r1", "/n", "default", "0"),
    ]


def test_annotations_retracted_on_failed_schema(spark):
    # lang pattern fails → the whole schema fails → every annotation
    # at or below it is retracted (Snow parity)
    assert _rows(spark, SPEC, [("r1", "EN!", 5)]) == []


def test_annotations_absent_member_not_annotated(spark):
    got = _rows(spark, SPEC, [("r1", None, 5)])
    assert got == [
        ("r1", "", "title", '"docs"'),
        ("r1", "/n", "default", "0"),
    ]


def test_format_always_annotates_and_gates_on_validity(spark):
    # draft-07: format asserts → failing value retracts the annotation
    spec07 = {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "properties": {"lang": {"format": "ipv4"}},
    }
    good = _rows(spark, spec07, [("r1", "1.2.3.4", None)])
    assert good == [("r1", "/lang", "format", '"ipv4"')]
    assert _rows(spark, spec07, [("r1", "not-an-ip", None)]) == []
    # 2019-09 default: annotation-only → emitted even on a bad value
    spec19 = {"properties": {"lang": {"format": "ipv4"}}}
    assert _rows(spark, spec19, [("r1", "not-an-ip", None)]) == [
        ("r1", "/lang", "format", '"ipv4"')
    ]


def test_then_branch_annotations_gated_on_if(spark):
    spec = {
        "if": {"properties": {"lang": {"const": "en"}}, "required": ["lang"]},
        "then": {"title": "english row"},
        "else": {"title": "other row"},
    }
    assert _rows(spark, spec, [("r1", "en", None)]) == [
        ("r1", "", "title", '"english row"')
    ]
    assert _rows(spark, spec, [("r1", "de", None)]) == [
        ("r1", "", "title", '"other row"')
    ]


def test_annotation_catalog_static(spark):
    df = spark.createDataFrame([], SCHEMA)
    plan = compile_spec(SPEC, df.schema)
    cat = annotation_catalog(plan)
    assert [(c["instance_path"], c["name"], c["constraint_id"]) for c in cat] == [
        ("", "title", "#/title"),
        ("/lang", "title", "#/properties/lang/title"),
        ("/n", "default", "#/properties/n/default"),
    ]
    assert cat[0]["value_json"] == '"docs"'


def test_engine_annotations_surface(spark):
    from snowy_json_spark.engine import ValidationEngine

    df = spark.createDataFrame([("r1", "en", 5), ("r2", "EN!", 5)], SCHEMA)
    eng = ValidationEngine(SPEC, id_cols=["rid"])
    rows = eng.annotations(df).collect()
    # r1 valid → 3 annotations; r2 fails pattern → all retracted
    assert [(r["rid"], r["name"]) for r in rows] == [
        ("r1", "title"),
        ("r1", "title"),
        ("r1", "default"),
    ]
