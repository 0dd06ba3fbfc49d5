"""Extension registry (§2.11), $schema draft detection, $recursiveRef
bounded recursion, and verdict-only mode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from snowy_json_spark.plans.compiler import (
    Compiler,
    Options,
    compile_spec,
    register_format,
    register_keyword,
    unregister_keyword,
)
from snowy_json_spark.plans.report import violations, with_verdict


def test_custom_keyword(spark):
    def compile_even(value, inst, path, compiler):
        if not value:
            return F.lit(True)
        return F.when(inst.col.isNotNull(), inst.col % 2 == 0).otherwise(True)

    register_keyword("x-even", compile_even)
    try:
        spec = {"properties": {"n": {"x-even": True}}}
        df = spark.createDataFrame([(2,), (3,), (None,)], "n long")
        plan = compile_spec(spec, df.schema)
        assert [r["passed"] for r in with_verdict(df, plan).collect()] == [True, False, True]
        v = violations(df, plan, ["n"]).collect()
        assert [(r["n"], r["constraint_id"]) for r in v] == [(3, "#/properties/n/x-even")]
    finally:
        unregister_keyword("x-even")


def test_custom_format(spark):
    register_format("even-length", lambda col: F.length(col) % 2 == 0)
    # draft-07 so format asserts by default (2019-09: annotation-only)
    spec = {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "properties": {"s": {"format": "even-length"}},
    }
    df = spark.createDataFrame([("ab",), ("abc",)], "s string")
    plan = compile_spec(spec, df.schema)
    assert [r["passed"] for r in with_verdict(df, plan).collect()] == [True, False]


def test_schema_draft_detection_ref_siblings(spark):
    # draft-07: siblings of $ref are IGNORED (ValidatorContext.java:1259-1264)
    spec7 = {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "$defs": {"pos": {"minimum": 0}},
        "properties": {"x": {"$ref": "#/$defs/pos", "maximum": 5}},
    }
    df = spark.createDataFrame([(9.0,)], "x double")
    plan = compile_spec(spec7, df.schema)
    # maximum:5 ignored under draft-07 → 9.0 passes (only minimum applies)
    assert with_verdict(df, plan).collect()[0]["passed"] is True

    spec2019 = dict(spec7, **{"$schema": "https://json-schema.org/draft/2019-09/schema"})
    plan2 = compile_spec(spec2019, df.schema)
    assert with_verdict(df, plan2).collect()[0]["passed"] is False


NESTED3 = StructType(
    [
        StructField("v", IntegerType()),
        StructField(
            "child",
            StructType(
                [
                    StructField("v", IntegerType()),
                    StructField(
                        "child",
                        StructType([StructField("v", IntegerType()), StructField("child", StringType())]),
                    ),
                ]
            ),
        ),
    ]
)


def test_recursive_ref_nested_structs(spark):
    # tree schema: every node's v >= 0, recursing into .child.  The
    # tree lives in its own schema resource (registry document) so
    # "$recursiveRef": "#" resolves to the TREE root — under strict
    # 2019-09 semantics an inline subtree's "#" would resolve to the
    # outer document root instead (round-3 dynamic-scope fix).
    tree = {
        "$recursiveAnchor": True,
        "properties": {
            "v": {"minimum": 0},
            "child": {"$recursiveRef": "#"},
        },
    }
    rows = [
        ((1, (2, (3, None))),),
        ((1, (-2, (3, None))),),  # violation at depth 2
        ((1, None),),
    ]
    schema = StructType([StructField("root", NESTED3)])
    df = spark.createDataFrame(rows, schema)
    wrapped = {"properties": {"root": {"$ref": "https://example.test/tree"}}}
    plan = compile_spec(
        wrapped, df.schema, registry={"https://example.test/tree": tree}
    )
    assert [r["passed"] for r in with_verdict(df, plan).collect()] == [True, False, True]


def test_recursion_depth_cap(spark):
    # open MapType would recurse forever without the cap
    from pyspark.sql.types import MapType

    spec = {"properties": {"m": {"$recursiveRef": "#"}}}
    schema = StructType([StructField("m", MapType(StringType(), StringType()))])
    df = spark.createDataFrame([({"a": "b"},)], schema)
    plan = compile_spec(spec, df.schema, Options(max_recursion_depth=3))
    assert with_verdict(df, plan).collect()[0]["passed"] is True  # permissive cap


def test_verdict_only_mode(spark):
    spec = {"required": ["a"], "properties": {"a": {"minimum": 0}}}
    df = spark.createDataFrame([(1.0,), (-1.0,)], "a double")
    plan = compile_spec(spec, df.schema, collect=False)
    assert plan.leaves == []
    assert [r["passed"] for r in with_verdict(df, plan).collect()] == [True, False]


def test_dynamic_scope_recursive_ref_extension(spark):
    """CoreRecursiveRef.java:45-120's dynamic case: `extended` carries
    $recursiveAnchor and $ref's `base`; when base's items hits
    $recursiveRef "#", the outermost anchor in the DYNAMIC scope is
    `extended`, so children must satisfy the extension's constraints
    too.  (Static outermost-compile-path binding would re-apply only
    `base` and miss the bad child `extra`.)"""
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from snowy_json_spark.plans.compiler import Compiler, Options

    base = {
        "$recursiveAnchor": True,
        "properties": {
            "name": {"type": ["string", "null"]},
            "children": {"items": {"$recursiveRef": "#"}},
        },
    }
    extended = {
        "$recursiveAnchor": True,
        "$ref": "https://example.test/base",
        "properties": {"extra": {"type": ["integer", "null"]}},
    }
    child = StructType(
        [
            StructField("name", StringType()),
            StructField("extra", StringType()),  # string: wrong for extended
        ]
    )
    dt = StructType(
        [
            StructField("name", StringType()),
            StructField("extra", LongType()),
            StructField("children", ArrayType(child)),
        ]
    )
    df = spark.createDataFrame(
        [
            (("ok", 1, [("c1", None)]),),       # child.extra absent -> pass
            (("bad", 1, [("c1", "oops")]),),    # child.extra is a string ->
                                                 # only the DYNAMIC re-anchor
                                                 # to `extended` catches it
        ],
        StructType([StructField("value", dt)]),
    )
    comp = Compiler(
        extended,
        Options(spec_version="2019-09"),
        registry={"https://example.test/base": base},
    )
    plan = comp.compile_column("value", dt, extended)
    got = [r[0] for r in df.select(plan.valid).collect()]
    assert got == [True, False]


def test_recursive_ref_without_anchor_is_plain_root_ref(spark):
    """$recursiveRef "#" with no $recursiveAnchor at the base root is
    just a ref to the current document root."""
    from pyspark.sql.types import StructField, StructType, LongType, StringType

    from snowy_json_spark.plans.compiler import Compiler

    spec = {
        "properties": {
            "n": {"type": ["integer", "null"]},
            "inner": {"$recursiveRef": "#"},
        }
    }
    inner = StructType([StructField("n", StringType())])
    dt = StructType([StructField("n", LongType()), StructField("inner", inner)])
    df = spark.createDataFrame(
        [((1, ("x",)),), ((1, (None,)),)],
        StructType([StructField("value", dt)]),
    )
    comp = Compiler(spec)
    plan = comp.compile_column("value", dt, spec)
    # inner.n is a string -> root's properties/n (integer) fails on row 1
    assert [r[0] for r in df.select(plan.valid).collect()] == [False, True]


def test_absolute_schema_locations(spark):
    """absKeywordLocation analog (Main.java:165-190): a leaf reached
    through $ref reports both its dynamic path and the canonical
    location inside the target schema resource."""
    from snowy_json_spark.plans.report import violations, with_abs_locations

    spec = {
        "$defs": {"pos": {"minimum": 0}},
        "properties": {"x": {"$ref": "#/$defs/pos"}},
    }
    df = spark.createDataFrame([(-1.0,)], "x double")
    plan = compile_spec(spec, df.schema)
    assert plan.abs_location("#/properties/x/$ref/minimum") == "#/$defs/pos/minimum"
    rows = with_abs_locations(violations(df, plan, []), plan).collect()
    assert rows[0]["constraint_id"] == "#/properties/x/$ref/minimum"
    assert rows[0]["abs_constraint_id"] == "#/$defs/pos/minimum"


def test_absolute_locations_cross_document_and_nested(spark):
    from snowy_json_spark.plans.compiler import Compiler

    dim = {"$defs": {"code": {"pattern": "^[a-z]{2}$"}}}
    spec = {"properties": {"lang": {"$ref": "https://ex.test/dim#/$defs/code"}}}
    df = spark.createDataFrame([("EN!",)], "lang string")
    comp = Compiler(spec, registry={"https://ex.test/dim": dim})
    plan = comp.compile_row(df.schema)
    assert (
        plan.abs_location("#/properties/lang/$ref/pattern")
        == "https://ex.test/dim#/$defs/code/pattern"
    )
    # nested refs rewrite through the INNERMOST prefix
    spec2 = {
        "$defs": {"a": {"$ref": "#/$defs/b"}, "b": {"maximum": 5}},
        "properties": {"x": {"$ref": "#/$defs/a"}},
    }
    plan2 = compile_spec(spec2, spark.createDataFrame([(9.0,)], "x double").schema)
    assert (
        plan2.abs_location("#/properties/x/$ref/$ref/maximum")
        == "#/$defs/b/maximum"
    )
