"""Operator goldens for §2.1 scalar assertions.

Edge semantics pinned to the reference:
- 1.0 is an integer (`Numbers.java:67-69`)
- vacuous pass on non-applicable type (`Maximum.java:53-55`)
- decimal-exact multipleOf (`Numbers.java:47-59`)
- code-point string length (`MaxLength.java:66-67`)
- pattern is substring-find (`Pattern.java:66`), ECMA `$` → end-of-input
  (`Ecma262Pattern.java:193-194`)
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from snowy_json_spark.plans.compiler import SpecError, compile_spec
from snowy_json_spark.plans.report import violations, with_verdict


def run_spec(spark, spec, rows, schema=None):
    df = spark.createDataFrame(rows, schema=schema)
    plan = compile_spec(spec, df.schema)
    out = with_verdict(df, plan).collect()
    return [r["passed"] for r in out]


def test_type_integer_on_double(spark):
    spec = {"properties": {"x": {"type": "integer"}}}
    df = spark.createDataFrame([(1.0,), (1.5,), (None,)], "x double")
    plan = compile_spec(spec, df.schema)
    got = [r["passed"] for r in with_verdict(df, plan).collect()]
    # 1.0 IS an integer; null member → properties doesn't apply → pass
    assert got == [True, False, True]


def test_type_null_and_union(spark):
    spec = {"properties": {"x": {"type": ["string", "null"]}}}
    df = spark.createDataFrame([("a",), (None,)], "x string")
    plan = compile_spec(spec, df.schema)
    assert [r["passed"] for r in with_verdict(df, plan).collect()] == [True, True]


def test_vacuous_pass_on_type_mismatch(spark):
    # maximum on a string column: not a number → passes (Maximum.java:53-55)
    spec = {"properties": {"s": {"maximum": 5}}}
    df = spark.createDataFrame([("zzz",)], "s string")
    plan = compile_spec(spec, df.schema)
    assert [r["passed"] for r in with_verdict(df, plan).collect()] == [True]
    assert plan.leaves == []  # statically vacuous: no leaf at all


def test_bounds(spark):
    spec = {
        "properties": {
            "x": {"minimum": 0, "maximum": 10, "exclusiveMaximum": 10, "exclusiveMinimum": 0}
        }
    }
    df = spark.createDataFrame([(0.0,), (5.0,), (10.0,), (-1.0,)], "x double")
    plan = compile_spec(spec, df.schema)
    got = [r["passed"] for r in with_verdict(df, plan).collect()]
    assert got == [False, True, False, False]


def test_multiple_of_decimal_exact(spark):
    # 0.0075 is a multiple of 0.0001 — floats would say no
    spec = {"properties": {"x": {"multipleOf": 0.0001}}}
    df = spark.createDataFrame([(0.0075,), (0.00755,)], "x double")
    plan = compile_spec(spec, df.schema)
    assert [r["passed"] for r in with_verdict(df, plan).collect()] == [True, False]


def test_multiple_of_guard(spark):
    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(SpecError):
        compile_spec({"properties": {"x": {"multipleOf": 0}}}, df.schema)


def test_const_and_enum(spark):
    spec = {"properties": {"lang": {"enum": ["en", "fr"]}, "n": {"const": 1}}}
    df = spark.createDataFrame([("en", 1.0), ("de", 1.0), ("fr", 2.0)], "lang string, n double")
    plan = compile_spec(spec, df.schema)
    got = [r["passed"] for r in with_verdict(df, plan).collect()]
    # const 1 == 1.0 under JSON numeric equality
    assert got == [True, False, False]


def test_string_lengths_code_points(spark):
    spec = {"properties": {"s": {"maxLength": 2}}}
    # astral char (outside BMP) must count as ONE code point
    df = spark.createDataFrame([("a\U0001F600",), ("abc",)], "s string")
    plan = compile_spec(spec, df.schema)
    assert [r["passed"] for r in with_verdict(df, plan).collect()] == [True, False]


def test_pattern_find_semantics_and_dollar(spark):
    # substring find: "bc" matches inside "abcd"
    spec = {"properties": {"s": {"pattern": "bc"}}}
    df = spark.createDataFrame([("abcd",), ("xyz",)], "s string")
    plan = compile_spec(spec, df.schema)
    assert [r["passed"] for r in with_verdict(df, plan).collect()] == [True, False]
    # ECMA $ anchors end-of-input, incl. before a trailing newline check
    spec2 = {"properties": {"s": {"pattern": "d$"}}}
    df2 = spark.createDataFrame([("abcd",), ("abcd\n",)], "s string")
    plan2 = compile_spec(spec2, df2.schema)
    assert [r["passed"] for r in with_verdict(df2, plan2).collect()] == [True, False]


def test_required_and_violations(spark):
    spec = {
        "required": ["url", "text"],
        "properties": {"url": {"pattern": "^https://", "maxLength": 20}},
    }
    df = spark.createDataFrame(
        [
            Row(url="https://a.com/x", text="hello"),
            Row(url="http://b.com/y", text=None),
            Row(url=None, text="t"),
        ]
    )
    plan = compile_spec(spec, df.schema)
    assert [r["passed"] for r in with_verdict(df, plan).collect()] == [True, False, False]
    v = violations(df, plan, ["url"]).collect()
    got = {(r["url"], r["constraint_id"]) for r in v}
    assert ("http://b.com/y", "#/required") in got
    assert ("http://b.com/y", "#/properties/url/pattern") in got
    assert (None, "#/required") in got


def test_enum_null_handling(spark):
    spec = {"properties": {"x": {"enum": ["a", None]}}}
    df = spark.createDataFrame([("a",), ("b",), (None,)], "x string")
    plan = compile_spec(spec, df.schema)
    # null member → properties doesn't apply → pass regardless
    assert [r["passed"] for r in with_verdict(df, plan).collect()] == [True, False, True]


def test_row_level_const_enum_raise(spark):
    """Silently compiling a row-level const/enum to nothing would be a
    semantic hole (Snow deep-compares the whole instance, Const.java:44);
    the compiler raises a pointed SpecError instead."""
    import pytest

    from snowy_json_spark.plans.compiler import SpecError

    df = spark.createDataFrame([(1,)], "a int")
    with pytest.raises(SpecError, match="row-level const"):
        compile_spec({"const": {"a": 1}}, df.schema)
    with pytest.raises(SpecError, match="row-level enum"):
        compile_spec({"enum": [{"a": 1}]}, df.schema)
