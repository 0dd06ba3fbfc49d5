"""TIMESTAMP_NTZ columns (Spark 4's parquet inference default) must
work with timestamp-typed keywords."""

from __future__ import annotations

from snowy_json_spark.plans.compiler import compile_spec
from snowy_json_spark.plans.report import violations, with_verdict


def test_ntz_bounds_and_type(spark):
    df = spark.createDataFrame(
        [("a",), ("b",), ("c",)], "id string"
    ).selectExpr(
        "id",
        "CASE id WHEN 'a' THEN TIMESTAMP_NTZ '2024-01-10 00:00:00' "
        "WHEN 'b' THEN TIMESTAMP_NTZ '2024-02-10 00:00:00' "
        "ELSE NULL END AS ts",
    )
    assert df.schema["ts"].dataType.typeName() == "timestamp_ntz"
    spec = {
        "required": ["ts"],
        "properties": {
            "ts": {
                "type": "timestamp",
                "minimum": "2024-01-01 00:00:00",
                "maximum": "2024-01-31 00:00:00",
            }
        },
    }
    plan = compile_spec(spec, df.schema)
    got = {r["id"]: r["passed"] for r in with_verdict(df, plan).collect()}
    assert got == {"a": True, "b": False, "c": False}
    v = violations(df, plan, ["id"]).collect()
    cids = {(r["id"], r["constraint_id"]) for r in v}
    assert ("b", "#/properties/ts/maximum") in cids
    assert ("c", "#/required") in cids


def test_ntz_const(spark):
    df = spark.createDataFrame([(1,)], "i long").selectExpr(
        "TIMESTAMP_NTZ '2024-01-10 00:00:00' AS ts"
    )
    plan = compile_spec({"properties": {"ts": {"const": "2024-01-10 00:00:00"}}}, df.schema)
    assert with_verdict(df, plan).collect()[0]["passed"] is True
    plan2 = compile_spec({"properties": {"ts": {"const": "2024-01-11 00:00:00"}}}, df.schema)
    assert with_verdict(df, plan2).collect()[0]["passed"] is False
