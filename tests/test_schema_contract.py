"""kind: "schema" table check — declarative schema contracts."""

from __future__ import annotations

from snowy_json_spark.engine import ValidationEngine


def _eng(check):
    return ValidationEngine(
        {"properties": {}, "x-table-checks": [check]}, id_cols=["id"]
    )


def _df(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5)], "id long, name string, score double"
    )


def test_schema_contract_passes(spark):
    chk = {"id": "contract", "kind": "schema",
           "columns": {"id": "bigint", "name": "string", "score": "double"}}
    res = _eng(chk).run(_df(spark))
    assert res.table_violations is None


def test_schema_contract_violations(spark):
    chk = {"id": "contract", "kind": "schema", "allow_extra": False,
           "columns": {"id": "bigint", "name": "int", "missing": "string"}}
    res = _eng(chk).run(_df(spark))
    got = {(r["instance_path"], r["observed_value"])
           for r in res.table_violations.collect()}
    assert ("#/missing", "missing_column") in got
    assert ("#/name", "type=string expected=int") in got
    assert ("#/score", "unexpected_column") in got
    assert len(got) == 3


def test_schema_contract_single_pass_uses_wide_schema(spark, tmp_path):
    """run_single_pass projects narrow columns; the schema contract must
    still see the ORIGINAL schema (html etc.), not the projection."""
    df = spark.createDataFrame(
        [(1, "x", "payload")], "id long, name string, html string"
    )
    chk = {"id": "contract", "kind": "schema",
           "columns": {"id": "bigint", "name": "string", "html": "string"}}
    res = _eng(chk).run_single_pass(df, str(tmp_path / "out"))
    assert res.table_violations is None  # html present in the wide schema
    bad = {"id": "contract", "kind": "schema",
           "columns": {"id": "bigint", "gone": "string"}}
    res2 = _eng(bad).run_single_pass(df, str(tmp_path / "out2"))
    assert res2.table_violations.count() == 1
