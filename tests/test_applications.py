"""Pass-result recording: applications() emits one row per (row, leaf)
with a passed flag — the dense complement of violations()."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowy_json_spark.plans.compiler import compile_spec
from snowy_json_spark.plans.report import applications, violations, with_abs_locations

SPEC = {
    "required": ["name"],
    "properties": {
        "name": {"type": "string", "minLength": 2},
        "age": {"type": "integer", "minimum": 0, "maximum": 150},
    },
}


def _df(spark):
    return spark.createDataFrame(
        [(1, "ok", 30), (2, "x", -5), (3, None, 200)],
        "id long, name string, age long",
    )


def test_applications_dense_and_consistent(spark):
    df = _df(spark)
    plan = compile_spec(SPEC, df.schema)
    apps = applications(df, plan, ["id"]).collect()
    n_leaves = len(plan.leaves)
    assert n_leaves >= 5
    # dense: every row emits every leaf, pass or fail
    assert len(apps) == 3 * n_leaves
    # complement of violations(): failed applications = violation rows
    v = violations(df, plan, ["id"]).collect()
    failed = {(r["id"], r["constraint_id"]) for r in apps if not r["passed"]}
    assert failed == {(r["id"], r["constraint_id"]) for r in v}
    # row 1 passes everything
    assert all(r["passed"] for r in apps if r["id"] == 1)
    # row 2: name minLength + age minimum fail
    f2 = sorted(c for (i, c) in failed if i == 2)
    assert any("minLength" in c for c in f2)
    assert any("minimum" in c for c in f2)


def test_applications_abs_locations(spark):
    df = _df(spark)
    plan = compile_spec(SPEC, df.schema)
    apps = with_abs_locations(applications(df, plan, ["id"]), plan)
    row = apps.filter(~F.col("passed")).first()
    assert row["abs_constraint_id"]  # populated for every application


def test_applications_empty_plan(spark):
    df = _df(spark)
    plan = compile_spec({}, df.schema)
    assert applications(df, plan, ["id"]).count() == 0
