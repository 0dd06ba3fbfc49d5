"""Golden-fixture runner — the reference's test methodology, ported in
shape (SURVEY.md §5): suite files of
``{description, spec, tests: [{data, valid, violations}]}`` mirroring
the JSON-Schema-Test-Suite cases consumed at `Test.java:326-337`.

Semantics of a case:
- ``valid`` must equal the conjunction verdict for the (single-row)
  DataFrame built from ``data`` under ``columns`` (a Spark DDL schema).
- every expected violation must appear among the emitted rows (matched
  on ``constraint_id`` and, when given, ``observed_value``);
- a valid case must emit zero violations.
"""

from __future__ import annotations

import json
import pathlib

import pytest

from snowy_json_spark.plans.compiler import compile_spec
from snowy_json_spark.plans.report import violations, with_verdict

FIXTURE_DIR = pathlib.Path(__file__).parent.parent / "fixtures"


def load_cases():
    cases = []
    for path in sorted(FIXTURE_DIR.glob("*.json")):
        for group in json.loads(path.read_text()):
            for test in group["tests"]:
                cases.append(
                    pytest.param(
                        group,
                        test,
                        id=f"{path.stem}::{group['description'][:40]}::{test['description'][:40]}",
                    )
                )
    return cases


def _schema_ddl(columns: dict[str, str]) -> str:
    return ", ".join(f"{name} {ddl}" for name, ddl in columns.items())


@pytest.mark.parametrize("group,test", load_cases())
def test_golden(spark, group, test):
    schema = _schema_ddl(group["columns"])
    df = spark.createDataFrame(
        [tuple(row.get(c) for c in group["columns"]) for row in test["data"]],
        schema,
    )
    from snowy_json_spark.plans.compiler import Options

    opts = Options(**group["options"]) if "options" in group else None
    plan = compile_spec(group["spec"], df.schema, options=opts)
    verdict = all(r["passed"] for r in with_verdict(df, plan).collect())
    assert verdict == test["valid"], f"verdict {verdict} != expected {test['valid']}"

    got = violations(df, plan, []).collect()
    if test["valid"]:
        assert got == [], f"valid case emitted violations: {got}"
        return
    assert got, "invalid case emitted no violations"
    for expected in test["violations"]:
        matches = [
            r
            for r in got
            if r["constraint_id"] == expected["constraint_id"]
            and (
                "observed_value" not in expected
                or r["observed_value"] == expected["observed_value"]
            )
        ]
        assert matches, (
            f"expected violation {expected} not found in "
            f"{[(r['constraint_id'], r['observed_value']) for r in got]}"
        )
