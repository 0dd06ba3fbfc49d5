"""Property-based cross-check: the compiled Column plan must agree with
an independent, dead-simple Python evaluator of the same spec on random
(spec, rows) pairs.

The reference relies purely on golden corpora (SURVEY.md §5); this adds
the randomized tier it lacks.  The Python evaluator is intentionally
naive (direct transcription of the keyword semantics) so a shared bug
with the Spark compiler is unlikely.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from snowy_json_spark.plans.compiler import compile_spec
from snowy_json_spark.plans.report import with_verdict

# ---------------------------------------------------------------------------
# naive reference evaluator (scalar subset)
# ---------------------------------------------------------------------------


def ref_eval_value(spec: dict, value) -> bool:
    """Evaluate a scalar-keyword spec against one member value (None =
    absent ⇒ applicator keywords vacuously pass)."""
    for kw, arg in spec.items():
        if kw == "type":
            if value is None:
                return False  # member checks run only when present; 'null'
                # is unreachable under the engine's null=absent convention
            types = arg if isinstance(arg, list) else [arg]
            ok = False
            for t in types:
                if t == "number" and isinstance(value, float):
                    ok = True
                if t == "integer" and isinstance(value, float) and float(value).is_integer():
                    ok = True
                if t == "string" and isinstance(value, str):
                    ok = True
            if not ok:
                return False
        elif kw == "minimum":
            if isinstance(value, float) and not value >= arg:
                return False
        elif kw == "maximum":
            if isinstance(value, float) and not value <= arg:
                return False
        elif kw == "exclusiveMinimum":
            if isinstance(value, float) and not value > arg:
                return False
        elif kw == "exclusiveMaximum":
            if isinstance(value, float) and not value < arg:
                return False
        elif kw == "minLength":
            if isinstance(value, str) and not len(value) >= arg:
                return False
        elif kw == "maxLength":
            if isinstance(value, str) and not len(value) <= arg:
                return False
        elif kw == "enum":
            if value is not None and value not in arg:
                return False
    return True


def ref_eval_row(spec: dict, row: dict) -> bool:
    for name in spec.get("required", []):
        if row.get(name) is None:
            return False
    for name, sub in spec.get("properties", {}).items():
        v = row.get(name)
        if v is not None and not ref_eval_value(sub, v):
            return False
    return True


# ---------------------------------------------------------------------------
# strategies
# ---------------------------------------------------------------------------

finite_floats = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
).map(lambda v: round(v, 6))

num_spec = st.fixed_dictionaries(
    {},
    optional={
        "type": st.sampled_from(["number", "integer", ["number", "null"]]),
        "minimum": finite_floats,
        "maximum": finite_floats,
        "exclusiveMinimum": finite_floats,
        "exclusiveMaximum": finite_floats,
    },
)
str_spec = st.fixed_dictionaries(
    {},
    optional={
        "type": st.just("string"),
        "minLength": st.integers(0, 8),
        "maxLength": st.integers(0, 12),
        "enum": st.lists(st.text(max_size=4), min_size=1, max_size=4),
    },
)

row_strategy = st.fixed_dictionaries(
    {
        "x": st.one_of(st.none(), finite_floats),
        "s": st.one_of(st.none(), st.text(max_size=10)),
    }
)

spec_strategy = st.builds(
    lambda ns, ss, req: {
        "required": req,
        "properties": {"x": ns, "s": ss},
    },
    num_spec,
    str_spec,
    st.lists(st.sampled_from(["x", "s"]), unique=True, max_size=2),
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=spec_strategy, rows=st.lists(row_strategy, min_size=1, max_size=6))
def test_compiled_plan_matches_reference_evaluator(spark, spec, rows):
    df = spark.createDataFrame(
        [(r["x"], r["s"]) for r in rows], "x double, s string"
    )
    plan = compile_spec(spec, df.schema)
    got = [r["passed"] for r in with_verdict(df, plan).collect()]
    want = [ref_eval_row(spec, r) for r in rows]
    assert got == want, f"spec={spec} rows={rows} got={got} want={want}"
