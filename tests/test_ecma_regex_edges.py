"""ECMA-262 translation edge cases: \\c escape-context handling."""

from __future__ import annotations

import pytest

from snowy_json_spark.functions.ecma_regex import (
    compile_python,
    is_valid_ecma,
    translate,
)


def test_control_escape_letter_both_cases():
    assert translate(r"\ca") == r"\cA"
    assert translate(r"\cZ") == r"\cZ"
    assert compile_python(r"\cA").match("\x01")
    assert compile_python(r"\cj").match("\x0a")


def test_control_escape_non_letter_is_literal_backslash_c():
    """ECMA Annex B: \\c not followed by a letter is the literal two
    chars '\\c' — Java would instead read a control character and
    silently match the wrong thing."""
    assert translate(r"\c1") == "\\\\c1"
    assert compile_python(r"\c1").match("\\c1")
    assert not compile_python(r"\c1").match("q1")
    assert is_valid_ecma(r"\c1")
    # trailing \c at end of pattern: same literal reading
    assert translate(r"x\c") == "x\\\\c"
    assert compile_python(r"x\c").match("x\\c")


def test_escaped_backslash_then_c_is_not_a_control_escape():
    """Pattern '\\\\cA' is a literal backslash followed by 'cA'; the
    Python-side lowering must not rewrite it into a control char."""
    p = compile_python("\\\\cA")
    assert p.match("\\cA")
    assert not p.match("\x01")
    # and a REAL control escape right after an escaped backslash
    q = compile_python("\\\\\\cA")
    assert q.match("\\\x01")


def test_two_stage_topk_requires_salt(spark):
    from pyspark.sql import functions as F

    from snowy_json_spark.operators.topk import top_k_per_key

    df = spark.range(10).select(
        (F.col("id") % 2).alias("key"), F.col("id").alias("v")
    )
    with pytest.raises(ValueError, match="salt_col"):
        top_k_per_key(df, "key", [F.col("v").desc()], 2, impl="two_stage")
