"""ECMA-262 translation edge cases: \\c / \\z escape-context handling."""

from __future__ import annotations

from snowy_json_spark.functions.ecma_regex import (
    compile_python,
    is_valid_ecma,
    translate,
)


def test_control_escape_letter_both_cases():
    # control escapes emit explicit code points (ord % 32)
    assert translate(r"\ca") == "\\u0001"
    assert translate(r"\cZ") == "\\u001A"
    assert compile_python(r"\cA").match("\x01")
    assert compile_python(r"\cj").match("\x0a")


def test_control_escape_non_letter_is_literal_backslash_c():
    """ECMA Annex B: \\c not followed by a letter (outside a class) is
    the literal two chars '\\c' — Java would instead read a control
    character and silently match the wrong thing."""
    assert translate(r"\c1") == "\\\\c1"
    assert compile_python(r"\c1").match("\\c1")
    assert not compile_python(r"\c1").match("q1")
    assert is_valid_ecma(r"\c1")
    # trailing \c at end of pattern: same literal reading
    assert translate(r"x\c") == "x\\\\c"
    assert compile_python(r"x\c").match("x\\c")


def test_in_class_control_escape_digits_and_underscore():
    """Annex B ClassControlLetter: inside a class, \\c accepts
    [A-Za-z0-9_], value = ord % 32 — NOT Java's XOR-64 ('5'^64='u')."""
    assert translate(r"[\c5]") == "[\\u0015]"
    assert compile_python(r"[\c5]").match("\x15")
    assert not compile_python(r"[\c5]").match("u")
    assert compile_python(r"[\c_]").match("\x1f")
    assert compile_python(r"[\cA]").match("\x01")


def test_escaped_backslash_then_c_is_not_a_control_escape():
    """Pattern '\\\\cA' is a literal backslash followed by 'cA'; the
    translation must not rewrite it into a control char."""
    p = compile_python("\\\\cA")
    assert p.match("\\cA")
    assert not p.match("\x01")
    # and a REAL control escape right after an escaped backslash
    q = compile_python("\\\\\\cA")
    assert q.match("\\\x01")


def test_escaped_backslash_then_z_is_not_end_anchor():
    """Pattern '\\\\z' is a literal backslash + 'z'; the \\z → \\Z
    rewrite for Python must not span the escaped backslash."""
    p = compile_python("\\\\z")
    assert p.match("\\z")
    assert not p.match("\\Z")
    # the real $ anchor still becomes end-of-input in Python
    q = compile_python("ab$")
    assert q.search("ab")
    assert not q.search("ab\n")
