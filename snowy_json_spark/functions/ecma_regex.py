"""ECMA-262 → Java regex translation.

JSON Schema mandates ECMA-262 regex dialect for ``pattern`` /
``patternProperties`` / ``format: regex``.  Spark's ``rlike`` compiles
java.util.regex, whose semantics differ in a few observable ways.  The
reference engine ships a best-effort translation layer
(`/root/reference/src/main/java/com/qindesign/json/schema/util/Ecma262Pattern.java:106-201`);
this module re-implements the same *semantics* in Python (fresh code):

- ``$`` outside a character class → ``\\z``: ECMA ``$`` (no multiline)
  anchors at end-of-input, Java ``$`` also matches before a final line
  terminator.
- ``^`` is left alone (both anchor at start-of-input without MULTILINE).
- ``\\s`` / ``\\S`` → explicit ECMA WhiteSpace ∪ LineTerminator character
  class (Java's ``\\s`` is ASCII-only by default).
- ``\\d`` ``\\w`` ``\\D`` ``\\W`` are identical (ASCII) in both dialects —
  passed through.

Matching is **substring find**, not full match — the reference matches
with ``Matcher.find()`` (`keywords/Pattern.java:66`) and ``rlike`` has
the same find semantics, so no anchoring is added.
"""

from __future__ import annotations

import re

# ECMA-262 WhiteSpace + LineTerminator code points (spec §22.2.2.12)
_ECMA_WS = "\\t\\n\\x0B\\f\\r \\u00a0\\u1680\\u2000-\\u200a\\u2028\\u2029\\u202f\\u205f\\u3000\\ufeff"
_ECMA_S = f"[{_ECMA_WS}]"
_ECMA_NOT_S = f"[^{_ECMA_WS}]"


def translate(pattern: str) -> str:
    """Translate an ECMA-262 regex into an equivalent Java regex string."""
    out: list[str] = []
    in_class = False
    i = 0
    n = len(pattern)
    while i < n:
        c = pattern[i]
        if c == "\\" and i + 1 < n:
            nxt = pattern[i + 1]
            if nxt == "s":
                out.append(_ECMA_S if not in_class else _ECMA_WS)
            elif nxt == "S":
                if in_class:
                    # negated class inside a class is not expressible; keep \S
                    out.append("\\S")
                else:
                    out.append(_ECMA_NOT_S)
            else:
                out.append(c)
                out.append(nxt)
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
            out.append(c)
        else:
            if c == "[":
                in_class = True
                out.append(c)
            elif c == "$":
                out.append("\\z")
            else:
                out.append(c)
        i += 1
    return "".join(out)


def compile_python(pattern: str) -> re.Pattern:
    """Compile the ECMA pattern for Python-side (pandas UDF) matching.

    Python ``re`` ``$`` also matches before a trailing newline; use
    ``\\Z`` for end-of-input, mirroring :func:`translate`.
    """
    return re.compile(translate(pattern).replace("\\z", "\\Z"))


def is_valid_ecma(pattern: str) -> bool:
    """Best-effort validity check for ``format: regex``."""
    try:
        re.compile(translate(pattern).replace("\\z", "\\Z"))
        return True
    except re.error:
        return False
