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
- ``\\cX`` with a lower-case letter is upper-cased (ECMA allows both
  forms, Java only the upper-case one).
- ``\\v`` → ``\\u000B``: ECMA ``\\v`` is exactly the vertical tab; Java 8+
  ``\\v`` is the whole vertical-whitespace CLASS [\\n\\x0B\\f\\r…] — a
  silent false-positive source if passed through.
- ``\\0`` → ``\\u0000``; a following decimal digit is an ECMA syntax
  error (legal-but-different in Java) and raises.
- any other escaped ID_Continue character (``\\a``, ``\\e``, ``\\_``, …)
  is an ECMA IdentityEscape violation and raises — Java would accept
  several of these with DIFFERENT meanings (``\\a`` = BEL, ``\\e`` = ESC),
  so passing them through would validate wrongly rather than loudly.

Divergence from the reference, on purpose: translation is character-
class aware (``$`` inside ``[...]`` stays a literal dollar; the
reference mangles it to ``\\z`` inside classes too, a latent bug we do
not reproduce).

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

# Escapes with identical meaning in both dialects: assertions/backrefs
# (b B 1-9 k), class escapes (d D w W p P), control escapes (f n r t),
# hex/unicode prefixes (x u), and escaped syntax characters.
_PASSTHROUGH = set("bB123456789dDwWpPfnrtxuk/^$\\.*+?()[]{}|-")


def _is_id_continue(c: str) -> bool:
    """Unicode ID_Continue approximation via Python's identifier rules
    (XID_Continue — the same set for every character that can appear in
    a regex escape here)."""
    return ("_" + c).isidentifier()


def translate(pattern: str) -> str:
    """Translate an ECMA-262 regex into an equivalent Java regex string.

    Raises :class:`re.error` on constructs that are syntax errors in
    ECMA-262 even though Java would accept them (``\\0<digit>``,
    escaped ID_Continue identity escapes).
    """
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
            elif nxt == "c":
                # ECMA control escape = chr(ord(X) % 32).  Emit the code
                # point explicitly instead of Java's \cX: Java computes
                # X ^ 64, which agrees with ECMA for letters but NOT for
                # Annex B's in-class ClassControlLetter digits/underscore
                # ('5'^64 = 'u' vs '5'%32 = \x15).  Valid control letters:
                # [A-Za-z] outside a class; [A-Za-z0-9_] inside (Annex B).
                nxt2 = pattern[i + 2] if i + 2 < n else ""
                is_letter = "a" <= nxt2 <= "z" or "A" <= nxt2 <= "Z"
                is_class_ctrl = is_letter or nxt2.isdigit() or nxt2 == "_"
                if (in_class and is_class_ctrl) or (not in_class and is_letter):
                    out.append("\\u%04X" % (ord(nxt2) % 32))
                    i += 3
                    continue
                # Annex B: otherwise \c is the literal two-char sequence
                # '\c' — Java would instead read a control escape
                # (\c1 = control-'1'), silently matching the wrong char,
                # so emit an escaped backslash.
                out.append("\\\\c")
                i += 2
                continue
            elif nxt == "v":
                out.append("\\u000B")
            elif nxt == "0":
                if i + 2 < n and pattern[i + 2].isdigit():
                    raise re.error(
                        "ECMA-262: \\0 cannot be followed by a decimal digit",
                        pattern,
                        i,
                    )
                out.append("\\u0000")
            elif nxt in _PASSTHROUGH:
                out.append(c)
                out.append(nxt)
            elif _is_id_continue(nxt):
                raise re.error(
                    f"ECMA-262: \\{nxt} is not a valid escape "
                    "(ID_Continue identity escapes are disallowed)",
                    pattern,
                    i,
                )
            else:
                # identity escape of a non-identifier character — safe
                # to keep escaped in Java
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
    ``\\Z`` for end-of-input, mirroring :func:`translate` (which
    already lowers ECMA control escapes to explicit ``\\uXXXX`` code
    points, so they need no Python-specific handling).
    """
    java = translate(pattern)
    # rewrite Java's end-of-input \z to Python's \Z ESCAPE-CONTEXT-
    # aware: a blind str.replace would also rewrite the 'z' after an
    # ESCAPED backslash (pattern '\\z' — literal backslash + 'z'),
    # corrupting the pattern.  Control escapes never reach here:
    # translate emits them as explicit \uXXXX code points.
    out: list[str] = []
    i, n = 0, len(java)
    while i < n:
        c = java[i]
        if c == "\\" and i + 1 < n:
            nxt = java[i + 1]
            out.append(c)
            out.append("Z" if nxt == "z" else nxt)
            i += 2
            continue
        out.append(c)
        i += 1
    return re.compile("".join(out))


def is_valid_ecma(pattern: str) -> bool:
    """Best-effort validity check for ``format: regex``."""
    try:
        compile_python(pattern)
        return True
    except re.error:
        return False
