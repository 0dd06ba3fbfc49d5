"""Text canonicalization: Unicode normalization + control-char policy.

No Snow analog — training-data-pipeline capability: web text arrives
in mixed Unicode forms (NFC vs NFD é, full-width compatibility chars,
stray C0 controls from broken encoders).  Dedup keys, tokenizers and
contamination n-grams all assume ONE canonical form, so
normalization must happen before any of them — and must be byte-wise
reproducible so an incremental run keys the same text to the same
hash as last month's corpus.

- :func:`unicode_normalize_udf` — NFC/NFKC/NFD/NFKD via a vectorized
  Arrow pandas UDF (``unicodedata.normalize`` over batches; the JVM
  has no NFC builtin).  This is the one Python hop; everything else
  stays JVM-side.
- :func:`strip_control_chars` — drop C0/C1 controls except
  tab/newline/carriage-return, pure ``regexp_replace``.
- :func:`canonical_text` — the composed policy column used by
  curation pipelines: strip controls → Unicode-normalize →
  (optionally) collapse whitespace runs.

Scale: the pandas UDF is a map-only stage (no shuffle), Arrow-batched,
~10⁶ short strings/s/core; skipping it for pure-ASCII batches is a
cheap win implemented below (``str.isascii`` — ASCII is NFC-invariant
and the overwhelming majority of crawl text), so the common case is a
vectorized no-op.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_FORMS = ("NFC", "NFKC", "NFD", "NFKD")

#: C0 controls except tab/newline/CR, plus DEL and C1 (regex class).
_CONTROL_CLASS = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\x80-\\x9F]"


def unicode_normalize_udf(form: str = "NFC"):
    """Vectorized ``unicodedata.normalize(form, ·)``; nulls pass
    through, ASCII rows short-circuit (NFC/NFKC/NFD/NFKD are all
    identity on pure ASCII)."""
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}, got {form!r}")
    import unicodedata

    @pandas_udf("string")
    def norm(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            yield s.map(
                lambda t: t
                if t is None or t.isascii()
                else unicodedata.normalize(form, t)
            )

    return norm


def strip_control_chars(col: Column) -> Column:
    """Remove C0/C1 control characters except ``\\t``/``\\n``/``\\r``
    — JVM ``regexp_replace``, no UDF."""
    return F.regexp_replace(col, _CONTROL_CLASS, "")


def collapse_whitespace(col: Column) -> Column:
    """Collapse whitespace runs to single spaces and trim — the
    canonical pre-shingling form (case-preserving, unlike
    ``dedup.normalized_text`` which also lowercases)."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def canonical_text(
    col: Column,
    form: str = "NFC",
    strip_controls: bool = True,
    collapse_ws: bool = False,
) -> Column:
    """The composed canonicalization policy: controls stripped
    JVM-side first (fewer bytes reach the Python hop), then Unicode
    normalization, then optional whitespace collapse."""
    out = strip_control_chars(col) if strip_controls else col
    out = unicode_normalize_udf(form)(out)
    if collapse_ws:
        out = collapse_whitespace(out)
    return out
