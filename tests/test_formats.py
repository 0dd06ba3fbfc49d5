"""Operator goldens for §2.2 format sub-validators.

Edge cases from FIXTURES.md: Feb-29 leap-year (`Format.java:282-299`),
leap second `:60` (`Format.java:57`), uri vs uri-reference absoluteness
(`Format.java:349-359`).
"""

from __future__ import annotations

import pytest

from snowy_json_spark.plans.compiler import compile_spec
from snowy_json_spark.plans.report import with_verdict

CASES = {
    "date": [
        ("2024-02-29", True),  # leap year
        ("2023-02-29", False),  # not a leap year
        ("2024-04-31", False),  # April has 30 days
        ("2024-12-01", True),
        ("2024-13-01", False),
        ("24-12-01", False),
    ],
    "date-time": [
        ("2024-02-29T12:00:00Z", True),
        ("2024-02-29T23:59:60Z", True),  # leap second
        ("2023-02-29T12:00:00Z", False),
        ("2024-02-28T24:00:00Z", False),  # hour 24
        ("2024-02-28T12:00:00+05:30", True),
        ("2024-02-28 12:00:00Z", False),  # space separator
    ],
    "time": [
        ("23:59:60Z", True),
        ("12:34:56.789+01:00", True),
        ("12:34:56", False),  # missing offset
        ("25:00:00Z", False),
    ],
    "duration": [
        ("P1Y2M3DT4H5M6S", True),
        ("PT1S", True),
        ("P3W", True),
        ("P", False),
        ("PT", False),
        ("1Y", False),
    ],
    "email": [
        ("a@b.com", True),
        ("a.b@c.d.com", True),
        (".a@b.com", False),
        ("a..b@c.com", False),
        ("a@", False),
    ],
    "hostname": [
        ("example.com", True),
        ("a-b.example", True),
        ("-bad.com", False),
        ("bad-.com", False),
        ("a" * 64 + ".com", False),  # label too long
    ],
    "ipv4": [
        ("1.2.3.4", True),
        ("255.255.255.255", True),
        ("256.1.1.1", False),
        ("1.2.3", False),
    ],
    "ipv6": [
        ("::1", True),
        ("2001:db8::8a2e:370:7334", True),
        ("1.2.3.4", False),
        ("::g", False),
    ],
    "uri": [
        ("https://example.com/a?q=1#f", True),
        ("mailto:a@b.com", True),
        ("/relative/only", False),  # not absolute
        ("http://exa mple.com", False),
    ],
    "uri-reference": [
        ("/relative/only", True),
        ("https://example.com", True),
        ("a b", False),
    ],
    "uuid": [
        ("123e4567-e89b-12d3-a456-426614174000", True),
        ("123e4567e89b12d3a456426614174000", False),
    ],
    "uri-template": [
        ("http://example.com/{id}", True),
        ("http://example.com/{id", False),
        ("{/path*}{?q,n}", True),
        ("{=bad}", False),
    ],
    "json-pointer": [
        ("/a/b~1c/0", True),
        ("", True),
        ("a/b", False),
        ("/a~2b", False),
    ],
    "relative-json-pointer": [
        ("0", True),
        ("1/a", True),
        ("0#", True),
        ("01", False),
        ("/a", False),
    ],
    "regex": [
        ("^a+b$", True),
        ("(unclosed", False),
    ],
    "idn-hostname": [
        ("example.com", True),
        ("bücher.example", True),
        ("-bad.example", False),
    ],
}


@pytest.mark.parametrize("fmt", sorted(CASES))
def test_format(spark, fmt):
    values = CASES[fmt]
    df = spark.createDataFrame([(v,) for v, _ in values], "s string")
    plan = compile_spec(
        {"$schema": "http://json-schema.org/draft-07/schema#",
         "properties": {"s": {"format": fmt}}},
        df.schema,
    )
    got = [r["passed"] for r in with_verdict(df, plan).collect()]
    want = [ok for _, ok in values]
    assert got == want, f"{fmt}: {list(zip([v for v, _ in values], got, want))}"


def test_unknown_format_passes(spark):
    df = spark.createDataFrame([("anything",)], "s string")
    plan = compile_spec(
        {"$schema": "http://json-schema.org/draft-07/schema#",
         "properties": {"s": {"format": "no-such-format"}}},
        df.schema,
    )
    assert with_verdict(df, plan).collect()[0]["passed"] is True
    assert plan.leaves == []


def test_content_encoding_and_media_type(spark):
    from snowy_json_spark.plans.compiler import Options

    df = spark.createDataFrame(
        [("eyJhIjogMX0=",), ("not base64!!",)], "s string"
    )  # first decodes to {"a": 1}
    spec = {
        # content* assert only when Option.CONTENT is enabled — Snow
        # defaults it OFF for every draft (ContentMediaType.java:63-65)
        "$schema": "http://json-schema.org/draft-07/schema#",
        "properties": {
            "s": {"contentEncoding": "base64", "contentMediaType": "application/json"}
        }
    }
    plan = compile_spec(spec, df.schema, options=Options(assert_content=True))
    got = [r["passed"] for r in with_verdict(df, plan).collect()]
    assert got == [True, False]
    # default (CONTENT off): annotation-only, both rows pass
    plan = compile_spec(spec, df.schema)
    got = [r["passed"] for r in with_verdict(df, plan).collect()]
    assert got == [True, True]


def test_content_media_type_syntax_and_draft_gating(spark):
    from snowy_json_spark.plans.compiler import Options

    df = spark.createDataFrame([("anything",)], "s string")
    # malformed media-type syntax fails every string instance (opt-in)
    bad = {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "properties": {"s": {"contentMediaType": "not a media type"}},
    }
    plan = compile_spec(bad, df.schema, options=Options(assert_content=True))
    assert with_verdict(df, plan).collect()[0]["passed"] is False
    # well-formed non-JSON media type: syntax-only, instance passes
    ok = {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "properties": {"s": {"contentMediaType": "image/png; name=\"x\""}},
    }
    plan = compile_spec(ok, df.schema, options=Options(assert_content=True))
    assert with_verdict(df, plan).collect()[0]["passed"] is True
    # default: annotation-only, even malformed syntax does not assert
    plan = compile_spec(
        {"properties": {"s": {"contentMediaType": "not a media type"}}}, df.schema
    )
    assert with_verdict(df, plan).collect()[0]["passed"] is True


# ---------------------------------------------------------------------------
# official optional/format/idn-hostname.json cases (authored from the
# public suite's well-known cases), run against BOTH the idna path and
# the RFC 5891 fallback (round-4: strict no-idna label rules)
# ---------------------------------------------------------------------------

# (value, valid, fallback_can_judge) — cases needing the full IDNA
# CONTEXTO/Bidi tables are marked False and only asserted on the idna
# path (the fallback is a documented approximation there)
IDN_HOSTNAME_OFFICIAL = [
    ("실례.테스트", True, True),          # 실례.테스트
    ("xn--ihqwcrb4cv8a8dqg056pqjye", True, True),             # valid Chinese A-label
    ("-> $1.00 <--", False, True),                            # illegal chars
    ("xn--X", False, True),                                   # invalid punycode
    ("XN--aa---o47jg78q", False, True),                       # U-label with '--' in 3-4
    ("-hello", False, True),                                  # leading dash
    ("hello-", False, True),                                  # trailing dash
    ("-hello-", False, True),
    ("ःhello", False, True),                             # leading Spacing Combining Mark
    ("̀hello", False, True),                             # leading Nonspacing Mark
    ("҈hello", False, True),                             # leading Enclosing Mark
    ("hel-lo", True, True),                                   # interior dash fine
    ("ab--cd", False, True),                                  # hyphen-34 rule
    ("a.b.c", True, True),
    ("", False, True),
    # CONTEXTO/CONTEXTJ + Bidi cases (round-4: fallback now judges
    # these via _idn_context_ok/_idn_bidi_ok; idna verdicts confirmed)
    ("l·l", True, True),                                # A.3 middle dot between l's
    ("a·l", False, True),                               # middle dot needs l on both sides
    ("l·", False, True),
    ("·l", False, True),
    ("α͵β", True, True),                      # A.4 keraia followed by Greek
    ("α͵S", False, True),                          # keraia followed by Latin
    ("א׳ב", True, True),                      # A.5 geresh after Hebrew
    ("׳ב", False, True),                           # geresh with nothing before
    ("א״ב", True, True),                      # A.6 gershayim after Hebrew
    ("״ב", False, True),                           # gershayim with nothing before
    ("क्‌ष", True, True),                    # A.1 ZWNJ preceded by virama
    ("क‌ष", False, True),                          # ZWNJ no virama, no join context
    ("بي‌بي", True, True),              # ZWNJ in Arabic join context
    ("क्‍ष", True, True),                    # A.2 ZWJ preceded by virama
    ("क‍ष", False, True),                          # ZWJ without virama
    ("א0٠", False, True),                         # Bidi: EN+AN mixed in RTL label
    ("aא", False, True),                               # Bidi: R char in LTR label
    ("אb", False, True),                               # Bidi: L char in RTL label
    ("٠۰", False, True),                          # A.8/A.9 Arabic digit sets mixed
    ("a・b", False, True),                              # A.7 katakana dot, no CJK in label
    ("ア・イ", True, True),                       # katakana dot with Katakana
    ("א.ב", True, True),                          # pure RTL domain
    ("ab.א", True, True),                              # mixed-direction labels, each valid
    # A.1 ZWNJ exact Joining_Type regex — cases the pre-round-5
    # script-name heuristic judged wrong (any Arabic letter on both
    # sides passed); exact rule: (L|D)(T)*ZWNJ(T)*(R|D)
    ("ا‌ا", False, True),       # R+ZWNJ+R: alef is right-joining, not L/D
    ("ا‌ب", False, True),       # R+ZWNJ+D: left side must be L or D
    ("ب‌ا", True, True),        # D+ZWNJ+R: beh dual-joining, alef right
    ("بَ‌ب", True, True),        # D + fatha (T, skipped) + ZWNJ + D
    ("a‌ب", False, True),       # U+ZWNJ+D: Latin is non-joining
]


def _fallback_is_idn_hostname(v):
    """Run _is_idn_hostname with the idna package masked out."""
    import builtins
    import sys

    from snowy_json_spark.functions import formats

    real_import = builtins.__import__

    def no_idna(name, *a, **k):
        if name == "idna":
            raise ImportError("masked for fallback test")
        return real_import(name, *a, **k)

    saved = sys.modules.pop("idna", None)
    builtins.__import__ = no_idna
    try:
        return formats._is_idn_hostname(v)
    finally:
        builtins.__import__ = real_import
        if saved is not None:
            sys.modules["idna"] = saved


def test_idn_hostname_official_idna_path():
    from snowy_json_spark.functions.formats import _is_idn_hostname

    for v, valid, _ in IDN_HOSTNAME_OFFICIAL:
        assert _is_idn_hostname(v) is valid, f"idna path: {v!r}"


def test_idn_hostname_official_fallback_path():
    for v, valid, judgeable in IDN_HOSTNAME_OFFICIAL:
        if not judgeable:
            continue
        assert _fallback_is_idn_hostname(v) is valid, f"fallback: {v!r}"


def test_idn_hostname_fallback_punycode_roundtrip():
    # A-label whose ACE form decodes but does not roundtrip (mixed
    # case / non-canonical) must be rejected by the fallback
    assert _fallback_is_idn_hostname("xn--bcher-kva.example")  # bücher
    assert not _fallback_is_idn_hostname("xn--")               # empty U-label
    assert not _fallback_is_idn_hostname("xn--ascii-only-")    # trailing dash
