"""Draft-dependent format gating and the cross-document $ref registry.

- Snow asserts `format` by default up to Draft-07 but treats it as
  annotation-only under 2019-09 unless the FORMAT option / vocabulary
  enables it (`Options.java:51-52`, `Format.java:248-259`).
- Snow resolves URI $refs across documents (network only under
  AUTO_RESOLVE, `Validator.java:214-321`); the engine takes a local
  {uri: document} registry at compile time instead.
"""

from __future__ import annotations

import pytest

from snowy_json_spark.plans.compiler import Options, SpecError, compile_spec
from snowy_json_spark.plans.report import with_verdict


def _passed(spark, spec, value="not-an-ip", **kw):
    df = spark.createDataFrame([(value,)], "s string")
    plan = compile_spec(spec, df.schema, **kw)
    return with_verdict(df, plan).collect()[0]["passed"]


def test_format_asserts_by_default_on_draft07(spark):
    spec = {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "properties": {"s": {"format": "ipv4"}},
    }
    assert _passed(spark, spec) is False


def test_format_annotation_only_by_default_on_201909(spark):
    spec = {
        "$schema": "https://json-schema.org/draft/2019-09/schema",
        "properties": {"s": {"format": "ipv4"}},
    }
    assert _passed(spark, spec) is True  # not asserted
    # no $schema → engine default 2019-09 → same
    assert _passed(spark, {"properties": {"s": {"format": "ipv4"}}}) is True


def test_format_option_overrides_draft_default(spark):
    spec_2019 = {
        "$schema": "https://json-schema.org/draft/2019-09/schema",
        "properties": {"s": {"format": "ipv4"}},
    }
    assert _passed(spark, spec_2019, options=Options(assert_format=True)) is False
    spec_07 = {
        "$schema": "http://json-schema.org/draft-07/schema#",
        "properties": {"s": {"format": "ipv4"}},
    }
    assert _passed(spark, spec_07, options=Options(assert_format=False)) is True


DIM_DOC = {
    "$defs": {
        "langcode": {"pattern": "^[a-z]{2}$"},
    },
    "$anchor": "root",
    "pattern": "^[a-z]",
}


def test_cross_document_ref_pointer(spark):
    spec = {
        "properties": {
            "s": {"$ref": "https://example.com/dims.json#/$defs/langcode"}
        }
    }
    reg = {"https://example.com/dims.json": DIM_DOC}
    assert _passed(spark, spec, value="en", registry=reg) is True
    assert _passed(spark, spec, value="EN", registry=reg) is False


def test_cross_document_ref_whole_doc_and_anchor(spark):
    reg = {"https://example.com/dims.json": DIM_DOC}
    whole = {"properties": {"s": {"$ref": "https://example.com/dims.json"}}}
    assert _passed(spark, whole, value="abc", registry=reg) is True
    assert _passed(spark, whole, value="ABC", registry=reg) is False
    anchored = {"properties": {"s": {"$ref": "https://example.com/dims.json#root"}}}
    assert _passed(spark, anchored, value="abc", registry=reg) is True


def test_refs_inside_external_doc_stay_local(spark):
    """A local $ref inside a registry document resolves against THAT
    document, not the root spec (CoreRef base-URI semantics)."""
    ext = {"$defs": {"inner": {"minLength": 3}}, "$ref": "#/$defs/inner"}
    spec = {
        "$defs": {"inner": {"minLength": 99}},  # decoy in the root doc
        "properties": {"s": {"$ref": "https://example.com/ext.json"}},
    }
    reg = {"https://example.com/ext.json": ext}
    assert _passed(spark, spec, value="abc", registry=reg) is True
    assert _passed(spark, spec, value="ab", registry=reg) is False


def test_unregistered_external_ref_is_compile_error(spark):
    df = spark.createDataFrame([("x",)], "s string")
    spec = {"properties": {"s": {"$ref": "https://example.com/missing.json"}}}
    with pytest.raises(SpecError, match="registry"):
        compile_spec(spec, df.schema)


def test_cross_document_cycle_detected(spark):
    a = {"$ref": "https://example.com/b.json"}
    b = {"$ref": "https://example.com/a.json"}
    reg = {"https://example.com/a.json": a, "https://example.com/b.json": b}
    df = spark.createDataFrame([("x",)], "s string")
    spec = {"properties": {"s": {"$ref": "https://example.com/a.json"}}}
    with pytest.raises(SpecError, match="cycle"):
        compile_spec(spec, df.schema, registry=reg)
