"""End-to-end engine tests over the synthetic pages table (FIXTURES.md
§1/§3): full spec run, per-partition verdicts, checkpoint resume,
determinism.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from snowy_json_spark.engine import ValidationEngine
from snowy_json_spark.sources.pages import (
    generate_pages,
    lang_ref,
    with_partition_cols,
)
from snowy_json_spark.streaming.manifest import Manifest

PAGES_SPEC = {
    "required": ["url", "warc_ts", "lang"],
    "properties": {
        "url": {"type": "string", "pattern": "^https://", "maxLength": 2048},
        "lang": {"type": "string", "pattern": "^[a-z]{2}$"},
        "text": {"type": ["string", "null"], "minLength": 1},
        "warc_ts": {
            "type": "timestamp",
            "minimum": "2026-07-01 00:00:00",
            "maximum": "2026-07-31 00:00:00",
        },
    },
    "x-table-checks": [
        {"id": "url_unique", "kind": "unique", "keys": ["url"]},
        {"id": "lang_valid", "kind": "referential", "column": "lang", "ref": "lang_ref"},
        {
            "id": "text_len_drift",
            "kind": "drift",
            "column": "text_len",
            "expr": "length(text)",
            "lo": 0,
            "hi": 1000,
            "buckets": 20,
            "group_by": "lang",
        },
    ],
}


@pytest.fixture(scope="module")
def pages(spark):
    return with_partition_cols(generate_pages(spark, 2000, 8), url_buckets=4).cache()


def test_generator_determinism(spark, pages):
    again = with_partition_cols(generate_pages(spark, 2000, 8), url_buckets=4)
    a = sorted(map(tuple, pages.collect()))
    b = sorted(map(tuple, again.collect()))
    assert a == b


def test_text_byte_identical_per_url(spark, pages):
    # per-row invariant: same url ⇒ byte-identical text (BASELINE input_hint)
    dup_texts = (
        pages.filter(F.col("text").isNotNull())
        .groupBy("url")
        .agg(F.count_distinct("text").alias("n"))
        .filter(F.col("n") > 1)
    )
    assert dup_texts.count() == 0


def test_planted_violations_present(spark, pages):
    n = pages.count()
    assert n == 2000
    dup = pages.groupBy("url").count().filter("count > 1").count()
    assert dup > 0  # planted duplicates
    bad_lang = pages.filter(~F.col("lang").rlike("^[a-z]{2}$")).count()
    assert bad_lang > 0
    bad_url = pages.filter(~F.col("url").startswith("https://")).count()
    assert bad_url > 0


def test_engine_full_run(spark, pages):
    eng = ValidationEngine(
        PAGES_SPEC, id_cols=["url"], partition_cols=["lang", "url_bucket"]
    )
    res = eng.run(pages, dims={"lang_ref": lang_ref(spark)})
    verd = res.verdicts.collect()
    assert sum(r["row_count"] for r in verd) == 2000
    # en partitions exist and some partitions fail (planted violations)
    assert any(not r["passed"] for r in verd)
    v = res.violations
    cids = {r["constraint_id"] for r in v.select("constraint_id").distinct().collect()}
    assert "#/properties/url/pattern" in cids
    assert "#/properties/lang/pattern" in cids
    tv = res.table_violations.collect()
    t_cids = {r["constraint_id"] for r in tv}
    assert "#/x-table-checks/url_unique" in t_cids
    assert "#/x-table-checks/lang_valid" in t_cids
    # no baseline snapshot → every drift check reports the missing
    # baseline explicitly instead of self-comparing into a pass
    assert res.drift and all(d["status"] == "missing_snapshot" for d in res.drift)


def test_resume_skips_validated_partitions(spark, pages, tmp_path):
    man = Manifest(str(tmp_path / "manifest"))
    eng = ValidationEngine(PAGES_SPEC, id_cols=["url"], partition_cols=["lang"])
    full = eng.run(pages, dims={"lang_ref": lang_ref(spark)}, manifest=man)
    assert full.skipped_partitions == []
    full_verdicts = {r["lang"]: (r["row_count"], r["failed_rows"]) for r in full.verdicts.collect()}

    # second run: everything already validated
    again = eng.run(pages, dims={"lang_ref": lang_ref(spark)}, manifest=man)
    assert again.verdicts.count() == 0
    assert set(again.skipped_partitions) == set(
        man.validated_keys(spark, PAGES_SPEC)
    )
    assert len(again.skipped_partitions) == len(full_verdicts)


def test_resume_partial_then_complete(spark, pages, tmp_path):
    man = Manifest(str(tmp_path / "manifest2"))
    eng = ValidationEngine(PAGES_SPEC, id_cols=["url"], partition_cols=["lang"])
    langs = [r["lang"] for r in pages.select("lang").distinct().collect()]
    first_two = sorted(langs)[:2]
    subset = pages.filter(F.col("lang").isin(first_two))
    eng.run(subset, dims={"lang_ref": lang_ref(spark)}, manifest=man)

    # full run resumes: recomputes only the remaining partitions
    res = eng.run(pages, dims={"lang_ref": lang_ref(spark)}, manifest=man)
    assert sorted(res.skipped_partitions) == sorted(first_two)
    done_langs = {r["lang"] for r in res.verdicts.collect()}
    assert done_langs == set(langs) - set(first_two)

    # manifest now covers everything; final state identical to a full run
    eng2 = ValidationEngine(PAGES_SPEC, id_cols=["url"], partition_cols=["lang"])
    fresh = eng2.run(pages, dims={"lang_ref": lang_ref(spark)})
    fresh_v = {r["lang"]: (r["row_count"], r["failed_rows"]) for r in fresh.verdicts.collect()}
    man_rows = {
        r["partition_key"]: (r["row_count"], r["failed_rows"])
        for r in man.read(spark).filter("status = 'validated'").collect()
    }
    assert man_rows == fresh_v


def test_spec_change_invalidates_manifest(spark, pages, tmp_path):
    man = Manifest(str(tmp_path / "manifest3"))
    eng = ValidationEngine(PAGES_SPEC, id_cols=["url"], partition_cols=["lang"])
    eng.run(pages, dims={"lang_ref": lang_ref(spark)}, manifest=man)
    changed = dict(PAGES_SPEC)
    changed["properties"] = {**PAGES_SPEC["properties"], "text": {"minLength": 2}}
    eng2 = ValidationEngine(changed, id_cols=["url"], partition_cols=["lang"])
    res = eng2.run(pages, dims={"lang_ref": lang_ref(spark)}, manifest=man)
    assert res.skipped_partitions == []  # lineage hash moved → nothing skipped
