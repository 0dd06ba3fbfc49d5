"""run_single_pass must produce results identical to run() while
scanning the source exactly once."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from snowy_json_spark.engine import ValidationEngine
from snowy_json_spark.sources.pages import generate_pages, lang_ref, with_partition_cols

SPEC = {
    "required": ["url", "lang"],
    "properties": {
        "url": {"pattern": "^https://"},
        "lang": {"pattern": "^[a-z]{2}$"},
        "text": {"type": ["string", "null"], "minLength": 1},
    },
    "x-table-checks": [
        {"id": "url_unique", "kind": "unique", "keys": ["url"]},
        {"id": "lang_valid", "kind": "referential", "column": "lang", "ref": "lang_ref"},
        # column_stats input must ride the flagged projection (round-1
        # advice: this used to KeyError in run_single_pass)
        {"id": "text_stats", "kind": "column_stats", "column": "text", "max_null_rate": 0.0},
        {
            "id": "len_drift",
            "kind": "drift",
            "column": "text_len",
            "expr": "length(text)",
            "lo": 0,
            "hi": 1000,
            "buckets": 10,
            "group_by": "lang",
        },
    ],
}


@pytest.fixture(scope="module")
def pages(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sp") / "pages")
    with_partition_cols(generate_pages(spark, 3000, 8), 4).write.parquet(path)
    return spark.read.parquet(path)


def test_single_pass_matches_run(spark, pages, tmp_path):
    eng = ValidationEngine(SPEC, id_cols=["url"], partition_cols=["lang"])
    dims = {"lang_ref": lang_ref(spark)}
    lazy = eng.run(pages, dims=dims)
    single = eng.run_single_pass(pages, str(tmp_path / "out"), dims=dims)

    as_set = lambda df: set(map(tuple, df.collect()))  # noqa: E731
    assert as_set(single.verdicts) == as_set(lazy.verdicts)
    assert as_set(single.violations) == as_set(lazy.violations)
    assert as_set(single.table_violations) == as_set(lazy.table_violations)
    d1 = {d["group"]: d["status"] for d in single.drift}
    d2 = {d["group"]: d["status"] for d in lazy.drift}
    assert d1 == d2
    assert single.stats == lazy.stats
    assert single.stats  # column_stats actually ran


def test_single_pass_resume(spark, pages, tmp_path):
    from snowy_json_spark.streaming.manifest import Manifest

    eng = ValidationEngine(SPEC, id_cols=["url"], partition_cols=["lang"])
    dims = {"lang_ref": lang_ref(spark)}
    m = Manifest(str(tmp_path / "manifest"))
    r1 = eng.run_single_pass(pages, str(tmp_path / "o1"), dims=dims, manifest=m)
    n1 = r1.verdicts.count()
    assert r1.skipped_partitions == [] and n1 > 0
    # re-submission: every partition already validated → all pruned
    r2 = eng.run_single_pass(pages, str(tmp_path / "o2"), dims=dims, manifest=m)
    assert r2.verdicts.count() == 0
    assert len(r2.skipped_partitions) == n1


def test_flagged_table_is_narrow(spark, pages, tmp_path):
    eng = ValidationEngine(SPEC, id_cols=["url"], partition_cols=["lang"])
    eng.run_single_pass(pages, str(tmp_path / "o2"), dims={"lang_ref": lang_ref(spark)})
    back = spark.read.parquet(str(tmp_path / "o2" / "flagged"))
    # html (the big binary column) must not ride along
    assert "html" not in back.columns
    assert {"lang", "url", "text_len", "passed", "violations"} <= set(back.columns)
