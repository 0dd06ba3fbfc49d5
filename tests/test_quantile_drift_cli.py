"""Quantile-drift checks, snapshot round-trip, and the CLI surface."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from snowy_json_spark.engine import ValidationEngine
from snowy_json_spark.operators.drift import quantile_drift_verdict
from snowy_json_spark.sources.pages import generate_pages, lang_ref, with_partition_cols


SPEC = {
    "required": ["url", "lang"],
    "properties": {"lang": {"pattern": "^[a-z]{2}$"}},
    "x-table-checks": [
        {
            "id": "len_qdrift",
            "kind": "quantile_drift",
            "column": "text_len",
            "expr": "length(text)",
            "probs": [0.25, 0.5, 0.9],
            "rel_tolerance": 0.15,
        },
    ],
}


def test_quantile_drift_math():
    v = quantile_drift_verdict({"0.5": 100.0}, {"0.5": 100.0})
    assert v["status"] == "pass" and v["max_rel_diff"] == 0.0
    v = quantile_drift_verdict({"0.5": 130.0}, {"0.5": 100.0}, rel_tolerance=0.1)
    assert v["status"] == "fail" and v["at_quantile"] == "0.5"


@pytest.fixture(scope="module")
def pages(spark):
    return with_partition_cols(generate_pages(spark, 2000, 8), 4).cache()


def test_snapshot_roundtrip_and_drift(spark, pages, tmp_path):
    eng = ValidationEngine(SPEC, id_cols=["url"], partition_cols=["lang"])
    snap = eng.collect_snapshot(pages)
    path = str(tmp_path / "snapshot.json")
    eng.save_snapshot(snap, path)
    loaded = eng.load_snapshot(path)
    assert loaded == json.loads(json.dumps(snap))  # JSON-stable

    # identical data vs snapshot → pass
    res = eng.run(pages, dims={}, snapshot=loaded)
    q = [d for d in res.drift if d["check_id"] == "len_qdrift"]
    assert q and q[0]["status"] == "pass"

    # shifted text length → fail
    shifted = pages.withColumn("text", F.concat(F.col("text"), F.repeat(F.lit("x"), 400)))
    res2 = eng.run(shifted, dims={}, snapshot=loaded)
    q2 = [d for d in res2.drift if d["check_id"] == "len_qdrift"]
    assert q2 and q2[0]["status"] == "fail"


def test_cli_end_to_end(spark, pages, tmp_path):
    # exercise the spark-submit entry point in-process (same SparkSession)
    from snowy_json_spark.cli import main

    inp = str(tmp_path / "pages")
    pages.write.parquet(inp)
    ref = str(tmp_path / "lang_ref")
    lang_ref(spark).write.parquet(ref)
    spec_path = str(tmp_path / "spec.json")
    spec = dict(SPEC)
    spec["x-table-checks"] = SPEC["x-table-checks"] + [
        {"id": "lang_valid", "kind": "referential", "column": "lang", "ref": "lang_ref"},
    ]
    json.dump(spec, open(spec_path, "w"))

    rc = main(
        [
            "--input", inp,
            "--spec", spec_path,
            "--out", str(tmp_path / "out"),
            "--manifest", str(tmp_path / "manifest"),
            "--dim", f"lang_ref={ref}",
            "--id-cols", "url",
            "--partition-cols", "lang",
        ]
    )
    assert rc == 0
    assert (tmp_path / "out" / "metrics.json").exists()

    # resubmission skips everything (manifest)
    rc2 = main(
        [
            "--input", inp,
            "--spec", spec_path,
            "--out", str(tmp_path / "out2"),
            "--manifest", str(tmp_path / "manifest"),
            "--dim", f"lang_ref={ref}",
            "--id-cols", "url",
            "--partition-cols", "lang",
        ]
    )
    assert rc2 == 0
    m = json.load(open(tmp_path / "out2" / "metrics.json"))
    assert len(m["skipped_partitions"]) > 0


def test_cli_rejects_bad_spec(tmp_path):
    from snowy_json_spark.cli import main

    spec_path = str(tmp_path / "bad.json")
    json.dump({"properties": {"x": {"minimum": 10, "maximum": 5}}}, open(spec_path, "w"))
    rc = main(["--input", "x", "--spec", spec_path, "--out", str(tmp_path / "o")])
    assert rc == 2
