"""100M-row flagship scale exhibit (round-4, VERDICT item 8).

Extends the BENCH.md scaling campaign one decade past the 32M point:
the shipped flagship job (engine.run_single_pass — one wide-source
scan → flagged table → verdicts + violations + hash-first uniqueness +
broadcast referential) over a pre-materialized 100M-row pages parquet
at local[32], recording wall time AND shuffle read/write bytes from
the Spark UI REST API (the numbers a cluster operator would capture).

Protocol follows bench_scaling.py (fresh JVM, file-cache warm count,
cooldowns between reps, min-of-reps as the burst estimate) with fewer
reps — one 100M rep is ~3 sustained minutes, so rep count matters less
than at 2M.

Usage: python scripts/bench_100m.py [--rows 100000000] [--reps 2]
Writes SCALE_100M.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, shutil, sys, time, urllib.request
from pyspark.sql import functions as F
from snowy_json_spark.session import get_spark
from snowy_json_spark.engine import ValidationEngine
from snowy_json_spark.sources.pages import lang_ref

cores = int(sys.argv[1]); path = sys.argv[2]; reps = int(sys.argv[3])
cooldown = int(sys.argv[4]); spec = json.loads(sys.argv[5])
spark = get_spark("scale-100m", cores=cores,
                  extra_conf={"spark.ui.enabled": "true"})
spark.sparkContext.setLogLevel("ERROR")
ui = spark.sparkContext.uiWebUrl


def rest(path_):
    with urllib.request.urlopen(ui + "/api/v1" + path_) as r:
        return json.loads(r.read())


app_id = rest("/applications")[0]["id"]


def shuffle_totals():
    stages = rest(f"/applications/{app_id}/stages?status=complete")
    return (
        sum(s.get("shuffleReadBytes", 0) for s in stages),
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
        sum(s.get("inputBytes", 0) for s in stages),
    )


pages = spark.read.parquet(path)
n_rows = pages.count()  # warm file-cache/metadata
dims = {"lang_ref": lang_ref(spark)}
eng = ValidationEngine(spec, id_cols=["url"],
                       partition_cols=["lang", "url_bucket"])
times, shuffles = [], []
for i in range(reps):
    if i > 0 and cooldown:
        time.sleep(cooldown)
    out_dir = f"/tmp/scale100m_out"
    shutil.rmtree(out_dir, ignore_errors=True)
    r0, w0, i0 = shuffle_totals()
    t0 = time.monotonic()
    res = eng.run_single_pass(pages, out_dir, dims=dims)
    res.verdicts.agg(F.sum("row_count")).collect()
    res.violations.count()
    res.table_violations.count()
    times.append(time.monotonic() - t0)
    r1, w1, i1 = shuffle_totals()
    shuffles.append({"shuffle_read_bytes": r1 - r0,
                     "shuffle_write_bytes": w1 - w0,
                     "input_bytes": i1 - i0})
print("RESULT " + json.dumps({"times": times, "rows": n_rows,
                              "shuffles": shuffles}))
spark.stop()
"""

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
        {"id": "lang_valid", "kind": "referential", "column": "lang",
         "ref": "lang_ref"},
    ],
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000_000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--cooldown", type=int, default=90)
    ap.add_argument("--path", default=None)
    args = ap.parse_args()

    path = args.path or os.path.join(
        tempfile.gettempdir(), f"scaling_pages_{args.rows}"
    )
    if not os.path.exists(path):
        print(f"materializing {args.rows:,} rows at {path} ...", flush=True)
        code = (
            "from snowy_json_spark.session import get_spark\n"
            "from snowy_json_spark.sources.pages import generate_pages, with_partition_cols\n"
            "s = get_spark('gen', cores=32)\n"
            "s.sparkContext.setLogLevel('ERROR')\n"
            f"with_partition_cols(generate_pages(s, {args.rows}, 256))"
            f".write.mode('overwrite').parquet({path!r})\n"
            "s.stop()\n"
        )
        subprocess.run([sys.executable, "-c", code], check=True, cwd=REPO)

    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(args.cores), path,
         str(args.reps), str(args.cooldown), json.dumps(PAGES_SPEC)],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    res = None
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            res = json.loads(line[len("RESULT "):])
    if res is None:
        raise RuntimeError(f"no RESULT; stderr tail: {out.stderr[-2000:]}")

    best = min(res["times"])
    best_i = res["times"].index(best)
    sh = res["shuffles"][best_i]
    summary = {
        "metric": "flagship_100m_wall_seconds",
        "value": round(best, 2),
        "unit": "sec",
        "rows": res["rows"],
        "cores": args.cores,
        "docs_per_sec": round(res["rows"] / best, 1),
        "times": [round(t, 2) for t in res["times"]],
        "shuffle_read_bytes": sh["shuffle_read_bytes"],
        "shuffle_write_bytes": sh["shuffle_write_bytes"],
        "input_bytes": sh["input_bytes"],
        "job": "engine.run_single_pass over pre-materialized pages parquet "
               "(verdicts + violations + hash-first uniqueness + broadcast "
               "referential), shuffle bytes from the Spark UI REST API",
    }
    with open(os.path.join(REPO, "SCALE_100M.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
