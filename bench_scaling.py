"""Scaling-efficiency benchmark: identical job at two parallelism levels.

North rule: "run via spark-submit on a multi-executor cluster at N and
4N executors with throughput scaling efficiency ≥0.8".  The sandbox has
no real cluster, so (per BASELINE.md protocol) the same job runs at
``local[N]`` and ``local[4N]`` on the same materialized input; each
level gets a fresh JVM (subprocess) and ≥3 warm runs, and

    efficiency = (throughput_4N / throughput_N) / 4

**Sandbox caveat**: this microVM throttles sustained CPU (measured:
an identical 32-thread numpy workload degrades ~3× after ~30s of
sustained load and recovers after ~90s idle).  To compare the two
levels fairly the script (a) cools down before each level and between
reps, (b) uses the MIN over reps — the burst-speed estimate — for both
levels.  Median-under-throttle would punish whichever level ran later.

Usage:
    python bench_scaling.py [--rows 2000000] [--n 8] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import time
import subprocess
import sys
import tempfile

WORKER = r"""
import json, shutil, sys, time
from pyspark.sql import functions as F
from snowy_json_spark.session import get_spark
from snowy_json_spark.engine import ValidationEngine
from snowy_json_spark.sources.pages import lang_ref

cores = int(sys.argv[1]); path = sys.argv[2]; reps = int(sys.argv[3])
spec = json.loads(sys.argv[4])
spark = get_spark("scaling-bench", cores=cores)
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet(path)
n_rows = pages.count()  # warm the file cache / metadata
dims = {"lang_ref": lang_ref(spark)}
eng = ValidationEngine(spec, id_cols=["url"], partition_cols=["lang", "url_bucket"])
cooldown = int(sys.argv[5])
times = []
for i in range(reps):
    if i > 0 and cooldown:
        time.sleep(cooldown)  # let the sandbox CPU-burst budget refill
    out_dir = f"/tmp/scaling_out_{cores}"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.monotonic()
    # the shipped flagship path: one source scan -> flagged table,
    # all downstream checks read the narrow projection
    res = eng.run_single_pass(pages, out_dir, dims=dims)
    res.verdicts.agg(F.sum("row_count")).collect()
    res.violations.count()
    res.table_violations.count()
    times.append(time.monotonic() - t0)
print("RESULT " + json.dumps({"cores": cores, "times": times, "rows": n_rows}))
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
        {"id": "lang_valid", "kind": "referential", "column": "lang", "ref": "lang_ref"},
    ],
}


def materialize(rows: int, path: str) -> None:
    code = (
        "from snowy_json_spark.session import get_spark\n"
        "from snowy_json_spark.sources.pages import generate_pages, with_partition_cols\n"
        f"s = get_spark('gen', cores=32)\n"
        "s.sparkContext.setLogLevel('ERROR')\n"
        f"with_partition_cols(generate_pages(s, {rows}, 128)).write.mode('overwrite').parquet({path!r})\n"
        "s.stop()\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True, cwd=os.path.dirname(__file__))


def run_level(cores: int, path: str, reps: int, cooldown: int) -> dict:
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            WORKER,
            str(cores),
            path,
            str(reps),
            json.dumps(PAGES_SPEC),
            str(cooldown),
        ],
        capture_output=True,
        text=True,
        check=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line; stderr tail: {out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--n", type=int, default=8, help="small level N (large = 4N)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cooldown", type=int, default=75)
    ap.add_argument("--path", default=None)
    args = ap.parse_args()

    path = args.path or os.path.join(tempfile.gettempdir(), f"scaling_pages_{args.rows}")
    if not os.path.exists(path):
        materialize(args.rows, path)

    time.sleep(args.cooldown)  # refill burst budget after materialization
    small = run_level(args.n, path, args.reps, args.cooldown)
    time.sleep(args.cooldown)
    large = run_level(args.n * 4, path, args.reps, args.cooldown)
    # MIN = burst-speed estimate, robust to sandbox CPU throttling
    t_n = min(small["times"])
    t_4n = min(large["times"])
    thr_n = small["rows"] / t_n
    thr_4n = large["rows"] / t_4n
    eff = (thr_4n / thr_n) / 4
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": round(eff, 3),
                "unit": "ratio",
                "n_cores": args.n,
                "rows": small["rows"],
                "t_n_sec": round(t_n, 2),
                "t_4n_sec": round(t_4n, 2),
                "docs_per_sec_n": round(thr_n, 1),
                "docs_per_sec_4n": round(thr_4n, 1),
                "times_n": [round(t, 2) for t in small["times"]],
                "times_4n": [round(t, 2) for t in large["times"]],
            }
        )
    )


if __name__ == "__main__":
    main()
