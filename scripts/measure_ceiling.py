"""Measure the sandbox's own N-vs-4N thread scaling ceiling.

Fixed total work (GIL-releasing numpy matmuls, BLAS pinned to one
thread) split across 1 vs 4 Python threads, with the same cooldown +
min-of-reps protocol as bench_scaling.py.  Used to separate
machine-attributable from engine-attributable scaling loss: the Spark
engine cannot out-scale the hypervisor it runs on.

Regimes matter (see BENCH.md): pick --chunks so BOTH levels run longer
than the ~30 s burst window when comparing against sustained Spark
runs.

Usage: OMP_NUM_THREADS=1 python scripts/measure_ceiling.py [--chunks 3600]
"""

from __future__ import annotations

import argparse
import json
import threading
import time

import numpy as np

A = np.random.RandomState(0).rand(384, 384)


def one_chunk() -> None:
    for _ in range(25):
        (A @ A).sum()


def run(nthreads: int, chunks: int) -> float:
    cnt = [0]
    lock = threading.Lock()

    def worker() -> None:
        while True:
            with lock:
                if cnt[0] >= chunks:
                    return
                cnt[0] += 1
            one_chunk()

    ts = [threading.Thread(target=worker) for _ in range(nthreads)]
    t0 = time.monotonic()
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    return time.monotonic() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=3600)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cooldown", type=int, default=85)
    args = ap.parse_args()
    out: dict[int, list[float]] = {}
    for _ in range(args.reps):
        for n in (1, 4):
            time.sleep(args.cooldown)
            out.setdefault(n, []).append(round(run(n, args.chunks), 2))
    t1, t4 = min(out[1]), min(out[4])
    print(
        json.dumps(
            {
                "chunks": args.chunks,
                "times_1": out[1],
                "times_4": out[4],
                "t1": t1,
                "t4": t4,
                "machine_ceiling_efficiency": round(t1 / t4 / 4, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
