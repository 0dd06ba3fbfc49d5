"""Custom stateful streaming operator via ``applyInPandasWithState``.

Pattern for operators Spark's built-in streaming aggregations can't
express: arbitrary per-key state updated in Arrow batches.  The
shipped example keeps a **running validation profile per key** (total
rows, failed rows, violation rate since stream start) — unlike a
windowed aggregate, the state never resets, and unlike
``outputMode('complete')`` aggregation, state size is one tuple per
key, not per (key, window).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..plans.compiler import Options, compile_spec

OUTPUT_SCHEMA = "key string, total long, failed long, violation_rate double"
STATE_SCHEMA = "total long, failed long"


def running_violation_stats(
    stream_df: DataFrame,
    spec: dict,
    key_col: str,
    options: Options | None = None,
) -> DataFrame:
    """Per-key running (total, failed, violation_rate) over the whole
    stream lifetime.  Row checks compile to the same Column plan as
    batch (verdict-only mode); only the tiny per-key counters live in
    the state store."""
    plan = compile_spec(spec, stream_df.schema, options, collect=False)
    flagged = stream_df.select(
        F.col(key_col).cast("string").alias("key"),
        F.coalesce(plan.valid, F.lit(False)).alias("_passed"),
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        total, failed = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            total += len(pdf)
            failed += int((~pdf["_passed"]).sum())
        state.update((total, failed))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "total": [total],
                "failed": [failed],
                "violation_rate": [failed / total if total else 0.0],
            }
        )

    return flagged.groupBy("key").applyInPandasWithState(
        update,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def _accumulate_digest_state(state: GroupState, pdfs, delta: float):
    """Shared digest-state accumulator for the stateful t-digest
    operators: load state, fold each Arrow batch into the centroids,
    persist, and return (means, weights, n, lo, hi) — or None when no
    values have been seen yet."""
    import numpy as np

    from ..operators.tdigest import _compress

    if state.exists:
        means, weights, n, lo, hi = state.get
        m = np.asarray(means, dtype="float64")
        w = np.asarray(weights, dtype="float64")
    else:
        m = w = np.empty(0, dtype="float64")
        n, lo, hi = 0, None, None
    for pdf in pdfs:
        v = pdf["_v"].to_numpy(dtype="float64", na_value=np.nan)
        v = v[~np.isnan(v)]
        if v.size == 0:
            continue
        m = np.concatenate([m, v])
        w = np.concatenate([w, np.ones_like(v)])
        m, w = _compress(m, w, delta)
        n += int(v.size)
        lo = float(v.min()) if lo is None else min(lo, float(v.min()))
        hi = float(v.max()) if hi is None else max(hi, float(v.max()))
    if n == 0:
        return None
    state.update((list(map(float, m)), list(map(float, w)), n, lo, hi))
    return m, w, n, lo, hi


TDIGEST_OUTPUT_SCHEMA = (
    "key string, n long, lo double, hi double, p50 double, p99 double"
)
TDIGEST_STATE_SCHEMA = (
    "means array<double>, weights array<double>, n long, lo double, hi double"
)


def running_tdigest(
    stream_df: DataFrame,
    value_col: str,
    key_col: str,
    delta: float = 200.0,
) -> DataFrame:
    """Per-key running t-digest over the whole stream lifetime:
    emits (key, n, lo, hi, p50, p99) after every batch.

    The windowless analog of percentile monitoring: state per key is
    the digest itself (≤ ~2δ centroids, a few KB) — never the values —
    so a key that has seen 10^9 rows costs the same state as one that
    has seen 10^3.  Batch values are compressed INTO the existing
    centroids with the same numpy merge as the batch sketch
    (operators/tdigest.py), so stream and batch digests agree."""
    from ..operators.tdigest import TDigest

    src = stream_df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("_v"),
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        acc = _accumulate_digest_state(state, pdfs, delta)
        if acc is None:
            return
        m, w, n, lo, hi = acc
        d = TDigest(m, w, n, lo, hi)
        p50, p99 = (float(x) for x in d.quantile([0.5, 0.99]))
        yield pd.DataFrame(
            {"key": [key[0]], "n": [n], "lo": [lo], "hi": [hi],
             "p50": [p50], "p99": [p99]}
        )

    return src.groupBy("key").applyInPandasWithState(
        update,
        TDIGEST_OUTPUT_SCHEMA,
        TDIGEST_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def stream_tdigest_drift(
    stream_df: DataFrame,
    value_col: str,
    key_col: str,
    snapshot: dict,
    ks_fail: float = 0.2,
    delta: float = 200.0,
) -> DataFrame:
    """Streaming drift verdicts: a per-key running digest compared
    against a reference snapshot digest after every batch —
    (key, n, ks, status) with status pass / fail / missing_snapshot.

    The streaming closure of the batch ``tdigest_drift`` table check:
    ``snapshot`` is the engine's ``collect_snapshot`` digest dict
    (means/weights/n/lo/hi per key), broadcast by closure capture;
    state per key is the running digest only (≤ ~2δ centroids)."""
    from ..operators.tdigest import TDigest, tdigest_ks

    refs = {
        k: TDigest(v["means"], v["weights"], v["n"], v["lo"], v["hi"])
        for k, v in snapshot.items()
        if v.get("n")
    }
    src = stream_df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("_v"),
    )
    out_schema = "key string, n long, ks double, status string"
    state_schema = (
        "means array<double>, weights array<double>, n long, lo double, hi double"
    )

    def update(key, pdfs, state: GroupState):
        acc = _accumulate_digest_state(state, pdfs, delta)
        if acc is None:
            return
        m, w, n, lo, hi = acc
        ref = refs.get(key[0])
        if ref is None:
            ks, status = None, "missing_snapshot"
        else:
            ks = tdigest_ks(TDigest(m, w, n, lo, hi), ref)
            status = "fail" if ks >= ks_fail else "pass"
        yield pd.DataFrame(
            {"key": [key[0]], "n": [n], "ks": [ks], "status": [status]}
        )

    return src.groupBy("key").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
