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
