"""Table IO behind one seam (SURVEY.md §7 hard part e).

Locally everything is parquet; on a real deployment the same calls hit
Iceberg (`format('iceberg')` + catalog identifiers) — the engine never
reads storage directly, only through these functions, so the swap is a
config change, not a code change.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession

TABLE_FORMAT = os.environ.get("SNOWY_TABLE_FORMAT", "parquet")


def read_table(spark: SparkSession, location: str, fmt: str | None = None) -> DataFrame:
    """Read a table by path (parquet/local) or identifier (iceberg)."""
    fmt = fmt or TABLE_FORMAT
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(location)
    return spark.read.parquet(location)


def write_table(
    df: DataFrame,
    location: str,
    fmt: str | None = None,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    fmt = fmt or TABLE_FORMAT
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "iceberg":
        writer.format("iceberg").save(location)
    else:
        writer.parquet(location)


def load_spec(path: str) -> dict[str, Any]:
    """Constraint spec from a JSON (or YAML, if available) file."""
    with open(path) as f:
        text = f.read()
    if path.endswith((".yaml", ".yml")):
        try:
            import yaml  # type: ignore

            return yaml.safe_load(text)
        except ImportError as e:
            raise ValueError("YAML specs need the optional pyyaml dependency") from e
    return json.loads(text)
