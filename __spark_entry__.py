"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship validation; ``queries()`` maps one
entry per implemented operator from SURVEY.md §2 to a callable
``(spark, sf_dir) -> DataFrame``; ``oracle_sql()`` gives the DuckDB
oracle for each.  Column names are aliased identically on both sides
(the driver hash-compares values after sorting columns by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from snowy_json_spark.plans.compiler import compile_spec
from snowy_json_spark.plans.report import violations, with_verdict

# Flagship spec: validate the `documents` table (closest analog of the
# north-star `pages` table) — presence, lang-code shape, length bounds.
FLAGSHIP_SPEC = {
    "required": ["doc_id", "text", "lang"],
    "properties": {
        "lang": {"type": "string", "pattern": "^[a-z]{2}$"},
        "n_chars": {"type": "integer", "minimum": 0, "maximum": 500},
        "source": {"pattern": "^src(0|[1-9][0-9]*)$"},
        "text": {"minLength": 1, "maxLength": 10000},
    },
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: violations of the documents spec at sf0.001."""
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = compile_spec(FLAGSHIP_SPEC, df.schema)
    return violations(df, plan, ["doc_id"])


# ---------------------------------------------------------------------------
# queries / oracle pairs
# ---------------------------------------------------------------------------


def _q_row_validation_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-scope spec over documents → per-row verdict counts by lang."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = compile_spec(FLAGSHIP_SPEC, df.schema)
    return (
        with_verdict(df, plan)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("passed").cast("long")).alias("n_passed"),
        )
        .orderBy("lang")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "row_validation_documents": _q_row_validation_documents,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "row_validation_documents": """
            SELECT lang,
                   COUNT(*) AS n_rows,
                   SUM(CASE WHEN doc_id IS NOT NULL AND text IS NOT NULL
                             AND lang IS NOT NULL
                             AND regexp_matches(lang, '^[a-z]{2}$')
                             AND (n_chars IS NULL OR (n_chars >= 0 AND n_chars <= 500))
                             AND (source IS NULL OR
                                  regexp_matches(source, '^src(0|[1-9][0-9]*)$'))
                             AND (text IS NULL OR
                                  (length(text) >= 1 AND length(text) <= 10000))
                            THEN 1 ELSE 0 END) AS n_passed
            FROM documents
            GROUP BY lang
            ORDER BY lang
        """,
    }
