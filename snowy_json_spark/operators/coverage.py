"""Constraint-coverage reporting.

The reference's `Coverage` tool reports which schema locations were
exercised by a validation run (`Coverage.java:118-167`).  Columnar
equivalent: group the violations by ``constraint_id`` and left-join the
compile-time constraint catalog — constraints with zero hits either
always pass on this data (healthy) or are never applicable (spec rot);
instance-side coverage is the set of instance paths that asserted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.compiler import Compiled


def constraint_catalog(plan: Compiled) -> list[dict]:
    """Compile-time list of every asserting leaf constraint."""
    return [
        {"constraint_id": leaf.constraint_id, "instance_path": leaf.instance_path}
        for leaf in plan.leaves
    ]


def coverage_report(
    spark: SparkSession, plan: Compiled, violations_df: DataFrame
) -> DataFrame:
    """(constraint_id, instance_path, n_violations) for every compiled
    constraint, including never-fired ones (n_violations = 0)."""
    catalog = constraint_catalog(plan)
    cat_df = spark.createDataFrame(
        [(c["constraint_id"], c["instance_path"]) for c in catalog],
        "constraint_id string, instance_path string",
    ).distinct()
    counts = violations_df.groupBy("constraint_id").agg(
        F.count(F.lit(1)).alias("n_violations")
    )
    return (
        cat_df.join(F.broadcast(counts), "constraint_id", "left")
        .select(
            "constraint_id",
            "instance_path",
            F.coalesce(F.col("n_violations"), F.lit(0)).alias("n_violations"),
        )
        .orderBy("constraint_id")
    )


def unexercised_constraints(
    spark: SparkSession, plan: Compiled, violations_df: DataFrame
) -> list[str]:
    rep = coverage_report(spark, plan, violations_df)
    return [
        r["constraint_id"] for r in rep.filter(F.col("n_violations") == 0).collect()
    ]
