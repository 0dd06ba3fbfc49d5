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


def schema_instance_paths(schema) -> list[str]:
    """Every instance path the TABLE SCHEMA can produce, in the
    compiler's path convention: '' for the root row, '/col' per field,
    '/col/*' for array elements / map values, recursing through nested
    structs.  Pure metadata — no data is read."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    out: list[str] = [""]

    def walk(dt, path: str) -> None:
        if isinstance(dt, StructType):
            for f in dt.fields:
                child = f"{path}/{f.name}"
                out.append(child)
                walk(f.dataType, child)
        elif isinstance(dt, ArrayType):
            child = f"{path}/*"
            out.append(child)
            walk(dt.elementType, child)
        elif isinstance(dt, MapType):
            child = f"{path}/*"
            out.append(child)
            walk(dt.valueType, child)

    walk(schema, "")
    return out


def unseen_instance_paths(plan: Compiled, schema) -> list[str]:
    """Instance-side coverage (`Coverage.java:145-151` analog — the
    reference traverses the instance and reports locations absent from
    the keyword-application map): data locations the table schema
    exposes that NO compiled constraint ever touches.

    A non-empty result is the 'unvalidated columns' smell — spec rot or
    a contract that silently ignores part of the table.  Exact-path
    semantics like the reference (a constraint on '/a/b' does not mark
    '/a' seen), with one columnar-engine convention: element-applicator
    keywords (items/contains/patternProperties/…) are ATTRIBUTED to
    their container path by the compiler, so they mark the container's
    '/*' child seen too.  Compile-time metadata only, no scan."""
    element_keywords = {
        "items", "additionalItems", "contains", "maxContains",
        "minContains", "uniqueItems", "unevaluatedItems",
        "patternProperties", "additionalProperties", "propertyNames",
        "unevaluatedProperties",
    }
    seen = set()
    for leaf in plan.leaves:
        seen.add(leaf.instance_path)
        if leaf.constraint_id.rsplit("/", 1)[-1] in element_keywords:
            seen.add(leaf.instance_path + "/*")
    return sorted(p for p in schema_instance_paths(schema) if p not in seen)
