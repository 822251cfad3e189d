"""Plan-adherence set arithmetic (reference parity: R23).

Re-expression of scripts/analyze-plan-diff.js:130-165: given a PLANNED and
an ACTUAL file list, compute overlap (∩), scope creep (actual ∖ planned),
missing (planned ∖ actual) and the adherence percentage rounded to 0.1.

ONE declarative plan: full-outer join on the file name with presence flags,
then a single conditional aggregate — no driver-side count actions (the
first cut ran three separate count jobs; at manifest scale that is three
full shuffles instead of one). File lists are sets (distinct by
construction), which is what makes the join formulation equal to
intersect/exceptAll.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opencode_hive_archon_spark.spec import QuerySpec

PLANNED_FILES = [
    "src/engine/router.py",
    "src/engine/branching.py",
    "src/engine/rerank.py",
    "src/contracts/packet.py",
    "tests/test_router.py",
    "tests/test_branching.py",
]
ACTUAL_FILES = [
    "src/engine/router.py",
    "src/engine/branching.py",
    "src/engine/rerank.py",
    "src/engine/envelope.py",      # scope creep
    "tests/test_router.py",
    "tests/test_envelope.py",      # scope creep
]


def plan_diff_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    planned = spark.createDataFrame(
        [(f,) for f in PLANNED_FILES], "file string"
    ).withColumn("p", F.lit(1))
    actual = spark.createDataFrame(
        [(f,) for f in ACTUAL_FILES], "file string"
    ).withColumn("a", F.lit(1))
    joined = planned.join(actual, "file", "full_outer")
    both = F.col("p").isNotNull() & F.col("a").isNotNull()
    agg = joined.agg(
        F.count("p").alias("n_planned"),
        F.count("a").alias("n_actual"),
        F.sum(F.when(both, 1).otherwise(0)).alias("overlap"),
        F.sum(F.when(F.col("p").isNull(), 1).otherwise(0)).alias("scope_creep"),
        F.sum(F.when(F.col("a").isNull(), 1).otherwise(0)).alias("missing"),
    )
    return agg.select(
        "n_planned", "n_actual", "overlap", "scope_creep", "missing",
        F.round(F.lit(100.0) * F.col("overlap") / F.col("n_planned"), 1).alias(
            "adherence_pct"
        ),
    )


def _oracle() -> str:
    planned = ", ".join(f"('{f}')" for f in PLANNED_FILES)
    actual = ", ".join(f"('{f}')" for f in ACTUAL_FILES)
    return f"""
WITH planned(file) AS (VALUES {planned}),
     actual(file) AS (VALUES {actual})
SELECT (SELECT count(*) FROM planned) AS n_planned,
       (SELECT count(*) FROM actual) AS n_actual,
       (SELECT count(*) FROM (SELECT file FROM planned INTERSECT SELECT file FROM actual)) AS overlap,
       (SELECT count(*) FROM (SELECT file FROM actual EXCEPT ALL SELECT file FROM planned)) AS scope_creep,
       (SELECT count(*) FROM (SELECT file FROM planned EXCEPT ALL SELECT file FROM actual)) AS missing,
       round(100.0 * (SELECT count(*) FROM (SELECT file FROM planned INTERSECT SELECT file FROM actual))
             / (SELECT count(*) FROM planned), 1) AS adherence_pct
"""


SPECS = [
    QuerySpec("plan_diff_metrics", plan_diff_metrics, _oracle(), "retrieval",
              "planned-vs-actual set arithmetic + adherence % (R23)"),
]
