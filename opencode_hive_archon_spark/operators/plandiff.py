"""Plan-adherence set arithmetic (reference parity: R23).

Re-expression of scripts/analyze-plan-diff.js:130-165: given a PLANNED and
an ACTUAL file list, compute overlap (∩), scope creep (actual ∖ planned),
missing (planned ∖ actual) and the adherence percentage rounded to 0.1.
Set algebra via intersect/exceptAll — the same operators any two-snapshot
diff job uses at scale (e.g. manifest reconciliation).
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
    planned = spark.createDataFrame([(f,) for f in PLANNED_FILES], "file string")
    actual = spark.createDataFrame([(f,) for f in ACTUAL_FILES], "file string")
    overlap = planned.intersect(actual).count()
    creep = actual.exceptAll(planned).count()
    missing = planned.exceptAll(actual).count()
    n_planned = len(PLANNED_FILES)
    adherence = round(100.0 * overlap / n_planned, 1)
    return spark.createDataFrame(
        [(n_planned, len(ACTUAL_FILES), overlap, creep, missing, adherence)],
        "n_planned long, n_actual long, overlap long, scope_creep long, "
        "missing long, adherence_pct double",
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
