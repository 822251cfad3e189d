"""Plan-adherence pipeline (reference parity: R23).

Two stages, mirroring scripts/analyze-plan-diff.js end to end:

1. EXTRACTION (analyze-plan-diff.js:26-90, ``extractPlannedFiles``):
   markdown plan documents → planned-file lists. The reference walks three
   shapes with line-regexes; here each shape is a ``regexp_extract_all``
   over the ``### ``-delimited sections of a plan-text relation —
   ``plan_diff_extract``. At manifest scale (thousands of plan docs) the
   extraction is a narrow projected scan + explode; no Python, no
   driver-side parsing.
     - "### New Files to Create" section: lines `- \\`path\\``
     - "### <VERB> <target>" task headers (CREATE/UPDATE/ADD/REMOVE/
       REFACTOR/MIRROR): first token after the verb
     - "### Relevant Codebase Files" section: lines `- \\`path\\``
     - "- **PATTERN**: ... (file:line)" references anywhere in the plan

2. SET ARITHMETIC (analyze-plan-diff.js:130-165): planned vs actual →
   overlap (∩), scope creep (actual ∖ planned), missing (planned ∖ actual),
   adherence %, as ONE full-outer join + conditional aggregate — no
   driver-side count actions. ``plan_diff_metrics`` runs it on the fixture
   lists; ``plan_diff_extracted_metrics`` runs it on stage-1 output, the
   full job a reference user replays.
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


def _adherence(planned: DataFrame, actual: DataFrame) -> DataFrame:
    """Full-outer join on file + ONE conditional aggregate (R23 arithmetic).
    Inputs must be (file) relations that are sets (distinct)."""
    joined = (
        planned.withColumn("p", F.lit(1))
        .join(actual.withColumn("a", F.lit(1)), "file", "full_outer")
    )
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


def plan_diff_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    planned = spark.createDataFrame([(f,) for f in PLANNED_FILES], "file string")
    actual = spark.createDataFrame([(f,) for f in ACTUAL_FILES], "file string")
    return _adherence(planned, actual)


# --- extraction front-end (analyze-plan-diff.js:26-90) ---------------------

# Markdown plan fixtures (the shape the reference's /system-review command
# feeds the analyzer). No apostrophes: the same strings are embedded in the
# DuckDB oracle literal.
PLAN_DOCS = [
    (
        0,
        """# Feature: retrieval envelope

### Relevant Codebase Files

- `src/engine/router.py` - routing policy
- `src/contracts/packet.py` - context packet contract

### New Files to Create

- `src/engine/rerank.py` - reranker stage
- `tests/test_rerank.py` - coverage
- not a file line, no backticks

## STEP-BY-STEP TASKS

### CREATE src/engine/rerank.py with lexical overlap scoring

- **PATTERN**: follow the service shape (src/engine/router.py:12)
- detail line

### UPDATE src/engine/branching.py to add RERANK_BYPASSED

- **PATTERN**: branch cascade (src/engine/branching.py:40)

### MIRROR tests/test_rerank.py from tests/test_router.py
""",
    ),
    (
        1,
        """# Hotfix plan

## STEP-BY-STEP TASKS

### REMOVE src/engine/legacy_shim.py entirely

- no pattern reference here

### REFACTOR src/engine/envelope.py split emitters
""",
    ),
]

_TASK_VERBS = "CREATE|UPDATE|ADD|REMOVE|REFACTOR|MIRROR"
_RX_BULLET_FILE = r"(?m)^\s*- `([^`]+)`"
_RX_TASK_TARGET = rf"^(?:{_TASK_VERBS}) (\S+)"
_RX_PATTERN_REF = r"(?m)^- \*\*PATTERN\*\*:?[^\n]*\(([^)]+)\)"


def _plan_sections(spark: SparkSession) -> DataFrame:
    """(plan_id, part): plan docs split on the ``### `` header marker — each
    part starts with its section title (or task verb) and runs to the next
    header, the same scoping the reference regexes apply."""
    plans = spark.createDataFrame(PLAN_DOCS, "plan_id int, plan_text string")
    return plans.select(
        "plan_id", F.explode(F.split("plan_text", r"### ")).alias("part")
    )


def plan_diff_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markdown plan docs → (plan_id, src, file): the extraction front-end of
    the R23 pipeline (extractPlannedFiles). One narrow plan: split to
    sections, per-shape ``regexp_extract_all``, union, distinct."""
    parts = _plan_sections(spark)

    def _bullet_files(section_title: str, src: str) -> DataFrame:
        return (
            parts.filter(F.col("part").startswith(section_title))
            .select(
                "plan_id",
                F.lit(src).alias("src"),
                F.explode(
                    F.regexp_extract_all(F.col("part"), F.lit(_RX_BULLET_FILE), F.lit(1))
                ).alias("file"),
            )
        )

    new_files = _bullet_files("New Files to Create", "new_files")
    relevant = _bullet_files("Relevant Codebase Files", "relevant")
    targets = (
        parts.filter(F.regexp_extract("part", _RX_TASK_TARGET, 1) != "")
        .select(
            "plan_id",
            F.lit("task_target").alias("src"),
            F.regexp_extract("part", _RX_TASK_TARGET, 1).alias("file"),
        )
    )
    patterns = parts.select(
        "plan_id",
        F.lit("pattern_ref").alias("src"),
        F.explode(
            F.regexp_extract_all(F.col("part"), F.lit(_RX_PATTERN_REF), F.lit(1))
        ).alias("file"),
    )
    return (
        new_files.unionByName(targets)
        .unionByName(relevant)
        .unionByName(patterns)
        .distinct()
        .orderBy("plan_id", "src", "file")
    )


def plan_diff_extracted_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full R23 job: extraction front-end feeding the set arithmetic.
    Planned = plan 0 extracted file set (new_files ∪ task_target ∪ relevant,
    pattern refs excluded and stripped of :line suffixes by construction —
    the reference keeps patterns out of the planned-file set too);
    actual = the fixture change list."""
    extracted = (
        plan_diff_extract(spark, sf_dir)
        .filter((F.col("plan_id") == 0) & (F.col("src") != "pattern_ref"))
        .select("file")
        .distinct()
    )
    actual = spark.createDataFrame([(f,) for f in ACTUAL_FILES], "file string")
    return _adherence(extracted, actual)


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


# Oracle mirror of the extraction: same section split, same regexes (RE2 and
# Java regex agree on every construct used: (?m), \s, \S, classes, groups).
def _plans_values() -> str:
    return ", ".join(
        "({}, '{}')".format(pid, text) for pid, text in PLAN_DOCS
    )


def _oracle_extract_ctes() -> str:
    return f"""plans(plan_id, plan_text) AS (VALUES {_plans_values()}),
parts AS (
  SELECT plan_id, unnest(string_split(plan_text, '### ')) AS part FROM plans
),
extracted AS (
  SELECT DISTINCT plan_id, src, file FROM (
    SELECT plan_id, 'new_files' AS src,
           unnest(regexp_extract_all(part, '{_RX_BULLET_FILE}', 1)) AS file
    FROM parts WHERE starts_with(part, 'New Files to Create')
    UNION ALL
    SELECT plan_id, 'relevant' AS src,
           unnest(regexp_extract_all(part, '{_RX_BULLET_FILE}', 1)) AS file
    FROM parts WHERE starts_with(part, 'Relevant Codebase Files')
    UNION ALL
    SELECT plan_id, 'task_target' AS src,
           regexp_extract(part, '{_RX_TASK_TARGET}', 1) AS file
    FROM parts WHERE regexp_extract(part, '{_RX_TASK_TARGET}', 1) <> ''
    UNION ALL
    SELECT plan_id, 'pattern_ref' AS src,
           unnest(regexp_extract_all(part, '{_RX_PATTERN_REF}', 1)) AS file
    FROM parts
  )
)"""


def _oracle_extract() -> str:
    return f"""
WITH {_oracle_extract_ctes()}
SELECT plan_id, src, file FROM extracted ORDER BY plan_id, src, file
"""


def _oracle_extracted_metrics() -> str:
    actual = ", ".join(f"('{f}')" for f in ACTUAL_FILES)
    return f"""
WITH {_oracle_extract_ctes()},
planned AS (
  SELECT DISTINCT file FROM extracted
  WHERE plan_id = 0 AND src <> 'pattern_ref'
),
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
    QuerySpec("plan_diff_extract", plan_diff_extract, _oracle_extract(), "retrieval",
              "markdown plan → planned-file extraction (R23 front-end, "
              "analyze-plan-diff.js:26-90)"),
    QuerySpec("plan_diff_extracted_metrics", plan_diff_extracted_metrics,
              _oracle_extracted_metrics(), "retrieval",
              "full R23 pipeline: extraction front-end feeding the adherence "
              "set arithmetic"),
]
