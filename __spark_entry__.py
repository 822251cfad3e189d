"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). The actual inventory lives in
``opencode_hive_archon_spark.registry``; this module is a thin adapter.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")

from opencode_hive_archon_spark import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: lexical-overlap rescoring + top-k over the
    documents store (the reference's recall pipeline, SURVEY.md §2B F1)."""
    from opencode_hive_archon_spark.operators.recall import recall_score_topk

    return recall_score_topk(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2B."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle for each hash-checkable query; rows-only
    queries (approximate/streaming-stateful) are intentionally absent."""
    return registry.oracle_sql()
