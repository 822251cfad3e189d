"""Declarative data-quality constraint suite (round 9).

``quality_constraint_suite`` runs the pipeline-gate checks a warehouse
executes before publishing a load — the Deequ/Great-Expectations shape as
pure DataFrame algebra, one report row per constraint:

* completeness   — NULL count of a required column
* uniqueness     — duplicate count of a declared key
* referential    — orphan count of a foreign key (left-anti join)
* range          — out-of-bounds count of a value column
* freshness      — rows outside the declared event-time range
* non_degenerate — empty-payload count (blank documents)

Every check is an exact COUNT, so the whole report is oracle-exact; the
``passed`` verdict is ``n_violations = 0``. Each check is a small
aggregate over one scan of its table; the union is report-sized. At
100 TB the checks share nothing and parallelize per table — and because
each is declarative, Catalyst prunes every scan to the checked columns
(plan-pinned). Reference parity: the reference engine validates request
payloads imperatively (context packet bounds); this lifts the same idea
to table-level constraints over the warehouse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opencode_hive_archon_spark.session import read_table as _t
from opencode_hive_archon_spark.spec import QuerySpec

__all__ = ["quality_constraint_suite", "SPECS"]


def _report_row(df: DataFrame, table: str, check: str, kind: str) -> DataFrame:
    """Wrap a 1-row (n_violations bigint) frame into the report schema."""
    return df.select(
        F.lit(table).alias("table_name"),
        F.lit(check).alias("check_name"),
        F.lit(kind).alias("check_kind"),
        F.col("n_violations").cast("long").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )


def quality_constraint_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The constraint report: six checks across four tables, one exact
    count each."""
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    customer = _t(spark, sf_dir, "customer")
    events = _t(spark, sf_dir, "events")
    documents = _t(spark, sf_dir, "documents")

    completeness = orders.agg(
        F.count(F.when(F.col("o_orderdate").isNull(), 1)).alias("n_violations")
    )
    uniqueness = customer.agg(
        (F.count(F.lit(1)) - F.countDistinct("c_custkey")).alias("n_violations")
    )
    referential = (
        lineitem.select("l_orderkey")
        .join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )
    value_range = lineitem.agg(
        F.count(
            F.when(
                (F.col("l_quantity") <= 0) | (F.col("l_discount") < 0)
                | (F.col("l_discount") > 1),
                1,
            )
        ).alias("n_violations")
    )
    freshness = events.agg(
        F.count(
            F.when(
                F.col("ts").isNull()
                | (F.col("ts") < F.lit("2000-01-01").cast("timestamp")),
                1,
            )
        ).alias("n_violations")
    )
    non_degenerate = documents.agg(
        F.count(
            F.when(
                F.col("text").isNull() | (F.length(F.trim("text")) == 0), 1
            )
        ).alias("n_violations")
    )

    report = (
        _report_row(completeness, "orders", "o_orderdate_not_null", "completeness")
        .unionAll(_report_row(uniqueness, "customer", "c_custkey_unique", "uniqueness"))
        .unionAll(
            _report_row(referential, "lineitem", "l_orderkey_fk_orders", "referential")
        )
        .unionAll(_report_row(value_range, "lineitem", "quantity_discount_range", "range"))
        .unionAll(_report_row(freshness, "events", "ts_in_valid_range", "freshness"))
        .unionAll(
            _report_row(non_degenerate, "documents", "text_non_empty", "non_degenerate")
        )
    )
    return report.orderBy("table_name", "check_name")


_ORACLE_CONSTRAINTS = """
WITH checks AS (
  SELECT 'orders' AS table_name, 'o_orderdate_not_null' AS check_name,
         'completeness' AS check_kind,
         (SELECT CAST(count(*) FILTER (o_orderdate IS NULL) AS BIGINT)
          FROM orders) AS n_violations
  UNION ALL
  SELECT 'customer', 'c_custkey_unique', 'uniqueness',
         (SELECT CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT)
          FROM customer)
  UNION ALL
  SELECT 'lineitem', 'l_orderkey_fk_orders', 'referential',
         (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_orderkey = l.l_orderkey))
  UNION ALL
  SELECT 'lineitem', 'quantity_discount_range', 'range',
         (SELECT CAST(count(*) FILTER (l_quantity <= 0 OR l_discount < 0
                                       OR l_discount > 1) AS BIGINT)
          FROM lineitem)
  UNION ALL
  SELECT 'events', 'ts_in_valid_range', 'freshness',
         (SELECT CAST(count(*) FILTER (ts IS NULL
                        OR ts < TIMESTAMP '2000-01-01') AS BIGINT)
          FROM events)
  UNION ALL
  SELECT 'documents', 'text_non_empty', 'non_degenerate',
         (SELECT CAST(count(*) FILTER (text IS NULL
                        OR length(trim(text)) = 0) AS BIGINT)
          FROM documents)
)
SELECT table_name, check_name, check_kind, n_violations,
       n_violations = 0 AS passed
FROM checks
ORDER BY table_name, check_name
"""


SPECS = [
    QuerySpec(
        "quality_constraint_suite", quality_constraint_suite,
        _ORACLE_CONSTRAINTS, "quality",
        "Deequ-style constraint suite: completeness / uniqueness / "
        "referential / range / freshness / non-degenerate checks as "
        "exact counts, one pruned scan per table, report-sized union"),
]
