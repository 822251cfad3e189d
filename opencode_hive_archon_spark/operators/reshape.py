"""Reshape + range-join operators (completing the relational surface).

``pivot_lineitem_status`` / ``unpivot_lineitem_status`` are the standard
wide<->long reshapes (pivot compiles to conditional aggregation — one
shuffle; unpivot is a Generate, no shuffle at all).

``join_range_bucketed`` is the range-join pattern Spark lacks natively
(pyspark guide "as-of / range join"): joining a fact value against interval
tiers naively is a broadcast-nested-loop theta join; bucketizing the value
to the tier grid turns it into an equi-join. Tiers here are a fixed width
(50.0), so bucket = floor(value / width) maps each row to exactly one tier
— at 100 TB this is a map-side broadcast equi-join, no NL join, no skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opencode_hive_archon_spark.session import read_table as _t
from opencode_hive_archon_spark.spec import QuerySpec

RETURNFLAGS = ("A", "N", "R")
TIER_WIDTH = 50.0
N_TIERS = 10  # value ∈ [0, 500)


def pivot_lineitem_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide: one row per linestatus, one quantity-sum column per returnflag."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", list(RETURNFLAGS))
        .agg(F.sum("l_quantity"))  # integral doubles: exact
        .select(
            "l_linestatus",
            *[F.coalesce(F.col(f), F.lit(0.0)).alias(f"qty_{f}") for f in RETURNFLAGS],
        )
        .orderBy("l_linestatus")
    )


_ORACLE_PIVOT = """
SELECT l_linestatus,
       coalesce(sum(l_quantity) FILTER (l_returnflag = 'A'), 0.0) AS qty_A,
       coalesce(sum(l_quantity) FILTER (l_returnflag = 'N'), 0.0) AS qty_N,
       coalesce(sum(l_quantity) FILTER (l_returnflag = 'R'), 0.0) AS qty_R
FROM lineitem GROUP BY l_linestatus
"""


def unpivot_lineitem_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long again: unpivot the pivoted frame back to (status, flag, qty)."""
    wide = pivot_lineitem_status(spark, sf_dir)
    return wide.unpivot(
        ids=["l_linestatus"],
        values=[f"qty_{f}" for f in RETURNFLAGS],
        variableColumnName="flag_col",
        valueColumnName="sum_qty",
    ).select(
        "l_linestatus",
        F.substring("flag_col", 5, 1).alias("l_returnflag"),
        "sum_qty",
    )


_ORACLE_UNPIVOT = """
SELECT l_linestatus, l_returnflag,
       coalesce(sum(l_quantity), 0.0) AS sum_qty
FROM lineitem GROUP BY l_linestatus, l_returnflag
"""


def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join events.value against fixed-width tiers via bucketization:
    bucket = floor(value / width) == tier id; equi-join on the bucket."""
    ev = _t(spark, sf_dir, "events")
    tiers = spark.range(N_TIERS).select(
        F.col("id").alias("tier_id"),
        (F.col("id") * TIER_WIDTH).alias("lo"),
        ((F.col("id") + 1) * TIER_WIDTH).alias("hi"),
    )
    bucketed = ev.withColumn(
        "tier_id", F.floor(F.col("value") / F.lit(TIER_WIDTH)).cast("long")
    )
    return (
        bucketed.join(F.broadcast(tiers), "tier_id")
        .groupBy("tier_id", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .orderBy("tier_id")
    )


# Oracle uses the naive interval predicate — same result, proving the
# bucketed equi-join preserves range semantics.
_ORACLE_RANGE = f"""
WITH tiers AS (
  SELECT i AS tier_id, i * {TIER_WIDTH} AS lo, (i + 1) * {TIER_WIDTH} AS hi
  FROM range({N_TIERS}) t(i)
)
SELECT tier_id, lo, hi, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events JOIN tiers ON value >= lo AND value < hi
GROUP BY tier_id, lo, hi
"""


def events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping_id — the multi-granularity
    report cube/rollup cannot express (an arbitrary set list: (type, day),
    (type), (day), ()). One scan, one expanded aggregate; grouping_id()
    disambiguates aggregated-away NULL keys from genuine NULLs, and Spark
    and DuckDB share the same bit convention (first grouping column = most
    significant bit). Sums ride integer cents (exact)."""
    _t(spark, sf_dir, "events").createOrReplaceTempView("gs_events")
    return spark.sql(
        """
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               CAST(grouping_id() AS BIGINT) AS gid,
               count(*) AS n_events,
               sum(CAST(round(value * 100) AS BIGINT)) AS total_cents
        FROM gs_events
        GROUP BY GROUPING SETS (
            (event_type, CAST(date_trunc('day', ts) AS TIMESTAMP)),
            (event_type),
            (CAST(date_trunc('day', ts) AS TIMESTAMP)),
            ()
        )
        ORDER BY gid, event_type NULLS LAST, day NULLS LAST
        """
    )


_ORACLE_GROUPING_SETS = """
SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       CAST(GROUPING(event_type, CAST(date_trunc('day', ts) AS TIMESTAMP))
            AS BIGINT) AS gid,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM events
GROUP BY GROUPING SETS (
    (event_type, CAST(date_trunc('day', ts) AS TIMESTAMP)),
    (event_type),
    (CAST(date_trunc('day', ts) AS TIMESTAMP)),
    ()
)
ORDER BY gid, event_type NULLS LAST, day NULLS LAST
"""


SPECS = [
    QuerySpec("events_grouping_sets", events_grouping_sets,
              _ORACLE_GROUPING_SETS, "relational",
              "explicit GROUPING SETS multi-granularity report with "
              "grouping_id disambiguation — one scan, one expanded "
              "aggregate; integer-cents sums"),
    QuerySpec("pivot_lineitem_status", pivot_lineitem_status, _ORACLE_PIVOT,
              "relational", "pivot to wide (conditional aggregation)"),
    QuerySpec("unpivot_lineitem_status", unpivot_lineitem_status, _ORACLE_UNPIVOT,
              "relational", "unpivot back to long (Generate, no shuffle)"),
    QuerySpec("join_range_bucketed", join_range_bucketed, _ORACLE_RANGE,
              "relational", "range join via bucketized equi-join"),
]
