"""Skew-handling + SQL-surface patterns.

``agg_skew_salted`` demonstrates the two-phase salted aggregation that a
hot-key distribution needs at scale: l_returnflag has 3 distinct values, so
a naive groupBy sends a third of a 100 TB table to each of 3 reducers. The
salt splits each hot key across 16 sub-partitions for the heavy partial
phase; the final phase combines 3x16 tiny partial states. AQE's skew
handling covers joins automatically; salting is the pattern for skewed
AGGREGATION pipelines where the key itself is the bottleneck.

``sql_pricing_summary`` runs the same logical plan through the Spark SQL
string surface over registered views (BASELINE.json ``spark_approach``) —
Catalyst produces the identical physical plan either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opencode_hive_archon_spark.session import read_table as _t
from opencode_hive_archon_spark.spec import QuerySpec

N_SALTS = 16


def agg_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase (salted) aggregation over the 3-value l_returnflag key."""
    li = _t(spark, sf_dir, "lineitem")
    salted = li.withColumn("salt", F.pmod(F.hash("l_orderkey", "l_linenumber"), F.lit(N_SALTS)))
    partial = salted.groupBy("l_returnflag", "salt").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("rev_dec"),
        F.max("l_quantity").alias("max_qty"),
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(
            F.sum("n").alias("n_rows"),
            F.sum("rev_dec").cast("double").alias("total_price"),
            F.max("max_qty").alias("max_qty"),
        )
        .orderBy("l_returnflag")
    )


_ORACLE_SKEW = """
SELECT l_returnflag, count(*) AS n_rows,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
       max(l_quantity) AS max_qty
FROM lineitem GROUP BY l_returnflag
"""


def sql_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape expressed through the SQL string surface."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("sql_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue,
               count(*) AS count_order
        FROM sql_lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    )


_ORACLE_SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (finer-grained than rollup/cube): totals by
    (priority, status), by priority alone, and by status alone — no grand
    total (a set rollup can't express)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("gs_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM gs_orders
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderpriority), (o_orderstatus))
        """
    )


_ORACLE_GROUPING_SETS = """
SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                        (o_orderpriority), (o_orderstatus))
"""


def scalar_subquery_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: each customer's share of their segment's
    max single-order total. Catalyst decorrelates this into an aggregate +
    join — the declarative form survives at scale."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("sq_orders")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("sq_customer")
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment,
               (SELECT max(o_totalprice) FROM sq_orders WHERE o_custkey = c_custkey)
                   AS best_order,
               (SELECT count(*) FROM sq_orders WHERE o_custkey = c_custkey)
                   AS n_orders
        FROM sq_customer
        """
    )


_ORACLE_SCALAR_SUBQUERY = """
SELECT c_custkey, c_mktsegment,
       (SELECT max(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS best_order,
       (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
FROM customer
"""


def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key equi-join with explicit salting — the JOIN-side companion of
    ``agg_skew_salted``. l_returnflag has 3 distinct values, so a plain
    shuffle join on it lands a third of the fact table on each of 3
    reducers. Salting: the fact side derives salt = hash(row) mod 16; the
    dim side replicates each key across all 16 salts; the join keys on
    (flag, salt), spreading every hot key over 16 balanced partitions.

    When the dim fits in memory, `broadcast()` is the first-choice fix and
    salting is unnecessary — the pattern here is for the case where the
    build side is itself too large to broadcast (the `shuffle_hash` hint
    pins that regime so the demo actually exercises the salted exchange;
    tests/test_skew_join.py asserts no BroadcastHashJoin and the composite
    (flag, salt) partitioning). AQE's skew-join split handles sort-merge
    skew automatically, but only at partition granularity of the OUTPUT —
    pre-salting balances the exchange itself, which is what matters when
    one key is a third of a 100 TB table."""
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "salt", F.pmod(F.hash("l_orderkey", "l_linenumber"), F.lit(N_SALTS))
    )
    dim = spark.createDataFrame(
        [("A", "0.90"), ("N", "1.00"), ("R", "1.10")], "flag string, factor string"
    ).select("flag", F.col("factor").cast("decimal(8,2)").alias("factor"))
    salted_dim = dim.select(
        "flag", "factor",
        F.explode(F.array(*[F.lit(i) for i in range(N_SALTS)])).alias("salt"),
    )
    joined = li.join(
        salted_dim.hint("shuffle_hash"),
        (li["l_returnflag"] == salted_dim["flag"]) & (li["salt"] == salted_dim["salt"]),
    )
    return (
        joined.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)") * F.col("factor")
            ).cast("double").alias("weighted_revenue"),
        )
        .orderBy("l_returnflag")
    )


_ORACLE_JOIN_SKEW = """
WITH dim(flag, factor) AS (VALUES ('A', CAST('0.90' AS DECIMAL(8,2))),
                                  ('N', CAST('1.00' AS DECIMAL(8,2))),
                                  ('R', CAST('1.10' AS DECIMAL(8,2))))
SELECT l_returnflag, count(*) AS n_rows,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * factor) AS DOUBLE)
         AS weighted_revenue
FROM lineitem JOIN dim ON l_returnflag = flag
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


SPECS = [
    QuerySpec("join_skew_salted", join_skew_salted, _ORACLE_JOIN_SKEW,
              "relational",
              "hot-key join balanced by explicit 16-way salting: dim rows "
              "replicated per salt, fact rows salted by row-hash, join "
              "keyed on (flag, salt) — the exchange itself is balanced, "
              "not just the AQE output split"),
    QuerySpec("grouping_sets_orders", grouping_sets_orders, _ORACLE_GROUPING_SETS,
              "relational", "explicit GROUPING SETS aggregation"),
    QuerySpec("scalar_subquery_orders", scalar_subquery_orders, _ORACLE_SCALAR_SUBQUERY,
              "relational", "correlated scalar subqueries (decorrelated by Catalyst)"),
    QuerySpec("agg_skew_salted", agg_skew_salted, _ORACLE_SKEW, "relational",
              "two-phase salted aggregation over a hot 3-value key"),
    QuerySpec("sql_pricing_summary", sql_pricing_summary, _ORACLE_SQL_PRICING,
              "relational", "Q1 shape via the Spark SQL string surface"),
]
