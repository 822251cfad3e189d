"""TPC-H-style multi-join analytics over the full star schema.

Completes table coverage (supplier and part join the fact chain) with the
classic Q5/Q14 shapes:

* ``local_supplier_volume`` (Q5 shape): region -> nation -> customer ->
  orders -> lineitem -> supplier, with the "local" condition that customer
  and supplier share a nation. Catalyst/AQE broadcast the dimension chain
  (region/nation/supplier/customer are tiny vs lineitem) — the only big
  shuffle is lineitem ⋈ orders.
* ``promo_revenue_share`` (Q14 shape): lineitem ⋈ part, monthly share of
  revenue from PROMO-type parts — conditional aggregation over a broadcast
  join, exact in decimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opencode_hive_archon_spark.session import read_table as _t
from opencode_hive_archon_spark.spec import QuerySpec

_REVENUE_SQL = "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))"


def _revenue() -> F.Column:
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(8,2)")


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))  # local suppliers
        .join(nation, F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(_revenue()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("r_name", "n_name")
    )


_ORACLE_Q5 = f"""
SELECT r_name, n_name,
       CAST(sum({_REVENUE_SQL}) AS DOUBLE) AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
GROUP BY r_name, n_name
"""


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    month = F.date_trunc("month", F.col("l_shipdate")).alias("ship_month")
    promo_rev = F.sum(
        F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(
            F.lit(0).cast("decimal(18,2)")
        )
    )
    total_rev = F.sum(_revenue())
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(month)
        .agg(
            promo_rev.cast("double").alias("promo_revenue"),
            total_rev.cast("double").alias("total_revenue"),
            (promo_rev.cast("double") / total_rev.cast("double") * F.lit(100.0)).alias(
                "promo_share_pct"
            ),
        )
        .orderBy("ship_month")
    )


_ORACLE_Q14 = f"""
SELECT date_trunc('month', l_shipdate) AS ship_month,
       CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REVENUE_SQL}
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
       CAST(sum({_REVENUE_SQL}) AS DOUBLE) AS total_revenue,
       CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REVENUE_SQL}
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         / CAST(sum({_REVENUE_SQL}) AS DOUBLE) * 100.0 AS promo_share_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1
"""


Q18_QTY_THRESHOLD = 250


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape (large-volume orders): orders whose total lineitem quantity
    exceeds a threshold, joined back to customer, top-100 by total price.

    The HAVING subquery is a partial+final aggregation over lineitem whose
    qualifying set is tiny (~1% of orders) — AQE sees the post-filter size
    and broadcasts it into the orders join, so the only big shuffle is the
    lineitem aggregation itself. Quantities sum in DECIMAL (exact, order
    insensitive); the global top-100 compiles to TakeOrderedAndProject."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty_dec"))
        .filter(F.col("qty_dec") > Q18_QTY_THRESHOLD)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            F.col("qty_dec").cast("double").alias("total_qty"),
        )
        .orderBy(
            F.col("o_totalprice").desc(), F.col("o_orderdate").asc(),
            F.col("o_orderkey").asc(),
        )
        .limit(100)
    )


_ORACLE_Q18 = f"""
WITH big AS (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty_dec
  FROM lineitem GROUP BY 1
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > {Q18_QTY_THRESHOLD}
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(qty_dec AS DOUBLE) AS total_qty
FROM big
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
LIMIT 100
"""


Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = "1998-06-01"


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape (shipping priority): revenue still unshipped at the cutoff
    for one market segment — customer/orders filters push to their scans,
    both dimension legs broadcast against lineitem, and the top-10 over the
    aggregated revenue compiles to TakeOrderedAndProject (no global sort).
    Revenue sums in DECIMAL (exact, order-insensitive)."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == Q3_SEGMENT)
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(Q3_CUTOFF).cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(Q3_CUTOFF).cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


_ORACLE_Q3 = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(sum({_REVENUE_SQL}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
  AND l_shipdate > TIMESTAMP '{Q3_CUTOFF}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


Q21_LATE_DAYS = 60


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape (suppliers who kept orders waiting), adapted to this schema:
    "late" is l_shipdate > o_orderdate + 60 days (no commit/receipt dates in
    the testdata). The interesting part is the correlated EXISTS ("another
    supplier shared the order") and NOT EXISTS ("no other supplier was also
    late") — written declaratively and left to Catalyst to decorrelate into
    left-semi / left-anti joins on l_orderkey; at scale all three lineitem
    legs shuffle on the same key, so the exchanges line up and AQE reuses
    them. Reference: SURVEY.md §2B relational family (multi-join shapes)."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("q21_lineitem")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("q21_orders")
    _t(spark, sf_dir, "supplier").createOrReplaceTempView("q21_supplier")
    return spark.sql(
        f"""
        SELECT s_name, count(*) AS numwait
        FROM q21_supplier s
        JOIN q21_lineitem l1 ON s.s_suppkey = l1.l_suppkey
        JOIN q21_orders o ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
          AND EXISTS (
                SELECT 1 FROM q21_lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (
                SELECT 1
                FROM q21_lineitem l3
                JOIN q21_orders o3 ON o3.o_orderkey = l3.l_orderkey
                WHERE l3.l_orderkey = l1.l_orderkey
                  AND l3.l_suppkey <> l1.l_suppkey
                  AND l3.l_shipdate > o3.o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name ASC
        LIMIT 100
        """
    )


_ORACLE_Q21 = f"""
SELECT s_name, count(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
  AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
        SELECT 1
        FROM lineitem l3
        JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o3.o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 100
"""


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: annual revenue flow between a nation PAIR, both directions
    (supplier nation ships to customer nation). Two aliased copies of the
    tiny nation dim broadcast onto the fact chain; the only big shuffle is
    lineitem ⋈ orders. The pair filter lands on broadcast-joined columns,
    so AQE prunes most of the probe early."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(
            F.sum(_revenue()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


_ORACLE_Q7 = f"""
SELECT supp_nation, cust_nation, ship_year,
       CAST(sum(rev) AS DOUBLE) AS revenue, count(*) AS n_items
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS ship_year,
         {_REVENUE_SQL} AS rev
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
)
GROUP BY supp_nation, cust_nation, ship_year
ORDER BY supp_nation, cust_nation, ship_year
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: top-20 customers by revenue lost to returns in one
    quarter. Date + returnflag predicates push into the scans; customer
    and nation broadcast; the ranking is TakeOrderedAndProject (decimal-
    exact revenue makes the top-20 cut deterministic)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-07-01") & (F.col("o_orderdate") < "1995-10-01")
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(_revenue()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_returned_items"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


_ORACLE_Q10 = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(sum({_REVENUE_SQL}) AS DOUBLE) AS revenue,
       count(*) AS n_returned_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1995-07-01'
  AND o_orderdate <  TIMESTAMP '1995-10-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: average yearly revenue lost to small-quantity orders of
    one brand — the classic correlated scalar subquery
    (l_quantity < 0.2 * avg(l_quantity) per part), decorrelated to a
    per-part aggregate join. Exactness: the comparison is rewritten
    division-free as 5 · qty · count < sum(qty) in decimal, so no float
    average enters the predicate and the oracle matches bit-for-bit; only
    the final single division by 7.0 is floating point.

    Scale note (round-9 re-plan): the decorrelated aggregate only needs the
    partkeys that survive the brand/size filter (~1/1000 of parts), so
    lineitem is SEMI-JOINED against the broadcast filtered keys BEFORE the
    per-part aggregate — at 100× scale this turns a full-table shuffle
    keyed on every partkey into one keyed on the probed thousandth. The
    pruned aggregate is then itself broadcastable (≤ one row per filtered
    part), so the probe side pays no shuffle at all. p_partkey is unique
    (TPC-H PK), so the semi-join equals the original inner join."""
    li = _t(spark, sf_dir, "lineitem")
    part_keys = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#3") & (F.col("p_size") < 20))
        .select("p_partkey")
    )
    li_pruned = li.join(
        F.broadcast(part_keys), li.l_partkey == F.col("p_partkey"), "left_semi"
    )
    qty_dec = F.col("l_quantity").cast("decimal(18,2)")
    per_part = li_pruned.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        F.sum(qty_dec).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_li"),
    )
    small = li_pruned.join(
        F.broadcast(per_part), F.col("l_partkey") == F.col("ap_partkey")
    ).filter(qty_dec * F.col("n_li") * F.lit(5) < F.col("sum_qty"))
    return small.agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            / F.lit(7.0)
        ).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_small_lineitems"),
    )


_ORACLE_Q17 = """
WITH per_part AS (
  SELECT l_partkey AS ap_partkey,
         sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
         count(*) AS n_li
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
         AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_small_lineitems
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN per_part ON l_partkey = ap_partkey
WHERE p_brand = 'Brand#3' AND p_size < 20
  AND CAST(l_quantity AS DECIMAL(18,2)) * n_li * 5 < sum_qty
"""


SPECS = [
    QuerySpec("q7_volume_shipping", q7_volume_shipping, _ORACLE_Q7,
              "relational", "Q7-shape bidirectional nation-pair shipping "
              "revenue by year (double-aliased broadcast nation dim)"),
    QuerySpec("q10_returned_items", q10_returned_items, _ORACLE_Q10,
              "relational", "Q10-shape top-20 customers by returned-item "
              "revenue in a quarter"),
    QuerySpec("q17_small_quantity_revenue", q17_small_quantity_revenue,
              _ORACLE_Q17,
              "relational", "Q17-shape correlated per-part avg-quantity "
              "subquery, decorrelated + division-free decimal predicate"),
    QuerySpec("local_supplier_volume", local_supplier_volume, _ORACLE_Q5,
              "relational", "Q5-shape six-table join, local-supplier revenue by nation"),
    QuerySpec("promo_revenue_share", promo_revenue_share, _ORACLE_Q14,
              "relational", "Q14-shape promo revenue share per month"),
    QuerySpec("q18_large_orders", q18_large_orders, _ORACLE_Q18,
              "relational", "Q18-shape large-volume orders: HAVING subquery + "
              "customer join + global top-100"),
    QuerySpec("q21_waiting_suppliers", q21_waiting_suppliers, _ORACLE_Q21,
              "relational", "Q21-shape correlated EXISTS/NOT EXISTS "
              "(decorrelated to semi/anti joins)"),
    QuerySpec("q3_shipping_priority", q3_shipping_priority, _ORACLE_Q3,
              "relational", "Q3-shape segment revenue top-10 (pushdown + "
              "broadcast dims + TakeOrdered)"),
]
