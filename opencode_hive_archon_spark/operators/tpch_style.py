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


# --- round-9 batch: the remaining TPC-H shapes expressible without a
# partsupp table (Q2/Q11/Q16/Q20 need it; everything else is here or above).
# Adaptations to this schema are noted per query.

Q6_YEAR = "1996"


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape (forecast revenue change): a pure scan-filter-aggregate —
    the canonical predicate-pushdown probe. All three filters reach the
    parquet scan (shipdate range, discount band, quantity cap) and the sum
    is a partial+final aggregate over the surviving rows; at 100 TB this is
    a single pruned pass with no shuffle beyond one row per partition.
    Discount compares in DECIMAL(8,2) on both sides — double literals parse
    differently across engines, 2-dp decimals don't."""
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_discount").cast("decimal(8,2)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit(f"{Q6_YEAR}-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(f"{int(Q6_YEAR)+1}-01-01").cast("timestamp"))
            & (disc >= F.lit("0.03").cast("decimal(8,2)"))
            & (disc <= F.lit("0.05").cast("decimal(8,2)"))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)") * disc)
            .cast("double")
            .alias("forecast_revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


_ORACLE_Q6 = f"""
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) AS forecast_revenue,
       count(*) AS n_lineitems
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_YEAR}-01-01'
  AND l_shipdate <  TIMESTAMP '{int(Q6_YEAR)+1}-01-01'
  AND CAST(l_discount AS DECIMAL(8,2)) BETWEEN CAST('0.03' AS DECIMAL(8,2))
                                           AND CAST('0.05' AS DECIMAL(8,2))
  AND l_quantity < 24
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape (order-priority checking): count orders per priority that
    had at least one LATE lineitem (l_shipdate > o_orderdate — the schema
    has no commit/receipt dates). The EXISTS is a left-semi join with a
    non-equi residual; the orderdate quarter filter pushes to the orders
    scan, and at scale both legs shuffle once on orderkey."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


_ORACLE_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


Q8_TARGET_NATION = "NATION_3"
Q8_REGION = "ASIA"
Q8_PTYPE = "ECONOMY"


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape (national market share): of all ECONOMY-part revenue sold
    to customers in one region, what fraction was supplied from the target
    nation, per order year. Two nation legs (customer side filters the
    region, supplier side tags the origin) — both broadcast; the share is
    a conditional-over-total aggregate in DECIMAL, divided once in double."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == Q8_PTYPE)
    n_cust = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    n_supp = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == Q8_REGION)
    vol = _revenue()
    target_vol = F.sum(
        F.when(F.col("supp_nation") == Q8_TARGET_NATION, vol).otherwise(
            F.lit(0).cast("decimal(18,2)")
        )
    )
    total_vol = F.sum(vol)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == region.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (target_vol.cast("double") / total_vol.cast("double")).alias("mkt_share"),
            total_vol.cast("double").alias("total_volume"),
        )
        .orderBy("o_year")
    )


_ORACLE_Q8 = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CASE WHEN sn.n_name = '{Q8_TARGET_NATION}' THEN {_REVENUE_SQL}
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         / CAST(sum({_REVENUE_SQL}) AS DOUBLE) AS mkt_share,
       CAST(sum({_REVENUE_SQL}) AS DOUBLE) AS total_volume
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region   ON cn.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE p_type = '{Q8_PTYPE}' AND r_name = '{Q8_REGION}'
GROUP BY 1
ORDER BY o_year
"""


Q9_PART_WORD = "red"  # present in every sf's part-name vocabulary


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape (product-type profit by nation and year), adapted: with no
    partsupp table, supply cost is stood in by p_retailprice · quantity, so
    profit = revenue − retailprice·qty, exact in DECIMAL. The part-name
    word filter prunes the broadcast part dim; supplier nation groups the
    result. One lineitem-orders shuffle, everything else broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_name").contains(Q9_PART_WORD)
    )
    profit = _revenue() - F.col("p_retailprice").cast("decimal(18,2)") * F.col(
        "l_quantity"
    ).cast("decimal(18,2)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


_ORACLE_Q9 = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum({_REVENUE_SQL}
                - CAST(p_retailprice AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%{Q9_PART_WORD}%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape (shipping-mode priority split), adapted: the schema has no
    l_shipmode, so the split groups by l_returnflag instead; the essence —
    join orders to a year of lineitem, CASE-count critical vs non-critical
    priorities per group — is intact. The priority CASE folds into the
    partial aggregate, so the shuffle carries two counters per group."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


_ORACLE_Q12 = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape (customer order-count distribution): LEFT join customers
    to a filtered orders set (priority exclusion stands in for the comment
    NOT LIKE), count per customer — zero-order customers kept by the outer
    join — then histogram the counts. Two aggregates, the second over one
    row per customer; the histogram shuffle is tiny."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


_ORACLE_Q13 = """
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape (top supplier): quarterly revenue per supplier, keep the
    supplier(s) whose revenue equals the maximum. Revenue stays DECIMAL
    through the max-equality comparison (exact — a double max would be
    summation-order sensitive), cast to double only for presentation. The
    1-row max broadcasts back against the per-supplier aggregate."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = _t(spark, sf_dir, "supplier")
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_revenue()).alias("total_rev_dec"))
    )
    top = rev.agg(F.max("total_rev_dec").alias("max_rev"))
    return (
        rev.join(F.broadcast(top), rev.total_rev_dec == F.col("max_rev"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select(
            "s_suppkey", "s_name",
            F.col("total_rev_dec").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


_ORACLE_Q15 = f"""
WITH rev AS (
  SELECT l_suppkey AS supplier_no, sum({_REVENUE_SQL}) AS total_rev_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, CAST(total_rev_dec AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON supplier_no = s_suppkey
WHERE total_rev_dec = (SELECT max(total_rev_dec) FROM rev)
ORDER BY s_suppkey
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape (discounted revenue, disjunctive predicates): an OR of
    three brand/size/quantity conjunct bands over the part join — the
    classic optimizer probe for pushing a disjunction through a join. The
    common p_partkey equi-key keeps it a hash join (never a cartesian);
    the bands evaluate as a residual filter on the joined row."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    size = F.col("p_size")
    band = (
        ((F.col("p_brand") == "Brand#1") & size.between(1, 5) & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & size.between(1, 10) & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & size.between(1, 15) & qty.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(band)
        .agg(
            F.sum(_revenue()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


_ORACLE_Q19 = f"""
SELECT CAST(sum({_REVENUE_SQL}) AS DOUBLE) AS revenue,
       count(*) AS n_lineitems
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


Q22_SEGMENTS = ("AUTOMOBILE", "MACHINERY")
Q22_LAPSE_CUTOFF = "1999-01-01"


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape (global sales opportunity), adapted: market segment stands
    in for the phone country code, and "no orders" becomes "no orders since
    the lapse cutoff" (every testdata customer has SOME order — lapsed
    customers are the non-degenerate analogue). Rich customers (balance
    above the positive-balance average of the segment set) who lapsed,
    counted per segment. The average enters the comparison MULTIPLIED OUT
    (bal · n > total, exact in decimal — no float division), the 1-row
    aggregate broadcasts, and the lapse test is a left-anti join against
    the date-filtered orders scan."""
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin(*Q22_SEGMENTS)
    )
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    pos = cust.filter(bal > 0)
    avg_frame = pos.agg(
        F.sum(bal).alias("bal_total"), F.count(F.lit(1)).alias("bal_n")
    )
    recent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(Q22_LAPSE_CUTOFF).cast("timestamp")
    )
    rich = (
        cust.crossJoin(F.broadcast(avg_frame))
        .filter(bal * F.col("bal_n") > F.col("bal_total"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
    )
    return (
        rich.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(bal).cast("double").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


_ORACLE_Q22 = f"""
WITH seg AS (
  SELECT * FROM customer
  WHERE c_mktsegment IN ({", ".join(repr(s) for s in Q22_SEGMENTS)})
),
avg_frame AS (
  SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS bal_total,
         count(*) AS bal_n
  FROM seg WHERE CAST(c_acctbal AS DECIMAL(18,2)) > 0
)
SELECT c_mktsegment, count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM seg, avg_frame
WHERE CAST(c_acctbal AS DECIMAL(18,2)) * bal_n > bal_total
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '{Q22_LAPSE_CUTOFF}')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# --- derived partsupp: the testdata ships no partsupp table, so the four
# shapes that need one (Q2/Q11/Q16/Q20) derive a stand-in from the distinct
# (l_partkey, l_suppkey) pairs actually traded in lineitem. The two synthetic
# columns are pure integer arithmetic on the keys — deterministic, exactly
# reproducible in the DuckDB oracle, and integer-valued so every downstream
# comparison stays exact in DECIMAL. Scale note: the derivation is ONE
# map-side-combined hash distinct over a 2-int projection of lineitem (the
# narrowest possible scan — Parquet reads two columns); at 100 TB that is the
# cheapest shuffle in the family and its output is |part|×avg-suppliers-per-
# part, i.e. dimension-sized, so everything joined against it downstream
# broadcasts or stays dimension-scale.


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = (
        _t(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
    )
    pk, sk = F.col("ps_partkey"), F.col("ps_suppkey")
    return pairs.select(
        "ps_partkey",
        "ps_suppkey",
        (F.pmod(pk * 7 + sk * 11, F.lit(9999)) + 1).alias("ps_availqty"),
        (F.pmod(pk * 13 + sk * 17, F.lit(99999)) + 1)
        .cast("decimal(18,2)")
        .alias("ps_supplycost"),
    )


_PARTSUPP_CTE = """
partsupp AS (
  SELECT ps_partkey, ps_suppkey,
         (ps_partkey * 7 + ps_suppkey * 11) % 9999 + 1 AS ps_availqty,
         CAST((ps_partkey * 13 + ps_suppkey * 17) % 99999 + 1
              AS DECIMAL(18,2)) AS ps_supplycost
  FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
        FROM lineitem)
)
"""

Q2_MAX_SIZE = 15  # TPC-H picks one size; a band keeps small SFs non-degenerate
Q2_PTYPE = "LARGE"
Q2_REGION = "EUROPE"


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape (minimum-cost supplier): for each part of one size/type,
    the EUROPE supplier(s) quoting the regional minimum supply cost —
    TPC-H's correlated MIN subquery. Decorrelated here as a window MIN
    over ps_partkey: candidates are pruned FIRST (broadcast part filter +
    region semi-chain), then ONE shuffle keyed on ps_partkey computes the
    per-part minimum and keeps the tied rows — no self-join, no second
    scan of the derived partsupp. Total order (acctbal desc, name chain)
    before the top-100 so ties cannot flap the driver hash."""
    from pyspark.sql.window import Window

    ps = _partsupp(spark, sf_dir)
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= Q2_MAX_SIZE) & (F.col("p_type") == Q2_PTYPE)
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == Q2_REGION)
    cand = (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(supp, ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    w = Window.partitionBy("ps_partkey")
    return (
        cand.withColumn("min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .select(
            F.col("s_acctbal").cast("decimal(18,2)").cast("double").alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.col("ps_supplycost").cast("double").alias("ps_supplycost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


_ORACLE_Q2 = f"""
WITH {_PARTSUPP_CTE.strip()},
cand AS (
  SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps_supplycost,
         min(ps_supplycost) OVER (PARTITION BY ps_partkey) AS min_cost
  FROM partsupp
  JOIN part     ON ps_partkey = p_partkey
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE p_size <= {Q2_MAX_SIZE} AND p_type = '{Q2_PTYPE}'
    AND r_name = '{Q2_REGION}'
)
SELECT CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS s_acctbal,
       s_name, n_name, p_partkey, p_brand,
       CAST(ps_supplycost AS DOUBLE) AS ps_supplycost
FROM cand WHERE ps_supplycost = min_cost
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""

Q11_REGION = "ASIA"
Q11_FRACTION_DENOM = 1000  # keep part groups worth > 1/1000 of total value


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape (important stock identification): total supply value
    (cost · availqty) held per part by one region's suppliers, keeping
    parts above a fraction of the regional total. TPC-H's scalar HAVING
    subquery enters MULTIPLIED OUT (value · DENOM > total, exact decimal —
    no float threshold), the 1-row total broadcasts via cross join, and
    the supplier→nation→region chain broadcasts into the partsupp scan, so
    the only shuffle is the groupBy ps_partkey — dimension-scale."""
    ps = _partsupp(spark, sf_dir)
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == Q11_REGION)
    value = F.col("ps_supplycost") * F.col("ps_availqty")
    held = (
        ps.join(supp, ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    per_part = held.groupBy("ps_partkey").agg(F.sum(value).alias("value_dec"))
    total = held.agg(F.sum(value).alias("total_dec"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_dec") * Q11_FRACTION_DENOM > F.col("total_dec"))
        .select(
            "ps_partkey", F.col("value_dec").cast("double").alias("part_value")
        )
        .orderBy(F.col("part_value").desc(), "ps_partkey")
    )


_ORACLE_Q11 = f"""
WITH {_PARTSUPP_CTE.strip()},
held AS (
  SELECT ps_partkey, ps_supplycost * ps_availqty AS v
  FROM partsupp
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = '{Q11_REGION}'
)
SELECT ps_partkey, CAST(sum(v) AS DOUBLE) AS part_value
FROM held
GROUP BY ps_partkey
HAVING sum(v) * {Q11_FRACTION_DENOM} > (SELECT sum(v) FROM held)
ORDER BY part_value DESC, ps_partkey
"""

Q16_EXCL_BRAND = "Brand#5"
Q16_EXCL_TYPE = "MEDIUM"
Q16_SIZES = (1, 4, 9, 14, 19, 23, 36, 45)
Q16_COMPLAINT_BAL = 500.0  # acctbal below this stands in for complaint suppliers


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape (parts/supplier relationship): how many distinct suppliers
    can furnish each surviving (brand, type, size) bucket, excluding
    blacklisted suppliers. Adaptation: the schema has no s_comment, so the
    '%Customer%Complaints%' blacklist becomes s_acctbal < 500 — same
    shape, a broadcast ANTI join against a filtered supplier projection.
    The NOT-IN brand/type and size-IN filters prune the broadcast part dim
    before the join; countDistinct shuffles once on the group key."""
    ps = _partsupp(spark, sf_dir)
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != Q16_EXCL_BRAND)
        & (F.col("p_type") != Q16_EXCL_TYPE)
        & F.col("p_size").isin(*Q16_SIZES)
    )
    complaints = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < Q16_COMPLAINT_BAL)
        .select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(
            F.broadcast(complaints),
            ps.ps_suppkey == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


_ORACLE_Q16 = f"""
WITH {_PARTSUPP_CTE.strip()}
SELECT p_brand, p_type, p_size,
       count(DISTINCT ps_suppkey) AS supplier_cnt
FROM partsupp
JOIN part ON ps_partkey = p_partkey
WHERE p_brand <> '{Q16_EXCL_BRAND}'
  AND p_type <> '{Q16_EXCL_TYPE}'
  AND p_size IN ({", ".join(str(s) for s in Q16_SIZES)})
  AND ps_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < {Q16_COMPLAINT_BAL})
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

Q20_PART_WORD = "red"
Q20_REGION = "ASIA"  # TPC-H filters one nation; a region keeps small SFs alive
Q20_YEAR = "1997"


def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape (potential part promotion): suppliers in one region whose
    stock of a name-matched part exceeds half of what they actually
    shipped of it in a year — candidates for a promotion. The half-of-
    shipped threshold enters MULTIPLIED OUT (2 · availqty > sum(qty),
    decimal-exact); shipped quantities aggregate over the year-pruned
    lineitem scan keyed on the SAME (partkey, suppkey) pair the partsupp
    derivation shuffles on, so AQE can plan both sides of the pair join
    shuffle-aligned. Broadcast name-matched part keys prune both scans;
    the region's nation keys broadcast into the supplier join. Output counts the
    qualifying parts per supplier (a richer surface than EXISTS alone)."""
    part_keys = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").contains(Q20_PART_WORD))
        .select("p_partkey")
    )
    ps = _partsupp(spark, sf_dir).join(
        F.broadcast(part_keys),
        F.col("ps_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(f"{Q20_YEAR}-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(f"{int(Q20_YEAR) + 1}-01-01").cast("timestamp"))
    )
    shipped = (
        li.join(
            F.broadcast(part_keys),
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy(
            F.col("l_partkey").alias("sh_partkey"),
            F.col("l_suppkey").alias("sh_suppkey"),
        )
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sh_qty"))
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == Q20_REGION)
    nation = _t(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"), "left_semi"
    )
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi"
    )
    qualifying = ps.join(
        shipped,
        (F.col("ps_partkey") == F.col("sh_partkey"))
        & (F.col("ps_suppkey") == F.col("sh_suppkey")),
    ).filter(
        F.col("ps_availqty").cast("decimal(18,2)") * 2 > F.col("sh_qty")
    )
    return (
        qualifying.join(supp, F.col("ps_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.countDistinct("ps_partkey").alias("promo_parts"))
        .orderBy("s_name")
    )


_ORACLE_Q20 = f"""
WITH {_PARTSUPP_CTE.strip()},
shipped AS (
  SELECT l_partkey AS sh_partkey, l_suppkey AS sh_suppkey,
         sum(CAST(l_quantity AS DECIMAL(18,2))) AS sh_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q20_YEAR}-01-01'
    AND l_shipdate <  TIMESTAMP '{int(Q20_YEAR) + 1}-01-01'
    AND l_partkey IN (SELECT p_partkey FROM part
                      WHERE p_name LIKE '%{Q20_PART_WORD}%')
  GROUP BY 1, 2
)
SELECT s_name, count(DISTINCT ps_partkey) AS promo_parts
FROM partsupp
JOIN shipped ON ps_partkey = sh_partkey AND ps_suppkey = sh_suppkey
JOIN supplier ON ps_suppkey = s_suppkey
WHERE ps_partkey IN (SELECT p_partkey FROM part
                     WHERE p_name LIKE '%{Q20_PART_WORD}%')
  AND s_nationkey IN (SELECT n_nationkey FROM nation JOIN region
                      ON n_regionkey = r_regionkey
                      WHERE r_name = '{Q20_REGION}')
  AND CAST(ps_availqty AS DECIMAL(18,2)) * 2 > sh_qty
GROUP BY s_name
ORDER BY s_name
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
    QuerySpec("q6_forecast_revenue", q6_forecast_revenue, _ORACLE_Q6,
              "relational", "Q6-shape scan-filter-aggregate (full predicate "
              "pushdown, decimal-exact discount band)"),
    QuerySpec("q4_order_priority", q4_order_priority, _ORACLE_Q4,
              "relational", "Q4-shape EXISTS late-lineitem priority counts "
              "(non-equi left-semi join)"),
    QuerySpec("q8_market_share", q8_market_share, _ORACLE_Q8,
              "relational", "Q8-shape national market share per year "
              "(double nation leg, conditional/total aggregate)"),
    QuerySpec("q9_product_profit", q9_product_profit, _ORACLE_Q9,
              "relational", "Q9-shape product profit by nation and year "
              "(retailprice cost stand-in, decimal-exact)"),
    QuerySpec("q12_shipmode_priority", q12_shipmode_priority, _ORACLE_Q12,
              "relational", "Q12-shape priority split per returnflag "
              "(CASE-count folded into partial agg)"),
    QuerySpec("q13_customer_distribution", q13_customer_distribution,
              _ORACLE_Q13,
              "relational", "Q13-shape customer order-count histogram "
              "(outer join keeps zero-order customers)"),
    QuerySpec("q15_top_supplier", q15_top_supplier, _ORACLE_Q15,
              "relational", "Q15-shape top supplier by quarterly revenue "
              "(decimal-exact max-equality)"),
    QuerySpec("q19_disjunctive_revenue", q19_disjunctive_revenue, _ORACLE_Q19,
              "relational", "Q19-shape disjunctive brand/size/quantity bands "
              "over the part join"),
    QuerySpec("q22_global_sales_opportunity", q22_global_sales_opportunity,
              _ORACLE_Q22,
              "relational", "Q22-shape rich no-order customers per segment "
              "(multiplied-out avg, anti join)"),
    QuerySpec("q2_min_cost_supplier", q2_min_cost_supplier, _ORACLE_Q2,
              "relational", "Q2-shape min-cost regional supplier over derived "
              "partsupp (window MIN, tie-keeping top-100)"),
    QuerySpec("q11_important_stock", q11_important_stock, _ORACLE_Q11,
              "relational", "Q11-shape important-stock value per part "
              "(multiplied-out fraction-of-total HAVING)"),
    QuerySpec("q16_supplier_part_counts", q16_supplier_part_counts,
              _ORACLE_Q16,
              "relational", "Q16-shape distinct-supplier counts per "
              "brand/type/size with blacklist anti join"),
    QuerySpec("q20_potential_promotion", q20_potential_promotion, _ORACLE_Q20,
              "relational", "Q20-shape overstocked-supplier promotion scan "
              "(multiplied-out half-of-shipped threshold)"),
]
