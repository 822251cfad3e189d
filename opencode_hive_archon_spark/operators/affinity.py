"""Market-basket affinity mining over orders (round 9).

``orders_market_basket`` — the classic co-occurrence / association report:
which part brands appear in the SAME order more often than independence
predicts. The canonical retail-analytics operator the engine's relational
family lacked:

1. Collapse lineitem to DISTINCT (order, brand) incidences (brand via a
   broadcast part dimension) — the only fact-sized exchange.
2. Pair within orders: self-join on l_orderkey with ``brand_a < brand_b``
   canonical ordering. Fan-out per order is C(basket, 2), bounded by the
   basket size (~7 lines here, bounded in any real order system), so the
   pair frame is a small constant times the fact — never quadratic in the
   table.
3. Score pairs with support (co-occurrence order count) and LIFT:
   lift = support·N / (n_a·n_b) — ONE double division of exact integers
   (the engine's exactness convention), where independence gives lift=1.

Top-20 by support with deterministic tie-breaks. 100 TB posture: the
per-order self-join reuses the orderkey partitioning of the distinct;
brand marginals are a vocabulary-sized broadcast; the final top-k is
TakeOrdered, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opencode_hive_archon_spark.session import read_table as _t
from opencode_hive_archon_spark.spec import QuerySpec

__all__ = ["orders_market_basket", "BASKET_TOP", "SPECS"]

BASKET_TOP = 20


def orders_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 brand pairs by co-occurrence support, with exact marginals
    and the one-division lift score."""
    part_dim = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    items = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .join(F.broadcast(part_dim), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    totals = items.select(
        F.countDistinct("l_orderkey").cast("long").alias("n_orders")
    )
    marginals = items.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_with_brand")
    )
    a = items.alias("a")
    b = items.alias("b")
    support = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("brand_a"),
            F.col("b.p_brand").alias("brand_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
    )
    ma = marginals.select(
        F.col("p_brand").alias("brand_a"), F.col("n_with_brand").alias("n_a")
    )
    mb = marginals.select(
        F.col("p_brand").alias("brand_b"), F.col("n_with_brand").alias("n_b")
    )
    return (
        support.join(F.broadcast(ma), "brand_a")
        .join(F.broadcast(mb), "brand_b")
        .crossJoin(F.broadcast(totals))
        .select(
            "brand_a",
            "brand_b",
            "support",
            "n_a",
            "n_b",
            (
                (F.col("support") * F.col("n_orders")).cast("double")
                / (F.col("n_a") * F.col("n_b"))
            ).alias("lift"),
        )
        .orderBy(F.col("support").desc(), "brand_a", "brand_b")
        .limit(BASKET_TOP)
    )


_ORACLE_BASKET = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
totals AS (
  SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM items
),
marginals AS (
  SELECT p_brand, CAST(count(*) AS BIGINT) AS n_with_brand
  FROM items GROUP BY p_brand
),
support AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
         CAST(count(*) AS BIGINT) AS support
  FROM items a
  JOIN items b ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY a.p_brand, b.p_brand
)
SELECT s.brand_a, s.brand_b, s.support,
       ma.n_with_brand AS n_a, mb.n_with_brand AS n_b,
       CAST(s.support * t.n_orders AS DOUBLE)
         / (ma.n_with_brand * mb.n_with_brand) AS lift
FROM support s
JOIN marginals ma ON ma.p_brand = s.brand_a
JOIN marginals mb ON mb.p_brand = s.brand_b
CROSS JOIN totals t
ORDER BY s.support DESC, s.brand_a, s.brand_b
LIMIT {BASKET_TOP}
"""


SPECS = [
    QuerySpec(
        "orders_market_basket", orders_market_basket, _ORACLE_BASKET,
        "relational",
        "market-basket affinity: distinct (order, brand) incidences, "
        "basket-bounded within-order pair join, exact support/marginals, "
        "one-division lift, TakeOrdered top-20"),
]
