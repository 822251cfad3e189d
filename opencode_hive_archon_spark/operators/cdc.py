"""Change-data-capture diff + column statistics profiling (round 9).

``source_cdc_diff``
    The changelog computation a lakehouse CDF/MERGE pipeline is built on:
    given two snapshots of a keyed table, classify every key as INSERT /
    UPDATE / DELETE (unchanged rows drop out) with old/new payloads —
    one full-outer join on the key, null-side tests for presence, payload
    comparison for update detection. The second snapshot here is DERIVED
    deterministically from the first (modulus-selected deletes, updates
    with an exactly-representable ×2 price change, key-offset inserts) so
    the whole changelog is oracle-exact; in production the same plan runs
    over yesterday's and today's snapshot partitions. Scale: ONE co-keyed
    shuffle pair (both sides hash on the key), payload columns pruned to
    the compared set, changelog output proportional to the churn — the
    exact shape a 100 TB snapshot-diff job needs.

``catalog_column_stats``
    ANALYZE TABLE-style per-column profile of orders: row count, null
    count, exact NDV, and numeric min/max — one report row per column.
    All counts are exact integers; min/max are value passthroughs
    (non-numeric columns report NULL bounds rather than risking
    cross-engine double→string formatting). One scan, all profiles
    computed as a single multi-aggregate (plan-pinned), then unpivoted to
    the report — the stats a cost-based optimizer or data catalog ingests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opencode_hive_archon_spark.session import read_table as _t
from opencode_hive_archon_spark.spec import QuerySpec

__all__ = ["source_cdc_diff", "catalog_column_stats", "SPECS"]

CDC_DEL_MOD = 17   # keys divisible by 17 are deleted in the new snapshot
CDC_UPD_MOD = 13   # keys divisible by 13 get price*2 (exact in binary)
CDC_INS_MOD = 19   # keys divisible by 19 spawn an insert at key + 1e9
CDC_INS_OFFSET = 1_000_000_000


def source_cdc_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSERT/UPDATE/DELETE changelog between the orders snapshot and its
    deterministically mutated successor."""
    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    kept = base.where(F.col("o_orderkey") % CDC_DEL_MOD != 0)
    mutated = kept.select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % CDC_UPD_MOD == 0,
            F.col("o_totalprice") * 2,
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        "o_orderstatus",
    )
    inserts = kept.where(F.col("o_orderkey") % CDC_INS_MOD == 0).select(
        (F.col("o_orderkey") + CDC_INS_OFFSET).alias("o_orderkey"),
        "o_totalprice",
        "o_orderstatus",
    )
    curr = mutated.unionAll(inserts)

    b = base.select(
        F.col("o_orderkey").alias("key"),
        F.col("o_totalprice").alias("old_totalprice"),
        F.col("o_orderstatus").alias("old_status"),
    )
    c = curr.select(
        F.col("o_orderkey").alias("key"),
        F.col("o_totalprice").alias("new_totalprice"),
        F.col("o_orderstatus").alias("new_status"),
    )
    joined = b.join(c, "key", "full_outer")
    op = (
        F.when(F.col("old_totalprice").isNull(), F.lit("insert"))
        .when(F.col("new_totalprice").isNull(), F.lit("delete"))
        .when(
            (F.col("old_totalprice") != F.col("new_totalprice"))
            | (F.col("old_status") != F.col("new_status")),
            F.lit("update"),
        )
    )
    return (
        joined.select(
            op.alias("op"),
            "key",
            "old_totalprice",
            "new_totalprice",
        )
        .where(F.col("op").isNotNull())
        .orderBy("op", "key")
    )


_ORACLE_CDC = f"""
WITH base AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
),
kept AS (
  SELECT * FROM base WHERE o_orderkey % {CDC_DEL_MOD} <> 0
),
curr AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % {CDC_UPD_MOD} = 0 THEN o_totalprice * 2
              ELSE o_totalprice END AS o_totalprice,
         o_orderstatus
  FROM kept
  UNION ALL
  SELECT o_orderkey + {CDC_INS_OFFSET}, o_totalprice, o_orderstatus
  FROM kept WHERE o_orderkey % {CDC_INS_MOD} = 0
),
joined AS (
  SELECT coalesce(b.o_orderkey, c.o_orderkey) AS key,
         b.o_totalprice AS old_totalprice,
         c.o_totalprice AS new_totalprice,
         b.o_orderstatus AS old_status,
         c.o_orderstatus AS new_status
  FROM base b
  FULL OUTER JOIN curr c ON c.o_orderkey = b.o_orderkey
)
SELECT CASE WHEN old_totalprice IS NULL THEN 'insert'
            WHEN new_totalprice IS NULL THEN 'delete'
            WHEN old_totalprice <> new_totalprice
                 OR old_status <> new_status THEN 'update' END AS op,
       key, old_totalprice, new_totalprice
FROM joined
WHERE old_totalprice IS NULL OR new_totalprice IS NULL
      OR old_totalprice <> new_totalprice OR old_status <> new_status
ORDER BY op, key
"""


_PROFILE_COLS = [
    ("o_orderkey", True),
    ("o_custkey", True),
    ("o_totalprice", True),
    ("o_orderpriority", False),
    ("o_orderstatus", False),
]


def catalog_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of orders: n, nulls, exact NDV, numeric
    min/max — one multi-aggregate scan unpivoted to the report."""
    orders = _t(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for col, is_num in _PROFILE_COLS:
        aggs.append(
            F.count(F.when(F.col(col).isNull(), 1)).alias(f"{col}__nulls")
        )
        aggs.append(F.countDistinct(col).cast("long").alias(f"{col}__ndv"))
        if is_num:
            aggs.append(F.min(F.col(col).cast("double")).alias(f"{col}__min"))
            aggs.append(F.max(F.col(col).cast("double")).alias(f"{col}__max"))
    wide = orders.agg(*aggs)
    rows = None
    for col, is_num in _PROFILE_COLS:
        row = wide.select(
            F.lit(col).alias("column_name"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col(f"{col}__nulls").cast("long").alias("n_nulls"),
            F.col(f"{col}__ndv").alias("ndv"),
            (F.col(f"{col}__min") if is_num else F.lit(None).cast("double")).alias(
                "min_num"
            ),
            (F.col(f"{col}__max") if is_num else F.lit(None).cast("double")).alias(
                "max_num"
            ),
        )
        rows = row if rows is None else rows.unionAll(row)
    return rows.orderBy("column_name")


_ORACLE_STATS = """
WITH wide AS (
  SELECT count(*) AS n_rows,
         count(*) FILTER (o_orderkey IS NULL) AS k_nulls,
         count(DISTINCT o_orderkey) AS k_ndv,
         min(CAST(o_orderkey AS DOUBLE)) AS k_min,
         max(CAST(o_orderkey AS DOUBLE)) AS k_max,
         count(*) FILTER (o_custkey IS NULL) AS c_nulls,
         count(DISTINCT o_custkey) AS c_ndv,
         min(CAST(o_custkey AS DOUBLE)) AS c_min,
         max(CAST(o_custkey AS DOUBLE)) AS c_max,
         count(*) FILTER (o_totalprice IS NULL) AS t_nulls,
         count(DISTINCT o_totalprice) AS t_ndv,
         min(o_totalprice) AS t_min,
         max(o_totalprice) AS t_max,
         count(*) FILTER (o_orderpriority IS NULL) AS p_nulls,
         count(DISTINCT o_orderpriority) AS p_ndv,
         count(*) FILTER (o_orderstatus IS NULL) AS s_nulls,
         count(DISTINCT o_orderstatus) AS s_ndv
  FROM orders
)
SELECT * FROM (
  SELECT 'o_orderkey' AS column_name, CAST(n_rows AS BIGINT) AS n_rows,
         CAST(k_nulls AS BIGINT) AS n_nulls, CAST(k_ndv AS BIGINT) AS ndv,
         k_min AS min_num, k_max AS max_num FROM wide
  UNION ALL
  SELECT 'o_custkey', CAST(n_rows AS BIGINT), CAST(c_nulls AS BIGINT),
         CAST(c_ndv AS BIGINT), c_min, c_max FROM wide
  UNION ALL
  SELECT 'o_totalprice', CAST(n_rows AS BIGINT), CAST(t_nulls AS BIGINT),
         CAST(t_ndv AS BIGINT), t_min, t_max FROM wide
  UNION ALL
  SELECT 'o_orderpriority', CAST(n_rows AS BIGINT), CAST(p_nulls AS BIGINT),
         CAST(p_ndv AS BIGINT), NULL, NULL FROM wide
  UNION ALL
  SELECT 'o_orderstatus', CAST(n_rows AS BIGINT), CAST(s_nulls AS BIGINT),
         CAST(s_ndv AS BIGINT), NULL, NULL FROM wide
)
ORDER BY column_name
"""


# ---------------------------------------------------------------------------
# mv_incremental_refresh — incremental materialized-view maintenance
# ---------------------------------------------------------------------------

def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental refresh of a per-customer aggregate MV under the SAME
    deterministic changelog source_cdc_diff emits — the warehouse pattern
    a Delta/Iceberg MERGE-based MV pipeline runs instead of recomputing:

        MV(custkey) = (n_orders, total_price) over the base snapshot
        changelog  -> per-customer DELTAS:
            insert: (+1, +new_price)   delete: (-1, -old_price)
            update: ( 0, new - old)
        refreshed  = MV ⟗ deltas, coalesced sums, zero-count groups drop

    The oracle recomputes the view DIRECTLY from the mutated snapshot, so
    the query proves delta-merge maintenance ≡ full recompute under all
    three op kinds. Cost shape at 100 TB: the delta aggregate shuffles
    only the CHURN (changelog rows), the merge is one co-keyed full-outer
    join against the stored MV — refresh cost is O(churn + affected
    groups), never O(base). Sums ride DECIMAL(18,2) (exact, associative),
    cast to double only in the final projection."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    dec = lambda c: c.cast("decimal(18,2)")  # noqa: E731
    mv_base = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(dec(F.col("o_totalprice"))).alias("total"),
    )
    key = F.col("o_orderkey")
    deletes = orders.where(key % CDC_DEL_MOD == 0).select(
        "o_custkey", F.lit(-1).alias("dn"), dec(-F.col("o_totalprice")).alias("dp")
    )
    updates = orders.where(
        (key % CDC_DEL_MOD != 0) & (key % CDC_UPD_MOD == 0)
    ).select(
        # new - old = 2p - p = p
        "o_custkey", F.lit(0).alias("dn"), dec(F.col("o_totalprice")).alias("dp")
    )
    inserts = orders.where(
        (key % CDC_DEL_MOD != 0) & (key % CDC_INS_MOD == 0)
    ).select(
        "o_custkey", F.lit(1).alias("dn"), dec(F.col("o_totalprice")).alias("dp")
    )
    delta = (
        deletes.unionAll(updates).unionAll(inserts)
        .groupBy("o_custkey")
        .agg(F.sum("dn").alias("dn"), F.sum("dp").alias("dp"))
    )
    merged = mv_base.join(delta, "o_custkey", "full_outer").select(
        "o_custkey",
        (
            F.coalesce(F.col("n_orders"), F.lit(0))
            + F.coalesce(F.col("dn"), F.lit(0))
        ).cast("long").alias("n_orders"),
        (
            F.coalesce(F.col("total"), F.lit(0).cast("decimal(18,2)"))
            + F.coalesce(F.col("dp"), F.lit(0).cast("decimal(18,2)"))
        ).alias("total"),
    )
    return (
        merged.where(F.col("n_orders") > 0)
        .select(
            "o_custkey", "n_orders", F.col("total").cast("double").alias("total_price")
        )
        .orderBy("o_custkey")
    )


# Oracle: FULL RECOMPUTE of the view over the mutated snapshot (the same
# curr construction as _ORACLE_CDC, carrying custkey).
_ORACLE_MV = f"""
WITH kept AS (
  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
  WHERE o_orderkey % {CDC_DEL_MOD} <> 0
),
curr AS (
  SELECT o_custkey,
         CASE WHEN o_orderkey % {CDC_UPD_MOD} = 0 THEN o_totalprice * 2
              ELSE o_totalprice END AS o_totalprice
  FROM kept
  UNION ALL
  SELECT o_custkey, o_totalprice
  FROM kept WHERE o_orderkey % {CDC_INS_MOD} = 0
)
SELECT o_custkey,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM curr
GROUP BY o_custkey
ORDER BY o_custkey
"""


SPECS = [
    QuerySpec(
        "mv_incremental_refresh", mv_incremental_refresh, _ORACLE_MV,
        "sources",
        "incremental materialized-view maintenance: per-customer MV + "
        "changelog deltas (insert/update/delete) merged via one co-keyed "
        "full-outer join — O(churn) refresh proven EQUAL to full "
        "recompute by the oracle"),
    QuerySpec(
        "source_cdc_diff", source_cdc_diff, _ORACLE_CDC, "sources",
        "CDC changelog: full-outer key join of two snapshots classifying "
        "insert/update/delete with old/new payloads — one co-keyed "
        "shuffle pair, churn-proportional output; second snapshot "
        "derived deterministically so the log is oracle-exact"),
    QuerySpec(
        "catalog_column_stats", catalog_column_stats, _ORACLE_STATS,
        "sources",
        "ANALYZE-style column profile: n/nulls/exact NDV/numeric min-max "
        "per column from ONE multi-aggregate scan, unpivoted to the "
        "catalog report"),
]
