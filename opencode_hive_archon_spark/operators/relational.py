"""Family 2 — the general relational surface (SURVEY.md §2B).

Scans/filters/joins/aggregations/windows/set-ops/scalars over the TPC-H-ish
star schema. Everything is declarative DataFrame code: Catalyst handles
predicate pushdown, column pruning, join selection (broadcast vs shuffle),
partial aggregation and AQE re-planning — no hand-scheduling.

Scale notes (100 TB posture):
* Aggregates go through map-side partial aggregation automatically; group
  keys here (returnflag/linestatus/mktsegment/priority) are low-cardinality,
  so the shuffle carries only partial states, not rows.
* Small dimensions (region, nation) are broadcast — the probe side never
  shuffles for those joins.
* Fact-fact joins (orders ⋈ lineitem) shuffle on the join key; at cluster
  scale co-locate by bucketing both tables on orderkey (saveAsTable with
  bucketBy) — the join then degenerates to a zipped local join.
* Top-k (sort+limit) compiles to TakeOrderedAndProject: no global sort.

Float determinism (oracle hash-exactness): money columns are 2-decimal
values stored as double. Sums are computed over DECIMAL casts so partial
aggregation order cannot perturb low bits; averages divide the exact decimal
sum (as double) by the count. SURVEY.md §7 risk register.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from opencode_hive_archon_spark.session import read_table as _t  # noqa: F401
from opencode_hive_archon_spark.spec import QuerySpec


def dsum(col: Column, scale: int = 2, prec: int = 18) -> Column:
    """Order-insensitive exact sum of fixed-point-valued doubles: cast to
    DECIMAL, sum exactly, present as double."""
    return F.sum(col.cast(f"decimal({prec},{scale})")).cast("double")


def _revenue_term() -> Column:
    """l_extendedprice * (1 - l_discount), exact in decimal."""
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1.0) - F.col("l_discount")
    ).cast("decimal(8,2)")


_REVENUE_SQL = "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(8,2))"


# ---------------------------------------------------------------------------
# scan_project_filter — pushed-down range filter + arithmetic projection
# ---------------------------------------------------------------------------

def scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity"),
            _revenue_term().cast("double").alias("revenue"),
            F.year("l_shipdate").alias("ship_year"),
        )
    )


_ORACLE_SCAN = f"""
SELECT l_orderkey, l_linenumber, l_quantity,
       CAST({_REVENUE_SQL} AS DOUBLE) AS revenue,
       CAST(year(l_shipdate) AS INT) AS ship_year
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
"""


# ---------------------------------------------------------------------------
# pricing_summary — TPC-H Q1 shape
# ---------------------------------------------------------------------------

def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    charge = _revenue_term() * (F.lit(1.0) + F.col("l_tax")).cast("decimal(8,2)")
    return (
        li.filter(F.col("l_shipdate") <= "2000-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),  # integral doubles: exact
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            F.sum(_revenue_term()).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
            (dsum(F.col("l_extendedprice")) / F.count(F.lit(1))).alias("avg_price"),
            (dsum(F.col("l_discount")) / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_ORACLE_PRICING = f"""
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum({_REVENUE_SQL}) AS DOUBLE) AS sum_disc_price,
       CAST(sum({_REVENUE_SQL} * CAST(1 + l_tax AS DECIMAL(8,2))) AS DOUBLE) AS sum_charge,
       sum(l_quantity) / count(*) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
       CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# join_broadcast — small-dim broadcast join + rollup counts
# ---------------------------------------------------------------------------

def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation, region = _t(spark, sf_dir, "nation"), _t(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_nations"))
        .orderBy("r_name")
    )


_ORACLE_JOIN_BROADCAST = """
SELECT r_name, count(*) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# ---------------------------------------------------------------------------
# join_shuffle — fact-fact-dim join, revenue by market segment
# ---------------------------------------------------------------------------

def join_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.sum(_revenue_term()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("c_mktsegment")
    )


_ORACLE_JOIN_SHUFFLE = f"""
SELECT c_mktsegment,
       CAST(sum({_REVENUE_SQL}) AS DOUBLE) AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# join_semi_anti — EXISTS / NOT EXISTS as left_semi / left_anti
# ---------------------------------------------------------------------------

def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    with_orders = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .withColumn("cohort", F.lit("with_orders"))
    )
    without_orders = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .withColumn("cohort", F.lit("without_orders"))
    )
    return with_orders.unionByName(without_orders).select(
        "cohort", "c_mktsegment", "n_customers"
    )


_ORACLE_SEMI_ANTI = """
SELECT 'with_orders' AS cohort, c_mktsegment, count(*) AS n_customers
FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
UNION ALL
SELECT 'without_orders' AS cohort, c_mktsegment, count(*) AS n_customers
FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# join_outer_coalesce — left outer + null backfill
# ---------------------------------------------------------------------------

def join_outer_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    per_cust = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            dsum(F.col("o_totalprice")).alias("spend"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    return cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left").select(
        "c_custkey",
        "c_mktsegment",
        F.coalesce(F.col("spend"), F.lit(0.0)).alias("total_spent"),
        F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
    )


_ORACLE_OUTER = """
SELECT c_custkey, c_mktsegment,
       coalesce(o.spend, 0.0) AS total_spent,
       coalesce(o.n_orders, 0) AS n_orders
FROM customer
LEFT JOIN (
  SELECT o_custkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend,
         count(*) AS n_orders
  FROM orders GROUP BY o_custkey
) o ON c_custkey = o.o_custkey
"""


# ---------------------------------------------------------------------------
# join_asof_event_order — as-of join via single-shuffle union+window trick
# ---------------------------------------------------------------------------

def join_asof_event_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each 'purchase' event: the most recent prior-or-same-time 'click'
    by the same user (classic as-of join; Spark has no native one).

    Implementation is the scalable union+running-max formulation: tag both
    streams, single shuffle on user_id, one ordered window pass — O(n log n)
    per user, no self-join blow-up (SURVEY.md §2B; pyspark guide "as-of").
    """
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("ev_ts"), F.lit(0).alias("is_purchase"),
        F.lit(None).cast("long").alias("event_id"), F.lit(None).cast("double").alias("value"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("ev_ts"), F.lit(1).alias("is_purchase"),
        "event_id", "value",
    )
    # Order clicks before purchases at identical ts so "prior-or-same-time"
    # clicks are visible to the running max.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ev_ts", "is_purchase", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tagged = clicks.unionByName(purchases).withColumn(
        "last_click_ts",
        F.max(F.when(F.col("is_purchase") == 0, F.col("ev_ts"))).over(w),
    )
    return (
        tagged.filter(F.col("is_purchase") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("ev_ts").alias("purchase_ts"),
            "last_click_ts",
            (
                F.col("ev_ts").cast("double") - F.col("last_click_ts").cast("double")
            ).alias("secs_since_click"),
        )
    )


def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-either-side as-of join (pandas ``merge_asof
    direction='nearest'``), expressed with WINDOWS — for each purchase, the
    click by the same user closest in time on EITHER side, equidistant ties
    to the earlier (backward) click.

    This deliberately disproves the 'nearest exceeds window expressiveness'
    escape hatch: a backward running-max and a forward running-min over the
    SAME (user_id, ts, kind, event_id) ordering resolve both candidates in
    ONE user-keyed exchange (Catalyst plans one Window node pair over one
    sort), and the winner is a pure projection on integer microsecond
    deltas — no per-group pandas, no second shuffle. Same-ts clicks sort
    before purchases (the existing as-of convention), so they land on the
    backward side in both engines; max/min aggregation makes the intra-tie
    click order irrelevant, keeping NULL-ordering differences harmless.
    """
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("ev_ts"), F.lit(0).alias("is_purchase"),
        F.lit(None).cast("long").alias("event_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("ev_ts"), F.lit(1).alias("is_purchase"),
        "event_id",
    )
    order = ["ev_ts", "is_purchase", "event_id"]
    wb = (
        Window.partitionBy("user_id").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("user_id").orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    click_ts = F.when(F.col("is_purchase") == 0, F.col("ev_ts"))
    tagged = (
        clicks.unionByName(purchases)
        .withColumn("prev_ts", F.max(click_ts).over(wb))
        .withColumn("next_ts", F.min(click_ts).over(wf))
    )
    prev_d = F.unix_micros("ev_ts") - F.unix_micros("prev_ts")
    next_d = F.unix_micros("next_ts") - F.unix_micros("ev_ts")
    backward = F.col("prev_ts").isNotNull() & (
        F.col("next_ts").isNull() | (prev_d <= next_d)
    )
    return (
        tagged.filter(F.col("is_purchase") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("ev_ts").alias("purchase_ts"),
            F.when(backward, F.col("prev_ts"))
            .otherwise(F.col("next_ts"))
            .alias("nearest_click_ts"),
            F.when(
                F.col("prev_ts").isNull() & F.col("next_ts").isNull(),
                F.lit(None).cast("string"),
            )
            .when(backward, F.lit("backward"))
            .otherwise(F.lit("forward"))
            .alias("direction"),
            F.when(backward, prev_d)
            .otherwise(next_d)
            .cast("long")
            .alias("diff_us"),
        )
        .orderBy("event_id")
    )


_ORACLE_ASOF_NEAREST = """
WITH tagged AS (
  SELECT user_id, ts AS ev_ts, 0 AS is_purchase,
         CAST(NULL AS BIGINT) AS event_id
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT user_id, ts, 1, event_id FROM events WHERE event_type = 'purchase'
),
win AS (
  SELECT *,
         max(CASE WHEN is_purchase = 0 THEN ev_ts END) OVER
           (PARTITION BY user_id ORDER BY ev_ts, is_purchase, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_ts,
         min(CASE WHEN is_purchase = 0 THEN ev_ts END) OVER
           (PARTITION BY user_id ORDER BY ev_ts, is_purchase, event_id
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_ts
  FROM tagged
),
purch AS (
  SELECT event_id, user_id, ev_ts,
         prev_ts, next_ts,
         epoch_us(ev_ts) - epoch_us(prev_ts) AS prev_d,
         epoch_us(next_ts) - epoch_us(ev_ts) AS next_d,
         prev_ts IS NOT NULL
           AND (next_ts IS NULL
                OR epoch_us(ev_ts) - epoch_us(prev_ts)
                   <= epoch_us(next_ts) - epoch_us(ev_ts)) AS backward
  FROM win WHERE is_purchase = 1
)
SELECT event_id, user_id, ev_ts AS purchase_ts,
       CASE WHEN backward THEN prev_ts ELSE next_ts END AS nearest_click_ts,
       CASE WHEN prev_ts IS NULL AND next_ts IS NULL THEN NULL
            WHEN backward THEN 'backward' ELSE 'forward' END AS direction,
       CAST(CASE WHEN backward THEN prev_d ELSE next_d END AS BIGINT)
         AS diff_us
FROM purch ORDER BY event_id
"""


def join_asof_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same as-of join via applyInPandas + pd.merge_asof per user group
    (the guide's alternative strategy for semantics beyond a single window
    pass — though the bar is higher than it looks: ``join_asof_nearest``
    shows even nearest-either-side fits in one dual-direction window).

    Seconds are derived as micros/1e6 per timestamp before subtraction —
    the exact double sequence Spark's timestamp->double cast uses — so this
    variant, the window variant, and the DuckDB ASOF oracle all agree
    bit-for-bit.

    Bench note: this is deliberately the STRATEGY-B demo, not the scale
    path — per-user grouped pandas pays Arrow serialization + per-group
    Python dispatch and measures ~19× slower than its window-formulation
    sibling ``join_asof_event_order`` at sf0.1 (~7 s vs ~0.4 s). Reach for
    it only when the semantics genuinely exceed window expressiveness; at
    100× the window variant is the one to scale.
    """
    import pandas as pd

    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_type", "event_id")

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        purchases = pdf[pdf["event_type"] == "purchase"].sort_values(
            ["ts", "event_id"]
        )
        clicks = (
            pdf[pdf["event_type"] == "click"][["ts"]]
            .sort_values("ts")
            .rename(columns={"ts": "last_click_ts"})
        )
        if purchases.empty:
            return pd.DataFrame(
                columns=["event_id", "user_id", "purchase_ts", "last_click_ts", "secs_since_click"]
            )
        merged = pd.merge_asof(
            purchases, clicks, left_on="ts", right_on="last_click_ts",
            direction="backward",
        )

        def secs(col):
            # micros -> seconds; NaT must surface as NaN, not int garbage
            raw = (col.astype("int64") // 1000) / 1e6
            return raw.where(col.notna())

        return pd.DataFrame(
            {
                "event_id": merged["event_id"],
                "user_id": merged["user_id"],
                "purchase_ts": merged["ts"],
                "last_click_ts": merged["last_click_ts"],
                "secs_since_click": secs(merged["ts"]) - secs(merged["last_click_ts"]),
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        per_user,
        schema="event_id long, user_id long, purchase_ts timestamp, "
        "last_click_ts timestamp, secs_since_click double",
    )


_ORACLE_ASOF = """
SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
       c.ts AS last_click_ts,
       epoch(p.ts) - epoch(c.ts) AS secs_since_click
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND c.ts <= p.ts
"""


# ---------------------------------------------------------------------------
# events_sessionize
# ---------------------------------------------------------------------------

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: split each user's event stream into sessions at
    >30-minute inactivity gaps (lag + running sum of new-session flags — the
    classic gaps-and-islands shape), then aggregate one row per session.

    Scale: both windows and the final aggregate share the user_id hash
    partition, so the whole plan is ONE shuffle on user_id followed by a
    partial+final agg; no global ordering anywhere. Timestamps flow as
    unix_micros on both engines (parquet nanos truncate identically)."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "user_id", "event_id", "event_type", "value",
        F.unix_micros(F.col("ts")).alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("us").asc(), F.col("event_id").asc()
    )
    prev = F.lag("us").over(w)
    is_new = (prev.isNull() | ((F.col("us") - prev) > SESSION_GAP_US)).cast("long")
    sess = base.withColumn(
        "session_seq",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("us").alias("start_us"),
            F.max("us").alias("end_us"),
            (F.max("us") - F.min("us")).alias("duration_us"),
            dsum(F.col("value")).alias("total_value"),
            F.countDistinct("event_type").alias("n_event_types"),
        )
        .orderBy("user_id", "session_seq")
    )


_ORACLE_SESSIONIZE = f"""
WITH e AS (
  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS us FROM events
),
flagged AS (
  SELECT *,
         CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)
),
sess AS (
  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq, count(*) AS n_events,
       min(us) AS start_us, max(us) AS end_us,
       max(us) - min(us) AS duration_us,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       count(DISTINCT event_type) AS n_event_types
FROM sess GROUP BY user_id, session_seq
"""


# ---------------------------------------------------------------------------
# agg_distinct / agg_approx_distinct
# ---------------------------------------------------------------------------

def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


_ORACLE_AGG_DISTINCT = """
SELECT l_returnflag,
       count(DISTINCT l_suppkey) AS n_suppliers,
       count(DISTINCT l_partkey) AS n_parts,
       count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ sketch — the 100 TB path for distinct counts (no exact
    shuffle-dedup). Approximate by design => rows-only driver check."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.approx_count_distinct("l_suppkey", 0.02).alias("approx_suppliers"),
    )


# ---------------------------------------------------------------------------
# rollup / cube
# ---------------------------------------------------------------------------

def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy(
            F.col("o_orderpriority").asc_nulls_first(),
            F.col("o_orderstatus").asc_nulls_first(),
        )
    )


_ORACLE_ROLLUP = """
SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""


def cube_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("day", F.date_trunc("day", F.col("ts")))
        .cube("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
    )


_ORACLE_CUBE = """
SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY CUBE (event_type, date_trunc('day', ts))
"""


# ---------------------------------------------------------------------------
# windows
# ---------------------------------------------------------------------------

def window_rank_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("o_orderpriority", "rk", "o_orderkey", "o_totalprice")
    )


_ORACLE_WINDOW_TOPK = """
SELECT o_orderpriority, rk, o_orderkey, o_totalprice
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders
) WHERE rk <= 3
"""


def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total + lag delta over daily order revenue, year-partitioned.

    A global ``Window.orderBy`` funnels ALL rows through one partition — a
    scale bug even when the input is a per-day aggregate. Instead: running
    sums within each year partition, then a stitched offset of prior years'
    totals (one row per year, joined broadcast). Because every intermediate
    stays DECIMAL (exact, associative), the stitched result is bit-identical
    to the single-partition formulation the oracle uses. The year-offset
    table is built with a triangle join over #years rows (bounded by the
    calendar, not data volume) — no unpartitioned WindowExec anywhere.
    """
    from opencode_hive_archon_spark.session import materialize as _materialize

    orders = _t(spark, sf_dir, "orders")
    # The daily aggregate feeds THREE subtrees (the output rows, the
    # year-edge totals, and — via the self-joined offsets — a second
    # year-edge derivation); without a persist each one re-scans orders
    # and re-runs the groupBy (3 scans for one calendar-sized table).
    # Materialized once, calendar-sized (one row per day), exact DECIMAL —
    # the stitched result is unchanged (r19, guide §1.2 step 1).
    daily = _materialize(
        orders.groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("day"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("day_total_dec"))
        .withColumn("yr", F.year("day"))
    )
    year_edge = daily.groupBy("yr").agg(
        F.sum("day_total_dec").alias("yr_total"),
        F.max_by("day_total_dec", "day").alias("yr_last"),
    )
    offsets = (
        year_edge.alias("a")
        .join(year_edge.alias("b"), F.col("b.yr") < F.col("a.yr"), "left")
        .groupBy(F.col("a.yr").alias("yr"))
        .agg(
            F.coalesce(F.sum("b.yr_total"), F.lit(0).cast("decimal(18,2)")).alias("prior_total"),
            F.max_by(F.col("b.yr_last"), F.col("b.yr")).alias("prev_yr_last"),
        )
    )
    w_in = Window.partitionBy("yr").orderBy("day")
    return (
        daily.join(F.broadcast(offsets), "yr")
        .withColumn(
            "running_total",
            (
                F.sum("day_total_dec").over(w_in.rowsBetween(Window.unboundedPreceding, 0))
                + F.col("prior_total")
            ).cast("double"),
        )
        .withColumn(
            "delta",
            (
                F.col("day_total_dec")
                - F.coalesce(F.lag("day_total_dec", 1).over(w_in), F.col("prev_yr_last"))
            ).cast("double"),
        )
        .select(
            "day",
            F.col("day_total_dec").cast("double").alias("day_total"),
            "running_total",
            "delta",
        )
    )


_ORACLE_WINDOW_RUNNING = """
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS day_total_dec
  FROM orders GROUP BY 1
)
SELECT day,
       CAST(day_total_dec AS DOUBLE) AS day_total,
       CAST(sum(day_total_dec) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
       CAST(day_total_dec - lag(day_total_dec, 1) OVER (ORDER BY day) AS DOUBLE) AS delta
FROM daily
"""


def window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analytic-window function suite over daily revenue per priority:
    lag/lead neighbors, ntile quartiles, percent_rank and cume_dist — the
    remaining SQL window functions not exercised by the rank/running/moving
    queries.

    Scale shape: the window input is the DAILY aggregate (calendar ×
    5 priorities — bounded by time, not data volume), and every window is
    partitioned by priority; no unpartitioned WindowExec. percent_rank /
    cume_dist are exact rationals evaluated in double on both engines, so
    the oracle comparison stays bit-exact."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        "o_orderpriority", F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias(
            "day_total"
        )
    )
    w = Window.partitionBy("o_orderpriority").orderBy("day")
    return daily.select(
        "o_orderpriority",
        "day",
        "day_total",
        F.lag("day_total", 1).over(w).alias("prev_total"),
        F.lead("day_total", 1).over(w).alias("next_total"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    ).orderBy("o_orderpriority", "day")


_ORACLE_WINDOW_ANALYTICS = """
WITH daily AS (
  SELECT o_orderpriority, date_trunc('day', o_orderdate) AS day,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS day_total
  FROM orders GROUP BY 1, 2
)
SELECT o_orderpriority, day, day_total,
       lag(day_total, 1) OVER w AS prev_total,
       lead(day_total, 1) OVER w AS next_total,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume
FROM daily
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY day)
ORDER BY o_orderpriority, day
"""


def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row moving average over daily event values, year-partitioned with
    halo rows: the last 6 rows of each year are duplicated into the next
    DATA year's partition so every ROWS BETWEEN 6 PRECEDING frame is
    complete inside its partition — no single-partition WindowExec. The
    halo target is the next year PRESENT in the data (triangle join over
    the distinct-year rows, like window_running's offset stitch), so a
    calendar gap between data years cannot strand the halo in an empty
    partition. Halo rows are dropped after the window (part == yr keeps
    originals only). Sums stay DECIMAL, so the stitched frames are
    bit-identical to the global-order oracle. (Assumes every data year
    holds > 6 daily rows — true for any dense event stream; a sparser
    calendar would need a deeper halo.)"""
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)")).alias("day_value_dec"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .withColumn("yr", F.year("day"))
    )
    years = daily.select("yr").distinct()
    next_yr = (
        years.alias("a")
        .join(years.alias("b"), F.col("b.yr") > F.col("a.yr"), "left")
        .groupBy(F.col("a.yr").alias("yr"))
        .agg(F.min(F.col("b.yr")).alias("next_yr"))
    )
    rn_desc = F.row_number().over(Window.partitionBy("yr").orderBy(F.col("day").desc()))
    parts = (
        daily.withColumn("rn_desc", rn_desc)
        .join(F.broadcast(next_yr), "yr")
        .withColumn(
            "part",
            F.explode(
                F.when(
                    (F.col("rn_desc") <= 6) & F.col("next_yr").isNotNull(),
                    F.array(F.col("yr"), F.col("next_yr")),
                ).otherwise(F.array(F.col("yr")))
            ),
        )
    )
    w = Window.partitionBy("part").orderBy("day").rowsBetween(-6, 0)
    return (
        parts.withColumn(
            "ma7",
            F.sum("day_value_dec").over(w).cast("double") / F.count(F.lit(1)).over(w),
        )
        .filter(F.col("part") == F.col("yr"))
        .select(
            "day",
            F.col("day_value_dec").cast("double").alias("day_value"),
            "n_events",
            "ma7",
        )
    )


_ORACLE_WINDOW_MA = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         sum(CAST(value AS DECIMAL(18,2))) AS day_value_dec,
         count(*) AS n_events
  FROM events GROUP BY 1
)
SELECT day, CAST(day_value_dec AS DOUBLE) AS day_value, n_events,
       CAST(sum(day_value_dec) OVER w AS DOUBLE) / count(*) OVER w AS ma7
FROM daily
WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# sort_multi_limit — global multi-key top-k => TakeOrderedAndProject
# ---------------------------------------------------------------------------

def sort_multi_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(
            F.col("o_totalprice").desc(), F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
        )
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .limit(100)
    )


_ORACLE_SORT_LIMIT = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
LIMIT 100
"""


# ---------------------------------------------------------------------------
# set_ops — UNION ALL / INTERSECT / EXCEPT over key slices
# ---------------------------------------------------------------------------

def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    evens = cust.filter(F.col("c_custkey") % 2 == 0)
    thirds = cust.filter(F.col("c_custkey") % 3 == 0)
    rows = [
        ("union_all", evens.unionAll(thirds)),
        ("intersect", evens.intersect(thirds)),
        ("except", evens.exceptAll(thirds)),
    ]
    out = None
    for label, df in rows:
        agg = df.agg(F.count(F.lit(1)).alias("n_keys")).select(
            F.lit(label).alias("set_op"), "n_keys"
        )
        out = agg if out is None else out.unionByName(agg)
    return out


_ORACLE_SET_OPS = """
WITH evens AS (SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0),
     thirds AS (SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0)
SELECT 'union_all' AS set_op, count(*) AS n_keys FROM (SELECT * FROM evens UNION ALL SELECT * FROM thirds)
UNION ALL
SELECT 'intersect', count(*) FROM (SELECT * FROM evens INTERSECT SELECT * FROM thirds)
UNION ALL
SELECT 'except', count(*) FROM (SELECT * FROM evens EXCEPT ALL SELECT * FROM thirds)
"""


# ---------------------------------------------------------------------------
# scalar_string_date_math — built-in scalar function surface
# ---------------------------------------------------------------------------

def scalar_string_date_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.upper("o_orderstatus").alias("status_uc"),
        F.col("o_orderpriority").like("%URGENT%").alias("is_urgent"),
        F.year("o_orderdate").alias("order_year"),
        F.date_trunc("month", F.col("o_orderdate")).alias("order_month"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_cutoff"
        ),
        F.round(F.col("o_totalprice")).cast("double").alias("price_rounded"),
        F.abs(F.col("o_totalprice") - F.lit(250000.0)).alias("price_dev"),
        F.sqrt(F.col("o_totalprice")).alias("price_sqrt"),
    )


_ORACLE_SCALAR = """
SELECT o_orderkey,
       substring(o_orderpriority, 1, 1) AS prio_code,
       upper(o_orderstatus) AS status_uc,
       o_orderpriority LIKE '%URGENT%' AS is_urgent,
       CAST(year(o_orderdate) AS INT) AS order_year,
       date_trunc('month', o_orderdate) AS order_month,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS days_to_cutoff,
       round(o_totalprice) AS price_rounded,
       abs(o_totalprice - 250000.0) AS price_dev,
       sqrt(o_totalprice) AS price_sqrt
FROM orders
"""


# ---------------------------------------------------------------------------
# json_extract_events — JSON field extraction + aggregate
# ---------------------------------------------------------------------------

def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            (F.sum("k").cast("double") / F.count(F.lit(1))).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


_ORACLE_JSON = """
SELECT event_type,
       CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(sum(k) AS DOUBLE) / count(*) AS avg_k,
       max(k) AS max_k,
       count(*) AS n_events
FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# array_ops_embeddings — HOF math over array<float>
# ---------------------------------------------------------------------------

def array_ops_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from opencode_hive_archon_spark.functions.vector import l2_norm

    emb = _t(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "label",
            F.size("embedding").alias("dim"),
            l2_norm("embedding").alias("norm"),
            F.element_at("embedding", 1).cast("double").alias("first_elem"),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.min("dim").cast("long").alias("min_dim"),
            F.max("dim").cast("long").alias("max_dim"),
            F.min("norm").alias("min_norm"),
            F.max("norm").alias("max_norm"),
            F.min("first_elem").alias("min_first"),
            F.max("first_elem").alias("max_first"),
        )
        .orderBy("label")
    )


# list_sum folds left-to-right over list entries, matching Spark's
# F.aggregate fold order, so the norm doubles are bit-identical; only
# order-insensitive aggregates (min/max/count) cross rows.
_ORACLE_ARRAY_OPS = """
WITH per_vec AS (
  SELECT label,
         len(embedding) AS dim,
         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm,
         CAST(embedding[1] AS DOUBLE) AS first_elem
  FROM embeddings
)
SELECT label, count(*) AS n_vecs,
       min(dim) AS min_dim, max(dim) AS max_dim,
       min(norm) AS min_norm, max(norm) AS max_norm,
       min(first_elem) AS min_first, max(first_elem) AS max_first
FROM per_vec GROUP BY label
"""


SPECS = [
    QuerySpec("scan_project_filter", scan_project_filter, _ORACLE_SCAN, "relational",
              "pushed-down range filter + arithmetic projection"),
    QuerySpec("pricing_summary", pricing_summary, _ORACLE_PRICING, "relational",
              "TPC-H Q1-shape grouped aggregation"),
    QuerySpec("join_broadcast", join_broadcast, _ORACLE_JOIN_BROADCAST, "relational",
              "broadcast dim join"),
    QuerySpec("join_shuffle", join_shuffle, _ORACLE_JOIN_SHUFFLE, "relational",
              "fact-fact shuffle join + agg"),
    QuerySpec("join_semi_anti", join_semi_anti, _ORACLE_SEMI_ANTI, "relational",
              "left_semi / left_anti (EXISTS / NOT EXISTS)"),
    QuerySpec("join_outer_coalesce", join_outer_coalesce, _ORACLE_OUTER, "relational",
              "left outer join + coalesce backfill"),
    QuerySpec("join_asof_event_order", join_asof_event_order, _ORACLE_ASOF, "relational",
              "as-of join via union+running-max (oracle: DuckDB ASOF JOIN)"),
    QuerySpec("join_asof_pandas", join_asof_pandas, _ORACLE_ASOF, "relational",
              "same as-of via applyInPandas + merge_asof (strategy B)"),
    QuerySpec("join_asof_nearest", join_asof_nearest, _ORACLE_ASOF_NEAREST,
              "relational",
              "nearest-either-side as-of join as pure windows: backward "
              "max + forward min in one user-keyed exchange, integer-"
              "microsecond winner"),
    QuerySpec("agg_distinct", agg_distinct, _ORACLE_AGG_DISTINCT, "relational",
              "exact distinct counts per group"),
    QuerySpec("agg_approx_distinct", agg_approx_distinct, None, "relational",
              "HyperLogLog++ approx distinct (rows-only)"),
    QuerySpec("rollup_orders", rollup_orders, _ORACLE_ROLLUP, "relational",
              "ROLLUP with subtotals + grand total"),
    QuerySpec("cube_events", cube_events, _ORACLE_CUBE, "relational",
              "CUBE over type × day"),
    QuerySpec("window_rank_topk_per_group", window_rank_topk_per_group, _ORACLE_WINDOW_TOPK,
              "relational", "top-3 per group via row_number"),
    QuerySpec("events_sessionize", events_sessionize, _ORACLE_SESSIONIZE, "relational",
              "gaps-and-islands sessionization: lag + running flag sum, "
              "one user_id shuffle"),
    QuerySpec("window_running", window_running, _ORACLE_WINDOW_RUNNING, "relational",
              "running total + lag delta"),
    QuerySpec("window_analytics", window_analytics, _ORACLE_WINDOW_ANALYTICS,
              "relational",
              "lag/lead/ntile/percent_rank/cume_dist suite over daily "
              "revenue, priority-partitioned"),
    QuerySpec("window_moving_avg", window_moving_avg, _ORACLE_WINDOW_MA, "relational",
              "7-row moving average"),
    QuerySpec("sort_multi_limit", sort_multi_limit, _ORACLE_SORT_LIMIT, "relational",
              "global multi-key top-k"),
    QuerySpec("set_ops", set_ops, _ORACLE_SET_OPS, "relational",
              "UNION ALL / INTERSECT / EXCEPT counts"),
    QuerySpec("scalar_string_date_math", scalar_string_date_math, _ORACLE_SCALAR, "relational",
              "string/date/math scalar surface"),
    QuerySpec("json_extract_events", json_extract_events, _ORACLE_JSON, "relational",
              "JSON extraction + aggregate"),
    QuerySpec("array_ops_embeddings", array_ops_embeddings, _ORACLE_ARRAY_OPS, "relational",
              "HOF array math over embeddings"),
]
