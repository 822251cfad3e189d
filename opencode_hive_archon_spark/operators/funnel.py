"""Product-analytics suite over the events stream: funnel + cohort retention.

Two classic event-analytics operators a warehouse serves daily, designed
around ONE exchange each:

``events_funnel``
    Strictly-ordered conversion funnel view → click → purchase: a user
    converts a stage only with an event strictly after their previous
    stage's first event. Three stacked per-user window minima compute the
    stage timestamps; because all three windows (and the per-user collapse)
    share the user_id partitioning, Catalyst plans ONE hash exchange and
    runs the whole cascade within it — at 100 TB the funnel costs a single
    user-keyed shuffle regardless of how many stages are stacked.

``events_retention``
    Weekly cohort retention matrix: cohort = a user's first-seen week,
    activity bucketed by week offset from the cohort. Same single
    user-keyed exchange for the cohort window; the (cohort, offset)
    aggregate is a partial-agg rollup on top.

Both are exactly mirrored in DuckDB (window CASE-minima and
date_trunc('week') agree between engines), so the full reports are
oracle-exact. Reference parity: the reference engine has no event
analytics (events exist only as the driver's stream table); these extend
the engine's relational surface alongside events_sessionize
(operators/relational.py:359).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from opencode_hive_archon_spark.session import read_table as _t
from opencode_hive_archon_spark.spec import QuerySpec

FUNNEL_STAGES = ("view", "click", "purchase")


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel conversion report (one row)."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    st = ev.withColumn(
        "t_view",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
    )
    st = st.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")),
                F.col("ts"),
            )
        ).over(w),
    )
    st = st.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t_click")),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = st.groupBy("user_id").agg(
        F.max("t_view").alias("tv"),
        F.max("t_click").alias("tc"),
        F.max("t_purchase").alias("tp"),
    )
    n_viewed, n_clicked, n_purchased = (
        F.count("tv"), F.count("tc"), F.count("tp"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        n_viewed.alias("n_viewed"),
        n_clicked.alias("n_clicked"),
        n_purchased.alias("n_purchased"),
        F.when(
            n_viewed > 0, n_clicked.cast("double") / n_viewed
        ).alias("view_to_click"),
        F.when(
            n_clicked > 0, n_purchased.cast("double") / n_clicked
        ).alias("click_to_purchase"),
    )


_ORACLE_FUNNEL = """
WITH st1 AS (
  SELECT user_id, event_type, ts,
         min(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS t_view
  FROM events
),
st2 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t_view THEN ts END)
              OVER (PARTITION BY user_id) AS t_click
  FROM st1
),
st3 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t_click THEN ts END)
              OVER (PARTITION BY user_id) AS t_purchase
  FROM st2
),
per_user AS (
  SELECT user_id, max(t_view) AS tv, max(t_click) AS tc, max(t_purchase) AS tp
  FROM st3 GROUP BY user_id
)
SELECT count(*) AS n_users,
       count(tv) AS n_viewed,
       count(tc) AS n_clicked,
       count(tp) AS n_purchased,
       CASE WHEN count(tv) > 0
            THEN CAST(count(tc) AS DOUBLE) / count(tv) END AS view_to_click,
       CASE WHEN count(tc) > 0
            THEN CAST(count(tp) AS DOUBLE) / count(tc) END AS click_to_purchase
FROM per_user
"""


def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: (cohort_week, week_offset, n_users)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    )
    cohort = F.min("wk").over(Window.partitionBy("user_id"))
    activity = ev.withColumn("cohort", cohort).select(
        "user_id",
        F.col("cohort").alias("cohort_week"),  # timestamp: engine-parity type
        (
            F.datediff(F.col("wk").cast("date"), F.col("cohort").cast("date"))
            / F.lit(7)
        ).cast("int").alias("week_offset"),
    ).distinct()
    return (
        activity.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


_ORACLE_RETENTION = """
WITH act AS (
  SELECT user_id, date_trunc('week', ts) AS wk,
         min(date_trunc('week', ts)) OVER (PARTITION BY user_id) AS cohort
  FROM events
),
dedup AS (
  SELECT DISTINCT user_id, cohort AS cohort_week,
         CAST(date_diff('day', CAST(cohort AS DATE), CAST(wk AS DATE)) // 7
              AS INTEGER) AS week_offset
  FROM act
)
SELECT cohort_week, week_offset, count(*) AS n_users
FROM dedup
GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
"""


def events_path_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix (first-order path analysis): for every
    consecutive event pair within a user's timeline, count (from_type →
    to_type) transitions and their share of all transitions from that
    source type. The `lead` window shares the same user_id exchange
    pattern as the funnel; ordering carries the unique event_id tie-break
    (CONVENTIONS.md) so simultaneous events transition deterministically.
    The share divides two exact counts once per output row — engine-parity
    safe."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    from_totals = Window.partitionBy("from_type")
    return (
        pairs.withColumn(
            "share",
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(from_totals),
        )
        .orderBy("from_type", "to_type")
    )


_ORACLE_PATHS = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events
),
pairs AS (
  SELECT event_type AS from_type, next_type AS to_type,
         count(*) AS n_transitions
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
)
SELECT from_type, to_type, n_transitions,
       CAST(n_transitions AS DOUBLE)
         / sum(n_transitions) OVER (PARTITION BY from_type) AS share
FROM pairs
ORDER BY from_type, to_type
"""


# --- ingest drift / anomaly monitor -----------------------------------------

# Trailing window length (observed daily buckets per event_type) and the
# z threshold. The anomaly predicate is INTEGER-EXACT: with k trailing
# counts of sum S and sum-of-squares Q, |z| > 3 for today's count x iff
#     (k·x − S)² > 9·(k·Q − S²)
# (multiply z² = (x−S/k)² / ((kQ−S²)/k²) through by k²) — no float mean,
# no float variance, no sqrt; both engines compare the same BIGINTs. The
# reported z² itself is then ONE double division of those exact integers,
# per the engine's exactness convention. BIGINT bounds the per-bucket
# count at ~4·10⁸ (the square must fit int64); at 100 TB widen the three
# terms to DECIMAL(38,0) — both engines carry 128-bit exact decimals —
# without touching the plan shape.
DRIFT_TRAIL = 7
DRIFT_Z = 3


def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest drift monitor: daily event-type volumes vs their trailing
    week, |z| > 3 flagged — the data-quality gate a pipeline runs on every
    ingest batch before letting it into the corpus.

    Plan: ONE hash exchange on event_type feeds the daily aggregate and
    the trailing window (they share the partitioning); the trailing frame
    is the previous ``DRIFT_TRAIL`` OBSERVED buckets (ROWS frame — gap
    days shrink the window and ``trail_n`` reports it; a flag only fires
    on a full window). At 100 TB, parallelism is per event_type × day via
    the partial agg; the window stage is per-type sequential but runs on
    ~365 rows per type per year — nothing."""
    return anomaly_report(_t(spark, sf_dir, "events"))


def anomaly_report(ev: DataFrame) -> DataFrame:
    """Drift report over an (event_type, ts) frame — factored so tests can
    feed planted spike corpora (tests/test_sampling.py)."""
    daily = (
        ev.select(
            "event_type", F.date_trunc("day", "ts").alias("day")
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-DRIFT_TRAIL, -1)
    )
    k = F.col("trail_n")
    x = F.col("n_events")
    s = F.col("trail_sum")
    q = F.col("trail_sumsq")
    lhs = (k * x - s) * (k * x - s)
    rhs = F.lit(DRIFT_Z * DRIFT_Z) * (k * q - s * s)
    full = k == DRIFT_TRAIL
    return (
        daily.withColumn("trail_n", F.count("n_events").over(w))
        .withColumn("trail_sum", F.coalesce(F.sum("n_events").over(w), F.lit(0)))
        .withColumn(
            "trail_sumsq",
            F.coalesce(F.sum(F.col("n_events") * F.col("n_events")).over(w), F.lit(0)),
        )
        .select(
            "event_type",
            "day",
            "n_events",
            "trail_n",
            "trail_sum",
            (full & (lhs > rhs)).alias("is_anomaly"),
            F.when(full & (k * q - s * s > 0), lhs.cast("double") / (k * q - s * s))
            .alias("z2"),
        )
        .orderBy("event_type", "day")
    )


_ORACLE_DRIFT = f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n_events
  FROM events
  GROUP BY event_type, date_trunc('day', ts)
),
trailed AS (
  SELECT event_type, day, n_events,
         count(n_events) OVER w AS trail_n,
         coalesce(sum(n_events) OVER w, 0) AS trail_sum,
         coalesce(sum(n_events * n_events) OVER w, 0) AS trail_sumsq
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN {DRIFT_TRAIL} PRECEDING AND 1 PRECEDING)
)
SELECT event_type, day, n_events, trail_n,
       CAST(trail_sum AS BIGINT) AS trail_sum,
       trail_n = {DRIFT_TRAIL}
         AND (trail_n * n_events - trail_sum) * (trail_n * n_events - trail_sum)
             > {DRIFT_Z * DRIFT_Z} * (trail_n * trail_sumsq - trail_sum * trail_sum)
         AS is_anomaly,
       CASE WHEN trail_n = {DRIFT_TRAIL}
                 AND trail_n * trail_sumsq - trail_sum * trail_sum > 0
            THEN CAST((trail_n * n_events - trail_sum)
                      * (trail_n * n_events - trail_sum) AS DOUBLE)
                 / (trail_n * trail_sumsq - trail_sum * trail_sum)
            ELSE NULL END AS z2
FROM trailed
ORDER BY event_type, day
"""


RFM_BUCKETS = 5


def orders_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation — the
    classic warehouse marketing aggregate: per customer, days since their
    last order, order count, and total spend, each quintiled 1 (best) to 5,
    reported as segment-cell counts with exact spend totals.

    Determinism: every ntile window orders by (metric, c_custkey) so equal
    metrics cannot flap cells across partitionings/engines; spend stays
    DECIMAL through the aggregate (one double cast at presentation).

    Scale shape: one customer-keyed aggregate over orders (map-side
    combined), then three UNPARTITIONED ntile windows over the CUSTOMER
    dimension — deliberate: RFM quintiles are global by definition and the
    window input is dimension-sized (|customers|, ~1/10 of orders rows
    here and ~1/1000 of facts in a real warehouse), not fact-sized. At the
    scale where even the dimension overwhelms one sort, the swap is
    approx-quantile thresholds (exercised by agg_approx_quantile_error)
    against the same per-customer aggregate — cell boundaries then come
    from 5 numbers, not a global sort; the shipped formulation is the
    exact one so the oracle stays bit-for-bit."""
    orders = _t(spark, sf_dir, "orders")
    ref = orders.agg(F.max("o_orderdate").alias("ref_date"))
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary_dec"),
        )
        .crossJoin(F.broadcast(ref))
        .select(
            "o_custkey",
            F.datediff("ref_date", "last_order").cast("long").alias("recency_days"),
            "frequency",
            "monetary_dec",
        )
    )
    wr = Window.orderBy(F.col("recency_days").asc(), F.col("o_custkey").asc())
    wf = Window.orderBy(F.col("frequency").desc(), F.col("o_custkey").asc())
    wm = Window.orderBy(F.col("monetary_dec").desc(), F.col("o_custkey").asc())
    scored = per_cust.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary_dec",
        F.ntile(RFM_BUCKETS).over(wr).cast("long").alias("r_score"),
        F.ntile(RFM_BUCKETS).over(wf).cast("long").alias("f_score"),
        F.ntile(RFM_BUCKETS).over(wm).cast("long").alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("monetary_dec").cast("double").alias("segment_spend"),
            F.min("o_custkey").alias("example_custkey"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


_ORACLE_RFM = f"""
WITH per_cust AS (
  SELECT o_custkey,
         CAST(date_diff('day', max(o_orderdate),
                        (SELECT max(o_orderdate) FROM orders)) AS BIGINT)
           AS recency_days,
         count(*) AS frequency,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary_dec
  FROM orders GROUP BY o_custkey
),
scored AS (
  SELECT o_custkey, monetary_dec,
         CAST(ntile({RFM_BUCKETS}) OVER (ORDER BY recency_days ASC, o_custkey ASC)
              AS BIGINT) AS r_score,
         CAST(ntile({RFM_BUCKETS}) OVER (ORDER BY frequency DESC, o_custkey ASC)
              AS BIGINT) AS f_score,
         CAST(ntile({RFM_BUCKETS}) OVER (ORDER BY monetary_dec DESC, o_custkey ASC)
              AS BIGINT) AS m_score
  FROM per_cust
)
SELECT r_score, f_score, m_score, count(*) AS n_customers,
       CAST(sum(monetary_dec) AS DOUBLE) AS segment_spend,
       min(o_custkey) AS example_custkey
FROM scored
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# --- last-touch attribution --------------------------------------------------

ATTRIB_LOOKBACK_US = 7 * 86_400 * 1_000_000  # 7-day window, integer µs


def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase credits the user's
    most recent PRECEDING non-purchase event within a 7-day lookback, or
    the 'direct' channel when none qualifies.

    The carried (type, ts) pair uses the same-row-consistent LOCF device:
    both columns null out under the identical CASE condition, so
    last(ignoreNulls) picks fields of the SAME preceding event. The
    lookback compares integer microseconds (unix_micros), never interval
    arithmetic. Whole pipeline — LOCF window, purchase filter, channel
    CASE, aggregate — runs inside ONE user_id exchange; the channel
    aggregate on top is partial-agged. Counts only (no float sums), so
    every cell is exact."""
    return attribution_report(_t(spark, sf_dir, "events"))


def attribution_report(ev: DataFrame) -> DataFrame:
    """Attribution over a (user_id, ts, event_id, event_type) frame —
    factored so tests can plant known touch sequences."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    non_purchase = F.col("event_type") != "purchase"
    touch_type = F.when(non_purchase, F.col("event_type"))
    touch_ts = F.when(non_purchase, F.col("ts"))
    within = (
        F.unix_micros(F.col("ts")) - F.unix_micros(F.col("prev_ts"))
    ) <= ATTRIB_LOOKBACK_US
    return (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", F.last(touch_type, ignorenulls=True).over(w))
        .withColumn("prev_ts", F.last(touch_ts, ignorenulls=True).over(w))
        .where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.when(F.col("prev_ts").isNotNull() & within, F.col("prev_type"))
            .otherwise(F.lit("direct"))
            .alias("channel"),
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy("channel")
    )


_ORACLE_ATTRIB = f"""
WITH carried AS (
  SELECT user_id, ts, event_type,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS) OVER w AS prev_type,
         last_value(CASE WHEN event_type <> 'purchase' THEN ts END
                    IGNORE NULLS) OVER w AS prev_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
attributed AS (
  SELECT user_id,
         CASE WHEN prev_ts IS NOT NULL
                   AND epoch_us(ts) - epoch_us(prev_ts) <= {ATTRIB_LOOKBACK_US}
              THEN prev_type ELSE 'direct' END AS channel
  FROM carried
  WHERE event_type = 'purchase'
)
SELECT channel,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM attributed
GROUP BY channel
ORDER BY channel
"""


# --- rolling active users (WAU/DAU) -----------------------------------------

ROLL_DAYS = 7


def events_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling engagement: per day, the trailing-7-day distinct active
    users (WAU), same-day actives (DAU), and the one-division stickiness
    ratio DAU/WAU.

    Exact sliding DISTINCT without sliding-window state: the (user, day)
    incidence frame is deduped FIRST (dimension-sized — users × active
    days), then each incidence fans out to the ≤7 report days it
    contributes to via sequence+explode. The ×7 multiplier applies to the
    deduped frame, never raw events (the factored-fan-out rule), and the
    report-day countDistinct is the only fact-scale-independent exchange
    after dedup. ``complete`` flags days whose full trailing window is
    inside the observed range."""
    return rolling_active_report(_t(spark, sf_dir, "events"))


def rolling_active_report(ev: DataFrame) -> DataFrame:
    """Rolling actives over a (user_id, ts) frame — factored for planted
    timelines."""
    daily = (
        ev.select("user_id", F.date_trunc("day", "ts").alias("day"))
        .distinct()
    )
    bounds = daily.agg(
        F.min("day").alias("min_day"), F.max("day").alias("max_day")
    )
    contrib = daily.select(
        "user_id",
        F.explode(
            F.sequence(
                "day",
                F.col("day") + F.expr(f"INTERVAL {ROLL_DAYS - 1} DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("report_day"),
    )
    wau = contrib.groupBy("report_day").agg(
        F.countDistinct("user_id").cast("long").alias("wau")
    )
    dau = daily.groupBy(F.col("day").alias("report_day")).agg(
        F.countDistinct("user_id").cast("long").alias("dau")
    )
    return (
        wau.join(dau, "report_day", "left")
        .crossJoin(F.broadcast(bounds))
        .where(F.col("report_day") <= F.col("max_day"))
        .select(
            "report_day",
            F.coalesce("dau", F.lit(0)).cast("long").alias("dau"),
            "wau",
            (F.coalesce("dau", F.lit(0)).cast("double") / F.col("wau")).alias(
                "stickiness"
            ),
            (
                F.col("report_day")
                >= F.col("min_day") + F.expr(f"INTERVAL {ROLL_DAYS - 1} DAYS")
            ).alias("complete"),
        )
        .orderBy("report_day")
    )


_ORACLE_ROLLING = f"""
WITH daily AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
),
bounds AS (SELECT min(day) AS min_day, max(day) AS max_day FROM daily),
contrib AS (
  SELECT user_id,
         unnest(generate_series(day, day + INTERVAL {ROLL_DAYS - 1} DAY,
                                INTERVAL 1 DAY)) AS report_day
  FROM daily
),
wau AS (
  SELECT report_day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
  FROM contrib GROUP BY report_day
),
dau AS (
  SELECT day AS report_day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
  FROM daily GROUP BY day
)
SELECT w.report_day,
       CAST(coalesce(d.dau, 0) AS BIGINT) AS dau,
       w.wau,
       CAST(coalesce(d.dau, 0) AS DOUBLE) / w.wau AS stickiness,
       w.report_day >= b.min_day + INTERVAL {ROLL_DAYS - 1} DAY AS complete
FROM wau w
LEFT JOIN dau d ON d.report_day = w.report_day
CROSS JOIN bounds b
WHERE w.report_day <= b.max_day
ORDER BY w.report_day
"""


# --- revenue concentration (Pareto deciles) ----------------------------------

CONC_BUCKETS = 10


def orders_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration: customers ranked by exact decimal spend,
    cut into deciles, each decile's share and cumulative share of total
    revenue — the Pareto (\"which customers drive 80%\") report.

    Spend stays DECIMAL through every aggregate; shares are single
    divisions of exactly-representable decimals cast to double. The
    global ntile runs over the customer DIMENSION (same deliberate choice
    and approx-quantile swap note as orders_rfm_segmentation)."""
    per_cust = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend")
        )
    )
    w = Window.orderBy(F.col("spend").desc(), F.col("o_custkey").asc())
    total = per_cust.agg(F.sum("spend").alias("total_spend"))
    deciled = per_cust.select(
        "spend", F.ntile(CONC_BUCKETS).over(w).cast("long").alias("decile")
    )
    per_decile = deciled.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("spend").alias("decile_spend_dec"),
    )
    cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_decile.crossJoin(F.broadcast(total))
        .select(
            "decile",
            "n_customers",
            F.col("decile_spend_dec").cast("double").alias("decile_spend"),
            (
                F.col("decile_spend_dec").cast("double")
                / F.col("total_spend").cast("double")
            ).alias("share"),
            (
                F.sum("decile_spend_dec").over(cum).cast("double")
                / F.col("total_spend").cast("double")
            ).alias("cum_share"),
        )
        .orderBy("decile")
    )


_ORACLE_CONC = f"""
WITH per_cust AS (
  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
  FROM orders GROUP BY o_custkey
),
total AS (SELECT sum(spend) AS total_spend FROM per_cust),
deciled AS (
  SELECT spend,
         CAST(ntile({CONC_BUCKETS}) OVER (ORDER BY spend DESC, o_custkey ASC)
              AS BIGINT) AS decile
  FROM per_cust
),
per_decile AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
         sum(spend) AS decile_spend_dec
  FROM deciled GROUP BY decile
)
SELECT decile, n_customers,
       CAST(decile_spend_dec AS DOUBLE) AS decile_spend,
       CAST(decile_spend_dec AS DOUBLE) / CAST(t.total_spend AS DOUBLE)
         AS share,
       CAST(sum(decile_spend_dec) OVER (ORDER BY decile
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         / CAST(t.total_spend AS DOUBLE) AS cum_share
FROM per_decile
CROSS JOIN total t
ORDER BY decile
"""


# --- consecutive-day streaks --------------------------------------------------


def events_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user, reported as the
    streak-length distribution (n users per max-streak) plus each
    length's example user — the engagement metric behind every 'N-day
    streak' feature.

    Device: the anchor trick on the DEDUPED (user, day) frame —
    day − row_number·1day is constant within a consecutive run, so
    grouping by (user, anchor) counts each streak without a self-join.
    One user-keyed exchange covers the row_number window and both
    per-user aggregates; the distribution rollup on top is streak-
    cardinality-sized."""
    return streak_report(_t(spark, sf_dir, "events"))


def streak_report(ev: DataFrame) -> DataFrame:
    """Streak distribution over a (user_id, ts) frame — factored for
    planted timelines."""
    daily = (
        ev.select("user_id", F.date_trunc("day", "ts").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    anchored = daily.withColumn(
        "anchor",
        F.col("day")
        - F.make_interval(days=F.row_number().over(w)),
    )
    streaks = anchored.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).cast("long").alias("streak_len")
    )
    per_user = streaks.groupBy("user_id").agg(
        F.max("streak_len").alias("max_streak")
    )
    return (
        per_user.groupBy("max_streak")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.min("user_id").alias("example_user"),
        )
        .orderBy("max_streak")
    )


_ORACLE_STREAKS = """
WITH daily AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
),
anchored AS (
  SELECT user_id, day,
         day - to_days(CAST(row_number() OVER (PARTITION BY user_id
                                               ORDER BY day) AS INTEGER))
           AS anchor
  FROM daily
),
streaks AS (
  SELECT user_id, anchor, CAST(count(*) AS BIGINT) AS streak_len
  FROM anchored GROUP BY user_id, anchor
),
per_user AS (
  SELECT user_id, max(streak_len) AS max_streak
  FROM streaks GROUP BY user_id
)
SELECT max_streak, CAST(count(*) AS BIGINT) AS n_users,
       min(user_id) AS example_user
FROM per_user
GROUP BY max_streak
ORDER BY max_streak
"""


SPECS = [
    QuerySpec(
        "events_user_streaks", events_user_streaks, _ORACLE_STREAKS,
        "relational",
        "consecutive-day streak distribution: anchor trick (day - rn) on "
        "the deduped (user, day) frame — no self-join; one user-keyed "
        "exchange for window + streak aggregates"),
    QuerySpec(
        "events_rolling_active_users", events_rolling_active_users,
        _ORACLE_ROLLING, "relational",
        "rolling WAU/DAU: exact trailing-7-day distinct users via "
        "dedup-first calendar fan-out (x7 on the incidence DIMENSION, "
        "never raw events), one-division stickiness, completeness flag"),
    QuerySpec(
        "orders_revenue_concentration", orders_revenue_concentration,
        _ORACLE_CONC, "relational",
        "Pareto revenue concentration: decimal-exact customer spend "
        "deciles with per-decile and cumulative shares as single "
        "divisions of exactly-representable decimals"),
    QuerySpec(
        "events_attribution", events_attribution, _ORACLE_ATTRIB,
        "relational",
        "last-touch attribution: purchases credit the most recent "
        "preceding non-purchase touch within a 7-day integer-us lookback "
        "(same-row-consistent LOCF pair), else 'direct'; one user_id "
        "exchange end to end"),
    QuerySpec(
        "orders_rfm_segmentation", orders_rfm_segmentation, _ORACLE_RFM,
        "relational",
        "RFM customer segmentation: per-customer recency/frequency/spend "
        "quintiles (deterministic ntile tie-breaks), segment-cell report"),
    QuerySpec(
        "events_anomaly_zscore", events_anomaly_zscore, _ORACLE_DRIFT,
        "relational",
        "ingest drift monitor: daily event-type volume vs trailing-week "
        "z-score, integer-exact |z|>3 flag ((kx-S)^2 > 9(kQ-S^2)), one "
        "event_type exchange shared by aggregate and window"),
    QuerySpec(
        "events_path_analysis", events_path_analysis, _ORACLE_PATHS,
        "relational",
        "first-order event-type transition matrix with per-source shares "
        "(lead window, deterministic event_id tie-break, one user-keyed "
        "exchange)"),
    QuerySpec(
        "events_funnel", events_funnel, _ORACLE_FUNNEL, "relational",
        "strictly-ordered view→click→purchase funnel: stacked per-user "
        "window minima in ONE user-keyed exchange, stage counts + "
        "conversion rates"),
    QuerySpec(
        "events_retention", events_retention, _ORACLE_RETENTION, "relational",
        "weekly cohort retention matrix (first-seen-week cohorts × week "
        "offset), single user-keyed exchange + partial-agg rollup"),
]
