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


SPECS = [
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
