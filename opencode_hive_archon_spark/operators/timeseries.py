"""Time-series / hypertable operators over the events stream (round 9).

The reference engine has no time-series surface (events exist only as the
driver's stream table); these extend the engine's relational family with
the three operators a hypertable-style store serves constantly, plus the
exact ordered-set aggregate:

``events_ohlc_bars``
    The continuous-aggregate rollup: per (event_type, hour), open / high /
    low / close of ``value``. First/last are resolved with TWO row_number
    windows over one (event_type, bucket) partitioning ordered by
    (ts, event_id) — event_id is unique, so both engines pick the same
    row and the bars are oracle-exact (DuckDB cannot key arg_min/arg_max
    by a composite, so the window formulation IS the portable one).

``events_gapfill_locf``
    time_bucket_gapfill + locf: per event_type, the dense hourly grid
    between that series' first and last observed bucket, missing buckets
    0-filled for counts and last-observation-carried-forward for the
    value metric. The grid is CALENDAR-sized (buckets × types), not
    data-sized — at 100 TB the sequence explode emits the same ~10⁴ rows
    per series-year it emits here.

``events_state_intervals``
    The SCD-2 interval build: per user, consecutive same-type runs
    collapse into [valid_from, valid_to) validity intervals with an
    is_current flag — lag-change flag → running-sum island id → per-island
    aggregate → lead for the exclusive upper bound, ALL inside one
    user_id exchange (window, group-by, and second window share the
    partitioning, so Catalyst plans a single hash exchange).

``agg_percentile_disc``
    Exact ordered-set aggregate: percentile_disc(0.5/0.9/0.99) WITHIN
    GROUP per order priority. percentile_disc returns an ELEMENT of the
    group (no interpolation arithmetic), so double equality is exact in
    both engines. Exact percentiles materialize per-group value
    multisets; at 100 TB the swap is approx_percentile against the same
    grouping (its error is gated by agg_approx_quantile_error,
    operators/quality.py) — shipped exact so the oracle is bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from opencode_hive_archon_spark.session import read_table as _t
from opencode_hive_archon_spark.spec import QuerySpec

__all__ = [
    "events_ohlc_bars",
    "events_gapfill_locf",
    "events_state_intervals",
    "agg_percentile_disc",
    "SPECS",
]


def events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event_type — the hypertable continuous
    aggregate.

    Plan: ONE hash exchange on (event_type, bucket); the two row_number
    sorts (asc/desc on (ts, event_id)) and the final aggregate all run
    inside it. open/high/low/close are value PASSTHROUGHS (no float
    arithmetic), so every cell is oracle-exact. Parallelism at 100 TB is
    types × buckets — the natural hypertable chunking."""
    return ohlc_bars(_t(spark, sf_dir, "events"))


def ohlc_bars(events: DataFrame) -> DataFrame:
    """OHLC rollup over an (event_type, ts, event_id, value) frame —
    factored so tests can feed planted tick corpora."""
    ev = events.select(
        "event_type",
        F.date_trunc("hour", "ts").alias("bucket"),
        "ts",
        "event_id",
        "value",
    )
    w_asc = Window.partitionBy("event_type", "bucket").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    w_desc = Window.partitionBy("event_type", "bucket").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn_a", F.row_number().over(w_asc))
        .withColumn("rn_d", F.row_number().over(w_desc))
        .groupBy("event_type", "bucket")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type", "bucket")
    )


_ORACLE_OHLC = """
WITH base AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket, ts, event_id, value
  FROM events
),
rn AS (
  SELECT *,
         row_number() OVER (PARTITION BY event_type, bucket
                            ORDER BY ts ASC, event_id ASC) AS rn_a,
         row_number() OVER (PARTITION BY event_type, bucket
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM base
)
SELECT event_type, bucket,
       max(CASE WHEN rn_a = 1 THEN value END) AS open,
       max(value) AS high,
       min(value) AS low,
       max(CASE WHEN rn_d = 1 THEN value END) AS close,
       count(*) AS n_events
FROM rn
GROUP BY event_type, bucket
ORDER BY event_type, bucket
"""


def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly grid per event_type with gap-filled metrics: counts
    0-filled, the hourly max value carried forward (LOCF).

    The grid derives from each series' own [first, last] observed bucket
    via sequence() + explode — calendar-sized, never data-sized. The LOCF
    window (last ignoreNulls over buckets) shares the event_type
    partitioning with the grid join, so the fill adds no exchange beyond
    the hourly aggregate's."""
    return gapfill_locf(_t(spark, sf_dir, "events"))


def gapfill_locf(events: DataFrame) -> DataFrame:
    """Gap-filled hourly grid over an (event_type, ts, value) frame —
    factored so tests can plant series with known holes."""
    hourly = (
        events
        .select("event_type", F.date_trunc("hour", "ts").alias("bucket"), "value")
        .groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.max("value").alias("max_value"),
        )
    )
    grid = (
        hourly.groupBy("event_type")
        .agg(F.min("bucket").alias("t0"), F.max("bucket").alias("t1"))
        .select(
            "event_type",
            F.explode(
                F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))
            ).alias("bucket"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(hourly, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            "bucket",
            F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_events"),
            F.col("n_obs").isNull().alias("is_gap"),
            F.last("max_value", ignorenulls=True).over(w).alias("locf_max_value"),
        )
        .orderBy("event_type", "bucket")
    )


_ORACLE_GAPFILL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         count(*) AS n_obs, max(value) AS max_value
  FROM events
  GROUP BY event_type, date_trunc('hour', ts)
),
bounds AS (
  SELECT event_type, min(bucket) AS t0, max(bucket) AS t1
  FROM hourly GROUP BY event_type
),
grid AS (
  SELECT event_type,
         unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS bucket
  FROM bounds
)
SELECT g.event_type, g.bucket,
       CAST(coalesce(h.n_obs, 0) AS BIGINT) AS n_events,
       h.n_obs IS NULL AS is_gap,
       last_value(h.max_value IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_max_value
FROM grid g
LEFT JOIN hourly h ON h.event_type = g.event_type AND h.bucket = g.bucket
ORDER BY g.event_type, g.bucket
"""


def events_state_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 interval build: collapse each user's consecutive same-type
    event runs into [valid_from, valid_to) validity intervals.

    lag-change flag → running-sum island id → per-island aggregate →
    lead(valid_from) for the exclusive upper bound. Every stage partitions
    by user_id, so the whole history build is ONE hash exchange
    regardless of how long the per-user timelines grow."""
    return state_intervals(_t(spark, sf_dir, "events"))


def state_intervals(events: DataFrame) -> DataFrame:
    """Interval collapse over a (user_id, ts, event_id, event_type) frame
    — factored so tests can plant known run timelines."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    run = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    nxt = Window.partitionBy("user_id").orderBy("seq_no")
    prev_type = F.lag("event_type").over(w)
    chg = F.when(prev_type == F.col("event_type"), F.lit(0)).otherwise(F.lit(1))
    return (
        events
        .select("user_id", "ts", "event_id", "event_type")
        .withColumn("chg", chg)
        .withColumn("seq_no", F.sum("chg").over(run).cast("long"))
        .groupBy("user_id", "seq_no", F.col("event_type").alias("state"))
        .agg(
            F.min("ts").alias("valid_from"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .select(
            "user_id",
            "state",
            "seq_no",
            "valid_from",
            F.lead("valid_from").over(nxt).alias("valid_to"),
            "n_events",
            F.lead("valid_from").over(nxt).isNull().alias("is_current"),
        )
        .orderBy("user_id", "seq_no")
    )


_ORACLE_INTERVALS = """
WITH seq AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(event_type) OVER w = event_type THEN 0 ELSE 1 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
isl AS (
  SELECT user_id, ts, event_type,
         CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seq_no
  FROM seq
),
grp AS (
  SELECT user_id, seq_no, event_type AS state,
         min(ts) AS valid_from, CAST(count(*) AS BIGINT) AS n_events
  FROM isl GROUP BY user_id, seq_no, event_type
)
SELECT user_id, state, seq_no, valid_from,
       lead(valid_from) OVER w2 AS valid_to,
       n_events,
       lead(valid_from) OVER w2 IS NULL AS is_current
FROM grp
WINDOW w2 AS (PARTITION BY user_id ORDER BY seq_no)
ORDER BY user_id, seq_no
"""


PCTS = (0.5, 0.9, 0.99)


def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles of order value per priority class.

    percentile_disc picks the smallest group element whose cume_dist
    reaches the fraction — a value PASSTHROUGH, no interpolation, so the
    doubles hash identically in both engines."""
    pct_aggs = [
        F.expr(
            f"percentile_disc({p}) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias(f"p{int(p * 100)}")
        for p in PCTS
    ]
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            *pct_aggs,
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .orderBy("o_orderpriority")
    )


_ORACLE_PDISC = f"""
SELECT o_orderpriority,
       {", ".join(
           f"percentile_disc({p}) WITHIN GROUP (ORDER BY o_totalprice)"
           f" AS p{int(p * 100)}" for p in PCTS
       )},
       count(*) AS n_orders,
       min(o_totalprice) AS min_price,
       max(o_totalprice) AS max_price
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def orders_open_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line backlog: how many orders are OPEN (placed, not yet fully
    shipped) on each day — the interval-concurrency operator behind
    backlog, inventory, and connection-count analytics.

    Device: intervals become +1/−1 DELTAS (+1 at o_orderdate, −1 the day
    after the order's last l_shipdate), deltas aggregate per day (the only
    fact-sized exchange, map-side combined), and a running sum over the
    CALENDAR-sized daily frame yields the concurrent count. No interval
    self-join, no per-day interval stabbing — at 100 TB the window input
    is still |distinct days|. The running sum is an unpartitioned window
    by design: its input is calendar-bounded, the same documented posture
    as the RFM/concentration dimension sorts."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    closes = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("last_ship"))
    )
    spans = orders.join(
        closes, F.col("o_orderkey") == F.col("l_orderkey"), "inner"
    )
    # the synthetic generator draws ship dates independently of order
    # dates (291/1473 orders at sf0.001 "ship" first), so the close is
    # clamped to the open day: an order is open at least on the day it
    # was placed — the invariant the sweep-line identity needs
    spans = spans.select(
        F.date_trunc("day", "o_orderdate").alias("open_day"),
        F.greatest(
            F.date_trunc("day", "o_orderdate"),
            F.date_trunc("day", "last_ship"),
        ).alias("close_day"),
    )
    opens = spans.select(
        F.col("open_day").alias("day"), F.lit(1).cast("long").alias("delta")
    )
    shuts = spans.select(
        (F.col("close_day") + F.expr("INTERVAL 1 DAY")).alias("day"),
        F.lit(-1).cast("long").alias("delta"),
    )
    daily = (
        opens.unionAll(shuts)
        .groupBy("day")
        .agg(F.sum("delta").cast("long").alias("net_change"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day",
        "net_change",
        F.sum("net_change").over(w).cast("long").alias("open_orders"),
    ).orderBy("day")


_ORACLE_BACKLOG = """
WITH closes AS (
  SELECT l_orderkey, max(l_shipdate) AS last_ship
  FROM lineitem GROUP BY l_orderkey
),
spans AS (
  SELECT o.o_orderdate, c.last_ship
  FROM orders o JOIN closes c ON c.l_orderkey = o.o_orderkey
),
clamped AS (
  SELECT date_trunc('day', o_orderdate) AS open_day,
         greatest(date_trunc('day', o_orderdate),
                  date_trunc('day', last_ship)) AS close_day
  FROM spans
),
deltas AS (
  SELECT open_day AS day, CAST(1 AS BIGINT) AS delta FROM clamped
  UNION ALL
  SELECT close_day + INTERVAL 1 DAY, CAST(-1 AS BIGINT) FROM clamped
),
daily AS (
  SELECT day, CAST(sum(delta) AS BIGINT) AS net_change
  FROM deltas GROUP BY day
)
SELECT day, net_change,
       CAST(sum(net_change) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS open_orders
FROM daily
ORDER BY day
"""


# ---------------------------------------------------------------------------
# events_session_overlap — interval-overlap SELF-JOIN via bucket decomposition
# ---------------------------------------------------------------------------

# 1-hour decomposition buckets. Knob sizing: bucket ≈ median interval
# length keeps the per-interval fan-out at ~2 rows while bounding each
# join partition to the intervals ACTIVE in that hour — the two failure
# modes (giant fan-out from tiny buckets, one mega-partition from huge
# buckets) are both visible in the explode count × bucket occupancy
# product, which this value minimizes for the session length profile.
OVERLAP_BUCKET_US = 3_600 * 1_000_000


def events_session_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join: for every user session that is
    concurrent with at least one OTHER user's session, the number of
    overlapping sessions, total overlap time, and the longest single
    overlap — the cross-user concurrency report.

    Spark has no native interval-overlap join (a raw θ-join degenerates to
    a broadcast-nested-loop); the scale formulation is BUCKET
    DECOMPOSITION: each interval explodes onto the 1-hour buckets it
    covers, candidates equi-join on the bucket (a hash shuffle whose
    partitions hold only the intervals ACTIVE that hour), and the pair is
    kept exactly once — in the bucket containing the overlap's START
    (bucket == floor(greatest(s_a, s_b) / B)) — so no distinct pass is
    ever needed on the pair stream. The oracle is the plain θ overlap
    join, which proves the decomposition semantics-preserving. All overlap
    arithmetic is integer microseconds (closed intervals, s <= e' ∧
    s' <= e); per-pair rows fan back to both endpoints before the final
    session-keyed aggregate."""
    from opencode_hive_archon_spark.operators.relational import (
        events_sessionize,
    )
    from opencode_hive_archon_spark.session import materialize as _materialize

    B = OVERLAP_BUCKET_US
    # materialized: the self-join would otherwise recompute the whole
    # sessionize window cascade once per side
    sess = _materialize(
        events_sessionize(spark, sf_dir).select(
            "user_id", "session_seq", "start_us", "end_us"
        )
    )
    bucketed = sess.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.expr(f"start_us div {B}"), F.expr(f"end_us div {B}")
            )
        ),
    )
    a = bucketed.select(
        F.col("user_id").alias("user_a"), F.col("session_seq").alias("seq_a"),
        F.col("start_us").alias("s_a"), F.col("end_us").alias("e_a"),
        "bucket",
    )
    b = bucketed.select(
        F.col("user_id").alias("user_b"), F.col("session_seq").alias("seq_b"),
        F.col("start_us").alias("s_b"), F.col("end_us").alias("e_b"),
        "bucket",
    )
    pairs = a.join(b, "bucket").filter(
        (F.col("user_a") < F.col("user_b"))
        & (F.col("s_a") <= F.col("e_b"))
        & (F.col("s_b") <= F.col("e_a"))
        & (
            F.col("bucket")
            == F.expr(f"greatest(s_a, s_b) div {B}")
        )
    )
    ov = (
        F.least(F.col("e_a"), F.col("e_b"))
        - F.greatest(F.col("s_a"), F.col("s_b"))
    ).alias("ov_us")
    both = pairs.select(
        F.col("user_a").alias("user_id"), F.col("seq_a").alias("session_seq"), ov
    ).unionByName(
        pairs.select(
            F.col("user_b").alias("user_id"), F.col("seq_b").alias("session_seq"), ov
        )
    )
    return (
        both.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_concurrent"),
            F.sum("ov_us").alias("overlap_us"),
            F.max("ov_us").alias("max_overlap_us"),
        )
        .orderBy("user_id", "session_seq")
    )


# Oracle: the PLAIN θ overlap join — demonstrating the bucket decomposition
# is exactly equivalent (sessions CTE text identical to _ORACLE_SESSIONIZE's
# prefix in relational.py).
_ORACLE_SESSION_OVERLAP = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
),
flagged AS (
  SELECT *,
         CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)
),
sess AS (
  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY us ASC,
            event_id ASC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM flagged
),
s AS (
  SELECT user_id, session_seq, min(us) AS start_us, max(us) AS end_us
  FROM sess GROUP BY 1, 2
),
pairs AS (
  SELECT a.user_id AS user_a, a.session_seq AS seq_a,
         b.user_id AS user_b, b.session_seq AS seq_b,
         least(a.end_us, b.end_us) - greatest(a.start_us, b.start_us) AS ov_us
  FROM s a JOIN s b
    ON a.user_id < b.user_id
   AND a.start_us <= b.end_us AND b.start_us <= a.end_us
),
endpoints AS (
  SELECT user_a AS user_id, seq_a AS session_seq, ov_us FROM pairs
  UNION ALL
  SELECT user_b, seq_b, ov_us FROM pairs
)
SELECT user_id, session_seq,
       count(*) AS n_concurrent,
       CAST(sum(ov_us) AS BIGINT) AS overlap_us,
       max(ov_us) AS max_overlap_us
FROM endpoints GROUP BY 1, 2
ORDER BY user_id, session_seq
"""


# ---------------------------------------------------------------------------
# events_time_weighted_avg — LOCF time-weighted average per series
# ---------------------------------------------------------------------------

def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of ``value`` per event_type — the hypertable
    ``time_weight`` aggregate with LOCF weighting: each observation holds
    until the next one, so its weight is the microsecond gap to its
    successor (the final observation carries no weight; documented
    TimescaleDB semantics for a right-open series).

    Exactness: values are exact 2-decimal → integer CENTS; each segment
    contributes cents × dt_µs through DECIMAL(18,0)×DECIMAL(18,0)
    products summed in DECIMAL (associative, order-free), and the ONLY
    float ops are the final cast-divide-divide — identical IEEE steps on
    both engines. Plan: one event_type exchange shared by the lead()
    window and the aggregate."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros(F.col("ts")).alias("us"),
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("us").asc(), F.col("event_id").asc()
    )
    seg = ev.withColumn("dt_us", F.lead("us").over(w) - F.col("us")).where(
        F.col("dt_us").isNotNull()
    )
    wsum = F.sum(
        F.col("cents").cast("decimal(18,0)")
        * F.col("dt_us").cast("decimal(18,0)")
    )
    return (
        seg.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum("dt_us").alias("span_us"),
            (
                wsum.cast("double")
                / F.sum("dt_us").cast("double")
                / F.lit(100.0)
            ).alias("twa"),
        )
        .orderBy("event_type")
    )


_ORACLE_TWA = """
WITH e AS (
  SELECT event_type, epoch_us(ts) AS us, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
seg AS (
  SELECT event_type, cents,
         lead(us) OVER (PARTITION BY event_type
                        ORDER BY us ASC, event_id ASC) - us AS dt_us
  FROM e
)
SELECT event_type,
       count(*) AS n_segments,
       CAST(sum(dt_us) AS BIGINT) AS span_us,
       CAST(sum(CAST(cents AS DECIMAL(18,0)) * CAST(dt_us AS DECIMAL(18,0)))
            AS DOUBLE)
         / CAST(sum(dt_us) AS DOUBLE) / 100.0 AS twa
FROM seg
WHERE dt_us IS NOT NULL
GROUP BY event_type
ORDER BY event_type
"""


SPECS = [
    QuerySpec(
        "events_time_weighted_avg", events_time_weighted_avg, _ORACLE_TWA,
        "relational",
        "hypertable time_weight: LOCF time-weighted average per series — "
        "integer cents x microsecond gaps through DECIMAL products, one "
        "event_type exchange shared by lead() and the aggregate"),
    QuerySpec(
        "events_session_overlap", events_session_overlap,
        _ORACLE_SESSION_OVERLAP, "relational",
        "interval-overlap self-join via 1-hour bucket decomposition with "
        "exactly-once start-bucket pairing (no distinct pass); oracle is "
        "the plain theta overlap join — cross-user session concurrency"),
    QuerySpec(
        "orders_open_backlog", orders_open_backlog, _ORACLE_BACKLOG,
        "relational",
        "sweep-line interval concurrency: orders open per day via +1/-1 "
        "deltas aggregated daily (one fact exchange) + a calendar-sized "
        "running sum — no interval self-join ever forms"),
    QuerySpec(
        "events_ohlc_bars", events_ohlc_bars, _ORACLE_OHLC, "relational",
        "hypertable continuous aggregate: hourly OHLC bars per event_type, "
        "first/last via two row_number windows in one (type, bucket) "
        "exchange — every cell a value passthrough, oracle-exact"),
    QuerySpec(
        "events_gapfill_locf", events_gapfill_locf, _ORACLE_GAPFILL,
        "relational",
        "time_bucket_gapfill + LOCF: per-series dense hourly grid "
        "(calendar-sized sequence explode), counts 0-filled, hourly max "
        "carried forward with an ignoreNulls window"),
    QuerySpec(
        "events_state_intervals", events_state_intervals, _ORACLE_INTERVALS,
        "relational",
        "SCD-2 interval build: per-user consecutive-run collapse to "
        "[valid_from, valid_to) with is_current, one user_id exchange for "
        "the whole lag->island->aggregate->lead cascade"),
    QuerySpec(
        "agg_percentile_disc", agg_percentile_disc, _ORACLE_PDISC,
        "relational",
        "exact ordered-set aggregate: percentile_disc(0.5/0.9/0.99) "
        "WITHIN GROUP per order priority — element passthrough, no "
        "interpolation arithmetic; approx_percentile is the 100 TB swap"),
]
