"""Deterministic sketch + binning aggregates (round 9).

``agg_countmin_sketch``
    A Count-Min sketch built and probed entirely as DataFrame algebra,
    ORACLE-EXACT because the hash functions are the engine's canonical
    md5-prefix device (functions/hashing.py) — deterministic, so DuckDB
    rebuilds the identical sketch cell-for-cell. The construction follows
    the scale rule the heavy-hitter family established
    (operators/sampling.py): the depth-d explode multiplies the KEY
    DIMENSION, never the fact rows — facts are first collapsed to exact
    per-key counts (one map-side-combined exchange), and the d hash rows
    fan out over that vocabulary-sized frame. The sketch itself is
    d × w = 1024 cells, broadcast to the probes. The report checks the
    CMS guarantee (estimate ≥ true) per probe key and surfaces the
    overestimate, turning the sketch's accuracy into driver evidence the
    same way the quality family gates HLL/GK.

``agg_histogram``
    Fixed-width histogram of order totals per priority class with
    INTEGER-EXACT bin assignment: prices are first lifted to exact cents
    (round(x·100) — o_totalprice carries 2 decimals), bins come from
    integer division, and the bin edges are reported back in cents, so no
    float boundary ever decides a bucket. The classic width_bucket
    operator without width_bucket's float-edge hazard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opencode_hive_archon_spark.functions.hashing import (
    md5_prefix_long,
    md5_prefix_long_sql,
)
from opencode_hive_archon_spark.session import read_table as _t
from opencode_hive_archon_spark.spec import QuerySpec

__all__ = ["agg_countmin_sketch", "agg_histogram", "SPECS"]

CMS_DEPTH = 4
CMS_WIDTH = 256
CMS_PROBES = 10


def _cms_bucket(depth_col, key_col) -> "F.Column":
    """Row ``depth``'s hash of ``key``: md5-prefix of 'cms<d>:<key>' mod
    width — the canonical cross-engine device, one salt per depth."""
    payload = F.concat(
        F.lit("cms"), depth_col.cast("string"), F.lit(":"), key_col.cast("string")
    )
    return (md5_prefix_long(payload, 8) % CMS_WIDTH).cast("long")


def agg_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency estimates for the ten heaviest suppliers in
    lineitem, with the exact counts beside them.

    Stages: exact per-key counts (the only fact-sized exchange) → d-way
    explode over the KEY dimension → (depth, bucket) sum = the sketch →
    top-10 probes re-hashed and joined against the broadcast 1024-cell
    sketch → min over depths. ``cms_ok`` asserts the one-sided CMS
    guarantee estimate ≥ true; ``overestimate`` is the collision mass."""
    per_key = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("true_count"))
    )
    depths = F.explode(
        F.array(*[F.lit(d) for d in range(CMS_DEPTH)])
    ).alias("depth")
    hashed = per_key.select("l_suppkey", "true_count", depths).select(
        "l_suppkey",
        "true_count",
        "depth",
        _cms_bucket(F.col("depth"), F.col("l_suppkey")).alias("bucket"),
    )
    sketch = hashed.groupBy("depth", "bucket").agg(
        F.sum("true_count").cast("long").alias("cell_count")
    )
    probes = (
        per_key.orderBy(F.col("true_count").desc(), F.col("l_suppkey").asc())
        .limit(CMS_PROBES)
        .select("l_suppkey", "true_count", depths)
        .select(
            "l_suppkey",
            "true_count",
            "depth",
            _cms_bucket(F.col("depth"), F.col("l_suppkey")).alias("bucket"),
        )
    )
    return (
        probes.join(F.broadcast(sketch), ["depth", "bucket"])
        .groupBy("l_suppkey", "true_count")
        .agg(F.min("cell_count").cast("long").alias("cms_estimate"))
        .select(
            "l_suppkey",
            "true_count",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("true_count")).alias("overestimate"),
            (F.col("cms_estimate") >= F.col("true_count")).alias("cms_ok"),
        )
        .orderBy(F.col("true_count").desc(), F.col("l_suppkey").asc())
    )


def _cms_bucket_sql(depth_expr: str, key_expr: str) -> str:
    return (
        md5_prefix_long_sql(
            f"'cms' || CAST({depth_expr} AS VARCHAR) || ':' || "
            f"CAST({key_expr} AS VARCHAR)",
            8,
        )
        + f" % {CMS_WIDTH}"
    )


_ORACLE_CMS = f"""
WITH per_key AS (
  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS true_count
  FROM lineitem GROUP BY l_suppkey
),
hashed AS (
  SELECT l_suppkey, true_count, d.depth,
         CAST({_cms_bucket_sql("d.depth", "l_suppkey")} AS BIGINT) AS bucket
  FROM per_key, (SELECT unnest(range({CMS_DEPTH})) AS depth) d
),
sketch AS (
  SELECT depth, bucket, CAST(sum(true_count) AS BIGINT) AS cell_count
  FROM hashed GROUP BY depth, bucket
),
probes AS (
  SELECT l_suppkey, true_count FROM per_key
  ORDER BY true_count DESC, l_suppkey ASC LIMIT {CMS_PROBES}
),
probe_cells AS (
  SELECT p.l_suppkey, p.true_count, d.depth,
         CAST({_cms_bucket_sql("d.depth", "p.l_suppkey")} AS BIGINT) AS bucket
  FROM probes p, (SELECT unnest(range({CMS_DEPTH})) AS depth) d
),
est AS (
  SELECT pc.l_suppkey, pc.true_count,
         CAST(min(s.cell_count) AS BIGINT) AS cms_estimate
  FROM probe_cells pc
  JOIN sketch s ON s.depth = pc.depth AND s.bucket = pc.bucket
  GROUP BY pc.l_suppkey, pc.true_count
)
SELECT l_suppkey, true_count, cms_estimate,
       cms_estimate - true_count AS overestimate,
       cms_estimate >= true_count AS cms_ok
FROM est
ORDER BY true_count DESC, l_suppkey ASC
"""


HIST_BIN_CENTS = 50_000_00  # 50k-currency-unit bins over exact cents
HIST_MAX_BIN = 9            # bins 0..8 plus a clamp bin for the tail


def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width order-value histogram per priority class.

    Prices lift to exact cents (round(x·100) — both engines round the
    same 2-decimal doubles to the same integers), bins are integer
    division by ``HIST_BIN_CENTS`` clamped to ``HIST_MAX_BIN``, and the
    reported edges are integers — no float ever decides a boundary.
    One partial-agged exchange on (priority, bin)."""
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    bin_id = F.least(
        F.floor(cents / HIST_BIN_CENTS).cast("long"), F.lit(HIST_MAX_BIN)
    )
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderpriority", bin_id.alias("bin_id"))
        .groupBy("o_orderpriority", "bin_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .select(
            "o_orderpriority",
            "bin_id",
            (F.col("bin_id") * HIST_BIN_CENTS).alias("bin_lo_cents"),
            F.when(F.col("bin_id") < HIST_MAX_BIN,
                   (F.col("bin_id") + 1) * HIST_BIN_CENTS)
            .alias("bin_hi_cents"),
            "n_orders",
        )
        .orderBy("o_orderpriority", "bin_id")
    )


_ORACLE_HIST = f"""
WITH binned AS (
  SELECT o_orderpriority,
         least(CAST(round(o_totalprice * 100) AS BIGINT)
                 // {HIST_BIN_CENTS}, {HIST_MAX_BIN}) AS bin_id
  FROM orders
)
SELECT o_orderpriority, bin_id,
       bin_id * {HIST_BIN_CENTS} AS bin_lo_cents,
       CASE WHEN bin_id < {HIST_MAX_BIN}
            THEN (bin_id + 1) * {HIST_BIN_CENTS} END AS bin_hi_cents,
       CAST(count(*) AS BIGINT) AS n_orders
FROM binned
GROUP BY o_orderpriority, bin_id
ORDER BY o_orderpriority, bin_id
"""


KMV_K = 64
KMV_HEX = 6                     # hash space M = 16^6; keeps every ok-band
KMV_M = 16 ** KMV_HEX           # product in int64 at sandbox cardinalities


def agg_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch per event_type, ORACLE-EXACT
    because the hash is the canonical md5 device: both engines keep the
    same k smallest hashes and compute the same single division
    est = (k−1)·M / h_k.

    The ok-band check is MULTIPLIED OUT to integers — est within
    [0.7, 1.3]·exact iff 7·h_k·exact ≤ (k−1)·M·10 ≤ 13·h_k·exact — so no
    float enters the verdict. Groups with fewer than k distinct hashes
    fall back to the observed hash count (exact up to hash collisions).
    Unlike HLL (agg_approx_distinct, rows-only), KMV's determinism makes
    the whole sketch driver-hashable; it is also MERGEABLE (union = k
    smallest of the union), which is what a 100 TB rollup needs. Scale
    note: the per-type k-th-smallest uses a row_number window over the
    DEDUPED hash frame — dedup-bounded input; the partial-agg swap at
    extreme cardinality is slice(sort_array(...), 1, k) per partition
    then re-merge, same algebra."""
    return kmv_report(_t(spark, sf_dir, "events"))


def kmv_report(ev: DataFrame) -> DataFrame:
    """KMV sketch over an (event_type, user_id) frame — factored so tests
    can plant corpora exercising both estimator branches."""
    from pyspark.sql import Window

    hashes = (
        ev.select("event_type", "user_id")
        .distinct()
        .select(
            "event_type",
            md5_prefix_long(
                F.concat(F.lit("kmv:"), F.col("user_id").cast("string")),
                KMV_HEX,
            ).alias("h"),
        )
        .distinct()
    )
    w = Window.partitionBy("event_type").orderBy(F.col("h").asc())
    kth = (
        hashes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == KMV_K)
        .select("event_type", F.col("h").alias("kth_hash"))
    )
    n_hashes = hashes.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_hashes")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct")
    )
    numer = F.lit((KMV_K - 1) * KMV_M).cast("long")
    est = F.when(
        F.col("kth_hash").isNotNull(),
        numer.cast("double") / F.col("kth_hash"),
    ).otherwise(F.col("n_hashes").cast("double"))
    ok = F.when(
        F.col("kth_hash").isNotNull(),
        (F.lit(7) * F.col("kth_hash") * F.col("exact_distinct") <= numer * 10)
        & (numer * 10 <= F.lit(13) * F.col("kth_hash") * F.col("exact_distinct")),
    ).otherwise(
        F.lit(10) * (F.col("exact_distinct") - F.col("n_hashes"))
        <= F.col("exact_distinct")
    )
    return (
        exact.join(n_hashes, "event_type")
        .join(kth, "event_type", "left")
        .select(
            "event_type",
            "exact_distinct",
            "n_hashes",
            "kth_hash",
            est.alias("kmv_estimate"),
            ok.alias("kmv_ok"),
        )
        .orderBy("event_type")
    )


_ORACLE_KMV = f"""
WITH hashes AS (
  SELECT DISTINCT event_type,
         {md5_prefix_long_sql("'kmv:' || CAST(user_id AS VARCHAR)", KMV_HEX)} AS h
  FROM (SELECT DISTINCT event_type, user_id FROM events)
),
kth AS (
  SELECT event_type, h AS kth_hash FROM (
    SELECT event_type, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h ASC) AS rn
    FROM hashes
  ) WHERE rn = {KMV_K}
),
nh AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_hashes
  FROM hashes GROUP BY event_type
),
ex AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
  FROM events GROUP BY event_type
)
SELECT ex.event_type, ex.exact_distinct, nh.n_hashes, kth.kth_hash,
       CASE WHEN kth.kth_hash IS NOT NULL
            THEN CAST({(KMV_K - 1) * KMV_M} AS DOUBLE) / kth.kth_hash
            ELSE CAST(nh.n_hashes AS DOUBLE) END AS kmv_estimate,
       CASE WHEN kth.kth_hash IS NOT NULL
            THEN 7 * kth.kth_hash * ex.exact_distinct
                   <= {(KMV_K - 1) * KMV_M * 10}
                 AND {(KMV_K - 1) * KMV_M * 10}
                   <= 13 * kth.kth_hash * ex.exact_distinct
            ELSE 10 * (ex.exact_distinct - nh.n_hashes) <= ex.exact_distinct
       END AS kmv_ok
FROM ex
JOIN nh ON nh.event_type = ex.event_type
LEFT JOIN kth ON kth.event_type = ex.event_type
ORDER BY ex.event_type
"""


SPECS = [
    QuerySpec(
        "agg_kmv_distinct", agg_kmv_distinct, _ORACLE_KMV, "relational",
        "K-minimum-values distinct sketch per event_type, oracle-exact "
        "via the md5 device: k smallest deduped hashes, one double "
        "division estimator, integer-exact 0.7-1.3x ok band, mergeable "
        "(union = k smallest of the union) unlike rows-only HLL"),
    QuerySpec(
        "agg_countmin_sketch", agg_countmin_sketch, _ORACLE_CMS, "relational",
        "Count-Min sketch as DataFrame algebra, oracle-exact via the md5 "
        "hash device: depth explode over the key DIMENSION (never fact "
        "rows), 1024-cell broadcast sketch, top-10 probes with the "
        "estimate>=true guarantee surfaced"),
    QuerySpec(
        "agg_histogram", agg_histogram, _ORACLE_HIST, "relational",
        "fixed-width order-value histogram per priority: exact-cents "
        "lift, integer-division bins with a clamp bin, integer edges — "
        "width_bucket without float boundaries"),
]
