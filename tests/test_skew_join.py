"""AQE skew-join evidence: Spark's adaptive planner must split a skewed
partition of a sort-merge join at runtime (``skew=true`` in the final plan).

``agg_skew_salted`` already demonstrates the MANUAL mitigation (salting) for
skewed AGGREGATION; this test pins the AUTOMATIC mitigation for skewed
JOINS, which is what a 100 TB run leans on first: AQE observes the actual
shuffle-block sizes, recognizes a partition ≫ median, and splits it across
tasks without any query rewrite.

local[32] sizing: the default thresholds (256 MB skewed-partition floor)
never trigger at test scale, so the test lowers them — the DECISION LOGIC
being exercised (factor-over-median + absolute floor) is the same one that
fires at production sizes with default thresholds. Broadcast is disabled so
the join stays sort-merge (a broadcast join has no skew to split).
"""

from __future__ import annotations

from pyspark.sql import functions as F

SKEW_CONFS = {
    # keep the join a shuffle join: broadcast would dissolve the demo
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    # recognize "skewed" at local-test sizes (defaults: 5x median AND 256MB)
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    # skew-split must not be suppressed for introducing extra partitions
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
}


def test_aqe_splits_skewed_join_partition(spark):
    old = {k: spark.conf.get(k, None) for k in SKEW_CONFS}
    for k, v in SKEW_CONFS.items():
        spark.conf.set(k, v)
    try:
        # ~97% of the left side lands on key 0 — one shuffle partition
        # dwarfs the rest, the textbook hot-key join.
        left = spark.range(0, 100_000).select(
            F.when(F.col("id") % 33 == 0, F.col("id") % 50).otherwise(F.lit(0))
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(0, 50).select(
            F.col("id").alias("k"), F.col("id").cast("string").alias("dim")
        )
        joined = left.join(right.hint("merge"), "k")
        rows = joined.collect()  # AQE re-plans during execution
        assert len(rows) == 100_000
        final = joined._jdf.queryExecution().executedPlan().toString()
        # the skewed partition was split at runtime: the join is marked and
        # the shuffle read on the skewed side says so
        assert "SortMergeJoin(skew=true)" in final, final[:2000]
        assert "skewed" in final, final[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_join_shape(spark, sf_dir):
    """join_skew_salted must actually exercise the salted shuffle: no
    broadcast join, and the exchange keyed on the composite (flag, salt)
    pair — 48 balanced groups instead of 3 hot ones."""
    from opencode_hive_archon_spark.operators.skew import join_skew_salted

    df = join_skew_salted(spark, sf_dir)
    from tests.test_plan_shapes import plan

    p = plan(df)
    assert "BroadcastHashJoin" not in p, p[:1500]
    assert "ShuffledHashJoin" in p, p[:1500]
    # composite join key: both flag and salt participate in the exchange
    import re

    keys = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", p)
    assert any("salt" in k for k in keys), keys or p[:1500]
