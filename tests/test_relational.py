"""Family 2 tests: semantics spot-checks + plan-shape assertions.

Correctness vs the DuckDB oracle is covered by tools/check.py (the t2
mimic); these tests pin semantics on tiny data and assert the PHYSICAL plan
properties that matter at scale (pushdown, broadcast, TakeOrderedAndProject).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opencode_hive_archon_spark.operators import relational as R


def plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_filter_pushdown(spark, sf_dir):
    df = R.scan_project_filter(spark, sf_dir)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    # Filter must reach the parquet scan, and only needed columns read.
    assert "PushedFilters" in plan(df) or "l_shipdate" in optimized
    scan = plan(df)
    assert "l_extendedprice" in scan
    assert "l_tax" not in scan  # pruned: not referenced by this query


def test_join_broadcast_goes_broadcast(spark, sf_dir):
    assert "BroadcastHashJoin" in plan(R.join_broadcast(spark, sf_dir))


def test_sort_limit_is_take_ordered(spark, sf_dir):
    assert "TakeOrderedAndProject" in plan(R.sort_multi_limit(spark, sf_dir))


def test_semi_anti_partition(spark, sf_dir):
    rows = R.join_semi_anti(spark, sf_dir).collect()
    cust_total = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert sum(r["n_customers"] for r in rows) == cust_total


def test_outer_coalesce_no_nulls(spark, sf_dir):
    df = R.join_outer_coalesce(spark, sf_dir)
    assert df.filter(F.col("total_spent").isNull() | F.col("n_orders").isNull()).count() == 0


def test_asof_click_precedes_purchase(spark, sf_dir):
    rows = R.join_asof_event_order(spark, sf_dir).collect()
    assert rows, "expected purchase events"
    for r in rows:
        if r["last_click_ts"] is not None:
            assert r["last_click_ts"] <= r["purchase_ts"]
            assert r["secs_since_click"] >= 0


def test_rollup_grand_total(spark, sf_dir):
    rows = R.rollup_orders(spark, sf_dir).collect()
    grand = [r for r in rows if r["o_orderpriority"] is None and r["o_orderstatus"] is None]
    assert len(grand) == 1
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert grand[0]["n_orders"] == n_orders


def test_window_running_monotone(spark, sf_dir):
    rows = R.window_running(spark, sf_dir).orderBy("day").collect()
    totals = [r["running_total"] for r in rows]
    assert totals == sorted(totals)  # order totals are positive
    assert rows[0]["delta"] is None


def test_moving_avg_bounds(spark, sf_dir):
    rows = R.window_moving_avg(spark, sf_dir).collect()
    lo = min(r["day_value"] for r in rows)
    hi = max(r["day_value"] for r in rows)
    assert all(lo <= r["ma7"] <= hi for r in rows)


def test_set_ops_arithmetic(spark, sf_dir):
    got = {r["set_op"]: r["n_keys"] for r in R.set_ops(spark, sf_dir).collect()}
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n_even = cust.filter(F.col("c_custkey") % 2 == 0).count()
    n_third = cust.filter(F.col("c_custkey") % 3 == 0).count()
    n_sixth = cust.filter(F.col("c_custkey") % 6 == 0).count()
    assert got["union_all"] == n_even + n_third
    assert got["intersect"] == n_sixth
    assert got["except"] == n_even - n_sixth


def test_approx_distinct_within_tolerance(spark, sf_dir):
    row = R.agg_approx_distinct(spark, sf_dir).first()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = li.select("l_partkey").distinct().count()
    assert row["approx_parts"] == pytest.approx(exact, rel=0.1)


def test_skew_salted_equals_plain_groupby(spark, sf_dir):
    from opencode_hive_archon_spark.operators.skew import agg_skew_salted

    got = {r["l_returnflag"]: (r["n_rows"], r["total_price"]) for r in
           agg_skew_salted(spark, sf_dir).collect()}
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plain = {
        r["l_returnflag"]: (r["n"], float(r["s"]))
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("s"),
        )
        .collect()
    }
    assert got == plain


def test_asof_strategies_agree(spark, sf_dir):
    """Window formulation and applyInPandas merge_asof must be row-identical."""
    a = {tuple(r) for r in R.join_asof_event_order(spark, sf_dir).collect()}
    b = {tuple(r) for r in R.join_asof_pandas(spark, sf_dir).collect()}
    assert a == b
