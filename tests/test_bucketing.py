"""Bucketed-table co-located join: the shuffle-free fact-fact join path.

At 100 TB the orders ⋈ lineitem join is the dominant shuffle; bucketing
both tables on the join key at write time makes the join a zipped local
join — no Exchange on either side. This test materializes bucketed tables
in a temp warehouse and asserts the plan property.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("warehouse")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    for name, df, key in (("orders_b", orders, "o_orderkey"), ("lineitem_b", li, "l_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .option("path", str(warehouse / name))
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    yield
    for name in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    joined = (
        spark.table("lineitem_b")
        .join(spark.table("orders_b"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    join_section = plan.split("Join")[1] if "Join" in plan else plan
    # neither join input may re-shuffle: bucketing provides the distribution
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert joined.count() > 0


def test_bucketed_matches_unbucketed(spark, sf_dir, bucketed):
    bucketed_rows = {
        r["o_orderstatus"]: r["n"]
        for r in (
            spark.table("lineitem_b")
            .join(spark.table("orders_b"), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    }
    plain = {
        r["o_orderstatus"]: r["n"]
        for r in (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .join(
                spark.read.parquet(f"{sf_dir}/orders.parquet"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    }
    assert bucketed_rows == plain


def test_sf_suffix_distinguishes_same_basename_dirs():
    """Two sf_dirs with the same basename (/a/sf0.1 vs /b/sf0.1) must map to
    DIFFERENT bucketed table names — the suffix carries a digest of the full
    path, so the session ready-set can never serve the other dir's layout."""
    from opencode_hive_archon_spark.sources.bucketed import _sf_suffix

    a = _sf_suffix("/a/sf0.1")
    b = _sf_suffix("/b/sf0.1")
    assert a != b
    assert a.startswith("sf0_1_") and b.startswith("sf0_1_")
    # stable across calls and trailing-slash normalization
    assert _sf_suffix("/a/sf0.1/") == a
