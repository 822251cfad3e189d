"""Bucketed-table layout: the shuffle-free fact⋈fact join path.

At 100 TB the orders ⋈ lineitem join is the dominant shuffle in every
TPC-H-shaped workload. Writing BOTH fact tables bucketed (and sorted) on the
join key — ``bucketBy(N, key).sortBy(key).saveAsTable`` — trades one
write-time shuffle for ZERO join-time shuffles forever after: the bucketed
scans report ``HashPartitioning(key, N)``, the sort-merge join's distribution
requirement is already satisfied on both sides, and a follow-up aggregate
keyed on (a superset of) the bucket key rides the same partitioning too. The
executed plan for ``source_bucketed_join`` therefore contains NO Exchange
between the scans and the aggregate — pinned by
tests/test_plan_shapes.py::test_bucketed_join_query_plan_is_shuffle_free.

This is the layout the repo's other scale notes point at ("write the edge
table out bucketed by src once" — operators/graph.py; dedup docstrings): the
one-off bucketed write is the cluster-side materialization step, and every
downstream consumer joins co-located.

Reference parity: the reference has no table layout management at all (its
backend holds ≤5 rows in process); this family is part of the §2B engine
inventory the mandate adds on top.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opencode_hive_archon_spark.session import read_table
from opencode_hive_archon_spark.sources.catalog import (
    CATALOG_DB,
    _clear_orphan_location,
)
from opencode_hive_archon_spark.spec import QuerySpec

N_BUCKETS = 16
TOP_ORDERS = 10

_FACTS = (
    ("orders_bucketed", "orders", "o_orderkey"),
    ("lineitem_bucketed", "lineitem", "l_orderkey"),
)

# (applicationId, sf_dir) pairs whose bucketed fact tables are already
# written this session — the layout step runs once, queries run many times.
_BUCKETED_READY: set[tuple[str, str]] = set()


def _sf_suffix(sf_dir: str) -> str:
    """Table-name suffix derived from the sf dir, so tables from different
    scale factors never collide: a session that alternates sf_dirs must get
    each dir's OWN layout, not a cached name pointing at the other's data.

    The suffix carries a digest of the FULL normalized path, not just the
    basename — two dirs with the same basename (/a/sf0.1 vs /b/sf0.1) would
    otherwise map to the same table names while the ready-set is keyed on the
    full path, letting one dir silently read the other's layout."""
    norm = os.path.abspath(sf_dir.rstrip("/") or "/")
    base = os.path.basename(norm) or "default"
    safe = "".join(c if c.isalnum() else "_" for c in base)
    digest = hashlib.md5(norm.encode("utf-8")).hexdigest()[:8]
    return f"{safe}_{digest}"


def bucketed_table_names(sf_dir: str) -> dict[str, str]:
    """{source table -> fully-qualified bucketed table identifier}."""
    sfx = _sf_suffix(sf_dir)
    return {src: f"{CATALOG_DB}.{table}_{sfx}" for table, src, _ in _FACTS}


def ensure_bucketed_facts(spark: SparkSession, sf_dir: str) -> None:
    """Write orders+lineitem as managed parquet tables bucketed AND sorted on
    the join key (once per session+sf_dir; both sides use the same bucket
    count, which is what makes the join co-located). Table names carry the
    sf_dir suffix, so the session ready-set can never serve another scale
    factor's data.

    ``repartition(N, key)`` before the bucketed write keeps file counts
    bounded (one file per bucket per write task otherwise — at 1000 tasks x
    16 buckets that is 16k files of which most are tiny)."""
    cache_key = (spark.sparkContext.applicationId, sf_dir)
    if cache_key in _BUCKETED_READY:
        return
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {CATALOG_DB}")
    idents = bucketed_table_names(sf_dir)
    for table, src, key in _FACTS:
        ident = idents[src]
        spark.sql(f"DROP TABLE IF EXISTS {ident}")
        _clear_orphan_location(spark, ident.split(".", 1)[1])
        (
            read_table(spark, sf_dir, src)
            .repartition(N_BUCKETS, F.col(key))
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .saveAsTable(ident)
        )
    _BUCKETED_READY.add(cache_key)


def source_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top revenue orders off the BUCKETED layout, with a shuffle-free plan.

    lineitem_bucketed ⋈ orders_bucketed on the bucket key (sort-merge, pinned
    by hint so a size estimate can never silently demote the demonstration to
    a broadcast join), then a per-order aggregate whose grouping keys contain
    the bucket key — every stage up to the final top-k reuses the write-time
    partitioning, so the plan has no Exchange at all below the
    TakeOrderedAndProject. Revenue folds through DECIMAL(18,6) so the
    cross-row sum is order-insensitive (oracle-exact).
    """
    ensure_bucketed_facts(spark, sf_dir)
    idents = bucketed_table_names(sf_dir)
    li = spark.table(idents["lineitem"])
    orders = spark.table(idents["orders"])
    revenue = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        li.hint("merge")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(TOP_ORDERS)
    )


# The oracle states what the bucketed layout must still CONTAIN: the same
# per-order aggregate from the raw parquet (layout changes must never change
# query results).
_ORACLE_BUCKETED_JOIN = f"""
SELECT o_orderkey, o_orderdate, o_orderpriority,
       CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT {TOP_ORDERS}
"""


SPECS = [
    QuerySpec(
        "source_bucketed_join",
        source_bucketed_join,
        _ORACLE_BUCKETED_JOIN,
        "sources",
        "bucketBy+sortBy+saveAsTable layout, then a co-located sort-merge "
        "join + bucket-key aggregate with zero Exchanges (plan-pinned)",
    ),
]
