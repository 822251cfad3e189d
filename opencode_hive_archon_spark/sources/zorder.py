"""Z-order (Morton-curve) clustering layout + data-skipping evidence.

The 100 TB problem this solves: a table sorted by ONE key gives parquet
min/max file skipping on that key only — a predicate on any other column
scans every file. Interleaving the bits of two keys into a Z-value and
sorting by it clusters the table in BOTH dimensions at once, so min/max
pruning works for either predicate (the technique behind
Delta/Iceberg `OPTIMIZE ... ZORDER BY`).

``source_zorder_layout`` computes the Z-value for orders over
(o_custkey, order-day), splits the table into N_GROUPS equal file-groups
under (a) the Z-order and (b) a plain date-sort baseline, and reports per
layout how many groups a custkey-range predicate and a date-range
predicate would each have to scan given per-group min/max statistics —
the exact computation a format's file-skipping planner performs. The
Z-layout scans FAR fewer groups for the non-sort-key predicate while
staying close to optimal for the date predicate; the baseline collapses
to a full scan on custkey. tests/test_sampling.py pins that inequality.

Everything is integer bit arithmetic (shiftright/&/×) — expressible
identically in Spark and DuckDB, so the whole report is oracle-exact.
Group assignment here uses ``ntile`` over the sort key for a deterministic
equal-height split; a production writer gets the same layout in parallel
via ``repartitionByRange(z).sortWithinPartitions(z)`` + one file per
partition (range exchange ≡ the ntile boundaries).

Reference parity: the reference has no storage layout control at all (its
store is an in-memory list, backend/src/second_brain/services/memory.py:
56-65); this operator belongs to the engine's beyond-reference scale
surface alongside sources/bucketed.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from opencode_hive_archon_spark.session import read_table as _t
from opencode_hive_archon_spark.spec import QuerySpec

ZBITS = 16           # bits kept per dimension (keys here fit comfortably)
N_GROUPS = 64        # simulated file-groups per layout
EPOCH = "1995-01-01"  # min(o_orderdate) in the driver data
CK_LO, CK_HI = 100, 199   # custkey-range probe predicate
DAY_LO, DAY_HI = 0, 89    # first-quarter date probe predicate


def _interleave(x: F.Column, y: F.Column) -> F.Column:
    """Morton interleave: bit i of x -> bit 2i, bit i of y -> bit 2i+1."""
    z = F.lit(0).cast("long")
    for i in range(ZBITS):
        z = z + F.shiftright(x, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
        z = z + F.shiftright(y, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
    return z


def _interleave_sql(x: str, y: str) -> str:
    terms = [f"(({x} >> {i}) & 1) * {1 << (2 * i)}" for i in range(ZBITS)]
    terms += [f"(({y} >> {i}) & 1) * {1 << (2 * i + 1)}" for i in range(ZBITS)]
    return " + ".join(terms)


def _layout_stats(keyed: DataFrame, order_col: str, layout: str) -> DataFrame:
    gid = F.ntile(N_GROUPS).over(Window.orderBy(order_col, "o_orderkey"))
    groups = (
        keyed.withColumn("gid", gid)
        .groupBy("gid")
        .agg(
            F.min("x").alias("xmin"), F.max("x").alias("xmax"),
            F.min("y").alias("ymin"), F.max("y").alias("ymax"),
        )
    )
    return groups.agg(
        F.lit(layout).alias("layout"),
        F.count(F.lit(1)).alias("groups_total"),
        F.sum(
            ((F.col("xmin") <= CK_HI) & (F.col("xmax") >= CK_LO)).cast("long")
        ).alias("scan_custkey_pred"),
        F.sum(
            ((F.col("ymin") <= DAY_HI) & (F.col("ymax") >= DAY_LO)).cast("long")
        ).alias("scan_date_pred"),
    )


def source_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min/max file-skipping simulation: Z-order vs single-key sort."""
    orders = _t(spark, sf_dir, "orders")
    x = F.col("o_custkey").bitwiseAND(F.lit((1 << ZBITS) - 1))
    y = (
        F.datediff(F.col("o_orderdate").cast("date"), F.lit(EPOCH).cast("date"))
        .cast("long")
        .bitwiseAND(F.lit((1 << ZBITS) - 1))
    )
    keyed = orders.select(
        "o_orderkey", x.alias("x"), y.alias("y")
    ).withColumn("z", _interleave(F.col("x"), F.col("y")))
    return (
        _layout_stats(keyed, "z", "zorder")
        .unionAll(_layout_stats(keyed, "y", "date_sort"))
        .orderBy("layout")
    )


_X_SQL = f"(o_custkey & {(1 << ZBITS) - 1})"
_Y_SQL = (
    f"(date_diff('day', DATE '{EPOCH}', CAST(o_orderdate AS DATE)) "
    f"& {(1 << ZBITS) - 1})"
)

_ORACLE_ZORDER = f"""
WITH keyed AS (
  SELECT o_orderkey, {_X_SQL} AS x, {_Y_SQL} AS y,
         {_interleave_sql(_X_SQL, _Y_SQL)} AS z
  FROM orders
),
assigned AS (
  SELECT x, y,
         ntile({N_GROUPS}) OVER (ORDER BY z, o_orderkey) AS gid_z,
         ntile({N_GROUPS}) OVER (ORDER BY y, o_orderkey) AS gid_y
  FROM keyed
),
zg AS (
  SELECT gid_z, min(x) xmin, max(x) xmax, min(y) ymin, max(y) ymax
  FROM assigned GROUP BY gid_z
),
yg AS (
  SELECT gid_y, min(x) xmin, max(x) xmax, min(y) ymin, max(y) ymax
  FROM assigned GROUP BY gid_y
),
stats AS (
  SELECT 'zorder' AS layout, count(*) AS groups_total,
         CAST(sum(CASE WHEN xmin <= {CK_HI} AND xmax >= {CK_LO}
                       THEN 1 ELSE 0 END) AS BIGINT) AS scan_custkey_pred,
         CAST(sum(CASE WHEN ymin <= {DAY_HI} AND ymax >= {DAY_LO}
                       THEN 1 ELSE 0 END) AS BIGINT) AS scan_date_pred
  FROM zg
  UNION ALL
  SELECT 'date_sort', count(*),
         CAST(sum(CASE WHEN xmin <= {CK_HI} AND xmax >= {CK_LO}
                       THEN 1 ELSE 0 END) AS BIGINT),
         CAST(sum(CASE WHEN ymin <= {DAY_HI} AND ymax >= {DAY_LO}
                       THEN 1 ELSE 0 END) AS BIGINT)
  FROM yg
)
SELECT layout, groups_total, scan_custkey_pred, scan_date_pred
FROM stats ORDER BY layout
"""


SPECS = [
    QuerySpec(
        "source_zorder_layout", source_zorder_layout, _ORACLE_ZORDER,
        "sources",
        "Morton/Z-order clustering vs single-key sort: per-file-group "
        "min/max data-skipping simulation for two probe predicates "
        "(the OPTIMIZE ZORDER BY planner computation, oracle-exact)"),
]
