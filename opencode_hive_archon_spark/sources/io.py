"""Format read/write matrix + the round-trip verification query.

``write_any`` / ``read_any`` cover parquet, ORC, CSV and JSON with explicit
schemas on read (no runtime inference in an engine path — schema drift must
fail loudly, and inference costs an extra pass at scale). Writes default to
snappy parquet; partitioned writes use ``partitionBy`` so downstream scans
get partition pruning.

Table formats: the delta-spark / iceberg-runtime JARS are absent from this
image (no network to fetch them) — with them, ``fmt="delta"`` / an Iceberg
catalog plug into this same ``write_any``/``read_any`` path via
spark.sql.extensions / spark.sql.catalog.* at session build. The table
FORMAT itself, however, is not environmental: ``sources/deltalog.py``
implements the public Delta transaction-log protocol (PROTOCOL.md) in pure
PySpark — atomic commits, log replay, checkpoints, time travel,
copy-on-write delete — and carries its own oracle-exact driver queries.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opencode_hive_archon_spark.session import read_table
from opencode_hive_archon_spark.spec import QuerySpec

FORMATS = ("parquet", "orc", "csv", "json")


def write_any(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.format(fmt).save(path)


def read_any(spark: SparkSession, path: str, fmt: str, schema) -> DataFrame:
    reader = spark.read.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
    return reader.format(fmt).load(path)


def source_roundtrip_formats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write ``nation`` through every format and read it back: per-format
    row count and an exact checksum (sum of keys) proving lossless I/O."""
    nation = read_table(spark, sf_dir, "nation")
    workdir = tempfile.mkdtemp(prefix="roundtrip_")
    rows = []
    try:
        for fmt in FORMATS:
            path = os.path.join(workdir, fmt)
            write_any(nation, path, fmt)
            back = read_any(spark, path, fmt, nation.schema)
            agg = back.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("n_nationkey").alias("key_sum"),
                F.countDistinct("n_regionkey").alias("n_regions"),
            ).first()
            rows.append((fmt, agg["n"], int(agg["key_sum"]), agg["n_regions"]))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    return spark.createDataFrame(
        rows, "format string, n_rows long, key_sum long, n_regions long"
    )


PRUNE_YEAR = 1997


def _source_identity(path: str) -> str:
    """Stable identity string for a parquet file-or-directory: absolute path
    plus (relpath, size, mtime_ns) of every data file, walking nested
    directories (a Hive-partitioned layout keeps its data files in
    subdirectories, where a top-level listing would miss an in-place
    rewrite). Two datasets written to the same path at different times hash
    differently. Files that vanish mid-walk (concurrent regeneration) get a
    sentinel instead of crashing the query — the digest still changes."""
    parts = [os.path.abspath(path)]
    if os.path.isdir(path):
        for root, dirs, files in os.walk(path):
            dirs.sort()
            for entry in sorted(files):
                full = os.path.join(root, entry)
                rel = os.path.relpath(full, path)
                try:
                    st = os.stat(full)
                    parts.append(f"{rel}:{st.st_size}:{st.st_mtime_ns}")
                except OSError:
                    parts.append(f"{rel}:gone")
    elif os.path.exists(path):
        try:
            st = os.stat(path)
            parts.append(f"{st.st_size}:{st.st_mtime_ns}")
        except OSError:
            parts.append("gone")
    return "|".join(parts)


def source_partitioned_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned write + partition-pruned read-back: orders written
    ``partitionBy(o_year)``, then scanned with an o_year filter. The filter
    is a PARTITION filter — Catalyst prunes the non-matching directories at
    planning time (``PartitionFilters`` in the scan node, pinned by
    tests/test_plan_shapes.py), so the read does I/O only on the selected
    year's files. At 100 TB this layout/query pair is the difference
    between scanning one partition and scanning the lake.

    The partitioned copy is written once per source dataset into a
    digest-keyed temp dir and kept for the session (same pattern as the
    streaming source dir) so the returned plan stays readable and repeat
    calls skip the write. The digest covers data identity — the source
    parquet file sizes and mtimes, not just the path — so regenerating
    testdata at the same path (new sf/seed) invalidates the cached copy
    instead of silently disagreeing with the oracle."""
    orders = read_table(spark, sf_dir, "orders")
    digest = hashlib.sha1(
        _source_identity(os.path.join(sf_dir, "orders.parquet")).encode()
    ).hexdigest()[:12]
    outdir = os.path.join(tempfile.gettempdir(), f"orders_by_year_{digest}")
    marker = os.path.join(outdir, "_SUCCESS")
    if not os.path.exists(marker):
        orders.withColumn("o_year", F.year("o_orderdate")).write.mode(
            "overwrite"
        ).partitionBy("o_year").parquet(outdir)
    back = spark.read.parquet(outdir).filter(F.col("o_year") == PRUNE_YEAR)
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias(
                "total_price"
            ),
        )
        .orderBy("o_orderpriority")
    )


_ORACLE_PRUNING = f"""
SELECT o_orderpriority, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders WHERE year(o_orderdate) = {PRUNE_YEAR}
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


EVOLUTION_CUT_YEAR = 1995  # generation 0 = orders before this year


def source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read path: two generations of the same dataset with
    drifting schemas, merged at read time, missing columns back-filled.

    Real pipelines append for years; later generations add columns. Here
    generation 0 (orders before {cut}) is written WITHOUT ``o_orderpriority``
    (the column didn't exist yet) and generation 1 (orders {cut}+) with it.
    ``mergeSchema=true`` reconciles the footers into the union schema —
    generation-0 rows surface the missing column as NULL, back-filled with
    a 'LEGACY' sentinel before aggregation.

    Scale notes: schema merge is a FOOTER operation (per-file metadata
    union, no data read); column pruning still reaches the scan — the plan
    test pins ReadSchema to the 3 consumed columns of the ~9-column table.
    The two-generation copy is written once per source dataset into a
    digest-keyed temp dir (same pattern/cache-invalidation rules as
    source_partitioned_pruning)."""
    orders = read_table(spark, sf_dir, "orders")
    digest = hashlib.sha1(
        _source_identity(os.path.join(sf_dir, "orders.parquet")).encode()
    ).hexdigest()[:12]
    outdir = os.path.join(tempfile.gettempdir(), f"orders_evolved_{digest}")
    g0_marker = os.path.join(outdir, "gen=0", "_SUCCESS")
    g1_marker = os.path.join(outdir, "gen=1", "_SUCCESS")
    year = F.year("o_orderdate")
    if not (os.path.exists(g0_marker) and os.path.exists(g1_marker)):
        orders.filter(year < EVOLUTION_CUT_YEAR).drop("o_orderpriority").write.mode(
            "overwrite"
        ).parquet(os.path.join(outdir, "gen=0"))
        orders.filter(year >= EVOLUTION_CUT_YEAR).write.mode("overwrite").parquet(
            os.path.join(outdir, "gen=1")
        )
    back = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(outdir, "gen=0"), os.path.join(outdir, "gen=1")
    )
    return (
        back.select(
            F.coalesce(F.col("o_orderpriority"), F.lit("LEGACY")).alias("priority"),
            "o_totalprice",
        )
        .groupBy("priority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias(
                "total_price"
            ),
        )
        .orderBy("priority")
    )


_ORACLE_SCHEMA_EVOLUTION = f"""
SELECT CASE WHEN year(o_orderdate) < {EVOLUTION_CUT_YEAR}
            THEN 'LEGACY' ELSE o_orderpriority END AS priority,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY 1
ORDER BY priority
"""


INSERT_KEY_OFFSET = 10_000_000  # synthetic insert keys, disjoint from base


def source_upsert_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MERGE INTO (SCD-1 upsert) pattern without a lakehouse format:
    apply a change-set of updates, inserts and deletes to a base table in
    one plan — LEFT join overrides updated values, an anti-filter drops
    deletes, a UNION appends inserts — then report the merged state per
    segment.

    The change-set is derived deterministically from the base so the oracle
    can replicate it: every key ≡ 3 (mod 10) gets +100 balance (update),
    the first 100 customers are cloned to a disjoint key range (insert),
    every key ≡ 0 (mod 97) is removed (delete).

    Scale notes: everything is an equi-join/filter on the merge key — the
    exact shape Delta/Iceberg MERGE compiles to; a small change-set gets
    broadcast by AQE, a large one shuffle-joins on the key. With a
    bucketed base table (sources/bucketed.py) the join side co-locates and
    the merge becomes shuffle-free. The final groupBy is the verification
    report, not part of the pattern."""
    base = read_table(spark, sf_dir, "customer")
    key = F.col("c_custkey")
    updates = base.filter(key % 10 == 3).select(
        "c_custkey", (F.col("c_acctbal") + 100.0).alias("new_bal")
    )
    inserts = base.filter(key < 100).select(
        (key + INSERT_KEY_OFFSET).alias("c_custkey"),
        "c_mktsegment",
        F.col("c_acctbal").alias("bal"),
    )
    merged = (
        base.join(updates, "c_custkey", "left")
        .filter(key % 97 != 0)
        .select(
            "c_custkey",
            "c_mktsegment",
            F.coalesce("new_bal", "c_acctbal").alias("bal"),
        )
        .unionByName(inserts)
    )
    return (
        merged.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("bal").cast("decimal(18,2)")).cast("double").alias(
                "total_bal"
            ),
            F.min("c_custkey").alias("min_key"),
            F.max("c_custkey").alias("max_key"),
        )
        .orderBy("c_mktsegment")
    )


_ORACLE_UPSERT = f"""
WITH upd AS (
  SELECT c_custkey, c_acctbal + 100.0 AS new_bal
  FROM customer WHERE c_custkey % 10 = 3
),
ins AS (
  SELECT c_custkey + {INSERT_KEY_OFFSET} AS c_custkey, c_mktsegment,
         c_acctbal AS bal
  FROM customer WHERE c_custkey < 100
),
merged AS (
  SELECT b.c_custkey, b.c_mktsegment,
         COALESCE(u.new_bal, b.c_acctbal) AS bal
  FROM customer b LEFT JOIN upd u USING (c_custkey)
  WHERE b.c_custkey % 97 != 0
  UNION ALL
  SELECT * FROM ins
)
SELECT c_mktsegment, count(*) AS n_rows,
       CAST(sum(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
       min(c_custkey) AS min_key, max(c_custkey) AS max_key
FROM merged GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


COMPACT_TARGET_ROWS = 1000  # compaction bin quota (rows per output file)


def source_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning — the OPTIMIZE/maintenance pass every
    long-lived table needs: a streaming ingest that commits one file per
    (year, month) micro-batch leaves the table fragmented into files far
    below the efficient scan size; this op plans the rewrite that packs
    them into ~COMPACT_TARGET_ROWS-row output files WITHOUT breaking the
    year partitioning.

    The simulated ingest ledger derives deterministically from the data
    (file = one (o_year, month) micro-batch, size = its row count), so the
    whole plan is oracle-exact; the pytest side actually WRITES the
    fragmented layout and rehearses the planned rewrite. Packing is the
    fixed-quota rule shared with corpus_pack_sequences: files ordered by
    month within their year, bin = (exclusive running row sum) div TARGET —
    one window over a ledger that is files-count sized, not row sized.
    Returns the per-partition before/after report a maintenance scheduler
    acts on (skip years already compacted: files_before == files_after).

    Scale notes: the ONLY corpus-sized work is the (year, month) count
    aggregate (map-side combined, |years·months| output rows); planning
    runs on the ledger. The physical rewrite this plan drives is
    ``repartitionByRange(bin)`` within each year directory — never a full
    table shuffle, and partition pruning is preserved because bins never
    cross years.
    """
    orders = read_table(spark, sf_dir, "orders")
    from pyspark.sql.window import Window

    files = orders.groupBy(
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    w = (
        Window.partitionBy("o_year")
        .orderBy("o_month")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_rows").over(w), F.lit(0).cast("long"))
    planned = files.withColumn(
        "bin", F.floor(cum_before / COMPACT_TARGET_ROWS).cast("long")
    )
    per_bin = planned.groupBy("o_year", "bin").agg(
        F.count(F.lit(1)).alias("files_in_bin"),
        F.sum("n_rows").alias("bin_rows"),
    )
    return (
        per_bin.groupBy("o_year")
        .agg(
            F.sum("files_in_bin").alias("files_before"),
            F.count(F.lit(1)).alias("files_after"),
            F.sum("bin_rows").alias("total_rows"),
            F.max("bin_rows").alias("max_bin_rows"),
            F.min("bin_rows").alias("min_bin_rows"),
        )
        .orderBy("o_year")
    )


_ORACLE_COMPACTION = f"""
WITH files AS (
  SELECT year(o_orderdate) AS o_year, month(o_orderdate) AS o_month,
         count(*) AS n_rows
  FROM orders GROUP BY 1, 2
),
planned AS (
  SELECT o_year, n_rows,
         CAST(COALESCE(sum(n_rows) OVER (PARTITION BY o_year ORDER BY o_month
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) // {COMPACT_TARGET_ROWS} AS bin
  FROM files
),
per_bin AS (
  SELECT o_year, bin, count(*) AS files_in_bin, sum(n_rows) AS bin_rows
  FROM planned GROUP BY 1, 2
)
SELECT o_year, CAST(sum(files_in_bin) AS BIGINT) AS files_before,
       count(*) AS files_after,
       CAST(sum(bin_rows) AS BIGINT) AS total_rows,
       CAST(max(bin_rows) AS BIGINT) AS max_bin_rows,
       CAST(min(bin_rows) AS BIGINT) AS min_bin_rows
FROM per_bin GROUP BY o_year ORDER BY o_year
"""


def _oracle() -> str:
    per_fmt = " UNION ALL ".join(
        f"SELECT '{fmt}' AS format, count(*) AS n_rows, "
        f"CAST(sum(n_nationkey) AS BIGINT) AS key_sum, "
        f"count(DISTINCT n_regionkey) AS n_regions FROM nation"
        for fmt in FORMATS
    )
    return per_fmt


SPECS = [
    QuerySpec("source_roundtrip_formats", source_roundtrip_formats, _oracle(),
              "sources", "parquet/orc/csv/json write+read-back checksums"),
    QuerySpec("source_partitioned_pruning", source_partitioned_pruning, _ORACLE_PRUNING,
              "sources", "partitionBy write + partition-pruned read-back"),
    QuerySpec("source_schema_evolution", source_schema_evolution,
              _ORACLE_SCHEMA_EVOLUTION, "sources",
              "mergeSchema read over two schema generations + missing-column "
              "back-fill"),
    QuerySpec("source_upsert_pattern", source_upsert_pattern, _ORACLE_UPSERT,
              "sources",
              "MERGE INTO / SCD-1 upsert pattern: update-override join + "
              "delete anti-filter + insert union in one plan"),
    QuerySpec("source_compaction_plan", source_compaction_plan,
              _ORACLE_COMPACTION, "sources",
              "small-file compaction planning: fixed-quota packing of "
              "(year, month) micro-batch files into target-row bins, "
              "per-partition before/after report"),
]
