"""End-to-end rehearsal of source_compaction_plan: actually write the
fragmented ingest layout, check the plan's ledger against the real file
census, execute the planned rewrite, and verify the after-state."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from opencode_hive_archon_spark.session import read_table
from opencode_hive_archon_spark.sources.io import (
    COMPACT_TARGET_ROWS,
    source_compaction_plan,
)


def _bin_mapping(files_df):
    """The op's packing rule, re-derived on the ledger for the rewrite."""
    w = (
        Window.partitionBy("o_year")
        .orderBy("o_month")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("n_rows").over(w), F.lit(0).cast("long"))
    return files_df.withColumn(
        "bin", F.floor(cum / COMPACT_TARGET_ROWS).cast("long")
    )


def test_compaction_plan_matches_real_files_and_rewrite(spark, sf_dir):
    plan = {r["o_year"]: r for r in source_compaction_plan(spark, sf_dir).collect()}
    assert plan, "empty plan"

    orders = read_table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        "o_orderkey",
        "o_totalprice",
    )
    workdir = tempfile.mkdtemp(prefix="compaction_")
    try:
        # fragmented ingest: hash-repartition on the micro-batch key so each
        # (year, month) directory receives exactly one data file
        frag = f"{workdir}/frag"
        orders.repartition("o_year", "o_month").write.partitionBy(
            "o_year", "o_month"
        ).parquet(frag)
        back = spark.read.parquet(frag)
        census = (
            back.select("o_year", F.input_file_name().alias("f"))
            .groupBy("o_year")
            .agg(F.countDistinct("f").alias("n_files"))
            .collect()
        )
        for r in census:
            assert r["n_files"] == plan[r["o_year"]]["files_before"], r

        # execute the rewrite the plan prescribes: pack each (year, bin)
        # into one output file, keeping the year partitioning
        ledger = back.groupBy("o_year", "o_month").agg(
            F.count(F.lit(1)).alias("n_rows")
        )
        mapping = _bin_mapping(ledger).select("o_year", "o_month", "bin")
        compact = f"{workdir}/compact"
        back.join(mapping, ["o_year", "o_month"]).repartition(
            "o_year", "bin"
        ).write.partitionBy("o_year").parquet(compact)
        after = spark.read.parquet(compact)
        census_after = (
            after.select("o_year", F.input_file_name().alias("f"))
            .groupBy("o_year")
            .agg(
                F.countDistinct("f").alias("n_files"),
                F.count(F.lit(1)).alias("n_rows"),
            )
            .collect()
        )
        for r in census_after:
            p = plan[r["o_year"]]
            assert r["n_files"] == p["files_after"], r
            assert r["n_rows"] == p["total_rows"], r
        assert after.count() == orders.count()
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_compaction_plan_bin_quota_respected(spark, sf_dir):
    """No bin except possibly a year's last may be left underfull by the
    fixed-quota rule, and every bin stays below quota + the largest single
    file (a file is never split)."""
    rows = source_compaction_plan(spark, sf_dir).collect()
    for r in rows:
        assert r["files_after"] <= r["files_before"]
        assert r["max_bin_rows"] >= r["min_bin_rows"] >= 1
        # fixed-quota packing: bin index = cum_before div quota, so the
        # count of distinct indices is at most total div quota + 1, and
        # the bins must jointly cover every row
        assert r["files_after"] <= r["total_rows"] // COMPACT_TARGET_ROWS + 1
        assert r["files_after"] * r["max_bin_rows"] >= r["total_rows"]
