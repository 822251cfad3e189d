"""Column mapping x partitioned tables (r18, VERDICT r17 #3): enabling
name-mode mapping on a partitioned table, renaming data AND partition
columns without any rewrite, and reading the result through every
surface — batch snapshot, DV merge-on-read scan, stats/partition
pruning, shallow clone, the log stream, and the CDF stream.

Log-physical artifacts (hive dirs, partitionValues keys, stats keys)
stay PHYSICAL; metaData.partitionColumns tracks the LOGICAL names
(they reference schema fields — the delta-spark convention)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from opencode_hive_archon_spark.sources import deltalog as dl
from opencode_hive_archon_spark.sources import deltastats as ds


def _mk_partitioned_mapped(spark, tmp_path, n=40):
    """Partitioned table -> enable mapping -> rename BOTH a data column
    (v -> price) and the partition column (bucket -> region)."""
    tbl = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(k, k % 4, float(k) * 1.5) for k in range(n)],
        "k long, bucket long, v double",
    ).repartition(4)
    dl.delta_write(spark, df, tbl, partition_by=["bucket"])
    dl.delta_enable_column_mapping(spark, tbl)
    dl.delta_rename_column(spark, tbl, "v", "price")
    dl.delta_rename_column(spark, tbl, "bucket", "region")
    return tbl


def test_enable_mapping_on_partitioned_table_and_rename(spark, tmp_path):
    tbl = _mk_partitioned_mapped(spark, tmp_path)
    snap = dl.delta_snapshot(spark, tbl)
    assert set(snap.columns) == {"k", "region", "price"}
    got = {(r["k"], r["region"], r["price"]) for r in snap.collect()}
    assert got == {(k, k % 4, k * 1.5) for k in range(40)}
    # The hive layout and partitionValues keys stayed PHYSICAL (bucket).
    state = dl._snapshot_state(spark, tbl)
    assert state["partition_columns"] == ["region"]  # logical
    for f in state["files"]:
        assert list(f["partitionValues"]) == ["bucket"]
        assert "bucket=" in f["path"]
    # Time travel to the pre-rename version serves the OLD names.
    v0 = dl.delta_snapshot(spark, tbl, version=0)
    assert set(v0.columns) == {"k", "bucket", "v"}


def test_append_after_partition_rename_keeps_physical_layout(
    spark, tmp_path
):
    """An append AFTER the rename arrives with LOGICAL names and must
    land in the same physical dirs (bucket=...) as pre-rename files —
    the rename was metadata-only end to end."""
    tbl = _mk_partitioned_mapped(spark, tmp_path)
    extra = spark.createDataFrame(
        [(100, 1, 7.0), (101, 2, 8.0)], "k long, region long, price double"
    )
    dl.delta_write(spark, extra, tbl, mode="append")
    state = dl._snapshot_state(spark, tbl)
    for f in state["files"]:
        assert list(f["partitionValues"]) == ["bucket"]
    got = {
        (r["k"], r["region"], r["price"])
        for r in dl.delta_snapshot(spark, tbl).collect()
    }
    assert (100, 1, 7.0) in got and (101, 2, 8.0) in got
    assert len(got) == 42


def test_partition_pruning_on_renamed_partition_column(spark, tmp_path):
    """A predicate on the RENAMED logical partition column prunes via
    the physical partitionValues — fewer files scanned, same rows."""
    tbl = _mk_partitioned_mapped(spark, tmp_path)
    total, scanned = ds.delta_scan_accounting(spark, tbl, "region = 2")
    assert scanned < total
    got = sorted(
        r["k"] for r in ds.delta_scan(spark, tbl, "region = 2").collect()
    )
    assert got == [k for k in range(40) if k % 4 == 2]


def test_dv_delete_on_mapped_partitioned_table(spark, tmp_path):
    """Merge-on-read DV delete through the mapped+partitioned scan:
    the row-index anti-join reads physical files under the physical
    schema and serves logical rows."""
    tbl = _mk_partitioned_mapped(spark, tmp_path)
    dl.delta_delete(spark, tbl, "price >= 45.0", use_dv=True)
    state = dl._snapshot_state(spark, tbl)
    assert any(f.get("deletionVector") for f in state["files"])
    got = sorted(r["k"] for r in dl.delta_snapshot(spark, tbl).collect())
    assert got == [k for k in range(40) if k * 1.5 < 45.0]


def test_shallow_clone_of_mapped_partitioned_table(spark, tmp_path):
    tbl = _mk_partitioned_mapped(spark, tmp_path)
    dl.delta_delete(spark, tbl, "price >= 45.0", use_dv=True)
    clone = str(tmp_path / "c")
    dl.delta_clone(spark, tbl, clone)
    want = {
        (r["k"], r["region"], r["price"])
        for r in dl.delta_snapshot(spark, tbl).collect()
    }
    got = {
        (r["k"], r["region"], r["price"])
        for r in dl.delta_snapshot(spark, clone).collect()
    }
    assert got == want


def test_drop_partition_column_is_refused(spark, tmp_path):
    tbl = _mk_partitioned_mapped(spark, tmp_path)
    with pytest.raises(dl.DeltaProtocolError, match="partition column"):
        dl.delta_drop_column(spark, tbl, "region")
    # Dropping a DATA column still works and vanishes from reads.
    dl.delta_drop_column(spark, tbl, "price")
    assert set(dl.delta_snapshot(spark, tbl).columns) == {"k", "region"}


def test_cdf_stream_on_mapped_partitioned_table(spark, tmp_path):
    """The CDF stream serves a mapped PARTITIONED table under its
    LOGICAL schema: physical file columns renamed executor-side,
    partition values injected via their physical keys, DV supersede
    netting intact — signed accumulation reproduces the snapshot."""
    tbl = _mk_partitioned_mapped(spark, tmp_path)
    dl.delta_delete(spark, tbl, "price >= 45.0", use_dv=True)
    spark.dataSource.register(dl.DeltaCdfStreamSource)
    sink = f"cdf_map_{abs(hash(tbl)) % 10**8}"
    q = (
        spark.readStream.format("delta_cdf_stream")
        .option("path", tbl)
        .load()
        .writeStream.format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    feed = spark.table(sink)
    assert {"k", "region", "price", "_change_type", "_commit_version"} == set(
        feed.columns
    )
    sign = F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
    got = {
        r["region"]: (r["n"], r["sk"])
        for r in feed.groupBy("region").agg(
            F.sum(sign).alias("n"), F.sum(sign * F.col("k")).alias("sk")
        ).collect()
    }
    want = {
        r["region"]: (r["n"], r["sk"])
        for r in dl.delta_snapshot(spark, tbl).groupBy("region").agg(
            F.count(F.lit(1)).alias("n"), F.sum("k").alias("sk")
        ).collect()
    }
    assert got == want


def test_log_stream_on_mapped_partitioned_table(spark, tmp_path):
    tbl = _mk_partitioned_mapped(spark, tmp_path)
    spark.dataSource.register(dl.DeltaLogStreamSource)
    sink = f"log_map_{abs(hash(tbl)) % 10**8}"
    q = (
        spark.readStream.format("delta_log_stream")
        .option("path", tbl)
        .load()
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    tail = spark.table(sink)
    assert set(tail.columns) == {"k", "region", "price"}
    got = {(r["k"], r["region"], r["price"]) for r in tail.collect()}
    assert got == {(k, k % 4, k * 1.5) for k in range(40)}


def test_stream_dv_out_of_range_index_fails_loudly(spark, tmp_path):
    """A DV row index past the file's row count means a corrupt or
    mismatched deletion vector — the stream must raise, not silently
    serve rows that may be dead (ADVICE r17 #4)."""
    tbl = str(tmp_path / "t")
    dl.delta_write(spark, spark.createDataFrame(
        [(k, float(k)) for k in range(10)], "k long, v double"
    ).repartition(1), tbl)
    dl.delta_delete(spark, tbl, "k >= 7", use_dv=True)
    # Corrupt the committed DV descriptor: point its cardinality/indexes
    # past the file by rewriting the commit with a bogus DV whose
    # bitmap covers index 10**6.
    state = dl._snapshot_state(spark, tbl)
    f = next(f for f in state["files"] if f.get("deletionVector"))
    bogus = dl._dv_write(tbl, {10**6})
    vf = dl._version_file(tbl, state["version"])
    lines = []
    with open(vf) as fh:
        for line in fh:
            if not line.strip():
                continue
            act = json.loads(line)
            if "add" in act and act["add"].get("deletionVector"):
                act["add"]["deletionVector"] = bogus
            lines.append(json.dumps(act))
    with open(vf, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    spark.dataSource.register(dl.DeltaLogStreamSource)
    sink = f"log_dvbad_{abs(hash(tbl)) % 10**8}"
    q = (
        spark.readStream.format("delta_log_stream")
        .option("path", tbl)
        .load()
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .start()
    )
    try:
        with pytest.raises(Exception, match="corrupt or mismatched DV"):
            q.processAllAvailable()
    finally:
        q.stop()


def test_batch_change_feed_serves_across_mapped_rename(spark, tmp_path):
    """The BATCH change feed (delta_changes) crosses the mapping-enable
    and rename commits — metadata-only, physical shape identical — and
    serves every row under to_version's LOGICAL names, the same r18
    contract the CDF/log streams already honor."""
    tbl = _mk_partitioned_mapped(spark, tmp_path, n=8)
    dl.delta_delete(spark, tbl, "k = 3")
    v = dl.latest_version(tbl)
    feed = dl.delta_changes(spark, tbl, -1, v)
    assert set(feed.columns) == {
        "k", "region", "price", "_change_type", "_commit_version"
    }
    rows = feed.collect()
    v0_inserts = {
        (r["k"], r["region"], r["price"])
        for r in rows
        if r["_change_type"] == "insert" and r["_commit_version"] == 0
    }
    assert v0_inserts == {(k, k % 4, k * 1.5) for k in range(8)}
    # Row-granular DELETE classes: only the row the predicate hit
    # surfaces; the carried k=7 row the rewrite moved is elided.
    deletes = {
        (r["k"], r["region"], r["price"], r["_commit_version"])
        for r in rows
        if r["_change_type"] == "delete"
    }
    assert deletes == {(3, 3, 4.5, v)}
    assert len(rows) == 9


def test_batch_change_feed_still_refuses_mapped_overwrite_schema(
    spark, tmp_path
):
    """A rename is serveable; a PHYSICAL shape change is not: an
    overwriteSchema commit on the mapped table still splits the feed."""
    tbl = _mk_partitioned_mapped(spark, tmp_path, n=8)
    df = spark.createDataFrame(
        [(1, 1, 1.0, "x")], "k long, region long, price double, tag string"
    )
    dl.delta_write(spark, df, tbl, mode="overwrite", partition_by=["region"])
    with pytest.raises(dl.DeltaProtocolError, match="schema or partition"):
        dl.delta_changes(spark, tbl, -1, dl.latest_version(tbl))
