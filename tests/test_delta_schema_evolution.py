"""Schema evolution on the delta layer (r18, VERDICT r17 #4/#5):
overwriteSchema on column-mapped tables (fresh physical names minted,
ids monotone, time travel serves each generation under its own schema)
and the streams' loud refusal across the boundary."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from opencode_hive_archon_spark.sources import deltalog as dl


def test_overwrite_schema_on_mapped_table(spark, tmp_path):
    """overwriteSchema on a mapped table: surviving logical names keep
    id/physicalName, new columns mint col-<uuid> physical names past
    maxColumnId, and both generations read correctly via time travel."""
    tbl = str(tmp_path / "t")
    dl.delta_write(spark, spark.createDataFrame(
        [(k, float(k)) for k in range(10)], "k long, v double"
    ).repartition(1), tbl)
    dl.delta_enable_column_mapping(spark, tbl)
    dl.delta_rename_column(spark, tbl, "v", "price")
    v_pre = dl.latest_version(tbl)
    new = spark.createDataFrame(
        [(100, 1.0, "x"), (101, 2.0, "y")],
        "k long, price double, tag string",
    )
    dl.delta_write(spark, new, tbl, mode="overwrite")
    # New generation serves the new schema...
    snap = dl.delta_snapshot(spark, tbl)
    assert set(snap.columns) == {"k", "price", "tag"}
    assert {(r["k"], r["price"], r["tag"]) for r in snap.collect()} == {
        (100, 1.0, "x"), (101, 2.0, "y")
    }
    # ...time travel serves the old generation under the OLD schema.
    old = dl.delta_snapshot(spark, tbl, version=v_pre)
    assert set(old.columns) == {"k", "price"}
    assert len(old.collect()) == 10
    # Mapping metadata: k/price kept their ids+physical names; tag
    # minted a fresh col-<uuid> past maxColumnId.
    meta = dl._snapshot_state(spark, tbl)["meta"]
    fields = {
        f["name"]: f["metadata"]
        for f in json.loads(meta["schemaString"])["fields"]
    }
    assert fields["k"][dl._CM_PHYS] == "k"
    assert fields["price"][dl._CM_PHYS] == "v"  # survived the rename
    assert fields["tag"][dl._CM_PHYS].startswith("col-")
    assert fields["tag"][dl._CM_ID] == 3
    assert meta["configuration"][dl.COLUMN_MAPPING_MAX_ID] == "3"
    # A post-evolution append with the new logical schema works.
    dl.delta_write(spark, spark.createDataFrame(
        [(102, 3.0, "z")], "k long, price double, tag string"
    ), tbl, mode="append")
    assert dl.delta_count(spark, tbl) == 3


def test_overwrite_schema_repartitions_mapped_table(spark, tmp_path):
    """An overwrite may also change the partition layout of a mapped
    table: the new partition column's PHYSICAL name keys the dirs."""
    tbl = str(tmp_path / "t")
    dl.delta_write(spark, spark.createDataFrame(
        [(k, float(k)) for k in range(8)], "k long, v double"
    ).repartition(1), tbl)
    dl.delta_enable_column_mapping(spark, tbl)
    new = spark.createDataFrame(
        [(k, k % 2, float(k)) for k in range(8)],
        "k long, side long, v double",
    )
    dl.delta_write(spark, new, tbl, mode="overwrite", partition_by=["side"])
    state = dl._snapshot_state(spark, tbl)
    assert state["partition_columns"] == ["side"]
    phys_side = dl._physical_map(state["meta"])["side"]
    assert phys_side.startswith("col-")
    for f in state["files"]:
        assert list(f["partitionValues"]) == [phys_side]
    got = {(r["k"], r["side"]) for r in dl.delta_snapshot(spark, tbl).collect()}
    assert got == {(k, k % 2) for k in range(8)}
    # Pruning on the new partition column works through the mapping.
    from opencode_hive_archon_spark.sources import deltastats as ds

    total, scanned = ds.delta_scan_accounting(spark, tbl, "side = 0")
    assert scanned < total


def test_cdf_stream_refuses_overwrite_schema_boundary(spark, tmp_path):
    """A CDF stream whose range crosses an overwriteSchema commit fails
    LOUDLY (mapped table: the physical shape changed) — old rows under
    the new schema would be a different table."""
    tbl = str(tmp_path / "t")
    dl.delta_write(spark, spark.createDataFrame(
        [(k, float(k)) for k in range(6)], "k long, v double"
    ).repartition(1), tbl)
    dl.delta_enable_column_mapping(spark, tbl)
    dl.delta_write(spark, spark.createDataFrame(
        [(9, 9.0, "x")], "k long, v double, tag string"
    ), tbl, mode="overwrite")
    spark.dataSource.register(dl.DeltaCdfStreamSource)
    sink = f"cdf_evo_{abs(hash(tbl)) % 10**8}"
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
        with pytest.raises(Exception, match="crossed a schema change"):
            q.processAllAvailable()
    finally:
        q.stop()


def test_batch_change_feed_refuses_overwrite_schema_boundary(
    spark, tmp_path
):
    tbl = str(tmp_path / "t")
    dl.delta_write(spark, spark.createDataFrame(
        [(k, float(k)) for k in range(6)], "k long, v double"
    ).repartition(1), tbl)
    dl.delta_write(spark, spark.createDataFrame(
        [(9, 9.0, "x")], "k long, v double, tag string"
    ), tbl, mode="overwrite")
    with pytest.raises(dl.DeltaProtocolError, match="schema or partition"):
        dl.delta_changes(spark, tbl, -1, dl.latest_version(tbl))


def test_unmapped_overwrite_schema_still_works(spark, tmp_path):
    """The pre-r18 unmapped path is unchanged: overwrite with a new
    shape commits new metaData and time travel splits generations."""
    tbl = str(tmp_path / "t")
    dl.delta_write(spark, spark.createDataFrame(
        [(1, 1.0)], "k long, v double"
    ), tbl)
    dl.delta_write(spark, spark.createDataFrame(
        [(2, "b")], "k long, s string"
    ), tbl, mode="overwrite")
    assert set(dl.delta_snapshot(spark, tbl).columns) == {"k", "s"}
    assert set(dl.delta_snapshot(spark, tbl, version=0).columns) == {
        "k", "v"
    }


def test_merge_schema_evolution_appends_columns(spark, tmp_path):
    """autoMerge: a source with a NEW column evolves the table schema in
    the same MERGE commit; pre-existing rows null-backfill the column."""
    tbl = str(tmp_path / "t")
    dl.delta_write(spark, spark.createDataFrame(
        [(k, float(k)) for k in range(6)], "k long, v double"
    ).repartition(1), tbl)
    src = spark.createDataFrame(
        [(4, 40.0, "u"), (10, 100.0, "i")], "k long, v double, tag string"
    )
    # Without the flag: strict enforcement refuses.
    with pytest.raises(dl.DeltaProtocolError, match="schema enforcement"):
        dl.delta_merge(spark, tbl, src, on=["k"])
    dl.delta_merge(spark, tbl, src, on=["k"], schema_evolution=True)
    snap = dl.delta_snapshot(spark, tbl)
    assert set(snap.columns) == {"k", "v", "tag"}
    got = {(r["k"], r["v"], r["tag"]) for r in snap.collect()}
    assert (4, 40.0, "u") in got and (10, 100.0, "i") in got
    assert (0, 0.0, None) in got  # untouched row, null-backfilled
    assert len(got) == 7
    # Old generation still reads under the old schema.
    assert set(dl.delta_snapshot(spark, tbl, version=0).columns) == {"k", "v"}


def test_merge_schema_evolution_on_mapped_table(spark, tmp_path):
    """autoMerge on a MAPPED table: new column mints a col-<uuid>
    physical name; surviving columns untouched; reads stay logical."""
    tbl = str(tmp_path / "t")
    dl.delta_write(spark, spark.createDataFrame(
        [(k, float(k)) for k in range(6)], "k long, v double"
    ).repartition(1), tbl)
    dl.delta_enable_column_mapping(spark, tbl)
    dl.delta_rename_column(spark, tbl, "v", "price")
    src = spark.createDataFrame(
        [(4, 40.0, 7), (10, 100.0, 8)], "k long, price double, extra long"
    )
    dl.delta_merge(spark, tbl, src, on=["k"], schema_evolution=True)
    meta = dl._snapshot_state(spark, tbl)["meta"]
    import json as _json

    fields = {
        f["name"]: f["metadata"]
        for f in _json.loads(meta["schemaString"])["fields"]
    }
    assert fields["price"][dl._CM_PHYS] == "v"
    assert fields["extra"][dl._CM_PHYS].startswith("col-")
    got = {
        (r["k"], r["price"], r["extra"])
        for r in dl.delta_snapshot(spark, tbl).collect()
    }
    assert (4, 40.0, 7) in got and (10, 100.0, 8) in got
    assert (0, 0.0, None) in got
    # The evolution refuses a source that DROPS a target column.
    bad = spark.createDataFrame([(1, 9)], "k long, extra long")
    with pytest.raises(dl.DeltaProtocolError, match="missing or retyped"):
        dl.delta_merge(spark, tbl, bad, on=["k"], schema_evolution=True)


def test_merge_not_matched_by_source_delete(spark, tmp_path):
    """WHEN NOT MATCHED BY SOURCE THEN DELETE: the merge becomes a full
    sync — target keys absent from the source vanish."""
    tbl = str(tmp_path / "t")
    dl.delta_write(spark, spark.createDataFrame(
        [(k, float(k)) for k in range(8)], "k long, v double"
    ).repartition(2), tbl)
    src = spark.createDataFrame(
        [(2, 20.0), (3, 3.0), (99, 99.0)], "k long, v double"
    )
    dl.delta_merge(
        spark, tbl, src, on=["k"], not_matched_by_source="delete"
    )
    got = {(r["k"], r["v"]) for r in dl.delta_snapshot(spark, tbl).collect()}
    assert got == {(2, 20.0), (3, 3.0), (99, 99.0)}


def test_merge_not_matched_by_source_delete_with_condition(spark, tmp_path):
    """A BY SOURCE condition bounds the delete to matching rows — and
    stats-prunes which extra files get rewritten."""
    tbl = str(tmp_path / "t")
    dl.delta_write(spark, spark.createDataFrame(
        [(k, float(k)) for k in range(8)], "k long, v double"
    ).repartition(2), tbl)
    src = spark.createDataFrame([(1, 10.0)], "k long, v double")
    dl.delta_merge(
        spark, tbl, src, on=["k"],
        not_matched_by_source="delete",
        by_source_condition="v >= 6.0",
    )
    got = {(r["k"], r["v"]) for r in dl.delta_snapshot(spark, tbl).collect()}
    # k=1 updated; k=6,7 (v>=6) deleted; the rest kept.
    assert got == {(0, 0.0), (1, 10.0), (2, 2.0), (3, 3.0), (4, 4.0), (5, 5.0)}


def test_merge_not_matched_by_source_update(spark, tmp_path):
    """WHEN NOT MATCHED BY SOURCE THEN UPDATE SET: unmatched target rows
    get the assignments (here a tombstone flag), matched rows the source
    payload."""
    tbl = str(tmp_path / "t")
    dl.delta_write(spark, spark.createDataFrame(
        [(k, float(k), "live") for k in range(4)],
        "k long, v double, status string",
    ).repartition(1), tbl)
    src = spark.createDataFrame(
        [(1, 10.0, "live")], "k long, v double, status string"
    )
    dl.delta_merge(
        spark, tbl, src, on=["k"],
        not_matched_by_source="update",
        by_source_assignments={"status": "'stale'"},
    )
    got = {
        (r["k"], r["v"], r["status"])
        for r in dl.delta_snapshot(spark, tbl).collect()
    }
    assert got == {
        (0, 0.0, "stale"), (1, 10.0, "live"),
        (2, 2.0, "stale"), (3, 3.0, "stale"),
    }


def test_merge_by_source_update_requires_assignments(spark, tmp_path):
    tbl = str(tmp_path / "t")
    dl.delta_write(spark, spark.createDataFrame(
        [(1, 1.0)], "k long, v double"
    ), tbl)
    src = spark.createDataFrame([(1, 2.0)], "k long, v double")
    with pytest.raises(ValueError, match="by_source_assignments"):
        dl.delta_merge(
            spark, tbl, src, on=["k"], not_matched_by_source="update"
        )
    with pytest.raises(ValueError, match="'delete' or 'update'"):
        dl.delta_merge(
            spark, tbl, src, on=["k"], not_matched_by_source="upsert"
        )


def test_rate_limited_cdf_restart_no_duplicates(spark, tmp_path):
    """ADVICE r17 #1: restarting a rate-limited CDF stream from a
    checkpoint whose last batch COMMITTED must not re-serve change
    files. The engine reveals the restored offset via commit() before
    its first latestOffset; the pacing cursor re-anchors there, so the
    paced offset can never regress behind the checkpoint."""
    tbl = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    for i in range(4):
        dl.delta_write(spark, spark.createDataFrame(
            [(i * 10 + j, float(i)) for j in range(3)], "k long, v double"
        ).repartition(1), tbl)
    spark.dataSource.register(dl.DeltaCdfStreamSource)

    def run():
        q = (
            spark.readStream.format("delta_cdf_stream")
            .option("path", tbl)
            .option("maxFilesPerTrigger", 2)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run()
    for i in range(4, 6):
        dl.delta_write(spark, spark.createDataFrame(
            [(i * 10 + j, float(i)) for j in range(3)], "k long, v double"
        ).repartition(1), tbl)
    run()
    feed = spark.read.parquet(out)
    assert feed.count() == 18  # 6 commits x 3 rows, each exactly once
    assert feed.distinct().count() == 18
