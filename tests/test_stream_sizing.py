"""Focused pins for the r18 streaming-shape optimizations.

Two internals changed in the optimization round and both must stay
result-invariant:

* state-partition sizing (`_stream_shuffle_partitions`): Structured
  Streaming fixes each stateful operator's state-partition count at query
  start from ``spark.sql.shuffle.partitions`` and AQE never coalesces
  stateful exchanges, so the count is DERIVED from input rows (floor 4,
  cap = cluster parallelism, env override for production sizing). These
  tests pin the derivation arithmetic, the env override, and that the
  context manager restores the session conf even on error.

* single-pass slice writes (`_write_time_slices`): the 4 micro-batch
  slice files are produced by ONE partitioned write instead of four
  filter+coalesce jobs. The tests pin that slice membership (the only
  thing the streams depend on) is unchanged: each file holds exactly its
  slice's rows, the union is the input, and the replay file is
  byte-identical to its source slice.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from opencode_hive_archon_spark.streaming.jobs import (
    STREAM_JOIN_TARGET_ROWS,
    STREAM_STATE_TARGET_ROWS,
    _stream_partitions,
    _stream_shuffle_partitions,
    _write_time_slices,
)


def test_stream_partitions_derive_from_rows(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS", raising=False)
    cap = max(int(spark.sparkContext.defaultParallelism), 1)
    # tiny input: floor of 4, never the session constant
    assert _stream_shuffle_partitions(spark, 1) == min(4, cap) or (
        _stream_shuffle_partitions(spark, 1) == 4
    )
    # grows linearly with rows: one partition per TARGET rows (ceil)
    want = min(cap, 10)
    assert (
        _stream_shuffle_partitions(spark, 10 * STREAM_STATE_TARGET_ROWS)
        == max(4, want)
    )
    # capped at cluster parallelism, no matter the input size
    assert _stream_shuffle_partitions(spark, 10**12) == max(4, cap)
    # the 4-store stream-stream join uses the ~4x finer target: at the
    # 100k-row single-batch point that is 16 partitions (measured knee),
    # still capped by cluster parallelism
    assert _stream_shuffle_partitions(
        spark, 100_000, STREAM_JOIN_TARGET_ROWS
    ) == max(4, min(cap, 16))
    assert STREAM_JOIN_TARGET_ROWS < STREAM_STATE_TARGET_ROWS


def test_stream_partitions_env_override_wins(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS", "7")
    assert _stream_shuffle_partitions(spark, 10**12) == 7
    assert _stream_shuffle_partitions(spark, 1) == 7


def test_stream_partitions_ctx_restores_conf(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS", raising=False)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    with _stream_partitions(spark, 1):
        inner = spark.conf.get("spark.sql.shuffle.partitions")
        assert inner == str(_stream_shuffle_partitions(spark, 1))
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
    # restored even when the body raises
    with pytest.raises(RuntimeError):
        with _stream_partitions(spark, 1):
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev


def test_write_time_slices_membership_unchanged(spark, sf_dir):
    """The one-pass partitioned write must produce per-file contents with
    the same slice membership as the old per-filter writes, plus a replay
    file byte-identical to its source slice."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    from pyspark.sql import Window

    sliced = docs.withColumn(
        "slice", F.ntile(4).over(Window.orderBy("doc_id"))
    )
    workdir = tempfile.mkdtemp(prefix="slice_pin_")
    try:
        indir = _write_time_slices(sliced, workdir, replay_slice=2)
        files = sorted(os.listdir(indir))
        assert files[:4] == [f"{i:04d}.parquet" for i in range(1, 5)]
        assert files[4].startswith("9999")
        expected = {
            i: {
                r["doc_id"]
                for r in sliced.where(F.col("slice") == i)
                .select("doc_id")
                .collect()
            }
            for i in range(1, 5)
        }
        for i in range(1, 5):
            got_df = spark.read.parquet(os.path.join(indir, f"{i:04d}.parquet"))
            # partitionBy drops the slice column from the data files
            assert "slice" not in got_df.columns
            got = {r["doc_id"] for r in got_df.select("doc_id").collect()}
            assert got == expected[i], f"slice {i} membership changed"
        # replay file is byte-identical to its source slice
        with open(os.path.join(indir, "0002.parquet"), "rb") as fh:
            src = fh.read()
        with open(os.path.join(indir, files[4]), "rb") as fh:
            rep = fh.read()
        assert src == rep
        # ascending mtimes -> chronological micro-batch order
        mtimes = [os.path.getmtime(os.path.join(indir, f)) for f in files]
        assert mtimes == sorted(mtimes)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
