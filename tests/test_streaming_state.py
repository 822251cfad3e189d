"""Bounded-state evidence for stateful streaming (the 100 TB posture).

The correctness gates drive every streaming job single-batch, which proves
semantics but says nothing about STATE: a stream-stream join or session
window that never evicts works fine for one batch and OOMs on day three of
a production run. These tests drive the same transformations (shared with
the registered jobs — funnel_join / session_windows_agg) through a
MULTI-batch time-ordered source (maxFilesPerTrigger=1) and assert, from the
query progress metrics, that

* the RocksDB state-store provider (pinned session-wide in session.get_spark)
  is actually in effect,
* watermark eviction removes rows from the store as batches advance
  (numRowsRemoved > 0), and state stays bounded below the full input —
  i.e. the store holds a sliding watermark-width slice, not history,
* the multi-batch result is exactly the single-batch / batch-oracle result
  (batching is invisible in the output).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from opencode_hive_archon_spark.session import normalize_timestamps
from opencode_hive_archon_spark.streaming import jobs as J


def _events_batch(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return normalize_timestamps(ev)


@pytest.fixture(scope="module")
def sliced_events(spark, sf_dir):
    """events split into 4 time-ordered parquet slices with ascending
    mtimes, so maxFilesPerTrigger=1 replays them as 4 chronological
    micro-batches (the shape a live source produces)."""
    from pyspark.sql import Window

    ev = _events_batch(spark, sf_dir)
    sliced = ev.withColumn(
        "slice", F.ntile(4).over(Window.orderBy("ts"))
    )
    workdir = tempfile.mkdtemp(prefix="state_slices_")
    indir = os.path.join(workdir, "in")
    os.makedirs(indir)
    for i in range(1, 5):
        tmp = os.path.join(workdir, f"w{i}")
        sliced.filter(F.col("slice") == i).drop("slice").coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(indir, f"{i:04d}.parquet")
        shutil.copy(os.path.join(tmp, part), dst)
        os.utime(dst, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))
    yield indir
    shutil.rmtree(workdir, ignore_errors=True)


def _run_multibatch(spark, agg, name):
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
        progress = list(q.recentProgress)
    finally:
        q.stop()
    return progress


def _stream_src(spark, indir, per_trigger: int | None):
    schema = spark.read.parquet(indir).schema
    reader = spark.readStream.schema(schema)
    if per_trigger:
        reader = reader.option("maxFilesPerTrigger", per_trigger)
    return normalize_timestamps(reader.parquet(indir))


def _state_ops(progress):
    return [op for p in progress if p["numInputRows"] for op in p["stateOperators"]]


def test_rocksdb_provider_in_effect(spark):
    assert "RocksDBStateStoreProvider" in spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass"
    )


def test_registered_queries_pin_rocksdb_on_foreign_sessions(spark, sf_dir):
    """The driver contract hands the queries a session IT built (no RocksDB
    conf). The registered streaming jobs must pin the provider themselves:
    simulate by unsetting the conf on this session and running a registered
    stateful query end-to-end — the conf must be back in force (and the
    query green) without get_spark's help."""
    from opencode_hive_archon_spark.streaming import jobs as J

    key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.unset(key)
    try:
        assert "RocksDB" not in spark.conf.get(key)  # default provider
        out = J.stream_tumbling_counts(spark, sf_dir)
        assert out.count() > 0
        assert "RocksDBStateStoreProvider" in spark.conf.get(key)
    finally:
        spark.conf.set(key, J._ROCKSDB_PROVIDER)


def test_stream_stream_join_state_bounded(spark, sf_dir, sliced_events):
    joined = J.funnel_join(
        _stream_src(spark, sliced_events, 1), _stream_src(spark, sliced_events, 1)
    )
    progress = _run_multibatch(spark, joined, "state_test_join")
    batches = [p for p in progress if p["numInputRows"]]
    assert len(batches) >= 3, "multi-batch arrival did not happen"

    ops = _state_ops(progress)
    assert sum(op["numRowsRemoved"] for op in ops) > 0, (
        "watermark never evicted join state"
    )
    ev = _events_batch(spark, sf_dir)
    n_events = ev.count()
    peak = max(op["numRowsTotal"] for op in ops)
    # both join sides buffer rows only until the watermark passes
    # lead_ts + window; with 4 time-ordered batches the peak must stay
    # well below the full two-sided input (2 * n_events)
    assert peak < 2 * n_events, f"state never bounded: peak={peak}, input={n_events}"

    # batching must be invisible in the output: exact match vs batch self-join
    a = ev.select(
        F.col("event_id").alias("lead_id"),
        "user_id",
        F.unix_micros("ts").alias("lus"),
    )
    b = ev.select(
        F.col("event_id").alias("follow_id"),
        F.col("user_id").alias("fu"),
        F.unix_micros("ts").alias("fus"),
    )
    expected = {
        (r["lead_id"], r["follow_id"])
        for r in a.join(
            b,
            (F.col("user_id") == F.col("fu"))
            & (F.col("fus") > F.col("lus"))
            & (F.col("fus") <= F.col("lus") + J.STREAM_JOIN_WINDOW_S * 1_000_000),
        ).collect()
    }
    got = {
        (r["lead_id"], r["follow_id"])
        for r in spark.table("state_test_join").collect()
    }
    assert got == expected


def test_session_windows_state_bounded(spark, sf_dir, sliced_events):
    agg = J.session_windows_agg(_stream_src(spark, sliced_events, 1))
    progress = _run_multibatch(spark, agg, "state_test_sessions")
    batches = [p for p in progress if p["numInputRows"]]
    assert len(batches) >= 3

    ops = _state_ops(progress)
    assert sum(op["numRowsRemoved"] for op in ops) > 0, (
        "watermark never closed/evicted session state"
    )

    # multi-batch result == the registered single-batch job's result
    single = J.stream_session_windows(spark, sf_dir)
    key = lambda r: (
        r["user_id"],
        r["session_start"],
        r["session_end"],
        r["n_events"],
        r["total_value"],
    )
    got = sorted(
        (r["user_id"], r["session_window"]["start"], r["session_window"]["end"],
         r["n_events"], r["total_value"])
        for r in spark.table("state_test_sessions").collect()
    )
    expected = sorted(key(r) for r in single.collect())
    assert got == expected


@pytest.fixture(scope="module")
def ladder_indir(spark, sf_dir):
    """The dedup ladder's sliced-doc input (4 chronological slices + a
    byte-identical replay of slice 2), torn down after the module."""
    workdir = tempfile.mkdtemp(prefix="ladder_state_")
    yield J._ladder_sliced_docs(spark, sf_dir, workdir)
    shutil.rmtree(workdir, ignore_errors=True)


def test_dedup_ladder_state_bounded(spark, ladder_indir):
    """The in-stream rung's dedup state must EVICT on watermark advance
    (numRowsRemoved > 0) and never hold the whole corpus at once — the
    property that makes the ladder runnable on an unbounded ingest feed."""
    agg = J._ladder_stream(spark, ladder_indir)
    progress = _run_multibatch(spark, agg, "ladder_state_probe")
    ops = _state_ops(progress)
    assert ops, "no stateful operator progress captured"
    assert sum(op["numRowsRemoved"] for op in ops) > 0, (
        "watermark never evicted dedup state"
    )
    n_docs = spark.read.parquet(ladder_indir).select("doc_id").distinct().count()
    peak = max(op["numRowsTotal"] for op in ops)
    assert peak < n_docs, (
        f"dedup state ({peak}) held the entire corpus ({n_docs})"
    )


def test_dedup_ladder_replay_suppressed(spark, ladder_indir):
    """At-least-once redelivery (the replayed slice) must contribute ZERO
    rows downstream: the deduped stream yields each (h, doc_id) exactly
    once, so the merge's counts cannot double."""
    agg = J._ladder_stream(spark, ladder_indir)
    name = "ladder_replay_probe"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    n_distinct = spark.read.parquet(ladder_indir).select("doc_id").distinct().count()
    assert out.count() == n_distinct
    assert out.groupBy("doc_id").count().filter("count > 1").isEmpty()


@pytest.fixture(scope="module")
def mv_indir(spark, sf_dir):
    """The MV-maintenance changelog input (4 chronological slices + a
    byte-identical replay of slice 2), torn down after the module."""
    workdir = tempfile.mkdtemp(prefix="mv_state_")
    yield J._mv_sliced_changelog(spark, sf_dir, workdir)
    shutil.rmtree(workdir, ignore_errors=True)


def test_mv_stream_state_bounded(spark, mv_indir):
    """The MV stream's dedup rung must evict on watermark advance and never
    hold the whole changelog — deltas are NOT idempotent, so this rung is
    the exactly-once guarantee of the maintenance loop.

    Exactly-once here is TWO rungs (ADVICE r11 #2): a redelivery within
    the watermark is deduped by (key, op) state; the replayed slice 2 of
    this fixture arrives BELOW the watermark (slice 4's CDC insert keys
    pushed it ~1e9 s past slice-2 event times) and is dropped by the
    late-data filter instead. Both are asserted so a data-layout change
    that shifts the watermark geometry can't silently change the
    mechanism without this test noticing."""
    agg = J._mv_stream(spark, mv_indir)
    progress = _run_multibatch(spark, agg, "mv_state_probe")
    ops = _state_ops(progress)
    assert ops, "no stateful operator progress captured"
    assert sum(op["numRowsRemoved"] for op in ops) > 0, (
        "watermark never evicted MV dedup state"
    )
    n_rows = spark.read.parquet(mv_indir).select("key", "op").distinct().count()
    peak = max(op["numRowsTotal"] for op in ops)
    assert peak < n_rows, (
        f"MV dedup state ({peak}) held the entire changelog ({n_rows})"
    )
    # the replayed below-watermark slice must be suppressed by the
    # late-data drop (the second exactly-once rung)
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0) for op in ops
    )
    assert dropped > 0, (
        "replayed slice was never dropped as late data — the watermark "
        "geometry changed; verify the (key, op) dedup rung now carries it"
    )


def _mv_synth_batch(spark, custkeys):
    """A tiny changelog micro-batch touching exactly ``custkeys``."""
    rows = [(int(k), "insert", int(k), 1, 10.0) for k in custkeys]
    df = spark.createDataFrame(
        rows, "key long, op string, o_custkey long, dn int, dp double"
    )
    return df.withColumn("dp", F.col("dp").cast("decimal(18,2)"))


def _bucket_files(mv_dir):
    """{relative parquet path: (size, sha) } across every version dir."""
    import hashlib as H

    out = {}
    for root, _dirs, files in os.walk(mv_dir):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                with open(p, "rb") as fh:
                    out[os.path.relpath(p, mv_dir)] = H.sha256(
                        fh.read()
                    ).hexdigest()
    return out


def test_mv_merge_churn_proportional(spark, sf_dir):
    """VERDICT r11 #3: a batch touching a strict subset of buckets must
    (a) write ONLY those buckets into its version dir, and (b) leave every
    previously-written parquet file byte-identical — the merge reads and
    rewrites affected buckets only, O(churn), not O(|MV|)."""
    workdir = tempfile.mkdtemp(prefix="mv_churn_")
    try:
        mv_dir = os.path.join(workdir, "mv")
        J._mv_seed(spark, sf_dir, mv_dir)
        before = _bucket_files(mv_dir)

        batch = _mv_synth_batch(spark, [1, 2])
        J._mv_merge_batch(spark, mv_dir, batch, batch_id=0)

        want_buckets = {
            r["b"] for r in batch.select(
                J._mv_bucket(F.col("o_custkey")).alias("b")
            ).distinct().collect()
        }
        assert len(want_buckets) < J.N_MV_BUCKETS, "fixture must be a subset"
        v0 = os.path.join(mv_dir, "v0")
        got_buckets = {
            int(d.split("=", 1)[1])
            for d in os.listdir(v0) if d.startswith("bucket=")
        }
        assert got_buckets == want_buckets, (
            f"v0 wrote buckets {got_buckets}, delta touched {want_buckets}"
        )
        after = _bucket_files(mv_dir)
        assert {k: v for k, v in after.items() if k in before} == before, (
            "a pre-existing bucket file was rewritten by the merge"
        )
        # manifest points untouched buckets at seed, touched at v0
        manifest = J._mv_latest_manifest(mv_dir)
        assert {b for b, v in manifest.items() if v == "v0"} == want_buckets
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_mv_merge_retry_idempotent(spark, sf_dir):
    """ADVICE r11 #1: re-running the SAME batch_id (crash between parquet
    write and checkpoint commit) must not double-apply the delta — prev
    resolves from the batch_id-keyed manifest, not mutable driver state."""
    workdir = tempfile.mkdtemp(prefix="mv_retry_")
    try:
        mv_dir = os.path.join(workdir, "mv")
        J._mv_seed(spark, sf_dir, mv_dir)
        batch = _mv_synth_batch(spark, [1, 2, 3])
        J._mv_merge_batch(spark, mv_dir, batch, batch_id=0)
        once = {
            tuple(r) for r in J._mv_read_buckets(
                spark, mv_dir, J._mv_latest_manifest(mv_dir),
                list(range(J.N_MV_BUCKETS)),
            ).drop("bucket").collect()
        }
        J._mv_merge_batch(spark, mv_dir, batch, batch_id=0)  # the retry
        twice = {
            tuple(r) for r in J._mv_read_buckets(
                spark, mv_dir, J._mv_latest_manifest(mv_dir),
                list(range(J.N_MV_BUCKETS)),
            ).drop("bucket").collect()
        }
        assert once == twice, "retry of the same batch_id changed the MV"
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_mv_stream_equals_batch_refresh(spark, sf_dir):
    """Streaming delta-merge must equal the batch delta-merge operator
    row-for-row (both are separately gated against the full-recompute
    oracle; this pins them to each other directly)."""
    from opencode_hive_archon_spark.operators.cdc import mv_incremental_refresh

    got = {
        (r["o_custkey"], r["n_orders"], r["total_price"])
        for r in J.stream_mv_maintenance(spark, sf_dir).collect()
    }
    want = {
        (r["o_custkey"], r["n_orders"], r["total_price"])
        for r in mv_incremental_refresh(spark, sf_dir).collect()
    }
    assert got == want


def test_mv_metadata_bounded_and_compacted(spark, sf_dir):
    """VERDICT r12 #1: manifests, version dirs, and parquet files must NOT
    grow O(#batches). Drive 12 single-customer batches through
    _mv_merge_batch and assert (a) the head pointer replaces the listdir
    scan, (b) retention GC keeps at most MV_MANIFEST_RETAIN+1 manifests,
    (c) the compaction rung fired at least once and live version dirs
    stay <= MV_COMPACT_DIR_THRESHOLD, (d) values equal seed + all deltas
    (GC/compaction never lose data)."""
    workdir = tempfile.mkdtemp(prefix="mv_gc_")
    try:
        mv_dir = os.path.join(workdir, "mv")
        J._mv_seed(spark, sf_dir, mv_dir)
        seed_vals = {
            r["o_custkey"]: (r["n_orders"], float(r["total"]))
            for r in J._mv_read_buckets(
                spark, mv_dir, J._mv_latest_manifest(mv_dir),
                list(range(J.N_MV_BUCKETS)),
            ).collect()
        }
        custkeys = list(range(1, 13))
        compact_seen = False
        for bid, ck in enumerate(custkeys):
            J._mv_merge_batch(
                spark, mv_dir, _mv_synth_batch(spark, [ck]), batch_id=bid
            )
            m = J._mv_latest_manifest(mv_dir)
            vers = set(m.values())
            assert len(vers) <= J.MV_COMPACT_DIR_THRESHOLD + 1, (
                f"batch {bid}: live manifest spans {len(vers)} dirs"
            )
            if vers == {f"v{bid}"}:
                compact_seen = True
        assert compact_seen, "compaction rung never fired in 12 batches"
        assert J._mv_read_pointer(mv_dir) == len(custkeys) - 1

        manifests = [
            n for n in os.listdir(mv_dir)
            if n.startswith("manifest_") and n.endswith(".json")
        ]
        assert len(manifests) <= J.MV_MANIFEST_RETAIN + 1, (
            f"retention GC left {sorted(manifests)}"
        )
        vdirs = [
            n for n in os.listdir(mv_dir)
            if os.path.isdir(os.path.join(mv_dir, n))
        ]
        assert len(vdirs) <= J.MV_COMPACT_DIR_THRESHOLD + J.MV_MANIFEST_RETAIN, (
            f"GC left version dirs {sorted(vdirs)}"
        )
        n_parquet = sum(
            1 for _root, _d, files in os.walk(mv_dir)
            for f in files if f.endswith(".parquet")
        )
        # file-per-bucket writes: bounded by buckets per live dir, far
        # below the 12-batch x shuffle-partition blowup this test pins out
        assert n_parquet <= J.N_MV_BUCKETS * (len(vdirs) + 1), (
            f"{n_parquet} parquet files across {len(vdirs)} dirs"
        )

        got = {
            r["o_custkey"]: (r["n_orders"], float(r["total"]))
            for r in J._mv_read_buckets(
                spark, mv_dir, J._mv_latest_manifest(mv_dir),
                list(range(J.N_MV_BUCKETS)),
            ).collect()
        }
        want = dict(seed_vals)
        for ck in custkeys:
            n, t = want.get(ck, (0, 0.0))
            want[ck] = (n + 1, t + 10.0)
        assert got == want, "GC/compaction changed MV contents"
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_mv_read_buckets_rejects_empty_list(spark, sf_dir):
    """ADVICE r12 #2: the helper's contract is a non-empty bucket list —
    an empty one must fail with the named assert, not a bare IndexError
    deep in parts[0]."""
    workdir = tempfile.mkdtemp(prefix="mv_empty_")
    try:
        mv_dir = os.path.join(workdir, "mv")
        J._mv_seed(spark, sf_dir, mv_dir)
        with pytest.raises(AssertionError, match="non-empty bucket list"):
            J._mv_read_buckets(spark, mv_dir, J._mv_latest_manifest(mv_dir), [])
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_mv_pointer_rebuilds_from_manifest_scan(spark, sf_dir):
    """ADVICE r13 #1: losing the tiny _latest file while manifests
    survive must NOT silently fall back to the seed (which would re-apply
    every delta since batch 0). The pointer read rebuilds from a one-time
    manifest scan, self-heals the file, and the next merge applies
    against the true head."""
    workdir = tempfile.mkdtemp(prefix="mv_ptr_")
    try:
        mv_dir = os.path.join(workdir, "mv")
        J._mv_seed(spark, sf_dir, mv_dir)
        for bid in range(3):
            J._mv_merge_batch(
                spark, mv_dir, _mv_synth_batch(spark, [bid + 1]), batch_id=bid
            )
        before = {
            r["o_custkey"]: (r["n_orders"], float(r["total"]))
            for r in J._mv_read_buckets(
                spark, mv_dir, J._mv_latest_manifest(mv_dir),
                list(range(J.N_MV_BUCKETS)),
            ).collect()
        }
        os.remove(J._mv_pointer_path(mv_dir))  # the out-of-band loss
        assert J._mv_read_pointer(mv_dir) == 2  # rebuilt, not -1
        assert os.path.exists(J._mv_pointer_path(mv_dir))  # self-healed
        # prev for batch 3 is v2 (the true head), so one more delta lands
        # exactly once — a seed fallback would also have dropped batches 0-2
        J._mv_merge_batch(spark, mv_dir, _mv_synth_batch(spark, [4]), batch_id=3)
        got = {
            r["o_custkey"]: (r["n_orders"], float(r["total"]))
            for r in J._mv_read_buckets(
                spark, mv_dir, J._mv_latest_manifest(mv_dir),
                list(range(J.N_MV_BUCKETS)),
            ).collect()
        }
        want = dict(before)
        n, t = want.get(4, (0, 0.0))
        want[4] = (n + 1, t + 10.0)
        assert got == want, "pointer rebuild lost or re-applied deltas"
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_mv_gc_floor_clamp_protects_retry_manifest(spark, sf_dir, monkeypatch):
    """ADVICE r13 #2: even if MV_MANIFEST_RETAIN were lowered to 1
    (the import guard forbids it, but the GC must be safe in depth too),
    the floor clamp keeps manifest_v{b-1} alive so a crash-retry of
    batch b still resolves its prev instead of RuntimeError/seed."""
    workdir = tempfile.mkdtemp(prefix="mv_clamp_")
    try:
        mv_dir = os.path.join(workdir, "mv")
        J._mv_seed(spark, sf_dir, mv_dir)
        monkeypatch.setattr(J, "MV_MANIFEST_RETAIN", 1)
        for bid in range(4):
            J._mv_merge_batch(
                spark, mv_dir, _mv_synth_batch(spark, [bid + 1]), batch_id=bid
            )
        # GC after batch 3 with RETAIN=1 would unclamped delete v2 — the
        # manifest a retry of batch 3 merges against
        assert os.path.exists(J._mv_manifest_path(mv_dir, "v2")), (
            "floor clamp failed: retry manifest v{b-1} was GC'd"
        )
        once = {
            tuple(r) for r in J._mv_read_buckets(
                spark, mv_dir, J._mv_latest_manifest(mv_dir),
                list(range(J.N_MV_BUCKETS)),
            ).drop("bucket").collect()
        }
        J._mv_merge_batch(spark, mv_dir, _mv_synth_batch(spark, [4]), batch_id=3)
        twice = {
            tuple(r) for r in J._mv_read_buckets(
                spark, mv_dir, J._mv_latest_manifest(mv_dir),
                list(range(J.N_MV_BUCKETS)),
            ).drop("bucket").collect()
        }
        assert once == twice, "retry under clamped GC changed the MV"
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
