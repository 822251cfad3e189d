"""Behavioral tests: count-min sketch, histogram, last-touch attribution."""

from __future__ import annotations

from datetime import datetime

from opencode_hive_archon_spark.operators.funnel import attribution_report
from opencode_hive_archon_spark.operators.sketches import (
    CMS_PROBES,
    HIST_BIN_CENTS,
    HIST_MAX_BIN,
    agg_countmin_sketch,
    agg_histogram,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double"
    )


def test_countmin_one_sided_guarantee(spark, sf_dir):
    """CMS never underestimates; overestimate is the reported delta; the
    probe set is exactly the top-heaviest keys."""
    out = agg_countmin_sketch(spark, sf_dir).collect()
    assert len(out) == CMS_PROBES
    for r in out:
        assert r.cms_ok is True
        assert r.cms_estimate >= r.true_count
        assert r.overestimate == r.cms_estimate - r.true_count
    # descending true counts (the probe ordering)
    trues = [r.true_count for r in out]
    assert trues == sorted(trues, reverse=True)


def test_histogram_bins_partition_the_orders(spark, sf_dir):
    """Bin edges are exact-cent integers, the clamp bin has no upper
    edge, and bin counts per priority sum to the priority's order count."""
    from opencode_hive_archon_spark.session import read_table

    out = agg_histogram(spark, sf_dir).collect()
    totals: dict[str, int] = {}
    for r in out:
        assert 0 <= r.bin_id <= HIST_MAX_BIN
        assert r.bin_lo_cents == r.bin_id * HIST_BIN_CENTS
        if r.bin_id < HIST_MAX_BIN:
            assert r.bin_hi_cents == (r.bin_id + 1) * HIST_BIN_CENTS
        else:
            assert r.bin_hi_cents is None
        totals[r.o_orderpriority] = totals.get(r.o_orderpriority, 0) + r.n_orders
    counts = {
        r.o_orderpriority: r.n
        for r in read_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert totals == counts


def test_attribution_last_touch_semantics(spark):
    """The most RECENT preceding touch wins; a purchase with no prior
    touch, or only a stale one, is 'direct'; purchases never credit
    other purchases."""
    t0 = datetime(2024, 5, 10, 12, 0, 0)
    ev = _ev(spark, [
        # user 1: view then click then purchase -> click wins (recency)
        (1, datetime(2024, 5, 10, 9, 0), 1, "view", 0.0),
        (2, datetime(2024, 5, 10, 10, 0), 1, "click", 0.0),
        (3, t0, 1, "purchase", 1.0),
        # user 2: purchase with no prior event -> direct
        (4, t0, 2, "purchase", 1.0),
        # user 3: touch 8 days before -> outside lookback -> direct
        (5, datetime(2024, 5, 2, 11, 0), 3, "view", 0.0),
        (6, t0, 3, "purchase", 1.0),
        # user 4: purchase then purchase -> second must NOT credit the
        # first purchase; its last non-purchase touch is the view
        (7, datetime(2024, 5, 10, 8, 0), 4, "view", 0.0),
        (8, datetime(2024, 5, 10, 9, 0), 4, "purchase", 1.0),
        (9, t0, 4, "purchase", 1.0),
    ])
    out = {r.channel: r for r in attribution_report(ev).collect()}
    assert out["click"].n_purchases == 1 and out["click"].n_users == 1
    assert out["direct"].n_purchases == 2 and out["direct"].n_users == 2
    assert out["view"].n_purchases == 2  # users 4 (twice)
    assert out["view"].n_users == 1


def test_attribution_exact_boundary_inclusive(spark):
    """A touch exactly 7 days before the purchase still attributes (the
    bound is <=, integer microseconds)."""
    ev = _ev(spark, [
        (1, datetime(2024, 5, 3, 12, 0, 0), 1, "click", 0.0),
        (2, datetime(2024, 5, 10, 12, 0, 0), 1, "purchase", 1.0),
    ])
    out = {r.channel: r.n_purchases for r in attribution_report(ev).collect()}
    assert out == {"click": 1}


def test_kmv_small_group_falls_back_to_hash_count(spark, sf_dir):
    """Groups with < k distinct hashes report the observed hash count as
    the estimate (no kth hash exists) and stay within the collision band."""
    from opencode_hive_archon_spark.operators.sketches import (
        KMV_K,
        agg_kmv_distinct,
    )

    out = agg_kmv_distinct(spark, sf_dir).collect()
    for r in out:
        assert r.n_hashes <= r.exact_distinct  # collisions only shrink
        if r.exact_distinct < KMV_K:
            assert r.kth_hash is None
            assert r.kmv_estimate == float(r.n_hashes)
        assert r.kmv_ok is True


def test_kmv_estimator_formula_and_band(spark):
    """A planted 500-distinct-user group exercises the k-th-hash branch:
    the estimate must equal (k-1)*M/h_k exactly and land in the 0.7-1.3
    band the integer check asserts."""
    from opencode_hive_archon_spark.operators.sketches import (
        KMV_K,
        KMV_M,
        kmv_report,
    )

    ev = spark.createDataFrame(
        [(i % 500, "a") for i in range(1500)], "user_id bigint, event_type string"
    )
    [r] = kmv_report(ev).collect()
    assert r.exact_distinct == 500 and r.kth_hash is not None
    assert r.kmv_estimate == (KMV_K - 1) * KMV_M / r.kth_hash
    assert 0.7 * 500 <= r.kmv_estimate <= 1.3 * 500
    assert r.kmv_ok is True


def test_stream_ohlc_matches_batch_on_closed_windows(spark, sf_dir):
    """The streaming OHLC (min_by/max_by over the packed key) must agree
    bar-for-bar with the batch operator (row_number formulation) on every
    watermark-closed window — two independent formulations, one answer."""
    from opencode_hive_archon_spark.operators.timeseries import events_ohlc_bars
    from opencode_hive_archon_spark.session import read_table
    from opencode_hive_archon_spark.streaming.jobs import stream_ohlc_bars

    import pyspark.sql.functions as F

    wm = (
        read_table(spark, sf_dir, "events")
        .agg(F.max("ts").alias("m"))
        .first()
        .m
    )
    stream = {
        (r.event_type, r.window_start): (r.open, r.high, r.low, r.close, r.n_events)
        for r in stream_ohlc_bars(spark, sf_dir).collect()
    }
    from datetime import timedelta

    closed = {
        (r.event_type, r.bucket): (r.open, r.high, r.low, r.close, r.n_events)
        for r in events_ohlc_bars(spark, sf_dir).collect()
        if r.bucket + timedelta(hours=1) <= wm - timedelta(minutes=10)
    }
    assert stream == closed and len(closed) > 0


def test_constraint_suite_report(spark, sf_dir):
    """Six checks, one row each; the verdict column is exactly
    n_violations == 0; the referential count matches an independent
    anti-join recomputation."""
    from opencode_hive_archon_spark.operators.constraints import (
        quality_constraint_suite,
    )
    from opencode_hive_archon_spark.session import read_table

    out = quality_constraint_suite(spark, sf_dir).collect()
    assert len(out) == 6
    assert {r.check_kind for r in out} == {
        "completeness", "uniqueness", "referential", "range",
        "freshness", "non_degenerate",
    }
    for r in out:
        assert r.passed == (r.n_violations == 0)
        assert r.n_violations >= 0
    ref = next(r for r in out if r.check_kind == "referential")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey")
    orders = read_table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey as l_orderkey"
    )
    orphans = li.join(orders, "l_orderkey", "left_anti").count()
    assert ref.n_violations == orphans


def test_cdc_diff_classification(spark, sf_dir):
    """Every emitted op matches its modulus rule; unchanged keys never
    appear; inserts carry the key offset; update deltas are exactly x2."""
    from opencode_hive_archon_spark.operators.cdc import (
        CDC_DEL_MOD,
        CDC_INS_MOD,
        CDC_INS_OFFSET,
        CDC_UPD_MOD,
        source_cdc_diff,
    )

    out = source_cdc_diff(spark, sf_dir).collect()
    assert {r.op for r in out} == {"insert", "update", "delete"}
    for r in out:
        if r.op == "delete":
            assert r.key % CDC_DEL_MOD == 0 and r.new_totalprice is None
        elif r.op == "insert":
            base_key = r.key - CDC_INS_OFFSET
            assert base_key % CDC_INS_MOD == 0 and r.old_totalprice is None
        else:
            assert r.key % CDC_UPD_MOD == 0 and r.key % CDC_DEL_MOD != 0
            assert r.new_totalprice == r.old_totalprice * 2


def test_column_stats_profile(spark, sf_dir):
    """Key column: zero nulls, NDV == row count, min/max span; string
    columns report NULL numeric bounds but real NDV."""
    from opencode_hive_archon_spark.operators.cdc import catalog_column_stats

    out = {r.column_name: r for r in catalog_column_stats(spark, sf_dir).collect()}
    key = out["o_orderkey"]
    assert key.n_nulls == 0 and key.ndv == key.n_rows
    assert key.min_num <= key.max_num
    prio = out["o_orderpriority"]
    assert prio.min_num is None and prio.max_num is None and prio.ndv > 0
    assert len({r.n_rows for r in out.values()}) == 1  # one consistent scan
