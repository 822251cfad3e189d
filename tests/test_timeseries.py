"""Behavioral tests for the time-series / hypertable family + linkage.

Planted corpora pin the semantics the oracles also check, plus the edge
cases small scale factors may never hit: same-timestamp tie-breaks, LOCF
across multi-bucket holes, single-run users, and the linkage blocking
boundary.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from opencode_hive_archon_spark.operators.timeseries import (
    gapfill_locf,
    ohlc_bars,
    state_intervals,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double"
    )


def test_ohlc_tie_break_on_event_id(spark):
    """Two ticks at the SAME timestamp: event_id must decide open/close."""
    t = datetime(2024, 5, 1, 9, 30, 0)
    ev = _ev(spark, [
        (2, t, 1, "trade", 50.0),
        (1, t, 1, "trade", 10.0),   # lower event_id -> the open
        (3, t, 1, "trade", 99.0),   # higher event_id -> the close
        (4, datetime(2024, 5, 1, 9, 45, 0), 1, "trade", 1.0),
    ])
    [bar] = ohlc_bars(ev).collect()
    assert bar.bucket == datetime(2024, 5, 1, 9, 0, 0)
    assert bar.open == 10.0 and bar.close == 1.0
    assert bar.high == 99.0 and bar.low == 1.0 and bar.n_events == 4


def test_ohlc_one_bar_per_type_and_hour(spark):
    ev = _ev(spark, [
        (1, datetime(2024, 5, 1, 9, 5), 1, "a", 1.0),
        (2, datetime(2024, 5, 1, 10, 5), 1, "a", 2.0),
        (3, datetime(2024, 5, 1, 9, 50), 1, "b", 3.0),
    ])
    bars = {(r.event_type, r.bucket.hour): r for r in ohlc_bars(ev).collect()}
    assert set(bars) == {("a", 9), ("a", 10), ("b", 9)}
    assert bars[("a", 9)].open == bars[("a", 9)].close == 1.0


def test_gapfill_fills_hole_and_carries_value(spark):
    """Hours 9, 12 observed; 10 and 11 must appear 0-filled with hour 9's
    max carried forward; nothing before 9 or after 12 is invented."""
    ev = _ev(spark, [
        (1, datetime(2024, 5, 1, 9, 10), 1, "a", 7.0),
        (2, datetime(2024, 5, 1, 9, 40), 1, "a", 5.0),
        (3, datetime(2024, 5, 1, 12, 0), 1, "a", 2.0),
    ])
    rows = {r.bucket.hour: r for r in gapfill_locf(ev).collect()}
    assert sorted(rows) == [9, 10, 11, 12]
    assert rows[9].n_events == 2 and rows[9].is_gap is False
    assert rows[9].locf_max_value == 7.0
    for h in (10, 11):
        assert rows[h].n_events == 0 and rows[h].is_gap is True
        assert rows[h].locf_max_value == 7.0  # carried from hour 9
    assert rows[12].locf_max_value == 2.0     # fresh observation resets


def test_gapfill_grids_per_series(spark):
    """Each event_type gets its OWN [first, last] grid — series do not
    inherit one another's calendar bounds."""
    ev = _ev(spark, [
        (1, datetime(2024, 5, 1, 0, 0), 1, "long", 1.0),
        (2, datetime(2024, 5, 1, 23, 0), 1, "long", 1.0),
        (3, datetime(2024, 5, 1, 10, 0), 1, "short", 1.0),
    ])
    out = gapfill_locf(ev).collect()
    assert sum(r.event_type == "long" for r in out) == 24
    assert sum(r.event_type == "short" for r in out) == 1


def test_state_intervals_collapse_and_chain(spark):
    """Timeline A A B A: three intervals; each valid_to equals the next
    valid_from (half-open chain); only the last is current."""
    ts = [datetime(2024, 5, 1, 9, m) for m in (0, 10, 20, 30)]
    ev = _ev(spark, [
        (1, ts[0], 7, "A", 0.0),
        (2, ts[1], 7, "A", 0.0),
        (3, ts[2], 7, "B", 0.0),
        (4, ts[3], 7, "A", 0.0),
    ])
    out = state_intervals(ev).collect()
    assert [(r.state, r.n_events) for r in out] == [("A", 2), ("B", 1), ("A", 1)]
    assert [r.seq_no for r in out] == [1, 2, 3]
    assert out[0].valid_from == ts[0] and out[0].valid_to == ts[2]
    assert out[1].valid_to == ts[3]
    assert out[2].valid_to is None and out[2].is_current is True
    assert not out[0].is_current and not out[1].is_current


def test_state_intervals_per_user_isolation(spark):
    """A second user's events never split or extend the first user's
    intervals."""
    ev = _ev(spark, [
        (1, datetime(2024, 5, 1, 9, 0), 1, "A", 0.0),
        (2, datetime(2024, 5, 1, 9, 5), 2, "B", 0.0),
        (3, datetime(2024, 5, 1, 9, 10), 1, "A", 0.0),
    ])
    out = {(r.user_id, r.seq_no): r for r in state_intervals(ev).collect()}
    assert set(out) == {(1, 1), (2, 1)}
    assert out[(1, 1)].n_events == 2 and out[(1, 1)].is_current is True


def test_percentile_disc_returns_group_elements(spark, sf_dir):
    """Every reported percentile must be an actual order value of its
    priority class (discrete, not interpolated)."""
    from opencode_hive_archon_spark.operators.timeseries import (
        agg_percentile_disc,
    )
    from opencode_hive_archon_spark.session import read_table

    out = agg_percentile_disc(spark, sf_dir).collect()
    assert len(out) > 0
    orders = (
        read_table(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_totalprice")
        .collect()
    )
    by_prio: dict[str, set[float]] = {}
    for r in orders:
        by_prio.setdefault(r.o_orderpriority, set()).add(r.o_totalprice)
    for r in out:
        vals = by_prio[r.o_orderpriority]
        for p in (r.p50, r.p90, r.p99):
            assert p in vals
        assert r.p50 <= r.p90 <= r.p99
        assert r.min_price <= r.p50 and r.p99 <= r.max_price


def test_linkage_blocks_and_threshold(spark, sf_dir):
    """Pairs share a head noun, are canonically ordered, and sit within
    the distance bound; the known cold->old pair appears at distance 1."""
    from opencode_hive_archon_spark.operators.linkage import (
        LINK_MAX_DIST,
        part_name_linkage,
    )

    out = part_name_linkage(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        assert r.name_a < r.name_b
        assert r.name_a.split(" ")[-1] == r.name_b.split(" ")[-1]
        assert 0 <= r.edit_dist <= LINK_MAX_DIST
        assert r.n_parts_a > 0 and r.n_parts_b > 0
    pairs = {(r.name_a, r.name_b): r.edit_dist for r in out}
    cold_old = [(a, b) for (a, b) in pairs if a.startswith("cold ") and b == "old " + a[5:]]
    assert cold_old and all(pairs[p] == 1 for p in cold_old)


def test_rolling_active_users_window_semantics(spark):
    """A user active only on day 1 counts toward WAU for report days 1-7
    and not day 8; DAU is 0 on their inactive report days; the complete
    flag turns on exactly when the trailing window fits."""
    from opencode_hive_archon_spark.operators.funnel import (
        ROLL_DAYS,
        rolling_active_report,
    )

    ev = _ev(spark, [
        (1, datetime(2024, 5, 1, 10, 0), 1, "view", 0.0),
        # a second user keeps the observed range open through day 9
        (2, datetime(2024, 5, 9, 10, 0), 2, "view", 0.0),
    ])
    rows = {r.report_day.day: r for r in rolling_active_report(ev).collect()}
    for d in range(1, 8):
        assert rows[d].wau >= 1  # user 1 contributes through day 7
    # day 8: user 1's window expired, user 2's hasn't started — a
    # zero-active day emits NO row (the frame is contribution-driven;
    # compose with a gapfill grid for dense reporting)
    assert 8 not in rows and 9 in rows and rows[9].wau == 1
    assert rows[1].dau == 1 and rows[2].dau == 0
    assert rows[1].stickiness == 1.0 and rows[2].stickiness == 0.0
    # complete iff report_day >= min_day + 6
    for d, r in rows.items():
        assert r.complete == (d >= 1 + ROLL_DAYS - 1)


def test_revenue_concentration_shares(spark, sf_dir):
    """Deciles 1..10, balanced cell sizes, shares recompute from the
    decimal sums, and the cumulative share closes at exactly 1.0."""
    from opencode_hive_archon_spark.operators.funnel import (
        CONC_BUCKETS,
        orders_revenue_concentration,
    )

    out = sorted(
        orders_revenue_concentration(spark, sf_dir).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in out] == list(range(1, CONC_BUCKETS + 1))
    sizes = [r.n_customers for r in out]
    assert max(sizes) - min(sizes) <= 1  # ntile balance
    spends = [r.decile_spend for r in out]
    assert spends == sorted(spends, reverse=True)  # deciles ranked by spend
    total = sum(spends)
    running = 0.0
    for r in out:
        running += r.decile_spend
        assert abs(r.share - r.decile_spend / total) < 1e-12
    assert out[-1].cum_share == 1.0


def test_backlog_sweep_line_invariants(spark, sf_dir):
    """The running count never goes negative, closes at zero (every order
    eventually ships), and matches a direct interval-stabbing count on a
    mid-range day — the self-join formulation the operator avoids."""
    from opencode_hive_archon_spark.operators.timeseries import (
        orders_open_backlog,
    )
    from opencode_hive_archon_spark.session import read_table
    import pyspark.sql.functions as F

    out = orders_open_backlog(spark, sf_dir).collect()
    assert all(r.open_orders >= 0 for r in out)
    assert out[-1].open_orders == 0
    assert max(r.open_orders for r in out) > 0
    probe = out[len(out) // 2].day
    orders = read_table(spark, sf_dir, "orders")
    closes = (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("last_ship"))
    )
    stab = (
        orders.join(closes, orders.o_orderkey == closes.l_orderkey)
        .where(
            (F.date_trunc("day", "o_orderdate") <= F.lit(probe))
            & (
                F.greatest(
                    F.date_trunc("day", "o_orderdate"),
                    F.date_trunc("day", "last_ship"),
                )
                >= F.lit(probe)
            )
        )
        .count()
    )
    probed = next(r for r in out if r.day == probe)
    assert probed.open_orders == stab


def test_streaks_anchor_trick(spark):
    """Days 1,2,3,5,6 -> max streak 3; a single-day user -> 1; the
    distribution partitions the users."""
    from opencode_hive_archon_spark.operators.funnel import streak_report

    ev = _ev(spark, [
        (1, datetime(2024, 5, 1, 9, 0), 1, "view", 0.0),
        (2, datetime(2024, 5, 2, 9, 0), 1, "view", 0.0),
        (3, datetime(2024, 5, 3, 9, 0), 1, "view", 0.0),
        (4, datetime(2024, 5, 5, 9, 0), 1, "view", 0.0),
        (5, datetime(2024, 5, 6, 9, 0), 1, "view", 0.0),
        (6, datetime(2024, 5, 2, 12, 0), 1, "click", 0.0),  # same-day dup
        (7, datetime(2024, 5, 9, 9, 0), 2, "view", 0.0),
    ])
    out = {r.max_streak: r for r in streak_report(ev).collect()}
    assert set(out) == {1, 3}
    assert out[3].n_users == 1 and out[3].example_user == 1
    assert out[1].n_users == 1 and out[1].example_user == 2


def test_session_overlap_bucket_decomposition_exact(spark, sf_dir):
    """The bucket-decomposed overlap join must equal the plain θ-join —
    including pairs whose overlap spans MANY buckets (each must count
    exactly once, the start-bucket pairing rule)."""
    from opencode_hive_archon_spark.operators.relational import events_sessionize
    from opencode_hive_archon_spark.operators.timeseries import (
        events_session_overlap,
    )

    sess = (
        events_sessionize(spark, sf_dir)
        .select("user_id", "session_seq", "start_us", "end_us")
        .localCheckpoint(eager=True)
    )
    a, b = sess.alias("a"), sess.alias("b")
    theta = (
        a.join(
            b,
            (F.col("a.user_id") < F.col("b.user_id"))
            & (F.col("a.start_us") <= F.col("b.end_us"))
            & (F.col("b.start_us") <= F.col("a.end_us")),
        )
        .select(
            F.col("a.user_id").alias("ua"), F.col("a.session_seq").alias("sa"),
            F.col("b.user_id").alias("ub"), F.col("b.session_seq").alias("sb"),
        )
        .collect()
    )
    got = events_session_overlap(spark, sf_dir).collect()
    n_pairs_theta = len(theta)
    assert n_pairs_theta > 0, "fixture has no cross-user session overlaps"
    # every pair contributes to exactly two endpoint rows
    assert sum(r["n_concurrent"] for r in got) == 2 * n_pairs_theta
    for r in got:
        assert r["max_overlap_us"] <= r["overlap_us"]
        assert r["n_concurrent"] >= 1
