"""Tests for operators/sampling.py: stratified sample, sequence packing,
and the Misra-Gries heavy-hitter sketch."""

from __future__ import annotations

from pyspark.sql import functions as F

from opencode_hive_archon_spark.operators.sampling import (
    HH_COUNTERS,
    HH_PHI,
    PACK_BUDGET,
    SAMPLE_RATES,
    _mg_summaries,
    agg_heavy_hitters,
    corpus_pack_sequences,
    corpus_stratified_sample,
)


def test_mg_candidates_contain_heavy_hitters_under_eviction(spark):
    """The load-bearing sketch guarantee, exercised where the driver data
    can't reach at test scale: key cardinality (5000) far above
    HH_COUNTERS (512), so the decrement path actually runs. Planted
    heavy keys (~8% of N each) must ALWAYS survive as candidates —
    Mergeable-Summaries bound: undercount ≤ N/(K+1) ≈ 0.2%·N."""
    n_tail, tail_card, n_heavy = 30_000, 5_000, 2_500
    tail = spark.range(n_tail).select(
        (F.col("id") % tail_card + 100).alias("hot_key"))
    heavy = (
        spark.range(n_heavy * 3)
        .select((F.col("id") % 3).alias("hot_key"))
    )
    df = tail.unionAll(heavy).repartition(8)
    cands = {r.hot_key for r in _mg_summaries(df).collect()}
    assert {0, 1, 2} <= cands
    # sketch actually compressed: far fewer candidates than distinct keys
    assert len(cands) <= 8 * HH_COUNTERS


def test_heavy_hitters_exact_vs_groupby(spark, sf_dir):
    """End-to-end: sketch + verify must equal the plain exact computation
    (the sketch may only prune work, never change the answer)."""
    from opencode_hive_archon_spark.operators.sampling import _hot_key_col
    from opencode_hive_archon_spark.session import read_table

    got = {(r.hot_key, r.n_events) for r in
           agg_heavy_hitters(spark, sf_dir).collect()}
    ev = read_table(spark, sf_dir, "events")
    counted = (
        ev.select(_hot_key_col().alias("k")).groupBy("k")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = ev.count()
    want = {(r.k, r.c) for r in
            counted.where(F.col("c") > HH_PHI * total).collect()}
    assert got == want and got


def test_pack_bins_respect_budget_plus_one_doc(spark, sf_dir):
    """Concat-then-chunk invariant: a bin holds at most PACK_BUDGET chars
    plus the one document that straddles its upper boundary."""
    from opencode_hive_archon_spark.session import read_table

    max_doc = (
        read_table(spark, sf_dir, "documents")
        .agg(F.max("n_chars")).collect()[0][0]
    )
    rows = corpus_pack_sequences(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.max_bin_chars <= PACK_BUDGET + max_doc
        assert r.n_docs >= r.n_bins  # every bin has at least one doc


def test_stratified_sample_rates_and_determinism(spark, sf_dir):
    """Achieved rates track the configured mixture (binomial tolerance)
    and the report is bit-identical across runs (no RNG anywhere)."""
    a = corpus_stratified_sample(spark, sf_dir).collect()
    b = corpus_stratified_sample(spark, sf_dir).collect()
    assert a == b
    for r in a:
        target = SAMPLE_RATES.get(r.lang, 1.0)
        assert abs(r.achieved_rate - target) < 0.25, (r.lang, r.achieved_rate)
        assert r.n_kept <= r.n_total


def test_zorder_skips_more_than_single_key_sort(spark, sf_dir):
    """The load-bearing layout claim: for a predicate on the NON-sort key,
    the Z-ordered layout must prune file-groups the date-sorted layout
    cannot (which degenerates to a full scan), while staying bounded on
    the date predicate."""
    from opencode_hive_archon_spark.sources.zorder import (
        N_GROUPS,
        source_zorder_layout,
    )

    rows = {r.layout: r for r in source_zorder_layout(spark, sf_dir).collect()}
    z, d = rows["zorder"], rows["date_sort"]
    assert z.groups_total == N_GROUPS == d.groups_total
    assert z.scan_custkey_pred < d.scan_custkey_pred
    assert d.scan_custkey_pred == N_GROUPS  # baseline cannot prune custkey
    assert z.scan_date_pred < N_GROUPS // 2  # still clustered on date


def test_stratified_sample_prunes_scan(spark, sf_dir):
    """The sample report must never read the text payload: ReadSchema keeps
    only (doc_id, lang, n_chars) — at 100 TB that is the difference between
    scanning metadata columns and scanning the corpus."""
    from tests.test_plan_shapes import plan

    p = plan(corpus_stratified_sample(spark, sf_dir))
    read = p.split("ReadSchema:")[1].splitlines()[0]
    assert "text" not in read, read
    for col in ("doc_id", "lang", "n_chars"):
        assert col in read, read


def test_heavy_hitters_verify_is_broadcast(spark, sf_dir):
    """The exact-verify pass must broadcast the candidate set against the
    events scan — a shuffle join there would re-introduce the full-key
    exchange the sketch exists to avoid."""
    from tests.test_plan_shapes import plan

    p = plan(agg_heavy_hitters(spark, sf_dir))
    assert "BroadcastHashJoin" in p, p[:800]
    # the events scan reads only the key column
    read = p.split("ReadSchema:")[1].splitlines()[0]
    assert "user_id" in read and "props" not in read, read


def test_funnel_single_user_exchange(spark, sf_dir):
    """The funnel docstring's load-bearing claim: three stacked stage
    windows + the per-user collapse all reuse ONE user_id hash exchange
    (the only other exchange is the 1-row-per-partition global collapse)."""
    import re

    from opencode_hive_archon_spark.operators.funnel import events_funnel
    from tests.test_plan_shapes import plan

    p = plan(events_funnel(spark, sf_dir))
    hash_ex = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", p)
    assert len(hash_ex) == 1 and "user_id" in hash_ex[0], hash_ex
    assert p.count("Window ") == 3, p.count("Window ")


def test_funnel_stage_ordering(spark, sf_dir):
    """Monotone funnel: each stage's population is a subset of the
    previous one (strict temporal ordering enforces this by construction;
    the assert catches any regression to unordered per-stage minima)."""
    from opencode_hive_archon_spark.operators.funnel import events_funnel

    r = events_funnel(spark, sf_dir).collect()[0]
    assert r.n_users >= r.n_viewed >= r.n_clicked >= r.n_purchased
    assert r.n_purchased > 0  # data sanity: the funnel is actually exercised


def test_decontaminate_catches_planted_split_leaks(spark, sf_dir):
    """The audit must find leakage: the corpus plants near/exact dups, a
    random (hash) split puts some pairs on opposite sides, and every such
    pair shares long grams. Zero contamination would mean the check is
    broken, not that the corpus is clean."""
    from opencode_hive_archon_spark.operators.decontaminate import (
        corpus_decontaminate,
    )

    r = corpus_decontaminate(spark, sf_dir).collect()[0]
    assert r.n_val_docs > 0 and r.n_train_docs > 0
    assert 0 < r.n_contaminated_val <= r.n_val_docs
    assert r.n_pairs >= r.n_contaminated_val


def test_mg_reduce_bound_property():
    """Hypothesis: over arbitrary streams and arbitrary chunkings, the
    batched MG reduction never undercounts any key by more than
    N/(k+1), and every key with true frequency above that bound
    survives. Pure-python — no Spark job per example."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from opencode_hive_archon_spark.operators.sampling import mg_reduce

    K = 8  # small capacity so eviction actually triggers

    @settings(max_examples=200, deadline=None)
    @given(
        stream=st.lists(st.integers(min_value=0, max_value=40), max_size=300),
        chunks=st.integers(min_value=1, max_value=7),
    )
    def check(stream, chunks):
        true = Counter(stream)
        n = len(stream)
        counts: dict = {}
        step = max(1, (n // chunks) or 1)
        for i in range(0, max(n, 1), step):
            counts = mg_reduce(counts, Counter(stream[i : i + step]), k=K)
        bound = n / (K + 1)
        for key, f in true.items():
            est = counts.get(key, 0)
            assert est >= f - bound, (key, f, est, bound)
            if f > bound:
                assert key in counts, (key, f, bound)

    check()


def test_importance_sample_unbiased_and_deterministic(spark, sf_dir):
    """The md5-uniform device makes keep-probability equal the quality
    score: per language, the achieved rate must track mean quality within
    binomial tolerance, the kept subset's mean quality must sit at or
    above the population's, and the report must be bit-identical across
    runs (no RNG state anywhere)."""
    from opencode_hive_archon_spark.operators.sampling import (
        corpus_importance_sample,
    )

    a = corpus_importance_sample(spark, sf_dir).collect()
    b = corpus_importance_sample(spark, sf_dir).collect()
    assert a == b
    assert len(a) > 0
    for r in a:
        assert 0 < r.n_kept <= r.n_total
        assert abs(r.achieved_rate - r.mean_quality_all) < 0.2, (
            r.lang, r.achieved_rate, r.mean_quality_all,
        )
        assert r.mean_quality_kept >= r.mean_quality_all - 1e-9, r.lang


def test_shard_plan_balance_and_coverage(spark, sf_dir):
    """Shard assignment must cover every document exactly once, stay
    balanced within binomial noise (the zero-modulo-bias claim), and be
    bit-identical across runs."""
    from opencode_hive_archon_spark.operators.sampling import (
        N_SHARDS,
        corpus_shard_plan,
    )
    from opencode_hive_archon_spark.session import read_table

    a = corpus_shard_plan(spark, sf_dir).collect()
    assert a == corpus_shard_plan(spark, sf_dir).collect()
    n_docs = read_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in a) == n_docs
    assert sorted(r.shard for r in a) == list(range(N_SHARDS))
    mean = n_docs / N_SHARDS
    for r in a:
        # 5-sigma binomial bound on per-shard occupancy
        assert abs(r.n_docs - mean) < 5 * mean ** 0.5 + 3, (r.shard, r.n_docs)


def test_anomaly_zscore_planted_spike(spark):
    """A 10x spike after a steady week must flag; partial trailing windows
    must never flag; z2 must equal (kx-S)^2/(kQ-S^2) exactly."""
    from datetime import datetime

    from opencode_hive_archon_spark.operators.funnel import (
        DRIFT_TRAIL,
        anomaly_report,
    )

    counts = [10, 11, 9, 10, 10, 11, 9, 100]  # 7 steady days, then a spike
    rows = []
    for d, c in enumerate(counts, start=1):
        rows += [(datetime(2024, 3, d, 12, 0, 0), "a")] * c
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string")
    out = {r.day.day: r for r in anomaly_report(ev).collect()}
    # days 1..7: trailing window not yet full -> never flagged
    for d in range(1, DRIFT_TRAIL + 1):
        assert out[d].trail_n == d - 1
        assert out[d].is_anomaly is False
    spike = out[8]
    assert spike.trail_n == DRIFT_TRAIL and spike.trail_sum == sum(counts[:7])
    assert spike.is_anomaly is True
    k, x, s = DRIFT_TRAIL, counts[7], sum(counts[:7])
    q = sum(c * c for c in counts[:7])
    assert spike.z2 == (k * x - s) ** 2 / (k * q - s * s)


def test_anomaly_zscore_zero_variance_spike(spark):
    """Constant week then any deviation: var=0 -> z2 is NULL but the
    integer predicate still flags (RHS is exactly 0)."""
    from datetime import datetime

    from opencode_hive_archon_spark.operators.funnel import anomaly_report

    rows = []
    for d in range(1, 8):
        rows += [(datetime(2024, 3, d), "a")] * 10
    rows += [(datetime(2024, 3, 8), "a")] * 11
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string")
    last = [r for r in anomaly_report(ev).collect() if r.day.day == 8][0]
    assert last.is_anomaly is True and last.z2 is None
