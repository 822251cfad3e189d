"""Physical plan audits — the properties that decide 100 TB viability.

Each assertion pins a plan shape that must survive refactors: filters
reaching the parquet scan, column pruning, broadcast joins for small dims,
TakeOrderedAndProject for top-k, partial aggregation, and whole-stage
codegen in hot paths. A regression here is a scale bug even when results
stay correct.
"""

from __future__ import annotations

import re

from opencode_hive_archon_spark.operators import recall as RC
from opencode_hive_archon_spark.operators import relational as R
from opencode_hive_archon_spark.operators import similarity as S
from opencode_hive_archon_spark.operators import textops as T


def plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_pushdown_and_pruning(spark, sf_dir):
    p = plan(R.scan_project_filter(spark, sf_dir))
    assert "PushedFilters: [" in p and "l_shipdate" in p.split("PushedFilters")[1][:200]
    # ReadSchema must not include unused columns
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "l_tax" not in read_schema and "l_returnflag" not in read_schema


def test_pricing_summary_partial_agg(spark, sf_dir):
    df = R.pricing_summary(spark, sf_dir)
    p = plan(df)
    # partial (map-side) + final aggregate pair: the shuffle carries partial
    # states, not rows
    assert "partial_sum" in p and p.count("HashAggregate") >= 2
    # codegen markers appear once AQE finalizes the plan — execute, re-read
    df.collect()
    final = plan(df)
    # '*(n)' prefixes mark WholeStageCodegen stages in the final plan
    assert re.search(r"\*\(\d+\)", final), final[:500]


def test_small_dims_broadcast(spark, sf_dir):
    assert "BroadcastHashJoin" in plan(R.join_broadcast(spark, sf_dir))
    # customer (150*sf rows) should broadcast against the big fact side too
    assert "BroadcastHashJoin" in plan(R.join_shuffle(spark, sf_dir))


def test_topk_no_global_sort(spark, sf_dir):
    p = plan(R.sort_multi_limit(spark, sf_dir))
    assert "TakeOrderedAndProject" in p
    p2 = plan(RC.recall_score_topk(spark, sf_dir))
    assert "TakeOrderedAndProject" in p2


def test_semi_anti_stay_semi(spark, sf_dir):
    p = plan(R.join_semi_anti(spark, sf_dir))
    assert "LeftSemi" in p and "LeftAnti" in p


def test_similarity_broadcasts_query_vector(spark, sf_dir):
    p = plan(S.similarity_topk(spark, sf_dir))
    assert "Broadcast" in p  # 1-row query vector must never shuffle the scan side
    assert "TakeOrderedAndProject" in p


def test_no_cartesian_products(spark, sf_dir):
    for fn in (
        R.join_shuffle,
        R.join_asof_event_order,
        T.multimodal_join,
        S.similarity_join_labels,
    ):
        assert "CartesianProduct" not in plan(fn(spark, sf_dir)), fn.__name__


def test_asof_single_shuffle(spark, sf_dir):
    """The union+window as-of formulation must shuffle once on user_id, not
    join-explode: no SortMergeJoin / no BroadcastNestedLoop in the plan."""
    p = plan(R.join_asof_event_order(spark, sf_dir))
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    assert p.count("Exchange") <= 2  # union shuffle + AQE read at most


def test_window_functions_codegen(spark, sf_dir):
    p = plan(R.window_rank_topk_per_group(spark, sf_dir))
    assert "Window" in p and "Filter" in p


def test_dedup_verify_no_corpus_broadcast(spark, sf_dir):
    """The doc->shingles verify join must never broadcast the corpus: no
    forced F.broadcast survives in the module, and the physical verify join
    is the SHUFFLE_HASH-hinted join keyed on doc_id. (Planner-chosen
    broadcasts of genuinely small derived inputs are fine — those flip to
    shuffles when real statistics say the input is big.)"""
    import inspect

    from opencode_hive_archon_spark.operators import dedup as D

    assert "F.broadcast" not in inspect.getsource(D)
    for fn in (D.dedup_near, D.dedup_minhash_lsh, D.dedup_ngram_jaccard):
        p = plan(fn(spark, sf_dir))
        assert "ShuffledHashJoin" in p, fn.__name__
        assert "BroadcastNestedLoop" not in p, fn.__name__


def test_partitioned_write_prunes_partitions(spark, sf_dir):
    """source_partitioned_pruning's read-back filter must be a PARTITION
    filter: the scan lists only the selected o_year directory instead of
    reading every partition and filtering rows."""
    from opencode_hive_archon_spark.sources.io import PRUNE_YEAR, source_partitioned_pruning

    p = plan(source_partitioned_pruning(spark, sf_dir))
    pf = p.split("PartitionFilters:")[1].splitlines()[0]
    assert f"o_year = {PRUNE_YEAR}" in pf or f"o_year#" in pf, pf


def test_batch_ann_broadcasts_queries(spark, sf_dir):
    """ann_batch_topk: the query set broadcasts; the corpus never shuffles
    before scoring; per-query rank keeps a single window exchange."""
    p = plan(S.ann_batch_topk(spark, sf_dir))
    assert "Broadcast" in p
    assert "CartesianProduct" not in p


def test_plandiff_single_aggregate(spark, sf_dir):
    """plan_diff_metrics is ONE declarative plan (full-outer join + one
    aggregate) — the module must not run driver-side .count() actions."""
    import inspect

    from opencode_hive_archon_spark.operators import plandiff as PD

    assert ".count()" not in inspect.getsource(PD)
    p = plan(PD.plan_diff_metrics(spark, sf_dir))
    assert "FullOuter" in p


def test_embedding_dedup_no_nested_loop(spark, sf_dir):
    """dedup_embedding_cosine must be the LSH-pruned equi-join plan. The
    only nested-loop joins allowed are the Cross joins against the 1-row
    broadcast hyperplane aggregate — the old all-pairs anti-pattern was an
    *Inner* nested loop whose sole condition was vec_a < vec_b."""
    p = plan(S.dedup_embedding_cosine(spark, sf_dir))
    assert "CartesianProduct" not in p
    for line in p.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "Cross" in line and "Inner" not in line, line
    assert "ShuffledHashJoin" in p  # pinned verify joins on vec_id


def test_quantized_ann_pool_shape(spark, sf_dir):
    """SQ8 ANN: the 1-row quantized query must broadcast (never shuffle the
    corpus-side scan), the pool cut must be TakeOrderedAndProject (no global
    sort), and nothing may degenerate into a cartesian product."""
    p = plan(S.ann_quantized_topk(spark, sf_dir))
    assert "Broadcast" in p
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p


def test_corpus_curation_fused_filters(spark, sf_dir):
    """Curation composite: both gates must reach the scan side (early row
    elimination before any shuffle), dedup must be a map-side-limited window
    over the sha256 digest, and the dedup shuffle must carry the projected
    features — never the raw text column."""
    p = plan(T.corpus_curation(spark, sf_dir))
    assert "CartesianProduct" not in p
    # gates fused below every exchange: the scan-stage Filter carries the
    # quality expression (least(1.0, ...)), so rows die before shuffling
    assert "PushedFilters: [IsNotNull(text)]" in p
    assert p.split("Exchange RoundRobinPartitioning")[1].count("least(1.0") > 0
    # dedup window: digest-partitioned with a map-side partial group limit
    assert "sha2" in p and "WindowGroupLimit" in p and p.count("WindowGroupLimit") >= 2
    # the digest is computed map-side (below its exchange), so the shuffle
    # key is the 32-byte hash, not the document text
    parts = p.split("Exchange hashpartitioning(_w0")
    assert len(parts) > 1, p
    assert "sha2" in parts[1]
    # exchanges: _docs re-split, digest dedup, (lang,source) distinct,
    # lang agg, final range sort — nothing else
    assert p.count("Exchange") <= 5, p


def test_sessionize_single_user_shuffle(spark, sf_dir):
    """events_sessionize claims ONE user_id hash shuffle end to end: both
    windows and the session aggregate must reuse that partitioning; only the
    final presentation sort adds a range exchange."""
    p = plan(R.events_sessionize(spark, sf_dir))
    assert p.count("Exchange hashpartitioning") <= 2  # user_id + (user,seq) agg
    assert "CartesianProduct" not in p


def test_catalog_roundtrip_partition_pruned(spark, sf_dir):
    """catalog_roundtrip: the read-back is a CATALOG table scan (resolved by
    name, not path) whose lang filter lands in PartitionFilters — only the
    lang=en directory of the managed table is listed/read."""
    from opencode_hive_archon_spark.sources import catalog as C

    p = plan(C.catalog_roundtrip(spark, sf_dir))
    pf = p.split("PartitionFilters:")[1].splitlines()[0]
    assert "lang" in pf, pf
    assert C.CURATED_TABLE in p


def test_train_val_split_prunes_text_column(spark, sf_dir):
    """corpus_train_val_split: the split is arithmetic on doc_id — the wide
    text column must not reach the parquet scan (ReadSchema pruned), and the
    aggregate must be map-side partial."""
    p = plan(T.corpus_train_val_split(spark, sf_dir))
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "text" not in read_schema, read_schema
    assert "partial_" in p and p.count("HashAggregate") >= 2


def test_bucketed_join_query_plan_is_shuffle_free(spark, sf_dir):
    """source_bucketed_join: the whole plan — both fact scans, the
    sort-merge join, and the per-order aggregate — must contain ZERO
    Exchange nodes. The bucketed layout (bucketBy+sortBy on the join key,
    same bucket count both sides) provides the distribution at write time;
    the aggregate's grouping keys contain the bucket key, so it rides the
    same partitioning; the top-k is TakeOrderedAndProject, not a global
    sort. This is the repo's central 100-TB layout claim, pinned."""
    from opencode_hive_archon_spark.sources import bucketed as B

    p = plan(B.source_bucketed_join(spark, sf_dir))
    assert "SortMergeJoin" in p
    assert "Exchange" not in p, p
    assert "TakeOrderedAndProject" in p
    # both scans are bucketed catalog-table scans with the declared count
    assert p.count(f"Bucketed: true") == 2 or p.count("SelectedBucketsCount") == 2, p


def test_pretraining_pipeline_fused(spark, sf_dir):
    """corpus_pretraining_pipeline: stacking split on curation must add no
    shuffle — the exchanges are exactly the curation set (scan re-split,
    digest dedup, two-phase distinct-count aggregate, presentation sort) and
    the split expression is fused below the dedup exchange."""
    p = plan(T.corpus_pretraining_pipeline(spark, sf_dir))
    assert "CartesianProduct" not in p
    assert p.count("Exchange") <= 5, p
    # dedup digest computed map-side, below its exchange
    parts = p.split("Exchange hashpartitioning(_w0")
    assert len(parts) > 1, p
    assert "sha2" in parts[1]


def test_graph_khop_no_cartesian(spark, sf_dir):
    """recall_graph_khop: every BFS hop is an equi-join (frontier vs edges)
    — no unbounded cartesian anywhere in the plan. (BroadcastNestedLoop
    appears only for the 1-row broadcast hyperplane frame inside the edge
    pipeline — a broadcast of a literal, fine at any scale.)"""
    from opencode_hive_archon_spark.operators import graph as G

    p = plan(G.recall_graph_khop(spark, sf_dir))
    assert "CartesianProduct" not in p


def test_schema_evolution_read_pruned(spark, sf_dir):
    """source_schema_evolution: the mergeSchema two-generation read must
    still prune columns — only the 3 consumed columns (o_orderpriority,
    o_totalprice, o_orderdate is not even needed post-write) reach the scan,
    not the full ~9-column orders schema."""
    from opencode_hive_archon_spark.sources import io as IO

    p = plan(IO.source_schema_evolution(spark, sf_dir))
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "o_totalprice" in read_schema
    for col in ("o_comment", "o_clerk", "o_custkey", "o_orderdate"):
        assert col not in read_schema, f"{col} not pruned: {read_schema}"


def test_q17_aggregate_input_pruned(spark, sf_dir):
    """q17_small_quantity_revenue (round-9 re-plan): the decorrelated
    per-part aggregate must consume lineitem AFTER the broadcast semi-join
    against the brand/size-filtered partkeys — at 100× scale the difference
    between shuffling every partkey and the ~1/1000 actually probed. The
    pruned aggregate is then broadcast back, so the probe side joins with
    zero shuffles of its own."""
    from opencode_hive_archon_spark.operators import tpch_style as TP

    p = plan(TP.q17_small_quantity_revenue(spark, sf_dir))
    # both lineitem scans (aggregate side + probe side) are semi-pruned
    assert p.count("LeftSemi") == 2, p
    assert "SortMergeJoin" not in p
    # the ONLY key shuffle is the pruned aggregate's own partkey exchange
    assert p.count("Exchange hashpartitioning") == 1, p
    # and that aggregate's partial stage sits above a LeftSemi, not a bare scan
    partial = p.index("partial_sum(cast(l_quantity")
    assert "LeftSemi" in p[partial:], "aggregate input not semi-pruned"


def test_dedup_pipeline_ladder_shape(spark, sf_dir):
    """corpus_dedup_pipeline: the fused ladder's final mapping must be
    cheap — its live prefix (everything above the first cached leaf) is a
    broadcast join plus ONE presentation range-sort, no key shuffle and no
    sort-merge join of its own. The expensive rungs (SSJoin, CC) execute
    once behind materialized leaves, and the SSJoin's scale-pinned
    ShuffledHashJoin verify (never a corpus broadcast) must survive this
    composition. The whole plan — cached subtrees included — stays free of
    cartesian products."""
    from opencode_hive_archon_spark.operators import dedup as D

    p = plan(D.corpus_dedup_pipeline(spark, sf_dir))
    assert "CartesianProduct" not in p
    assert p.count("Exchange rangepartitioning") == 1, "one presentation sort"
    live_prefix = p.split("InMemoryRelation")[0]
    assert "BroadcastHashJoin" in live_prefix
    assert "SortMergeJoin" not in live_prefix
    assert "Exchange hashpartitioning" not in live_prefix
    assert "ShuffledHashJoin" in p, "SSJoin verify join lost its pinned shape"


def test_gopher_rules_single_pass(spark, sf_dir):
    """corpus_gopher_rules is ONE projection + one lang-keyed aggregate:
    exactly the deliberate repartition of the single-row-group scan, the
    agg's hash exchange, and the presentation sort — no join, no extra
    shuffle, and the rule arithmetic stays inside codegen."""
    from opencode_hive_archon_spark.operators import quality_rules as QR

    p = plan(QR.corpus_gopher_rules(spark, sf_dir))
    assert "Join" not in p, p
    assert p.count("Exchange hashpartitioning") == 1, p
    assert p.count("Exchange rangepartitioning") == 1, p
    assert p.count("Exchange RoundRobinPartitioning") == 1, p  # _docs re-split
    assert "partial_count" in p or "partial_sum" in p  # map-side combine


def test_tfidf_single_corpus_scan(spark, sf_dir):
    """corpus_tfidf_topterms: tf and df both read the MATERIALIZED
    incidence table (one corpus explode total); the live plan above the
    cached leaf carries only vocabulary-sized exchanges, the 1-row total is
    a broadcast, and no sort-merge join forms."""
    from opencode_hive_archon_spark.operators import quality_rules as QR

    df = QR.corpus_tfidf_topterms(spark, sf_dir)
    p = plan(df)
    live = p.split("InMemoryRelation")[0]
    assert "BroadcastNestedLoopJoin" in live or "BroadcastHashJoin" in live
    assert "SortMergeJoin" not in live
    # the token explode appears only inside the cached incidence subtree
    assert "Generate explode" not in live


def test_pq_broadcast_only_joins(spark, sf_dir):
    """ann_pq_topk: every join in the live plan is broadcast (codebook,
    ADC table, pool, query vector) — corpus-sized data is never the build
    side and never shuffles for a join; the only hash exchanges are the
    argmin/ADC aggregates."""
    from opencode_hive_archon_spark.operators import similarity as SIM

    p = plan(SIM.ann_pq_topk(spark, sf_dir))
    assert "SortMergeJoin" not in p, p
    assert "ShuffledHashJoin" not in p, p
    assert "CartesianProduct" not in p, p
    assert "TakeOrderedAndProject" in p  # top-k never global-sorts


def test_pagerank_iteration_state_narrow(spark, sf_dir):
    """graph_pagerank's live plan (above the final checkpointed ranks) is
    a join to the label dim plus the top-k — the per-round work is behind
    lineage cuts, and the final top-50 uses TakeOrderedAndProject, not a
    global sort."""
    from opencode_hive_archon_spark.operators import graph as G

    p = plan(G.graph_pagerank(spark, sf_dir))
    assert "TakeOrderedAndProject" in p, p
    assert "CartesianProduct" not in p


def test_compaction_plan_ledger_sized(spark, sf_dir):
    """source_compaction_plan: the only corpus-sized stage is the
    (year, month) count aggregate — everything after (packing window,
    report) runs on the ledger. Pin: exactly one partial/final count pair
    over the scan, no join anywhere."""
    from opencode_hive_archon_spark.sources import io as IO

    p = plan(IO.source_compaction_plan(spark, sf_dir))
    assert "Join" not in p, p
    assert "partial_count" in p, "ledger aggregate lost map-side combine"
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "o_totalprice" not in read_schema  # only the date column is read


def test_ohlc_single_bucket_shuffle(spark, sf_dir):
    """events_ohlc_bars: both row_number windows and the bar aggregate run
    inside ONE (event_type, bucket) hash exchange; only the presentation
    sort adds a range exchange. The scan reads only the four used columns
    (props/user_id pruned)."""
    from opencode_hive_archon_spark.operators import timeseries as TS

    p = plan(TS.events_ohlc_bars(spark, sf_dir))
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "CartesianProduct" not in p and "Join" not in p
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "props" not in read_schema and "user_id" not in read_schema


def test_state_intervals_single_user_shuffle(spark, sf_dir):
    """events_state_intervals: the lag window, the running-sum window, the
    island aggregate, and the lead window all share the user_id
    partitioning — one hash exchange total (plus the presentation sort)."""
    from opencode_hive_archon_spark.operators import timeseries as TS

    p = plan(TS.events_state_intervals(spark, sf_dir))
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "Join" not in p
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "props" not in read_schema and "value" not in read_schema


def test_gapfill_grid_is_calendar_sized(spark, sf_dir):
    """events_gapfill_locf: the dense grid comes from sequence+explode over
    per-series bounds (one Generate node), never from a join against a
    data-sized frame; the grid join stays broadcast (both sides are
    bucket-cardinality)."""
    from opencode_hive_archon_spark.operators import timeseries as TS

    p = plan(TS.events_gapfill_locf(spark, sf_dir))
    assert "Generate explode" in p, p
    assert "CartesianProduct" not in p


def test_percentile_disc_partial_count(spark, sf_dir):
    """agg_percentile_disc: the companion count/min/max still partial-agg;
    the scan reads only the two used columns."""
    from opencode_hive_archon_spark.operators import timeseries as TS

    p = plan(TS.agg_percentile_disc(spark, sf_dir))
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "o_orderdate" not in read_schema and "o_custkey" not in read_schema
    assert "Join" not in p


def test_linkage_dimension_broadcast(spark, sf_dir):
    """part_name_linkage: the self-join of the vocabulary-sized name
    dimension is a broadcast join on the block key — no shuffle keyed on
    the pair, no cartesian product."""
    from opencode_hive_archon_spark.operators import linkage as LK

    p = plan(LK.part_name_linkage(spark, sf_dir))
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "p_retailprice" not in read_schema and "p_type" not in read_schema


def test_attribution_single_user_shuffle(spark, sf_dir):
    """events_attribution: LOCF windows, purchase filter, and channel
    derivation share the user_id partitioning; only the channel aggregate
    adds its exchange. The scan never reads props/value."""
    from opencode_hive_archon_spark.operators import funnel as FN

    p = plan(FN.events_attribution(spark, sf_dir))
    assert p.count("Exchange hashpartitioning") <= 2, p  # user_id + channel agg
    assert "Join" not in p
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "props" not in read_schema and "value" not in read_schema


def test_countmin_explodes_dimension_not_facts(spark, sf_dir):
    """agg_countmin_sketch: the depth-d Generate sits ABOVE the per-key
    aggregate — fact rows are collapsed before any fan-out — and the
    1024-cell sketch reaches the probes via broadcast."""
    from opencode_hive_archon_spark.operators import sketches as SK

    p = plan(SK.agg_countmin_sketch(spark, sf_dir))
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p
    # the explode consumes the aggregated (key, count) frame, so in the
    # bottom-up physical plan the per-key HashAggregate appears BEFORE the
    # first Generate
    first_gen = p.index("Generate")
    assert "HashAggregate" in p[:first_gen], p[:first_gen]
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert read_schema.count(",") == 0 and "l_suppkey" in read_schema


def test_histogram_partial_agg_and_pruned(spark, sf_dir):
    """agg_histogram: map-side combine on (priority, bin); only the two
    used columns are read."""
    from opencode_hive_archon_spark.operators import sketches as SK

    p = plan(SK.agg_histogram(spark, sf_dir))
    assert "partial_count" in p, p
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "o_orderdate" not in read_schema and "o_comment" not in read_schema


def test_market_basket_shapes(spark, sf_dir):
    """orders_market_basket: the part dimension and both marginal frames
    broadcast; the top-20 is TakeOrdered, not a global sort; no cartesian
    anywhere (the totals cross-join is a broadcast 1-row side)."""
    from opencode_hive_archon_spark.operators import affinity as AF

    p = plan(AF.orders_market_basket(spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "TakeOrderedAndProject" in p, p
    assert "CartesianProduct" not in p


def test_chunking_is_mapper_only(spark, sf_dir):
    """corpus_chunk_overlap: sequence+explode fan-out with NO hash
    exchange before the presentation sort — the chunk cut is a pure
    mapper stage."""
    from opencode_hive_archon_spark.operators import chunking as CH

    p = plan(CH.corpus_chunk_overlap(spark, sf_dir))
    assert "Generate explode" in p, p
    assert p.count("Exchange hashpartitioning") == 0, p
    assert "Join" not in p
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "source" not in read_schema and "n_chars" not in read_schema


def test_rolling_actives_fan_out_after_dedup(spark, sf_dir):
    """events_rolling_active_users: the x7 calendar Generate consumes the
    DEDUPED (user, day) frame — an aggregate precedes the first Generate
    in the bottom-up plan — and raw events are never exploded."""
    from opencode_hive_archon_spark.operators import funnel as FN

    p = plan(FN.events_rolling_active_users(spark, sf_dir))
    assert "Generate explode" in p, p
    first_gen = p.index("Generate")
    assert "HashAggregate" in p[:first_gen], p[:first_gen]
    assert "CartesianProduct" not in p


def test_revenue_concentration_dimension_window(spark, sf_dir):
    """orders_revenue_concentration: one fact-sized exchange (the custkey
    aggregate); the ntile and cumulative windows run over the customer
    dimension; the total is a broadcast 1-row side."""
    from opencode_hive_archon_spark.operators import funnel as FN

    p = plan(FN.orders_revenue_concentration(spark, sf_dir))
    assert "partial_sum" in p, p
    assert "CartesianProduct" not in p
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "o_orderdate" not in read_schema and "o_comment" not in read_schema


def test_constraint_suite_pruned_scans(spark, sf_dir):
    """quality_constraint_suite: the referential check stays a LeftAnti
    join; every scan is pruned to its checked columns (the orders scan
    for completeness never reads o_comment/o_totalprice)."""
    from opencode_hive_archon_spark.operators import constraints as CN

    p = plan(CN.quality_constraint_suite(spark, sf_dir))
    assert "LeftAnti" in p, p
    assert "CartesianProduct" not in p
    for rs in p.split("ReadSchema:")[1:]:
        line = rs.splitlines()[0]
        assert "o_comment" not in line and "props" not in line


def test_cdc_diff_single_cokeyed_join(spark, sf_dir):
    """source_cdc_diff: exactly one full-outer join (SortMergeJoin
    FullOuter) on the key; payload columns pruned to the compared set."""
    from opencode_hive_archon_spark.operators import cdc as CD

    p = plan(CD.source_cdc_diff(spark, sf_dir))
    assert "FullOuter" in p, p
    assert "CartesianProduct" not in p
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "o_comment" not in read_schema and "o_orderdate" not in read_schema


def test_column_stats_single_scan_multiagg(spark, sf_dir):
    """catalog_column_stats: the profile is ONE multi-aggregate (expand
    for the distincts) — the union rows reuse it rather than re-scanning
    per column."""
    from opencode_hive_archon_spark.operators import cdc as CD

    df = CD.catalog_column_stats(spark, sf_dir)
    p = plan(df)
    assert "CartesianProduct" not in p and "Generate" not in p
    assert [r.column_name for r in df.collect()] == sorted(
        r.column_name for r in df.collect()
    )


def test_tokenize_ids_mapper_only(spark, sf_dir):
    """Tokenizer APPLY must stay a pure map pipeline: no aggregation or
    join exchange anywhere — only the deliberate corpus re-split
    (RoundRobin repartition of the single-row-group parquet) and the
    presentation sort. A hash exchange appearing here means someone turned
    the closure-shipped merge table back into a join."""
    p = plan(T.corpus_tokenize_ids(spark, sf_dir))
    assert "Exchange hashpartitioning" not in p, p
    assert "ArrowEvalPython" in p or "PythonUDF" in p  # Arrow-batched kernel


def test_bpe_train_per_generation_shuffles(spark, sf_dir):
    """The training loop's cost model: ONE vocabulary-sized hash exchange
    per generation (the pair aggregate; its TakeOrdered top-1 adds a
    single-partition exchange on vocabulary-sized input) and 1-row
    BROADCAST joins back to the corpus — the merge application itself must
    never hash-shuffle corpus rows."""
    p = plan(T.corpus_bpe_train(spark, sf_dir))
    n_gen = T.BPE_TRAIN_GENERATIONS
    assert p.count("BroadcastExchange") >= n_gen  # top-1 + stats rows join back broadcast
    # pair aggregate: one partial+final hash exchange pair per generation
    assert p.count("Exchange hashpartitioning") <= 2 * n_gen, p


def test_mv_refresh_no_nested_loop(spark, sf_dir):
    """The MV merge must stay a co-keyed join (SMJ/SHJ on o_custkey) —
    a BroadcastNestedLoopJoin or CartesianProduct here means the merge
    condition degenerated and the refresh is no longer O(churn)."""
    from opencode_hive_archon_spark.operators import cdc as C

    p = plan(C.mv_incremental_refresh(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "CartesianProduct" not in p, p


def test_session_overlap_equi_join_on_bucket(spark, sf_dir):
    """The interval join must plan as an EQUI join keyed on the bucket
    (hash or broadcast-hash at test scale) — never the nested-loop theta
    join the naive overlap predicate produces."""
    from opencode_hive_archon_spark.operators import timeseries as TS

    p = plan(TS.events_session_overlap(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "CartesianProduct" not in p, p


def test_kmeans_centroids_broadcast(spark, sf_dir):
    """Every Lloyd assignment must broadcast the K-row centroid table:
    a shuffle-join against the corpus per iteration is the failure mode
    that makes distributed k-means quadratic in practice."""
    from opencode_hive_archon_spark.operators import similarity as SIM

    p = plan(SIM.embedding_kmeans_lloyd(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
    assert "CartesianProduct" not in p, p
