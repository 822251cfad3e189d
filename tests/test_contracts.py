"""Contract validation + property-based invariants (hypothesis).

Mirrors the reference's contract suite (test_context_packet_contract.py):
bounds violations raise; plus randomized truth-table properties for the
branch cascade and routing policy — coverage the reference lacks
(SURVEY.md §5 notes no property-based testing there).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from opencode_hive_archon_spark.config import RetrievalRequest
from opencode_hive_archon_spark.functions import validation as V
from opencode_hive_archon_spark.plans import branching
from opencode_hive_archon_spark.plans.routing import route_retrieval

pytestmark = pytest.mark.usefixtures("spark")


class TestChecks:
    def test_confidence_bounds_pass(self, spark):
        df = spark.createDataFrame([(0.0,), (0.5,), (1.0,)], "confidence double")
        assert V.checked(df, "conf", V.confidence_in_bounds()).count() == 3

    def test_confidence_bounds_raise(self, spark):
        df = spark.createDataFrame([(0.5,), (1.5,)], "confidence double")
        with pytest.raises(Exception) as exc:
            V.checked(df, "conf", V.confidence_in_bounds()).collect()
        assert "conf" in str(exc.value)

    def test_request_model_validation(self):
        with pytest.raises(ValueError):
            RetrievalRequest(query="q", mode="bogus")
        with pytest.raises(ValueError):
            RetrievalRequest(query="q", top_k=0)
        with pytest.raises(ValueError):
            RetrievalRequest(query="q", threshold=1.5)


# Driver-side reimplementation of the branch truth table for the property
# check (reference fallbacks.py:180-199 semantics).
def _expected_branch(count, top, threshold, bypassed, provider):
    if count == 0:
        return "EMPTY_SET"
    if top < threshold:
        return "LOW_CONFIDENCE"
    if bypassed and provider == "mem0":
        return "RERANK_BYPASSED"
    return "SUCCESS"


class TestBranchProperties:
    @settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        count=st.integers(min_value=0, max_value=10),
        top=st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        threshold=st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        bypassed=st.booleans(),
        provider=st.sampled_from(["mem0", "supabase", "graphiti", "none"]),
    )
    def test_cascade_matches_reference_semantics(
        self, spark, count, top, threshold, bypassed, provider
    ):
        row = (
            spark.range(1)
            .select(
                branching.branch_col(
                    F.lit(count), F.lit(top), threshold, bypassed, provider
                ).alias("b")
            )
            .first()
        )
        assert row["b"] == _expected_branch(count, top, threshold, bypassed, provider)

    @settings(max_examples=50, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        mode=st.sampled_from(["fast", "accurate", "conversation"]),
        statuses=st.fixed_dictionaries(
            {
                p: st.sampled_from(["available", "unavailable", "degraded"])
                for p in ("mem0", "supabase", "graphiti")
            }
        ),
        flags=st.fixed_dictionaries(
            {
                "mem0_enabled": st.booleans(),
                "supabase_enabled": st.booleans(),
                "graphiti_enabled": st.booleans(),
            }
        ),
    )
    def test_routing_invariants(self, mode, statuses, flags):
        provider, opts = route_retrieval(
            RetrievalRequest(query="q", mode=mode), statuses, flags
        )
        # 1. a disabled provider is never selected
        if provider != "none":
            assert flags.get(f"{provider}_enabled", provider != "graphiti")
            # 2. an unavailable provider is never selected
            assert statuses.get(provider) in ("available", "degraded")
        # 3. skip_external_rerank iff mem0 (the overlap policy)
        assert opts["skip_external_rerank"] == (provider == "mem0")
        # 4. determinism
        assert (provider, opts) == route_retrieval(
            RetrievalRequest(query="q", mode=mode), statuses, flags
        )


# ROTATION HISTORY (driver 50-slot correctness windows):
#   r1-r7: the 50 flagships (CORRECTNESS_r07 keys)
#   r8:    the 49 never-snapshotted remainder
#   r9:    round-8/9 additions + the r8 ERR row + the RocksDB-conf'd
#          streaming family + re-gates (CORRECTNESS_r09: 48 pass / 2
#          by-design rows-only)
#   r10:   the 35 never-snapshotted queries + 15 re-gates; after r10 the
#          union of driver snapshots covers the entire registry.
#   r11:   oldest-evidence-first (VERDICT r10 #3): the 5 round-11
#          additions + ALL 34 queries whose latest driver row is r7 + 11
#          r8 re-gates from the round-11-touched modules. After r11 the
#          max driver-row age anywhere in the registry is r8.
#   r12:   short round — re-gated r11's exact 50 (no rotation).
#   r13:   ALL 33 queries whose latest driver row is r8 + 17 r9 re-gates
#          from the round-13-touched modules (streaming/jobs.py MV GC,
#          dedup.py). After r13 the max driver-row age is r9.
#   r14:   ALL 30 queries whose latest driver row is r9 + 20 r10 re-gates
#          from the round-14-touched modules (similarity.py, MV/CDC).
#          After r14 the max driver-row age is r10.
#   r15:   ALL 37 queries whose latest driver row is r10 + the 2 queries
#          registered this round (delta change feed + stats skipping) +
#          11 r12 re-gates. After r15 the max driver-row age is r12.
#   r16:   ALL 35 queries whose latest driver row is r12 + the 4 queries
#          registered this round (null/string skipping, MERGE CDF update
#          images, log-tailing CDF MV stream) + 11 r13 re-gates
#          (alphabetically first). After r16 the max driver-row age is
#          r13.
#   r17:   the 2 queries with NO driver row at all (source_delta_update /
#          source_delta_clone, registered after the r16 window was cut;
#          ADVICE r16 #3) + ALL 40 queries whose latest driver row is
#          r13 + up to 8 slots for round-17 registrations. After r17 the
#          max driver-row age is r14.
#   r18:   ALL 49 queries whose latest driver row is r14 + 1 tail slot
#          for a round-18 registration (protocol work: column mapping on
#          partitioned tables, overwriteSchema, MERGE evolution, ZORDER,
#          multi-part checkpoints; overflow past slot 50 carries
#          SWEEP_r18 evidence and rotates into r19). After r18 the max
#          driver-row age is r15.

# The 49 pinned r18 slots: every query whose LATEST driver correctness
# row is r14 — derived from the committed CORRECTNESS_r01..r17 artifacts
# (max round containing each name), not hand-maintained intuition.
_R18_PINNED: list[str] = [
    "agg_heavy_hitters", "ann_ivf_kmeans_topk", "ann_ivf_recall",
    "ann_ivf_topk", "ann_lsh_recall", "ann_lsh_topk", "ann_pq_topk",
    "ann_quantized_topk", "catalog_column_stats", "corpus_bpe_pair_stats",
    "corpus_curation", "corpus_importance_sample", "corpus_pack_sequences",
    "corpus_pretraining_pipeline", "corpus_stratified_sample",
    "dedup_embedding_cosine", "embedding_kmeans_lloyd",
    "embedding_label_centroids", "embedding_random_projection",
    "events_funnel", "events_path_analysis", "events_retention",
    "join_skew_salted", "multimodal_frame_sample", "multimodal_frame_table",
    "mv_incremental_refresh", "q10_returned_items", "q12_shipmode_priority",
    "q13_customer_distribution", "q15_top_supplier",
    "q17_small_quantity_revenue", "q19_disjunctive_revenue",
    "q22_global_sales_opportunity", "q4_order_priority",
    "q6_forecast_revenue", "q7_volume_shipping", "q8_market_share",
    "q9_product_profit", "recall_score_topk", "source_cdc_diff",
    "source_delta_acid_roundtrip", "source_delta_checkpoint_log",
    "source_delta_merge_upsert", "source_schema_evolution",
    "source_upsert_pattern", "source_zorder_layout", "stream_dedup_ladder",
    "stream_ohlc_bars", "window_analytics",
]


_PIN_ROUND = 18


def test_priority_window_contents():
    """Round-18 rotation pin: the window starts with the 49 pinned slots
    (all r14-aged), and every slot beyond them is a round-18 registration
    with no prior driver evidence. Evidence is counted ONLY from rounds
    BEFORE the pin round — the driver's own r18 snapshot records exactly
    these slots, so counting it would self-falsify the test (the r17
    failure mode, VERDICT r17 task #1)."""
    import glob
    import json
    import re

    from opencode_hive_archon_spark.registry import _PRIORITY, all_specs

    assert 49 <= len(_PRIORITY) <= 50
    assert _PRIORITY[:49] == _R18_PINNED
    specs = all_specs()
    window = list(specs)[: len(_PRIORITY)]
    assert window == _PRIORITY
    seen: set[str] = set()
    for p in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        rnd = int(re.search(r"r(\d+)", p).group(1))
        if rnd < _PIN_ROUND:
            seen |= set(json.load(open(p)))
    stale_extras = [n for n in _PRIORITY[49:] if n in seen]
    assert not stale_extras, (
        f"non-new queries occupying r18 new-registration slots: "
        f"{stale_extras}"
    )


def test_r18_window_is_oldest_evidence_first():
    """The rotation CLAIM, checked against the artifacts of record: every
    registry query outside the r18 window has a driver row in
    CORRECTNESS_r15..r17 — i.e. after this round's snapshot lands, no
    driver evidence anywhere is older than r15."""
    import glob
    import json
    import re

    latest: dict[str, int] = {}
    for p in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", p).group(1))
        for name in json.load(open(p)):
            latest[name] = max(latest.get(name, 0), rnd)
    from opencode_hive_archon_spark.registry import _PRIORITY, all_specs

    outside = [n for n in all_specs() if n not in set(_PRIORITY)]
    aged = sorted(n for n in outside if latest.get(n, 99) < 15)
    assert not aged, f"queries outside the window with pre-r15 evidence: {aged}"


# Pinned full-inventory census: every registered query, by name. A diff
# that registers (or drops) a query MUST touch this list in the same
# commit — the round-9 failure mode (census count drifting behind late
# registrations) now fails with the culprit names, not a bare count.
_CENSUS = [
    "agg_approx_distinct",
    "agg_approx_distinct_error",
    "agg_approx_quantile_error",
    "agg_countmin_sketch",
    "agg_distinct",
    "agg_heavy_hitters",
    "agg_histogram",
    "agg_kmv_distinct",
    "agg_percentile_disc",
    "agg_skew_salted",
    "ann_batch_topk",
    "ann_ivf_kmeans_topk",
    "ann_ivf_recall",
    "ann_ivf_topk",
    "ann_lsh_recall",
    "ann_lsh_topk",
    "ann_pq_topk",
    "ann_quantized_topk",
    "array_ops_embeddings",
    "catalog_column_stats",
    "catalog_roundtrip",
    "corpus_blocklist_filter",
    "corpus_bpe_pair_stats",
    "corpus_chunk_overlap",
    "corpus_curation",
    "corpus_decontaminate",
    "corpus_dedup_pipeline",
    "corpus_domain_cap",
    "corpus_gopher_rules",
    "corpus_importance_sample",
    "corpus_pack_sequences",
    "corpus_pretraining_pipeline",
    "corpus_bpe_train",
    "corpus_shard_plan",
    "corpus_span_dedup",
    "corpus_tokenize_ids",
    "corpus_tokenize_trained",
    "corpus_vocab_growth",
    "corpus_stratified_sample",
    "corpus_tfidf_topterms",
    "corpus_train_val_split",
    "cube_events",
    "dedup_clusters",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_minhash_lsh",
    "embedding_kmeans_lloyd",
    "embedding_label_centroids",
    "embedding_random_projection",
    "dedup_minhash_lsh_recall",
    "dedup_near",
    "dedup_ngram_jaccard",
    "dedup_semantic_prune",
    "dedup_simhash",
    "dedup_simhash_recall",
    "events_anomaly_zscore",
    "events_attribution",
    "events_funnel",
    "events_gapfill_locf",
    "events_grouping_sets",
    "events_ohlc_bars",
    "events_path_analysis",
    "events_retention",
    "events_rolling_active_users",
    "events_session_overlap",
    "events_sessionize",
    "events_state_intervals",
    "events_time_weighted_avg",
    "events_user_streaks",
    "graph_pagerank",
    "graph_triangle_stats",
    "grouping_sets_orders",
    "join_asof_event_order",
    "join_asof_nearest",
    "join_asof_pandas",
    "join_broadcast",
    "join_outer_coalesce",
    "join_range_bucketed",
    "join_semi_anti",
    "join_shuffle",
    "join_skew_salted",
    "json_extract_events",
    "local_supplier_volume",
    "multimodal_decode",
    "mv_incremental_refresh",
    "multimodal_decode_arrow",
    "multimodal_frame_sample",
    "multimodal_frame_table",
    "multimodal_join",
    "multimodal_meta_profile",
    "multimodal_resize_plan",
    "orders_market_basket",
    "orders_open_backlog",
    "orders_revenue_concentration",
    "orders_rfm_segmentation",
    "part_name_linkage",
    "pivot_lineitem_status",
    "plan_diff_extract",
    "plan_diff_extracted_metrics",
    "plan_diff_metrics",
    "pricing_summary",
    "promo_revenue_share",
    "q10_returned_items",
    "q11_important_stock",
    "q12_shipmode_priority",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q20_potential_promotion",
    "q21_waiting_suppliers",
    "q22_global_sales_opportunity",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "quality_constraint_suite",
    "recall_compat",
    "recall_envelope",
    "recall_envelope_reranked",
    "recall_graph_khop",
    "recall_multi_provider_merge",
    "recall_multi_provider_rerank",
    "recall_score_topk",
    "recall_summary_branch",
    "rollup_orders",
    "scalar_string_date_math",
    "scalar_subquery_orders",
    "scan_project_filter",
    "scenario_forced_branches",
    "scenario_replay",
    "scenario_tag_filter",
    "set_ops",
    "similarity_join_labels",
    "similarity_topk",
    "sort_multi_limit",
    "source_bucketed_join",
    "source_cdc_diff",
    "source_compaction_plan",
    "source_delta_acid_roundtrip",
    "source_delta_cdf_update_images",
    "source_delta_change_feed",
    "source_delta_checkpoint_log",
    "source_delta_clone",
    "source_delta_clone_partitioned",
    "source_delta_deletion_vectors",
    "source_delta_dv_clone_interop",
    "source_delta_generated_partition",
    "source_delta_mapped_partitioned",
    "source_delta_merge_evolution",
    "source_delta_merge_upsert",
    "source_delta_null_skipping",
    "source_delta_optimize_dv",
    "source_delta_overwrite_schema",
    "source_delta_stats_skipping",
    "source_delta_string_skipping",
    "source_delta_update",
    "source_partitioned_pruning",
    "source_roundtrip_formats",
    "source_schema_evolution",
    "source_upsert_pattern",
    "source_zorder_layout",
    "sql_pricing_summary",
    "stream_dedup",
    "stream_delta_cdf_dv",
    "stream_delta_cdf_mv",
    "stream_delta_cdf_mv_ratelimited",
    "stream_delta_cdf_partitioned",
    "stream_foreachbatch_sink",
    "stream_late_data",
    "stream_dedup_ladder",
    "stream_mv_maintenance",
    "stream_ohlc_bars",
    "stream_session_windows",
    "stream_sliding_avg",
    "stream_stateful_user_stats",
    "stream_static_join",
    "stream_stream_join",
    "stream_tumbling_counts",
    "text_bigram_coverage",
    "text_fingerprint",
    "text_lang_profile",
    "text_langid",
    "text_pii_redact",
    "text_quality_score",
    "text_rarity_score",
    "text_repetition_stats",
    "text_rolling_fingerprint",
    "text_token_count",
    "text_token_stats",
    "udaf_grouped_normalize",
    "udf_embed_batch_inference",
    "udf_scalar_clamp",
    "udtf_explode_tokens",
    "unpivot_lineitem_status",
    "window_analytics",
    "window_moving_avg",
    "window_rank_topk_per_group",
    "window_running",
]

# Deliberate rows-only (oracle-less) entries: approximate / arrival-order
# ops whose exactness is gated by an oracle-exact companion in the quality
# family instead.
_ROWS_ONLY = [
    "agg_approx_distinct",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "stream_late_data",
]


def test_registry_census():
    """Inventory canary: a refactor that silently drops a registered query
    or downgrades an oracle-exact entry to rows-only must fail HERE with
    names, not as a quiet shrink of the driver's correctness surface."""
    from opencode_hive_archon_spark.registry import all_specs, oracle_sql

    specs = all_specs()
    got = sorted(specs)
    assert got == sorted(_CENSUS), (
        f"registered-but-uncensused: {sorted(set(got) - set(_CENSUS))}; "
        f"censused-but-unregistered: {sorted(set(_CENSUS) - set(got))}"
    )
    rows_only = sorted(n for n, s in specs.items() if s.oracle is None)
    assert rows_only == _ROWS_ONLY, rows_only
    assert len(oracle_sql()) == len(_CENSUS) - len(_ROWS_ONLY)


def test_md5_prefix_cross_engine_parity(spark):
    """The canonical cross-engine hash (CONVENTIONS.md) must agree value-
    for-value between the Spark helper and its DuckDB SQL mirror."""
    import duckdb
    from pyspark.sql import functions as F

    from opencode_hive_archon_spark.functions.hashing import (
        md5_prefix_long,
        md5_prefix_long_sql,
    )

    vals = ["", "a", "42", "hello world", "ünïcode"]
    got_spark = [
        r["h"]
        for r in spark.createDataFrame([(v,) for v in vals], "s string")
        .select(md5_prefix_long(F.col("s"), 6).alias("h"))
        .collect()
    ]
    con = duckdb.connect()
    got_duck = [
        con.execute(f"SELECT {md5_prefix_long_sql('?', 6)}", [v]).fetchone()[0]
        for v in vals
    ]
    assert got_spark == got_duck


def test_keyed_materialize_released_by_unpersist_all(spark):
    """Session-keyed materializations must not leak across workloads:
    unpersist_all() clears the keyed handles so the next build recomputes."""
    from opencode_hive_archon_spark import session as S

    calls = []

    def build():
        calls.append(1)
        return spark.range(10)

    a = S.materialize_keyed(spark, ("census_test",), build)
    b = S.materialize_keyed(spark, ("census_test",), build)
    assert a is b and len(calls) == 1
    S.unpersist_all()
    S.materialize_keyed(spark, ("census_test",), build)
    assert len(calls) == 2
    S.unpersist_all()
