"""Central query registry: name -> (Spark callable, DuckDB oracle SQL).

This is the engine's declared operator inventory (SURVEY.md §2B). The driver
contract (__spark_entry__.py) is generated from it: ``queries()`` returns the
Spark callables, ``oracle_sql()`` the oracle strings (omitting rows-only
entries, which the driver then checks more weakly).

Registration is declarative: each operator module exposes a ``SPECS`` list;
this module aggregates them. Keep oracle SQL next to the Spark code in the
operator modules so semantics stay reviewable side-by-side.
"""

from __future__ import annotations

import importlib

from opencode_hive_archon_spark.spec import QueryFn, QuerySpec

__all__ = ["QueryFn", "QuerySpec", "all_specs", "queries", "oracle_sql"]

# Operator modules that contribute SPECS (grown as families land).
_SPEC_MODULES = [
    "opencode_hive_archon_spark.operators.recall",
    "opencode_hive_archon_spark.operators.relational",
    "opencode_hive_archon_spark.operators.similarity",
    "opencode_hive_archon_spark.operators.dedup",
    "opencode_hive_archon_spark.operators.quality",
    "opencode_hive_archon_spark.operators.textops",
    "opencode_hive_archon_spark.operators.udfs",
    "opencode_hive_archon_spark.operators.multimodal",
    "opencode_hive_archon_spark.operators.graph",
    "opencode_hive_archon_spark.operators.plandiff",
    "opencode_hive_archon_spark.operators.skew",
    "opencode_hive_archon_spark.operators.reshape",
    "opencode_hive_archon_spark.operators.tpch_style",
    "opencode_hive_archon_spark.operators.sampling",
    "opencode_hive_archon_spark.operators.funnel",
    "opencode_hive_archon_spark.operators.decontaminate",
    "opencode_hive_archon_spark.operators.spandedup",
    "opencode_hive_archon_spark.operators.quality_rules",
    "opencode_hive_archon_spark.operators.timeseries",
    "opencode_hive_archon_spark.operators.linkage",
    "opencode_hive_archon_spark.operators.sketches",
    "opencode_hive_archon_spark.operators.affinity",
    "opencode_hive_archon_spark.operators.chunking",
    "opencode_hive_archon_spark.operators.constraints",
    "opencode_hive_archon_spark.operators.cdc",
    "opencode_hive_archon_spark.plans.scenarios",
    "opencode_hive_archon_spark.sources.io",
    "opencode_hive_archon_spark.sources.catalog",
    "opencode_hive_archon_spark.sources.bucketed",
    "opencode_hive_archon_spark.sources.zorder",
    "opencode_hive_archon_spark.sources.deltalog",
    "opencode_hive_archon_spark.sources.deltastats",
    "opencode_hive_archon_spark.streaming.jobs",
]


# Registration-order priority. The driver's correctness snapshot records the
# FIRST 50 registered queries, so ordering is part of the contract.
#
# ROUND-15 ROTATION (oldest-evidence-first, the standing VERDICT cadence):
# after the r14 snapshot the stalest evidence is the r10-aged set. Slots:
#   (a) ALL 37 queries whose latest driver row is r10 (derived from the
#       committed CORRECTNESS_r01..r14 artifacts — sketches, timeseries,
#       events/behavioral, graph, BPE/tokenize, late TPC-H, linkage,
#       constraints, compaction plan, batch-inference UDF);
#   (b) 2 slots for the queries REGISTERED this round (delta change
#       feed + stats skipping) — new code outranks evidence age;
#   (c) 11 slots: r12 re-gates, led by the module families this round
#       touches (sources: source_roundtrip_formats) then the
#       alphabetically-first remaining r12 entries for determinism.
# After this round the max driver-row age anywhere in the registry is r12.
_PRIORITY = [
    # (a) every query whose latest driver row is r10
    "agg_countmin_sketch", "agg_histogram", "agg_kmv_distinct",
    "agg_percentile_disc", "corpus_bpe_train", "corpus_chunk_overlap",
    "corpus_gopher_rules", "corpus_shard_plan", "corpus_tfidf_topterms",
    "corpus_tokenize_ids", "corpus_vocab_growth", "events_anomaly_zscore",
    "events_attribution", "events_gapfill_locf", "events_grouping_sets",
    "events_ohlc_bars", "events_rolling_active_users",
    "events_session_overlap", "events_state_intervals",
    "events_time_weighted_avg", "events_user_streaks", "graph_pagerank",
    "graph_triangle_stats", "join_asof_nearest", "orders_market_basket",
    "orders_open_backlog", "orders_revenue_concentration",
    "orders_rfm_segmentation", "part_name_linkage", "q11_important_stock",
    "q16_supplier_part_counts", "q20_potential_promotion",
    "q2_min_cost_supplier", "quality_constraint_suite",
    "source_compaction_plan", "text_bigram_coverage",
    "udf_embed_batch_inference",
    # (b) queries registered this round (delta protocol extensions)
    "source_delta_change_feed", "source_delta_stats_skipping",
    # (c) r12 re-gates: touched-family first, then alphabetical
    "source_roundtrip_formats",
    "agg_approx_distinct_error", "agg_skew_salted", "ann_batch_topk",
    "corpus_tokenize_trained", "dedup_minhash_lsh_recall",
    "dedup_semantic_prune", "dedup_simhash_recall", "events_sessionize",
    "join_asof_event_order", "join_broadcast",
]


def all_specs() -> dict[str, QuerySpec]:
    collected: dict[str, QuerySpec] = {}
    for mod_name in _SPEC_MODULES:
        mod = importlib.import_module(mod_name)
        for spec in getattr(mod, "SPECS", []):
            if spec.name in collected:
                raise ValueError(f"duplicate query name: {spec.name}")
            collected[spec.name] = spec
    missing = [n for n in _PRIORITY if n not in collected]
    if missing:
        raise ValueError(f"priority entries without specs: {missing}")
    out: dict[str, QuerySpec] = {}
    for name in _PRIORITY:
        out[name] = collected[name]
    for name, spec in collected.items():
        if name not in out:
            out[name] = spec
    return out


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None
    }
