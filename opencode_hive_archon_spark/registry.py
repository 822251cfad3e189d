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
    "opencode_hive_archon_spark.streaming.jobs",
]


# Registration-order priority. The driver's correctness snapshot records the
# FIRST 50 registered queries, so ordering is part of the contract.
#
# ROUND-9 ROTATION: rounds 1-7 gated the 50 flagships, round 8 gated the 49
# never-snapshotted remainder. This round the window holds (a) the 17
# queries ADDED during round 8, which registered after the fixed r8 window
# and so have never seen a driver snapshot, (b) multimodal_frame_sample —
# the one r8 ERR row (its array<bigint> column was unhashable for the
# driver; now serialized — a green row here retires the last red cell),
# (c) all 9 streaming queries, whose registered sessions gained the RocksDB
# state-store conf this round and therefore need fresh post-change driver
# evidence, (e) the 11 queries ADDED during round 9 (nine TPC-H shapes,
# text_rarity_score, corpus_dedup_pipeline — tests/test_contracts.py::
# _R9_ADDED), pulled into the window by the second rotation pass so they
# reach the driver this round rather than next, and (d) re-gates for the
# code paths round 9 rewrote (adaptive prefix-t SSJoin, quantized LSH
# matmul + verify, factored curation/rarity) plus a few flagship re-seats.
# Everything displaced from the earlier (d) list already carries r7/r8
# driver-green evidence.
_PRIORITY = [
    # (a) round-8 additions, never driver-snapshotted
    "window_analytics", "q7_volume_shipping", "q10_returned_items",
    "q17_small_quantity_revenue", "events_funnel", "events_retention",
    "events_path_analysis", "agg_heavy_hitters", "join_skew_salted",
    "corpus_stratified_sample", "corpus_pack_sequences",
    "corpus_decontaminate", "corpus_bpe_pair_stats",
    "multimodal_frame_table", "source_schema_evolution",
    "source_upsert_pattern", "source_zorder_layout",
    # (b) the r8 ERR row, re-gated after serializing its array column
    "multimodal_frame_sample",
    # (c) streaming family, re-gated after the RocksDB state-store conf
    # landed in the registered sessions (stream_late_data rows-only by
    # design; late-arrival assertions live in pytest)
    "stream_tumbling_counts", "stream_static_join", "stream_stream_join",
    "stream_sliding_avg", "stream_session_windows", "stream_dedup",
    "stream_late_data", "stream_stateful_user_stats",
    "stream_foreachbatch_sink",
    # (e) round-9 additions, never driver-snapshotted: nine TPC-H shapes,
    # the unigram rarity score, and the fused dedup ladder
    "q4_order_priority", "q6_forecast_revenue", "q8_market_share",
    "q9_product_profit", "q12_shipmode_priority",
    "q13_customer_distribution", "q15_top_supplier",
    "q19_disjunctive_revenue", "q22_global_sales_opportunity",
    "text_rarity_score", "corpus_dedup_pipeline",
    # (d) re-gates for round-9-changed code paths: the adaptive prefix-t
    # SSJoin (dedup.py), the quantized LSH signature matmul + verify
    # (similarity.py), and the factored curation/rarity stages (textops.py)
    "dedup_ngram_jaccard", "dedup_near", "dedup_clusters",
    "dedup_embedding_cosine", "dedup_exact", "ann_lsh_recall",
    "ann_lsh_topk", "corpus_curation", "corpus_pretraining_pipeline",
    # flagship re-seat, plus the round-9 span-dedup / importance-sample additions
    "recall_score_topk", "corpus_importance_sample", "corpus_span_dedup",
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
