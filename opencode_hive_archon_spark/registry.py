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
    "opencode_hive_archon_spark.operators.pii",
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
# ROUND-18 ROTATION (oldest-evidence-first, the standing VERDICT cadence):
# after the r17 snapshot the stalest driver evidence is the r14-aged set —
# 49 queries (ANN family, corpus assembly, embedding ops, events funnels,
# the remaining TPC-H half, the r14 delta/source block, stream ladder).
# Slots:
#   (a) ALL 49 queries whose latest driver row is r14 (derived from the
#       committed CORRECTNESS_r01..r17 artifacts);
#   (b) 1 tail slot for a query REGISTERED this round (r18 protocol work:
#       column-mapping on partitioned tables, overwriteSchema, MERGE
#       schema evolution / BY SOURCE, ZORDER, multi-part checkpoints).
#       The window holds 50; the other five r18 registrations
#       (source_delta_overwrite_schema, source_delta_merge_evolution,
#       source_delta_generated_partition, text_pii_redact,
#       corpus_blocklist_filter) carry committed SWEEP_r18 hash-exact
#       evidence at both sfs and rotate into the r19 window first
#       (zero-driver-evidence outranks any age).
# After this round the max driver-row age anywhere in the registry is r15.
_PRIORITY = [
    # (a) every query whose latest driver row is r14
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
    # (b) r18 registrations are appended here as they land (1 slot fits
    # the 50-query window; overflow waits for the r19 window with sweep
    # evidence in the meantime).
    "source_delta_mapped_partitioned",
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
