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
# ROUND-13 ROTATION (oldest-evidence-first, VERDICT r12 task #1): the r12
# driver window re-gated r11's exact 50, so the stalest evidence is now the
# r8-aged set. Slots:
#   (a) ALL 33 queries whose latest driver row is r8 (derived from the
#       committed CORRECTNESS_r01..r12 artifacts — approx aggs, multimodal
#       Arrow paths, core relational set ops, sources, TPC-H q3/q18);
#   (b) 17 re-gates drawn from the OLDEST remaining evidence (r9 rows),
#       preferring the modules round 13 touches (streaming/jobs.py's MV
#       manifest GC reshapes the foreachBatch machinery the stream family
#       shares; dedup.py feeds the semantic-prune/greedy work).
# After this round the max driver-row age anywhere in the registry is r9.
_PRIORITY = [
    # (a) every query whose latest driver row is r8
    "agg_approx_distinct", "agg_approx_quantile_error", "agg_distinct",
    "array_ops_embeddings", "catalog_roundtrip", "corpus_domain_cap",
    "corpus_train_val_split", "cube_events", "dedup_minhash_lsh",
    "dedup_simhash", "grouping_sets_orders", "join_asof_pandas",
    "join_outer_coalesce", "join_semi_anti", "json_extract_events",
    "multimodal_decode_arrow", "multimodal_join", "multimodal_meta_profile",
    "multimodal_resize_plan", "plan_diff_extracted_metrics",
    "q18_large_orders", "q3_shipping_priority", "recall_graph_khop",
    "scalar_string_date_math", "scalar_subquery_orders", "set_ops",
    "sort_multi_limit", "source_bucketed_join", "source_partitioned_pruning",
    "sql_pricing_summary", "unpivot_lineitem_status", "window_moving_avg",
    "window_running",
    # (b) oldest-r9 re-gates from the round-13-touched modules
    "stream_dedup", "stream_foreachbatch_sink", "stream_late_data",
    "stream_session_windows", "stream_sliding_avg",
    "stream_stateful_user_stats", "stream_static_join", "stream_stream_join",
    "stream_tumbling_counts",
    "dedup_exact", "dedup_near", "dedup_ngram_jaccard", "dedup_clusters",
    "corpus_dedup_pipeline", "corpus_decontaminate", "corpus_span_dedup",
    "text_rarity_score",
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
