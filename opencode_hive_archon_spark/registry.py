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
# ROUND-17 ROTATION (oldest-evidence-first, the standing VERDICT cadence):
# after the r16 snapshot the stalest evidence is the r13-aged set, plus two
# queries with NO driver row at all (VERDICT r16 / ADVICE: the late-r16
# registrations source_delta_update and source_delta_clone missed the r16
# window). Slots:
#   (a) 2 never-driver-checked queries — zero evidence outranks any age;
#   (b) ALL 40 queries whose latest driver row is r13 (derived from the
#       committed CORRECTNESS_r01..r16 artifacts — the dedup ladder,
#       streaming family, multimodal, reshape/set ops, remaining TPC-H);
#   (c) 8 slots for queries REGISTERED this round (r17 delta-protocol
#       work: spec DV codec, partitioned clone, OCC conflict matrix,
#       CDF stream rate limiting, DV-aware OPTIMIZE) — new code
#       outranks evidence age.
# After this round the max driver-row age anywhere in the registry is r14.
_PRIORITY = [
    # (a) never driver-checked (registered after the r16 window was cut)
    "source_delta_update", "source_delta_clone",
    # (b) every query whose latest driver row is r13
    "cube_events", "dedup_clusters", "dedup_exact", "dedup_minhash_lsh",
    "dedup_near", "dedup_ngram_jaccard", "dedup_simhash",
    "grouping_sets_orders", "join_asof_pandas", "join_outer_coalesce",
    "join_semi_anti", "json_extract_events", "multimodal_decode_arrow",
    "multimodal_join", "multimodal_meta_profile", "multimodal_resize_plan",
    "plan_diff_extracted_metrics", "q18_large_orders",
    "q3_shipping_priority", "recall_graph_khop", "scalar_string_date_math",
    "scalar_subquery_orders", "set_ops", "sort_multi_limit",
    "source_bucketed_join", "source_partitioned_pruning",
    "sql_pricing_summary", "stream_dedup", "stream_foreachbatch_sink",
    "stream_late_data", "stream_session_windows", "stream_sliding_avg",
    "stream_stateful_user_stats", "stream_static_join",
    "stream_stream_join", "stream_tumbling_counts", "text_rarity_score",
    "unpivot_lineitem_status", "window_moving_avg", "window_running",
    # (c) queries registered this round (r17 delta-protocol work) are
    # appended here as they land, up to 8; any overflow past slot 50
    # waits for the r18 window.
    "source_delta_clone_partitioned", "source_delta_optimize_dv",
    "source_delta_dv_clone_interop", "stream_delta_cdf_mv_ratelimited",
    "stream_delta_cdf_partitioned", "stream_delta_cdf_dv",
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
