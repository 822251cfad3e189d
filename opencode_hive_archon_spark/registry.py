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
# ROUND-16 ROTATION (oldest-evidence-first, the standing VERDICT cadence):
# after the r15 snapshot the stalest evidence is the r12-aged set. Slots:
#   (a) ALL 35 queries whose latest driver row is r12 (derived from the
#       committed CORRECTNESS_r01..r15 artifacts — the recall/scenario
#       reference family, text analysis, plan-diff, early TPC-H,
#       reshape, UDF trio, stream_mv_maintenance);
#   (b) 5 slots for the queries REGISTERED this round (null/string data
#       skipping, row-granular MERGE CDF, log-tailing CDF MV stream,
#       deletion vectors) — new code outranks evidence age;
#   (c) 10 slots: the alphabetically-first r13-aged entries for
#       determinism.
# After this round the max driver-row age anywhere in the registry is r13.
_PRIORITY = [
    # (a) every query whose latest driver row is r12
    "join_range_bucketed", "join_shuffle", "local_supplier_volume",
    "multimodal_decode", "pivot_lineitem_status", "plan_diff_extract",
    "plan_diff_metrics", "pricing_summary", "promo_revenue_share",
    "q21_waiting_suppliers", "recall_compat", "recall_envelope",
    "recall_envelope_reranked", "recall_multi_provider_merge",
    "recall_summary_branch", "rollup_orders", "scan_project_filter",
    "scenario_forced_branches", "scenario_replay", "scenario_tag_filter",
    "similarity_join_labels", "similarity_topk", "stream_mv_maintenance",
    "text_fingerprint", "text_lang_profile", "text_langid",
    "text_quality_score", "text_repetition_stats",
    "text_rolling_fingerprint", "text_token_count", "text_token_stats",
    "udaf_grouped_normalize", "udf_scalar_clamp", "udtf_explode_tokens",
    "window_rank_topk_per_group",
    # (b) queries registered this round (delta skipping + CDF + DV)
    "source_delta_null_skipping", "source_delta_string_skipping",
    "source_delta_cdf_update_images", "stream_delta_cdf_mv",
    "source_delta_deletion_vectors",
    # (c) r13 re-gates: alphabetically-first r13-aged entries
    "agg_approx_distinct", "agg_approx_quantile_error", "agg_distinct",
    "array_ops_embeddings", "catalog_roundtrip", "corpus_decontaminate",
    "corpus_dedup_pipeline", "corpus_domain_cap", "corpus_span_dedup",
    "corpus_train_val_split",
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
