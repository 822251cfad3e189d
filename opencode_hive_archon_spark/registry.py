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
# ROUND-11 ROTATION (oldest-evidence-first, VERDICT r10 #3): after r10 the
# union of driver snapshots covers the whole registry, so the window now
# rotates onto the STALEST driver rows. Slots:
#   (a) the FIVE queries ADDED during round 11
#       (tests/test_contracts.py::_R11_ADDED) — never driver-snapshotted,
#       must reach the driver this round, not rotate as next round's debt;
#   (b) ALL 34 queries whose latest driver row is r7 (derived from the
#       committed CORRECTNESS_r01..r10 artifacts — recall family, plandiff,
#       scenario suite, core relational, quality gates);
#   (c) 11 re-gates drawn from the OLDEST remaining evidence (r8 rows),
#       preferring the modules round 11 touched (similarity.py's shared
#       kmeans/LSH devices; textops.py's shared BPE loop).
# After this round the max driver-row age anywhere in the registry is r8.
_PRIORITY = [
    # (a) round-11 additions, never driver-snapshotted
    "corpus_tokenize_trained", "ann_ivf_kmeans_topk",
    "dedup_semantic_prune", "recall_multi_provider_rerank",
    "stream_mv_maintenance",
    # (b) every query whose latest driver row is r7
    "recall_envelope",
    "recall_summary_branch", "recall_envelope_reranked", "recall_compat",
    "recall_multi_provider_merge",
    "scenario_tag_filter", "scenario_replay", "scenario_forced_branches",
    "plan_diff_metrics", "plan_diff_extract",
    "scan_project_filter", "pricing_summary", "join_broadcast",
    "join_shuffle", "join_range_bucketed", "join_asof_event_order",
    "local_supplier_volume", "promo_revenue_share", "rollup_orders",
    "window_rank_topk_per_group", "pivot_lineitem_status",
    "events_sessionize", "agg_skew_salted", "q21_waiting_suppliers",
    "similarity_topk", "multimodal_decode", "source_roundtrip_formats",
    "udaf_grouped_normalize", "udf_scalar_clamp", "udtf_explode_tokens",
    "agg_approx_distinct_error", "ann_ivf_recall",
    "dedup_minhash_lsh_recall", "dedup_simhash_recall",
    # (c) oldest-r8 re-gates from the round-11-touched modules
    "similarity_join_labels", "ann_batch_topk", "ann_ivf_topk",
    "text_token_stats", "text_quality_score", "text_langid",
    "text_lang_profile", "text_repetition_stats", "text_fingerprint",
    "text_rolling_fingerprint", "text_token_count",
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
