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
    "opencode_hive_archon_spark.plans.scenarios",
    "opencode_hive_archon_spark.sources.io",
    "opencode_hive_archon_spark.sources.catalog",
    "opencode_hive_archon_spark.sources.bucketed",
    "opencode_hive_archon_spark.streaming.jobs",
]


# Registration-order priority. The driver's correctness snapshot records the
# FIRST 50 registered queries, so ordering is part of the contract: the
# reference-parity pipeline, streaming, the one-per-family representatives
# and the companion recall gates must land inside the window. Entries beyond
# 50 are either redundant-with-siblings variants (e.g. join_asof_pandas next
# to join_asof_event_order) or rows-only approximates whose QUALITY is
# already driver-gated by a companion query in the window — all of them stay
# covered by tools/check.py and pytest.
_PRIORITY = [
    # reference-parity retrieval pipeline (R1-R23)
    "recall_multi_provider_merge", "recall_score_topk", "recall_summary_branch",
    "recall_envelope", "recall_compat", "recall_envelope_reranked",
    "scenario_tag_filter", "scenario_replay", "scenario_forced_branches",
    "plan_diff_metrics",
    # structured streaming (stream_late_data is rows-only by design — its
    # late-arrival assertions live in pytest — so the oracle-exact
    # stream_static_join takes the window slot instead)
    "stream_stateful_user_stats", "stream_tumbling_counts", "stream_sliding_avg",
    "stream_session_windows", "stream_dedup", "stream_static_join",
    # sources + reference query shapes; source_bucketed_join is the pinned
    # shuffle-free bucketed-layout evidence (round-7 flagship)
    "source_roundtrip_formats", "source_bucketed_join", "local_supplier_volume",
    "promo_revenue_share",
    # (sql_pricing_summary shares pricing_summary's physical plan — the SQL
    # surface variant stays outside the window)
    "pivot_lineitem_status", "agg_skew_salted",
    "join_range_bucketed",
    # companion gates for the approximate operators (all five)
    "dedup_minhash_lsh_recall", "dedup_simhash_recall",
    "ann_lsh_recall", "ann_ivf_recall", "agg_approx_distinct_error",
    # relational core — one representative per shape; displaced siblings
    # (join_semi_anti ⊂ q21's semi/anti legs, join_outer_coalesce,
    # grouping_sets ~ rollup, window_moving_avg/window_running ~
    # window_rank_topk_per_group, unpivot ~ pivot, text_token_stats ~
    # corpus_curation's text stage,
    # stream_foreachbatch_sink ~ the in-window streaming six,
    # multimodal_meta_profile ~ multimodal_decode) stay green under
    # tools/check.py and pytest
    # (agg_distinct displaced too: exact distinct aggregation is already
    # window-covered by rollup_orders + the agg_approx_distinct_error gate)
    "scan_project_filter", "pricing_summary", "join_broadcast", "join_shuffle",
    "q21_waiting_suppliers", "events_sessionize", "join_asof_event_order",
    "rollup_orders", "dedup_clusters",
    "window_rank_topk_per_group", "corpus_curation",
    # LLM-data-pipeline representatives; the fused pre-training job is the
    # round-7 composite showcase
    "corpus_pretraining_pipeline",
    "similarity_topk", "dedup_embedding_cosine", "dedup_exact", "dedup_near",
    "ann_quantized_topk",
    # UDF family + multimodal decode (oracle-exact since round 7) + the R23
    # extraction front-end
    "udf_scalar_clamp", "udaf_grouped_normalize", "udtf_explode_tokens",
    "multimodal_decode", "plan_diff_extract",
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
