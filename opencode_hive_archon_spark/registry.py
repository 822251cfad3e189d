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
# ROUND-8 ROTATION: rounds 1-7 driver-gated the 50 flagship queries (the
# exact set recorded in CORRECTNESS_r07.json). This round the window holds
# the 49 queries that had NEVER been inside a driver snapshot — so the
# UNION of the r7 and r8 snapshots covers the whole registry with
# driver-grade evidence. The rotated-out flagships remain covered by
# tools/check.py sweeps and pytest; tests/test_contracts.py pins the
# rotation itself (window == exactly the never-gated set + listed fillers).
# Queries ADDED during round 8 (tests/test_contracts.py::_R8_ADDED)
# register after the window by design: their driver-grade slot comes with
# the next rotation, and until then they carry full-sweep + pytest
# evidence (SWEEP_r08*.txt at sf0.01 AND sf0.1).
_PRIORITY = [
    # relational siblings displaced by round ≤7 representatives
    "join_semi_anti", "join_outer_coalesce", "join_asof_pandas",
    "agg_distinct", "cube_events", "grouping_sets_orders",
    "scalar_subquery_orders", "sql_pricing_summary",
    "window_running", "window_moving_avg", "sort_multi_limit", "set_ops",
    "scalar_string_date_math", "json_extract_events", "array_ops_embeddings",
    "unpivot_lineitem_status",
    # TPC-H-shaped queries never window-gated before
    "q18_large_orders", "q3_shipping_priority",
    # similarity / ANN (oracle-exact members + the rows-only sketches, whose
    # recall gates were driver-gated in r7)
    "similarity_join_labels", "ann_batch_topk",
    "ann_lsh_topk", "ann_ivf_topk",
    # dedup family remainder (rows-only sketches quality-gated in r7)
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash",
    # quality gate not previously in-window
    "agg_approx_quantile_error",
    # text / corpus family (entirely sweep-verified until now)
    "text_token_stats", "text_lang_profile", "text_langid",
    "text_quality_score", "text_token_count", "text_fingerprint",
    "text_rolling_fingerprint", "text_repetition_stats",
    "corpus_train_val_split", "corpus_domain_cap",
    # multimodal remainder
    "multimodal_join", "multimodal_meta_profile", "multimodal_decode_arrow",
    "multimodal_frame_sample", "multimodal_resize_plan",
    # graph + plan-diff remainder
    "recall_graph_khop", "plan_diff_extracted_metrics",
    # sources / catalog remainder
    "source_partitioned_pruning", "catalog_roundtrip",
    # streaming remainder (stream_late_data rows-only by design;
    # late-arrival assertions live in pytest)
    "stream_late_data", "stream_stream_join", "stream_foreachbatch_sink",
    # --- fillers: new round-8 queries land here; source_bucketed_join
    # carries the r7 flagship layout-claim through a second snapshot ---
    "agg_approx_distinct", "source_bucketed_join",
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
