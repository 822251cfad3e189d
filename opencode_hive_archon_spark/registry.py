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
    "opencode_hive_archon_spark.streaming.jobs",
]


# Registration-order priority. The driver's correctness snapshot records the
# FIRST 50 registered queries, so ordering is part of the contract.
#
# ROUND-14 ROTATION (oldest-evidence-first, VERDICT r13 task #2): after the
# r13 snapshot the stalest evidence is the r9-aged set. Slots:
#   (a) ALL 30 queries whose latest driver row is r9 (derived from the
#       committed CORRECTNESS_r01..r13 artifacts — sampling/corpus family,
#       events funnel/path/retention, mid-suite TPC-H, sources, zorder);
#   (b) 20 remaining slots: r10 re-gates drawn from the OLDEST remaining
#       evidence, preferring the modules round 14 touches (similarity.py's
#       IVF trainer unification + semantic-prune greedy rework; the MV/CDC
#       manifest family behind streaming/jobs.py's bucket-read guard) —
#       EXCEPT (i) four slots for the queries whose OUTPUT round 14
#       changes (ann_ivf_topk / ann_ivf_kmeans_topk / ann_ivf_recall:
#       the unified trainer + nprobe=4 retune; recall_multi_provider_rerank:
#       data-derived channel/success features), and (ii) three slots for
#       the queries REGISTERED this round (the delta-protocol table
#       layer) — evidence for changed/new code outranks evidence age.
# After this round the max driver-row age anywhere in the registry is r10.
_PRIORITY = [
    # (a) every query whose latest driver row is r9
    "agg_heavy_hitters", "corpus_bpe_pair_stats", "corpus_curation",
    "corpus_importance_sample", "corpus_pack_sequences",
    "corpus_pretraining_pipeline", "corpus_stratified_sample",
    "events_funnel", "events_path_analysis", "events_retention",
    "join_skew_salted", "multimodal_frame_sample", "multimodal_frame_table",
    "q10_returned_items", "q12_shipmode_priority", "q13_customer_distribution",
    "q15_top_supplier", "q17_small_quantity_revenue",
    "q19_disjunctive_revenue", "q22_global_sales_opportunity",
    "q4_order_priority", "q6_forecast_revenue", "q7_volume_shipping",
    "q8_market_share", "q9_product_profit", "recall_score_topk",
    "source_schema_evolution", "source_upsert_pattern", "source_zorder_layout",
    "window_analytics",
    # (b) oldest-r10 re-gates from the round-14-touched modules
    "ann_lsh_recall", "ann_lsh_topk", "ann_pq_topk", "ann_quantized_topk",
    "dedup_embedding_cosine", "embedding_kmeans_lloyd",
    "embedding_label_centroids", "embedding_random_projection",
    "stream_dedup_ladder", "stream_ohlc_bars",
    "mv_incremental_refresh", "source_cdc_diff", "catalog_column_stats",
    # Queries REGISTERED this round (the delta-protocol table layer,
    # VERDICT r13 missing #1) have no driver evidence at all, which
    # outranks an r10 re-gate — they take the agg_histogram /
    # source_compaction_plan / udf_embed_batch_inference slots (all
    # three stay r10-evidenced, still inside the max-age<=r10 target).
    "source_delta_acid_roundtrip", "source_delta_checkpoint_log",
    "source_delta_merge_upsert",
    # round-14 output changes (trainer unification, nprobe=4): re-gate now
    "ann_ivf_topk", "ann_ivf_kmeans_topk", "ann_ivf_recall",
    "recall_multi_provider_rerank",
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
