"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": N}. Queries are executed to completion with
the noop sink (full pipeline runs, nothing materializes on the driver).

Methodology: one untimed warm-up pass over the whole set (JVM/codegen/
parquet-footer/Arrow initialization), then SPARK_GRAFT_BENCH_ITERS (default
3) timed passes; the reported per-query number is the MEDIAN across passes,
so one GC pause or compilation stall cannot skew a query's figure.

Two tiers, one report: the tier-1 headline set gets the median-of-N
treatment; the tier-2 coverage set (one representative per remaining
family/shape: scenarios, ANN, simhash, UDTF, streaming variants, source
round-trip, ...) gets warm-up + a single timed pass — full per-family
timing visibility at roughly half the added wall-clock of a full
median-of-3. Both land in the same "queries" map; "tier2" lists which names
used the single-pass protocol.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from opencode_hive_archon_spark import registry
from opencode_hive_archon_spark.session import get_spark

# Headline set: SURVEY §2B Families 1-5 — retrieval (incl. the external-
# rerank route), relational (incl. Q5/Q14 star-join shapes, pivot, range
# join, stitched windows), LLM ops (dedup ladder, similarity, text),
# UDF surface, and a streaming representative.
BENCH_QUERIES = [
    "recall_score_topk",
    "recall_summary_branch",
    "recall_envelope",
    "recall_envelope_reranked",
    "scan_project_filter",
    "pricing_summary",
    "join_broadcast",
    "join_shuffle",
    "join_semi_anti",
    "join_outer_coalesce",
    "join_asof_event_order",
    "join_range_bucketed",
    "local_supplier_volume",
    "promo_revenue_share",
    "agg_distinct",
    "rollup_orders",
    "window_rank_topk_per_group",
    "window_running",
    "window_moving_avg",
    "sort_multi_limit",
    "pivot_lineitem_status",
    "json_extract_events",
    "similarity_topk",
    "similarity_join_labels",
    "dedup_exact",
    "dedup_near",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "text_token_stats",
    "text_quality_score",
    "udaf_grouped_normalize",
    "multimodal_join",
    "stream_tumbling_counts",
]

# Tier 2: every remaining family/shape gets a timed representative
# (single pass after warm-up). The companion *_recall gates are correctness
# machinery (they run exact + approximate back to back) and stay unbenched.
BENCH_TIER2 = [
    "recall_multi_provider_merge",
    "recall_compat",
    "scenario_replay",
    "scenario_forced_branches",
    "plan_diff_metrics",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "dedup_simhash",
    "text_langid",
    "text_rolling_fingerprint",
    "udf_scalar_clamp",
    "udtf_explode_tokens",
    "multimodal_meta_profile",
    "multimodal_decode_stub",
    "agg_skew_salted",
    "sql_pricing_summary",
    "unpivot_lineitem_status",
    "grouping_sets_orders",
    "source_roundtrip_formats",
    "source_partitioned_pruning",
    "q18_large_orders",
    "q21_waiting_suppliers",
    "q3_shipping_priority",
    "events_sessionize",
    "corpus_domain_cap",
    "ann_batch_topk",
    "ann_quantized_topk",
    "corpus_curation",
    "stream_static_join",
    "stream_stream_join",
    "stream_sliding_avg",
    "stream_session_windows",
    "stream_dedup",
    "stream_late_data",
    "stream_stateful_user_stats",
]


def run_query(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3"))
    spark = get_spark("bench")

    specs = registry.all_specs()
    # Warm the JVM (codegen, parquet footers, Arrow) so per-query timings
    # reflect steady state rather than first-touch initialization.
    spark.range(1000).count()
    from opencode_hive_archon_spark.session import TABLE_NAMES, read_table

    for t in TABLE_NAMES:
        read_table(spark, sf_dir, t).count()

    verbose = os.environ.get("SPARK_GRAFT_BENCH_VERBOSE")
    # Untimed warm-up pass: the first execution of each query absorbs
    # whole-stage-codegen compilation and shared-intermediate cache fills.
    for name in BENCH_QUERIES:
        run_query(specs[name].fn(spark, sf_dir))

    samples: dict[str, list[float]] = {name: [] for name in BENCH_QUERIES}
    for _ in range(iters):
        for name in BENCH_QUERIES:
            t0 = time.perf_counter()
            run_query(specs[name].fn(spark, sf_dir))
            samples[name].append(time.perf_counter() - t0)

    timings = {name: round(statistics.median(ts), 3) for name, ts in samples.items()}

    # Tier 2: warm-up + one timed pass per query.
    for name in BENCH_TIER2:
        run_query(specs[name].fn(spark, sf_dir))
    for name in BENCH_TIER2:
        t0 = time.perf_counter()
        run_query(specs[name].fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    if verbose:
        for name, t in timings.items():
            print(f"  {name}: {t:.2f}s", file=sys.stderr, flush=True)

    from opencode_hive_archon_spark.session import unpersist_all

    unpersist_all()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "tier2": BENCH_TIER2,
            }
        )
    )


if __name__ == "__main__":
    main()
