"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": N}. Queries are executed to completion with
the noop sink (full pipeline runs, nothing materializes on the driver).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from opencode_hive_archon_spark import registry
from opencode_hive_archon_spark.session import get_spark

# Headline set: SURVEY §2B Families 1-3 (retrieval, relational, LLM ops).
BENCH_QUERIES = [
    "recall_score_topk",
    "recall_summary_branch",
    "recall_envelope",
    "scan_project_filter",
    "pricing_summary",
    "join_broadcast",
    "join_shuffle",
    "join_semi_anti",
    "join_outer_coalesce",
    "join_asof_event_order",
    "agg_distinct",
    "rollup_orders",
    "window_rank_topk_per_group",
    "window_running",
    "sort_multi_limit",
    "json_extract_events",
    "similarity_topk",
    "similarity_join_labels",
    "dedup_exact",
    "dedup_near",
    "dedup_minhash_lsh",
    "text_token_stats",
    "text_quality_score",
    "multimodal_join",
]


def run_query(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("bench")

    specs = registry.all_specs()
    # Warm the JVM (codegen, parquet footers, Arrow) so per-query timings
    # reflect steady state rather than first-touch initialization.
    spark.range(1000).count()
    from opencode_hive_archon_spark.session import TABLE_NAMES, read_table

    for t in TABLE_NAMES:
        read_table(spark, sf_dir, t).count()

    verbose = os.environ.get("SPARK_GRAFT_BENCH_VERBOSE")
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = specs[name].fn
        t0 = time.perf_counter()
        run_query(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)
        if verbose:
            print(f"  {name}: {timings[name]:.2f}s", file=sys.stderr, flush=True)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
