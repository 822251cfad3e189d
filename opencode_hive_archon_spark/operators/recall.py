"""Family 1 — the reference-faithful retrieval pipeline, Spark-first.

The reference pipeline (SURVEY.md §3.1) is: route -> scan -> sort -> top-k ->
[rerank] -> confidence aggregate -> branch CASE -> envelope. Here the
candidate store is the ``documents`` parquet table (content ↔ documents.text,
SURVEY.md §1.3); scoring is the reference's lexical-overlap rescoring formula
(voyage.py:74: ``min(1.0, base + 0.05 * overlap)``) evaluated entirely
JVM-side; top-k compiles to ``TakeOrderedAndProject`` (no global sort, no
driver collect — at 100 TB the scan is embarrassingly parallel and only k
rows ever leave the executors).

Determinism: every ordering carries a unique tie-break key (doc_id) so
results are total-ordered and oracle hash-stable (SURVEY.md §7 risk register).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opencode_hive_archon_spark.functions.text import overlap_score
from opencode_hive_archon_spark.plans import branching
from opencode_hive_archon_spark.spec import QuerySpec

# Flagship query terms: drawn from the synthetic documents vocabulary so
# overlap scoring produces a spread of confidences.
DEFAULT_QUERY = "fast hash join table scan merge"
DEFAULT_TOP_K = 5
DEFAULT_THRESHOLD = 0.6
# Base confidence proxy for the document store (the reference's provider
# confidence is mocked upstream; the engine uses a flat prior and lets the
# overlap rescoring differentiate).
BASE_CONFIDENCE = 0.5

# The flagship declared queries run the conversation-mode route, which per
# the routing policy selects mem0 with skip_external_rerank=True (routing.py)
# — so the expected branch on a confident result set is RERANK_BYPASSED.
PROVIDER = "mem0"
RERANK_BYPASSED_FLAG = True


def scored_candidates(
    spark: SparkSession,
    sf_dir: str,
    query: str = DEFAULT_QUERY,
    base: float = BASE_CONFIDENCE,
) -> DataFrame:
    """documents scan -> overlap rescoring. Column-pruned scan: only
    (doc_id, text, source) are read from parquet."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return docs.select(
        F.col("doc_id").alias("id"),
        F.col("text").alias("content"),
        F.col("source").alias("source"),
        overlap_score(query, F.col("text"), F.lit(float(base))).alias("confidence"),
    )


def recall_score_topk(
    spark: SparkSession,
    sf_dir: str,
    query: str = DEFAULT_QUERY,
    top_k: int = DEFAULT_TOP_K,
) -> DataFrame:
    """R7+R4+R5: rescore, sort desc, global top-k (voyage.py:67-88,
    memory.py:86-87). Total order via (confidence desc, id asc)."""
    return (
        scored_candidates(spark, sf_dir, query)
        .orderBy(F.col("confidence").desc(), F.col("id").asc())
        .limit(top_k)
    )


def recall_summary_branch(
    spark: SparkSession,
    sf_dir: str,
    query: str = DEFAULT_QUERY,
    top_k: int = DEFAULT_TOP_K,
    threshold: float = DEFAULT_THRESHOLD,
    provider: str = PROVIDER,
    rerank_bypassed: bool = RERANK_BYPASSED_FLAG,
) -> DataFrame:
    """R12+R13: aggregate the top-k into the confidence summary + branch +
    action row (fallbacks.py:162-199 CASE cascade)."""
    topk = recall_score_topk(spark, sf_dir, query, top_k)
    agg = topk.agg(
        F.coalesce(F.max("confidence"), F.lit(0.0)).alias("top_confidence"),
        F.count(F.lit(1)).alias("candidate_count"),
    )
    branch = branching.branch_col(
        F.col("candidate_count"), F.col("top_confidence"), threshold, rerank_bypassed, provider
    )
    return agg.select(
        F.col("top_confidence"),
        F.col("candidate_count"),
        branch.alias("branch"),
    ).select(
        "top_confidence",
        "candidate_count",
        branching.threshold_met_col(F.col("branch"), F.col("top_confidence"), threshold).alias(
            "threshold_met"
        ),
        "branch",
        branching.action_col(F.col("branch")).alias("action"),
    )


def recall_envelope(
    spark: SparkSession,
    sf_dir: str,
    query: str = DEFAULT_QUERY,
    top_k: int = DEFAULT_TOP_K,
    threshold: float = DEFAULT_THRESHOLD,
    provider: str = PROVIDER,
    rerank_bypassed: bool = RERANK_BYPASSED_FLAG,
) -> DataFrame:
    """R15+R20: the full ContextPacket envelope as one row
    (context_packet.py:23-29). Candidates are serialized to a deterministic
    JSON array string (confidence printf'd to 2 decimals) so the oracle can
    reproduce it byte-for-byte; timestamp excluded by design (SURVEY §2B).

    collect_list only runs AFTER the top-k truncation — at most k rows are
    ever assembled, so this is safe at any scale.
    """
    topk = recall_score_topk(spark, sf_dir, query, top_k)
    cand_json = F.format_string(
        '{"id":%d,"source":"%s","confidence":%.2f}',
        F.col("id"),
        F.col("source"),
        F.col("confidence"),
    )
    # sort_array over (neg-rank keys, json) keeps the serialized order total.
    agg = topk.agg(
        F.coalesce(F.max("confidence"), F.lit(0.0)).alias("top_confidence"),
        F.count(F.lit(1)).alias("candidate_count"),
        F.concat(
            F.lit("["),
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct((-F.col("confidence")).alias("nc"), F.col("id"), cand_json.alias("j")))
                    ),
                    lambda s: s["j"],
                ),
                ",",
            ),
            F.lit("]"),
        ).alias("candidates_json"),
    )
    branch = branching.branch_col(
        F.col("candidate_count"), F.col("top_confidence"), threshold, rerank_bypassed, provider
    )
    return agg.select(
        F.lit(provider).alias("provider"),
        "top_confidence",
        "candidate_count",
        branch.alias("branch"),
        "candidates_json",
    ).select(
        "provider",
        branching.rerank_applied_col(F.col("branch"), rerank_bypassed).alias("rerank_applied"),
        "top_confidence",
        "candidate_count",
        branching.threshold_met_col(F.col("branch"), F.col("top_confidence"), threshold).alias(
            "threshold_met"
        ),
        "branch",
        branching.action_col(F.col("branch")).alias("action"),
        branching.reason_col(
            F.col("branch"), F.col("candidate_count"), F.col("top_confidence"), threshold
        ).alias("reason"),
        "candidates_json",
    )


def recall_multi_provider_merge(
    spark: SparkSession,
    sf_dir: str,
    query: str = DEFAULT_QUERY,
    top_k: int = DEFAULT_TOP_K,
) -> DataFrame:
    """The multi-provider merge the reference DECLARES but simplifies to
    "first available" (retrieval_router.py:48; product plan names a real
    multi-store merge + rerank — SURVEY.md §2A negative findings).

    Engine version, done properly: two provider views over the document
    store (hash-partitioned by doc_id parity, standing in for mem0 /
    supabase), each scored with its own base prior; merged by id keeping
    the best-scoring hit (dedupe across stores), then the external rerank
    adjustment and global top-k. One union + one groupBy shuffle.
    """
    scored = scored_candidates(spark, sf_dir, query)
    mem0 = scored.filter(F.col("id") % 2 == 0).withColumn("provider", F.lit("mem0"))
    supa = (
        scored.filter(F.col("id") % 3 == 0)
        .withColumn("provider", F.lit("supabase"))
        # provider-specific prior: supabase hits score slightly lower
        .withColumn("confidence", F.greatest(F.lit(0.0), F.col("confidence") - F.lit(0.05)))
    )
    merged = (
        mem0.unionByName(supa)
        .groupBy("id")
        .agg(
            F.max(F.struct("confidence", "provider")).alias("best"),
            F.count(F.lit(1)).alias("n_providers"),
        )
        .select(
            "id",
            F.col("best.provider").alias("provider"),
            F.col("best.confidence").alias("confidence"),
            "n_providers",
        )
    )
    return merged.orderBy(F.col("confidence").desc(), F.col("id").asc()).limit(top_k)


# ---------------------------------------------------------------------------
# DuckDB oracles. The scoring CTE mirrors functions/text.py token-for-token:
# whitespace-normalize -> lower -> split on single space -> distinct ->
# intersect -> min(1.0, 0.5 + 0.05*overlap), all in DOUBLE.
# ---------------------------------------------------------------------------

_SCORED_CTE = f"""
scored AS (
  SELECT doc_id AS id, text AS content, source,
         least(1.0, 0.5 + 0.05 * len(list_intersect(
             list_distinct(string_split(regexp_replace(trim(lower('{DEFAULT_QUERY}')), '\\s+', ' ', 'g'), ' ')),
             list_distinct(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' '))
         ))) AS confidence
  FROM documents
),
topk AS (
  SELECT * FROM scored ORDER BY confidence DESC, id ASC LIMIT {DEFAULT_TOP_K}
)
"""

_ORACLE_SCORE_TOPK = f"""
WITH {_SCORED_CTE}
SELECT id, content, source, confidence FROM topk
"""

# Branch CASE constants for the flagship route: provider='mem0',
# rerank_bypassed=true, threshold=0.6 (conversation-mode route).
_BRANCH_CASE = f"""
CASE WHEN candidate_count = 0 THEN 'EMPTY_SET'
     WHEN top_confidence < {DEFAULT_THRESHOLD} THEN 'LOW_CONFIDENCE'
     WHEN {str(RERANK_BYPASSED_FLAG).lower()} AND '{PROVIDER}' = 'mem0' THEN 'RERANK_BYPASSED'
     ELSE 'SUCCESS' END
"""

_ORACLE_SUMMARY_BRANCH = f"""
WITH {_SCORED_CTE},
agg AS (
  SELECT coalesce(max(confidence), 0.0) AS top_confidence,
         count(*) AS candidate_count
  FROM topk
),
classified AS (
  SELECT top_confidence, candidate_count, {_BRANCH_CASE} AS branch FROM agg
)
SELECT top_confidence, candidate_count,
       CASE WHEN branch IN ('EMPTY_SET','LOW_CONFIDENCE','CHANNEL_MISMATCH') THEN false
            WHEN branch = 'RERANK_BYPASSED' THEN top_confidence >= 0.6
            ELSE true END AS threshold_met,
       branch,
       CASE branch WHEN 'EMPTY_SET' THEN 'fallback'
                   WHEN 'LOW_CONFIDENCE' THEN 'clarify'
                   WHEN 'CHANNEL_MISMATCH' THEN 'escalate'
                   ELSE 'proceed' END AS action
FROM classified
"""

_ORACLE_ENVELOPE = f"""
WITH {_SCORED_CTE},
agg AS (
  SELECT coalesce(max(confidence), 0.0) AS top_confidence,
         count(*) AS candidate_count,
         '[' || coalesce(string_agg(
             printf('{{"id":%d,"source":"%s","confidence":%.2f}}', id, source, confidence),
             ',' ORDER BY confidence DESC, id ASC), '') || ']' AS candidates_json
  FROM topk
),
classified AS (
  SELECT *, {_BRANCH_CASE} AS branch FROM agg
)
SELECT '{PROVIDER}' AS provider,
       CASE WHEN branch IN ('EMPTY_SET','LOW_CONFIDENCE','CHANNEL_MISMATCH') THEN false
            WHEN branch = 'RERANK_BYPASSED' THEN true
            ELSE {str(RERANK_BYPASSED_FLAG).lower()} END AS rerank_applied,
       top_confidence, candidate_count,
       CASE WHEN branch IN ('EMPTY_SET','LOW_CONFIDENCE','CHANNEL_MISMATCH') THEN false
            WHEN branch = 'RERANK_BYPASSED' THEN top_confidence >= 0.6
            ELSE true END AS threshold_met,
       branch,
       CASE branch WHEN 'EMPTY_SET' THEN 'fallback'
                   WHEN 'LOW_CONFIDENCE' THEN 'clarify'
                   WHEN 'CHANNEL_MISMATCH' THEN 'escalate'
                   ELSE 'proceed' END AS action,
       CASE branch
            WHEN 'EMPTY_SET' THEN 'No context candidates retrieved from any provider'
            WHEN 'LOW_CONFIDENCE' THEN printf('Top confidence %.2f below threshold %.2f', top_confidence, {DEFAULT_THRESHOLD})
            WHEN 'RERANK_BYPASSED' THEN 'Provider-native rerank applied, external rerank bypassed per policy'
            ELSE printf('Retrieved %d high-confidence candidates', candidate_count) END AS reason,
       candidates_json
FROM classified
"""

_ORACLE_MULTI_MERGE = f"""
WITH {_SCORED_CTE},
mem0 AS (
  SELECT id, confidence, 'mem0' AS provider FROM scored WHERE id % 2 = 0
),
supa AS (
  SELECT id, greatest(0.0, confidence - 0.05) AS confidence, 'supabase' AS provider
  FROM scored WHERE id % 3 = 0
),
unioned AS (SELECT * FROM mem0 UNION ALL SELECT * FROM supa),
merged AS (
  SELECT id, provider, confidence,
         count(*) OVER (PARTITION BY id) AS n_providers,
         row_number() OVER (PARTITION BY id ORDER BY confidence DESC, provider DESC) AS rn
  FROM unioned
)
SELECT id, provider, confidence, n_providers
FROM merged WHERE rn = 1
ORDER BY confidence DESC, id ASC LIMIT {DEFAULT_TOP_K}
"""

SPECS = [
    QuerySpec(
        name="recall_multi_provider_merge",
        fn=recall_multi_provider_merge,
        oracle=_ORACLE_MULTI_MERGE,
        family="retrieval",
        description="real multi-store merge + dedupe + top-k (reference declares, engine delivers)",
    ),
    QuerySpec(
        name="recall_score_topk",
        fn=recall_score_topk,
        oracle=_ORACLE_SCORE_TOPK,
        family="retrieval",
        description="lexical-overlap rescoring + global top-k (R4,R5,R7)",
    ),
    QuerySpec(
        name="recall_summary_branch",
        fn=recall_summary_branch,
        oracle=_ORACLE_SUMMARY_BRANCH,
        family="retrieval",
        description="confidence aggregate + branch CASE cascade (R12,R13)",
    ),
    QuerySpec(
        name="recall_envelope",
        fn=recall_envelope,
        oracle=_ORACLE_ENVELOPE,
        family="retrieval",
        description="full ContextPacket envelope, JSON-serialized candidates (R15,R20)",
    ),
]
