"""RecallEngine — the library API (reference parity: §3.3, R15, R18).

The Spark-native equivalent of the reference's RecallOrchestrator.run /
run_recall surface: construct with a SparkSession + config snapshots, call
``recall(request)`` and get the full envelope row (provider, summary,
branch, action, candidates) computed in one DataFrame plan against the
document store.

Stage map (SURVEY.md §3.1):
  route (driver-side Python)      -> source + plan-shape selection
  none-provider early exit        -> constant EMPTY_SET envelope
  scan + score + top-k            -> documents parquet, overlap rescoring
  branch classify + envelope      -> when() cascade + struct assembly
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opencode_hive_archon_spark.config import (
    RecallDefaults,
    RetrievalRequest,
    default_feature_flags,
    default_provider_status,
)
from opencode_hive_archon_spark.operators import recall as recall_ops
from opencode_hive_archon_spark.plans import branching
from opencode_hive_archon_spark.plans.routing import route_retrieval


class RecallEngine:
    """Entry point mirroring MCPServer.recall_search (mcp_server.py:13-47)."""

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        feature_flags: dict[str, bool] | None = None,
        provider_status: dict[str, str] | None = None,
        defaults: RecallDefaults | None = None,
    ):
        self.spark = spark
        self.sf_dir = sf_dir
        self.feature_flags = feature_flags or default_feature_flags()
        self.provider_status = provider_status or default_provider_status()
        self.defaults = defaults or RecallDefaults()

    def recall(self, request: RetrievalRequest) -> DataFrame:
        """Route -> scan -> score -> top-k -> classify -> envelope."""
        # Blank-query short-circuit (memory.py:46-47) and none-provider exit
        # (recall.py:62-76) both elide the whole scan.
        if not request.query.strip():
            return self._empty_envelope("none")
        provider, opts = route_retrieval(request, self.provider_status, self.feature_flags)
        if provider == "none":
            return self._empty_envelope("none")
        return recall_ops.recall_envelope(
            self.spark,
            self.sf_dir,
            query=request.query,
            top_k=request.top_k,
            threshold=request.threshold,
            provider=provider,
            rerank_bypassed=opts["skip_external_rerank"],
        )

    def _empty_envelope(self, provider: str) -> DataFrame:
        """Constant EMPTY_SET envelope (fallbacks.py:22-43)."""
        branch = F.lit(branching.EMPTY_SET)
        return self.spark.range(1).select(
            F.lit(provider).alias("provider"),
            F.lit(False).alias("rerank_applied"),
            F.lit(0.0).alias("top_confidence"),
            F.lit(0).cast("long").alias("candidate_count"),
            F.lit(False).alias("threshold_met"),
            branch.alias("branch"),
            branching.action_col(branch).alias("action"),
            branching.reason_col(branch, F.lit(0), F.lit(0.0), 0.6).alias("reason"),
            F.lit("[]").alias("candidates_json"),
        )
