"""Family 1 tests: branch truth table, routing policy, recall pipeline.

Mirrors the reference's test strategy (SURVEY.md §5): deterministic branch
semantics over controlled inputs + repeated-run determinism.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from opencode_hive_archon_spark.config import RetrievalRequest
from opencode_hive_archon_spark.operators.recall import (
    recall_envelope,
    recall_score_topk,
    recall_summary_branch,
)
from opencode_hive_archon_spark.plans import branching
from opencode_hive_archon_spark.plans.routing import route_retrieval


def classify(spark, count, top, threshold=0.6, bypassed=False, provider="mem0"):
    """Evaluate the branch cascade over a literal one-row aggregate."""
    df = spark.range(1).select(
        F.lit(count).alias("candidate_count"), F.lit(float(top)).alias("top_confidence")
    )
    row = df.select(
        branching.branch_col(
            F.col("candidate_count"), F.col("top_confidence"), threshold, bypassed, provider
        ).alias("branch")
    ).first()
    return row["branch"]


class TestBranchTruthTable:
    """determine_branch truth table (reference fallbacks.py:162-199)."""

    def test_empty_set(self, spark):
        assert classify(spark, 0, 0.0) == "EMPTY_SET"

    def test_low_confidence_before_bypass(self, spark):
        # LOW_CONFIDENCE is checked BEFORE the bypass branch.
        assert classify(spark, 2, 0.45, bypassed=True) == "LOW_CONFIDENCE"

    def test_rerank_bypassed_requires_mem0(self, spark):
        assert classify(spark, 2, 0.85, bypassed=True, provider="mem0") == "RERANK_BYPASSED"
        assert classify(spark, 2, 0.85, bypassed=True, provider="supabase") == "SUCCESS"

    def test_success(self, spark):
        assert classify(spark, 2, 0.85) == "SUCCESS"

    def test_threshold_boundary(self, spark):
        # top == threshold is NOT low confidence (strict <).
        assert classify(spark, 1, 0.6) == "SUCCESS"

    def test_actions(self, spark):
        for branch, action in branching.BRANCH_ACTION.items():
            row = (
                spark.range(1)
                .select(branching.action_col(F.lit(branch)).alias("a"))
                .first()
            )
            assert row["a"] == action


class TestRoutingPolicy:
    """Routing truth table (reference retrieval_router.py:16-116)."""

    STATUS = {"mem0": "available", "supabase": "available", "graphiti": "unavailable"}
    FLAGS = {"mem0_enabled": True, "supabase_enabled": True, "graphiti_enabled": False}

    def test_conversation_prefers_mem0_with_skip(self):
        p, opts = route_retrieval(
            RetrievalRequest(query="q", mode="conversation"), self.STATUS, self.FLAGS
        )
        assert p == "mem0" and opts["skip_external_rerank"] is True

    def test_conversation_falls_to_supabase(self):
        status = {"mem0": "unavailable", "supabase": "available"}
        p, opts = route_retrieval(
            RetrievalRequest(query="q", mode="conversation"), status, self.FLAGS
        )
        assert p == "supabase" and opts["skip_external_rerank"] is False

    def test_fast_fixed_priority(self):
        p, _ = route_retrieval(RetrievalRequest(query="q", mode="fast"), self.STATUS, self.FLAGS)
        assert p == "mem0"

    def test_degraded_only_hits_final_fallback(self):
        status = {"mem0": "degraded", "supabase": "degraded"}
        p, _ = route_retrieval(
            RetrievalRequest(query="q", mode="conversation"), status, self.FLAGS
        )
        # enabled order is (graphiti, mem0, supabase); graphiti disabled.
        assert p == "mem0"

    def test_none_when_all_disabled(self):
        p, opts = route_retrieval(
            RetrievalRequest(query="q"),
            {},
            {"mem0_enabled": False, "supabase_enabled": False},
        )
        assert p == "none" and opts["skip_external_rerank"] is False

    def test_override_honored_iff_enabled(self):
        req = RetrievalRequest(query="q", provider_override="supabase")
        p, _ = route_retrieval(req, self.STATUS, self.FLAGS)
        assert p == "supabase"
        req2 = RetrievalRequest(query="q", provider_override="graphiti")
        p2, _ = route_retrieval(req2, self.STATUS, self.FLAGS)
        assert p2 == "mem0"  # falls through to normal selection


class TestRecallPipeline:
    def test_topk_is_total_ordered(self, spark, sf_dir):
        rows = recall_score_topk(spark, sf_dir).collect()
        assert len(rows) == 5
        confs = [r["confidence"] for r in rows]
        assert confs == sorted(confs, reverse=True)
        assert all(0.0 <= c <= 1.0 for c in confs)

    def test_summary_branch_shape(self, spark, sf_dir):
        row = recall_summary_branch(spark, sf_dir).first()
        assert row["candidate_count"] == 5
        assert row["branch"] in ("RERANK_BYPASSED", "LOW_CONFIDENCE", "SUCCESS")
        assert row["action"] in ("proceed", "clarify")

    def test_envelope_json_candidates(self, spark, sf_dir):
        row = recall_envelope(spark, sf_dir).first()
        assert row["provider"] == "mem0"
        assert row["candidates_json"].startswith('[{"id":')
        assert row["candidates_json"].count('"confidence"') == 5

    def test_deterministic_replay(self, spark, sf_dir):
        # The reference asserts x5 repeated-run identity; same invariant here.
        results = [
            tuple(r) for _ in range(3) for r in recall_score_topk(spark, sf_dir).collect()
        ]
        assert results == results[:5] * 3
