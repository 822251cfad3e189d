"""Branch classification + action mapping (reference parity: R12-R14).

Semantics from /root/reference/backend/src/second_brain/orchestration/
fallbacks.py:162-199, re-expressed as a single ``when()`` cascade evaluated
over the one-row confidence aggregate — order is load-bearing:

    count == 0                      -> EMPTY_SET       (fallbacks.py:181-182)
    top_confidence < threshold      -> LOW_CONFIDENCE  (:187-190, BEFORE bypass)
    rerank_bypassed AND mem0        -> RERANK_BYPASSED (:193-194)
    otherwise                       -> SUCCESS         (:197-199)

Preserved quirks (observable behavior, SURVEY.md §7 risk register):
* RERANK_BYPASSED computes ``threshold_met`` against a FIXED 0.6, ignoring
  the request threshold (fallbacks.py:115);
* LOW_CONFIDENCE and EMPTY_SET force ``threshold_met = false`` and
  ``rerank_applied = false`` even when a native rerank ran (:29-33, :58-62);
* RERANK_BYPASSED reports ``rerank_applied = true`` (provider-native,
  :119); SUCCESS reports the bypass flag verbatim (:198).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMPTY_SET = "EMPTY_SET"
LOW_CONFIDENCE = "LOW_CONFIDENCE"
CHANNEL_MISMATCH = "CHANNEL_MISMATCH"
RERANK_BYPASSED = "RERANK_BYPASSED"
SUCCESS = "SUCCESS"

BRANCH_ACTION = {
    EMPTY_SET: "fallback",
    LOW_CONFIDENCE: "clarify",
    CHANNEL_MISMATCH: "escalate",
    RERANK_BYPASSED: "proceed",
    SUCCESS: "proceed",
}

# emit_rerank_bypassed hardcodes 0.6 (fallbacks.py:115) — not the request
# threshold. Faithfully preserved.
_BYPASS_FIXED_THRESHOLD = 0.6


def _lit(x) -> Column:
    return x if isinstance(x, Column) else F.lit(x)


def branch_col(
    count: Column,
    top_confidence: Column,
    threshold,
    rerank_bypassed,
    provider,
) -> Column:
    """The CASE cascade. `threshold`/`rerank_bypassed`/`provider` may be
    plan-time Python constants or data-driven Columns (scenario replay)."""
    threshold, rerank_bypassed, provider = map(
        _lit, (threshold, rerank_bypassed, provider)
    )
    return (
        F.when(count == 0, F.lit(EMPTY_SET))
        .when(top_confidence < threshold, F.lit(LOW_CONFIDENCE))
        .when(rerank_bypassed & (provider == "mem0"), F.lit(RERANK_BYPASSED))
        .otherwise(F.lit(SUCCESS))
    )


def action_col(branch: Column) -> Column:
    """Branch -> next action (the emitters' action constants)."""
    cascade = None
    for code, action in BRANCH_ACTION.items():
        cond = branch == code
        cascade = F.when(cond, action) if cascade is None else cascade.when(cond, action)
    return cascade.otherwise(F.lit(None).cast("string"))


def threshold_met_col(branch: Column, top_confidence: Column, threshold) -> Column:
    """Per-emitter threshold_met semantics (see module docstring)."""
    return (
        F.when(branch.isin(EMPTY_SET, LOW_CONFIDENCE, CHANNEL_MISMATCH), F.lit(False))
        .when(branch == RERANK_BYPASSED, top_confidence >= F.lit(_BYPASS_FIXED_THRESHOLD))
        .otherwise(F.lit(True))  # SUCCESS asserts threshold_met=True (:146)
    )


def rerank_applied_col(branch: Column, rerank_bypassed) -> Column:
    """Per-emitter rerank_applied semantics (fallbacks.py:33,62,90,119,149,198)."""
    rerank_bypassed = _lit(rerank_bypassed)
    return (
        F.when(branch.isin(EMPTY_SET, LOW_CONFIDENCE, CHANNEL_MISMATCH), F.lit(False))
        .when(branch == RERANK_BYPASSED, F.lit(True))
        .otherwise(rerank_bypassed)
    )


def reason_col(
    branch: Column,
    count: Column,
    top_confidence: Column,
    threshold,
    expected_channel: str = "test_channel",
) -> Column:
    """Human-readable reason strings (the emitters' reason fields,
    fallbacks.py:38,67,95,124,154). LOW_CONFIDENCE interpolates scores
    with %.2f formatting exactly as the reference f-string does.
    CHANNEL_MISMATCH interpolates the expected channel — the reference only
    reaches that emitter through the forced-branch path, which passes
    "test_channel" (recall.py:191-194)."""
    threshold = _lit(threshold)
    return (
        F.when(branch == EMPTY_SET, F.lit("No context candidates retrieved from any provider"))
        .when(
            branch == LOW_CONFIDENCE,
            F.format_string(
                "Top confidence %.2f below threshold %.2f", top_confidence, threshold
            ),
        )
        .when(
            branch == CHANNEL_MISMATCH,
            F.lit(f"Retrieved context doesn't match expected channel: {expected_channel}"),
        )
        .when(
            branch == RERANK_BYPASSED,
            F.lit("Provider-native rerank applied, external rerank bypassed per policy"),
        )
        .otherwise(F.format_string("Retrieved %d high-confidence candidates", count))
    )


def suggestion_col(branch: Column) -> Column:
    """NextAction.suggestion per emitter (fallbacks.py:41,71,100,128,158):
    non-null for the three fallback branches, NULL for proceed branches."""
    return (
        F.when(
            branch == EMPTY_SET,
            F.lit("Ask user to rephrase query or provide more context"),
        )
        .when(
            branch == LOW_CONFIDENCE,
            F.lit("Request clarification on query intent or narrow scope"),
        )
        .when(
            branch == CHANNEL_MISMATCH,
            F.lit("Escalate to human or trigger intent reclassification"),
        )
        .otherwise(F.lit(None).cast("string"))
    )
