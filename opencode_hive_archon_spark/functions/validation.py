"""Engine-side contract checks (reference parity: Pydantic validation).

The reference validates at model construction (confidence ∈ [0,1] raises,
contracts/context_packet.py:11, exercised at
tests/test_context_packet_contract.py:31-38). Spark has no column
constraints, so the engine applies CHECK-style rules as assert-true
expressions evaluated in-plan: any violating row fails the job with a
descriptive error (SURVEY.md §1.2 type mapping).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ACTIONS = ("proceed", "clarify", "fallback", "escalate")
MODES = ("fast", "accurate", "conversation")


def checked(df: DataFrame, name: str, predicate: Column) -> DataFrame:
    """Attach a CHECK constraint: rows where ``predicate`` is false fail the
    query at execution time with the constraint name."""
    probe = F.assert_true(
        predicate, F.concat(F.lit(f"CHECK '{name}' violated for row: "), F.to_json(F.struct("*")))
    )
    # assert_true returns NULL on success; keep it out of the real output.
    return df.withColumn("__check__", probe).filter(F.col("__check__").isNull()).drop(
        "__check__"
    )


def confidence_in_bounds(col: str = "confidence") -> Column:
    return (F.col(col) >= 0.0) & (F.col(col) <= 1.0)


def action_in_domain(col: str = "action") -> Column:
    return F.col(col).isin(*ACTIONS)


def mode_in_domain(col: str = "mode") -> Column:
    return F.col(col).isin(*MODES)
