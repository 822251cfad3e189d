"""Engine configuration snapshots (reference parity: R22).

Mirrors the reference's dependency-injection defaults
(/root/reference/backend/src/second_brain/deps.py:7-52): which providers are
flag-enabled, their health snapshot, and the default recall parameters.
In the Spark engine a "provider" maps to a source table + pipeline shape;
the flags/status decide plan construction (driver-side), never a runtime
row-level filter — dead sources are simply never scanned (≙ source pruning).
"""

from __future__ import annotations

from dataclasses import dataclass, field

AVAILABLE = "available"
UNAVAILABLE = "unavailable"
DEGRADED = "degraded"

PROVIDER_PRIORITY = ("mem0", "supabase", "graphiti")


def default_feature_flags() -> dict[str, bool]:
    """deps.py:7-14 — graphiti default-off, everything else on."""
    return {
        "mem0_enabled": True,
        "supabase_enabled": True,
        "graphiti_enabled": False,
        "external_rerank_enabled": True,
    }


def default_provider_status() -> dict[str, str]:
    """deps.py:17-25 — deterministic health snapshot."""
    return {"mem0": AVAILABLE, "supabase": AVAILABLE, "graphiti": UNAVAILABLE}


@dataclass(frozen=True)
class RecallDefaults:
    """deps.py:44-52 — default recall parameters."""

    mode: str = "conversation"
    top_k: int = 5
    threshold: float = 0.6
    mem0_rerank_native: bool = True
    mem0_skip_external_rerank: bool = True


@dataclass(frozen=True)
class RetrievalRequest:
    """Query spec (reference contracts/context_packet.py:40-46).

    These are bind variables for plan construction, not data.
    """

    query: str
    mode: str = "conversation"  # fast | accurate | conversation
    top_k: int = 5
    threshold: float = 0.6
    provider_override: str | None = None

    def __post_init__(self) -> None:
        if self.mode not in ("fast", "accurate", "conversation"):
            raise ValueError(f"invalid mode: {self.mode}")
        if self.top_k < 1:
            raise ValueError("top_k must be >= 1")
        if not 0.0 <= self.threshold <= 1.0:
            raise ValueError("threshold must be in [0, 1]")
