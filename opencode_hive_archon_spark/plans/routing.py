"""Deterministic access-path selection (reference parity: R9-R11).

Semantics from /root/reference/backend/src/second_brain/orchestration/
retrieval_router.py:16-116, re-expressed as plan-time source selection:

* feature flags prune providers before anything else (:62-76);
* ``provider_override`` is honored iff the override is flag-enabled (:104-108);
* conversation mode prefers mem0 (with the skip-external-rerank policy),
  else supabase (:33-38);
* fast mode takes the first AVAILABLE provider in the fixed priority order
  mem0 → supabase → graphiti (:40-45);
* accurate mode takes the first AVAILABLE in caller order (:47-52 — the
  reference documents this as a simplified multi-provider merge);
* the final fallback also accepts DEGRADED providers (:54-58);
* otherwise the route is ("none", ...) and the whole pipeline is elided.

The ``skip_external_rerank`` option implements the redundant-operator
elimination documented in docs/architecture/retrieval-overlap-policy.md:17-25:
when the provider already reranked natively (mem0), the external rerank stage
is never added to the plan.
"""

from __future__ import annotations

from opencode_hive_archon_spark.config import (
    AVAILABLE,
    DEGRADED,
    PROVIDER_PRIORITY,
    RetrievalRequest,
)

_FLAG_DEFAULTS = {"mem0": True, "supabase": True, "graphiti": False}


def enabled_providers(feature_flags: dict[str, bool]) -> list[str]:
    """Providers that pass their feature-flag gate (router :62-76).

    Order matters downstream ("accurate" mode uses it): graphiti is checked
    first in the reference, then mem0, then supabase — preserved here.
    """
    out = []
    for provider in ("graphiti", "mem0", "supabase"):
        if feature_flags.get(f"{provider}_enabled", _FLAG_DEFAULTS[provider]):
            out.append(provider)
    return out


def select_route(
    mode: str,
    providers: list[str],
    provider_status: dict[str, str],
) -> tuple[str, dict]:
    """Core truth table (router :16-60). Returns (provider, route_options)."""

    def _skip(provider: str) -> dict:
        return {"skip_external_rerank": provider == "mem0"}

    if not providers:
        return "none", {"skip_external_rerank": False}

    if mode == "conversation":
        if "mem0" in providers and provider_status.get("mem0") == AVAILABLE:
            return "mem0", {"skip_external_rerank": True}
        if "supabase" in providers and provider_status.get("supabase") == AVAILABLE:
            return "supabase", {"skip_external_rerank": False}
    elif mode == "fast":
        for provider in PROVIDER_PRIORITY:
            if provider in providers and provider_status.get(provider) == AVAILABLE:
                return provider, _skip(provider)
    elif mode == "accurate":
        for provider in providers:
            if provider_status.get(provider) == AVAILABLE:
                return provider, _skip(provider)

    # Final fallback: first enabled provider that is at least DEGRADED.
    for provider in providers:
        if provider_status.get(provider) in (AVAILABLE, DEGRADED):
            return provider, _skip(provider)

    return "none", {"skip_external_rerank": False}


def route_retrieval(
    request: RetrievalRequest,
    provider_status: dict[str, str] | None = None,
    feature_flags: dict[str, bool] | None = None,
) -> tuple[str, dict]:
    """Full routing entry point (router :79-116), override included."""
    provider_status = provider_status or {}
    feature_flags = feature_flags or {}
    providers = enabled_providers(feature_flags)

    if request.provider_override and request.provider_override in providers:
        return request.provider_override, {
            "skip_external_rerank": request.provider_override == "mem0"
        }

    return select_route(request.mode, providers, provider_status)
