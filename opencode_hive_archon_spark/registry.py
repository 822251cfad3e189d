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
    "opencode_hive_archon_spark.operators.textops",
    "opencode_hive_archon_spark.operators.udfs",
    "opencode_hive_archon_spark.operators.multimodal",
    "opencode_hive_archon_spark.operators.plandiff",
    "opencode_hive_archon_spark.operators.skew",
    "opencode_hive_archon_spark.operators.reshape",
    "opencode_hive_archon_spark.operators.tpch_style",
    "opencode_hive_archon_spark.plans.scenarios",
    "opencode_hive_archon_spark.sources.io",
    "opencode_hive_archon_spark.streaming.jobs",
]


def all_specs() -> dict[str, QuerySpec]:
    out: dict[str, QuerySpec] = {}
    for mod_name in _SPEC_MODULES:
        mod = importlib.import_module(mod_name)
        for spec in getattr(mod, "SPECS", []):
            if spec.name in out:
                raise ValueError(f"duplicate query name: {spec.name}")
            out[spec.name] = spec
    return out


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None
    }
