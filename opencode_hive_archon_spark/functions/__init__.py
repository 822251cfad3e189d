"""Reusable JVM-side column expressions (the engine's scalar library).

Everything here is built from ``pyspark.sql.functions`` so it stays inside
whole-stage codegen — no Python in the hot path. These are the building
blocks the operator modules compose.
"""

from opencode_hive_archon_spark.functions.text import (
    norm_tokens,
    overlap_count,
    overlap_score,
)
from opencode_hive_archon_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = [
    "norm_tokens",
    "overlap_count",
    "overlap_score",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
]
