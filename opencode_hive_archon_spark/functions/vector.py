"""Vector scalar expressions over ``array<float>`` columns.

Pure higher-order-function math (``zip_with`` + ``aggregate``) — stays
JVM-side, no UDF, no MLlib ``Vector`` conversion. At 100 TB the dominant
cost is the scan + shuffle shape around these expressions, not the
per-element arithmetic, which codegen vectorizes fine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Elementwise dot product of two array<numeric> columns."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm of an array<numeric> column."""
    return F.sqrt(
        F.aggregate(
            _c(a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL-safe zero-norm guard returns NULL."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0.0, dot_product(a, b) / denom)
