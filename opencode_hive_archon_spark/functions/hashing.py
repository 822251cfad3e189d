"""Cross-engine deterministic hashing helpers.

The ONE hash idiom the engine allows inside oracle-checked outputs
(CONVENTIONS.md "CROSS-ENGINE HASH"): an md5 hex-prefix converted to an
integer, identical on Spark and DuckDB. Keep every caller on these two
helpers so the Spark expression and its SQL mirror can never drift apart.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_prefix_long(col: Column, n_hex: int = 4) -> Column:
    """First ``n_hex`` hex chars of md5(col) as a non-negative long.

    ``n_hex`` must be ≤ 15 so the base-16 conversion can't overflow a
    signed 64-bit integer on either engine."""
    assert 1 <= n_hex <= 15, n_hex
    return F.conv(F.substring(F.md5(col), 1, n_hex), 16, 10).cast("long")


def md5_prefix_long_sql(expr: str, n_hex: int = 4) -> str:
    """DuckDB mirror of :func:`md5_prefix_long` for oracle SQL strings."""
    assert 1 <= n_hex <= 15, n_hex
    return f"('0x' || substr(md5({expr}), 1, {n_hex}))::BIGINT"
