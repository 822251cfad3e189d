"""Canary for driver-side testdata regeneration.

The driver regenerates /root/testdata between rounds and has already flipped
``events.ts`` twice (parquet TIMESTAMP(NANOS) read as bigint under
nanosAsLong -> timezone-less timestamp[us] read as TIMESTAMP_NTZ). Every
operator assumes the NORMALIZED schemas below, i.e. what
``session.read_table`` returns after its type normalization — so if a
regeneration drifts a physical type that normalization doesn't absorb, this
test fails first and names the exact table/column, instead of nine scattered
AnalysisExceptions deep inside watermarks and epoch casts.
"""

from __future__ import annotations

import pytest

from opencode_hive_archon_spark.session import TABLE_NAMES, read_table

# Normalized (post-read_table) schema contract for every testdata table.
EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp",
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",  # watermark/unix_micros surface: must NOT be ntz/bigint
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


def test_expected_covers_all_tables():
    assert sorted(EXPECTED) == sorted(TABLE_NAMES)


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_normalized_schema(spark, sf_dir, table):
    actual = dict(read_table(spark, sf_dir, table).dtypes)
    expected = EXPECTED[table]
    missing = sorted(set(expected) - set(actual))
    extra = sorted(set(actual) - set(expected))
    assert not missing and not extra, (
        f"{table}: testdata regeneration changed the column set "
        f"(missing={missing}, unexpected={extra})"
    )
    drifted = {
        col: (have, want)
        for col, want in expected.items()
        if (have := actual[col]) != want
    }
    assert not drifted, (
        f"{table}: type drift after read_table normalization — "
        + ", ".join(
            f"{col} is {have!r}, engine expects {want!r}"
            for col, (have, want) in sorted(drifted.items())
        )
        + ". If the physical parquet type changed, extend "
        "session.normalize_timestamps / read_table."
    )
