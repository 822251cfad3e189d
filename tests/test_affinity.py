"""Behavioral tests: market-basket affinity + RAG chunking."""

from __future__ import annotations

from opencode_hive_archon_spark.operators.affinity import (
    BASKET_TOP,
    orders_market_basket,
)
from opencode_hive_archon_spark.operators.chunking import (
    CHUNK_SIZE,
    CHUNK_STRIDE,
    chunk_table,
)


def test_market_basket_scores_consistent(spark, sf_dir):
    """Canonical pair order, support bounded by both marginals, and the
    lift column equal to the one-division formula recomputed driver-side."""
    from opencode_hive_archon_spark.session import read_table
    import pyspark.sql.functions as F

    out = orders_market_basket(spark, sf_dir).collect()
    assert 0 < len(out) <= BASKET_TOP
    n_orders = (
        read_table(spark, sf_dir, "lineitem")
        .select(F.countDistinct("l_orderkey").alias("n"))
        .first()
        .n
    )
    supports = [r.support for r in out]
    assert supports == sorted(supports, reverse=True)
    for r in out:
        assert r.brand_a < r.brand_b
        assert r.support <= min(r.n_a, r.n_b)
        assert r.lift == r.support * n_orders / (r.n_a * r.n_b)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, lang string, text string")


def test_chunking_grid_boundaries(spark):
    """Exact-size doc -> one chunk; one char over -> two chunks with the
    short tail starting on the stride grid; short doc -> itself."""
    exact = "a" * CHUNK_SIZE
    over = "b" * (CHUNK_SIZE + 1)
    docs = _docs(spark, [(1, "en", "tiny"), (2, "en", exact), (3, "en", over)])
    out = {}
    for r in chunk_table(docs).collect():
        out.setdefault(r.doc_id, []).append(r)
    assert [c.chunk_text for c in out[1]] == ["tiny"]
    assert [c.chunk_len for c in out[2]] == [CHUNK_SIZE]
    two = out[3]
    assert [c.chunk_start for c in two] == [1, CHUNK_STRIDE + 1]
    assert two[0].chunk_len == CHUNK_SIZE
    assert two[1].chunk_len == CHUNK_SIZE + 1 - CHUNK_STRIDE  # short tail


def test_chunking_overlap_and_coverage(spark):
    """Consecutive chunks overlap by size-stride chars with identical
    text in the shared region, and the union of chunks covers the doc."""
    text = "".join(chr(97 + (i % 26)) for i in range(1000))
    [doc] = [(7, "en", text)]
    chunks = sorted(
        chunk_table(_docs(spark, [doc])).collect(), key=lambda r: r.chunk_idx
    )
    overlap = CHUNK_SIZE - CHUNK_STRIDE
    covered_until = 0
    for i, c in enumerate(chunks):
        assert c.chunk_start == i * CHUNK_STRIDE + 1
        assert c.chunk_text == text[c.chunk_start - 1 : c.chunk_start - 1 + CHUNK_SIZE]
        if i > 0:
            prev = chunks[i - 1]
            assert prev.chunk_text[-overlap:] == c.chunk_text[:overlap]
        covered_until = max(covered_until, c.chunk_start - 1 + c.chunk_len)
    assert covered_until == len(text)
