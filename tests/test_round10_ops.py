"""Invariant tests for the round-10 operators whose exactness is oracle-
gated: these pin the SEMANTIC properties the oracle comparison cannot
express (cross-formulation equalities, algebraic bounds, monotonicity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from opencode_hive_archon_spark.operators import cdc as C
from opencode_hive_archon_spark.operators import reshape as RS
from opencode_hive_archon_spark.operators import similarity as S
from opencode_hive_archon_spark.operators import textops as T
from opencode_hive_archon_spark.operators import timeseries as TS
from opencode_hive_archon_spark.session import read_table


def test_mv_refresh_equals_recompute(spark, sf_dir):
    """Delta-merge maintenance must equal an in-Spark full recompute over
    the mutated snapshot (independent of the DuckDB oracle)."""
    got = {
        r["o_custkey"]: (r["n_orders"], r["total_price"])
        for r in C.mv_incremental_refresh(spark, sf_dir).collect()
    }
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    kept = orders.where(F.col("o_orderkey") % C.CDC_DEL_MOD != 0)
    curr = kept.select(
        "o_custkey",
        F.when(
            F.col("o_orderkey") % C.CDC_UPD_MOD == 0, F.col("o_totalprice") * 2
        ).otherwise(F.col("o_totalprice")).alias("p"),
    ).unionAll(
        kept.where(F.col("o_orderkey") % C.CDC_INS_MOD == 0).select(
            "o_custkey", F.col("o_totalprice").alias("p")
        )
    )
    want = {
        r["o_custkey"]: (r["n"], r["t"])
        for r in curr.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("p").cast("decimal(18,2)")).cast("double").alias("t"),
        )
        .collect()
    }
    assert got == want


def test_jl_projection_norm_preservation(spark, sf_dir):
    """Sparse JL with density-1/3 ±1 entries: E[‖y‖²] = (K/3)·‖x‖² — the
    per-vector ratio must concentrate loosely around K/3 (the property
    that makes projected distances usable for ANN)."""
    rows = S.embedding_random_projection(spark, sf_dir).collect()
    expect = S.JL_OUT_DIM / 3.0
    ratios = [
        r["y_norm2"] / (r["x_norm2"] * expect)
        for r in rows
        if r["x_norm2"] > 0
    ]
    assert len(ratios) > 0
    med = sorted(ratios)[len(ratios) // 2]
    assert 0.3 < med < 3.0, med
    assert sum(1 for x in ratios if 0.1 < x < 10.0) > 0.95 * len(ratios)


def test_jl_matrix_full_row_rank():
    """The fixed JL matrix must have JL_OUT_DIM distinct rows AND full row
    rank — a linear congruence mod 6 repeats rows with period 6 (rank ≤ 6,
    output dims 6..15 duplicating 0..5), which silently voids the JL
    distortion property even though oracle parity still holds (r10 ADVICE)."""
    import numpy as np

    M = np.zeros((S.JL_OUT_DIM, S.EMB_DIM), dtype=np.int64)
    for k, nz in enumerate(S._jl_matrix(S.EMB_DIM)):
        for d, sign in nz:
            M[k, d] = sign
    assert len({tuple(r) for r in M.tolist()}) == S.JL_OUT_DIM
    assert np.linalg.matrix_rank(M) == S.JL_OUT_DIM
    # Achlioptas density ~1/3 nonzeros per row (loose band)
    nnz = (M != 0).sum(axis=1)
    assert all(S.EMB_DIM // 6 <= c <= S.EMB_DIM // 2 for c in nnz), nnz


def test_kmeans_improves_on_seed_assignment(spark, sf_dir):
    """After a Lloyd update the total inertia must not exceed the
    seed-centroid assignment's inertia (assignment is optimal per vector;
    the floored-mean update perturbs each dim by < 1 quantum — orders of
    magnitude below the distances)."""
    final = S.embedding_kmeans_lloyd(spark, sf_dir).collect()
    emb = read_table(spark, sf_dir, "embeddings")
    q = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * F.lit(S.QUANT_SCALE)).cast("long"),
    )
    vecs = emb.select("vec_id", q.alias("q"))
    cents = vecs.filter(
        (F.col("vec_id") >= 1) & (F.col("vec_id") <= S.KMEANS_K)
    ).select(F.col("vec_id").alias("cid"), F.col("q").alias("c"))
    dist = F.aggregate(
        F.zip_with(F.col("q"), F.col("c"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    seed_inertia = (
        vecs.crossJoin(F.broadcast(cents))
        .select("vec_id", dist.alias("d"))
        .groupBy("vec_id")
        .agg(F.min("d").alias("d"))
        .agg(F.sum("d").alias("s"))
        .first()["s"]
    )
    got = sum(r["inertia"] for r in final)
    n = vecs.count()
    assert sum(r["n_members"] for r in final) == n
    assert 1 <= len(final) <= S.KMEANS_K
    assert got <= seed_inertia


def test_twa_bounded_by_value_range(spark, sf_dir):
    """A time-weighted average is a convex combination: per series it must
    lie within [min, max] of the observed values, and segment accounting
    must cover every event except each series' last."""
    got = {r["event_type"]: r for r in TS.events_time_weighted_avg(spark, sf_dir).collect()}
    ev = read_table(spark, sf_dir, "events")
    bounds = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"),
             F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(got) == set(bounds)
    for et, r in got.items():
        b = bounds[et]
        assert b["lo"] - 1e-9 <= r["twa"] <= b["hi"] + 1e-9
        assert r["n_segments"] == b["n"] - 1
        assert r["span_us"] > 0


def test_grouping_sets_additivity(spark, sf_dir):
    """The four granularities must be mutually consistent: every partial
    level re-aggregates to the grand total (gid bits: type=MSB, day=LSB)."""
    rows = RS.events_grouping_sets(spark, sf_dir).collect()
    by_gid = {}
    for r in rows:
        by_gid.setdefault(r["gid"], []).append(r)
    assert set(by_gid) == {0, 1, 2, 3}
    grand = by_gid[3][0]
    for gid in (0, 1, 2):
        assert sum(r["n_events"] for r in by_gid[gid]) == grand["n_events"]
        assert sum(r["total_cents"] for r in by_gid[gid]) == grand["total_cents"]
    # gid semantics: 1 = day aggregated away (event_type kept), 2 = inverse
    assert all(r["day"] is None and r["event_type"] is not None for r in by_gid[1])
    assert all(r["event_type"] is None and r["day"] is not None for r in by_gid[2])


def test_vocab_growth_partitions_vocabulary(spark, sf_dir):
    """Bucket counts must partition the distinct-trigram inventory and the
    running total must be monotone with a matching final value."""
    rows = T.corpus_vocab_growth(spark, sf_dir).collect()
    assert [r["bucket"] for r in rows] == sorted(r["bucket"] for r in rows)
    cum = 0
    for r in rows:
        cum += r["new_tokens"]
        assert r["cum_vocab"] == cum
    docs = T._docs(spark, sf_dir)
    toks = T._toks()
    grams = F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    total = docs.select(F.explode(grams).alias("g")).distinct().count()
    assert cum == total


def test_label_centroids_match_numpy(spark, sf_dir):
    """Centroid sums must equal a driver-side numpy recomputation."""
    import numpy as np

    rows = S.embedding_label_centroids(spark, sf_dir).collect()
    emb = read_table(spark, sf_dir, "embeddings").collect()
    sums, counts = {}, {}
    for r in emb:
        qv = np.floor(
            np.asarray(r["embedding"], dtype=np.float64) * S.QUANT_SCALE
        ).astype(np.int64)
        if r["label"] in sums:
            sums[r["label"]] += qv
            counts[r["label"]] += 1
        else:
            sums[r["label"]] = qv.copy()
            counts[r["label"]] = 1
    for r in rows:
        assert r["sum_q"] == int(sums[r["label"]][r["dim"]])
        assert r["n_vecs"] == counts[r["label"]]
