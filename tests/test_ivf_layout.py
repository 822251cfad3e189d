"""IVF at-scale layout evidence: cell assignments written out PARTITIONED BY
cell id, probes read back partition-pruned.

operators/similarity.py's IVF docstring claims "at 100 TB the cell
assignment is written once (partitioned by cid) and probes become
partition-pruned scans" — this test executes that layout at test scale and
pins both halves: the probe scan lists only the probed cell directories
(PartitionFilters on cid), and the layout-backed top-k equals the in-memory
pipeline's answer exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from opencode_hive_archon_spark.operators import similarity as S


def test_ivf_partitioned_cells_prune_and_match(spark, sf_dir, tmp_path):
    topk_mem = S.ann_ivf_topk(spark, sf_dir).collect()

    # Rebuild the same deterministic assignment the operator uses (first-K
    # seed centroids + Lloyd iterations) and persist it partitioned by cid.
    from opencode_hive_archon_spark.operators.similarity import (
        IVF_ITERS,
        IVF_K,
        IVF_NPROBE,
        QUERY_VEC_ID,
        _assign,
    )
    from opencode_hive_archon_spark.session import materialize, read_table

    emb = read_table(spark, sf_dir, "embeddings")
    centroids = materialize(
        emb.filter(F.col("vec_id") < IVF_K).select(
            F.col("vec_id").alias("cid"),
            F.transform("embedding", lambda x: x.cast("double")).alias("cvec"),
        )
    )
    for _ in range(IVF_ITERS):
        assigned = _assign(emb, centroids)
        centroids = materialize(
            assigned.select("cid", F.posexplode("embedding").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
                ).alias("cvec")
            )
        )
    assigned = _assign(emb, centroids)
    cells_path = str(tmp_path / "ivf_cells")
    assigned.write.mode("overwrite").partitionBy("cid").parquet(cells_path)

    # Probe cells for the query vector (same argmin arithmetic).
    query = assigned.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qv")
    )
    qd2 = F.aggregate(
        F.zip_with(
            F.col("qv"), F.col("cvec"),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    probe = [
        r["cid"]
        for r in centroids.crossJoin(F.broadcast(query))
        .select("cid", qd2.alias("d2"))
        .orderBy(F.col("d2").asc(), F.col("cid").asc())
        .limit(IVF_NPROBE)
        .collect()
    ]

    # Read back ONLY the probed cells from the partitioned layout.
    from opencode_hive_archon_spark.functions.vector import cosine_similarity

    cells = spark.read.parquet(cells_path).filter(F.col("cid").isin(probe))
    plan = cells._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "cid" in pf, pf  # directory pruning, not row filtering

    topk_layout = (
        cells.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(query))
        .select(
            "vec_id", "label",
            cosine_similarity(F.col("embedding"), F.col("qv")).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(10)
        .collect()
    )
    assert [tuple(r) for r in topk_layout] == [tuple(r) for r in topk_mem]
