"""Graph-linked (k-hop) retrieval over the near-dup similarity graph.

The reference DECLARES graph-linked context expansion but never ships it —
graphiti is flagged off (/root/reference/backend/src/second_brain/deps.py:11,
status "unavailable" deps.py:24) while mvp.md:9 still promises "graph-linked
context". This operator closes that declared-but-unbuilt capability the way
a Spark retrieval engine would: the edge set is the deterministic
embedding-cosine near-dup pair table (the LSH-candidates + exact-verify
pipeline of ``dedup_embedding_cosine``), and retrieval expands a seed set of
vectors ``K_HOPS`` breadth-first levels along it, returning every reached
node with its minimum hop distance.

Execution shape (scale notes):
- BFS as iterated equi-joins, one per hop, with the frontier MATERIALIZED
  each round so lineage stays flat — the same level-synchronous pattern as
  ``dedup_clusters``'s min-label propagation. Each hop is one hash-shuffle
  join edge.src = frontier.vec_id; at 100 TB the edge table is written out
  bucketed by ``src`` once and every hop becomes a shuffle-free bucket join.
- The frontier is typically tiny relative to the edge table, so AQE picks a
  broadcast join for it at runtime; nothing in the plan forces either side.
- The visited set (seen vec_ids) is carried as a DataFrame and applied as a
  LEFT ANTI join — no driver-side collect of node ids at any point.

Exact oracle: DuckDB recursive CTE over the same (mirrored bit-for-bit)
edge set, depth-bounded by hop < K_HOPS, min(hop) per node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opencode_hive_archon_spark.operators.similarity import (
    LSH_CAND_CTES,
    NEAR_DUP_COSINE,
    dedup_embedding_cosine,
    qcos_sql,
)
from opencode_hive_archon_spark.session import materialize as _materialize
from opencode_hive_archon_spark.session import materialize_iter as _materialize_iter
from opencode_hive_archon_spark.session import materialize_keyed as _materialize_keyed
from opencode_hive_archon_spark.session import read_table as _t
from opencode_hive_archon_spark.spec import QuerySpec

K_HOPS = 2
GRAPH_SEEDS = (0, 1, 2)


def recall_graph_khop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expand ``GRAPH_SEEDS`` ``K_HOPS`` levels over the near-dup edge graph.

    Returns (vec_id, hop, label): every node reachable within K_HOPS of any
    seed, hop = shortest distance (0 for the seeds themselves). Level-
    synchronous BFS guarantees min-hop without a per-node aggregate: a node
    joins the visited set the first level it appears and the anti-join keeps
    later levels from re-adding it.
    """
    # The near-dup edge table is shared session-wide (the dedup recall gates
    # and repeated khop calls reuse one computation per sf_dir): at scale
    # this is the in-session analogue of "write the edge table out bucketed
    # by src once" (module docstring).
    from opencode_hive_archon_spark.operators.similarity import (
        LSH_TABLES,
        lsh_bits_for,
    )

    pairs = _materialize_keyed(
        spark,
        ("near_dup_pairs", sf_dir, NEAR_DUP_COSINE, LSH_TABLES, lsh_bits_for(sf_dir)),
        lambda: dedup_embedding_cosine(spark, sf_dir).select("vec_a", "vec_b"),
    )
    edges = pairs.select(
        F.col("vec_a").alias("src"), F.col("vec_b").alias("dst")
    ).union(pairs.select(F.col("vec_b").alias("src"), F.col("vec_a").alias("dst")))

    seeds = spark.createDataFrame([(int(s),) for s in GRAPH_SEEDS], "vec_id bigint")
    visited = seeds.withColumn("hop", F.lit(0).cast("long"))
    frontier = seeds
    for hop in range(1, K_HOPS + 1):
        frontier = _materialize(
            edges.join(frontier.withColumnRenamed("vec_id", "src"), "src")
            .select(F.col("dst").alias("vec_id"))
            .distinct()
            .join(visited.select("vec_id"), "vec_id", "left_anti")
        )
        visited = visited.union(
            frontier.withColumn("hop", F.lit(hop).cast("long"))
        )

    labels = _t(spark, sf_dir, "embeddings").select("vec_id", "label")
    return (
        visited.join(labels, "vec_id")
        .select("vec_id", "hop", "label")
        .orderBy("hop", "vec_id")
    )


_SEED_VALUES = ", ".join(
    f"(CAST({s} AS BIGINT), CAST(0 AS BIGINT))" for s in GRAPH_SEEDS
)

# Non-recursive edge CTEs, shared between the recursive-CTE oracle (driver
# gate, sf0.01) and tools/check.py's iterative BFS oracle (sf0.1 path).
_ORACLE_EDGE_CTES = f"""{LSH_CAND_CTES},
pairs AS (
  SELECT c.vec_a, c.vec_b
  FROM cand c
  JOIN qemb a ON a.vec_id = c.vec_a
  JOIN qemb b ON b.vec_id = c.vec_b
  WHERE {qcos_sql('a.q', 'b.q')} >= {NEAR_DUP_COSINE}
)"""

ORACLE_GRAPH_EDGES_SQL = f"WITH {_ORACLE_EDGE_CTES} SELECT vec_a, vec_b FROM pairs"

_ORACLE_GRAPH_KHOP = f"""
WITH RECURSIVE {_ORACLE_EDGE_CTES},
edges AS (
  SELECT vec_a AS src, vec_b AS dst FROM pairs
  UNION ALL SELECT vec_b, vec_a FROM pairs
),
walk(vec_id, hop) AS (
  SELECT * FROM (VALUES {_SEED_VALUES}) seeds(vec_id, hop)
  UNION ALL
  SELECT e.dst, w.hop + 1
  FROM walk w JOIN edges e ON e.src = w.vec_id
  WHERE w.hop < {K_HOPS}
),
best AS (SELECT vec_id, min(hop) AS hop FROM walk GROUP BY vec_id)
SELECT b.vec_id, b.hop, e.label
FROM best b JOIN embeddings e USING (vec_id)
ORDER BY hop, vec_id
"""


PR_SCALE = 1_000_000  # rank unit: 1.0 == 1e6 (fixed-point, BIGINT)
PR_BASE = 150_000  # (1 - d) · SCALE with damping d = 0.85
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100
PR_ITERS = 3
PR_TOPK = 50


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration QUANTIZED PageRank over the near-dup edge graph —
    the importance ranking a graph-linked retrieval layer (the reference's
    declared graphiti capability, deps.py:11-24) would order expansion by.

    Every quantity is a BIGINT in fixed-point units of 1/PR_SCALE, and the
    update rule is pure integer arithmetic::

        contrib(u) = r(u) div deg(u)
        r'(v)      = PR_BASE + (85 · Σ contrib(in-neighbors)) div 100

    Integer sums are exactly associative/commutative, so the result is
    bit-identical under ANY partitioning, shuffle order, or engine — that is
    what makes an ITERATIVE float-free algorithm driver-hashable (the same
    trick as the quantized-cosine verify in similarity.py). Dangling mass is
    dropped (isolated nodes settle at PR_BASE), documented semantics shared
    with the oracle.

    Scale shape: the edge table is the session-shared near-dup pair
    materialization (one computation per sf_dir, same handle as
    ``recall_graph_khop``); degrees are attached to edges ONCE and the pair
    is materialized, so each of the PR_ITERS rounds costs exactly one
    ranks-join (keyed src) + one groupBy(dst) shuffle. At 100 TB the edge
    table is written bucketed by ``src`` once and the per-round join becomes
    shuffle-free; ``materialize_iter`` cuts lineage each round so the plan
    stays flat (the dedup_clusters lesson). Rank state is (id, int64) — the
    narrowest possible iteration state.
    """
    from opencode_hive_archon_spark.operators.similarity import (
        LSH_TABLES,
        lsh_bits_for,
    )

    pairs = _materialize_keyed(
        spark,
        ("near_dup_pairs", sf_dir, NEAR_DUP_COSINE, LSH_TABLES, lsh_bits_for(sf_dir)),
        lambda: dedup_embedding_cosine(spark, sf_dir).select("vec_a", "vec_b"),
    )
    edges = pairs.select(
        F.col("vec_a").alias("src"), F.col("vec_b").alias("dst")
    ).union(pairs.select(F.col("vec_b").alias("src"), F.col("vec_a").alias("dst")))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    edeg = _materialize(edges.join(deg, "src"))

    nodes = _t(spark, sf_dir, "embeddings").select("vec_id", "label")
    ranks = nodes.select("vec_id").withColumn(
        "r", F.lit(PR_SCALE).cast("long")
    )
    for _ in range(PR_ITERS):
        contrib = (
            edeg.join(ranks.withColumnRenamed("vec_id", "src"), "src")
            .groupBy(F.col("dst").alias("vec_id"))
            .agg(F.sum(F.expr("r div d")).alias("s"))
        )
        ranks = _materialize_iter(
            nodes.select("vec_id")
            .join(contrib, "vec_id", "left")
            .select(
                "vec_id",
                (
                    F.lit(PR_BASE)
                    + F.expr(
                        f"({PR_DAMP_NUM} * coalesce(s, 0L)) div {PR_DAMP_DEN}"
                    )
                ).cast("long").alias("r"),
            )
        )
    return (
        ranks.join(nodes, "vec_id")
        .select("vec_id", F.col("r").alias("pr_rank"), "label")
        .orderBy(F.col("pr_rank").desc(), "vec_id")
        .limit(PR_TOPK)
    )


def _pr_round_sql(prev: str, this: str) -> str:
    return f"""{this} AS (
  SELECT n.vec_id,
         CAST({PR_BASE} + ({PR_DAMP_NUM} * COALESCE(c.s, 0)) // {PR_DAMP_DEN}
              AS BIGINT) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS vec_id, CAST(SUM(p.r // e.d) AS BIGINT) AS s
    FROM edeg e JOIN {prev} p ON p.vec_id = e.src
    GROUP BY e.dst) c ON c.vec_id = n.vec_id
)"""


_ORACLE_PAGERANK = f"""
WITH {_ORACLE_EDGE_CTES},
edges AS (
  SELECT vec_a AS src, vec_b AS dst FROM pairs
  UNION ALL SELECT vec_b, vec_a FROM pairs
),
edeg AS (
  SELECT src, dst, d FROM edges
  JOIN (SELECT src AS dsrc, count(*) AS d FROM edges GROUP BY src) dg
    ON dsrc = src
),
nodes AS (SELECT vec_id, label FROM embeddings),
r0 AS (SELECT vec_id, CAST({PR_SCALE} AS BIGINT) AS r FROM nodes),
{", ".join(_pr_round_sql(f"r{i}", f"r{i + 1}") for i in range(PR_ITERS))}
SELECT n.vec_id, rk.r AS pr_rank, n.label
FROM r{PR_ITERS} rk JOIN nodes n ON n.vec_id = rk.vec_id
ORDER BY pr_rank DESC, n.vec_id
LIMIT {PR_TOPK}
"""


def graph_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the near-dup edge graph — the graph-quality
    statistic (clustering structure) a dedup/retrieval layer reports: one
    row of (n_nodes, n_edges, n_wedges, n_triangles, closure_ratio).

    Distributed-triangle discipline (the public MapReduce-era
    degree-orientation trick): orient every undirected edge from its
    lower (degree, id) endpoint to its higher one, so each node's
    out-degree is bounded by O(√m) no matter how skewed the raw degrees —
    the wedge self-join's output is bounded ~m^1.5 instead of Σdeg² (a
    single celebrity node cannot explode it). Wedges (u→v, u→w) with
    k(v) < k(w) are closed by a LEFT SEMI join against the oriented edge
    set — ids only, never payloads. Every count is an exact integer; the
    closure ratio (triangles/wedges) is ONE double division, so the whole
    report is hash-exact. Edge table shared with khop/PageRank (one
    computation per sf_dir); at 100 TB it is written bucketed by src once
    and both the wedge join and the closure semi-join become bucket-local.
    """
    from opencode_hive_archon_spark.operators.similarity import (
        LSH_TABLES,
        lsh_bits_for,
    )

    pairs = _materialize_keyed(
        spark,
        ("near_dup_pairs", sf_dir, NEAR_DUP_COSINE, LSH_TABLES, lsh_bits_for(sf_dir)),
        lambda: dedup_embedding_cosine(spark, sf_dir).select("vec_a", "vec_b"),
    )
    und = pairs.select(
        F.col("vec_a").alias("src"), F.col("vec_b").alias("dst")
    ).union(pairs.select(F.col("vec_b").alias("src"), F.col("vec_a").alias("dst")))
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    # orientation key: (degree, id) packed collision-free into one int64
    key = (F.col("d") * F.lit(1 << 32) + F.col("src")).alias("k")
    keyed = deg.select("src", key)
    ek = (
        und.join(keyed, "src")
        .withColumnRenamed("k", "ks")
        .join(
            keyed.select(F.col("src").alias("dst"), F.col("k").alias("kd")),
            "dst",
        )
    )
    oe = _materialize(
        ek.filter(F.col("ks") < F.col("kd")).select("src", "dst", "kd")
    )
    a = oe.select("src", F.col("dst").alias("v"), F.col("kd").alias("kv"))
    b = oe.select("src", F.col("dst").alias("w"), F.col("kd").alias("kw"))
    wedges = a.join(b, "src").filter(F.col("kv") < F.col("kw"))
    closed = wedges.join(
        oe.select(F.col("src").alias("v"), F.col("dst").alias("w")),
        ["v", "w"],
        "left_semi",
    )
    n_nodes = _t(spark, sf_dir, "embeddings").agg(
        F.count(F.lit(1)).alias("n_nodes")
    )
    stats = (
        pairs.agg(F.count(F.lit(1)).alias("n_edges"))
        .crossJoin(F.broadcast(wedges.agg(F.count(F.lit(1)).alias("n_wedges"))))
        .crossJoin(
            F.broadcast(closed.agg(F.count(F.lit(1)).alias("n_triangles")))
        )
        .crossJoin(F.broadcast(n_nodes))
    )
    return stats.select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.when(
            F.col("n_wedges") > 0,
            F.col("n_triangles").cast("double") / F.col("n_wedges").cast("double"),
        ).alias("closure_ratio"),
    )


_ORACLE_TRIANGLES = f"""
WITH {_ORACLE_EDGE_CTES},
und AS (
  SELECT vec_a AS src, vec_b AS dst FROM pairs
  UNION ALL SELECT vec_b, vec_a FROM pairs
),
deg AS (SELECT src, count(*) AS d FROM und GROUP BY src),
keyed AS (SELECT src, d * {1 << 32} + src AS k FROM deg),
oe AS (
  SELECT u.src, u.dst, kd.k AS kd
  FROM und u
  JOIN keyed ks ON ks.src = u.src
  JOIN keyed kd ON kd.src = u.dst
  WHERE ks.k < kd.k
),
wedges AS (
  SELECT a.src, a.dst AS v, b.dst AS w
  FROM oe a JOIN oe b ON a.src = b.src AND a.kd < b.kd
),
tri AS (
  SELECT count(*) AS n_triangles FROM wedges
  WHERE EXISTS (SELECT 1 FROM oe e WHERE e.src = wedges.v AND e.dst = wedges.w)
),
wc AS (SELECT count(*) AS n_wedges FROM wedges),
ec AS (SELECT count(*) AS n_edges FROM pairs),
nc AS (SELECT count(*) AS n_nodes FROM embeddings)
SELECT n_nodes, n_edges, n_wedges, n_triangles,
       CASE WHEN n_wedges > 0
            THEN CAST(n_triangles AS DOUBLE) / CAST(n_wedges AS DOUBLE) END
         AS closure_ratio
FROM nc CROSS JOIN ec CROSS JOIN wc CROSS JOIN tri
"""


SPECS = [
    QuerySpec(
        "recall_graph_khop",
        recall_graph_khop,
        _ORACLE_GRAPH_KHOP,
        "recall",
        "k-hop graph-linked retrieval: BFS expansion of seed vectors over "
        "the embedding near-dup edge graph (recursive-CTE oracle)",
    ),
    QuerySpec(
        "graph_pagerank",
        graph_pagerank,
        _ORACLE_PAGERANK,
        "recall",
        "fixed-iteration quantized-integer PageRank over the near-dup edge "
        "graph — float-free fixed-point update, bit-identical under any "
        "partitioning (unrolled-CTE oracle)",
    ),
    QuerySpec(
        "graph_triangle_stats",
        graph_triangle_stats,
        _ORACLE_TRIANGLES,
        "recall",
        "triangle census of the near-dup graph via degree-ordered "
        "orientation (skew-bounded wedge join + semi-join closure), "
        "integer-exact counts + closure ratio",
    ),
]
