"""Companion recall gates for the approximate operators.

The four approximate operators (MinHash-LSH, SimHash, LSH-ANN, IVF-ANN)
depend on engine hash functions or are approximate by construction, so their
row sets have no DuckDB oracle (rows-only driver check). These companions
convert their QUALITY into an exactly-checkable fact: each joins the
approximate result against its exact baseline and emits one row

    (n_exact BIGINT, recall_floor_pct INT, recall_ok BOOLEAN)

where the oracle recomputes n_exact from the exact side in SQL and asserts
``recall_ok = TRUE``. If a future change drops recall below the floor the
Spark side emits FALSE and the driver's value-hash turns red — the
probabilistic property becomes a hard driver gate.

Floors (measured at sf0.01, set with margin):
  minhash vs exact-Jaccard pairs ...... 90  (measured 100)
  simhash vs identical-token-set pairs 100  (mathematical guarantee: equal
                                            distinct-token sets => equal
                                            fingerprints => hamming 0)
  ann_lsh vs brute-force top-10 ....... 60  (measured 70)
  ann_ivf vs brute-force top-10 ....... 60  (measured 70 at sf0.01 after
                                            the r14 trainer unification;
                                            80 at sf0.1)

Scale: each companion is two bounded aggregates over plans that are
themselves scale-safe (see dedup.py / similarity.py); the final crossJoin
multiplies two 1-row frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opencode_hive_archon_spark.operators import dedup as _dedup
from opencode_hive_archon_spark.operators import similarity as _sim
from opencode_hive_archon_spark.session import read_table as _t
from opencode_hive_archon_spark.spec import QuerySpec

MINHASH_FLOOR_PCT = 90
SIMHASH_FLOOR_PCT = 100
ANN_LSH_FLOOR_PCT = 60
ANN_IVF_FLOOR_PCT = 60


def _recall_report(exact: DataFrame, approx: DataFrame, keys: list[str], floor_pct: int) -> DataFrame:
    """One-row (n_exact, recall_floor_pct, recall_ok) report.

    recall_ok uses integer arithmetic (n_hit*100 >= n_exact*floor_pct) so the
    comparison is exact on both engines; n_exact=0 degenerates to TRUE.
    """
    hits = exact.select(*keys).join(approx.select(*keys), keys, "leftsemi")
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    n_hit = hits.agg(F.count(F.lit(1)).alias("n_hit"))
    return n_exact.crossJoin(n_hit).select(
        F.col("n_exact"),
        F.lit(floor_pct).cast("int").alias("recall_floor_pct"),
        (F.col("n_hit") * 100 >= F.col("n_exact") * floor_pct).alias("recall_ok"),
    )


HLL_ERROR_BOUND_PCT = 10  # approx_count_distinct rsd=0.02 => generous margin


def agg_approx_distinct_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL gate: both approx_count_distinct sketches (agg_approx_distinct)
    must land within 10% of the exact distinct counts. Integer-arithmetic
    comparison (|approx-exact|*100 <= exact*bound) keeps the check exact on
    both engines; the oracle recomputes the exact counts and asserts TRUE."""
    from opencode_hive_archon_spark.operators.relational import agg_approx_distinct

    approx = agg_approx_distinct(spark, sf_dir)
    li = _t(spark, sf_dir, "lineitem")
    exact = li.agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_suppkey").alias("exact_suppliers"),
    )
    within = lambda a, e: (
        F.abs(F.col(a) - F.col(e)) * 100 <= F.col(e) * HLL_ERROR_BOUND_PCT
    )
    return approx.crossJoin(exact).select(
        F.col("exact_parts"),
        F.col("exact_suppliers"),
        F.lit(HLL_ERROR_BOUND_PCT).cast("int").alias("error_bound_pct"),
        (within("approx_parts", "exact_parts")
         & within("approx_suppliers", "exact_suppliers")).alias("error_ok"),
    )


QUANTILE_ERROR_BOUND_PCT = 5  # percentile_approx accuracy=10000 => ~0.01% rank error


def agg_approx_quantile_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-sketch gate: percentile_approx (Greenwald-Khanna sketch, the
    mergeable structure a 1000-executor aggregation needs — exact percentile
    requires a full sort) must land within 5% of the exact interpolated
    percentile for p50/p95 of l_extendedprice. Same contract as the HLL
    gate: integer-free float comparison stays Spark-side; the oracle
    recomputes the exact side (quantile_cont parity, proven by
    text_lang_profile) and asserts TRUE."""
    li = _t(spark, sf_dir, "lineitem")
    row = li.agg(
        F.percentile_approx(
            "l_extendedprice", F.array(F.lit(0.5), F.lit(0.95)), F.lit(10000)
        ).alias("ap"),
        F.percentile(F.col("l_extendedprice"), F.array(F.lit(0.5), F.lit(0.95))).alias("ex"),
    )
    within = lambda i: (
        F.abs(F.col("ap")[i] - F.col("ex")[i]) * 100
        <= F.col("ex")[i] * QUANTILE_ERROR_BOUND_PCT
    )
    return row.select(
        F.col("ex")[0].alias("exact_p50"),
        F.col("ex")[1].alias("exact_p95"),
        F.lit(QUANTILE_ERROR_BOUND_PCT).cast("int").alias("error_bound_pct"),
        (within(0) & within(1)).alias("error_ok"),
    )


def dedup_minhash_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH must recover >= 90% of the exact-Jaccard near-dup pairs
    (dedup_near, the exact prefix-filtered SSJoin baseline)."""
    exact = _dedup.dedup_near(spark, sf_dir)
    approx = _dedup.dedup_minhash_lsh(spark, sf_dir)
    return _recall_report(exact, approx, ["doc_a", "doc_b"], MINHASH_FLOOR_PCT)


def _identical_tokenset_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs of docs whose normalized DISTINCT-token sets are identical.

    Key = sha2 of the sorted distinct-token string (the join shuffles 256-bit
    digests, never token arrays — same scale posture as dedup_exact)."""
    key = F.sha2(
        F.concat_ws(" ", F.sort_array(F.array_distinct(_dedup._toks()))), 256
    )
    docs = _t(spark, sf_dir, "documents").select("doc_id", key.alias("k"))
    a = docs.select(F.col("doc_id").alias("doc_a"), "k")
    b = docs.select(F.col("doc_id").alias("doc_b"), "k")
    return (
        a.join(b, "k")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
    )


def dedup_simhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash must recover 100% of identical-distinct-token-set pairs:
    equal token sets give equal per-token hash sets, equal majority votes,
    equal fingerprints — hamming 0, always within the <=3 band join."""
    exact = _identical_tokenset_pairs(spark, sf_dir)
    approx = _dedup.dedup_simhash(spark, sf_dir)
    return _recall_report(exact, approx, ["doc_a", "doc_b"], SIMHASH_FLOOR_PCT)


def ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH top-10 must overlap >= 60% with brute force."""
    exact = _sim.similarity_topk(spark, sf_dir)
    approx = _sim.ann_lsh_topk(spark, sf_dir)
    return _recall_report(exact, approx, ["vec_id"], ANN_LSH_FLOOR_PCT)


def ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (nprobe=4 of 8 cells; shared exact trainer) top-10 must overlap
    >= 60% with brute force."""
    exact = _sim.similarity_topk(spark, sf_dir)
    approx = _sim.ann_ivf_topk(spark, sf_dir)
    return _recall_report(exact, approx, ["vec_id"], ANN_IVF_FLOOR_PCT)


# --- Oracles: recompute the exact side, assert recall_ok TRUE --------------

_ORACLE_MINHASH_RECALL = f"""
SELECT CAST(count(*) AS BIGINT) AS n_exact,
       {MINHASH_FLOOR_PCT} AS recall_floor_pct,
       TRUE AS recall_ok
FROM ({_dedup._ORACLE_DEDUP_NEAR})
"""

_ORACLE_SIMHASH_RECALL = f"""
WITH tok AS (SELECT doc_id, {_dedup._TOKS_SQL} AS t FROM documents),
keys AS (SELECT doc_id, array_to_string(list_sort(list_distinct(t)), ' ') AS k FROM tok),
grp AS (SELECT k, count(*) AS c FROM keys GROUP BY k)
SELECT CAST(coalesce(sum(c * (c - 1) // 2), 0) AS BIGINT) AS n_exact,
       {SIMHASH_FLOOR_PCT} AS recall_floor_pct,
       TRUE AS recall_ok
FROM grp
"""

_ORACLE_ANN_LSH_RECALL = f"""
SELECT CAST(count(*) AS BIGINT) AS n_exact,
       {ANN_LSH_FLOOR_PCT} AS recall_floor_pct,
       TRUE AS recall_ok
FROM ({_sim._ORACLE_SIM_TOPK})
"""

_ORACLE_ANN_IVF_RECALL = f"""
SELECT CAST(count(*) AS BIGINT) AS n_exact,
       {ANN_IVF_FLOOR_PCT} AS recall_floor_pct,
       TRUE AS recall_ok
FROM ({_sim._ORACLE_SIM_TOPK})
"""

_ORACLE_HLL_ERROR = f"""
SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS exact_suppliers,
       {HLL_ERROR_BOUND_PCT} AS error_bound_pct,
       TRUE AS error_ok
FROM lineitem
"""

_ORACLE_QUANTILE_ERROR = f"""
SELECT quantile_cont(l_extendedprice, 0.5) AS exact_p50,
       quantile_cont(l_extendedprice, 0.95) AS exact_p95,
       {QUANTILE_ERROR_BOUND_PCT} AS error_bound_pct,
       TRUE AS error_ok
FROM lineitem
"""

SPECS = [
    QuerySpec("agg_approx_distinct_error", agg_approx_distinct_error,
              _ORACLE_HLL_ERROR, "quality",
              "driver gate: HLL distinct counts within 10% of exact"),
    QuerySpec("agg_approx_quantile_error", agg_approx_quantile_error,
              _ORACLE_QUANTILE_ERROR, "quality",
              "driver gate: GK quantile sketch p50/p95 within 5% of exact"),
    QuerySpec("dedup_minhash_lsh_recall", dedup_minhash_lsh_recall,
              _ORACLE_MINHASH_RECALL, "quality",
              "driver gate: MinHash-LSH recall >= 90% of exact-Jaccard pairs"),
    QuerySpec("dedup_simhash_recall", dedup_simhash_recall,
              _ORACLE_SIMHASH_RECALL, "quality",
              "driver gate: SimHash recovers 100% of identical-token-set pairs"),
    QuerySpec("ann_lsh_recall", ann_lsh_recall, _ORACLE_ANN_LSH_RECALL, "quality",
              "driver gate: LSH-ANN top-10 overlap >= 60% of brute force"),
    QuerySpec("ann_ivf_recall", ann_ivf_recall, _ORACLE_ANN_IVF_RECALL, "quality",
              "driver gate: IVF-ANN top-10 overlap >= 60% of brute force"),
]
