"""Family 5 — the Python UDF/UDAF/UDTF surface (SURVEY.md §2B).

The reference has no UDF facility; these demonstrate the engine's Python
extension points the Spark-preferred way:

* scalar      — Arrow-vectorized ``pandas_udf`` (Series -> Series), never
                row-at-a-time Python.
* grouped agg — ``applyInPandas`` (grouped map), the UDAF-by-composition
                pattern.
* table fn    — a Python UDTF (Spark >= 3.5) exploding one row into many
                via a LATERAL join.

Float determinism for the grouped normalize: group means/variances are
computed from EXACT integer cent sums (Python bigints — no float
accumulation order to disagree about), then combined with a fixed sequence
of double ops that the SQL oracle replicates verbatim.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opencode_hive_archon_spark.session import read_table as _t
from opencode_hive_archon_spark.spec import QuerySpec

CLAMP_STEP = 0.05


def udf_scalar_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference rerank clamp (voyage.py:74) as a vectorized pandas UDF:
    confidence' = min(1.0, base + 0.05 * overlap). Arrow-batched; the JVM
    computes the overlap, Python only the clamp arithmetic."""
    from opencode_hive_archon_spark.functions.text import overlap_count
    from opencode_hive_archon_spark.operators.recall import BASE_CONFIDENCE, DEFAULT_QUERY

    @F.pandas_udf("double")
    def clamp(base: pd.Series, overlap: pd.Series) -> pd.Series:
        return (base + CLAMP_STEP * overlap).clip(upper=1.0)

    docs = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return docs.select(
        "doc_id",
        clamp(
            F.lit(float(BASE_CONFIDENCE)).cast("double"),
            overlap_count(DEFAULT_QUERY, F.col("text")).cast("double"),
        ).alias("confidence"),
    )


# Same arithmetic shape: base + 0.05*k is exact-deterministic; least() = clip.
_ORACLE_CLAMP = """
SELECT doc_id,
       least(1.0, 0.5 + 0.05 * len(list_intersect(
           list_distinct(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')),
           list_distinct(string_split('fast hash join table scan merge', ' '))
       ))) AS confidence
FROM documents
"""


def udaf_grouped_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority z-score of order totals via applyInPandas (grouped map).

    Exact-integer statistics: totals are 2-decimal, so cents are integers;
    Python bigint sums are exact regardless of order. The double-op sequence
    (mean, var, z) is mirrored token-for-token in the oracle SQL.
    """

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        cents = [int(round(v * 100)) for v in pdf["o_totalprice"]]
        n = len(cents)
        s = sum(cents)                      # exact
        sq = sum(c * c for c in cents)      # exact
        # sq exceeds 2^53 at sf>=0.01, and engines disagree (by 1 ulp) on
        # how a wider-than-53-bit integer rounds to double. Split into
        # hi*1e6 + lo — both parts exact in double — so the conversion is
        # two deterministic IEEE ops mirrored verbatim in the oracle.
        sq_dbl = float(sq // 10**6) * 1e6 + float(sq % 10**6)
        mean = float(s) / 100.0 / n
        out = pdf[["o_orderkey", "o_orderpriority", "o_totalprice"]].copy()
        if n == 1:
            # sample variance undefined: SQL's (n-1)=0 denominator yields
            # NULL, so mirror that instead of raising ZeroDivisionError.
            out["z"] = [None]
            out["group_mean"] = mean
            out["group_std"] = None
            return out
        # sample variance in dollars^2: (sumsq/1e4 - n*mean^2) / (n-1)
        var = (sq_dbl / 10000.0 - n * (mean * mean)) / (n - 1)
        std = var ** 0.5
        out["z"] = [((c / 100.0) - mean) / std for c in cents]
        out["group_mean"] = mean
        out["group_std"] = std
        return out

    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").applyInPandas(
        normalize,
        schema="o_orderkey long, o_orderpriority string, o_totalprice double, "
        "z double, group_mean double, group_std double",
    )


_ORACLE_NORMALIZE = """
WITH sums AS (
  SELECT o_orderpriority,
         count(*) AS n,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS s,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)
             * CAST(round(o_totalprice * 100) AS BIGINT)) AS sq
  FROM orders GROUP BY o_orderpriority
),
stats AS (
  -- sq > 2^53: split hi*1e6 + lo before the double conversion (each part
  -- exact) so the rounding sequence matches the Python side bit-for-bit
  SELECT o_orderpriority, n,
         CAST(s AS DOUBLE) / 100.0 / n AS mean,
         sqrt(((CAST(sq // 1000000 AS DOUBLE) * 1000000.0 + CAST(sq % 1000000 AS DOUBLE)) / 10000.0
               - n * ((CAST(s AS DOUBLE) / 100.0 / n) * (CAST(s AS DOUBLE) / 100.0 / n)))
              / (n - 1)) AS std
  FROM sums
)
SELECT o_orderkey, o.o_orderpriority, o_totalprice,
       ((CAST(round(o_totalprice * 100) AS BIGINT) / 100.0) - mean) / std AS z,
       mean AS group_mean, std AS group_std
FROM orders o JOIN stats s ON o.o_orderpriority = s.o_orderpriority
"""


def udtf_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token explode as a Python UDTF (1 doc row -> N token rows) applied
    with a LATERAL join; positions are 1-based."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class SplitTokens:
        def eval(self, text: str):
            import re

            toks = re.sub(r"\s+", " ", text.strip().lower()).split(" ")
            for i, t in enumerate(toks, start=1):
                yield i, t

    spark.udtf.register("split_tokens", SplitTokens)
    docs = _t(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT doc_id, s.pos, s.token FROM _udtf_docs, LATERAL split_tokens(text) s"
    )


_ORACLE_UDTF = """
WITH tok AS (
  SELECT doc_id,
         string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS t
  FROM documents
),
ex AS (
  SELECT doc_id, unnest([{'pos': i, 'token': t[i]} for i in range(1, len(t) + 1)]) AS u
  FROM tok
)
SELECT doc_id, CAST(u.pos AS INT) AS pos, u.token AS token FROM ex
"""


EMBED_DIMS = 4
EMBED_HEX_CHARS = 6  # 24 bits/dim: squares sum < 2^50, exact in BIGINT


def udf_embed_batch_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch-INFERENCE slot of an LLM data pipeline — text → embedding
    via Arrow ``mapInPandas`` — with a deterministic stand-in model so the
    plumbing is oracle-exact: dim k = int64 of md5(text) hex chars
    [6k, 6k+6) (the cross-engine md5 device, CONVENTIONS.md), plus the
    exact integer norm². A real sentence-transformer drops into the same
    iterator-of-batches body (load the model ONCE per partition outside the
    batch loop, exactly where ``hashlib`` sits here); schema, batch shape,
    and partitioning are what GPU inference needs: the repartitioned scan
    spreads docs across workers, each Arrow batch amortizes model-call
    overhead, and the output is flat int64 columns (never a top-level
    array — the driver-hasher lesson from multimodal_frame_sample)."""

    def infer(batches):
        import hashlib

        # model-load site: a real codec/model initializes HERE, once per
        # partition, and is reused across every Arrow batch below
        for pdf in batches:
            hexes = [
                hashlib.md5(t.encode("utf-8")).hexdigest() for t in pdf["text"]
            ]
            out = {"doc_id": pdf["doc_id"]}
            dims = []
            for k in range(EMBED_DIMS):
                col = [
                    int(h[k * EMBED_HEX_CHARS : (k + 1) * EMBED_HEX_CHARS], 16)
                    for h in hexes
                ]
                out[f"e{k}"] = col
                dims.append(col)
            out["norm2"] = [
                sum(v * v for v in vec) for vec in zip(*dims)
            ]
            yield pd.DataFrame(out)

    docs = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    schema = "doc_id long, " + ", ".join(
        f"e{k} long" for k in range(EMBED_DIMS)
    ) + ", norm2 long"
    return (
        docs.select("doc_id", "text")
        .mapInPandas(infer, schema=schema)
        .orderBy("doc_id")
    )


_EMBED_DIM_SQL = ", ".join(
    f"('0x' || substr(md5(text), {k * EMBED_HEX_CHARS + 1}, {EMBED_HEX_CHARS}))"
    f"::BIGINT AS e{k}"
    for k in range(EMBED_DIMS)
)

_ORACLE_EMBED = f"""
WITH emb AS (SELECT doc_id, {_EMBED_DIM_SQL} FROM documents)
SELECT doc_id, {", ".join(f"e{k}" for k in range(EMBED_DIMS))},
       {" + ".join(f"e{k} * e{k}" for k in range(EMBED_DIMS))} AS norm2
FROM emb ORDER BY doc_id
"""


SPECS = [
    QuerySpec("udf_embed_batch_inference", udf_embed_batch_inference,
              _ORACLE_EMBED, "udf",
              "Arrow mapInPandas batch-inference slot: text -> int64 "
              "embedding dims via the md5 stand-in model, norm2 exact"),
    QuerySpec("udf_scalar_clamp", udf_scalar_clamp, _ORACLE_CLAMP, "udf",
              "vectorized pandas UDF scalar clamp (rerank formula)"),
    QuerySpec("udaf_grouped_normalize", udaf_grouped_normalize, _ORACLE_NORMALIZE, "udf",
              "applyInPandas grouped z-score with exact-integer stats"),
    QuerySpec("udtf_explode_tokens", udtf_explode_tokens, _ORACLE_UDTF, "udf",
              "Python UDTF token explode via LATERAL join"),
]
