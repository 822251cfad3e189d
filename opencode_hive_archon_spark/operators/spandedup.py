"""Exact-substring span dedup: per-document duplicated-span coverage.

The third rung of the published dedup ladder for LLM pretraining corpora
(document-exact and near-dup live in dedup.py): instead of dropping WHOLE
documents, measure how much of each document is covered by token spans
that also occur verbatim in OTHER documents — the "exact substring
deduplication" analysis of Lee et al. 2022 (Deduplicating Training Data
Makes Language Models Better), re-expressed relationally. A document
whose text is mostly cross-doc duplicated spans is boilerplate even when
no single whole-document duplicate exists.

Relational formulation (one corpus scan, everything linear):

1. positional 8-token grams — (doc_id, start, gram) with start kept, NOT
   distinct: span coverage needs every occurrence, unlike the membership
   checks in decontaminate.py / dedup.py;
2. a gram is *duplicated* when its document frequency ≥ 2 — a two-phase
   (map-side partial) aggregate on the gram key;
3. duplicated-gram instances semi-join back (gram-keyed shuffle carries
   (doc_id, start, 60-bit md5-prefix hash), never gram text);
4. covered token positions = the union of [start, start+7] intervals,
   computed by exploding positions of duplicated instances only — the
   blow-up is bounded by TRUE duplication volume, not corpus size;
5. per-doc report: token/gram counts, duplicated-gram count, covered
   tokens, coverage ratio, and the keep verdict (drop when more than half
   the tokens sit inside duplicated spans — an integer-exact comparison).

100 TB posture: the plan is scan → gram-keyed agg → gram-keyed semi-join
→ doc-keyed agg — the same linear shuffle ladder as corpus_decontaminate,
with no candidate-pair materialization at all (span dedup never forms
doc×doc pairs). The gram key is the engine-mirrored 15-hex md5 prefix
(CONVENTIONS.md CROSS-ENGINE HASH): 60 bits, so spurious collisions are
~n²/2⁶⁰ and, because BOTH engines hash identically, the oracle comparison
is exact even in the astronomically-unlikely collision case.

Reference parity: no counterpart in the reference (retrieval-only
engine); part of the LLM-data-pipeline surface required by BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opencode_hive_archon_spark.functions.hashing import (
    md5_prefix_long,
    md5_prefix_long_sql,
)
from opencode_hive_archon_spark.operators.textops import _docs, _toks
from opencode_hive_archon_spark.session import materialize as _materialize
from opencode_hive_archon_spark.spec import QuerySpec

SPAN_NGRAM = 8  # tokens per span gram (matches decontaminate's long-gram knob)
GRAM_HASH_HEX = 15  # 60-bit join key: widest the cross-engine rule allows


def span_dedup_report(docs: DataFrame) -> DataFrame:
    """Per-doc span-dedup report over a (doc_id, lang, text) frame.

    Factored from the registered query so tests can feed planted corpora
    (`tests/test_span_dedup.py`) — the registered entry binds it to the
    documents table."""
    k = SPAN_NGRAM
    toks = _toks()
    base = docs.select(
        "doc_id", "lang", toks.alias("toks")
    ).select(
        "doc_id", "lang", F.col("toks"), F.size("toks").alias("n_tokens")
    )
    # Positional grams: struct(start, gram) per overlapping window. The
    # token array is its own projection first (see decontaminate._long_grams
    # for the re-evaluation pitfall), and the sequence is guarded so short
    # docs yield an EMPTY gram list — F.sequence(1, negative) would count
    # DOWN, not produce nothing.
    grams = F.when(
        F.col("n_tokens") >= k,
        F.transform(
            F.sequence(F.lit(1), F.col("n_tokens") - (k - 1)),
            lambda i: F.struct(
                i.alias("s"),
                F.array_join(F.slice("toks", i, k), " ").alias("gram"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<s:int,gram:string>>"))
    ge = _materialize(
        base.select(
            "doc_id", F.explode(grams).alias("g")
        ).select(
            "doc_id",
            F.col("g.s").alias("s"),
            md5_prefix_long(F.col("g.gram"), GRAM_HASH_HEX).alias("gram_h"),
        )
    )
    dup = (
        ge.groupBy("gram_h")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= 2)
        .select("gram_h")
    )
    di = ge.join(dup, "gram_h", "semi")
    ndup = di.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_dup_grams"))
    cov = (
        di.select("doc_id", F.explode(F.sequence("s", F.col("s") + (k - 1))).alias("p"))
        .groupBy("doc_id")
        .agg(F.countDistinct("p").alias("dup_tokens"))
    )
    n_grams = F.when(
        F.col("n_tokens") >= k, F.col("n_tokens") - (k - 1)
    ).otherwise(F.lit(0)).cast("long")
    return (
        base.select("doc_id", "lang", "n_tokens", n_grams.alias("n_grams"))
        .join(ndup, "doc_id", "left")
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "n_grams",
            F.coalesce("n_dup_grams", F.lit(0)).cast("long").alias("n_dup_grams"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            (
                F.coalesce("dup_tokens", F.lit(0)).cast("double")
                / F.col("n_tokens")
            ).alias("dup_token_ratio"),
            (
                F.coalesce("dup_tokens", F.lit(0)) * 2 <= F.col("n_tokens")
            ).alias("keep"),
        )
    )


def corpus_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-dedup report over the documents table (see module docstring)."""
    return span_dedup_report(_docs(spark, sf_dir).select("doc_id", "lang", "text"))


_GRAM_EXPR = " || ' ' || ".join(f"t[s+{j}]" for j in range(SPAN_NGRAM))

_ORACLE_SPAN = f"""
WITH tok AS (
  SELECT doc_id, lang,
         string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS t
  FROM documents
),
base AS (SELECT doc_id, lang, len(t) AS n_tokens, t FROM tok),
starts AS (
  SELECT doc_id, n_tokens, t,
         unnest([i for i in range(1, greatest(n_tokens - {SPAN_NGRAM - 2}, 1))]) AS s
  FROM base
),
ge AS (
  SELECT doc_id, s,
         {md5_prefix_long_sql(f"({_GRAM_EXPR})", GRAM_HASH_HEX)} AS gram_h
  FROM starts
),
dup AS (SELECT gram_h FROM ge GROUP BY gram_h HAVING count(DISTINCT doc_id) >= 2),
di AS (SELECT ge.doc_id, ge.s FROM ge JOIN dup USING (gram_h)),
ndup AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_grams FROM di GROUP BY doc_id),
cov AS (
  SELECT doc_id, CAST(count(DISTINCT p) AS BIGINT) AS dup_tokens
  FROM (SELECT doc_id, unnest([s + j for j in range(0, {SPAN_NGRAM})]) AS p FROM di)
  GROUP BY doc_id
)
SELECT b.doc_id, b.lang,
       CAST(b.n_tokens AS BIGINT) AS n_tokens,
       CAST(CASE WHEN b.n_tokens >= {SPAN_NGRAM}
                 THEN b.n_tokens - {SPAN_NGRAM - 1} ELSE 0 END AS BIGINT) AS n_grams,
       coalesce(ndup.n_dup_grams, 0) AS n_dup_grams,
       coalesce(cov.dup_tokens, 0) AS dup_tokens,
       CAST(coalesce(cov.dup_tokens, 0) AS DOUBLE) / b.n_tokens AS dup_token_ratio,
       coalesce(cov.dup_tokens, 0) * 2 <= b.n_tokens AS keep
FROM base b
LEFT JOIN ndup ON b.doc_id = ndup.doc_id
LEFT JOIN cov ON b.doc_id = cov.doc_id
ORDER BY b.doc_id
"""


SPECS = [
    QuerySpec(
        "corpus_span_dedup", corpus_span_dedup, _ORACLE_SPAN, "text",
        "exact-substring span dedup (Lee et al. 2022 shape): per-doc "
        "coverage by cross-doc duplicated 8-token spans — positional "
        "grams, df>=2 via two-phase agg, coverage from duplicated "
        "instances only; no doc-pair materialization"),
]
