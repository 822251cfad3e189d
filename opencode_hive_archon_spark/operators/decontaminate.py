"""Benchmark decontamination: long-n-gram overlap between train and eval.

The published decontamination rule for LLM pretraining corpora (the
GPT-3/PaLM-style "13-gram overlap" check): an evaluation document is
contaminated if it shares ANY sufficiently long token n-gram with a
training document. Long n-grams are the load-bearing design choice for
scale: unlike the short grams used for NEAR-dup similarity (whose
vocabulary saturates — see dedup.py's pair-key discussion), long-gram
vocabulary grows combinatorially, so the (gram → doc) inverted index has
near-singleton buckets and the join output tracks TRUE shared text, never
corpus². The whole check is ONE corpus scan into a persisted
(doc, split, gram) relation that feeds both sides of a single equi-join.

``corpus_decontaminate`` treats the engine's deterministic validation
split (textops.corpus_train_val_split: md5-bucket on doc_id) as the eval
set and reports the contamination rate of val against train — the audit a
pipeline runs before trusting held-out numbers, since random splits leak
near-duplicates across the boundary by construction.

8 token grams here (driver documents average ~17 winnowed-gram-scale
texts; 13 would exceed many short docs) — the knob, not the algorithm.
Oracle-exact: tokenization, gram construction, split assignment, and the
join are all engine-mirrored.

Reference parity: no counterpart in the reference (retrieval-only
engine); part of the LLM-data-pipeline surface required by BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opencode_hive_archon_spark.functions.hashing import md5_prefix_long_sql
from opencode_hive_archon_spark.operators.textops import (
    SPLIT_BUCKETS,
    SPLIT_HASH_HEX_CHARS,
    VAL_BUCKETS,
    _split_col,
)
from opencode_hive_archon_spark.session import materialize as _materialize
from opencode_hive_archon_spark.session import read_table as _t
from opencode_hive_archon_spark.spec import QuerySpec

DECON_NGRAM = 8  # tokens per contamination gram


def _long_grams(toks: F.Column) -> F.Column:
    """Distinct 8-token grams from an ALREADY-MATERIALIZED token column.

    The token array must be its own projection before this runs: deriving
    it inline would re-evaluate the tokenize regex for every slice access
    (the pitfall documented at dedup._shingled_docs — measured here as
    73 s → ~3 s at sf0.1)."""
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (DECON_NGRAM - 1)),
            lambda i: F.array_join(F.slice(toks, i, DECON_NGRAM), " "),
        )
    )
    return F.when(F.size(toks) >= DECON_NGRAM, grams).otherwise(
        F.array().cast("array<string>")
    )


def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination audit of the val split against the train split."""
    toks = F.split(
        F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " "), " "
    )
    docs = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", _split_col().alias("split"), toks.alias("toks"))
        .select(
            "doc_id", "split", _long_grams(F.col("toks")).alias("g")
        )
    )
    counts = docs.groupBy().agg(
        F.sum((F.col("split") == "val").cast("long")).alias("n_val_docs"),
        F.sum((F.col("split") == "train").cast("long")).alias("n_train_docs"),
    )
    # The exploded (doc, split, gram) relation feeds BOTH join sides;
    # materialize it once so tokenization + gram construction run a single
    # time over the corpus instead of once per side (the session-level
    # persist pattern used by the dedup family).
    ge = _materialize(
        docs.select("doc_id", "split", F.explode("g").alias("gram"))
    )
    val = ge.filter(F.col("split") == "val").select(
        F.col("doc_id").alias("val_doc"), "gram"
    )
    train = ge.filter(F.col("split") == "train").select(
        F.col("doc_id").alias("train_doc"), "gram"
    )
    pairs = val.join(train, "gram").select("val_doc", "train_doc").distinct()
    pair_stats = pairs.groupBy().agg(
        F.countDistinct("val_doc").alias("n_contaminated_val"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    return counts.crossJoin(pair_stats).select(
        "n_val_docs",
        "n_train_docs",
        "n_contaminated_val",
        "n_pairs",
        (
            F.col("n_contaminated_val").cast("double") / F.col("n_val_docs")
        ).alias("contamination_rate"),
    )


_GRAM_TERMS = " || ' ' || ".join(f"t[i+{j}]" for j in range(DECON_NGRAM))
_SPLIT_SQL = (
    f"CASE WHEN {md5_prefix_long_sql('CAST(doc_id AS VARCHAR)', SPLIT_HASH_HEX_CHARS)}"
    f" % {SPLIT_BUCKETS} < {VAL_BUCKETS} THEN 'val' ELSE 'train' END"
)

_ORACLE_DECON = f"""
WITH tok AS (
  SELECT doc_id, {_SPLIT_SQL} AS split,
         string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS t
  FROM documents
),
g AS (
  SELECT doc_id, split,
         list_distinct([{_GRAM_TERMS}
                        for i in range(1, greatest(len(t) - {DECON_NGRAM - 2}, 1))]) AS grams
  FROM tok
),
ge AS (SELECT doc_id, split, unnest(grams) AS gram FROM g),
p AS (
  SELECT DISTINCT v.doc_id AS val_doc, t.doc_id AS train_doc
  FROM ge v JOIN ge t ON v.gram = t.gram
  WHERE v.split = 'val' AND t.split = 'train'
),
c AS (
  SELECT CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val_docs,
         CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train_docs
  FROM g
),
ps AS (
  SELECT CAST(count(DISTINCT val_doc) AS BIGINT) AS n_contaminated_val,
         CAST(count(*) AS BIGINT) AS n_pairs
  FROM p
)
SELECT n_val_docs, n_train_docs, n_contaminated_val, n_pairs,
       CAST(n_contaminated_val AS DOUBLE) / n_val_docs AS contamination_rate
FROM c, ps
"""


SPECS = [
    QuerySpec(
        "corpus_decontaminate", corpus_decontaminate, _ORACLE_DECON, "text",
        "benchmark decontamination audit: val docs sharing any 8-token "
        "gram with train (long-gram inverted index — near-singleton "
        "buckets, output tracks true shared text)"),
]
