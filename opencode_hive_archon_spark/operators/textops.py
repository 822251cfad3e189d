"""Family 3c — text analysis over ``documents`` (training-data pipeline ops).

Token statistics, language profiling, heuristic language-ID, quality
scoring, token counting (whitespace + regex segmentation), document
fingerprinting, and the multimodal text⋈vector join. All hot-path
expressions are built-ins (split/explode/regexp/aggregate) — whole-stage
codegen end to end; nothing leaves the JVM.

Per-row ratio doubles are deterministic (int/int division); no cross-row
float sums except through DECIMAL casts (see relational.py rationale).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from opencode_hive_archon_spark.functions.hashing import (
    md5_prefix_long,
    md5_prefix_long_sql,
)
from opencode_hive_archon_spark.functions.vector import cosine_similarity
from opencode_hive_archon_spark.session import read_table as _t
from opencode_hive_archon_spark.spec import QuerySpec

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents scan, re-split across cores: the parquet is a single row
    group (one scan partition), so heavy per-row text expressions must be
    redistributed or they run single-threaded."""
    return _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )


def _toks():
    """Lazy: Column construction needs an active SparkSession (JVM)."""
    return F.split(F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " "), " ")
_TOKS_SQL = "string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')"

# Tiny deterministic marker lexicons for heuristic language ID. (The
# synthetic corpus is English-ish for every lang label; the CLASSIFIER is
# still exercised end-to-end — prediction quality is not the point.)
_LANG_MARKERS = {
    "en": ("the", "a", "of", "and"),
    "es": ("el", "la", "de", "que"),
    "fr": ("le", "la", "et", "les"),
    "de": ("der", "die", "und", "das"),
    "zh": ("的", "是", "了", "在"),
}

_STOPWORDS = ("the", "a", "of", "and", "to", "in")


def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 terms by frequency (count desc, token asc) with
    distinct-doc counts — explode + two-level aggregate."""
    docs = _docs(spark, sf_dir)
    ex = docs.select("doc_id", F.explode(_toks()).alias("token"))
    return (
        ex.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("freq").desc(), F.col("token").asc())
        .limit(20)
    )


_ORACLE_TOKEN_STATS = f"""
WITH ex AS (SELECT doc_id, unnest({_TOKS_SQL}) AS token FROM documents)
SELECT token, count(*) AS freq, count(DISTINCT doc_id) AS n_docs
FROM ex GROUP BY token
ORDER BY freq DESC, token ASC LIMIT 20
"""


def text_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang corpus profile: doc counts, length stats, exact p50/p95."""
    docs = _docs(spark, sf_dir)
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.percentile(F.col("n_chars"), F.lit(0.5)).alias("p50_chars"),
            F.percentile(F.col("n_chars"), F.lit(0.95)).alias("p95_chars"),
        )
        .orderBy("lang")
    )


_ORACLE_LANG_PROFILE = """
SELECT lang, count(*) AS n_docs, count(DISTINCT source) AS n_sources,
       CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars,
       quantile_cont(n_chars, 0.5) AS p50_chars,
       quantile_cont(n_chars, 0.95) AS p95_chars
FROM documents GROUP BY lang
"""


def _marker_hits(lang: str):
    toks = F.array_distinct(_toks())
    hits = F.size(
        F.array_intersect(toks, F.array(*[F.lit(m) for m in _LANG_MARKERS[lang]]))
    )
    return hits


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic marker-token language ID + confusion-matrix aggregate.

    argmax over per-lang marker hit counts (ties + zero-hits -> 'und'),
    evaluated as a when() cascade — pure codegen, no UDF.
    """
    docs = _docs(spark, sf_dir)
    langs = list(_LANG_MARKERS)
    scored = docs.select(
        "lang", *[_marker_hits(lg).alias(f"hits_{lg}") for lg in langs]
    )
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in langs])
    # first lang (in fixed order) achieving the max, if any marker hit
    pred = F.lit("und")
    for lg in reversed(langs):
        pred = F.when((F.col(f"hits_{lg}") == best) & (best > 0), F.lit(lg)).otherwise(pred)
    return (
        scored.select("lang", pred.alias("predicted_lang"))
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "predicted_lang")
    )


def _marker_hits_sql(lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in _LANG_MARKERS[lang])
    return f"len(list_intersect(list_distinct({_TOKS_SQL}), [{markers}]))"


_langs = list(_LANG_MARKERS)
_best_sql = "greatest(" + ", ".join(f"hits_{lg}" for lg in _langs) + ")"
_pred_sql = "CASE " + " ".join(
    f"WHEN hits_{lg} = {_best_sql} AND {_best_sql} > 0 THEN '{lg}'" for lg in _langs
) + " ELSE 'und' END"

_ORACLE_LANGID = f"""
WITH scored AS (
  SELECT lang,
         {", ".join(f"{_marker_hits_sql(lg)} AS hits_{lg}" for lg in _langs)}
  FROM documents
)
SELECT lang, {_pred_sql} AS predicted_lang, count(*) AS n_docs
FROM scored GROUP BY 1, 2
"""


def quality_score_col() -> F.Column:
    """The composite quality expression over (text, n_chars) columns, in
    [0, 1] by construction (0.5 + 0.3 + 0.2 component weights). Shared by
    `text_quality_score` and `sampling.corpus_importance_sample` so the
    filter feature and the sampling weight can never drift apart; its SQL
    mirror is `_QUALITY_EXPR_SQL` (assumes a `toks` token-array column
    beside `text`)."""
    toks = _toks()
    n_toks = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS)))
    n_punct = F.length(F.col("text")) - F.length(
        F.regexp_replace(F.col("text"), r"[^\w\s]", "")
    )
    stop_ratio = stop_hits.cast("double") / n_toks
    punct_ratio = n_punct.cast("double") / F.length("text")
    return (
        F.least(F.lit(1.0), n_toks.cast("double") / F.lit(100.0)) * F.lit(0.5)
        + F.least(F.lit(1.0), stop_ratio * F.lit(10.0)) * F.lit(0.3)
        + (F.lit(1.0) - punct_ratio) * F.lit(0.2)
    )


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality signals: token counts, stopword/punct ratios, mean
    token length, composite score — the standard pre-training quality
    filter features, all as one codegen'd projection."""
    docs = _docs(spark, sf_dir)
    toks = _toks()
    n_toks = F.size(toks)
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*_STOPWORDS))
    )
    n_punct = F.length(F.col("text")) - F.length(
        F.regexp_replace(F.col("text"), r"[^\w\s]", "")
    )
    mean_tok_len = (F.col("n_chars").cast("double") - (n_toks - 1)) / n_toks
    stop_ratio = stop_hits.cast("double") / n_toks
    punct_ratio = n_punct.cast("double") / F.length("text")
    quality = quality_score_col()
    return docs.select(
        "doc_id",
        n_toks.cast("long").alias("n_tokens"),
        stop_hits.cast("long").alias("stopword_hits"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        mean_tok_len.alias("mean_token_len"),
        quality.alias("quality_score"),
    )


_STOPS_SQL = ", ".join(f"'{s}'" for s in _STOPWORDS)

# DuckDB mirror of quality_score_col(); assumes `toks` ({_TOKS_SQL}) and
# `text` columns in scope. Same IEEE ops in the same order as the Spark
# expression, so the value is bit-identical across engines.
_QUALITY_EXPR_SQL = (
    "least(1.0, CAST(len(toks) AS DOUBLE) / 100.0) * 0.5"
    " + least(1.0, (CAST(len(list_filter(toks, t -> t IN ({stops}))) AS DOUBLE)"
    " / len(toks)) * 10.0) * 0.3"
    " + (1.0 - CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))"
    " AS DOUBLE) / length(text)) * 0.2"
).format(stops=_STOPS_SQL)

_ORACLE_QUALITY = f"""
WITH base AS (
  SELECT doc_id, n_chars, text, {_TOKS_SQL} AS toks FROM documents
),
feat AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         len(list_filter(toks, t -> t IN ({_STOPS_SQL}))) AS stopword_hits,
         length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct,
         length(text) AS text_len,
         n_chars
  FROM base
)
SELECT doc_id, n_tokens, stopword_hits,
       CAST(stopword_hits AS DOUBLE) / n_tokens AS stopword_ratio,
       CAST(n_punct AS DOUBLE) / text_len AS punct_ratio,
       (CAST(n_chars AS DOUBLE) - (n_tokens - 1)) / n_tokens AS mean_token_len,
       least(1.0, CAST(n_tokens AS DOUBLE) / 100.0) * 0.5
         + least(1.0, (CAST(stopword_hits AS DOUBLE) / n_tokens) * 10.0) * 0.3
         + (1.0 - CAST(n_punct AS DOUBLE) / text_len) * 0.2 AS quality_score
FROM feat
"""


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish regex
    segmentation (letter runs / digit runs / single other), plus a
    chars-per-token estimate — the standard token-budget accounting."""
    docs = _docs(spark, sf_dir)
    ws = F.size(_toks())
    bpe = F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0))
    return docs.select(
        "doc_id",
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_ish_tokens"),
        (F.col("n_chars").cast("double") / ws).alias("chars_per_ws_token"),
    )


_ORACLE_TOKEN_COUNT = f"""
SELECT doc_id,
       len({_TOKS_SQL}) AS ws_tokens,
       len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS bpe_ish_tokens,
       CAST(n_chars AS DOUBLE) / len({_TOKS_SQL}) AS chars_per_ws_token
FROM documents
"""


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 of normalized text + shingle cardinalities
    (the container for containment/near-dup bookkeeping downstream)."""
    from opencode_hive_archon_spark.operators.dedup import _shingles

    docs = _docs(spark, sf_dir)
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    sh = _shingles(_toks())
    return docs.select(
        "doc_id",
        F.substring(F.md5(norm), 1, 16).alias("fingerprint"),
        F.size(_toks()).cast("long").alias("n_tokens"),
        F.size(sh).cast("long").alias("n_shingles"),
    )


_ORACLE_FINGERPRINT = f"""
WITH tok AS (SELECT doc_id, text, {_TOKS_SQL} AS t FROM documents)
SELECT doc_id,
       substring(md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')), 1, 16) AS fingerprint,
       len(t) AS n_tokens,
       len(list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                          for i in range(1, greatest(len(t) - 1, 1))])) AS n_shingles
FROM tok
"""


def text_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Karp-Rabin rolling-hash document fingerprint (winnowing-style):
    polynomial hash h(g) = fold(acc*31 + ascii(c)) mod (2^31-1) over each
    token-3-gram shingle's characters; the doc fingerprint keeps the MIN and
    MAX shingle hash plus the hash of the full normalized text.

    Pure integer arithmetic (fold stays < 2^36 before each mod), so Spark
    and DuckDB agree exactly — unlike engine hash builtins (xxhash64),
    this rolling hash is portable and oracle-checked.
    """
    from opencode_hive_archon_spark.operators.dedup import _shingles

    docs = _docs(spark, sf_dir)
    mod = (1 << 31) - 1

    def roll(strcol):
        return F.aggregate(
            F.split(strcol, ""),
            F.lit(0).cast("long"),
            lambda acc, c: (acc * 31 + F.ascii(c)) % mod,
        )

    sh_hashes = F.transform(_shingles(_toks()), roll)
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    return docs.select(
        "doc_id",
        roll(norm).alias("text_hash"),
        F.array_min(sh_hashes).alias("min_shingle_hash"),
        F.array_max(sh_hashes).alias("max_shingle_hash"),
    )


_ROLL_SQL = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), [CAST(ascii(c) AS BIGINT) "
    "for c in string_split_regex({s}, '')]), (acc, x) -> (acc * 31 + x) % 2147483647)"
)

_ORACLE_ROLLING_FP = f"""
WITH tok AS (
  SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS norm,
         {_TOKS_SQL} AS t
  FROM documents
),
sh AS (
  SELECT doc_id, norm,
         list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                        for i in range(1, greatest(len(t) - 1, 1))]) AS shingles
  FROM tok
)
SELECT doc_id,
       {_ROLL_SQL.format(s='norm')} AS text_hash,
       list_min([{_ROLL_SQL.format(s='g')} for g in shingles]) AS min_shingle_hash,
       list_max([{_ROLL_SQL.format(s='g')} for g in shingles]) AS max_shingle_hash
FROM sh
"""


CURATION_MIN_QUALITY = 0.6


def _curated_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared curation stage: quality features → quality floor → langid gate
    (pred ≠ 'und') → exact dedup (first doc_id per sha256 digest). Returns
    doc-granularity rows (doc_id, lang, source, text, n_tokens, q, pred) —
    the input relation for every downstream corpus job (per-lang report,
    train/val split, domain caps).

    Every filter stage is a projection over the same scan, so Catalyst fuses
    features + both gates into one codegen stage with zero intermediate
    writes; the only shuffle is the dedup hash partition — keyed on the
    sha256 digest, the text itself never rides a shuffle as a key. That is
    the 100 TB shape: filters free, dedup bounded by digest bytes.

    Tokenization is FACTORED: the regex+split token array (and its distinct
    form for marker hits) is computed once in a prior projection and every
    feature reads the column — per-language marker counting must not
    re-tokenize (5 langs × regex split = the measured hot spot at sf1; the
    factoring is what codegen CSE does not guarantee for array-typed
    subexpressions). Still one codegen stage — a projection chain adds no
    exchange."""
    docs = _docs(spark, sf_dir)
    tokenized = docs.select(
        "doc_id", "lang", "source", "text",
        _toks().alias("toks"),
    ).withColumn("dtoks", F.array_distinct(F.col("toks")))
    n_toks = F.size(F.col("toks"))
    stop_hits = F.size(F.filter(F.col("toks"), lambda t: t.isin(*_STOPWORDS)))
    n_punct = F.length(F.col("text")) - F.length(
        F.regexp_replace(F.col("text"), r"[^\w\s]", "")
    )
    stop_ratio = stop_hits.cast("double") / n_toks
    punct_ratio = n_punct.cast("double") / F.length("text")
    quality = (
        F.least(F.lit(1.0), n_toks.cast("double") / F.lit(100.0)) * F.lit(0.5)
        + F.least(F.lit(1.0), stop_ratio * F.lit(10.0)) * F.lit(0.3)
        + (F.lit(1.0) - punct_ratio) * F.lit(0.2)
    )
    langs = list(_LANG_MARKERS)

    def marker_hits(lg: str):
        return F.size(
            F.array_intersect(
                F.col("dtoks"), F.array(*[F.lit(m) for m in _LANG_MARKERS[lg]])
            )
        )

    scored = tokenized.select(
        "doc_id", "lang", "source", "text",
        n_toks.cast("long").alias("n_tokens"),
        quality.alias("q"),
        *[marker_hits(lg).alias(f"hits_{lg}") for lg in langs],
    )
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in langs])
    pred = F.lit("und")
    for lg in reversed(langs):
        pred = F.when((F.col(f"hits_{lg}") == best) & (best > 0), F.lit(lg)).otherwise(pred)
    kept = scored.select(
        "doc_id", "lang", "source", "text", "n_tokens", "q", pred.alias("pred")
    ).filter((F.col("q") >= F.lit(CURATION_MIN_QUALITY)) & (F.col("pred") != "und"))
    w = Window.partitionBy(F.sha2(F.col("text"), 256)).orderBy(F.col("doc_id").asc())
    return kept.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)


def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation in ONE declarative plan: the shared
    curation stage (quality floor + langid gate + exact dedup —
    ``_curated_docs``) → per-lang training-corpus report.

    Float parity: quality reuses text_quality_score's exact expression
    shape; per-lang quality sums go through DECIMAL(18,12) (see
    relational.py rationale)."""
    deduped = _curated_docs(spark, sf_dir)
    sum_q = F.sum(F.col("q").cast("decimal(18,12)"))
    return (
        deduped.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.sum("n_tokens").alias("total_ws_tokens"),
            sum_q.cast("double").alias("sum_quality"),
            (sum_q.cast("double") / F.count(F.lit(1))).alias("avg_quality"),
        )
        .orderBy("lang")
    )


SOURCE_TOKEN_CAP = 20_000  # per-source token budget


def corpus_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget packing: each source (domain) keeps its
    highest-quality documents until a 20k-token budget is exhausted — the
    standard domain-cap step of a pre-training data mix (prevents one domain
    from dominating the corpus).

    Greedy cutoff = running token sum over (quality DESC, doc_id) within the
    source partition; a doc is kept while the budget including it is unspent.
    One hash shuffle on source; no global ordering. Quality reuses
    text_quality_score's exact expression shape (float parity)."""
    docs = _docs(spark, sf_dir)
    toks = _toks()
    n_toks = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS)))
    n_punct = F.length(F.col("text")) - F.length(
        F.regexp_replace(F.col("text"), r"[^\w\s]", "")
    )
    quality = (
        F.least(F.lit(1.0), n_toks.cast("double") / F.lit(100.0)) * F.lit(0.5)
        + F.least(F.lit(1.0), (stop_hits.cast("double") / n_toks) * F.lit(10.0)) * F.lit(0.3)
        + (F.lit(1.0) - n_punct.cast("double") / F.length("text")) * F.lit(0.2)
    )
    scored = docs.select(
        "doc_id", "source",
        n_toks.cast("long").alias("n_tokens"), quality.alias("q"),
    )
    w = Window.partitionBy("source").orderBy(F.col("q").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn(
            "cum_tokens",
            F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .filter(F.col("cum_tokens") <= SOURCE_TOKEN_CAP)
        .select("doc_id", "source", "n_tokens", "cum_tokens", "q")
        .orderBy("source", F.col("q").desc(), "doc_id")
    )


_ORACLE_DOMAIN_CAP = f"""
WITH feat AS (
  SELECT doc_id, source, text, n_chars, {_TOKS_SQL} AS toks FROM documents
),
scored AS (
  SELECT doc_id, source,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         least(1.0, CAST(len(toks) AS DOUBLE) / 100.0) * 0.5
           + least(1.0, (CAST(len(list_filter(toks, t -> t IN ({_STOPS_SQL}))) AS DOUBLE)
                         / len(toks)) * 10.0) * 0.3
           + (1.0 - CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))
                         AS DOUBLE) / length(text)) * 0.2 AS q
  FROM feat
),
packed AS (
  SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY q DESC, doc_id ASC
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM scored
)
SELECT doc_id, source, n_tokens, cum_tokens, q
FROM packed WHERE cum_tokens <= {SOURCE_TOKEN_CAP}
"""


def _curation_hits_sql(lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in _LANG_MARKERS[lang])
    return f"len(list_intersect(list_distinct(toks), [{markers}]))"


# Shared curation CTE prefix (mirrors _curated_docs); `dd WHERE rn = 1` is
# the curated doc-level relation every downstream corpus oracle reuses.
_CURATION_CTES = f"""base AS (
  SELECT doc_id, lang, source, text, n_chars, {_TOKS_SQL} AS toks FROM documents
),
feat AS (
  SELECT doc_id, lang, source, text,
         len(toks) AS n_tokens,
         len(list_filter(toks, t -> t IN ({_STOPS_SQL}))) AS stopword_hits,
         length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct,
         length(text) AS text_len,
         {", ".join(f"{_curation_hits_sql(lg)} AS hits_{lg}" for lg in _langs)}
  FROM base
),
q AS (
  SELECT *,
         least(1.0, CAST(n_tokens AS DOUBLE) / 100.0) * 0.5
           + least(1.0, (CAST(stopword_hits AS DOUBLE) / n_tokens) * 10.0) * 0.3
           + (1.0 - CAST(n_punct AS DOUBLE) / text_len) * 0.2 AS q,
         {_pred_sql} AS pred
  FROM feat
),
kept AS (SELECT * FROM q WHERE q >= {CURATION_MIN_QUALITY} AND pred <> 'und'),
dd AS (
  SELECT *, row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
  FROM kept
)"""

_ORACLE_CURATION = f"""
WITH {_CURATION_CTES}
SELECT lang, count(*) AS n_docs, count(DISTINCT source) AS n_sources,
       CAST(sum(n_tokens) AS BIGINT) AS total_ws_tokens,
       CAST(sum(CAST(q AS DECIMAL(18,12))) AS DOUBLE) AS sum_quality,
       CAST(sum(CAST(q AS DECIMAL(18,12))) AS DOUBLE) / count(*) AS avg_quality
FROM dd WHERE rn = 1 GROUP BY lang
"""


def multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ⋈ embeddings (doc_id = vec_id): text + vector modalities in
    one relation, with vector stats and query-vector similarity."""
    docs = _docs(spark, sf_dir)
    emb = _t(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    return (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .crossJoin(F.broadcast(qv))
        .select(
            "doc_id",
            "lang",
            "source",
            "n_chars",
            "label",
            F.size("embedding").cast("long").alias("dim"),
            cosine_similarity(F.col("embedding"), F.col("qv")).alias("sim_to_query"),
        )
    )


_SQ_NORM = (
    "list_reduce(list_prepend(0.0, list_transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (acc, x) -> acc + x)"
)
_DOT = (
    "list_reduce(list_prepend(0.0, list_transform(list_zip({a}, {b}), t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE))), (acc, x) -> acc + x)"
)

_ORACLE_MULTIMODAL = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT doc_id, lang, source, n_chars, label,
       len(embedding) AS dim,
       CASE WHEN sqrt({_SQ_NORM.format(v='embedding')}) * sqrt({_SQ_NORM.format(v='qv')}) <> 0.0
            THEN {_DOT.format(a='embedding', b='qv')}
                 / (sqrt({_SQ_NORM.format(v='embedding')}) * sqrt({_SQ_NORM.format(v='qv')})) END AS sim_to_query
FROM documents JOIN embeddings ON doc_id = vec_id, q
"""


def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per lang: how much of each document
    is its single most frequent token, and how diverse its vocabulary is.

    Per doc (exact integer counts): n_tokens, n_distinct, top_count =
    occurrences of the most frequent token (min-token tie-break irrelevant
    to the count). Per lang: doc count, docs dominated by one token (top
    fraction > 20%), and DECIMAL-cast sums of the per-doc ratios (per-doc
    ratios are deterministic int/int doubles; cross-row sums go through
    DECIMAL per CONVENTIONS.md). Two-level aggregate over an explode — the
    same map-side-partial shape as text_token_stats, no UDFs."""
    docs = _docs(spark, sf_dir)
    per_tok = (
        docs.select("doc_id", "lang", F.explode(_toks()).alias("token"))
        .groupBy("doc_id", "lang", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    per_doc = per_tok.groupBy("doc_id", "lang").agg(
        F.sum("cnt").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("cnt").alias("top_count"),
    )
    distinct_ratio = F.col("n_distinct").cast("double") / F.col("n_tokens")
    top_fraction = F.col("top_count").cast("double") / F.col("n_tokens")
    return (
        per_doc.select(
            "lang",
            distinct_ratio.alias("dr"),
            top_fraction.alias("tf"),
            (F.col("top_count") * 5 > F.col("n_tokens")).alias("dominated"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("dominated").cast("long")).alias("n_dominated"),
            F.sum(F.col("dr").cast("decimal(18,12)")).cast("double").alias("sum_distinct_ratio"),
            F.sum(F.col("tf").cast("decimal(18,12)")).cast("double").alias("sum_top_fraction"),
            F.min("dr").alias("min_distinct_ratio"),
            F.max("tf").alias("max_top_fraction"),
        )
        .orderBy("lang")
    )


_ORACLE_REPETITION = f"""
WITH per_tok AS (
  SELECT doc_id, lang, t.token, count(*) AS cnt
  FROM (SELECT doc_id, lang, unnest({_TOKS_SQL}) AS token FROM documents) t
  GROUP BY doc_id, lang, t.token
),
per_doc AS (
  SELECT doc_id, lang,
         CAST(sum(cnt) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_distinct,
         CAST(max(cnt) AS BIGINT) AS top_count
  FROM per_tok GROUP BY doc_id, lang
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(coalesce(sum(CASE WHEN top_count * 5 > n_tokens THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_dominated,
       CAST(sum(CAST(CAST(n_distinct AS DOUBLE) / n_tokens AS DECIMAL(18,12))) AS DOUBLE) AS sum_distinct_ratio,
       CAST(sum(CAST(CAST(top_count AS DOUBLE) / n_tokens AS DECIMAL(18,12))) AS DOUBLE) AS sum_top_fraction,
       min(CAST(n_distinct AS DOUBLE) / n_tokens) AS min_distinct_ratio,
       max(CAST(top_count AS DOUBLE) / n_tokens) AS max_top_fraction
FROM per_doc
GROUP BY lang
ORDER BY lang
"""


# --- deterministic train/validation split ---------------------------------

# bucket = (first 16 bits of md5(doc_id)) mod 100. A cryptographic digest
# gives full avalanche — no residue structure ties split membership to id
# patterns (the previous multiplicative form kept only low-order residue
# information). 16 bits keeps the hex->int conversion overflow-free on every
# engine; 65536 % 100 = 36 leaves a ~0.01% absolute bucket-probability skew
# (656/65536 vs 655/65536), far below sampling noise at any corpus size.
SPLIT_HASH_HEX_CHARS = 4
SPLIT_BUCKETS = 100
VAL_BUCKETS = 10  # 10% validation


def corpus_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible train/validation split by id-hash bucketing.

    The split a training pipeline needs at 100 TB: assignment is a pure
    per-row expression on the stable doc_id — no sampling state, no shuffle,
    no RNG — so it is identical across runs, clusters, and engines (the
    oracle reproduces it bit-for-bit), documents keep their split when the
    corpus is re-partitioned or appended to, and filtering either split
    pushes down to the scan. bucket = int(md5(doc_id)[:4 hex], 16) mod 100;
    val iff bucket < 10. Reports per-(split, lang) counts/chars as the
    balance check run after every split definition change."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(_split_col().alias("split"), "lang", "n_chars", "doc_id")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("split", "lang")
    )


_ORACLE_TRAIN_VAL = f"""
SELECT CASE WHEN {md5_prefix_long_sql("CAST(doc_id AS VARCHAR)", SPLIT_HASH_HEX_CHARS)}
            % {SPLIT_BUCKETS} < {VAL_BUCKETS} THEN 'val' ELSE 'train' END AS split,
       lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM documents
GROUP BY 1, 2
ORDER BY split, lang
"""


# --- the fused pre-training data job ---------------------------------------


def _split_col() -> "F.Column":
    """Deterministic split assignment (same definition as
    corpus_train_val_split): md5-prefix bucket on doc_id."""
    bucket = F.pmod(
        md5_prefix_long(F.col("doc_id").cast("string"), SPLIT_HASH_HEX_CHARS),
        F.lit(SPLIT_BUCKETS),
    )
    return F.when(bucket < VAL_BUCKETS, F.lit("val")).otherwise(F.lit("train"))


def corpus_pretraining_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The showcase pre-training data job, ONE fused declarative plan:

        quality features → quality floor → langid gate → exact dedup
        (shared ``_curated_docs`` stage) → deterministic train/val split
        → per-(split, lang) corpus report

    Composition is free: the split is a pure per-row expression over the
    curated relation, so Catalyst fuses it into the dedup output projection —
    stacking the split stage on top of curation adds ZERO shuffles. The
    plan's exchanges are pinned at five (tests/test_plan_shapes.py): the
    single-row-group scan re-split, the digest dedup, the two-phase
    (split,lang[,source]) distinct-count aggregate, and the presentation
    sort. At 100 TB this plan is the difference between a pipeline of 4
    materialized intermediate datasets and one pass over the corpus.
    """
    deduped = _curated_docs(spark, sf_dir)
    sum_q = F.sum(F.col("q").cast("decimal(18,12)"))
    return (
        deduped.select(_split_col().alias("split"), "lang", "source", "n_tokens", "q", "doc_id")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.sum("n_tokens").alias("total_ws_tokens"),
            sum_q.cast("double").alias("sum_quality"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("split", "lang")
    )


_ORACLE_PRETRAIN_PIPELINE = f"""
WITH {_CURATION_CTES},
curated AS (SELECT * FROM dd WHERE rn = 1),
sp AS (
  SELECT *,
         CASE WHEN {md5_prefix_long_sql("CAST(doc_id AS VARCHAR)", SPLIT_HASH_HEX_CHARS)}
              % {SPLIT_BUCKETS} < {VAL_BUCKETS} THEN 'val' ELSE 'train' END AS split
  FROM curated
)
SELECT split, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(sum(n_tokens) AS BIGINT) AS total_ws_tokens,
       CAST(sum(CAST(q AS DECIMAL(18,12))) AS DOUBLE) AS sum_quality,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM sp
GROUP BY split, lang
ORDER BY split, lang
"""


def corpus_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent character-pair frequencies — the merge-candidate
    statistic of ONE BPE tokenizer-training iteration (the inner loop of
    byte-pair encoding: count all adjacent symbol pairs, merge the most
    frequent). Expressed as pure explode + partial-aggregated count: the
    map side collapses each partition's character stream to its pair
    vocabulary (a few hundred rows), so the shuffle is vocabulary-sized
    regardless of corpus size — the property that makes distributed BPE
    training iterations cheap. Deterministic pair tie-break; global top-20
    via TakeOrderedAndProject."""
    docs = _t(spark, sf_dir, "documents")
    # Normalize into its OWN projection first: slicing the inline regex
    # expression would re-evaluate it once per character access (O(len²)
    # regex work per doc — the pitfall documented at _shingled_docs;
    # measured 14 s → ~1 s at sf0.1 for this query).
    normed = docs.select(
        F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ").alias("nt")
    )
    nt = F.col("nt")
    pairs = F.when(
        F.length(nt) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length(nt) - 1),
            lambda i: nt.substr(i, F.lit(2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        normed.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "pair")
        .limit(20)
    )


_ORACLE_BPE_PAIRS = """
WITH norm AS (
  SELECT regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS nt
  FROM documents
),
pairs AS (
  SELECT unnest([substr(nt, i, 2) for i in range(1, greatest(len(nt), 1))])
           AS pair
  FROM norm
)
SELECT pair, count(*) AS n_occurrences
FROM pairs
GROUP BY pair
ORDER BY n_occurrences DESC, pair
LIMIT 20
"""


# Vocabulary size for the rarity score. The synthetic corpus has ~31
# distinct tokens, so 16 keeps OOV non-degenerate; a production corpus
# turns this to 10^5-10^6 — the plan shape (TakeOrdered vocab + broadcast
# membership) is unchanged by the value.
RARITY_VOCAB_K = 16


def text_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-weighted document scoring — the unigram-LM quality proxy
    of pretraining curation (rare-token density / out-of-vocabulary rate
    against a corpus-derived top-K vocabulary), engineered log-free so the
    oracle comparison is exact: every emitted value is an exact integer or
    ONE double division of two exact integers (no float summation, no
    cross-engine `ln` ulp risk).

    Per document: n_tokens, n_oov (token instances outside the top-K
    vocab), sum_freq (sum of each instance's corpus frequency),
    oov_rate = n_oov/n_tokens, mean_token_freq = sum_freq/n_tokens.

    Scale shape: one explode + token-keyed aggregate builds the frequency
    relation (vocab-sized output); the top-K vocab is TakeOrdered (never a
    single-partition window) and broadcasts back as a membership
    annotation; the exploded instances join the frequency relation
    token-partitioned (the BPE-stats shuffle) and roll up doc-keyed."""
    docs = _docs(spark, sf_dir)
    ex = docs.select("doc_id", "lang", F.explode(_toks()).alias("token"))
    freq = ex.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    vocab = (
        freq.orderBy(F.col("freq").desc(), F.col("token").asc())
        .limit(RARITY_VOCAB_K)
        .select("token", F.lit(1).alias("in_vocab"))
    )
    annotated = ex.join(freq.hint("shuffle_hash"), "token").join(
        F.broadcast(vocab), "token", "left"
    )
    per_doc = annotated.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias("n_oov"),
        F.sum("freq").alias("sum_freq"),
    )
    return per_doc.select(
        "doc_id", "lang", "n_tokens", "n_oov", "sum_freq",
        (F.col("n_oov").cast("double") / F.col("n_tokens").cast("double")).alias(
            "oov_rate"
        ),
        (F.col("sum_freq").cast("double") / F.col("n_tokens").cast("double")).alias(
            "mean_token_freq"
        ),
    ).orderBy("doc_id")


_ORACLE_RARITY = f"""
WITH ex AS (SELECT doc_id, lang, unnest({_TOKS_SQL}) AS token FROM documents),
freq AS (SELECT token, count(*) AS freq FROM ex GROUP BY token),
vocab AS (SELECT token FROM freq ORDER BY freq DESC, token ASC
          LIMIT {RARITY_VOCAB_K}),
per_doc AS (
  SELECT e.doc_id, e.lang,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_oov,
         CAST(sum(f.freq) AS BIGINT) AS sum_freq
  FROM ex e
  JOIN freq f USING (token)
  LEFT JOIN vocab v ON v.token = e.token
  GROUP BY 1, 2
)
SELECT doc_id, lang, n_tokens, n_oov, sum_freq,
       CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS oov_rate,
       CAST(sum_freq AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS mean_token_freq
FROM per_doc
ORDER BY doc_id
"""


# --- tokenizer APPLY: BPE merge table -> token-id arrays -----------------
#
# Completes the stats -> train handoff: corpus_bpe_pair_stats produces the
# merge-candidate statistic (one BPE training iteration); this operator
# APPLIES the resulting merge table to the corpus, producing per-document
# token-id sequences + counts (the input of corpus_pack_sequences).
# Semantics (Sennrich et al. 2016, one merge generation, greedy apply):
# scan the normalized text left-to-right; if the adjacent char pair at the
# cursor is in the merge table emit that pair's token id and advance 2,
# else emit the character's id and advance 1.
#
# Token-id space (deterministic, corpus-derived):
#   rank 1..20   = merged pair, rank in the top-20 pair table
#                  (count desc, pair asc — corpus_bpe_pair_stats order)
#   1000 + cp    = single character with codepoint cp (UNK-free base vocab,
#                  the byte/char fallback of byte-level BPE)
#
# Scale shape: the merge table is vocabulary-sized (a production tokenizer
# is ~10^4-10^5 merges), so it collects to the driver once and ships to
# executors inside the UDF closure — the standard tokenizer-apply pattern.
# The apply itself is mapper-only (zero shuffles): an Arrow-batched pandas
# UDF, O(len) per document via numpy (codepoint vectors, searchsorted
# membership, and a vectorized greedy-start rule: position i starts a merge
# iff its pair is in the table AND the maximal run of consecutive
# mergeable positions immediately before i has even length — exactly the
# left-to-right greedy recurrence start(i) = m(i) AND NOT start(i-1),
# computed without a sequential scan). Python-side work is one numpy pass
# per doc instead of an interpreted per-char loop.

BPE_MERGE_K = 20  # == the top-20 table corpus_bpe_pair_stats emits
_CHAR_ID_BASE = 1000  # merge ranks (1..K) and char ids never collide


def _bpe_merge_table(spark: SparkSession, sf_dir: str) -> list[tuple[str, int]]:
    """(pair, rank) merge table: rank = 1-based position in the pair-stats
    ordering (count desc, pair asc). Deterministic, so the driver-side
    collect is reproducible and the oracle derives the identical table."""
    rows = corpus_bpe_pair_stats(spark, sf_dir).collect()
    return [(r["pair"], i + 1) for i, r in enumerate(rows)]


def corpus_tokenize_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the corpus-derived BPE merge table: per document, the greedy
    token-id sequence (serialized as a '-'-joined csv so every column is
    driver-hashable), total id count, and merged-pair count."""
    merges = _bpe_merge_table(spark, sf_dir)
    # Pair membership as sorted int64 keys: pair (c0, c1) -> c0*2^21 + c1
    # (codepoints < 2^21, so the packing is collision-free).
    mkeys = np.array(
        sorted(
            (ord(p[0]) << 21) | ord(p[1])
            for p, _ in merges
        ),
        dtype=np.int64,
    )
    rank_of = {(ord(p[0]) << 21) | ord(p[1]): r for p, r in merges}
    mranks = np.array([rank_of[k] for k in mkeys.tolist()], dtype=np.int64)

    @F.pandas_udf("n_ids bigint, n_merged bigint, ids_csv string")
    def tokenize(nt: pd.Series) -> pd.DataFrame:
        out_n, out_m, out_csv = [], [], []
        for s in nt:
            # NULL text propagates as None through the regexp_replace
            # projection; treat it as empty (the oracle's NULL row would
            # produce NULL stats, but the corpus has no NULL text — this
            # guard keeps a stray NULL from crashing the whole Arrow batch).
            if s is None:
                out_n.append(0); out_m.append(0); out_csv.append("")
                continue
            codes = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int64)
            n = len(codes)
            if n == 0:
                out_n.append(0); out_m.append(0); out_csv.append("")
                continue
            pk = (codes[:-1] << 21) | codes[1:]
            if len(mkeys):
                ix = np.clip(np.searchsorted(mkeys, pk), 0, len(mkeys) - 1)
                m = mkeys[ix] == pk
                rank_pos = mranks[ix]
            else:
                m = np.zeros(n - 1, dtype=bool)
                rank_pos = np.zeros(n - 1, dtype=np.int64)
            # greedy-start: trailing run of mergeable positions before i
            # has even length (lz = last non-mergeable index strictly
            # before i, -1 if none)
            pos = np.arange(n - 1, dtype=np.int64)
            zpos = np.where(m, np.int64(-1), pos)
            lz = np.concatenate(
                ([np.int64(-1)], np.maximum.accumulate(zpos)[:-1])
            )
            start = m & (((pos - lz - 1) % 2) == 0)
            start_full = np.concatenate((start, [False]))
            consumed = np.concatenate(([False], start))
            keep = start_full | ~consumed
            ids = np.where(
                start_full,
                np.concatenate((rank_pos, [np.int64(0)])),
                _CHAR_ID_BASE + codes,
            )[keep]
            out_n.append(len(ids))
            out_m.append(int(start.sum()))
            out_csv.append("-".join(map(str, ids.tolist())))
        return pd.DataFrame(
            {"n_ids": out_n, "n_merged": out_m, "ids_csv": out_csv}
        )

    docs = _docs(spark, sf_dir)
    normed = docs.select(
        "doc_id",
        F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ").alias("nt"),
    )
    tok = tokenize(F.col("nt"))
    return normed.select(
        "doc_id",
        F.length("nt").cast("bigint").alias("n_chars"),
        tok["n_ids"].alias("n_ids"),
        tok["n_merged"].alias("n_merged"),
        tok["ids_csv"].alias("ids_csv"),
    ).orderBy("doc_id")


# Oracle: the identical greedy scan as a per-doc recursive cursor — one
# recursion level per emitted token, all documents advancing in lockstep,
# so total work is O(total chars).
_ORACLE_TOKENIZE = """
WITH RECURSIVE norm AS (
  SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS nt
  FROM documents
),
prs AS (
  SELECT unnest([substr(nt, i, 2) for i in range(1, greatest(len(nt), 1))])
           AS pair
  FROM norm
),
merges AS (
  SELECT pair,
         CAST(row_number() OVER (ORDER BY n_occurrences DESC, pair) AS BIGINT)
           AS rank
  FROM (
    SELECT pair, count(*) AS n_occurrences
    FROM prs GROUP BY pair
    ORDER BY n_occurrences DESC, pair
    LIMIT 20
  )
),
step AS (
  SELECT doc_id, nt, CAST(1 AS BIGINT) AS pos,
         CAST('' AS VARCHAR) AS ids,
         CAST(0 AS BIGINT) AS n_ids, CAST(0 AS BIGINT) AS n_merged
  FROM norm
  UNION ALL
  SELECT s.doc_id, s.nt,
         s.pos + CASE WHEN m.rank IS NOT NULL THEN 2 ELSE 1 END,
         s.ids || CASE WHEN s.n_ids = 0 THEN '' ELSE '-' END ||
           CAST(COALESCE(m.rank,
                         1000 + unicode(substr(s.nt, s.pos, 1))) AS VARCHAR),
         s.n_ids + 1,
         s.n_merged + CASE WHEN m.rank IS NOT NULL THEN 1 ELSE 0 END
  FROM step s
  LEFT JOIN merges m
    ON s.pos + 1 <= len(s.nt) AND m.pair = substr(s.nt, s.pos, 2)
  WHERE s.pos <= len(s.nt)
)
SELECT doc_id, CAST(len(nt) AS BIGINT) AS n_chars, n_ids, n_merged,
       ids AS ids_csv
FROM step
WHERE pos > len(nt)
ORDER BY doc_id
"""


# --- tokenizer TRAINING LOOP: multi-generation BPE ------------------------
#
# corpus_bpe_pair_stats is ONE training iteration's statistic; this is the
# LOOP (Sennrich et al. 2016): per generation, count adjacent symbol pairs
# over the current segmentation, merge the globally most frequent pair
# everywhere, repeat. Completes the tokenizer lineage: pair stats -> train
# (merge table) -> apply (corpus_tokenize_ids) -> pack
# (corpus_pack_sequences).
#
# The trick that keeps BOTH engines exact and recursion-free: the per-doc
# segmentation is encoded as a STRING of individually wrapped symbols,
#     \x1f sym \x1f  \x1f sym \x1f  ...
# so applying merge (l, r) is exactly
#     replace(st, '\x1f l \x1f\x1f r \x1f', '\x1f l r \x1f')
# — leftmost non-overlapping sequential replace IS the greedy BPE merge
# (each match consumes two whole wrapped symbols; per-symbol wrapping
# means a match never steals the boundary an adjacent match needs, unlike
# single-separator encodings), and Spark's replace() and DuckDB's
# replace() share those semantics. Every generation is therefore pure
# whole-stage-codegen string work; the top-1 pair is a vocabulary-sized
# aggregate joined back as a 1-row broadcast — no driver collect, no UDF,
# no recursive CTE. Per-generation cost: one corpus pass + one
# vocabulary-sized shuffle — the published distributed-BPE cost model.

BPE_TRAIN_GENERATIONS = 4
_BPE_SEP = "\x1f"


def _bpe_wrapped_syms(col: str = "st"):
    """Wrapped-symbol string -> array of symbols (seps stripped).

    A wrapped stream is ``\\x1f s1 \\x1f\\x1f s2 \\x1f ... \\x1f sN \\x1f``:
    only the FIRST and LAST characters are single separators — every
    interior boundary is the double separator. Stripping the outer two
    chars once and splitting on the double separator therefore yields the
    symbols directly, replacing the old per-symbol regexp_replace (a regex
    pass over every symbol of every document per training generation) with
    one substring + split (r19, guide §1.2 step 2). Identical output:
    symbols never contain the separator (reserved in the normalizer)."""
    sep2 = _BPE_SEP + _BPE_SEP
    c = F.col(col)
    return F.split(c.substr(F.lit(2), F.length(c) - 2), sep2)


def _bpe_train_loop(spark: SparkSession, docs: DataFrame):
    """The shared N-generation BPE merge loop (train AND apply consume it):
    returns ``(states, tops)`` where ``states[g]`` is the wrapped-symbol
    segmentation after g merges (``states[0]`` = char level) and
    ``tops[g-1]`` is generation g's 1-row top-1 pair (l, r,
    n_pair_occurrences). ``corpus_tokenize_trained`` tokenizes from
    ``states[-1]`` + the ``tops`` merge table, so the table the apply step
    consumes is BY CONSTRUCTION byte-identical to the one
    ``corpus_bpe_train`` reports — the train->apply handoff is shared code,
    not two parallel derivations."""
    from opencode_hive_archon_spark.session import (
        materialize_iter as _materialize_iter,
    )

    nt = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    nt = F.regexp_replace(nt, _BPE_SEP, "")  # defensive: reserve the sep
    st0 = F.regexp_replace(nt, "(.)", _BPE_SEP + "$1" + _BPE_SEP)
    # materialize_iter (lineage TRUNCATION): each generation re-derives the
    # state from the previous one, so keeping lineage would embed every
    # prior generation's plan in the next — plan size (and codegen time)
    # grows multiplicatively with generations. Truncation keeps each
    # generation's plan generation-sized; production runs thousands of
    # merge generations.
    state = _materialize_iter(docs.select("doc_id", st0.alias("st")))
    states = [state]
    tops = []
    for _g in range(1, BPE_TRAIN_GENERATIONS + 1):
        syms = _bpe_wrapped_syms()
        pairs = (
            state.select(
                F.explode(
                    F.zip_with(
                        F.slice(syms, 1, F.size(syms) - 1),
                        F.slice(syms, 2, F.size(syms) - 1),
                        lambda l, r: F.struct(l.alias("l"), r.alias("r")),
                    )
                ).alias("p")
            )
            .select("p.l", "p.r")
        )
        # Materialize the 1-row top-1 eagerly: it is referenced again by
        # corpus_bpe_train's per-generation output row and by
        # corpus_tokenize_trained's merge table, and each lazy reference
        # re-ran the full corpus pairs pass (explode + vocab aggregate).
        # As a leaf, that pass runs exactly ONCE per generation
        # (guide §1.2 step 1: don't repeat passes). The top-1 is unique by
        # construction (deterministic (count desc, l, r) tiebreak), so
        # materialization cannot change any downstream result.
        top1 = _materialize_iter(
            pairs.groupBy("l", "r")
            .agg(F.count(F.lit(1)).alias("n_pair_occurrences"))
            .orderBy(F.desc("n_pair_occurrences"), "l", "r")
            .limit(1)
        )
        state = _materialize_iter(
            state.crossJoin(F.broadcast(top1)).select(
                "doc_id",
                F.expr(
                    "replace(st, concat('\x1f', l, '\x1f\x1f', r, '\x1f'),"
                    " concat('\x1f', l, r, '\x1f'))"
                ).alias("st"),
            )
        )
        states.append(state)
        tops.append(top1)
    return states, tops


def corpus_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-generation BPE training loop; emits one row per generation: the
    merged pair, its pre-merge adjacent-pair count, how many merges were
    applied (< count when occurrences overlap, e.g. 'aaa'), and the
    corpus-wide symbol total after the merge."""
    from opencode_hive_archon_spark.session import (
        materialize_iter as _materialize_iter,
    )

    states, tops = _bpe_train_loop(spark, _docs(spark, sf_dir))
    # ONE 1-row stats scan per state, shared between generation g's
    # "after" and generation g+1's "before" (the lazy per-generation
    # before/after aggs each re-scanned the same state twice — guide §1.2
    # step 1). sum(length) is order-insensitive, so sharing the scan
    # cannot change the numbers.
    stats = [
        _materialize_iter(
            st.agg(
                F.sum(F.length("st")).alias("chars"),
                F.sum(
                    F.length("st")
                    - F.length(F.regexp_replace("st", _BPE_SEP, ""))
                ).alias("sep_chars"),
            )
        )
        for st in states
    ]
    gen_rows = []
    for g in range(1, BPE_TRAIN_GENERATIONS + 1):
        before = stats[g - 1].select(F.col("chars").alias("chars_before"))
        after = stats[g].select(
            F.col("chars").alias("chars_after"),
            F.col("sep_chars").alias("sep_chars_after"),
        )
        gen_rows.append(
            tops[g - 1].crossJoin(F.broadcast(before))
            .crossJoin(F.broadcast(after))
            .select(
                F.lit(g).cast("long").alias("generation"),
                F.col("l").alias("left_sym"),
                F.col("r").alias("right_sym"),
                "n_pair_occurrences",
                F.expr("(chars_before - chars_after) div 2").alias("n_merges"),
                F.expr("sep_chars_after div 2").alias("total_symbols_after"),
            )
        )
    out = gen_rows[0]
    for df in gen_rows[1:]:
        out = out.unionByName(df)
    return out.orderBy("generation")


def corpus_tokenize_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLY over the TRAINED multi-generation merge table — the
    round-10 gap closer: ``corpus_tokenize_ids`` applies the ONE-generation
    top-20 pair table, while the trained tokenizer's later merges operate
    on merged symbols. This operator consumes ``corpus_bpe_train``'s
    4-generation merge sequence (same shared loop — the table is
    byte-identical by construction, pinned by
    tests/test_round11_ops.py::test_tokenize_trained_reproduces_train_merges)
    and emits each document's final token stream:

        id of a merged symbol   = the generation that created it (1..N,
                                  min on the impossible-collision case)
        id of a single char     = 1000 + codepoint (byte/char fallback)

    Scale shape: generation g's replace operates on generation g-1's
    symbol stream (the iterated-apply semantics), all whole-stage-codegen
    string work; the id mapping is ONE N-row map broadcast into an array
    expression — zero shuffles after the final training pass, and the
    per-doc output needs no explode/groupBy round trip."""
    docs = _docs(spark, sf_dir)
    states, tops = _bpe_train_loop(spark, docs)
    mtab = None
    for g, top in enumerate(tops, start=1):
        row = top.select(
            F.concat("l", "r").alias("sym"), F.lit(g).cast("long").alias("gid")
        )
        mtab = row if mtab is None else mtab.unionByName(row)
    mmap = mtab.groupBy("sym").agg(F.min("gid").alias("gid")).agg(
        F.map_from_entries(F.collect_list(F.struct("sym", "gid"))).alias("m")
    )
    syms = F.filter(_bpe_wrapped_syms(), lambda s: F.length(s) > 0)
    ids = F.transform(
        F.col("syms"),
        lambda s: F.when(
            F.length(s) == 1,
            F.lit(_CHAR_ID_BASE).cast("long") + F.ascii(s).cast("long"),
        ).otherwise(F.element_at(F.col("m"), s)),
    )
    return (
        states[-1]
        .crossJoin(F.broadcast(mmap))
        .select("doc_id", syms.alias("syms"), "m")
        .select(
            "doc_id",
            F.size("syms").cast("long").alias("n_symbols"),
            F.size(F.filter("syms", lambda s: F.length(s) > 1))
            .cast("long")
            .alias("n_merged"),
            F.array_join(
                F.transform(ids, lambda i: i.cast("string")), "-"
            ).alias("ids_csv"),
        )
        .orderBy("doc_id")
    )


_BPE_SEP_SQL = "chr(31)"


def _bpe_chain_parts() -> list[str]:
    """The g0 -> g{N} generation-chained CTE parts (same wrapped-string
    replace per generation) SHARED by the train and trained-apply oracles,
    built programmatically so Spark and SQL stay in lockstep."""
    sep = _BPE_SEP_SQL
    parts = [f"""g0 AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'),
             {sep}, '', 'g'),
           '(.)', {sep} || '\\1' || {sep}, 'g') AS st
  FROM documents
)"""]
    for g in range(1, BPE_TRAIN_GENERATIONS + 1):
        p = g - 1
        parts.append(f"""g{g}_syms AS (
  SELECT doc_id,
         [regexp_replace(x, {sep}, '', 'g')
          for x in string_split(st, {sep} || {sep})] AS syms
  FROM g{p}
)""")
        parts.append(f"""g{g}_pairs AS (
  SELECT unnest(syms[1:len(syms) - 1]) AS l,
         unnest(syms[2:len(syms)]) AS r
  FROM g{g}_syms
)""")
        parts.append(f"""g{g}_top AS (
  SELECT l, r, count(*) AS n_pair_occurrences
  FROM g{g}_pairs GROUP BY 1, 2
  ORDER BY n_pair_occurrences DESC, l, r LIMIT 1
)""")
        parts.append(f"""g{g} AS (
  SELECT doc_id,
         replace(st, {sep} || l || {sep} || {sep} || r || {sep},
                 {sep} || l || r || {sep}) AS st
  FROM g{p}, g{g}_top
)""")
    return parts


def _bpe_oracle_sql() -> str:
    """Train oracle: shared chain + per-generation merge statistics."""
    sep = _BPE_SEP_SQL
    parts = _bpe_chain_parts()
    stats = []
    for g in range(1, BPE_TRAIN_GENERATIONS + 1):
        p = g - 1
        parts.append(f"""g{g}_stats AS (
  SELECT CAST({g} AS BIGINT) AS generation,
         t.l AS left_sym, t.r AS right_sym, t.n_pair_occurrences,
         (CAST(b.s AS BIGINT) - CAST(a.s AS BIGINT)) // 2 AS n_merges,
         CAST(a.sep_chars AS BIGINT) // 2 AS total_symbols_after
  FROM g{g}_top t,
       (SELECT sum(len(st)) AS s FROM g{p}) b,
       (SELECT sum(len(st)) AS s,
               sum(len(st) - len(replace(st, {sep}, ''))) AS sep_chars
        FROM g{g}) a
)""")
        stats.append(f"SELECT * FROM g{g}_stats")
    return (
        "WITH " + ",\n".join(parts) + "\n"
        + "\nUNION ALL\n".join(stats)
        + "\nORDER BY generation"
    )


_ORACLE_BPE_TRAIN = _bpe_oracle_sql()


def _tokenize_trained_oracle_sql() -> str:
    """Trained-apply oracle: shared chain, then symbol-split of the final
    state, id mapping against the merge table (l||r -> generation), and
    per-doc aggregation (zero-symbol docs kept via LEFT JOIN)."""
    sep = _BPE_SEP_SQL
    n = BPE_TRAIN_GENERATIONS
    parts = _bpe_chain_parts()
    mrows = "\n    UNION ALL\n    ".join(
        f"SELECT l || r AS sym, CAST({g} AS BIGINT) AS gid FROM g{g}_top"
        for g in range(1, n + 1)
    )
    parts.append(f"""mtab AS (
  SELECT sym, min(gid) AS gid FROM (
    {mrows}
  ) GROUP BY sym
)""")
    parts.append(f"""fsyms AS (
  SELECT doc_id,
         list_filter(
           list_transform(string_split(st, {sep} || {sep}),
                          x -> regexp_replace(x, {sep}, '', 'g')),
           y -> y <> '') AS syms
  FROM g{n}
)""")
    parts.append("""fan AS (
  SELECT doc_id, i AS pos, syms[i] AS sym
  FROM fsyms, unnest(generate_series(1, len(syms))) AS t(i)
)""")
    parts.append("""ids AS (
  SELECT f.doc_id, f.pos, len(f.sym) > 1 AS merged,
         CAST(CASE WHEN len(f.sym) = 1 THEN 1000 + unicode(f.sym)
                   ELSE m.gid END AS BIGINT) AS id
  FROM fan f LEFT JOIN mtab m ON m.sym = f.sym
)""")
    parts.append("""agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_symbols,
         CAST(sum(CASE WHEN merged THEN 1 ELSE 0 END) AS BIGINT) AS n_merged,
         string_agg(CAST(id AS VARCHAR), '-' ORDER BY pos) AS ids_csv
  FROM ids GROUP BY doc_id
)""")
    return (
        "WITH " + ",\n".join(parts) + f"""
SELECT d.doc_id,
       coalesce(a.n_symbols, 0) AS n_symbols,
       coalesce(a.n_merged, 0) AS n_merged,
       coalesce(a.ids_csv, '') AS ids_csv
FROM g{n} d LEFT JOIN agg a USING (doc_id)
ORDER BY d.doc_id
"""
    )


_ORACLE_TOKENIZE_TRAINED = _tokenize_trained_oracle_sql()


VOCAB_GROWTH_BUCKETS = 10


def corpus_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth curve (the Heaps-law diagnostic a corpus build
    tracks): partition the corpus into 10 ingest-order buckets by doc_id
    and report how many NEVER-SEEN-BEFORE tokens each bucket contributes,
    plus the running vocabulary size. A flattening curve says more data
    stops buying vocabulary — the signal that drives dedup/mixture
    decisions.

    Shape: one explode → token-keyed min(doc_id) aggregate (vocab-sized),
    bucket arithmetic against a 1-row broadcast corpus count, and a
    10-row running sum — nothing data-sized past the first aggregate."""
    docs = _docs(spark, sf_dir)
    toks = _toks()
    # unit = token TRIGRAMS: the synthetic unigram vocab (~31 tokens)
    # saturates in the first bucket; the trigram inventory keeps growing,
    # which is what the diagnostic is for (production corpora show the
    # same effect at the unigram level).
    grams = F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i),
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ex = docs.select("doc_id", F.explode(grams).alias("token"))
    first = ex.groupBy("token").agg(F.min("doc_id").alias("first_doc"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    B = VOCAB_GROWTH_BUCKETS
    bucketed = first.crossJoin(F.broadcast(n)).select(
        F.least(
            F.lit(B - 1),
            F.floor(F.col("first_doc") * B / F.col("n_docs")).cast("long"),
        ).alias("bucket")
    )
    per = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("new_tokens")
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per.select(
            "bucket",
            "new_tokens",
            F.sum("new_tokens").over(w).alias("cum_vocab"),
        )
        .orderBy("bucket")
    )


_ORACLE_VOCAB_GROWTH = f"""
WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
ex AS (
  SELECT doc_id,
         unnest([toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]
                 for i in range(1, greatest(len(toks) - 1, 1))]) AS token
  FROM t
),
first AS (SELECT token, min(doc_id) AS first_doc FROM ex GROUP BY token),
n AS (SELECT count(*) AS n_docs FROM documents),
bucketed AS (
  SELECT least({VOCAB_GROWTH_BUCKETS - 1},
               CAST(floor(first_doc * {VOCAB_GROWTH_BUCKETS} / n_docs)
                    AS BIGINT)) AS bucket
  FROM first, n
),
per AS (SELECT bucket, count(*) AS new_tokens FROM bucketed GROUP BY bucket)
SELECT bucket, new_tokens,
       CAST(sum(new_tokens) OVER (ORDER BY bucket
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_vocab
FROM per
ORDER BY bucket
"""


SPECS = [
    QuerySpec("corpus_vocab_growth", corpus_vocab_growth,
              _ORACLE_VOCAB_GROWTH, "text",
              "Heaps-law vocabulary-growth curve: new token-trigrams per "
              "ingest-order decile + running vocab — vocab-sized after "
              "one explode-aggregate"),
    QuerySpec("corpus_bpe_train", corpus_bpe_train, _ORACLE_BPE_TRAIN,
              "text",
              "multi-generation BPE TRAINING loop: per generation one "
              "corpus pass + one vocabulary-sized shuffle; greedy merge "
              "as wrapped-string replace — whole-stage codegen, no UDF, "
              "no driver collect"),
    QuerySpec("corpus_tokenize_ids", corpus_tokenize_ids, _ORACLE_TOKENIZE,
              "text",
              "tokenizer APPLY: greedy BPE merge-table application -> "
              "per-doc token-id sequences (mapper-only Arrow-batched "
              "numpy, vocabulary-sized driver collect)"),
    QuerySpec("corpus_tokenize_trained", corpus_tokenize_trained,
              _ORACLE_TOKENIZE_TRAINED, "text",
              "tokenizer train->apply handoff: corpus_bpe_train's "
              "4-generation merge table applied generation-by-generation "
              "(shared loop — the table is byte-identical by construction) "
              "-> per-doc trained token-id streams; id mapping is one "
              "N-row broadcast map, zero post-training shuffles"),
    QuerySpec("text_rarity_score", text_rarity_score, _ORACLE_RARITY, "text",
              "unigram-frequency document rarity/OOV scoring against a "
              "corpus-derived top-K vocabulary (log-free, integer-exact)"),
    QuerySpec("corpus_bpe_pair_stats", corpus_bpe_pair_stats, _ORACLE_BPE_PAIRS,
              "text",
              "BPE tokenizer-training iteration statistic: top-20 adjacent "
              "char-pair frequencies, vocabulary-sized shuffle"),
    QuerySpec("text_repetition_stats", text_repetition_stats, _ORACLE_REPETITION,
              "text",
              "Gopher-style repetition signals: distinct-token ratio + "
              "top-token dominance per lang"),
    QuerySpec("corpus_train_val_split", corpus_train_val_split, _ORACLE_TRAIN_VAL,
              "text",
              "deterministic multiplicative-hash train/val split with "
              "per-(split, lang) balance report"),
    QuerySpec("text_token_stats", text_token_stats, _ORACLE_TOKEN_STATS, "text",
              "global top-20 term frequencies"),
    QuerySpec("text_lang_profile", text_lang_profile, _ORACLE_LANG_PROFILE, "text",
              "per-lang corpus profile with exact percentiles"),
    QuerySpec("text_langid", text_langid, _ORACLE_LANGID, "text",
              "marker-token language ID confusion matrix"),
    QuerySpec("text_quality_score", text_quality_score, _ORACLE_QUALITY, "text",
              "per-doc quality-filter features"),
    QuerySpec("text_token_count", text_token_count, _ORACLE_TOKEN_COUNT, "text",
              "whitespace + regex token accounting"),
    QuerySpec("text_fingerprint", text_fingerprint, _ORACLE_FINGERPRINT, "text",
              "md5 fingerprint + shingle cardinalities"),
    QuerySpec("text_rolling_fingerprint", text_rolling_fingerprint, _ORACLE_ROLLING_FP,
              "text", "Karp-Rabin rolling-hash fingerprint (portable, oracle-exact)"),
    QuerySpec("multimodal_join", multimodal_join, _ORACLE_MULTIMODAL, "text",
              "text ⋈ vector multimodal relation"),
    QuerySpec("corpus_curation", corpus_curation, _ORACLE_CURATION, "text",
              "quality floor + langid gate + exact dedup → per-lang corpus report"),
    QuerySpec("corpus_domain_cap", corpus_domain_cap, _ORACLE_DOMAIN_CAP, "text",
              "per-source token-budget packing (domain caps for a data mix)"),
    QuerySpec("corpus_pretraining_pipeline", corpus_pretraining_pipeline,
              _ORACLE_PRETRAIN_PIPELINE, "text",
              "fused pre-training data job: curation → exact dedup → "
              "train/val split → per-(split, lang) report in one fused "
              "plan — zero shuffles added over curation (≤5 pinned "
              "exchanges total)"),
]
