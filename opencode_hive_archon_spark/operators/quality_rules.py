"""Rule-based corpus quality filtering + TF-IDF term profiling.

Two more first-class training-data-pipeline operators (SURVEY.md §2B
family 3; the reference's corpus intent is mvp.md:22's curated retrieval
corpus — these are the filter/profiling stages a 100 TB corpus build runs
before anything reaches a tokenizer):

- ``corpus_gopher_rules``: the Gopher-style (Rae et al. 2021, publicly
  documented) rule battery — word count bounds, mean-word-length band,
  symbol-to-word ratio, alphabetic-word fraction, minimum distinct
  stopwords — audited per language. Every rule enters MULTIPLIED OUT
  (3·words ≤ chars, punct·10 ≤ words, alpha·10 ≥ words·8 …) so the whole
  verdict is integer arithmetic: no float ever enters a predicate and the
  per-lang fail counts are exactly reproducible on any engine.
- ``corpus_tfidf_topterms``: per-language top-10 terms by tf·idf with
  idf = N/df as ONE double division of exact integers (the log-free idf,
  same discipline as text_rarity_score) — rank ties broken by term so the
  cut is deterministic.

Scale shape: both are explode → hash-aggregate pipelines. The rule audit
is a single projection + ONE lang-keyed shuffle (map-side partial agg
collapses each partition to |langs| rows). TF-IDF shuffles on (lang, term)
and term — vocabulary-sized, not corpus-sized — and the document-frequency
join is term-keyed so the two aggregates reuse one exchange under AQE; the
1-row corpus total broadcasts via crossJoin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from opencode_hive_archon_spark.operators.textops import (
    _STOPWORDS,
    _TOKS_SQL,
    _docs,
    _toks,
)
from opencode_hive_archon_spark.spec import QuerySpec

# Gopher-style thresholds (Rae et al. 2021 table A1 shape, bands adapted so
# the synthetic corpus exercises both branches of every rule).
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3  # mean word length in [3, 10] …
GOPHER_MAX_MEAN_WORD_LEN = 10  # … multiplied out against the char sum
GOPHER_MAX_SYMBOL_PER_10_WORDS = 1  # symbol-to-word ratio ≤ 0.1
GOPHER_MIN_ALPHA_PCT10 = 8  # ≥ 80% of words contain a letter
GOPHER_MIN_DISTINCT_STOPWORDS = 2


def corpus_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang audit of the five Gopher-style quality rules.

    Returns one row per lang: docs seen, docs failing each rule
    (independently — a doc can fail several), and docs passing ALL rules
    (the kept set). All counts integer-exact; the mean-word-length and
    ratio rules compare multiplied-out integers, never a float.
    """
    docs = _docs(spark, sf_dir)
    toks = _toks()
    n_toks = F.size(toks)
    # chars inside tokens = normalized length minus the (n-1) separators
    norm_len = F.length(
        F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    )
    tok_chars = norm_len - (n_toks - F.lit(1))
    alpha_toks = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    n_punct = F.length(F.col("text")) - F.length(
        F.regexp_replace(F.col("text"), r"[^\w\s]", "")
    )
    distinct_stops = F.size(
        F.array_intersect(
            F.array_distinct(toks), F.array(*[F.lit(s) for s in _STOPWORDS])
        )
    )

    fail_word_count = (n_toks < GOPHER_MIN_WORDS) | (n_toks > GOPHER_MAX_WORDS)
    fail_mean_word_len = (
        tok_chars < n_toks * GOPHER_MIN_MEAN_WORD_LEN
    ) | (tok_chars > n_toks * GOPHER_MAX_MEAN_WORD_LEN)
    fail_symbol_ratio = n_punct * 10 > n_toks * GOPHER_MAX_SYMBOL_PER_10_WORDS
    fail_alpha_fraction = alpha_toks * 10 < n_toks * GOPHER_MIN_ALPHA_PCT10
    fail_stopwords = distinct_stops < GOPHER_MIN_DISTINCT_STOPWORDS

    flags = docs.select(
        "lang",
        fail_word_count.alias("f_wc"),
        fail_mean_word_len.alias("f_mwl"),
        fail_symbol_ratio.alias("f_sym"),
        fail_alpha_fraction.alias("f_alpha"),
        fail_stopwords.alias("f_stop"),
    )
    cnt = lambda c: F.sum(F.col(c).cast("long")).alias(f"fail_{c[2:]}")  # noqa: E731
    return (
        flags.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            cnt("f_wc"),
            cnt("f_mwl"),
            cnt("f_sym"),
            cnt("f_alpha"),
            cnt("f_stop"),
            F.sum(
                (
                    ~(
                        F.col("f_wc")
                        | F.col("f_mwl")
                        | F.col("f_sym")
                        | F.col("f_alpha")
                        | F.col("f_stop")
                    )
                ).cast("long")
            ).alias("n_keep"),
        )
        .orderBy("lang")
    )


_STOPS_SQL = ", ".join(f"'{s}'" for s in _STOPWORDS)

_ORACLE_GOPHER = f"""
WITH feat AS (
  SELECT lang,
         len(toks) AS n_toks,
         length(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
           - (len(toks) - 1) AS tok_chars,
         len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS alpha_toks,
         length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))
           AS n_punct,
         len(list_intersect(list_distinct(toks), [{_STOPS_SQL}]))
           AS distinct_stops
  FROM (SELECT lang, text, {_TOKS_SQL} AS toks FROM documents)
),
flags AS (
  SELECT lang,
         (n_toks < {GOPHER_MIN_WORDS} OR n_toks > {GOPHER_MAX_WORDS}) AS f_wc,
         (tok_chars < n_toks * {GOPHER_MIN_MEAN_WORD_LEN}
          OR tok_chars > n_toks * {GOPHER_MAX_MEAN_WORD_LEN}) AS f_mwl,
         (n_punct * 10 > n_toks * {GOPHER_MAX_SYMBOL_PER_10_WORDS}) AS f_sym,
         (alpha_toks * 10 < n_toks * {GOPHER_MIN_ALPHA_PCT10}) AS f_alpha,
         (distinct_stops < {GOPHER_MIN_DISTINCT_STOPWORDS}) AS f_stop
  FROM feat
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(CAST(f_wc AS BIGINT)) AS BIGINT) AS fail_wc,
       CAST(sum(CAST(f_mwl AS BIGINT)) AS BIGINT) AS fail_mwl,
       CAST(sum(CAST(f_sym AS BIGINT)) AS BIGINT) AS fail_sym,
       CAST(sum(CAST(f_alpha AS BIGINT)) AS BIGINT) AS fail_alpha,
       CAST(sum(CAST(f_stop AS BIGINT)) AS BIGINT) AS fail_stop,
       CAST(sum(CAST(NOT (f_wc OR f_mwl OR f_sym OR f_alpha OR f_stop)
                     AS BIGINT)) AS BIGINT) AS n_keep
FROM flags GROUP BY lang ORDER BY lang
"""

TFIDF_TOPK = 10


def corpus_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang top-10 terms by tf·idf (idf = N/df, log-free).

    tf = term occurrences within the lang; df = corpus-wide distinct-doc
    frequency; score = CAST(tf·N AS DOUBLE)/df — the products are exact
    int64 (≤ 2⁵³, so the double cast is lossless) and the ONE division is
    the only float op, identical on both engines. row_number ties broken
    by term asc, so the top-10 cut is deterministic.

    tf and df are two different aggregates of the same exploded token
    stream, so a naive formulation scans + explodes the corpus TWICE. One
    map-side-combined pass instead collapses the stream to the per-doc
    term-count incidence table (term, doc_id, lang, c) — dedup-sized, not
    token-stream-sized — which is materialized and feeds BOTH aggregates:
    tf = Σc per (lang, term), df = row count per term (the incidence key
    is unique per (term, doc_id)), so df needs no countDistinct. At 100 TB
    this is the difference between one corpus read and two.
    """
    from opencode_hive_archon_spark.session import materialize as _materialize

    docs = _docs(spark, sf_dir)
    ex = docs.select("doc_id", "lang", F.explode(_toks()).alias("term"))
    incidence = _materialize(
        ex.groupBy("term", "doc_id", "lang").agg(F.count(F.lit(1)).alias("c"))
    )
    tf = incidence.groupBy("lang", "term").agg(F.sum("c").alias("tf"))
    dfreq = incidence.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    total = docs.agg(F.count(F.lit(1)).alias("n_corpus"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(total))
        .select(
            "lang",
            "term",
            "tf",
            "df",
            (
                (F.col("tf") * F.col("n_corpus")).cast("double") / F.col("df")
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("lang").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("term_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("term_rank") <= TFIDF_TOPK)
        .orderBy("lang", "term_rank")
    )


_ORACLE_TFIDF = f"""
WITH ex AS (
  SELECT doc_id, lang, unnest({_TOKS_SQL}) AS term FROM documents
),
tf AS (SELECT lang, term, count(*) AS tf FROM ex GROUP BY 1, 2),
dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM ex GROUP BY 1),
total AS (SELECT count(*) AS n_corpus FROM documents),
scored AS (
  SELECT lang, term, tf, df,
         CAST(tf * n_corpus AS DOUBLE) / df AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN total
),
ranked AS (
  SELECT lang, term, tf, df, tfidf,
         CAST(row_number() OVER (PARTITION BY lang
                                 ORDER BY tfidf DESC, term) AS BIGINT)
           AS term_rank
  FROM scored
)
SELECT lang, term, tf, df, tfidf, term_rank
FROM ranked WHERE term_rank <= {TFIDF_TOPK}
ORDER BY lang, term_rank
"""


BIGRAM_VOCAB_K = 32


def text_bigram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang bigram-LM fluency proxy: what fraction of each language's
    adjacent-token bigram instances fall inside the corpus-wide top-K
    bigram vocabulary. The contextual (order-sensitive) sibling of
    text_rarity_score's unigram OOV rate — repetitive or shuffled text
    scores high, token-salad scores low — and like it engineered log-free:
    counts are exact integers, the coverage ratio is ONE double division.

    Scale shape: adjacent pairs come from one index-sequence transform (no
    self-join); the corpus is exploded ONCE into a materialized per-doc
    bigram incidence table (bigram, lang, c) that feeds both the vocabulary
    aggregate and the scoring pass; the top-K vocab is TakeOrdered, never a
    single-partition window, and returns as a broadcast membership flag.
    """
    from opencode_hive_archon_spark.session import materialize as _materialize

    docs = _docs(spark, sf_dir)
    toks = _toks()
    bigrams = F.when(
        F.size(toks) > 1,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ex = docs.select(
        "doc_id", "lang", F.explode(bigrams).alias("bigram")
    )
    incidence = _materialize(
        ex.groupBy("bigram", "lang").agg(F.count(F.lit(1)).alias("c"))
    )
    vocab = (
        incidence.groupBy("bigram")
        .agg(F.sum("c").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("bigram").asc())
        .limit(BIGRAM_VOCAB_K)
        .select("bigram", F.lit(1).alias("in_vocab"))
    )
    per_lang = (
        incidence.join(F.broadcast(vocab), "bigram", "left")
        .groupBy("lang")
        .agg(
            F.sum("c").alias("total_bigrams"),
            F.sum(
                F.when(F.col("in_vocab").isNotNull(), F.col("c")).otherwise(0)
            ).alias("covered_bigrams"),
        )
    )
    return per_lang.select(
        "lang",
        "total_bigrams",
        "covered_bigrams",
        (
            F.col("covered_bigrams").cast("double")
            / F.col("total_bigrams").cast("double")
        ).alias("coverage_ratio"),
    ).orderBy("lang")


_ORACLE_BIGRAMS = f"""
WITH base AS (SELECT doc_id, lang, {_TOKS_SQL} AS toks FROM documents),
ex AS (
  SELECT doc_id, lang,
         unnest(CASE WHEN len(toks) > 1
                THEN list_transform(range(1, len(toks)),
                                    i -> toks[i] || ' ' || toks[i + 1])
                ELSE [] END) AS bigram
  FROM base
),
incidence AS (
  SELECT bigram, lang, count(*) AS c FROM ex GROUP BY 1, 2
),
vocab AS (
  SELECT bigram FROM incidence GROUP BY bigram
  ORDER BY sum(c) DESC, bigram ASC LIMIT {BIGRAM_VOCAB_K}
),
per_lang AS (
  SELECT i.lang,
         CAST(sum(i.c) AS BIGINT) AS total_bigrams,
         CAST(sum(CASE WHEN v.bigram IS NOT NULL THEN i.c ELSE 0 END)
              AS BIGINT) AS covered_bigrams
  FROM incidence i LEFT JOIN vocab v ON v.bigram = i.bigram
  GROUP BY 1
)
SELECT lang, total_bigrams, covered_bigrams,
       CAST(covered_bigrams AS DOUBLE) / CAST(total_bigrams AS DOUBLE)
         AS coverage_ratio
FROM per_lang ORDER BY lang
"""


SPECS = [
    QuerySpec(
        "corpus_gopher_rules",
        corpus_gopher_rules,
        _ORACLE_GOPHER,
        "text",
        "Gopher-style rule-battery audit per lang: multiplied-out integer "
        "rules (word count, mean word length, symbol ratio, alpha fraction, "
        "stopwords), per-rule fail counts + kept docs",
    ),
    QuerySpec(
        "corpus_tfidf_topterms",
        corpus_tfidf_topterms,
        _ORACLE_TFIDF,
        "text",
        "per-lang top-10 terms by log-free tf·idf (idf = N/df, one double "
        "division of exact integers; deterministic tie-break)",
    ),
    QuerySpec(
        "text_bigram_coverage",
        text_bigram_coverage,
        _ORACLE_BIGRAMS,
        "text",
        "per-lang bigram-vocabulary coverage (order-sensitive fluency "
        "proxy; integer counts + one double division)",
    ),
]
