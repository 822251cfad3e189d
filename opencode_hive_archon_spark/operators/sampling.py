"""Corpus sampling, sequence packing, and heavy-hitter detection.

Three operations a pre-training data pipeline runs between curation and
tokenization, each designed for the 100 TB posture first:

``corpus_stratified_sample``
    Deterministic per-language downsampling to hit a target data mixture
    (the "data mix" step of corpus assembly). Membership is a pure per-row
    predicate on md5(doc_id) — no RNG, no sampling state, no shuffle — so
    the sample is reproducible across runs/engines/partitionings and
    composes with any later filter via predicate pushdown.

``corpus_pack_sequences``
    Greedy concat-then-chunk sequence packing: documents are concatenated
    in deterministic order and cut into fixed-size budget bins (the step
    that turns a document corpus into fixed-length training sequences).
    Packing is sharded — each (lang, shard) packs independently — so the
    only shuffle is a hash exchange on the shard key and parallelism scales
    with the shard count, never capped at one reducer per language.

``agg_heavy_hitters``
    φ-heavy hitters (all keys with frequency > φ·N) via per-partition
    Misra-Gries summaries + a candidates-only exact verify pass. The
    shuffle carries at most K·partitions candidate rows instead of one row
    per distinct key — the difference between a bounded exchange and a
    full-cardinality shuffle when the key space has billions of values.

Reference parity: the reference engine has no corpus tooling (its pipeline
is retrieval-only, backend/src/second_brain/agents/recall.py:1-276); these
operators extend the engine with the LLM-data-pipeline surface required by
BASELINE.json's north star, following the same SPECS/oracle conventions as
operators/textops.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opencode_hive_archon_spark.functions.hashing import (
    md5_prefix_long,
    md5_prefix_long_sql,
)
from opencode_hive_archon_spark.session import read_table as _t
from opencode_hive_archon_spark.spec import QuerySpec

# --- stratified sampling ----------------------------------------------------

# Target mixture: the driver corpus is ~43% English; downsampling en to 40%
# keep-rate yields a roughly balanced five-language mix. Unlisted languages
# default to keep-all (rate 1.0).
SAMPLE_RATES = {"en": 0.40, "de": 1.0, "es": 1.0, "fr": 1.0, "zh": 1.0}

# Membership: md5(doc_id || ':strata') first 6 hex chars is uniform on
# [0, 2^24); keep iff value < rate * 2^24. Comparing against an integer
# threshold over the full power-of-two range avoids modulo bias entirely
# (every residue is exactly equally likely). The ':strata' salt decorrelates
# sample membership from the train/val split hash (textops.SPLIT_*), so
# sampling does not systematically favor either split.
SAMPLE_HASH_HEX = 6
_SAMPLE_SPACE = 1 << (4 * SAMPLE_HASH_HEX)
SAMPLE_THRESHOLDS = {
    lang: int(rate * _SAMPLE_SPACE) for lang, rate in SAMPLE_RATES.items()
}


def _sample_keep_col() -> F.Column:
    h = md5_prefix_long(
        F.concat(F.col("doc_id").cast("string"), F.lit(":strata")),
        SAMPLE_HASH_HEX,
    )
    thr = F.lit(_SAMPLE_SPACE)  # default: keep all
    for lang, t in SAMPLE_THRESHOLDS.items():
        thr = F.when(F.col("lang") == lang, F.lit(t)).otherwise(thr)
    return h < thr


def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample toward the target language mixture.

    One conditional-aggregation scan reports, per language, the population
    vs sampled counts and character mass plus the achieved rate — the
    balance check run after every mixture change. Selecting the sampled
    rows themselves is the same ``_sample_keep_col()`` predicate used as a
    filter, which Catalyst pushes into the scan; at 100 TB the sample
    never materializes the rejected rows.
    """
    docs = _t(spark, sf_dir, "documents")
    kept = _sample_keep_col().cast("long")
    return (
        docs.select("lang", "n_chars", kept.alias("kept"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("kept").alias("n_kept"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(F.col("n_chars") * F.col("kept")).alias("kept_chars"),
            (F.sum("kept") / F.count(F.lit(1))).alias("achieved_rate"),
        )
        .orderBy("lang")
    )


def _sample_keep_sql() -> str:
    h = md5_prefix_long_sql(
        "(CAST(doc_id AS VARCHAR) || ':strata')", SAMPLE_HASH_HEX
    )
    cases = " ".join(
        f"WHEN '{lang}' THEN {t}" for lang, t in SAMPLE_THRESHOLDS.items()
    )
    return f"({h} < CASE lang {cases} ELSE {_SAMPLE_SPACE} END)"


_ORACLE_STRATIFIED = f"""
WITH flagged AS (
  SELECT lang, n_chars,
         CASE WHEN {_sample_keep_sql()} THEN 1 ELSE 0 END AS kept
  FROM documents
)
SELECT lang,
       count(*) AS n_total,
       CAST(sum(kept) AS BIGINT) AS n_kept,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(n_chars * kept) AS BIGINT) AS kept_chars,
       CAST(sum(kept) AS DOUBLE) / count(*) AS achieved_rate
FROM flagged
GROUP BY lang
ORDER BY lang
"""


# --- sequence packing -------------------------------------------------------

# Character budget per packed training sequence (stand-in for a token
# budget; documents carry n_chars natively so the oracle stays exact).
PACK_BUDGET = 4096
# Packing shards per language. Each (lang, shard) packs its documents
# independently in doc_id order, so packing parallelism is shards ×
# languages — tune shards to the cluster, not to the data. Shard
# assignment is the same md5 device as sampling (salt ':pack').
PACK_SHARDS = 8


def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy concat-then-chunk sequence packing, sharded for scale.

    Within each (lang, shard), documents are concatenated in doc_id order
    and cut at PACK_BUDGET-char boundaries; a document belongs to the bin
    where it STARTS (bins may overflow by at most one document — the
    overflow tail is what a tokenizer truncates or carries). bin =
    (running_total_before_doc) div PACK_BUDGET, a pure window expression.

    Plan: ONE hash exchange on (lang, shard) feeds the running-sum window,
    and the per-language report is a partial-aggregated rollup on top —
    no global sort, no per-language single reducer. At 100 TB, raise
    PACK_SHARDS; semantics are unchanged because shard membership is a
    deterministic per-row hash.
    """
    docs = _t(spark, sf_dir, "documents")
    shard = F.pmod(
        md5_prefix_long(
            F.concat(F.col("doc_id").cast("string"), F.lit(":pack")),
            SAMPLE_HASH_HEX,
        ),
        F.lit(PACK_SHARDS),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = (
        docs.select("lang", "doc_id", "n_chars", shard.alias("shard"))
        .withColumn("cum_chars", F.sum("n_chars").over(w))
        .withColumn(
            "bin", F.expr(f"(cum_chars - n_chars) div {PACK_BUDGET}")
        )
    )
    per_bin = packed.groupBy("lang", "shard", "bin").agg(
        F.count(F.lit(1)).alias("bin_docs"),
        F.sum("n_chars").alias("bin_chars"),
    )
    return (
        per_bin.groupBy("lang")
        .agg(
            F.sum("bin_docs").alias("n_docs"),
            F.count(F.lit(1)).alias("n_bins"),
            F.sum("bin_chars").alias("total_chars"),
            (
                F.sum("bin_chars")
                / (F.count(F.lit(1)) * F.lit(float(PACK_BUDGET)))
            ).alias("avg_fill"),
            F.max("bin_chars").alias("max_bin_chars"),
            F.sum(
                (F.col("bin_chars") > PACK_BUDGET).cast("long")
            ).alias("n_overflow_bins"),
        )
        .orderBy("lang")
    )


_ORACLE_PACK = f"""
WITH sharded AS (
  SELECT lang, doc_id, n_chars,
         {md5_prefix_long_sql("(CAST(doc_id AS VARCHAR) || ':pack')", SAMPLE_HASH_HEX)}
           % {PACK_SHARDS} AS shard
  FROM documents
),
packed AS (
  SELECT lang, shard, n_chars,
         (sum(n_chars) OVER (PARTITION BY lang, shard ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_chars)
           // {PACK_BUDGET} AS bin
  FROM sharded
),
per_bin AS (
  SELECT lang, shard, bin,
         count(*) AS bin_docs, sum(n_chars) AS bin_chars
  FROM packed GROUP BY lang, shard, bin
)
SELECT lang,
       CAST(sum(bin_docs) AS BIGINT) AS n_docs,
       count(*) AS n_bins,
       CAST(sum(bin_chars) AS BIGINT) AS total_chars,
       CAST(sum(bin_chars) AS DOUBLE) / (count(*) * {PACK_BUDGET}.0) AS avg_fill,
       CAST(max(bin_chars) AS BIGINT) AS max_bin_chars,
       CAST(sum(CASE WHEN bin_chars > {PACK_BUDGET} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_overflow_bins
FROM per_bin
GROUP BY lang
ORDER BY lang
"""


# --- φ-heavy hitters (Misra-Gries candidates + exact verify) ----------------

# Counters per partition summary. The merged-summary guarantee (Agarwal et
# al., "Mergeable Summaries", PODS 2012): a key's estimated count after
# merging per-partition Misra-Gries summaries undercounts its true
# frequency by at most N/(K+1), so every key with true frequency
# > N/(K+1) survives as a candidate. With φ = 1% and K = 512,
# N/(K+1) ≈ 0.195%·N — a 5× safety margin below the reporting threshold,
# independent of scale. False positives are eliminated by the exact verify
# pass; false negatives are impossible for keys above φ·N.
HH_COUNTERS = 512
HH_PHI = 0.01  # report keys holding > 1% of all events


def _hot_key_col() -> F.Column:
    """Synthetic skew injection: the driver's events table is uniform over
    user_id (no natural heavy hitter at any scale), so the demo key folds
    70% of users onto 3 hot values while leaving a long uniform tail.
    Real pipelines pass the natural key (domain, token, user) here."""
    return (
        F.when(F.pmod("user_id", F.lit(10)) < 7, F.pmod("user_id", F.lit(3)))
        .otherwise(F.col("user_id"))
        .cast("long")
    )


_HOT_KEY_SQL = (
    "CAST(CASE WHEN user_id % 10 < 7 THEN user_id % 3 ELSE user_id END AS BIGINT)"
)


def mg_reduce(counts: dict, batch_counts: dict, k: int = HH_COUNTERS) -> dict:
    """One batched Misra-Gries step: merge exact batch counts into the
    summary, then, if more than ``k`` keys are live, subtract the
    (k+1)-th largest counter from every counter and drop non-positives.
    Preserves the MG bound est(x) ≥ f(x) − N/(k+1) for the stream
    consumed so far (property-tested over arbitrary chunkings in
    tests/test_sampling.py)."""
    for key, c in batch_counts.items():
        counts[key] = counts.get(key, 0) + int(c)
    if len(counts) > k:
        vals = sorted(counts.values(), reverse=True)
        thr = vals[k]  # (k+1)-th largest
        counts = {key: v - thr for key, v in counts.items() if v > thr}
    return counts


def _mg_summaries(keys_df: DataFrame) -> DataFrame:
    """Per-partition Misra-Gries summary via Arrow-batched mapInPandas.

    The reduction itself is the pure, property-tested :func:`mg_reduce`;
    this wrapper only streams Arrow batches through it."""

    def mg(batches):
        import pandas as pd

        counts: dict[int, int] = {}
        for pdf in batches:
            counts = mg_reduce(
                counts,
                {int(k): int(c) for k, c in pdf["hot_key"].value_counts().items()},
            )
        yield pd.DataFrame(
            {"hot_key": list(counts.keys()), "est": list(counts.values())}
        )

    return keys_df.mapInPandas(mg, schema="hot_key long, est long")


def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All keys with > φ·N of the events stream, sketch-pruned then exact.

    Two scans, both cheap at scale: (1) the MG sketch pass shuffles at most
    HH_COUNTERS rows per input partition (candidate generation — never one
    row per distinct key); (2) the verify pass broadcasts the candidate
    set, folds every non-candidate row into a single sentinel group, and
    counts — so the exchange carries |candidates|+1 groups while still
    producing BOTH the exact candidate counts and the exact global total N
    in one aggregation. Output is exact: sketch error can only add verify
    work, never change the answer (guarantee above).
    """
    keys = _t(spark, sf_dir, "events").select(_hot_key_col().alias("hot_key"))
    candidates = _mg_summaries(keys).select("hot_key").distinct()
    cand = F.broadcast(candidates.withColumn("is_cand", F.lit(True)))
    verified = (
        keys.join(cand, "hot_key", "left")
        .select(
            F.when(F.col("is_cand"), F.col("hot_key"))
            .otherwise(F.lit(-1))
            .alias("gkey")
        )
        .groupBy("gkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total_w = F.sum("cnt").over(_total_window())
    return (
        verified.withColumn("total", total_w)
        .where(
            (F.col("gkey") >= 0)
            & (F.col("cnt") > F.lit(HH_PHI) * F.col("total"))
        )
        .select(
            F.col("gkey").alias("hot_key"),
            F.col("cnt").alias("n_events"),
            (F.col("cnt") / F.col("total")).alias("frac"),
        )
        .orderBy(F.desc("n_events"), "hot_key")
    )


def _total_window():
    """Single-partition frame over the tiny verified-groups relation
    (|candidates|+1 rows), used only to attach the global total."""
    from pyspark.sql import Window

    return Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )


_ORACLE_HEAVY_HITTERS = f"""
WITH hk AS (SELECT {_HOT_KEY_SQL} AS hot_key FROM events),
counted AS (SELECT hot_key, count(*) AS n_events FROM hk GROUP BY hot_key),
tot AS (SELECT sum(n_events) AS total FROM counted)
SELECT hot_key, n_events,
       CAST(n_events AS DOUBLE) / total AS frac
FROM counted, tot
WHERE n_events > {HH_PHI} * total
ORDER BY n_events DESC, hot_key
"""


# --- importance sampling ----------------------------------------------------

# Quality-proportional resampling (the importance-weighting step of corpus
# assembly, DSIR/DoReMi-adjacent in spirit): each document is kept with
# probability equal to its composite quality score — which is in [0, 1] by
# construction (textops.quality_score_col) — so the kept corpus's quality
# distribution shifts up without any hard cutoff. Membership is the same
# deterministic md5-uniform device as the stratified sampler (salt ':imp'
# decorrelates it from both the strata hash and the train/val split): a
# pure per-row predicate, no RNG state, reproducible under any
# partitioning, pushed into the scan at 100 TB. The per-lang report
# carries mean quality before/after via ⌊q·2^20⌋ integer sums (exact,
# associative — summation order cannot differ across engines) divided
# once at the end.
IMP_HASH_HEX = 6
_IMP_SPACE = 1 << (4 * IMP_HASH_HEX)
Q20 = 1 << 20


def corpus_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-proportional importance sample + per-lang shift report."""
    from opencode_hive_archon_spark.operators.textops import (
        _docs,
        quality_score_col,
    )

    q = quality_score_col()
    h = md5_prefix_long(
        F.concat(F.col("doc_id").cast("string"), F.lit(":imp")), IMP_HASH_HEX
    )
    kept = (h.cast("double") < q * F.lit(float(_IMP_SPACE))).cast("long")
    qq = F.floor(q * F.lit(float(Q20))).cast("long")
    flagged = _docs(spark, sf_dir).select(
        "lang", "n_chars", kept.alias("kept"), qq.alias("qq")
    )
    n = F.count(F.lit(1))
    n_kept = F.sum("kept")
    return (
        flagged.groupBy("lang")
        .agg(
            n.alias("n_total"),
            n_kept.alias("n_kept"),
            (n_kept / n).alias("achieved_rate"),
            (F.sum("qq").cast("double") / (n * Q20)).alias("mean_quality_all"),
            F.when(
                n_kept > 0,
                F.sum(F.col("qq") * F.col("kept")).cast("double")
                / (n_kept * Q20),
            ).alias("mean_quality_kept"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(F.col("n_chars") * F.col("kept")).alias("kept_chars"),
        )
        .orderBy("lang")
    )


def _imp_oracle() -> str:
    from opencode_hive_archon_spark.operators.textops import (
        _QUALITY_EXPR_SQL,
        _TOKS_SQL,
    )

    h = md5_prefix_long_sql("(CAST(doc_id AS VARCHAR) || ':imp')", IMP_HASH_HEX)
    return f"""
WITH base AS (
  SELECT doc_id, lang, n_chars, text, {_TOKS_SQL} AS toks FROM documents
),
feat AS (
  SELECT lang, n_chars, {_QUALITY_EXPR_SQL} AS q,
         {h} AS h
  FROM base
),
flagged AS (
  SELECT lang, n_chars,
         CASE WHEN CAST(h AS DOUBLE) < q * {float(_IMP_SPACE)} THEN 1 ELSE 0 END AS kept,
         CAST(floor(q * {float(Q20)}) AS BIGINT) AS qq
  FROM feat
)
SELECT lang,
       count(*) AS n_total,
       CAST(sum(kept) AS BIGINT) AS n_kept,
       CAST(sum(kept) AS DOUBLE) / count(*) AS achieved_rate,
       CAST(sum(qq) AS DOUBLE) / (count(*) * {Q20}) AS mean_quality_all,
       CASE WHEN sum(kept) > 0
            THEN CAST(sum(qq * kept) AS DOUBLE) / (sum(kept) * {Q20})
            ELSE NULL END AS mean_quality_kept,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(n_chars * kept) AS BIGINT) AS kept_chars
FROM flagged
GROUP BY lang
ORDER BY lang
"""


# --- shard planning ---------------------------------------------------------

# The shuffle-and-shard step of corpus assembly: before training, documents
# get a pseudo-random total order (so batches are i.i.d.-ish without a
# stateful shuffle) and a shard file assignment. Both come from one
# md5-uniform value (salt ':shard'): shard = h mod N_SHARDS — and because
# N_SHARDS divides the 2^24 hash space exactly, the modulo has ZERO bias —
# while ordering within a shard by h itself IS the deterministic shuffle.
# At 100 TB the physical write is `repartitionByRange(shard, h)` +
# `partitionBy(shard)`: a single range shuffle, balanced by construction;
# this query is the planning/evidence side — per-shard doc and char mass
# balance plus each shard's ordered stream head.
N_SHARDS = 32
SHARD_HASH_HEX = 6
_SHARD_SPACE = 1 << (4 * SHARD_HASH_HEX)
assert _SHARD_SPACE % N_SHARDS == 0  # exact uniformity of h mod N_SHARDS


def corpus_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shuffle-shard plan + balance report (one scan)."""
    h = md5_prefix_long(
        F.concat(F.col("doc_id").cast("string"), F.lit(":shard")),
        SHARD_HASH_HEX,
    )
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        (h % N_SHARDS).alias("shard"),
        # stream order = (h, doc_id) packed into one int64 so hash
        # collisions can't make the arg-min nondeterministic (h < 2^24,
        # doc_id < 2^32 -> the packed key is unique and < 2^56)
        (h * F.lit(1 << 32) + F.col("doc_id")).alias("ord"),
    )
    return (
        docs.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min_by("doc_id", "ord").alias("first_doc"),
        )
        .orderBy("shard")
    )


def _shard_oracle() -> str:
    h = md5_prefix_long_sql(
        "(CAST(doc_id AS VARCHAR) || ':shard')", SHARD_HASH_HEX
    )
    return f"""
WITH hashed AS (
  SELECT doc_id, n_chars, {h} % {N_SHARDS} AS shard,
         {h} * {1 << 32} + doc_id AS ord
  FROM documents
)
SELECT shard,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       arg_min(doc_id, ord) AS first_doc
FROM hashed
GROUP BY shard
ORDER BY shard
"""


SPECS = [
    QuerySpec(
        "corpus_stratified_sample", corpus_stratified_sample,
        _ORACLE_STRATIFIED, "text",
        "deterministic md5-threshold stratified sample toward a target "
        "language mixture, per-lang balance report in one scan"),
    QuerySpec(
        "corpus_pack_sequences", corpus_pack_sequences, _ORACLE_PACK, "text",
        "sharded greedy concat-then-chunk sequence packing into "
        f"{PACK_BUDGET}-char bins; per-lang fill/overflow report"),
    QuerySpec(
        "agg_heavy_hitters", agg_heavy_hitters, _ORACLE_HEAVY_HITTERS,
        "relational",
        "φ-heavy hitters: Misra-Gries partition summaries prune candidates, "
        "exact verify pass reports keys > 1% of events — bounded shuffle at "
        "any key cardinality"),
    QuerySpec(
        "corpus_importance_sample", corpus_importance_sample, _imp_oracle(),
        "text",
        "quality-proportional importance resampling: keep probability = "
        "composite quality score via deterministic md5-uniform; per-lang "
        "before/after quality-shift report with integer-exact means"),
    QuerySpec(
        "corpus_shard_plan", corpus_shard_plan, _shard_oracle(), "text",
        "deterministic shuffle-shard plan: bias-free h mod N shard "
        "assignment + collision-proof stream order, per-shard balance "
        "report with each shard's ordered head"),
]
