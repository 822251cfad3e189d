"""Family 3b — document deduplication over ``documents``.

The training-data-pipeline dedup ladder, each tier Spark-first:

* exact           — hash-groupBy on normalized text (sha2); one shuffle on
                    the 256-bit digest, never on the text itself.
* near (Jaccard)  — token-3-gram shingle sets, banded self-join: length
                    bands prune the candidate space from O(n²) to near-dup
                    neighborhoods before any set intersection runs.
* n-gram Jaccard  — character-5-gram sets through the same prefix-filtered
                    SSJoin: tokenization-free (robust to punctuation and
                    segmentation differences).
* MinHash + LSH   — the 100 TB path: per-doc signature (k independent
                    min-hashes via seeded xxhash64), banded into b groups of
                    r rows; candidate pairs share a (band, band-hash) bucket;
                    exact Jaccard verifies. Only the bucket join shuffles,
                    carrying (doc_id, band_hash) pairs — not text.
* SimHash         — 64-bit bit-majority fingerprint over token hashes;
                    hamming ≤ 3 pairs via 4×16-bit band join.

Exact/near have exact DuckDB oracles. MinHash/SimHash depend on engine hash
functions (xxhash64) with no DuckDB equivalent => rows-only for the driver;
tests assert recall against the exact-Jaccard pair set instead.

Tokenization parity notes in functions/text.py (whitespace-normalized,
lowercase).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from opencode_hive_archon_spark.functions.hashing import (
    md5_prefix_long,
    md5_prefix_long_sql,
)
from opencode_hive_archon_spark.session import materialize as _materialize
from opencode_hive_archon_spark.session import materialize_iter as _materialize_iter
from opencode_hive_archon_spark.session import read_table as _t
from opencode_hive_archon_spark.spec import QuerySpec

JACCARD_THRESHOLD = 0.8
LENGTH_BAND = 100  # near-dup candidates must be within this n_chars distance

# Spark-side normalized token array (NON-distinct: shingles need order).
def _toks():
    """Lazy: Column construction needs an active SparkSession (JVM)."""
    return F.split(F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " "), " ")
_TOKS_SQL = "string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')"


def _shingles(toks: Column) -> Column:
    """Distinct token-3-gram shingles (empty when < 3 tokens).

    Guard: Spark's ``sequence(1, n)`` DESCENDS when n < 1, so short docs
    must short-circuit to an empty array."""
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i),
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
            ),
        )
    )
    return F.when(F.size(toks) >= 3, grams).otherwise(
        F.array().cast("array<string>")
    )


def _shingled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_chars, sh) materialized once. Tokens land in their own
    projection so the tokenize regex evaluates a single time per row (the
    shingle expression references the token array ~5x), then the whole
    result is checkpointed for the multi-branch consumers."""
    return _materialize(
        _t(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", "n_chars", _toks().alias("toks"))
        .select("doc_id", "n_chars", _shingles(F.col("toks")).alias("sh"))
    )


def _attach_pair_shingles(cand: DataFrame, sh: DataFrame) -> DataFrame:
    """(doc_a, doc_b) pairs -> (doc_a, doc_b, sh_a, sh_b) WITHOUT a
    corpus-wide broadcast.

    A broadcast-hash verify join against the doc->shingles map OOMs once the
    corpus outgrows driver/executor memory (the map is the whole corpus'
    shingle arrays). Instead: melt each pair into two (pair, doc_id) rows,
    shuffle-hash join ONCE against the shingle map keyed by doc_id — one
    key-partitioned pass over the corpus arrays, non-candidates drop out in
    the join — then regroup by pair. Only candidate rows (bounded by the
    near-dup count, not the corpus) carry array payloads through the second
    shuffle. The SHUFFLE_HASH hint pins the scale-safe physical join so
    size-estimate drift can never re-introduce a broadcast.
    """
    melted = cand.select(
        "doc_a",
        "doc_b",
        F.explode(F.array(F.col("doc_a"), F.col("doc_b"))).alias("doc_id"),
    )
    joined = melted.join(sh.hint("shuffle_hash"), "doc_id")
    side = lambda which: F.first(
        F.when(F.col("doc_id") == F.col(which), F.col("sh")), ignorenulls=True
    )
    return joined.groupBy("doc_a", "doc_b").agg(
        side("doc_a").alias("sh_a"), side("doc_b").alias("sh_b")
    )


# DuckDB mirror: token CTE + list comprehension (range() end-exclusive,
# empty when len < 3 — no guard needed).
_SHINGLE_CTE = f"""
tok AS (SELECT doc_id, n_chars, {_TOKS_SQL} AS t FROM documents),
sh AS (
  SELECT doc_id, n_chars,
         list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                        for i in range(1, greatest(len(t) - 1, 1))]) AS sh
  FROM tok
)
"""


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via sha2(normalized text): summary + per-group stats."""
    docs = _t(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    groups = (
        docs.select(F.sha2(norm, 256).alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("copies"))
    )
    return groups.agg(
        F.count(F.lit(1)).alias("n_distinct_texts"),
        F.sum("copies").alias("n_docs"),
        (F.sum("copies") - F.count(F.lit(1))).alias("n_redundant_docs"),
        F.max("copies").alias("largest_group"),
    )


_ORACLE_DEDUP_EXACT = """
WITH groups AS (
  SELECT sha256(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS h,
         count(*) AS copies
  FROM documents GROUP BY 1
)
SELECT count(*) AS n_distinct_texts,
       CAST(sum(copies) AS BIGINT) AS n_docs,
       CAST(sum(copies) - count(*) AS BIGINT) AS n_redundant_docs,
       max(copies) AS largest_group
FROM groups
"""


def _prefix_filtered_pairs(docs: DataFrame, t: int = 1) -> DataFrame:
    """Generic prefix-filtered set-similarity join (SSJoin/PPJoin family —
    Chaudhuri et al. ICDE'06, Xiao et al. WWW'08 — exact, no LSH miss
    probability) over a (doc_id, n_chars, sh: array<string>) relation:

    1. canonical order: set elements ranked by (global frequency asc,
       value) — rare elements first, so indexed prefixes collide rarely;
    2. each doc indexes only its first L = |A| - ceil(0.8|A|) + t elements
       in that order; the ORDER-t prefix-filter theorem guarantees every
       pair with J >= 0.8 and |A∩B| >= t shares at least t of those
       indexed elements;
    3. candidates = equi-join on a prefix key (+ length-banded key, see
       below), then ONE exact array_intersect verify per distinct pair.

    Shuffle profile: two key-partitioned shuffles (frequency count, prefix
    join) — the verify set tracks true near-duplicates, not n². Returns
    (doc_a, doc_b, jaccard) pairs at JACCARD_THRESHOLD.

    ``t`` is the PREFIX ORDER — the exact-join answer to a SATURATED
    element vocabulary. When the corpus far outgrows the distinct-element
    space (winnowed char-grams: ~230 distinct grams at ANY corpus size),
    order-1 buckets hold O(corpus/vocab) docs and the join output grows
    quadratically (measured: 273M candidate rows / 170 s at sf1). Each
    +1 of t multiplies the effective vocabulary by another vocab factor:
    the join key becomes the ordered t-COMBINATION of prefix elements
    (C(L, t) keys per doc — a small constant, since L ≈ 0.2|A| + t),
    provably lossless because J >= 0.8 forces |A∩B| >=
    ceil(0.8·max(|A|,|B|)) >= t whenever max(|A|,|B|) >= ceil(t/0.8).
    Sets too small for that bound (|A| <= t−1 after the algebra below)
    can only reach J >= 0.8 as EXACT set equals — for |A| <= 3,
    J >= 0.8 with |B| > |A| is impossible (|∩| <= |A| < 0.8·|∪|) — and
    route through a sorted-set equality join instead; size-0 sets never
    pair. t is therefore a pure cost knob with bit-identical output —
    the oracle (all-pairs exact Jaccard) never sees it. Grow t with
    log_vocab(corpus): ``chargram_prefix_t`` executes that rule for the
    char-gram family, mirroring how ``lsh_bits_for`` scales LSH width.
    """
    if t not in (1, 2, 3):
        raise ValueError(f"prefix order t must be 1, 2 or 3, got {t}")
    ex = docs.select("doc_id", F.explode("sh").alias("shingle"))
    freq = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("freq"))
    ranked = ex.join(freq, "shingle").select(
        "doc_id", F.struct(F.col("freq"), F.col("shingle")).alias("key")
    )
    prefix_len = lambda n: n - F.ceil(F.lit(JACCARD_THRESHOLD) * n).cast("int") + t
    pref_arr = (
        ranked.groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("key")).alias("ordered"))
        .select(
            "doc_id",
            F.transform(
                F.slice(F.col("ordered"), 1, prefix_len(F.size("ordered"))),
                lambda k: k["shingle"],
            ).alias("p"),
        )
    )
    # Ordered t-combinations of the prefix as single join keys. \x01 only
    # delimits; a \x01 byte surviving inside a gram could alias two
    # different combinations onto one key, but that only ADDS candidates —
    # the exact Jaccard verify below filters any false candidate, so
    # correctness never depends on the delimiter.
    p = F.col("p")
    sep = F.lit("\x01")
    if t == 1:
        comb_keys = p
    elif t == 2:
        comb_keys = F.flatten(
            F.transform(
                p,
                lambda x, i: F.transform(
                    F.slice(p, i + F.lit(2), F.size(p)),
                    lambda y: F.concat(x, sep, y),
                ),
            )
        )
    else:  # t == 3: i < j < k triples
        comb_keys = F.flatten(
            F.transform(
                p,
                lambda x, i: F.flatten(
                    F.transform(
                        F.slice(p, i + F.lit(2), F.size(p)),
                        lambda y, j: F.transform(
                            F.slice(p, i + j + F.lit(3), F.size(p)),
                            lambda z: F.concat(x, sep, y, sep, z),
                        ),
                    )
                ),
            )
        )
    prefixes = pref_arr.filter(F.size("p") >= t).select(
        "doc_id", F.explode(comb_keys).alias("shingle")
    )
    prefixes = _materialize(prefixes)  # reused by both join sides
    # Candidate pairs carry ONLY ids through the prefix join — the shingle
    # arrays are joined in afterwards, once per deduplicated pair. (Carrying
    # the arrays through the join multiplies shuffle volume by |A|.)
    #
    # LENGTH-BANDED join key (round 9): the length-band filter moves INTO
    # the equi-join key. A valid pair has |len_a − len_b| ≤ LENGTH_BAND, so
    # floor(len/LENGTH_BAND) bands differ by at most 1: side A emits each
    # prefix element under bands {b−1, b, b+1}, side B under its own band,
    # and the join keys on (element, B's band) — every valid pair still
    # meets on exactly ONE key (B's band is unique per pair ⇒ no duplicate
    # matches), while a saturated element bucket fragments across the
    # corpus's length spread. Lossless by construction (the exact length
    # filter below is unchanged); this removed the residual near-quadratic
    # candidate blow-up of the saturated char-gram vocabulary at sf1
    # (10.4M candidates → band-fragmented).
    lens = docs.select("doc_id", "n_chars")
    band = (F.col("n_chars") / F.lit(LENGTH_BAND)).cast("long")
    pa = prefixes.join(lens, "doc_id").select(
        F.col("doc_id").alias("doc_a"),
        F.col("n_chars").alias("len_a"),
        "shingle",
        F.explode(F.array(band - 1, band, band + 1)).alias("band"),
    )
    pb = prefixes.join(lens, "doc_id").select(
        F.col("doc_id").alias("doc_b"),
        F.col("n_chars").alias("len_b"),
        "shingle",
        band.alias("band"),
    )
    cand = (
        pa.join(pb, ["shingle", "band"])
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= LENGTH_BAND)
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    if t >= 2:
        # sets of size 1..t-1: exact-set-equality path (see docstring —
        # such sets can only reach J >= 0.8 as identical sets)
        small = docs.filter(
            (F.size("sh") >= 1) & (F.size("sh") <= t - 1)
        ).select(
            "doc_id",
            F.concat_ws("\x01", F.array_sort("sh")).alias("g"),
            "n_chars",
        )
        sa = small.select(
            F.col("doc_id").alias("doc_a"),
            F.col("n_chars").alias("len_a"),
            "g",
            F.explode(F.array(band - 1, band, band + 1)).alias("band"),
        )
        sb = small.select(
            F.col("doc_id").alias("doc_b"),
            F.col("n_chars").alias("len_b"),
            "g",
            band.alias("band"),
        )
        cand_small = (
            sa.join(sb, ["g", "band"])
            .filter(
                (F.col("doc_a") < F.col("doc_b"))
                & (F.abs(F.col("len_a") - F.col("len_b")) <= LENGTH_BAND)
            )
            .select("doc_a", "doc_b")
        )
        cand = cand.unionAll(cand_small).distinct()
    verified = _attach_pair_shingles(cand, docs.select("doc_id", "sh"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        verified.select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs: token-3-gram Jaccard >= 0.8 within a length band,
    via the generic prefix-filtered set-similarity join
    (``_prefix_filtered_pairs``) over the shared shingle relation."""
    # The shingle arrays feed four downstream branches (freq, rank, prefix,
    # verify); materialize them ONCE — otherwise the tokenize+3-gram
    # expression re-evaluates per branch (and per exploded row in some
    # collapsed plan shapes), turning a 2 s pass into minutes. At cluster
    # scale this is the persist() of the shared intermediate.
    # t=2: the order-2 prefix filter wins here too — token-3-gram buckets
    # are less saturated than char-grams but still hold O(100) docs each at
    # sf1; keying on gram pairs cut the candidate join 14.2 s → 3.5 s at
    # sf1 (identical 128k output pairs, measured round 8). The token-gram
    # vocabulary grows with the corpus, so t stays fixed at 2 (unlike the
    # char-gram family's adaptive ``chargram_prefix_t``).
    return _prefix_filtered_pairs(_shingled_docs(spark, sf_dir), t=2)


_ORACLE_DEDUP_NEAR = f"""
WITH {_SHINGLE_CTE}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         / NULLIF(len(list_distinct(a.sh || b.sh)), 0) AS jaccard
FROM sh a JOIN sh b
  ON a.doc_id < b.doc_id AND abs(a.n_chars - b.n_chars) <= {LENGTH_BAND}
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / NULLIF(len(list_distinct(a.sh || b.sh)), 0) >= {JACCARD_THRESHOLD}
"""


# --- character n-gram Jaccard (tokenization-free near-dup) ------------------

CHAR_NGRAM = 5
# Winnowing: keep a gram iff its (md5-prefix) hash ≡ 0 mod WINNOW_MOD — a
# deterministic ~1/8 sample of each doc's gram set. Full char-gram sets are
# ~|text| elements per document; at 100 TB nobody ships those through a
# set-similarity join — winnowed Jaccard is the standard estimator (same
# family as MinHash: hash-uniform subsets preserve the Jaccard ratio in
# expectation). The winnow rule is engine-mirrored (md5 on both sides), so
# the WHOLE pipeline keeps an exact DuckDB oracle. Measured at sf0.1 the
# winnow turns a 63 s join into ~2 s with identical planted-pair recovery.
WINNOW_MOD = 8
_MD5_PREFIX_SQL = md5_prefix_long_sql("g")


def _char_grams() -> Column:
    """Winnowed distinct character 5-grams over the whitespace-normalized
    lowercased text (empty when the text is shorter than one gram).
    Character grams are tokenization-free: robust to punctuation and
    segmentation differences that break word-shingle Jaccard (the
    CCNet-style dedup signal)."""
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.length(norm) - (CHAR_NGRAM - 1)),
            lambda i: norm.substr(i, F.lit(CHAR_NGRAM)),
        )
    )
    winnowed = F.filter(grams, lambda g: md5_prefix_long(g) % WINNOW_MOD == 0)
    return F.when(F.length(norm) >= CHAR_NGRAM, winnowed).otherwise(
        F.array().cast("array<string>")
    )


def _chargram_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_chars, sh=winnowed char-5-gram set), materialized once per
    branch fan-out (same rationale as _shingled_docs)."""
    return _materialize(
        _t(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", "n_chars", _char_grams().alias("sh"))
    )


CHARGRAM_T_DOCS_STEP = 100_000


def chargram_prefix_t(sf_dir: str) -> int:
    """Adaptive prefix order for the char-gram SSJoin. The winnowed
    char-gram vocabulary is ~CONSTANT in corpus size (~230 grams at every
    shipped sf — the gram space is bounded by the token vocabulary), so
    candidate volume at fixed prefix order t grows ~n²/vocab^t: holding it
    bounded means t must grow ~log_vocab(n). Executed as a footer-metadata
    doc-count threshold (the same driver-side peek as ``lsh_bits_for``):
    order 2 through ~100k docs (measured 135k candidate pairs at 50k
    docs), order 3 beyond (the sf3 run at fixed t=2 measured exponent 1.85
    — the second saturation; t only changes the candidate key, never the
    output, so the knob is oracle-free)."""
    from opencode_hive_archon_spark.operators.similarity import corpus_rows

    return 2 if corpus_rows(sf_dir, "documents") <= CHARGRAM_T_DOCS_STEP else 3


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by winnowed character-5-gram Jaccard >= 0.8 within a
    length band — the tokenization-free rung of the dedup ladder, running
    through the SAME prefix-filtered SSJoin as ``dedup_near`` (only the set
    definition changes; the scale posture — rare-first prefixes, id-only
    candidate shuffle, SHUFFLE_HASH verify — is inherited). The prefix
    order adapts to corpus size (``chargram_prefix_t``) because the
    winnowed gram vocabulary saturates. Docs whose winnowed set is empty
    (very short texts) cannot pair — the estimator property tests pin
    planted-dup recovery."""
    return _prefix_filtered_pairs(
        _chargram_docs(spark, sf_dir), t=chargram_prefix_t(sf_dir)
    )


_CHARGRAM_CTE = f"""
norm AS (
  SELECT doc_id, n_chars,
         regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS nt
  FROM documents
),
sh AS (
  SELECT doc_id, n_chars,
         list_filter(
           list_distinct([substr(nt, i, {CHAR_NGRAM})
                          for i in range(1, greatest(length(nt) - {CHAR_NGRAM - 2}, 1))]),
           g -> {_MD5_PREFIX_SQL} % {WINNOW_MOD} = 0
         ) AS sh
  FROM norm
)
"""

_ORACLE_NGRAM_JACCARD = f"""
WITH {_CHARGRAM_CTE}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         / NULLIF(len(list_distinct(a.sh || b.sh)), 0) AS jaccard
FROM sh a JOIN sh b
  ON a.doc_id < b.doc_id AND abs(a.n_chars - b.n_chars) <= {LENGTH_BAND}
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / NULLIF(len(list_distinct(a.sh || b.sh)), 0) >= {JACCARD_THRESHOLD}
"""


# --- MinHash + LSH (the scale path; rows-only) -----------------------------

# r=5 rows per band: for planted near-dups (j ≈ 0.95) P[candidate] =
# 1-(1-j^5)^4 ≈ 0.997, while a random pair at j = 0.2 collides with
# P ≈ 4·3e-4 — an order of magnitude fewer junk candidates than r=4.
N_HASHES = 20
N_BANDS = 4  # 4 bands x 5 rows


def minhash_signatures(shingled: DataFrame) -> DataFrame:
    """(doc_id, sh: array<string>) -> (doc_id, sig: array<long>) of per-seed
    min-hashes, via explode + groupBy.

    xxhash64(shingle, seed_i) per shingle x seed; min per (doc, seed). The
    shuffle carries (doc_id, seed, hash) triples — bounded by shingle count,
    independent of document size.
    """
    ex = shingled.select("doc_id", F.explode("sh").alias("sh"))
    hashed = ex.select(
        "doc_id",
        *[F.xxhash64(F.col("sh"), F.lit(i)).alias(f"h{i}") for i in range(N_HASHES)],
    )
    return hashed.groupBy("doc_id").agg(
        F.array(*[F.min(f"h{i}") for i in range(N_HASHES)]).alias("sig")
    )


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidate pairs verified by exact Jaccard.

    Banding: signature split into N_BANDS bands of r rows; docs sharing any
    (band_idx, band_hash) bucket become candidates. P[candidate] ≈
    1-(1-j^r)^b — steep around the 0.8 target with r=4, b=4.
    """
    docs = _shingled_docs(spark, sf_dir)  # shared by signature + verify
    sigs = minhash_signatures(docs)
    r = N_HASHES // N_BANDS
    # Materialized: the candidate generator self-joins the band frame, and
    # without a persist both join sides recompute the full explode+min-hash
    # signature aggregation. The persisted frame is (doc_id, band, bh).
    bands = _materialize(
        sigs.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(bi).alias("band"),
                            F.hash(*[F.element_at("sig", bi * r + j + 1) for j in range(r)]).alias("bh"),
                        )
                        for bi in range(N_BANDS)
                    ]
                )
            ).alias("b"),
        ).select("doc_id", "b.band", "b.bh")
    )
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), ["band", "bh"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        _attach_pair_shingles(cand, docs.select("doc_id", "sh"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


# --- SimHash (rows-only) ----------------------------------------------------

SIMHASH_BITS = 16  # per band
SIMHASH_BANDS = 4
HAMMING_MAX = 3


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """64-bit SimHash: bit j of the fingerprint is the majority vote of bit j
    across xxhash64(token) of every (distinct) token.

    Agg-state diet: instead of 64 per-bit SUM buffers, the 64 bit-counters
    are packed 4-per-long as 16-bit lanes (counter j rides in long j//4,
    lane j%4), so the per-group aggregation state is 16 longs + 1 count —
    4x smaller — and everything stays inside whole-stage codegen. 16-bit
    lanes overflow only past 65,535 distinct tokens in one document (the
    corpus max is 31; a degenerate giant doc would need 32-bit lanes /
    8-per-two-longs instead)."""
    ex = docs.select("doc_id", F.explode(F.array_distinct(_toks())).alias("tok"))
    hashed = ex.select("doc_id", F.xxhash64("tok").alias("h"))
    packed = [
        sum(
            F.shiftrightunsigned(F.col("h"), 4 * m + s).bitwiseAND(F.lit(1))
            * F.lit(1 << (16 * s)).cast("long")
            for s in range(4)
        ).alias(f"p{m}")
        for m in range(16)
    ]
    votes = hashed.select("doc_id", *packed).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(f"p{m}").alias(f"p{m}") for m in range(16)],
    )
    def _cnt(j: int):
        return F.shiftrightunsigned(F.col(f"p{j // 4}"), 16 * (j % 4)).bitwiseAND(
            F.lit(0xFFFF)
        )
    fp = None
    for j in range(64):
        bit = F.when(_cnt(j) * 2 > F.col("n"), F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        ) * F.lit(2 ** j).cast("long") if j < 63 else F.when(
            _cnt(j) * 2 > F.col("n"), F.lit(-(2 ** 63))
        ).otherwise(F.lit(0).cast("long"))
        fp = bit if fp is None else fp + bit
    return votes.select("doc_id", fp.alias("fp"))


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: hamming(fp_a, fp_b) <= 3, candidates via
    4x16-bit band equality (pigeonhole: <=3 differing bits leave at least
    one of 4 bands identical)."""
    docs = _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    fps = _materialize(simhash_fingerprints(docs))  # reused by both join sides
    bands = fps.select(
        "doc_id", "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.shiftrightunsigned(F.col("fp"), bi * SIMHASH_BITS)
                        .bitwiseAND(F.lit((1 << SIMHASH_BITS) - 1))
                        .alias("bh"),
                    )
                    for bi in range(SIMHASH_BANDS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "fp", "b.band", "b.bh")
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        bands.select(F.col("doc_id").alias("doc_a"), F.col("fp").alias("fp_a"), "band", "bh")
        .join(
            bands.select(F.col("doc_id").alias("doc_b"), F.col("fp").alias("fp_b"), "band", "bh"),
            ["band", "bh"],
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= HAMMING_MAX)
        .distinct()
    )


MAX_CC_ITERS = 20  # safety cap; star rounds converge in O(log n), min-label
                   # in O(component diameter)


def cc_min_label(pairs: DataFrame) -> DataFrame:
    """Min-label propagation: (doc_a, doc_b) undirected pairs -> (doc_id,
    label) where label = min doc_id reachable from doc_id.

    Every node starts labeled with its own id; each round takes the min
    label over neighbors; fixpoint when no label changes (driver checks a
    1-row count per round, bounded by the component DIAMETER). Simple and
    optimal for shallow graphs — near-dup components are usually stars of
    boilerplate around one template — but a 100 TB corpus with chain-shaped
    components (versioned documents) pays O(diameter) shuffle rounds, which
    is why the registered query runs :func:`cc_alternating_star` instead.
    Kept as the cross-check: test_cc_equivalence pins label-for-label
    agreement between the two on planted graphs and on the real pair set."""
    edges = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    labels = _materialize(
        edges.select(F.col("src").alias("doc_id")).distinct()
        .withColumn("label", F.col("doc_id"))
    )
    for _ in range(MAX_CC_ITERS):
        nbr_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src").agg(F.min("label").alias("nbr_min"))
        )
        # carry the previous label through the materialization so the
        # convergence check is a filter-count on the materialized frame (one
        # extra cheap action, not a fresh join). materialize_iter (lineage
        # cut) — NOT materialize — or round k's plan embeds round k-1's
        # plan ~3x over and a 16-deep chain overflows the JVM plan string.
        stepped = _materialize_iter(
            labels.join(nbr_min, labels.doc_id == nbr_min.src, "left")
            .select(
                "doc_id",
                F.least(F.col("label"), F.coalesce("nbr_min", "label")).alias("label"),
                F.col("label").alias("prev"),
            )
        )
        changed = stepped.filter(F.col("label") != F.col("prev")).count()
        labels = stepped.select("doc_id", "label")
        if changed == 0:
            return labels
    raise RuntimeError(f"min-label CC did not converge in {MAX_CC_ITERS} rounds")


def cc_alternating_star(pairs: DataFrame) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris et
    al., "Connected Components in MapReduce and Beyond", SoCC'14): the
    production path — O(log n) rounds regardless of component diameter,
    where min-label propagation needs O(diameter).

    (doc_a, doc_b) undirected pairs -> (doc_id, label), label = component
    min. The edge set is kept directed high->low ("hi" > "lo" — an invariant
    both phases preserve, so no orientation pass is ever needed):

    * large-star(u): m = min(N(u) ∪ {u}); every neighbor v > u re-attaches
      to m — emit (v, m). Long chains collapse by doubling: a node deep in
      a chain hops to its neighborhood minimum, halving its distance to the
      root each round.
    * small-star(u): over the smaller neighbors N⁻(u), m = min(N⁻(u));
      emit (v, m) for v ∈ N⁻(u) ∪ {u}, v ≠ m — locally star-shapes the
      subgraph below each node.

    Fixpoint: the edge set is a union of stars (member -> component min) and
    neither phase changes it. Convergence is detected with an exact edge-set
    comparison (count equality + one anti-join emptiness probe) once per
    super-round — O(log n) driver actions total, vs one per diameter step
    for min-label. Each super-round materializes its edges so lineage stays
    flat. Every shuffle carries only (id, id) pairs — never text/shingles.
    """
    nodes = _materialize(
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    # input pairs have doc_a < doc_b => store (hi=doc_b, lo=doc_a)
    edges = _materialize(
        pairs.select(F.col("doc_b").alias("hi"), F.col("doc_a").alias("lo"))
        .distinct()
    )
    for _ in range(MAX_CC_ITERS):
        # ---- large-star: needs both directions to see full neighborhoods
        und = edges.select(F.col("hi").alias("u"), F.col("lo").alias("v")).union(
            edges.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        )
        mins = und.groupBy("u").agg(F.min("v").alias("mn"))
        mins = mins.select("u", F.least(F.col("mn"), F.col("u")).alias("m"))
        ls = (
            und.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            # emitted (v, m): m <= u < v, so hi > lo holds by construction
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .distinct()
        )
        # ---- small-star: per node, re-attach smaller neighbors to their min
        # (materialize_iter: each round's edges must be a lineage LEAF, see
        # session.materialize_iter — geometric plan growth otherwise)
        mins2 = ls.groupBy("hi").agg(F.min("lo").alias("m"))
        stepped = _materialize_iter(
            ls.join(mins2, "hi")
            .select(
                F.explode(F.array(F.col("hi"), F.col("lo"))).alias("n"),
                "m",
            )
            .filter(F.col("n") != F.col("m"))  # drop the (m, m) self-loop
            .select(F.col("n").alias("hi"), F.col("m").alias("lo"))
            .distinct()
        )
        converged = (
            stepped.count() == edges.count()
            and stepped.join(edges, ["hi", "lo"], "left_anti").isEmpty()
        )
        edges = stepped
        if converged:
            # fixpoint: edges are exactly (member, component-min) stars
            return nodes.join(
                edges.select(F.col("hi").alias("doc_id"), F.col("lo").alias("label")),
                "doc_id",
                "left",
            ).select("doc_id", F.coalesce("label", "doc_id").alias("label"))
    raise RuntimeError(
        f"alternating-star CC did not converge in {MAX_CC_ITERS} rounds"
    )


def _cluster_report(labels: DataFrame) -> DataFrame:
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        labels.join(sizes, "label")
        .select(
            "doc_id",
            F.col("label").alias("cluster_id"),
            "cluster_size",
            (F.col("doc_id") == F.col("label")).alias("keep"),
        )
        .orderBy("cluster_id", "doc_id")
    )


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the near-dup pair graph — the step that
    turns pairwise matches into dedup decisions (pairs → clusters → keep the
    min-id doc per cluster).

    Runs :func:`cc_alternating_star` (large-star/small-star, O(log n)
    rounds — the 100 TB path); :func:`cc_min_label` is the cross-checked
    alternative for shallow graphs. Exact oracle: DuckDB recursive CTE
    computes min reachable id per node — the same fixpoint."""
    pairs = _materialize(dedup_near(spark, sf_dir).select("doc_a", "doc_b"))
    return _cluster_report(cc_alternating_star(pairs))


def corpus_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup LADDER end-to-end — the artifact a 100 TB dedup run ships:
    a per-document canonical mapping.

        exact dedup (sha2 digest, keep min doc_id)
          → near-dup SSJoin on the exact SURVIVORS only
            (t=2 prefix-filtered token-3-gram Jaccard — the oracle-exact
            rung; MinHash-LSH is the drop-in probabilistic analogue)
          → connected components (alternating large-star/small-star)
          → keep-min representative per cluster

    Returns (doc_id, canonical_id, status) for EVERY document, status ∈
    {kept, exact_dup, near_dup}; canonical_id follows the full chain (an
    exact dup of a near-dup maps to the cluster representative). Chaining
    matters at scale: the SSJoin and CC run on the exact-survivor set, so
    upstream redundancy never inflates the expensive rungs. Shuffle
    profile: one digest-keyed window, then the SSJoin/CC shuffles bounded
    by survivors, then one broadcast-sized labels join back.
    """
    docs = _t(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    exact = _materialize(
        docs.select("doc_id", "n_chars", "text", F.sha2(norm, 256).alias("h"))
        .select(
            "doc_id", "n_chars", "text",
            F.min("doc_id").over(Window.partitionBy("h")).alias("exact_rep"),
        )
    )
    survivors = exact.filter(F.col("doc_id") == F.col("exact_rep"))
    sh = _materialize(
        survivors
        .select("doc_id", "n_chars", _toks().alias("toks"))
        .select("doc_id", "n_chars", _shingles(F.col("toks")).alias("sh"))
    )
    pairs = _materialize(
        _prefix_filtered_pairs(sh, t=2).select("doc_a", "doc_b")
    )
    labels = cc_alternating_star(pairs)  # only nodes that appear in pairs
    surv_canon = (
        survivors.select("doc_id")
        .join(labels, "doc_id", "left")
        .select(
            F.col("doc_id").alias("exact_rep"),
            F.coalesce("label", F.col("doc_id")).alias("canonical_id"),
        )
    )
    status = (
        F.when(F.col("doc_id") != F.col("exact_rep"), F.lit("exact_dup"))
        .when(F.col("doc_id") != F.col("canonical_id"), F.lit("near_dup"))
        .otherwise(F.lit("kept"))
    )
    return (
        exact.select("doc_id", "exact_rep")
        .join(surv_canon, "exact_rep")
        .select("doc_id", "canonical_id", status.alias("status"))
        .orderBy("doc_id")
    )


# Ladder CTEs (non-recursive prefix): exact digest map -> survivors ->
# survivor shingles -> near-dup pairs. Shared between the recursive-CTE
# registry oracle (driver gate, sf0.01) and tools/check.py's
# iterative-fixpoint path at sf0.1.
_LADDER_CTES = f"""
hashed AS (
  SELECT doc_id, n_chars, text,
         sha256(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS h
  FROM documents
),
exact AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY h) AS exact_rep
  FROM hashed
),
surv AS (
  SELECT d.doc_id, d.n_chars, d.text
  FROM documents d JOIN exact e USING (doc_id)
  WHERE e.doc_id = e.exact_rep
),
stok AS (SELECT doc_id, n_chars, {_TOKS_SQL} AS t FROM surv),
ssh AS (
  SELECT doc_id, n_chars,
         list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                        for i in range(1, greatest(len(t) - 1, 1))]) AS sh
  FROM stok
),
spairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM ssh a JOIN ssh b
    ON a.doc_id < b.doc_id AND abs(a.n_chars - b.n_chars) <= {LENGTH_BAND}
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / NULLIF(len(list_distinct(a.sh || b.sh)), 0) >= {JACCARD_THRESHOLD}
)"""

ORACLE_LADDER_EXACT_SQL = f"WITH {_LADDER_CTES} SELECT doc_id, exact_rep FROM exact"
ORACLE_LADDER_EDGES_SQL = f"WITH {_LADDER_CTES} SELECT doc_a, doc_b FROM spairs"

_ORACLE_DEDUP_PIPELINE = f"""
WITH RECURSIVE {_LADDER_CTES},
sedges AS (
  SELECT doc_a AS src, doc_b AS dst FROM spairs
  UNION ALL SELECT doc_b, doc_a FROM spairs
),
sreach(doc, root) AS (
  SELECT DISTINCT src, src FROM sedges
  UNION
  SELECT e.dst, r.root FROM sreach r JOIN sedges e ON e.src = r.doc
),
slab AS (SELECT doc AS doc_id, min(root) AS cluster_id FROM sreach GROUP BY doc),
surv_canon AS (
  SELECT s.doc_id AS exact_rep,
         coalesce(l.cluster_id, s.doc_id) AS canonical_id
  FROM surv s LEFT JOIN slab l USING (doc_id)
)
SELECT e.doc_id, c.canonical_id,
       CASE WHEN e.doc_id <> e.exact_rep THEN 'exact_dup'
            WHEN e.doc_id <> c.canonical_id THEN 'near_dup'
            ELSE 'kept' END AS status
FROM exact e JOIN surv_canon c ON c.exact_rep = e.exact_rep
ORDER BY e.doc_id
"""


# Non-recursive candidate-pair CTEs, shared between the recursive-CTE oracle
# (driver gate, sf0.01) and tools/check.py's iterative-fixpoint oracle (the
# sf0.1 path: pairs SQL + driver-side union-find, same fixpoint, no
# recursion).
_ORACLE_PAIR_CTES = f"""{_SHINGLE_CTE},
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sh a JOIN sh b
    ON a.doc_id < b.doc_id AND abs(a.n_chars - b.n_chars) <= {LENGTH_BAND}
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / NULLIF(len(list_distinct(a.sh || b.sh)), 0) >= {JACCARD_THRESHOLD}
)"""

ORACLE_CLUSTER_EDGES_SQL = f"WITH {_ORACLE_PAIR_CTES} SELECT doc_a, doc_b FROM pairs"

_ORACLE_CLUSTERS = f"""
WITH RECURSIVE {_ORACLE_PAIR_CTES},
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
),
reach(doc, root) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.doc
),
lab AS (SELECT doc AS doc_id, min(root) AS cluster_id FROM reach GROUP BY doc)
SELECT l.doc_id, l.cluster_id, s.cluster_size, l.doc_id = l.cluster_id AS keep
FROM lab l
JOIN (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
      FROM lab GROUP BY cluster_id) s USING (cluster_id)
"""


SPECS = [
    QuerySpec("dedup_exact", dedup_exact, _ORACLE_DEDUP_EXACT, "dedup",
              "exact dedup via sha2 hash-groupBy"),
    QuerySpec("dedup_near", dedup_near, _ORACLE_DEDUP_NEAR, "dedup",
              "length-banded token-3-gram Jaccard near-dup pairs"),
    QuerySpec("dedup_ngram_jaccard", dedup_ngram_jaccard, _ORACLE_NGRAM_JACCARD,
              "dedup",
              "character-5-gram Jaccard near-dup pairs (tokenization-free; "
              "same prefix-filtered SSJoin)"),
    QuerySpec("dedup_minhash_lsh", dedup_minhash_lsh, None, "dedup",
              "MinHash+LSH banded near-dup (rows-only; recall tested vs exact)"),
    QuerySpec("dedup_simhash", dedup_simhash, None, "dedup",
              "SimHash hamming<=3 near-dup (rows-only)"),
    QuerySpec("dedup_clusters", dedup_clusters, _ORACLE_CLUSTERS, "dedup",
              "connected components over near-dup pairs (alternating "
              "large-star/small-star, O(log n) rounds; recursive-CTE oracle)"),
    QuerySpec("corpus_dedup_pipeline", corpus_dedup_pipeline,
              _ORACLE_DEDUP_PIPELINE, "dedup",
              "fused dedup ladder: exact sha2 -> near-dup SSJoin on "
              "survivors -> CC -> keep-min canonical mapping per document"),
]
