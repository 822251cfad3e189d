"""PII scrubbing + blocklist filtering — the two cleaning stages every
public corpus recipe runs that the engine did not yet carry (C4 / Raffel
et al. 2020 filter text through a public blocklist; RefinedWeb, Dolma and
FineWeb all regex-scrub emails / phone numbers / IP addresses before
training). SURVEY.md §2B family 3; the reference's corpus intent is
mvp.md:22's curated retrieval corpus — these run BEFORE anything reaches
the dedup ladder or the tokenizer.

- ``text_pii_redact``: regex detection + redaction of emails, North-
  American-style phone numbers and IPv4 addresses. The synthetic corpus
  carries no organic PII, so the query first INJECTS deterministic PII
  into overlapping doc subsets (doc_id-keyed arithmetic — every
  combination of the three kinds, including none, is exercised), then
  detects, redacts, and PROVES the redaction closed (a second detection
  pass over the redacted text must find zero residual hits). Audited per
  lang with integer-exact counts.
- ``corpus_blocklist_filter``: document-level term filtering against a
  blocklist. The list is lexicon-sized, so it enters the plan as a
  LITERAL ARRAY and the verdict is ``array_intersect`` of the doc's
  distinct tokens — scan-local, zero shuffle, no join at all. Audited
  per source with kept/blocked splits and per-term hit totals.

Scale shape: both are single-scan projection → one small-keyed
hash-aggregate (map-side partial collapses each partition to |langs| /
|sources| rows before the exchange). All regex/array work is JVM-side
whole-stage-codegen built-ins — no Python touches a row. At 100 TB the
same plans hold: redaction cost is per-byte scan work, and a blocklist
too large for a literal array swaps in a broadcast semi-join over
exploded tokens without changing the output contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opencode_hive_archon_spark.operators.textops import _docs, _toks
from opencode_hive_archon_spark.spec import QuerySpec

# One pattern per PII kind. Kept inside the portable intersection of the
# Java (Spark) and RE2 (DuckDB oracle) dialects: no lookaround, no
# backreferences, explicit character classes only.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+1-[0-9]{3}-[0-9]{4}"
PII_IPV4 = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"

# Blocklist: lexicon-sized, deterministic. Three terms that occur in the
# synthetic vocabulary (both filter branches exercised) + two that never
# do (zero-hit terms must not distort the audit).
BLOCKLIST = ("merge", "window", "hash", "forbidden", "redacted")


def _with_injected_pii(docs: DataFrame) -> DataFrame:
    """Deterministically splice PII into overlapping doc subsets:
    emails on doc_id % 2 == 0, phones on % 3 == 0, IPv4s on % 5 == 0 —
    all eight presence combinations occur, including clean docs."""
    did = F.col("doc_id")
    email = F.concat(
        F.lit(" contact user"), did,
        F.lit("@mail"), did % 7, F.lit(".com"),
    )
    phone = F.concat(
        F.lit(" call +1-555-"),
        F.lpad((did % 10000).cast("string"), 4, "0"),
    )
    ip = F.concat(
        F.lit(" from "), (did % 256).cast("string"),
        F.lit("."), ((did * 7) % 256).cast("string"),
        F.lit(".1."), ((did * 13) % 256).cast("string"),
    )
    return docs.withColumn(
        "dirty",
        F.concat(
            F.col("text"),
            F.when(did % 2 == 0, email).otherwise(F.lit("")),
            F.when(did % 3 == 0, phone).otherwise(F.lit("")),
            F.when(did % 5 == 0, ip).otherwise(F.lit("")),
        ),
    )


def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang PII audit: docs, per-kind hit totals, docs left clean,
    and the closure proof — `residual_hits` (detections over the
    REDACTED text) and the exact redacted byte volume.

    Redaction order matters and is fixed: emails first (their domains
    contain dots and digits that the IPv4 pattern must never see),
    then phones, then IPv4s.
    """
    dirty = _with_injected_pii(_docs(spark, sf_dir))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("dirty"), PII_EMAIL, "<EMAIL>"),
            PII_PHONE, "<PHONE>",
        ),
        PII_IPV4, "<IP>",
    )
    scored = dirty.select(
        "lang",
        F.regexp_count(F.col("dirty"), F.lit(PII_EMAIL)).alias("n_email"),
        F.regexp_count(F.col("dirty"), F.lit(PII_PHONE)).alias("n_phone"),
        F.regexp_count(F.col("dirty"), F.lit(PII_IPV4)).alias("n_ip"),
        redacted.alias("redacted"),
    ).select(
        "lang", "n_email", "n_phone", "n_ip",
        (
            F.regexp_count(F.col("redacted"), F.lit(PII_EMAIL))
            + F.regexp_count(F.col("redacted"), F.lit(PII_PHONE))
            + F.regexp_count(F.col("redacted"), F.lit(PII_IPV4))
        ).alias("n_residual"),
        F.length("redacted").alias("red_len"),
    )
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_email").alias("emails"),
            F.sum("n_phone").alias("phones"),
            F.sum("n_ip").alias("ips"),
            F.sum(
                F.when(
                    (F.col("n_email") == 0)
                    & (F.col("n_phone") == 0)
                    & (F.col("n_ip") == 0),
                    1,
                ).otherwise(0)
            ).alias("clean_docs"),
            F.sum("n_residual").alias("residual_hits"),
            F.sum("red_len").alias("redacted_len_sum"),
        )
        .orderBy("lang")
    )


_ORACLE_PII = f"""
WITH dirty AS (
  SELECT lang,
         text
         || CASE WHEN doc_id % 2 = 0 THEN ' contact user' || doc_id
              || '@mail' || (doc_id % 7) || '.com' ELSE '' END
         || CASE WHEN doc_id % 3 = 0 THEN ' call +1-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
         || CASE WHEN doc_id % 5 = 0 THEN ' from ' || (doc_id % 256)
              || '.' || ((doc_id * 7) % 256)
              || '.1.' || ((doc_id * 13) % 256) ELSE '' END
         AS dirty
  FROM documents
), scored AS (
  SELECT lang,
         length(regexp_extract_all(dirty, '{PII_EMAIL}')) AS n_email,
         length(regexp_extract_all(dirty, '{PII_PHONE}')) AS n_phone,
         length(regexp_extract_all(dirty, '{PII_IPV4}')) AS n_ip,
         regexp_replace(
           regexp_replace(
             regexp_replace(dirty, '{PII_EMAIL}', '<EMAIL>', 'g'),
             '{PII_PHONE}', '<PHONE>', 'g'),
           '{PII_IPV4}', '<IP>', 'g') AS redacted
  FROM dirty
)
SELECT lang,
       COUNT(*) AS docs,
       CAST(SUM(n_email) AS BIGINT) AS emails,
       CAST(SUM(n_phone) AS BIGINT) AS phones,
       CAST(SUM(n_ip) AS BIGINT) AS ips,
       CAST(SUM(CASE WHEN n_email = 0 AND n_phone = 0 AND n_ip = 0
           THEN 1 ELSE 0 END) AS BIGINT) AS clean_docs,
       CAST(SUM(length(regexp_extract_all(redacted, '{PII_EMAIL}'))
         + length(regexp_extract_all(redacted, '{PII_PHONE}'))
         + length(regexp_extract_all(redacted, '{PII_IPV4}')))
         AS BIGINT) AS residual_hits,
       CAST(SUM(length(redacted)) AS BIGINT) AS redacted_len_sum
FROM scored GROUP BY lang ORDER BY lang
"""


def corpus_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source blocklist audit: docs, blocked vs kept, and the total
    distinct-blocked-term hits. A doc is blocked when ANY blocklist term
    appears among its tokens (C4's rule); `term_hits` counts distinct
    blocked terms per doc (set semantics), so a term repeated inside one
    doc counts once."""
    hits = F.size(
        F.array_intersect(
            F.array_distinct(_toks()),
            F.array(*[F.lit(t) for t in BLOCKLIST]),
        )
    )
    return (
        _docs(spark, sf_dir)
        .select("source", hits.alias("hits"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.when(F.col("hits") > 0, 1).otherwise(0)).alias(
                "blocked_docs"
            ),
            F.sum(F.when(F.col("hits") == 0, 1).otherwise(0)).alias(
                "kept_docs"
            ),
            F.sum("hits").alias("term_hits"),
        )
        .orderBy("source")
    )


_BL_SQL = "[" + ", ".join(f"'{t}'" for t in BLOCKLIST) + "]"

_ORACLE_BLOCKLIST = f"""
WITH scored AS (
  SELECT source,
         length(list_intersect(
           list_distinct(string_split(
             regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')),
           {_BL_SQL})) AS hits
  FROM documents
)
SELECT source,
       COUNT(*) AS docs,
       CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS blocked_docs,
       CAST(SUM(CASE WHEN hits = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS kept_docs,
       CAST(SUM(hits) AS BIGINT) AS term_hits
FROM scored GROUP BY source ORDER BY source
"""


SPECS = [
    QuerySpec(
        "text_pii_redact",
        text_pii_redact,
        _ORACLE_PII,
        "text",
        "regex PII detection + redaction (email/phone/IPv4) over "
        "deterministically injected PII, per-lang integer audit with a "
        "zero-residual closure proof",
    ),
    QuerySpec(
        "corpus_blocklist_filter",
        corpus_blocklist_filter,
        _ORACLE_BLOCKLIST,
        "text",
        "C4-style blocklist document filter: literal-array "
        "array_intersect verdict (scan-local, zero shuffle), per-source "
        "kept/blocked audit",
    ),
]
