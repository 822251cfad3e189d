"""Invariants for the PII redaction + blocklist filter operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from opencode_hive_archon_spark.operators.pii import (
    BLOCKLIST,
    PII_EMAIL,
    PII_IPV4,
    PII_PHONE,
    _with_injected_pii,
    corpus_blocklist_filter,
    text_pii_redact,
)
from opencode_hive_archon_spark.operators.textops import _docs


def test_pii_redaction_closes_and_covers_both_branches(spark, sf_dir):
    """The audit's closure proof holds (zero residual detections over
    the redacted text), clean docs exist (the no-PII branch runs), and
    every per-kind total is positive (every pattern fired somewhere)."""
    rows = text_pii_redact(spark, sf_dir).collect()
    assert rows, "empty audit"
    assert sum(r["emails"] for r in rows) > 0
    assert sum(r["phones"] for r in rows) > 0
    assert sum(r["ips"] for r in rows) > 0
    assert sum(r["clean_docs"] for r in rows) > 0
    for r in rows:
        assert r["residual_hits"] == 0, r["lang"]
        assert 0 <= r["clean_docs"] <= r["docs"]


def test_pii_injection_matches_detection_arithmetic(spark, sf_dir):
    """Detection totals equal the doc_id-arithmetic injection plan:
    emails on doc_id % 2 == 0, phones on % 3 == 0, IPv4s on % 5 == 0 —
    the organic corpus contributes ZERO hits, so regex counts are exact."""
    ids = [r["doc_id"] for r in _docs(spark, sf_dir).select("doc_id").collect()]
    audit = text_pii_redact(spark, sf_dir).collect()
    assert sum(r["emails"] for r in audit) == sum(1 for i in ids if i % 2 == 0)
    assert sum(r["phones"] for r in audit) == sum(1 for i in ids if i % 3 == 0)
    assert sum(r["ips"] for r in audit) == sum(1 for i in ids if i % 5 == 0)


def test_pii_redaction_preserves_non_pii_text(spark, sf_dir):
    """Redaction touches ONLY the spliced PII: stripping the three
    placeholder tokens from the redacted text of an all-kinds doc
    (doc_id % 30 == 0) reproduces the original text exactly."""
    dirty = _with_injected_pii(_docs(spark, sf_dir)).filter(
        (F.col("doc_id") % 30 == 0)
    )
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("dirty"), PII_EMAIL, "<EMAIL>"),
            PII_PHONE, "<PHONE>",
        ),
        PII_IPV4, "<IP>",
    )
    got = dirty.select(
        "text",
        F.regexp_replace(
            red,
            r" contact <EMAIL> call <PHONE> from <IP>",
            "",
        ).alias("stripped"),
    ).limit(20).collect()
    assert got
    for r in got:
        assert r["stripped"] == r["text"]


def test_blocklist_partition_of_corpus(spark, sf_dir):
    """blocked + kept partitions every source's docs; hits are bounded
    by |BLOCKLIST| per doc; both verdict branches occur corpus-wide."""
    rows = corpus_blocklist_filter(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["blocked_docs"] + r["kept_docs"] == r["docs"], r["source"]
        assert r["term_hits"] <= r["docs"] * len(BLOCKLIST)
        assert r["term_hits"] >= r["blocked_docs"]  # blocked => >=1 hit
    assert sum(r["blocked_docs"] for r in rows) > 0
    assert sum(r["kept_docs"] for r in rows) > 0
