"""Planted-corpus semantics for the exact-substring span dedup operator."""

from pyspark.sql import functions as F

from opencode_hive_archon_spark.operators.spandedup import (
    SPAN_NGRAM,
    span_dedup_report,
)

SHARED = "alpha beta gamma delta epsilon zeta eta theta"  # exactly 8 tokens


def _report(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    return {
        r["doc_id"]: r.asDict() for r in span_dedup_report(df).collect()
    }


def test_shared_span_coverage(spark):
    assert len(SHARED.split()) == SPAN_NGRAM
    rows = [
        (1, "en", SHARED + " tail1 tail2"),
        (2, "en", SHARED + " other words here now"),
        (3, "en", "unique word soup totally different from errything else entirely"),
        (4, "en", "short doc"),
    ]
    out = _report(spark, rows)
    # d1: 10 tokens, grams at s=1..3, only s=1 (the shared span) duplicated
    assert out[1]["n_tokens"] == 10 and out[1]["n_grams"] == 3
    assert out[1]["n_dup_grams"] == 1 and out[1]["dup_tokens"] == 8
    assert abs(out[1]["dup_token_ratio"] - 0.8) < 1e-12
    assert out[1]["keep"] is False  # 16 <= 10 fails: mostly duplicated
    # d2: 12 tokens, same single duplicated gram, 8/12 covered -> still drop
    assert out[2]["dup_tokens"] == 8 and out[2]["keep"] is False
    # d3: no cross-doc span
    assert out[3]["n_dup_grams"] == 0 and out[3]["dup_tokens"] == 0
    assert out[3]["keep"] is True
    # d4: shorter than the gram width -> zero grams, kept
    assert out[4]["n_grams"] == 0 and out[4]["dup_tokens"] == 0
    assert out[4]["keep"] is True


def test_identical_docs_fully_covered(spark):
    text = "one two three four five six seven eight nine ten"
    out = _report(spark, [(1, "en", text), (2, "en", text)])
    for d in (1, 2):
        assert out[d]["dup_tokens"] == out[d]["n_tokens"] == 10
        assert out[d]["dup_token_ratio"] == 1.0
        assert out[d]["keep"] is False


def test_overlapping_spans_union_not_sum(spark):
    # d1 shares TWO OVERLAPPING grams with d2 (a 9-token common prefix):
    # covered positions are the UNION [1..9], not 2 * SPAN_NGRAM.
    common = SHARED + " iota"
    out = _report(
        spark,
        [(1, "en", common + " tail1 tail2"), (2, "en", common + " different end")],
    )
    assert out[1]["n_dup_grams"] == 2
    assert out[1]["dup_tokens"] == 9


def test_within_doc_repeat_is_not_duplication(spark):
    # The same span twice in ONE doc has document frequency 1: span dedup
    # measures cross-doc duplication (within-doc repetition is
    # text_repetition_stats' job).
    out = _report(
        spark,
        [
            (1, "en", SHARED + " filler " + SHARED),
            (2, "en", "entirely disjoint vocabulary with no overlapping span at all"),
        ],
    )
    assert out[1]["n_dup_grams"] == 0 and out[1]["keep"] is True


def test_span_dedup_plan_shape(spark, sf_dir):
    """Scale pins for the span-dedup plan: no cartesian/nested-loop join
    anywhere (span dedup must never form doc x doc pairs), the duplicated-
    gram filter is a semi join (only gram_h rides back, never a dup-gram
    payload), and the gram aggregate is two-phase (map-side partial)."""
    from opencode_hive_archon_spark.operators.spandedup import corpus_span_dedup

    df = corpus_span_dedup(spark, sf_dir)
    p = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoop" not in p
    assert "LeftSemi" in p
    assert "partial_count" in p or "partial_finalmerge" in p or "HashAggregate" in p
