"""Families 4-5 tests: streaming semantics + UDF surface + engine API."""

from __future__ import annotations

from pyspark.sql import functions as F

from opencode_hive_archon_spark.config import RetrievalRequest
from opencode_hive_archon_spark.engine import RecallEngine
from opencode_hive_archon_spark.operators import multimodal as M
from opencode_hive_archon_spark.operators import udfs as U
from opencode_hive_archon_spark.streaming import jobs as J


class TestStreaming:
    def test_tumbling_windows_closed_by_watermark(self, spark, sf_dir):
        rows = J.stream_tumbling_counts(spark, sf_dir).collect()
        assert rows, "expected finalized windows"
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        # raw ts is int64 nanos under the legacy conf
        hi = ev.agg(F.max("ts")).first()[0]
        from opencode_hive_archon_spark.session import read_table

        hi = read_table(spark, sf_dir, "events").agg(F.max("ts")).first()[0]
        import datetime

        wm = hi - datetime.timedelta(minutes=10)
        for r in rows:
            assert r["window_end"] <= wm, "append mode must emit only closed windows"

    def test_sessions_have_positive_span(self, spark, sf_dir):
        rows = J.stream_session_windows(spark, sf_dir).collect()
        assert rows
        for r in rows[:100]:
            assert r["session_end"] > r["session_start"]
            assert r["n_events"] >= 1

    def test_stream_dedup_is_distinct(self, spark, sf_dir):
        df = J.stream_dedup(spark, sf_dir)
        assert df.count() == df.distinct().count()

    def test_late_data_dropped(self, spark, sf_dir):
        """Held-back rows (event_id % 199 == 0, first half of the span)
        arrive after the watermark passed them -> excluded from counts."""
        streamed = J.stream_late_data(spark, sf_dir)
        n_streamed = streamed.agg(F.sum("n_events")).first()[0]
        from opencode_hive_archon_spark.session import read_table

        ev = read_table(spark, sf_dir, "events")
        n_total = ev.count()
        lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
        import datetime

        cut = lo + datetime.timedelta(seconds=(hi - lo).total_seconds() / 2)
        n_held = ev.filter(
            (F.col("ts") < F.lit(cut)) & (F.col("event_id") % 199 == 0)
        ).count()
        assert n_held > 0
        # Some final windows are also unclosed at end-of-stream; the late
        # rows must be missing at minimum.
        assert n_streamed <= n_total - n_held


class TestUdfs:
    def test_scalar_clamp_matches_builtin(self, spark, sf_dir):
        from opencode_hive_archon_spark.operators.recall import scored_candidates

        udf_rows = {
            r["doc_id"]: r["confidence"]
            for r in U.udf_scalar_clamp(spark, sf_dir).collect()
        }
        builtin_rows = {
            r["id"]: r["confidence"] for r in scored_candidates(spark, sf_dir).collect()
        }
        assert udf_rows == builtin_rows

    def test_grouped_normalize_stats(self, spark, sf_dir):
        rows = U.udaf_grouped_normalize(spark, sf_dir).collect()
        by_group = {}
        for r in rows:
            by_group.setdefault(r["o_orderpriority"], []).append(r["z"])
        for zs in by_group.values():
            assert abs(sum(zs) / len(zs)) < 1e-9  # z-scores mean ~ 0

    def test_udtf_token_positions(self, spark, sf_dir):
        df = U.udtf_explode_tokens(spark, sf_dir)
        first = df.filter(F.col("doc_id") == 0).orderBy("pos").collect()
        assert first[0]["pos"] == 1
        assert all(t["token"] for t in first)


class TestMultimodal:
    def test_decode_header_parse(self, spark, sf_dir):
        rows = M.multimodal_decode(spark, sf_dir).collect()
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        assert len(rows) == n_docs
        for r in rows[:50]:
            assert r["codec"] == M.MAGIC
            assert r["n_bytes"] == r["body_bytes"] + M.HEADER_BYTES
            assert 16 <= r["width"] <= 255 and 16 <= r["height"] <= 255
            assert (r["modality"] == "image") == (r["n_frames"] == 1)

    def test_decode_arrow_matches_jvm(self, spark, sf_dir):
        """The Python struct.unpack path must agree byte-for-byte with the
        JVM substring/conv path — same header, two decoders."""
        jvm = M.multimodal_decode(spark, sf_dir).collect()
        arrow = M.multimodal_decode_arrow(spark, sf_dir).collect()
        assert [tuple(r) for r in jvm] == [tuple(r) for r in arrow]


class TestRecallEngine:
    def test_success_path(self, spark, sf_dir):
        eng = RecallEngine(spark, sf_dir)
        row = eng.recall(RetrievalRequest(query="fast hash join")).first()
        assert row["provider"] == "mem0"
        assert row["branch"] in ("RERANK_BYPASSED", "SUCCESS", "LOW_CONFIDENCE")
        assert row["candidate_count"] == 5

    def test_blank_query_short_circuit(self, spark, sf_dir):
        eng = RecallEngine(spark, sf_dir)
        row = eng.recall(RetrievalRequest(query="   ")).first()
        assert row["branch"] == "EMPTY_SET"
        assert row["action"] == "fallback"
        assert row["candidates_json"] == "[]"

    def test_no_provider_empty_set(self, spark, sf_dir):
        eng = RecallEngine(
            spark, sf_dir,
            feature_flags={"mem0_enabled": False, "supabase_enabled": False},
        )
        row = eng.recall(RetrievalRequest(query="anything")).first()
        assert row["branch"] == "EMPTY_SET" and row["provider"] == "none"

    def test_override_routes_supabase(self, spark, sf_dir):
        eng = RecallEngine(spark, sf_dir)
        row = eng.recall(
            RetrievalRequest(query="fast hash join", provider_override="supabase")
        ).first()
        assert row["provider"] == "supabase"
        # non-mem0 + bypassed=False => SUCCESS branch on confident results
        assert row["branch"] in ("SUCCESS", "LOW_CONFIDENCE")
