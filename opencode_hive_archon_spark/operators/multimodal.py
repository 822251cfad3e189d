"""Family 3d — multimodal (binary) column plumbing.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata; decode / feature-extraction runs as Arrow-batched Python over
``mapInPandas``. The Spark-side plumbing — schema, batch iteration,
partition-parallel execution, metadata projection — is real and tested;
the actual codec is STUBBED (no image/audio libraries in this container):
``_decode_stub`` derives deterministic fake dimensions from the payload
bytes and records ``decoder = "stub"``. Swapping in a real decoder changes
only that function.

The binary payloads are synthesized from ``documents.text`` (UTF-8 bytes),
standing in for raw media blobs. Approximate nothing — but the decode stub
is engine-internal, so the driver check is rows-only; pytest pins the
metadata invariants.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opencode_hive_archon_spark.session import read_table as _t
from opencode_hive_archon_spark.spec import QuerySpec

DECODE_SCHEMA = (
    "doc_id long, modality string, n_bytes int, width int, height int, "
    "n_frames int, decoder string"
)


def with_binary_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + synthesized binary payload column + modality tag."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("modality"),
    )


def _decode_stub(payload: bytes, modality: str) -> tuple[int, int, int]:
    """STUB decoder: deterministic fake (width, height, n_frames) from the
    payload. A real build would call PIL / torchaudio / pyav here —
    NotImplementedError semantics documented, shape kept real."""
    n = len(payload)
    w = 16 + (payload[0] if n else 0) % 240
    h = 16 + (payload[-1] if n else 0) % 240
    frames = 1 if modality == "image" else 1 + n % 64
    return w, h, frames


def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract over binary payloads via mapInPandas.

    Arrow batches stream through Python partition-parallel; output rows are
    metadata only (the payload never round-trips back to the JVM) — at
    100 TB this is the pattern that keeps Python I/O bounded.
    """
    payloads = with_binary_payload(spark, sf_dir)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [
                _decode_stub(p, m) for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "n_frames": [m[2] for m in meta],
                    "decoder": "stub",
                }
            )

    return payloads.mapInPandas(decode_batches, schema=DECODE_SCHEMA)


def multimodal_meta_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate the decoded metadata per modality — the downstream shape
    of a media-pipeline profiling job (oracle-checkable because byte
    lengths, not stub dims, drive the aggregates)."""
    docs = _t(spark, sf_dir, "documents")
    tagged = docs.select(
        "doc_id",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.length(F.encode(F.col("text"), "UTF-8")).alias("n_bytes"),
    )
    return (
        tagged.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.min("n_bytes").cast("long").alias("min_bytes"),
            F.max("n_bytes").cast("long").alias("max_bytes"),
        )
        .orderBy("modality")
    )


_ORACLE_META_PROFILE = """
WITH tagged AS (
  SELECT doc_id,
         ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS modality,
         octet_length(encode(text)) AS n_bytes
  FROM documents
)
SELECT modality, count(*) AS n_items,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       min(n_bytes) AS min_bytes, max(n_bytes) AS max_bytes
FROM tagged GROUP BY modality
"""


SPECS = [
    QuerySpec("multimodal_decode_stub", multimodal_decode_stub, None, "multimodal",
              "binary payload decode via mapInPandas (stubbed codec; rows-only)"),
    QuerySpec("multimodal_meta_profile", multimodal_meta_profile, _ORACLE_META_PROFILE,
              "multimodal", "per-modality byte/metadata profile"),
]
