"""RAG-prep document chunking (round 9).

``corpus_chunk_overlap`` — the retrieval-ingestion operator every RAG
pipeline runs: split each document into fixed-size character windows with
overlap, emitting the actual chunk table (doc_id, chunk_idx, offsets,
text). The window grid is INTEGER arithmetic end to end:

    n_chunks = 1 + ceil(max(0, n − size) / stride)
    start_i  = i · stride          (1-based substring, i = 0 .. n_chunks−1)

so both engines cut identical chunks (substring is 1-based and
length-clamped in Spark and DuckDB alike). The last chunk is allowed to
run short rather than re-anchoring to the tail — re-anchored tails
duplicate content at a data-dependent offset, which poisons exact dedup
downstream; the short-tail rule keeps every chunk start on the stride
grid (and the span-dedup operator, operators/spandedup.py, stays
applicable to the chunk table unchanged).

Scale: explode over sequence(0, n_chunks−1) fans out each document to its
own chunk count — output is corpus-sized times the overlap factor
(size/stride), embarrassingly parallel, no shuffle at all until the
presentation sort; at 100 TB this is a mapper-only job feeding the
embedding stage (udf_embed_batch_inference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opencode_hive_archon_spark.session import read_table as _t
from opencode_hive_archon_spark.spec import QuerySpec

__all__ = ["corpus_chunk_overlap", "CHUNK_SIZE", "CHUNK_STRIDE", "SPECS"]

CHUNK_SIZE = 256
CHUNK_STRIDE = 192  # 64-char overlap between consecutive chunks


def corpus_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chunk table: one row per (doc, window), with grid-exact
    offsets and the chunk text itself."""
    return chunk_table(_t(spark, sf_dir, "documents"))


def chunk_table(documents: DataFrame) -> DataFrame:
    """Chunk grid over a (doc_id, lang, text) frame — factored so tests
    can plant exact-length documents on the grid boundaries."""
    docs = documents.select(
        "doc_id", "lang", "text", F.length("text").alias("n")
    )
    n_chunks = (
        F.lit(1)
        + F.ceil(
            F.greatest(F.col("n") - CHUNK_SIZE, F.lit(0)) / CHUNK_STRIDE
        ).cast("long")
    )
    chunks = docs.select(
        "doc_id",
        "lang",
        "text",
        "n",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    start = (F.col("chunk_idx") * CHUNK_STRIDE).cast("long")
    chunk_text = F.substring(F.col("text"), (start + 1).cast("int"), CHUNK_SIZE)
    return chunks.select(
        "doc_id",
        "lang",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        (start + 1).alias("chunk_start"),
        F.length(chunk_text).cast("long").alias("chunk_len"),
        chunk_text.alias("chunk_text"),
    ).orderBy("doc_id", "chunk_idx")


_ORACLE_CHUNKS = f"""
WITH docs AS (
  SELECT doc_id, lang, text, length(text) AS n FROM documents
),
grids AS (
  SELECT doc_id, lang, text,
         unnest(range(1 + CAST(ceil(greatest(n - {CHUNK_SIZE}, 0)
                                    / {CHUNK_STRIDE}.0) AS BIGINT)))
           AS chunk_idx
  FROM docs
)
SELECT doc_id, lang,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(chunk_idx * {CHUNK_STRIDE} + 1 AS BIGINT) AS chunk_start,
       CAST(length(substring(text, CAST(chunk_idx * {CHUNK_STRIDE} + 1 AS INT),
                             {CHUNK_SIZE})) AS BIGINT) AS chunk_len,
       substring(text, CAST(chunk_idx * {CHUNK_STRIDE} + 1 AS INT),
                 {CHUNK_SIZE}) AS chunk_text
FROM grids
ORDER BY doc_id, chunk_idx
"""


SPECS = [
    QuerySpec(
        "corpus_chunk_overlap", corpus_chunk_overlap, _ORACLE_CHUNKS, "text",
        "RAG-prep chunking: fixed 256-char windows at stride 192, "
        "integer grid offsets, short-tail rule (no re-anchored "
        "duplicates), mapper-only fan-out via sequence+explode"),
]
