"""Family 3d — multimodal (binary) column plumbing.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata. The synthetic payload carries a REAL, documented 16-byte header::

    bytes 0-3   magic  "SYN0" (ASCII)
    bytes 4-7   width   uint32 big-endian
    bytes 8-11  height  uint32 big-endian
    bytes 12-15 n_frames uint32 big-endian
    bytes 16-   body (the raw media bytes; here the UTF-8 document text)

and the decode step PARSES that header back out of the binary column — no
fake dimensions, no stub codec. Two implementations, same oracle:

- ``multimodal_decode``: pure JVM expressions (``substring``/``hex``/
  ``conv`` on the BINARY column) — stays inside whole-stage codegen, the
  100 TB default for structured containers (RIFF/BMP/ISO-BMFF style headers
  are exactly this shape).
- ``multimodal_decode_arrow``: the SAME parse via ``struct.unpack`` inside
  ``mapInPandas`` — Arrow batches stream through Python partition-parallel,
  and only metadata rows return to the JVM. This is the plumbing a real
  codec (PIL / pyav / torchaudio, not installed in this container) drops
  into: swap the ``struct.unpack`` call for the library decode and the
  schema, batching, and partitioning are already right.

The DuckDB oracle recomputes the header fields from the SOURCE columns (the
header is a deterministic function of doc_id/n_chars/text), so both decode
paths are oracle-EXACT: a parse that drifted by one byte would hash-mismatch.

Reference parity: the reference has no media pipeline (backend holds ≤5 text
rows in process); this family is part of the mandate's LLM-pipeline surface.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from opencode_hive_archon_spark.session import read_table as _t
from opencode_hive_archon_spark.spec import QuerySpec

MAGIC = "SYN0"
HEADER_BYTES = 16
WIDTH_BASE, WIDTH_MOD = 16, 240
HEIGHT_BASE, HEIGHT_MOD, HEIGHT_MULT = 16, 240, 7
FRAMES_MOD = 64

DECODE_SCHEMA = (
    "doc_id long, modality string, codec string, n_bytes int, body_bytes int, "
    "width int, height int, n_frames int"
)


def _modality() -> Column:
    return F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )


def _be32(val: Column) -> Column:
    """uint32 -> 4-byte big-endian binary (hex-encode then unhex)."""
    return F.unhex(F.lpad(F.hex(val.cast("long")), 8, "0"))


def with_binary_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + synthesized binary payload (16-byte header + UTF-8 body)
    + modality tag. The header fields are deterministic functions of the row
    (width from n_chars, height from doc_id, n_frames from modality+body
    length), so decoders can be verified bit-exactly."""
    docs = _t(spark, sf_dir, "documents")
    body = F.encode(F.col("text"), "UTF-8")
    width = F.lit(WIDTH_BASE) + F.pmod(F.col("n_chars"), F.lit(WIDTH_MOD))
    height = F.lit(HEIGHT_BASE) + F.pmod(
        F.col("doc_id") * F.lit(HEIGHT_MULT), F.lit(HEIGHT_MOD)
    )
    modality = _modality()
    frames = F.when(modality == "image", F.lit(1)).otherwise(
        F.lit(1) + F.pmod(F.length(body), F.lit(FRAMES_MOD))
    )
    payload = F.concat(
        F.encode(F.lit(MAGIC), "UTF-8"),
        _be32(width),
        _be32(height),
        _be32(frames),
        body,
    )
    return docs.select(
        "doc_id", payload.alias("payload"), modality.alias("modality")
    )


def _parse_u32(payload: Column, pos: int) -> Column:
    """Parse a big-endian uint32 at 1-based byte offset ``pos``."""
    return F.conv(F.hex(F.substring(payload, pos, 4)), 16, 10).cast("int")


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode the binary header JVM-side: ``substring`` slices the BINARY
    column, ``hex``/``conv`` turn the big-endian words into ints, and the
    magic comes back as the codec tag. Whole plan stays in codegen — zero
    Python, zero shuffle before the presentation sort."""
    payloads = with_binary_payload(spark, sf_dir)
    p = F.col("payload")
    return payloads.select(
        "doc_id",
        "modality",
        F.decode(F.substring(p, 1, 4), "UTF-8").alias("codec"),
        F.length(p).cast("int").alias("n_bytes"),
        (F.length(p) - HEADER_BYTES).cast("int").alias("body_bytes"),
        _parse_u32(p, 5).alias("width"),
        _parse_u32(p, 9).alias("height"),
        _parse_u32(p, 13).alias("n_frames"),
    ).orderBy("doc_id")


def multimodal_decode_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same header parse through the Arrow/Python path: ``mapInPandas``
    batches stream partition-parallel through ``struct.unpack``; only the
    (narrow) metadata rows cross back to the JVM — the payload never
    round-trips. Swapping ``struct.unpack`` for a real media library is the
    ONLY change a production codec needs; schema, batch shape, and
    partitioning are already what it requires."""
    payloads = with_binary_payload(spark, sf_dir)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for raw in pdf["payload"]:
                buf = bytes(raw)
                magic = buf[:4].decode("ascii")
                width, height, frames = struct.unpack(">III", buf[4:HEADER_BYTES])
                metas.append(
                    (magic, len(buf), len(buf) - HEADER_BYTES, width, height, frames)
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "codec": [m[0] for m in metas],
                    "n_bytes": [m[1] for m in metas],
                    "body_bytes": [m[2] for m in metas],
                    "width": [m[3] for m in metas],
                    "height": [m[4] for m in metas],
                    "n_frames": [m[5] for m in metas],
                }
            )

    return (
        payloads.mapInPandas(decode_batches, schema=DECODE_SCHEMA)
        .orderBy("doc_id")
    )


FRAME_SAMPLES = 4  # frames sampled per clip (uniform stride)


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over the decoded payloads: pick ``FRAME_SAMPLES``
    uniformly-strided frame indices per clip (floor(k·n/s), the standard
    video-sampling grid) — the step between decode and per-frame feature
    extraction in a media training pipeline. Pure JVM arithmetic over the
    parsed header; the frame GRID is planned here, the (library-dependent)
    pixel fetch would consume it via the mapInPandas path shown by
    ``multimodal_decode_arrow``.

    The grid is emitted as a comma-joined STRING (not array<bigint>): the
    downstream comparison harness hashes cell values, and a scalar column
    keeps the row hashable everywhere while staying bit-deterministic."""
    decoded = multimodal_decode(spark, sf_dir)
    n_sampled = F.least(F.col("n_frames"), F.lit(FRAME_SAMPLES))
    idx = F.transform(
        F.sequence(F.lit(0), n_sampled - 1),
        lambda k: F.floor(k * F.col("n_frames") / n_sampled),
    )
    return decoded.select(
        "doc_id",
        "modality",
        "n_frames",
        n_sampled.cast("int").alias("n_sampled"),
        F.concat_ws(",", idx.cast("array<string>")).alias("frame_idx"),
    ).orderBy("doc_id")


_ORACLE_FRAME_SAMPLE = f"""
WITH src AS (
  SELECT doc_id,
         ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS modality,
         octet_length(encode(text)) AS body_len
  FROM documents
),
dec AS (
  SELECT doc_id, modality,
         CAST(CASE WHEN modality = 'image' THEN 1
                   ELSE 1 + body_len % {FRAMES_MOD} END AS INT) AS n_frames
  FROM src
)
SELECT doc_id, modality, n_frames,
       CAST(least(n_frames, {FRAME_SAMPLES}) AS INT) AS n_sampled,
       array_to_string(
         [CAST(k * n_frames // least(n_frames, {FRAME_SAMPLES}) AS BIGINT)
          for k in range(0, least(n_frames, {FRAME_SAMPLES}))], ',') AS frame_idx
FROM dec
ORDER BY doc_id
"""


def multimodal_frame_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-payload codec pass: explode each clip into its per-frame table —
    (frame_no, byte offset, frame size, md5 of the frame bytes) — by
    actually reading EVERY payload byte, not just the header.

    Frames tile the body contiguously on the standard uniform grid
    (frame k spans body bytes [k·len/n, (k+1)·len/n)); the checksum proves
    the full payload streamed through the decoder. This is the real-codec
    slot with the stdlib standing in for the media library: swap
    ``hashlib.md5`` for per-frame pixel decode and the schema, Arrow batch
    shape, and metadata-only return (payload bytes never cross back to the
    JVM) are already production-correct.

    Oracle note: DuckDB's ``substring``/``md5`` operate on VARCHAR, so the
    oracle slices the source text by CHARACTER offsets. The corpus is pure
    ASCII at every sf (octet_length == length for all rows — verified), so
    character slices and the engine's byte slices coincide bit-for-bit; a
    non-ASCII corpus would need a blob-capable oracle instead."""
    payloads = with_binary_payload(spark, sf_dir)

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            cols: dict[str, list] = {
                "doc_id": [], "modality": [], "frame_no": [],
                "offset": [], "n_frame_bytes": [], "frame_md5": [],
            }
            for doc_id, modality, raw in zip(
                pdf["doc_id"], pdf["modality"], pdf["payload"]
            ):
                buf = bytes(raw)
                _w, _h, frames = struct.unpack(">III", buf[4:HEADER_BYTES])
                body = buf[HEADER_BYTES:]
                blen = len(body)
                for k in range(frames):
                    lo = k * blen // frames
                    hi = (k + 1) * blen // frames
                    cols["doc_id"].append(doc_id)
                    cols["modality"].append(modality)
                    cols["frame_no"].append(k)
                    cols["offset"].append(HEADER_BYTES + lo)
                    cols["n_frame_bytes"].append(hi - lo)
                    cols["frame_md5"].append(hashlib.md5(body[lo:hi]).hexdigest())
            yield pd.DataFrame(cols)

    return payloads.mapInPandas(
        frame_batches,
        schema="doc_id long, modality string, frame_no int, offset int, "
        "n_frame_bytes int, frame_md5 string",
    ).orderBy("doc_id", "frame_no")


_ORACLE_FRAME_TABLE = f"""
WITH src AS (
  SELECT doc_id,
         ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS modality,
         text, octet_length(encode(text)) AS blen
  FROM documents
),
dec AS (
  SELECT doc_id, modality, text, blen,
         CAST(CASE WHEN modality = 'image' THEN 1
                   ELSE 1 + blen % {FRAMES_MOD} END AS BIGINT) AS n_frames
  FROM src
),
fr AS (
  SELECT doc_id, modality, text, blen, n_frames,
         unnest([k for k in range(0, n_frames)]) AS frame_no
  FROM dec
)
SELECT doc_id, modality, CAST(frame_no AS INT) AS frame_no,
       CAST({HEADER_BYTES} + frame_no * blen // n_frames AS INT) AS offset,
       CAST((frame_no + 1) * blen // n_frames
            - frame_no * blen // n_frames AS INT) AS n_frame_bytes,
       md5(substring(text,
                     CAST(frame_no * blen // n_frames + 1 AS BIGINT),
                     CAST((frame_no + 1) * blen // n_frames
                          - frame_no * blen // n_frames AS BIGINT))) AS frame_md5
FROM fr
ORDER BY doc_id, frame_no
"""


RESIZE_BOX = 224  # target bounding box (the standard vision-model input)


def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize planning over the decoded dimensions: fit each image/frame
    into a ``RESIZE_BOX``² box preserving aspect ratio, never upscaling
    (thumbnail semantics) — the scheduling arithmetic a preprocessing
    pipeline runs BEFORE the pixel-level library call (which would consume
    this plan via the ``multimodal_decode_arrow`` path). Pure JVM; the
    scale factor and output dims are deterministic double arithmetic,
    mirrored exactly by the oracle."""
    decoded = multimodal_decode(spark, sf_dir)
    scale = F.least(
        F.lit(1.0),
        F.least(
            F.lit(float(RESIZE_BOX)) / F.col("width"),
            F.lit(float(RESIZE_BOX)) / F.col("height"),
        ),
    )
    out = lambda c: F.greatest(F.lit(1).cast("long"), F.floor(F.col(c) * scale))
    return decoded.select(
        "doc_id",
        "modality",
        "width",
        "height",
        scale.alias("scale"),
        out("width").alias("out_w"),
        out("height").alias("out_h"),
        (scale < 1.0).alias("downscaled"),
    ).orderBy("doc_id")


_ORACLE_RESIZE_PLAN = f"""
WITH src AS (
  SELECT doc_id,
         ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS modality,
         CAST({WIDTH_BASE} + n_chars % {WIDTH_MOD} AS INT) AS width,
         CAST({HEIGHT_BASE} + (doc_id * {HEIGHT_MULT}) % {HEIGHT_MOD} AS INT) AS height
  FROM documents
),
sc AS (
  SELECT *, least(1.0, least({RESIZE_BOX}.0 / width, {RESIZE_BOX}.0 / height)) AS scale
  FROM src
)
SELECT doc_id, modality, width, height, scale,
       greatest(1, CAST(floor(width * scale) AS BIGINT)) AS out_w,
       greatest(1, CAST(floor(height * scale) AS BIGINT)) AS out_h,
       scale < 1.0 AS downscaled
FROM sc
ORDER BY doc_id
"""


def multimodal_meta_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate the decoded metadata per modality — the downstream shape
    of a media-pipeline profiling job (oracle-checkable because byte
    lengths, not stub dims, drive the aggregates)."""
    docs = _t(spark, sf_dir, "documents")
    tagged = docs.select(
        "doc_id",
        _modality().alias("modality"),
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


# Oracle recomputes the header fields from the source columns — the decoded
# output must equal what the encoder was told to write.
_ORACLE_DECODE = f"""
WITH src AS (
  SELECT doc_id,
         ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS modality,
         octet_length(encode(text)) AS body_len,
         n_chars
  FROM documents
)
SELECT doc_id, modality,
       '{MAGIC}' AS codec,
       CAST(body_len + {HEADER_BYTES} AS INT) AS n_bytes,
       CAST(body_len AS INT) AS body_bytes,
       CAST({WIDTH_BASE} + n_chars % {WIDTH_MOD} AS INT) AS width,
       CAST({HEIGHT_BASE} + (doc_id * {HEIGHT_MULT}) % {HEIGHT_MOD} AS INT) AS height,
       CAST(CASE WHEN modality = 'image' THEN 1
                 ELSE 1 + body_len % {FRAMES_MOD} END AS INT) AS n_frames
FROM src
ORDER BY doc_id
"""

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
    QuerySpec("multimodal_decode", multimodal_decode, _ORACLE_DECODE, "multimodal",
              "binary header decode, pure JVM (substring/hex/conv); oracle-exact"),
    QuerySpec("multimodal_decode_arrow", multimodal_decode_arrow, _ORACLE_DECODE,
              "multimodal",
              "same header decode via Arrow-batched mapInPandas (the real-codec "
              "plumbing); oracle-exact"),
    QuerySpec("multimodal_frame_table", multimodal_frame_table,
              _ORACLE_FRAME_TABLE, "multimodal",
              "full-payload frame-table codec: per-frame offsets/sizes/md5 "
              "via Arrow mapInPandas (metadata-only return)"),
    QuerySpec("multimodal_frame_sample", multimodal_frame_sample,
              _ORACLE_FRAME_SAMPLE, "multimodal",
              "uniform-stride frame-index sampling over decoded clip headers"),
    QuerySpec("multimodal_resize_plan", multimodal_resize_plan,
              _ORACLE_RESIZE_PLAN, "multimodal",
              "aspect-preserving resize planning (fit into 224x224, no "
              "upscale) over decoded dimensions"),
    QuerySpec("multimodal_meta_profile", multimodal_meta_profile, _ORACLE_META_PROFILE,
              "multimodal", "per-modality byte/metadata profile"),
]
