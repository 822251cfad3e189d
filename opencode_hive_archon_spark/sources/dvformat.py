"""Spec-conformant Delta deletion-vector serialization.

Implements the PUBLIC Delta Lake protocol's deletion-vector byte formats
(delta-io PROTOCOL.md "Deletion Vectors" + the RoaringBitmapArray layout
delta-spark serializes, itself built on the public RoaringFormatSpec):

- **Z85 codec** — the ZeroMQ base85 variant Delta uses for descriptor
  fields (JSON-safe alphabet; 4 bytes -> 5 chars, big-endian groups).
- **32-bit portable RoaringBitmap** — RoaringFormatSpec serialization:
  no-run cookie 12346 / run cookie 12347, descriptive header,
  offset header, array / bitmap / run containers (little-endian).
  The WRITER emits canonical array (<=4096 values) and bitmap
  containers with the no-run cookie — always legal; the READER accepts
  all three container kinds, so foreign (run-optimized) DVs decode.
- **RoaringBitmapArray "portable" format** — the 64-bit wrapper
  delta-spark stores: magic 1681511377 (4 bytes LE), number of 32-bit
  bitmaps (8 bytes LE), then per bitmap a 4-byte LE key (the row
  index's high 32 bits) + the 32-bit portable bitmap.
- **DV file layout** — version byte 1, then per stored DV a 4-byte
  BIG-endian dataSize, the bitmap bytes, and a 4-byte BIG-endian
  CRC-32 of those bytes (JVM DataOutputStream convention). A
  descriptor's `offset` points at its entry's dataSize field;
  `sizeInBytes` is the bitmap byte count (not the file size).
- **Descriptor assembly / resolution** for the spec's three storage
  types: `u` (table-relative file named by a Z85 UUID, optional random
  prefix), `i` (inline: Z85 of the bitmap bytes, zero-padded to a
  4-byte multiple, truncated on decode via sizeInBytes), and `p`
  (absolute path — what shallow CLONE emits so the target can keep
  reading the source's DV file).

Everything here is pure stdlib (struct/zlib/uuid/os) so executor-side
DV building (`applyInPandas` tasks writing their own files) can import
it without dragging the driver-side log machinery along.

The reference repo (/root/reference) has no storage layer; this module
is north-star lakehouse capability per SURVEY.md §2B, VERDICT r16 #2.
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib

# ---------------------------------------------------------------------------
# Z85 (ZeroMQ base85) — the variant Delta's Base85Codec uses
# ---------------------------------------------------------------------------

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_ALPHABET)}


def z85_encode(data: bytes) -> str:
    """Z85 text of `data`; length must be a multiple of 4 (pad upstream
    — the DV inline path pads with zeros and truncates on decode via
    sizeInBytes, exactly like delta-spark's Base85Codec)."""
    if len(data) % 4:
        raise ValueError(f"z85 input length {len(data)} not a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        (word,) = struct.unpack(">I", data[i:i + 4])
        chunk = []
        for _ in range(5):
            word, rem = divmod(word, 85)
            chunk.append(_Z85_ALPHABET[rem])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError(f"z85 text length {len(text)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        word = 0
        for c in text[i:i + 5]:
            try:
                word = word * 85 + _Z85_INDEX[c]
            except KeyError:
                raise ValueError(f"invalid z85 character {c!r}") from None
        if word > 0xFFFFFFFF:
            raise ValueError("z85 group overflows 32 bits")
        out += struct.pack(">I", word)
    return bytes(out)


# ---------------------------------------------------------------------------
# 32-bit portable RoaringBitmap (RoaringFormatSpec)
# ---------------------------------------------------------------------------

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4  # with the run cookie, <4 containers omit offsets
_ARRAY_MAX = 4096  # canonical array/bitmap container boundary


def _serialize_roaring32(values: list[int]) -> bytes:
    """Portable bytes of a 32-bit bitmap from SORTED unique `values`.
    Canonical no-run form: array container <=4096 values, else bitmap."""
    # Split into 16-bit-key containers preserving sort order.
    containers: list[tuple[int, list[int]]] = []
    for v in values:
        hi, lo = v >> 16, v & 0xFFFF
        if containers and containers[-1][0] == hi:
            containers[-1][1].append(lo)
        else:
            containers.append((hi, [lo]))
    n = len(containers)
    header = struct.pack("<I", _SERIAL_COOKIE_NO_RUN) + struct.pack("<I", n)
    desc = b"".join(
        struct.pack("<HH", key, len(vals) - 1) for key, vals in containers
    )
    # Offsets are from the START of this serialized bitmap.
    base = len(header) + len(desc) + 4 * n
    bodies: list[bytes] = []
    offsets: list[int] = []
    pos = base
    for _, vals in containers:
        if len(vals) <= _ARRAY_MAX:
            body = struct.pack(f"<{len(vals)}H", *vals)
        else:
            words = [0] * 1024
            for lo in vals:
                words[lo >> 6] |= 1 << (lo & 63)
            body = struct.pack("<1024Q", *words)
        offsets.append(pos)
        bodies.append(body)
        pos += len(body)
    return (
        header
        + desc
        + struct.pack(f"<{n}I", *offsets)
        + b"".join(bodies)
    )


def _deserialize_roaring32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """Decode one portable 32-bit bitmap at `buf[pos:]`; returns (sorted
    values, next position). Accepts array, bitmap AND run containers."""
    start = pos
    (cookie,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    run_flags = b""
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        nbytes = (n + 7) // 8
        run_flags = buf[pos:pos + nbytes]
        pos += nbytes
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        has_offsets = True
    else:
        raise ValueError(f"bad roaring cookie {cookie}")
    keys: list[int] = []
    cards: list[int] = []
    for _ in range(n):
        key, card_m1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        keys.append(key)
        cards.append(card_m1 + 1)
    if has_offsets:
        pos += 4 * n  # trust sequential layout; offsets are redundant here
    values: list[int] = []
    for i in range(n):
        key, card = keys[i], cards[i]
        base = key << 16
        is_run = bool(run_flags) and bool(run_flags[i >> 3] & (1 << (i & 7)))
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                lo, length_m1 = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(range(base + lo, base + lo + length_m1 + 1))
        elif card <= _ARRAY_MAX:
            values.extend(
                base + v
                for v in struct.unpack_from(f"<{card}H", buf, pos)
            )
            pos += 2 * card
        else:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    b = w & -w
                    values.append(base + (wi << 6) + b.bit_length() - 1)
                    w ^= b
    del start
    return values, pos


# ---------------------------------------------------------------------------
# 64-bit RoaringBitmapArray (delta-spark portable format)
# ---------------------------------------------------------------------------

MAGIC_NUMBER = 1681511377


def serialize_roaring_bitmap_array(indexes) -> bytes:
    """Portable RoaringBitmapArray bytes of the row indexes (any
    iterable of non-negative ints < 2^63)."""
    idx = sorted({int(i) for i in indexes})
    if idx and idx[0] < 0:
        raise ValueError("negative row index")
    # Group by high-32 key, preserving order.
    groups: list[tuple[int, list[int]]] = []
    for v in idx:
        hi, lo = v >> 32, v & 0xFFFFFFFF
        if groups and groups[-1][0] == hi:
            groups[-1][1].append(lo)
        else:
            groups.append((hi, [lo]))
    out = struct.pack("<I", MAGIC_NUMBER) + struct.pack("<q", len(groups))
    for key, vals in groups:
        out += struct.pack("<I", key) + _serialize_roaring32(vals)
    return out


def deserialize_roaring_bitmap_array(buf: bytes) -> set[int]:
    if len(buf) < 12:
        raise ValueError("deletion vector bitmap too short")
    (magic,) = struct.unpack_from("<I", buf, 0)
    if magic != MAGIC_NUMBER:
        raise ValueError(
            f"bad RoaringBitmapArray magic {magic} (want {MAGIC_NUMBER})"
        )
    (n_bitmaps,) = struct.unpack_from("<q", buf, 4)
    pos = 12
    out: set[int] = set()
    for _ in range(n_bitmaps):
        (key,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        vals, pos = _deserialize_roaring32(buf, pos)
        base = key << 32
        out.update(base + v for v in vals)
    return out


# ---------------------------------------------------------------------------
# DV file layout + descriptor assembly
# ---------------------------------------------------------------------------

DV_FORMAT_VERSION = 1
STORAGE_UUID = "u"
STORAGE_INLINE = "i"
STORAGE_ABSOLUTE = "p"
_ENCODED_UUID_LEN = 20  # z85 of 16 bytes


def wrap_dv_entry(data: bytes) -> bytes:
    """One on-disk DV entry: BE dataSize + data + BE CRC-32(data)."""
    return (
        struct.pack(">i", len(data))
        + data
        + struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
    )


def write_dv_file(path: str, bitmaps: list[bytes]) -> list[int]:
    """Write a spec DV file holding `bitmaps` (each a serialized
    RoaringBitmapArray); returns each entry's descriptor `offset`.
    Atomic (tmp + rename)."""
    offsets: list[int] = []
    payload = bytearray([DV_FORMAT_VERSION])
    for data in bitmaps:
        offsets.append(len(payload))
        payload += wrap_dv_entry(data)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(bytes(payload))
    os.replace(tmp, path)
    return offsets


def read_dv_entry(path: str, offset: int, size_in_bytes: int) -> bytes:
    """The bitmap bytes of one DV entry, with the reader-side checks a
    real Delta reader performs: stored dataSize must equal the
    descriptor's sizeInBytes, CRC must verify."""
    with open(path, "rb") as fh:
        head = fh.read(1)
        if not head or head[0] != DV_FORMAT_VERSION:
            raise ValueError(
                f"bad DV file format version {head!r} in {path}"
            )
        fh.seek(offset)
        (stored,) = struct.unpack(">i", fh.read(4))
        if stored != size_in_bytes:
            raise ValueError(
                f"DV dataSize {stored} != descriptor sizeInBytes "
                f"{size_in_bytes} in {path}@{offset}"
            )
        data = fh.read(stored)
        if len(data) != stored:
            raise ValueError(f"truncated DV entry in {path}@{offset}")
        (crc,) = struct.unpack(">I", fh.read(4))
    actual = zlib.crc32(data) & 0xFFFFFFFF
    if crc != actual:
        raise ValueError(
            f"DV checksum mismatch in {path}@{offset}: "
            f"stored {crc} computed {actual}"
        )
    return data


def dv_relative_file_name(dv_uuid: _uuid.UUID, prefix: str = "") -> str:
    """Table-relative path of a 'u' DV file (spec naming)."""
    name = f"deletion_vector_{dv_uuid}.bin"
    return f"{prefix}/{name}" if prefix else name


def encode_uuid_path(dv_uuid: _uuid.UUID, prefix: str = "") -> str:
    """The pathOrInlineDv value for storageType 'u': optional prefix
    chars followed by the z85-encoded UUID (always 20 chars)."""
    return prefix + z85_encode(dv_uuid.bytes)


def decode_uuid_path(path_or_inline: str) -> tuple[_uuid.UUID, str]:
    """(UUID, prefix) from a 'u' pathOrInlineDv."""
    if len(path_or_inline) < _ENCODED_UUID_LEN:
        raise ValueError(f"'u' pathOrInlineDv too short: {path_or_inline!r}")
    prefix = path_or_inline[:-_ENCODED_UUID_LEN]
    raw = z85_decode(path_or_inline[-_ENCODED_UUID_LEN:])
    return _uuid.UUID(bytes=raw), prefix


def inline_encode(data: bytes) -> str:
    """Z85 of `data` zero-padded to a 4-byte multiple (decode truncates
    back via the descriptor's sizeInBytes)."""
    pad = (-len(data)) % 4
    return z85_encode(data + b"\x00" * pad)


def inline_decode(text: str, size_in_bytes: int) -> bytes:
    raw = z85_decode(text)
    if size_in_bytes > len(raw):
        raise ValueError(
            f"inline DV sizeInBytes {size_in_bytes} exceeds decoded "
            f"length {len(raw)}"
        )
    return raw[:size_in_bytes]
