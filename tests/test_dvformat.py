"""Byte-level tests for the spec deletion-vector codec
(sources/dvformat.py): Z85, portable 32-bit roaring containers (array /
bitmap / run), the 64-bit RoaringBitmapArray wrapper, the version-1 DV
file layout (BE dataSize + CRC-32), inline encoding, and hand-built
reference vectors composed byte-by-byte from the PUBLIC spec
(delta-io PROTOCOL.md + RoaringFormatSpec) — no Spark session needed."""

from __future__ import annotations

import struct
import uuid
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from opencode_hive_archon_spark.sources import dvformat as dv


# ---------------------------------------------------------------------------
# Z85
# ---------------------------------------------------------------------------

def test_z85_reference_vector():
    # The ZeroMQ Z85 spec's own test vector (public: rfc.zeromq.org/spec/32).
    assert dv.z85_encode(bytes([0x86, 0x4F, 0xD2, 0x6F,
                                0xB5, 0x59, 0xF7, 0x5B])) == "HelloWorld"
    assert dv.z85_decode("HelloWorld") == bytes(
        [0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B]
    )


def test_z85_roundtrip_uuid():
    u = uuid.uuid4()
    enc = dv.z85_encode(u.bytes)
    assert len(enc) == 20
    assert dv.z85_decode(enc) == u.bytes


def test_z85_rejects_bad_input():
    with pytest.raises(ValueError):
        dv.z85_encode(b"abc")  # not a multiple of 4
    with pytest.raises(ValueError):
        dv.z85_decode("abcd")  # not a multiple of 5
    with pytest.raises(ValueError):
        dv.z85_decode('ab"cd')  # '"' outside the alphabet


# ---------------------------------------------------------------------------
# hand-built reference vectors (bytes composed from the spec, not the code)
# ---------------------------------------------------------------------------

def test_bitmap_array_reference_bytes_array_container():
    """{1, 5, 100000}: one 32-bit bitmap (key 0), two array containers —
    (hi16=0 -> [1, 5]) and (hi16=1 -> [34464]) since 100000 = 1*65536 +
    34464. Expected bytes assembled by hand per RoaringFormatSpec +
    delta-spark's portable RoaringBitmapArray wrapper."""
    expected = (
        struct.pack("<I", 1681511377)      # magic
        + struct.pack("<q", 1)             # number of 32-bit bitmaps
        + struct.pack("<I", 0)             # key of bitmap 0
        # portable 32-bit roaring bitmap:
        + struct.pack("<I", 12346)         # SERIAL_COOKIE_NO_RUNCONTAINER
        + struct.pack("<I", 2)             # container count
        + struct.pack("<HH", 0, 1)         # container 0: key 0, card-1=1
        + struct.pack("<HH", 1, 0)         # container 1: key 1, card-1=0
        + struct.pack("<I", 24)            # offset of container 0
        + struct.pack("<I", 28)            # offset of container 1
        + struct.pack("<HH", 1, 5)         # container 0 values
        + struct.pack("<H", 34464)         # container 1 values
    )
    got = dv.serialize_roaring_bitmap_array({1, 5, 100000})
    assert got == expected
    assert dv.deserialize_roaring_bitmap_array(expected) == {1, 5, 100000}


def test_bitmap_array_reference_bytes_two_keys():
    """A row index above 2^32 forces a second 32-bit bitmap keyed by the
    high word: {7, 2^32 + 3} -> keys 0 and 1."""
    high = (1 << 32) + 3
    expected = (
        struct.pack("<I", 1681511377)
        + struct.pack("<q", 2)
        # bitmap for key 0 -> value 7
        + struct.pack("<I", 0)
        + struct.pack("<I", 12346) + struct.pack("<I", 1)
        + struct.pack("<HH", 0, 0)
        + struct.pack("<I", 16)
        + struct.pack("<H", 7)
        # bitmap for key 1 -> value 3
        + struct.pack("<I", 1)
        + struct.pack("<I", 12346) + struct.pack("<I", 1)
        + struct.pack("<HH", 0, 0)
        + struct.pack("<I", 16)
        + struct.pack("<H", 3)
    )
    got = dv.serialize_roaring_bitmap_array({7, high})
    assert got == expected
    assert dv.deserialize_roaring_bitmap_array(expected) == {7, high}


def test_reader_accepts_run_containers():
    """A foreign (run-optimized) bitmap: rows 10..19 as ONE run. Bytes
    hand-built with the run cookie (12347 | (n-1)<<16), the run bitset,
    and no offset header (below the 4-container threshold)."""
    payload = (
        struct.pack("<I", 1681511377)
        + struct.pack("<q", 1)
        + struct.pack("<I", 0)                 # key
        + struct.pack("<I", 12347 | (0 << 16))  # run cookie, 1 container
        + bytes([0b1])                         # container 0 is a run
        + struct.pack("<HH", 0, 9)             # key 0, cardinality-1 = 9
        + struct.pack("<H", 1)                 # 1 run
        + struct.pack("<HH", 10, 9)            # start 10, length-1 = 9
    )
    assert dv.deserialize_roaring_bitmap_array(payload) == set(range(10, 20))


def test_bitmap_container_roundtrip():
    """>4096 values in one 16-bit chunk switch to a bitmap container
    (8192 fixed bytes) — round-trip and canonical size check."""
    vals = set(range(0, 10000))
    data = dv.serialize_roaring_bitmap_array(vals)
    # container 0 (lo 0..9999) is a bitmap: cookie(4)+count(4)+desc(4)
    # +offset(4)+8192; wrapper: 12 + key 4. Total fixed:
    assert len(data) == 12 + 4 + 4 + 4 + 4 + 4 + 8192
    assert dv.deserialize_roaring_bitmap_array(data) == vals


def test_bad_magic_rejected():
    with pytest.raises(ValueError, match="magic"):
        dv.deserialize_roaring_bitmap_array(
            struct.pack("<I", 99) + struct.pack("<q", 0)
        )


@settings(max_examples=25, deadline=None)
@given(
    st.sets(
        st.one_of(
            st.integers(min_value=0, max_value=1 << 40),
            st.integers(min_value=0, max_value=200_000),
        ),
        max_size=500,
    )
)
def test_bitmap_array_roundtrip_property(indexes):
    data = dv.serialize_roaring_bitmap_array(indexes)
    assert dv.deserialize_roaring_bitmap_array(data) == indexes


# ---------------------------------------------------------------------------
# DV file layout
# ---------------------------------------------------------------------------

def test_dv_file_layout_reference_bytes(tmp_path):
    """Version byte, then per entry: 4-byte BE dataSize + data + 4-byte
    BE CRC-32. Offsets point at each entry's dataSize field."""
    b1 = dv.serialize_roaring_bitmap_array({1, 2, 3})
    b2 = dv.serialize_roaring_bitmap_array({9})
    path = str(tmp_path / "dv.bin")
    offsets = dv.write_dv_file(path, [b1, b2])
    assert offsets == [1, 1 + 4 + len(b1) + 4]
    with open(path, "rb") as fh:
        raw = fh.read()
    expected = (
        bytes([1])
        + struct.pack(">i", len(b1)) + b1
        + struct.pack(">I", zlib.crc32(b1) & 0xFFFFFFFF)
        + struct.pack(">i", len(b2)) + b2
        + struct.pack(">I", zlib.crc32(b2) & 0xFFFFFFFF)
    )
    assert raw == expected
    assert dv.read_dv_entry(path, offsets[0], len(b1)) == b1
    assert dv.read_dv_entry(path, offsets[1], len(b2)) == b2


def test_dv_file_corruption_detected(tmp_path):
    data = dv.serialize_roaring_bitmap_array({4, 5})
    path = str(tmp_path / "dv.bin")
    (off,) = dv.write_dv_file(path, [data])
    raw = bytearray(open(path, "rb").read())
    raw[7] ^= 0xFF  # flip a bitmap byte
    open(path, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="checksum"):
        dv.read_dv_entry(path, off, len(data))
    with pytest.raises(ValueError, match="dataSize"):
        dv.read_dv_entry(path, off, len(data) + 1)


def test_dv_file_bad_version_rejected(tmp_path):
    path = str(tmp_path / "dv.bin")
    open(path, "wb").write(b"\x07rest")
    with pytest.raises(ValueError, match="version"):
        dv.read_dv_entry(path, 1, 4)


# ---------------------------------------------------------------------------
# descriptor helpers
# ---------------------------------------------------------------------------

def test_uuid_path_roundtrip():
    u = uuid.uuid4()
    enc = dv.encode_uuid_path(u, prefix="ab")
    assert len(enc) == 22
    got_u, got_prefix = dv.decode_uuid_path(enc)
    assert (got_u, got_prefix) == (u, "ab")
    assert dv.dv_relative_file_name(u, "ab") == f"ab/deletion_vector_{u}.bin"
    assert dv.dv_relative_file_name(u) == f"deletion_vector_{u}.bin"


def test_inline_pads_and_truncates():
    data = dv.serialize_roaring_bitmap_array({11, 13, 17})  # 38 B, pad 2
    assert len(data) % 4 != 0
    enc = dv.inline_encode(data)
    assert len(enc) % 5 == 0
    assert dv.inline_decode(enc, len(data)) == data
    with pytest.raises(ValueError, match="sizeInBytes"):
        dv.inline_decode(enc, len(enc))
