"""Deletion-vector codec conformance (deletion_vectors.py): Z85,
RoaringBitmapArray portable serialization, and the DV file layout are
pinned BYTE-FOR-BYTE against values hand-derived from the public specs
(Delta PROTOCOL.md "Deletion Vector Format", RoaringFormatSpec, ZeroMQ
RFC 32) — not merely self-roundtripped — so a silent format
re-definition shows up as a changed constant. No external Delta
reader/writer is installable in this sandbox to machine-check parity
(docs/SCALE.md), which is exactly why these pins exist."""

from __future__ import annotations

import struct
import uuid
import zlib

import pytest

from olist_lakehouse_2_0_spark.deletion_vectors import (
    DV_FILE_FORMAT_VERSION,
    ROARING_ARRAY_MAGIC,
    deleted_rows_df,
    deserialize_roaring_array,
    dv_relative_path,
    load_dv_bitmap,
    make_inline_descriptor,
    make_uuid_descriptor,
    pack_dv_file,
    serialize_roaring_array,
    unpack_dv,
    z85_decode,
    z85_encode,
)


def test_z85_rfc32_test_vector():
    # the normative 8-byte vector from ZeroMQ RFC 32
    data = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert z85_encode(data) == "HelloWorld"
    assert z85_decode("HelloWorld") == data


def test_z85_padding_roundtrip():
    # Delta's codec zero-pads to 4-byte multiples; out_len truncates
    raw = b"\x01\x02\x03\x04\x05"
    enc = z85_encode(raw)
    assert len(enc) == 10
    assert z85_decode(enc, 5) == raw
    assert z85_decode(enc) == raw + b"\x00\x00\x00"
    with pytest.raises(ValueError, match="multiple of 5"):
        z85_decode("abc")
    with pytest.raises(ValueError, match="invalid Z85"):
        z85_decode("abcd,")
    with pytest.raises(ValueError, match="inconsistent"):
        z85_decode(enc, 1)  # claims >= 4 bytes of padding


def test_roaring_array_bytes_pinned():
    """serialize_roaring_array([1,2,3]) byte-for-byte: magic
    1681511377 LE + int64 count 1, then one 32-bit bitmap in the
    no-run portable form — cookie 12346, container count 1,
    descriptive header (key 0, cardinality-1 = 2), offset header
    (first container at byte 16 of the bitmap), array container
    [1,2,3] as uint16 LE."""
    expected = (
        struct.pack("<Iq", 1681511377, 1)
        + struct.pack("<II", 12346, 1)
        + struct.pack("<HH", 0, 2)
        + struct.pack("<I", 16)
        + struct.pack("<HHH", 1, 2, 3)
    )
    got = serialize_roaring_array([1, 2, 3])
    assert got == expected
    assert got.hex() == (
        "d1d3396401000000000000003a30000001000000"
        "0000020010000000010002000300"
    )
    assert ROARING_ARRAY_MAGIC == 1681511377


def test_roaring_decodes_run_containers_and_run_cookie():
    """A foreign writer (the official RoaringBitmap library, which
    delta-spark uses) may emit run containers under cookie 12347 with
    NO offset header below 4 containers — hand-built here, never
    produced by this repo's encoder."""
    rb = (
        struct.pack("<I", 12347)  # run cookie, containers-1 = 0
        + b"\x01"  # run-flag bitset: container 0 is a run
        + struct.pack("<HH", 0, 5)  # key 0, cardinality-1
        + struct.pack("<H", 1)  # one run
        + struct.pack("<HH", 5, 5)  # start 5, length-1 5
    )
    arr = struct.pack("<Iq", 1681511377, 1) + rb
    assert list(deserialize_roaring_array(arr)) == [5, 6, 7, 8, 9, 10]


def test_roaring_roundtrip_bitmap_containers_and_high_slots():
    # >4096 values in one 64Ki range forces a bitmap container;
    # values above 2^32 exercise the position-implicit slot keys
    # (slot gaps serialize as empty bitmaps)
    vals = list(range(0, 10000, 2)) + [(1 << 32) + 7, (3 << 32) + 9]
    out = deserialize_roaring_array(serialize_roaring_array(vals))
    assert list(out) == sorted(vals)
    assert list(deserialize_roaring_array(serialize_roaring_array([]))) == []


def test_roaring_rejects_bad_magic_and_trailing_bytes():
    with pytest.raises(ValueError, match="magic"):
        deserialize_roaring_array(struct.pack("<Iq", 99, 0))
    ok = serialize_roaring_array([1])
    with pytest.raises(ValueError, match="trailing"):
        deserialize_roaring_array(ok + b"\x00")


def test_roaring_property_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        st.sets(
            st.one_of(
                st.integers(0, 1 << 17),
                st.integers((1 << 32) - 50, (1 << 32) + 50),
                st.integers(0, (1 << 34)),
            ),
            max_size=300,
        )
    )
    def check(vals):
        out = deserialize_roaring_array(serialize_roaring_array(vals))
        assert list(out) == sorted(vals)

    check()


def test_dv_file_layout_pinned():
    """DV file: version byte 1, then per DV <size BE><bitmap><crc32 BE
    of the bitmap> at the descriptor offset; sizeInBytes is the bitmap
    length alone (PROTOCOL.md 'Deletion Vector File Storage Format')."""
    bm1 = serialize_roaring_array([0, 2])
    bm2 = serialize_roaring_array([1])
    file_bytes, slots = pack_dv_file([bm1, bm2])
    assert file_bytes[0] == DV_FILE_FORMAT_VERSION == 1
    assert slots[0] == {
        "offset": 1, "sizeInBytes": len(bm1), "cardinality": 2,
    }
    assert slots[1]["offset"] == 1 + 4 + len(bm1) + 4
    # the wrapper fields, byte for byte
    assert file_bytes[1:5] == struct.pack(">i", len(bm1))
    assert file_bytes[5:5 + len(bm1)] == bm1
    assert file_bytes[5 + len(bm1):9 + len(bm1)] == struct.pack(
        ">I", zlib.crc32(bm1) & 0xFFFFFFFF
    )
    assert unpack_dv(file_bytes, 1, len(bm1)) == bm1
    assert unpack_dv(
        file_bytes, slots[1]["offset"], len(bm2)
    ) == bm2


def test_dv_unpack_refuses_corruption():
    bm = serialize_roaring_array([4])
    file_bytes, slots = pack_dv_file([bm])
    flipped = bytearray(file_bytes)
    flipped[20] ^= 0xFF
    with pytest.raises(ValueError, match="checksum"):
        unpack_dv(bytes(flipped), 1, len(bm))
    with pytest.raises(ValueError, match="size mismatch"):
        unpack_dv(file_bytes, 1, len(bm) + 2)
    with pytest.raises(ValueError, match="format version"):
        unpack_dv(b"\x02" + file_bytes[1:], 1, len(bm))


def test_uuid_descriptor_path_derivation():
    u = uuid.UUID("12345678-1234-5678-1234-567812345678")
    d = make_uuid_descriptor(u, offset=1, size_in_bytes=2, cardinality=3)
    assert len(d["pathOrInlineDv"]) == 20  # 16-byte uuid -> 20 chars
    assert dv_relative_path(d["pathOrInlineDv"]) == (
        f"deletion_vector_{u}.bin"
    )
    dp = make_uuid_descriptor(
        u, offset=1, size_in_bytes=2, cardinality=3, prefix="ab"
    )
    assert dv_relative_path(dp["pathOrInlineDv"]) == (
        f"ab/deletion_vector_{u}.bin"
    )
    with pytest.raises(ValueError, match="too short"):
        dv_relative_path("short")


def test_load_dv_bitmap_inline_and_file(tmp_path):
    bm = serialize_roaring_array([3, 5, 7])
    inline = make_inline_descriptor(bm)
    assert inline["storageType"] == "i"
    assert "offset" not in inline
    assert inline["cardinality"] == 3
    assert load_dv_bitmap(inline, str(tmp_path), None) == bm

    u = uuid.uuid4()
    file_bytes, slots = pack_dv_file([bm])
    p = tmp_path / f"deletion_vector_{u}.bin"
    p.write_bytes(file_bytes)
    d = make_uuid_descriptor(
        u, slots[0]["offset"], slots[0]["sizeInBytes"],
        slots[0]["cardinality"],
    )

    reads: list[str] = []

    def read_file(path):
        reads.append(path)
        with open(path, "rb") as fh:
            return fh.read()

    assert load_dv_bitmap(d, str(tmp_path), read_file) == bm
    assert reads == [str(p)]
    # absolute-path descriptors bypass the table root
    pd_ = {
        "storageType": "p", "pathOrInlineDv": str(p),
        "offset": slots[0]["offset"],
        "sizeInBytes": slots[0]["sizeInBytes"], "cardinality": 3,
    }
    assert load_dv_bitmap(pd_, "/elsewhere", read_file) == bm
    with pytest.raises(ValueError, match="storageType"):
        load_dv_bitmap({"storageType": "x"}, str(tmp_path), read_file)


def test_deleted_rows_df_expands_on_executors(spark):
    bm1 = serialize_roaring_array([0, 2, 5])
    bm2 = serialize_roaring_array([1])
    out = deleted_rows_df(
        spark, [("file:/a.parquet", bm1), ("file:/b.parquet", bm2)]
    )
    got = sorted(
        (r["__dv_file"], r["__dv_row_index"]) for r in out.collect()
    )
    assert got == [
        ("file:/a.parquet", 0), ("file:/a.parquet", 2),
        ("file:/a.parquet", 5), ("file:/b.parquet", 1),
    ]


def test_roaring_array_cardinality_counts_actual_values():
    """Second+third review passes: the broadcast gate's trusted row
    signal must count ACTUAL decoded values — run lengths summed,
    bitmap bytes popcounted — agreeing with the full decode on every
    container kind, and NEVER the descriptive header's self-declared
    cardinality, which for run/bitmap containers is
    attacker-controlled independently of the body."""
    from olist_lakehouse_2_0_spark.deletion_vectors import (
        roaring_array_cardinality,
    )

    for vals in (
        [],
        [1, 2, 3],
        list(range(0, 10000, 2)) + [(1 << 32) + 7, (3 << 32) + 9],
    ):
        data = serialize_roaring_array(vals)
        assert roaring_array_cardinality(data) == len(
            deserialize_roaring_array(data)
        )
    # run-container fixture (foreign writer shape): 6 values in one
    # run — the compression that makes a byte-only gate unsafe
    rb = (
        struct.pack("<I", 12347) + b"\x01"
        + struct.pack("<HH", 0, 5)
        + struct.pack("<H", 1) + struct.pack("<HH", 5, 5)
    )
    arr = struct.pack("<Iq", 1681511377, 1) + rb
    assert roaring_array_cardinality(arr) == 6
    # HOSTILE shape: header claims cardinality-1 = 0 (one value) but
    # the run list encodes the full 64Ki range — the gate must see
    # 65536, exactly what the decoder would materialize
    forged = struct.pack("<Iq", 1681511377, 1) + (
        struct.pack("<I", 12347) + b"\x01"
        + struct.pack("<HH", 0, 0)  # lying header: card=1
        + struct.pack("<H", 1) + struct.pack("<HH", 0, 0xFFFF)
    )
    assert roaring_array_cardinality(forged) == 65536
    assert len(deserialize_roaring_array(forged)) == 65536
    with pytest.raises(ValueError, match="magic"):
        roaring_array_cardinality(struct.pack("<Iq", 3, 0))


def test_bitmap_broadcast_reused_and_lru_bounded(spark):
    """Second review pass: repeated reads of the same DV payload must
    reuse ONE broadcast (a dashboard refreshing against one snapshot),
    and the LRU must evict-and-unpersist beyond its bound so a long
    session cannot accumulate broadcast blocks."""
    import olist_lakehouse_2_0_spark.deletion_vectors as dv

    dv._BROADCAST_CACHE.clear()
    pairs = [("file:/a.parquet", serialize_roaring_array([1, 2]))]
    b1 = dv._bitmap_broadcast(spark, pairs)
    b2 = dv._bitmap_broadcast(spark, list(pairs))
    assert b1 is b2  # content-keyed reuse, not identity
    # different payload -> different broadcast
    b3 = dv._bitmap_broadcast(
        spark, [("file:/a.parquet", serialize_roaring_array([3]))]
    )
    assert b3 is not b1
    # flood past the bound: cache stays bounded
    for i in range(dv._BROADCAST_CACHE_MAX + 4):
        dv._bitmap_broadcast(
            spark, [(f"file:/f{i}.parquet", serialize_roaring_array([i]))]
        )
    assert len(dv._BROADCAST_CACHE) <= dv._BROADCAST_CACHE_MAX
    dv._BROADCAST_CACHE.clear()


def test_forged_unsorted_and_wrapping_dvs(spark):
    """Fourth review pass: (a) a forged DV whose containers/runs are
    out of order must still yield a SORTED unique index array (the
    searchsorted membership test silently resurrects deleted rows on
    unsorted input); (b) a forged run crossing the 16-bit container
    domain must REFUSE (uint32 wrap would hide the wrong rows)."""
    from olist_lakehouse_2_0_spark.deletion_vectors import (
        roaring_array_cardinality,
    )

    # two array containers with DESCENDING keys: values decode in
    # container order [65536+1, 3] — must come back sorted
    rb = (
        struct.pack("<II", 12346, 2)
        + struct.pack("<HH", 1, 0)  # key 1, card 1
        + struct.pack("<HH", 0, 0)  # key 0, card 1 (out of order)
        + struct.pack("<II", 24, 26)  # offset header
        + struct.pack("<H", 1)  # container key=1: value 1 -> 65537
        + struct.pack("<H", 3)  # container key=0: value 3
    )
    arr = struct.pack("<Iq", 1681511377, 1) + rb
    assert list(deserialize_roaring_array(arr)) == [3, 65537]
    assert roaring_array_cardinality(arr) == 2

    # run (s=0xFFFF, len-1=0xFFFF) would wrap past the container
    wrap = struct.pack("<Iq", 1681511377, 1) + (
        struct.pack("<I", 12347) + b"\x01"
        + struct.pack("<HH", 0, 0)
        + struct.pack("<H", 1) + struct.pack("<HH", 0xFFFF, 0xFFFF)
    )
    with pytest.raises(ValueError, match="container domain"):
        deserialize_roaring_array(wrap)
