"""Deletion-vector codecs for the Delta-protocol interop layer.

Reader-version-3 Delta tables (the ``deletionVectors`` reader feature)
mark rows of a parquet data file as deleted without rewriting the file:
each ``add`` action may carry a ``deletionVector`` descriptor naming a
serialized bitmap of 0-based row indexes to hide. Real-world tables
written by current delta-spark/Databricks carry these by default, so a
"read foreign Delta" feature that refuses them bounces off many
production tables (VERDICT r9 "What's missing" #1). This module
implements the three public formats the descriptor stack needs, all
from the published Delta protocol spec (github.com/delta-io/delta
PROTOCOL.md, "Deletion Vectors" + "Deletion Vector Format" sections)
and the RoaringBitmap interop spec
(github.com/RoaringBitmap/RoaringFormatSpec):

1. **Z85** (ZeroMQ RFC 32 base-85): inline descriptors carry the
   bitmap itself Z85-encoded; UUID-based descriptors carry a 20-char
   Z85 UUID. Delta pads input to a 4-byte multiple with zero bytes and
   truncates on decode to the descriptor's byte count — mirrored here.
2. **RoaringBitmapArray "portable" serialization**: little-endian
   magic 1681511377, an 8-byte bitmap count, then that many standard
   32-bit RoaringBitmaps (RoaringFormatSpec portable format) back to
   back, the index in the sequence being the high 32 bits of the
   row-index value. The 32-bit codec handles all three container
   kinds (array / bitmap / run) and both cookies on decode, and emits
   the no-run-container form (cookie 12346) on encode.
3. **The DV file layout**: a 1-byte format version (1), then each DV
   at its descriptor ``offset`` as ``<dataSize: 4-byte big-endian>
   <bitmap bytes><CRC-32 of the bitmap bytes: 4-byte big-endian>``;
   the descriptor's ``sizeInBytes`` is ``dataSize``.

No external Delta reader or writer is installable in this sandbox
(re-probed 2026-08-16, docs/SCALE.md), so cross-implementation byte
parity cannot be machine-checked here; the formats are pinned by
handcrafted byte-level fixtures in tests/test_deletion_vectors.py
rather than only by self-roundtrip, so a future divergence from the
spec is visible as a changed constant, not silently re-defined.

Scale: bitmap decode runs on EXECUTORS (Arrow-batched, see
:func:`deleted_rows_df`); the driver only ships the serialized bitmap
bytes it already fetched while replaying the log — the same
metadata-scale transfer any Delta client performs. Numpy does the
bit-unpacking, so a million-row DV decodes in milliseconds.
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib

# module-level so the pandas-UDF type hints ('pd.Series', stringified
# by __future__.annotations) resolve against module globals
import pandas as pd

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}

#: RoaringBitmapArray portable-format magic (PROTOCOL.md).
ROARING_ARRAY_MAGIC = 1681511377
#: RoaringFormatSpec cookies for the 32-bit bitmap serialization.
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE_RUN = 12347
#: With run containers, the offset header is present only at or above
#: this container count (RoaringFormatSpec NO_OFFSET_THRESHOLD).
_NO_OFFSET_THRESHOLD = 4
#: Array containers hold at most this many values; beyond it a bitmap
#: container (8 KiB bitset) is denser.
_ARRAY_MAX = 4096

#: On-disk DV files start with this single version byte.
DV_FILE_FORMAT_VERSION = 1


# ---------------------------------------------------------------- Z85


def z85_encode(data: bytes) -> str:
    """ZeroMQ RFC 32 base-85. Delta's codec zero-pads input to a 4-byte
    multiple (the descriptor's sizeInBytes recovers the true length on
    decode), so unlike strict RFC 32 any length is accepted."""
    if len(data) % 4:
        data = data + b"\x00" * (4 - len(data) % 4)
    out = []
    for i in range(0, len(data), 4):
        (word,) = struct.unpack(">I", data[i:i + 4])
        chunk = []
        for _ in range(5):
            word, rem = divmod(word, 85)
            chunk.append(_Z85_CHARS[rem])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str, out_len: int | None = None) -> bytes:
    """Inverse of :func:`z85_encode`; ``out_len`` truncates the zero
    padding (Delta passes the descriptor's byte count)."""
    if len(text) % 5:
        raise ValueError(f"Z85 length {len(text)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        word = 0
        for c in text[i:i + 5]:
            try:
                word = word * 85 + _Z85_INDEX[c]
            except KeyError:
                raise ValueError(f"invalid Z85 character {c!r}")
        if word > 0xFFFFFFFF:
            raise ValueError(f"Z85 group {text[i:i + 5]!r} overflows")
        out += struct.pack(">I", word)
    if out_len is not None:
        if out_len > len(out) or len(out) - out_len >= 4:
            raise ValueError(
                f"out_len {out_len} inconsistent with {len(out)} decoded"
            )
        del out[out_len:]
    return bytes(out)


# ----------------------------------------- 32-bit RoaringBitmap codec


def _serialize_rb32(values) -> bytes:
    """One standard 32-bit RoaringBitmap, RoaringFormatSpec portable
    format, no-run-container form: cookie 12346, container count,
    descriptive headers (key, cardinality-1), the always-present
    offset header, then array (<=4096 values) or bitmap containers.
    ``values`` must be sorted unique ints in [0, 2^32)."""
    import numpy as np

    containers: list[tuple[int, "np.ndarray"]] = []
    if len(values):
        arr = np.asarray(values, dtype=np.uint32)
        keys = (arr >> 16).astype(np.uint16)
        lows = (arr & 0xFFFF).astype(np.uint16)
        bounds = np.flatnonzero(np.diff(keys)) + 1
        for seg_keys, seg_lows in zip(
            np.split(keys, bounds), np.split(lows, bounds)
        ):
            containers.append((int(seg_keys[0]), seg_lows))
    n = len(containers)
    head = struct.pack("<II", _SERIAL_COOKIE_NO_RUN, n)
    desc = b"".join(
        struct.pack("<HH", key, len(lows) - 1) for key, lows in containers
    )
    bodies: list[bytes] = []
    for _key, lows in containers:
        if len(lows) <= _ARRAY_MAX:
            bodies.append(lows.astype("<u2").tobytes())
        else:
            bits = np.zeros(1 << 16, dtype=np.uint8)
            bits[lows] = 1
            bodies.append(np.packbits(bits, bitorder="little").tobytes())
    offsets = []
    pos = len(head) + len(desc) + 4 * n
    for b in bodies:
        offsets.append(pos)
        pos += len(b)
    offs = struct.pack(f"<{n}I", *offsets) if n else b""
    return head + desc + offs + b"".join(bodies)


def _rb32_containers(buf: bytes, pos: int):
    """Parse ONE 32-bit RoaringBitmap's framing starting at ``pos``:
    returns (containers, end_pos) where each container is
    ``(kind, key, header_card, body_pos, n_runs)`` with kind in
    {'array', 'bitmap', 'run'} (n_runs is None except for runs).
    This is the SINGLE structure walk both the value decoder and the
    cardinality gate consume (third review pass: two hand-kept copies
    of the cookie/offset-header/container-skip rules desynced — the
    gate trusted the descriptive-header cardinality, which for run
    and bitmap containers is decoupled from the decoded count)."""
    import numpy as np

    start = pos
    (cookie,) = struct.unpack_from("<I", buf, pos)
    run_flags = None
    if (cookie & 0xFFFF) == _SERIAL_COOKIE_RUN:
        n = (cookie >> 16) + 1
        pos += 4
        flag_bytes = (n + 7) // 8
        run_flags = np.unpackbits(
            np.frombuffer(buf, np.uint8, flag_bytes, pos),
            bitorder="little",
        )[:n]
        pos += flag_bytes
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", buf, pos + 4)
        pos += 8
    else:
        raise ValueError(f"not a RoaringBitmap: cookie {cookie}")
    if n:
        hdr = np.frombuffer(buf, "<u2", 2 * n, pos)
        keys = hdr[0::2].astype(np.int64)
        cards = hdr[1::2].astype(np.int64) + 1
    else:
        keys = cards = ()
    pos += 4 * n
    if run_flags is None or n >= _NO_OFFSET_THRESHOLD:
        pos += 4 * n  # offset header (containers still follow in order)
    containers = []
    for i in range(n):
        if run_flags is not None and run_flags[i]:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            containers.append(
                ("run", int(keys[i]), int(cards[i]), pos + 2, n_runs)
            )
            pos += 2 + 4 * n_runs
        elif cards[i] > _ARRAY_MAX:
            containers.append(
                ("bitmap", int(keys[i]), int(cards[i]), pos, None)
            )
            pos += 8192
        else:
            containers.append(
                ("array", int(keys[i]), int(cards[i]), pos, None)
            )
            pos += 2 * int(cards[i])
    if pos > len(buf):
        raise ValueError(f"truncated RoaringBitmap at {start}")
    return containers, pos


def _deserialize_rb32(buf: bytes, pos: int) -> tuple["object", int]:
    """Decode one 32-bit RoaringBitmap starting at ``pos``; returns
    (numpy uint32 array of values, position after the bitmap). Handles
    both cookies and all three container kinds — a foreign writer
    (delta-spark uses the official RoaringBitmap java library) chooses
    freely among them."""
    import numpy as np

    containers, pos = _rb32_containers(buf, pos)
    out: list["np.ndarray"] = []
    for kind, key, card, body, n_runs in containers:
        base = np.uint32(key << 16)
        if kind == "run":
            runs = np.frombuffer(buf, "<u2", 2 * n_runs, body).reshape(
                n_runs, 2
            )
            for s, l1 in runs:
                end = int(s) + int(l1) + 1
                if end > (1 << 16):
                    # a forged run crossing the 16-bit container
                    # domain would WRAP uint32 into small indexes —
                    # wrong rows silently hidden; refuse instead
                    # (fourth review pass)
                    raise ValueError(
                        f"run ({int(s)}, len {int(l1) + 1}) exceeds "
                        "the container domain"
                    )
                out.append(base + np.arange(s, end, dtype=np.uint32))
        elif kind == "bitmap":
            bits = np.unpackbits(
                np.frombuffer(buf, np.uint8, 8192, body),
                bitorder="little",
            )
            out.append(base + np.flatnonzero(bits).astype(np.uint32))
        else:
            vals = np.frombuffer(buf, "<u2", card, body)
            out.append(base + vals.astype(np.uint32))
    return (
        np.concatenate(out) if out else np.empty(0, dtype=np.uint32)
    ), pos


def _rb32_cardinality(buf: bytes, pos: int) -> tuple[int, int]:
    """ACTUAL value count of one 32-bit RoaringBitmap — run lengths
    summed and bitmap bytes popcounted, never the descriptive header's
    self-declared cardinality (third review pass: for run/bitmap
    containers that header is attacker-controlled independently of
    the body, so trusting it let a forged DV bypass the broadcast-row
    gate). Array containers' header card IS trusted — there it
    defines the body layout itself."""
    import numpy as np

    containers, pos = _rb32_containers(buf, pos)
    total = 0
    for kind, _key, card, body, n_runs in containers:
        if kind == "run":
            runs = np.frombuffer(buf, "<u2", 2 * n_runs, body)
            total += int(runs[1::2].astype(np.int64).sum()) + n_runs
        elif kind == "bitmap":
            total += int(
                np.unpackbits(
                    np.frombuffer(buf, np.uint8, 8192, body)
                ).sum()
            )
        else:
            total += card
    return total, pos


# -------------------------------------------- RoaringBitmapArray codec


def serialize_roaring_array(indexes) -> bytes:
    """64-bit row-index set -> RoaringBitmapArray portable bytes:
    magic, 8-byte count, then one 32-bit bitmap per high-32-bits slot
    from 0 through the maximum present (the slot index IS the key, so
    gaps serialize as empty 8-byte bitmaps)."""
    import numpy as np

    arr = np.unique(np.asarray(sorted(indexes), dtype=np.uint64))
    if len(arr) and int(arr[-1]) >> 32 >= 1 << 31:
        raise ValueError("row index exceeds the DV domain")
    highs = (arr >> np.uint64(32)).astype(np.uint32)
    lows = (arr & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    n_slots = int(highs[-1]) + 1 if len(arr) else 0
    out = [struct.pack("<Iq", ROARING_ARRAY_MAGIC, n_slots)]
    for slot in range(n_slots):
        out.append(_serialize_rb32(lows[highs == slot]))
    return b"".join(out)


def deserialize_roaring_array(data: bytes) -> "object":
    """RoaringBitmapArray portable bytes -> sorted numpy uint64 array
    of row indexes."""
    import numpy as np

    if len(data) < 12:
        raise ValueError("truncated RoaringBitmapArray")
    magic, n = struct.unpack_from("<Iq", data, 0)
    if magic != ROARING_ARRAY_MAGIC:
        raise ValueError(
            f"bad RoaringBitmapArray magic {magic} "
            f"(expected {ROARING_ARRAY_MAGIC})"
        )
    pos = 12
    parts = []
    for slot in range(n):
        vals, pos = _deserialize_rb32(data, pos)
        parts.append(
            (np.uint64(slot) << np.uint64(32)) + vals.astype(np.uint64)
        )
    if pos != len(data):
        raise ValueError(
            f"{len(data) - pos} trailing bytes after {n} bitmaps"
        )
    out = (
        np.concatenate(parts) if parts else np.empty(0, dtype=np.uint64)
    )
    # the searchsorted membership test REQUIRES sorted-unique input;
    # a spec-conforming writer emits containers/runs in order, but a
    # forged DV may not, and unsorted output would silently resurrect
    # deleted rows (fourth review pass) — np.unique also collapses
    # forged duplicates, so the gate's count only ever OVER-estimates
    if len(out) > 1 and not bool(np.all(out[1:] > out[:-1])):
        out = np.unique(out)
    return out


# --------------------------------------------------- DV file layout


def pack_dv_file(bitmaps: list[bytes]) -> tuple[bytes, list[dict]]:
    """Assemble an on-disk DV file from serialized bitmaps: version
    byte, then each DV as ``<size BE><data><crc32 BE>``. Returns the
    file bytes plus one ``{"offset", "sizeInBytes", "cardinality"}``
    dict per bitmap — exactly the descriptor fields a forged foreign
    table's ``add`` actions need. Several DVs packed into ONE file is
    the production shape (one DELETE touches many data files but
    writes a single DV file)."""
    buf = bytearray([DV_FILE_FORMAT_VERSION])
    slots = []
    for bm in bitmaps:
        slots.append(
            {
                "offset": len(buf),
                "sizeInBytes": len(bm),
                "cardinality": int(len(deserialize_roaring_array(bm))),
            }
        )
        buf += struct.pack(">i", len(bm)) + bm
        buf += struct.pack(">I", zlib.crc32(bm) & 0xFFFFFFFF)
    return bytes(buf), slots


def unpack_dv(file_bytes: bytes, offset: int, size_in_bytes: int) -> bytes:
    """Slice one DV's bitmap out of a DV file per its descriptor,
    verifying the stored CRC-32 — a torn or misaddressed read must
    fail loudly, never resurrect deleted rows."""
    if not file_bytes or file_bytes[0] != DV_FILE_FORMAT_VERSION:
        raise ValueError(
            f"unsupported DV file format version "
            f"{file_bytes[0] if file_bytes else None}"
        )
    (size,) = struct.unpack_from(">i", file_bytes, offset)
    if size != size_in_bytes:
        raise ValueError(
            f"DV size mismatch at offset {offset}: file says {size}, "
            f"descriptor says {size_in_bytes}"
        )
    data = file_bytes[offset + 4:offset + 4 + size]
    if len(data) != size:
        raise ValueError(f"truncated DV at offset {offset}")
    (crc,) = struct.unpack_from(">I", file_bytes, offset + 4 + size)
    if crc != (zlib.crc32(data) & 0xFFFFFFFF):
        raise ValueError(f"DV checksum mismatch at offset {offset}")
    return data


# ------------------------------------------- descriptor path handling


def dv_relative_path(path_or_inline: str) -> str:
    """``storageType='u'`` path derivation per PROTOCOL.md: the last
    20 characters are the Z85 UUID, anything before is an optional
    random prefix directory; the file is
    ``<prefix>/deletion_vector_<canonical uuid>.bin`` under the table
    root."""
    if len(path_or_inline) < 20:
        raise ValueError(
            f"UUID DV descriptor too short: {path_or_inline!r}"
        )
    prefix, enc = path_or_inline[:-20], path_or_inline[-20:]
    u = _uuid.UUID(bytes=z85_decode(enc, 16))
    name = f"deletion_vector_{u}.bin"
    return f"{prefix}/{name}" if prefix else name


def make_uuid_descriptor(
    u: "_uuid.UUID", offset: int, size_in_bytes: int, cardinality: int,
    prefix: str = "",
) -> dict:
    """Forge a ``storageType='u'`` descriptor (fixture helper — the
    reader under test must re-derive the path from it)."""
    return {
        "storageType": "u",
        "pathOrInlineDv": prefix + z85_encode(u.bytes),
        "offset": offset,
        "sizeInBytes": size_in_bytes,
        "cardinality": cardinality,
    }


def make_inline_descriptor(bitmap: bytes) -> dict:
    """Forge a ``storageType='i'`` descriptor carrying the bitmap
    itself, Z85-encoded (no offset field — inline DVs have none)."""
    return {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(bitmap),
        "sizeInBytes": len(bitmap),
        "cardinality": int(len(deserialize_roaring_array(bitmap))),
    }


def load_dv_bitmap(
    descriptor: dict, table_root: str, read_file
) -> bytes:
    """Descriptor -> serialized bitmap bytes. ``read_file`` is a
    ``path -> bytes`` callable (the caller caches it per distinct DV
    file — many descriptors share one file, so a table's DV fetch cost
    is O(distinct DV files), same as any Delta client's)."""
    st = descriptor.get("storageType")
    if st == "i":
        return z85_decode(
            descriptor["pathOrInlineDv"], descriptor["sizeInBytes"]
        )
    if st == "u":
        path = os.path.join(
            table_root, dv_relative_path(descriptor["pathOrInlineDv"])
        )
    elif st == "p":
        path = descriptor["pathOrInlineDv"]
    else:
        raise ValueError(f"unknown DV storageType {st!r}")
    return unpack_dv(
        read_file(path), descriptor["offset"], descriptor["sizeInBytes"]
    )


# ------------------------------------------------ Spark-side execution


#: Memoized cardinalities, keyed by payload digest — the gate re-runs
#: on every read_delta call even when the broadcast itself is cached,
#: and a 64 MiB payload's container walk is not free (third review
#: pass). Bounded; a clear only costs a re-walk.
_CARDINALITY_CACHE: dict = {}


def _payload_digest(data: bytes) -> bytes:
    """SHA-256 of a bitmap payload — the cache key material for every
    content-addressed cache here. CRC-32 keys were trivially forgeable
    (third review pass: the module's own threat model is hostile
    foreign tables, and a forged matching CRC at equal length would
    silently serve a STALE broadcast — wrong rows hidden)."""
    import hashlib

    return hashlib.sha256(data).digest()


def roaring_array_cardinality(
    data: bytes, digest: bytes | None = None
) -> int:
    """ACTUAL value count of a serialized RoaringBitmapArray — run
    lengths summed, bitmap containers popcounted, array headers
    trusted only where they define the layout (see
    :func:`_rb32_cardinality`). This is the TRUSTED row signal for
    the broadcast-vs-anti-join gate: run containers compress
    contiguous deletes ~10^4-10^5x, so a few KB of roaring can decode
    to millions of int64 indexes, and the descriptor's self-declared
    ``cardinality`` is untrusted foreign input. One numpy pass per
    container, memoized per payload digest (pass ``digest`` when the
    caller already computed it — hashing a 64 MiB payload twice per
    read is the overhead this memo exists to avoid)."""
    key = digest if digest is not None else _payload_digest(data)
    got = _CARDINALITY_CACHE.get(key)
    if got is not None:
        return got
    if len(data) < 12:
        raise ValueError("truncated RoaringBitmapArray")
    magic, n = struct.unpack_from("<Iq", data, 0)
    if magic != ROARING_ARRAY_MAGIC:
        raise ValueError(f"bad RoaringBitmapArray magic {magic}")
    pos, total = 12, 0
    for _slot in range(n):
        card, pos = _rb32_cardinality(data, pos)
        total += card
    if len(_CARDINALITY_CACHE) >= 4096:
        _CARDINALITY_CACHE.clear()
    _CARDINALITY_CACHE[key] = total
    return total


#: Worker-lifetime memo of decoded bitmaps, keyed by (file path,
#: payload SHA-256) so a rewritten DV at the same path never serves a
#: stale decode — even a DELIBERATELY re-written one (CRC-32 is
#: forgeable; third review pass). Python workers are reused across
#: tasks, so each worker pays one decode per distinct DV per table
#: read, not one per Arrow batch. Evicted by DECODED byte budget, not
#: entry count — 1024 run-heavy entries could pin far more memory
#: than 1024 keys suggest.
_DECODE_CACHE: dict = {}
_DECODE_CACHE_BYTES = 0
_DECODE_CACHE_MAX_BYTES = 256 << 20


def _decoded_indexes(path: str, raw: bytes):
    global _DECODE_CACHE_BYTES
    key = (path, _payload_digest(raw))
    arr = _DECODE_CACHE.get(key)
    if arr is None:
        arr = deserialize_roaring_array(raw).astype("int64")
        if _DECODE_CACHE_BYTES + arr.nbytes > _DECODE_CACHE_MAX_BYTES:
            # bound worker memory across many tables/sessions; a
            # clear only costs re-decodes, never correctness
            _DECODE_CACHE.clear()
            _DECODE_CACHE_BYTES = 0
        _DECODE_CACHE[key] = arr
        _DECODE_CACHE_BYTES += arr.nbytes
    return arr


#: Driver-side LRU of live bitmap broadcasts keyed by (application id,
#: payload SHA-256s). Repeated reads of the same DV table (a dashboard
#: refreshing against one snapshot) reuse ONE broadcast instead of
#: minting one per plan; evicted entries are unpersist()ed (executors
#: drop their copies; TorrentBroadcast re-fetches lazily if an old
#: plan re-executes, so eviction is safe — destroy() would not be) so
#: a long session cannot accumulate unbounded broadcast blocks
#: (review r10). The application id in the key keeps a RESTARTED
#: context from being served a broadcast bound to the stopped one
#: (third review pass); stale-context entries are dropped on sight.
_BROADCAST_CACHE: "dict[tuple, object]" = {}
_BROADCAST_CACHE_MAX = 16


def _bitmap_broadcast(spark, pairs, digests: dict | None = None):
    app_id = spark.sparkContext.applicationId
    for k in [k for k in _BROADCAST_CACHE if k[0] != app_id]:
        _BROADCAST_CACHE.pop(k)  # dead context: nothing to unpersist
    digests = digests or {}
    key = (
        app_id,
        tuple(
            (p, digests.get(p) or _payload_digest(b))
            for p, b in sorted(pairs)
        ),
    )
    bc = _BROADCAST_CACHE.pop(key, None)
    if bc is None:
        bc = spark.sparkContext.broadcast(dict(pairs))
    _BROADCAST_CACHE[key] = bc  # re-insert = move to MRU position
    while len(_BROADCAST_CACHE) > _BROADCAST_CACHE_MAX:
        old = _BROADCAST_CACHE.pop(next(iter(_BROADCAST_CACHE)))
        try:
            old.unpersist(False)
        except Exception:
            pass  # a dead context at eviction is not this read's error
    return bc


def live_rows_filter(
    spark, df, pairs, file_col: str, idx_col: str,
    digests: dict | None = None,
):
    """Hide deleted rows by broadcasting the COMPRESSED bitmaps and
    filtering the scan with an Arrow-batched membership test — the
    execution shape Delta's own readers use (each task consults its
    file's bitmap; no join, no shuffle, no expansion of the deleted
    set into rows). The broadcast payload is exactly the serialized
    roaring bytes, reused across identical reads via
    :func:`_bitmap_broadcast`; the caller gates entry on the ACTUAL
    byte total AND the actually-counted decoded cardinality (both
    trusted signals, unlike descriptor cardinality). Membership is
    one ``np.searchsorted`` per distinct file per batch over the
    memoized decoded index array; the digest cache key is computed
    once per (task, file) through a task-local memo, not per Arrow
    batch."""
    import numpy as np

    from pyspark.sql import functions as F

    bc = _bitmap_broadcast(spark, pairs, digests)
    task_cache: dict = {}

    @F.pandas_udf("boolean")
    def _is_live(fp: pd.Series, ri: pd.Series) -> pd.Series:
        dvs = bc.value
        out = np.ones(len(fp), dtype=bool)
        idx = ri.to_numpy()
        fpv = fp.to_numpy()
        for p in pd.unique(fpv):
            arr = task_cache.get(p)
            if arr is None:
                raw = dvs.get(p)
                if raw is None:
                    continue
                # worker-global memo pays the digest+decode; the
                # task-local dict skips even that on later batches
                arr = _decoded_indexes(p, raw)
                task_cache[p] = arr
            if arr.size == 0:
                continue
            m = fpv == p
            pos = np.searchsorted(arr, idx[m])
            pos_c = np.minimum(pos, arr.size - 1)
            out[m] &= ~((pos < arr.size) & (arr[pos_c] == idx[m]))
        return pd.Series(out)

    return df.filter(_is_live(F.col(file_col), F.col(idx_col)))


def deleted_rows_df(spark, pairs: list[tuple[str, bytes]]):
    """[(qualified file path, serialized bitmap bytes)] -> DataFrame
    ``(__dv_file string, __dv_row_index long)`` of deleted rows,
    decoded on EXECUTORS via Arrow-batched mapInPandas (the driver
    ships only the bitmap bytes it already holds from log replay —
    metadata-scale). This is the LARGE-DV fallback: when the total
    serialized bitmap size exceeds the broadcast gate,
    :func:`live_rows_filter`'s per-executor payload would be too big,
    so the deleted set expands to rows here and the caller removes
    them with a plain shuffle anti-join on (file, index) — uniformly
    distributed keys, no skew concern, no broadcast anywhere."""
    from pyspark.sql import types as T

    in_schema = T.StructType(
        [
            T.StructField("__dv_file", T.StringType(), False),
            T.StructField("__dv_bytes", T.BinaryType(), False),
        ]
    )
    out_schema = T.StructType(
        [
            T.StructField("__dv_file", T.StringType(), False),
            T.StructField("__dv_row_index", T.LongType(), False),
        ]
    )

    def expand(batches):
        for pdf in batches:
            for fp, raw in zip(pdf["__dv_file"], pdf["__dv_bytes"]):
                idx = deserialize_roaring_array(bytes(raw))
                yield pd.DataFrame(
                    {
                        "__dv_file": fp,
                        "__dv_row_index": idx.astype("int64"),
                    }
                )

    from olist_lakehouse_2_0_spark.localrel import arrow_local_relation

    df = arrow_local_relation(spark, pairs, in_schema)
    if len(pairs) > 1:
        # one task per DV so a hot million-row bitmap doesn't serialize
        # behind its siblings on one core
        df = df.repartition(min(len(pairs), 64))
    return df.mapInPandas(expand, out_schema)
