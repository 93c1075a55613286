"""Delta Lake deletion-vector decoding (public formats only).

Implements the two public specifications a DV read needs, in pure
Python (driver-side, metadata-scale — DV blobs are small next to the
data files they mask):

* the **Delta deletion-vector descriptor** from PROTOCOL.md
  (https://github.com/delta-io/delta/blob/master/PROTOCOL.md):
  ``add.deletionVector = {storageType, pathOrInlineDv, offset,
  sizeInBytes, cardinality}`` with storage types ``u`` (UUID-named
  file under the table, path Base85/RFC-1924-encoded in the LAST 20
  characters, any preceding characters a directory prefix), ``p``
  (absolute path), ``i`` (inline: the blob itself Base85-encoded);
  on-disk DV files carry a format-version byte, then per-DV
  ``<u32 BE size> <blob> <u32 BE CRC32-of-blob>``;
* the **RoaringBitmapArray "portable" serialization** the blob
  contains: ``<u32 LE magic 1681511377> <u64 LE number-of-bitmaps>``
  followed by one standard 32-bit RoaringBitmap per high-32-bit key
  (key = array index), each in the interoperable portable format
  (https://github.com/RoaringBitmap/RoaringFormatSpec): cookie,
  per-container key/cardinality headers, then array (sorted u16),
  bitmap (1024 × u64), or run (u16 count of <start, length> pairs)
  containers.

The writer half exists for fixtures/tests (array containers only —
delete sets in fixtures are small); the reader handles all three
container kinds so real tables decode too.
"""

from __future__ import annotations

import base64
import struct
import uuid as _uuid
import zlib

from glue_table_cache_spark.errors import GlueSparkError

MAGIC = 1681511377
_SERIAL_COOKIE = 12347
_SERIAL_COOKIE_NO_RUN = 12346
_NO_OFFSET_THRESHOLD = 4


# --------------------------------------------------------------------------
# RoaringBitmap decode
# --------------------------------------------------------------------------


def _decode_rb32(data: bytes, off: int, base: int, out: list[int]) -> int:
    """Decode one standard portable 32-bit RoaringBitmap starting at
    ``off``; append values (+``base``) to ``out``; return new offset."""
    (cookie,) = struct.unpack_from("<I", data, off)
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        size = (cookie >> 16) + 1
        off += 4
        run_flag_bytes = (size + 7) // 8
        run_flags = data[off : off + run_flag_bytes]
        off += run_flag_bytes
        has_offsets = size >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        off += 4
        (size,) = struct.unpack_from("<I", data, off)
        off += 4
        run_flags = bytes((size + 7) // 8)
        has_offsets = True
    else:
        raise GlueSparkError(
            f"Unrecognized RoaringBitmap cookie {cookie} in deletion vector"
        )
    headers = []
    for _ in range(size):
        key, card_m1 = struct.unpack_from("<HH", data, off)
        off += 4
        headers.append((key, card_m1 + 1))
    if has_offsets:
        off += 4 * size  # sequential read; offsets are redundant
    for i, (key, card) in enumerate(headers):
        cbase = base + (key << 16)
        if run_flags[i // 8] & (1 << (i % 8)):
            (n_runs,) = struct.unpack_from("<H", data, off)
            off += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", data, off)
                off += 4
                out.extend(range(cbase + start, cbase + start + length + 1))
        elif card <= 4096:
            vals = struct.unpack_from(f"<{card}H", data, off)
            off += 2 * card
            out.extend(cbase + v for v in vals)
        else:
            words = struct.unpack_from("<1024Q", data, off)
            off += 8192
            for wi, w in enumerate(words):
                wbase = cbase + wi * 64
                while w:
                    low = w & -w
                    out.append(wbase + low.bit_length() - 1)
                    w ^= low
    return off


def decode_rbm_array(blob: bytes) -> list[int]:
    """Sorted 64-bit row indexes from a serialized RoaringBitmapArray
    (the content of a DV blob, magic included)."""
    (magic,) = struct.unpack_from("<I", blob, 0)
    if magic != MAGIC:
        raise GlueSparkError(
            f"Deletion-vector blob magic {magic} != {MAGIC}"
        )
    (n_bitmaps,) = struct.unpack_from("<Q", blob, 4)
    off = 12
    out: list[int] = []
    for hi in range(n_bitmaps):
        off = _decode_rb32(blob, off, hi << 32, out)
    return out


# --------------------------------------------------------------------------
# RoaringBitmap encode (fixture writer: array containers only)
# --------------------------------------------------------------------------


def encode_rbm_array(positions: list[int]) -> bytes:
    """Serialize sorted row indexes as a portable RoaringBitmapArray.
    Array containers for cardinality ≤ 4096, bitmap containers above
    (the format's mandatory cutover — a reader distinguishes the two
    by cardinality alone); run containers are never emitted."""
    positions = sorted(set(int(p) for p in positions))
    if positions and positions[0] < 0:
        raise ValueError("row indexes must be non-negative")
    n_bitmaps = (positions[-1] >> 32) + 1 if positions else 0
    parts = [struct.pack("<IQ", MAGIC, n_bitmaps)]
    for hi in range(n_bitmaps):
        vals32 = [p & 0xFFFFFFFF for p in positions if (p >> 32) == hi]
        containers: dict[int, list[int]] = {}
        for v in vals32:
            containers.setdefault(v >> 16, []).append(v & 0xFFFF)
        keys = sorted(containers)
        parts.append(
            struct.pack("<II", _SERIAL_COOKIE_NO_RUN, len(keys))
        )
        for k in keys:
            parts.append(struct.pack("<HH", k, len(containers[k]) - 1))
        # offset header (required by the no-run cookie)
        pos = 4 + 4 + 4 * len(keys) + 4 * len(keys)
        for k in keys:
            card = len(containers[k])
            parts.append(struct.pack("<I", pos))
            pos += 8192 if card > 4096 else 2 * card
        for k in keys:
            vals = containers[k]
            if len(vals) > 4096:
                words = [0] * 1024
                for v in vals:
                    words[v >> 6] |= 1 << (v & 63)
                parts.append(struct.pack("<1024Q", *words))
            else:
                parts.append(struct.pack(f"<{len(vals)}H", *vals))
    return b"".join(parts)


# --------------------------------------------------------------------------
# DV descriptor resolution + file IO
# --------------------------------------------------------------------------


def dv_file_path(location: str, dv: dict) -> str | None:
    """Absolute path of the DV file, or ``None`` for inline DVs."""
    st = dv.get("storageType")
    enc = dv.get("pathOrInlineDv", "")
    if st == "i":
        return None
    if st == "p":
        return enc
    if st == "u":
        prefix, tail = enc[:-20], enc[-20:]
        u = _uuid.UUID(bytes=base64.b85decode(tail))
        name = f"deletion_vector_{u}.bin"
        base = location.rstrip("/")
        return (
            f"{base}/{prefix}/{name}" if prefix else f"{base}/{name}"
        )
    raise GlueSparkError(
        f"Unknown deletion-vector storageType {st!r} "
        "(known: 'u', 'p', 'i')"
    )


def dv_deleted_positions(
    dv: dict, location: str, s3_client=None
) -> list[int]:
    """Sorted deleted row indexes for one add-file's DV descriptor."""
    from glue_table_cache_spark.sources.iceberg import _read_bytes

    path = dv_file_path(location, dv)
    if path is None:
        blob = base64.b85decode(dv["pathOrInlineDv"])
    else:
        data = _read_bytes(path, s3_client)
        offset = dv.get("offset") or 0
        size = dv["sizeInBytes"]
        (word,) = struct.unpack_from(">I", data, offset)
        # delta-spark points `offset` at the u32 BE size word; be
        # tolerant of writers that point straight at the blob
        start = offset + 4 if word == size else offset
        blob = data[start : start + size]
        (crc,) = struct.unpack_from(">I", data, start + size)
        if crc != zlib.crc32(blob):
            raise GlueSparkError(
                f"Deletion-vector checksum mismatch in {path!r}"
            )
    positions = decode_rbm_array(blob)
    card = dv.get("cardinality")
    if card is not None and card != len(positions):
        raise GlueSparkError(
            f"Deletion vector cardinality {card} != decoded "
            f"{len(positions)} positions"
        )
    return positions


def write_dv_file(
    file_path, positions: list[int], version: int = 1
) -> dict:
    """Fixture half: write a single-DV file and return the descriptor
    fields ``{offset, sizeInBytes, cardinality}`` (storageType/path
    are the caller's choice)."""
    blob = encode_rbm_array(positions)
    data = (
        bytes([version])
        + struct.pack(">I", len(blob))
        + blob
        + struct.pack(">I", zlib.crc32(blob))
    )
    with open(file_path, "wb") as f:
        f.write(data)
    return {
        "offset": 1,
        "sizeInBytes": len(blob),
        "cardinality": len(sorted(set(positions))),
    }
