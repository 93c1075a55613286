"""Hudi log-file (HoodieLogFormat) codec — pure Python.

MERGE_ON_READ tables route updates and deletes into ``.log.*`` files
next to each file group's parquet base file; reading the table
correctly means replaying those blocks over the base rows.  This
module implements the public log-block framing from the Hudi format
(upstream ``HoodieLogFormatWriter`` / ``HoodieLogFileReader`` /
``HoodieLogBlock``; https://hudi.apache.org/tech-specs/):

block := MAGIC ``#HUDI#``
         | block length      (int64, big-endian — everything after
                              this field, reverse-seek support)
         | format version    (int32)
         | block type        (int32, ``HoodieLogBlockType`` ordinal)
         | header map        (int32 count, then per entry:
                              int32 key-ordinal, int32 byte-length,
                              utf-8 bytes — ``HeaderMetadataType``)
         | content length    (int64)
         | content
         | footer map        (same shape as header)
         | total block size  (int64, from MAGIC through this field)

Content layouts:

* AVRO_DATA_BLOCK (ordinal 3): int32 content-format version, int32
  record count, then per record int32 length + Avro binary-encoded
  record bytes against the writer schema carried in the header's
  ``SCHEMA`` entry;
* DELETE_BLOCK (ordinal 1): int32 content-format version, int32
  payload length, then an Avro binary record-list of
  ``{recordKey, partitionPath}`` delete records against the
  delete-record schema (carried in this writer's ``SCHEMA`` header;
  readers fall back to :data:`DELETE_RECORD_LIST_SCHEMA`).

Corrupt tail handling: a block whose magic is missing or whose
declared lengths run past the file (a torn append — the failure mode
the trailing length field exists to detect) stops the walk at the
last complete block, exactly the reader posture Hudi itself takes
(scanning stops at the corrupt block; a later rollback cleans it).

Only codec ``null`` Avro bodies are produced/consumed (matching
:mod:`glue_table_cache_spark.sources.avro_lite`); no Hudi runtime
ships in this environment, so the codec is validated by round-trip
property tests plus structural checks of every framing field.
"""

from __future__ import annotations

import io
import json
import struct
from pathlib import Path
from typing import Any

from glue_table_cache_spark.sources.avro_lite import (
    decode_value,
    encode_value,
)

MAGIC = b"#HUDI#"
FORMAT_VERSION = 1

#: HoodieLogBlockType ordinals (upstream enum order)
COMMAND_BLOCK = 0
DELETE_BLOCK = 1
CORRUPT_BLOCK = 2
AVRO_DATA_BLOCK = 3

#: HeaderMetadataType ordinals (upstream enum order)
H_INSTANT_TIME = 0
H_TARGET_INSTANT_TIME = 1
H_SCHEMA = 2
H_COMMAND_BLOCK_TYPE = 3

DELETE_RECORD_LIST_SCHEMA: dict = {
    "type": "record",
    "name": "HoodieDeleteRecordList",
    "fields": [
        {
            "name": "deleteRecordList",
            "type": {
                "type": "array",
                "items": {
                    "type": "record",
                    "name": "HoodieDeleteRecord",
                    "fields": [
                        {"name": "recordKey", "type": "string"},
                        {"name": "partitionPath", "type": "string"},
                    ],
                },
            },
        }
    ],
}


def _meta_bytes(meta: dict[int, str]) -> bytes:
    out = struct.pack(">i", len(meta))
    for k, v in meta.items():
        vb = v.encode("utf-8")
        out += struct.pack(">i", k) + struct.pack(">i", len(vb)) + vb
    return out


def _read_meta(buf: io.BytesIO) -> dict[int, str]:
    (count,) = struct.unpack(">i", buf.read(4))
    out: dict[int, str] = {}
    for _ in range(count):
        (k,) = struct.unpack(">i", buf.read(4))
        (n,) = struct.unpack(">i", buf.read(4))
        out[k] = buf.read(n).decode("utf-8")
    return out


def _frame_block(block_type: int, header: dict[int, str],
                 content: bytes) -> bytes:
    header_b = _meta_bytes(header)
    footer_b = _meta_bytes({})
    # everything after the length field itself, including the trailing
    # total-size field
    inner = (
        struct.pack(">i", FORMAT_VERSION)
        + struct.pack(">i", block_type)
        + header_b
        + struct.pack(">q", len(content))
        + content
        + footer_b
    )
    block_len = len(inner) + 8  # + trailing total-size int64
    total = len(MAGIC) + 8 + block_len
    return (
        MAGIC + struct.pack(">q", block_len) + inner
        + struct.pack(">q", total)
    )


def data_block(instant: str, schema: dict,
               records: list[dict]) -> bytes:
    """An AVRO_DATA_BLOCK upserting ``records`` at ``instant``."""
    body = io.BytesIO()
    body.write(struct.pack(">i", 3))  # content-format version
    body.write(struct.pack(">i", len(records)))
    for r in records:
        rb = encode_value(schema, r)
        body.write(struct.pack(">i", len(rb)))
        body.write(rb)
    return _frame_block(
        AVRO_DATA_BLOCK,
        {H_INSTANT_TIME: instant, H_SCHEMA: json.dumps(schema)},
        body.getvalue(),
    )


def delete_block(instant: str, keys: list[tuple[str, str]]) -> bytes:
    """A DELETE_BLOCK removing ``(recordKey, partitionPath)`` pairs at
    ``instant``."""
    payload = encode_value(
        DELETE_RECORD_LIST_SCHEMA,
        {
            "deleteRecordList": [
                {"recordKey": k, "partitionPath": p} for k, p in keys
            ]
        },
    )
    body = (
        struct.pack(">i", 3)
        + struct.pack(">i", len(payload))
        + payload
    )
    return _frame_block(
        DELETE_BLOCK,
        {
            H_INSTANT_TIME: instant,
            H_SCHEMA: json.dumps(DELETE_RECORD_LIST_SCHEMA),
        },
        body,
    )


def write_log_file(path: str | Path, blocks: list[bytes]) -> None:
    Path(path).write_bytes(b"".join(blocks))


def _temporal_fields(schema: dict) -> dict[str, str]:
    """``{field_name: logicalType}`` for the record schema's temporal
    fields (``timestamp-micros``/``timestamp-millis`` on long,
    ``date`` on int) — the fields whose decoded integers revive back
    into datetime/date values."""
    out: dict[str, str] = {}
    for f in schema.get("fields", []):
        t = f.get("type")
        branches = t if isinstance(t, list) else [t]
        for b in branches:
            if isinstance(b, dict) and b.get("logicalType") in (
                "timestamp-micros", "timestamp-millis", "date",
            ):
                out[f["name"]] = b["logicalType"]
    return out


def _revive_temporal(rec: dict, temporal: dict[str, str]) -> None:
    """In place: logical integers → naive UTC datetime / date — the
    encoder's symmetric inverse (avro_lite._temporal_to_avro)."""
    import datetime as _dt

    for name, logical in temporal.items():
        v = rec.get(name)
        if not isinstance(v, int):
            continue
        if logical == "date":
            rec[name] = _dt.date(1970, 1, 1) + _dt.timedelta(days=v)
        else:
            micros = v * 1000 if logical == "timestamp-millis" else v
            rec[name] = _dt.datetime(
                1970, 1, 1
            ) + _dt.timedelta(microseconds=micros)


def read_log_blocks(data: bytes, name: str = "<bytes>") -> list[dict]:
    """Decode every complete block: ``{"type", "instant", "records",
    "deletes"}`` — ``records`` (list of dicts) for data blocks,
    ``deletes`` (list of ``(recordKey, partitionPath)``) for delete
    blocks.  A torn/corrupt tail stops the walk at the last complete
    block; a corrupt FIRST block (bad magic at offset 0) raises — the
    file is not a log file at all."""
    out: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos:pos + len(MAGIC)] != MAGIC:
            if pos == 0:
                raise ValueError(f"{name}: not a Hudi log file")
            break  # torn append past the last complete block
        start = pos
        pos += len(MAGIC)
        if pos + 8 > n:
            break
        (block_len,) = struct.unpack(">q", data[pos:pos + 8])
        pos += 8
        if pos + block_len > n or block_len < 24:
            break  # declared length runs past the file: torn block
        buf = io.BytesIO(data[pos:pos + block_len])
        (version,) = struct.unpack(">i", buf.read(4))
        if version > FORMAT_VERSION:
            raise ValueError(
                f"{name}: log format version {version} is newer than "
                f"this reader understands (max {FORMAT_VERSION})"
            )
        (btype,) = struct.unpack(">i", buf.read(4))
        header = _read_meta(buf)
        (content_len,) = struct.unpack(">q", buf.read(8))
        content = buf.read(content_len)
        _footer = _read_meta(buf)
        (total,) = struct.unpack(">q", buf.read(8))
        pos += block_len
        if total != pos - start:
            break  # trailing size disagrees: treat as torn
        instant = header.get(H_INSTANT_TIME, "")
        if btype == AVRO_DATA_BLOCK:
            schema = json.loads(header[H_SCHEMA])
            temporal = _temporal_fields(schema)
            cbuf = io.BytesIO(content)
            (_cver,) = struct.unpack(">i", cbuf.read(4))
            (count,) = struct.unpack(">i", cbuf.read(4))
            records = []
            for _ in range(count):
                (rlen,) = struct.unpack(">i", cbuf.read(4))
                rbuf = io.BytesIO(cbuf.read(rlen))
                rec = decode_value(schema, rbuf)
                if temporal:
                    _revive_temporal(rec, temporal)
                records.append(rec)
            out.append(
                {"type": "data", "instant": instant,
                 "records": records, "deletes": []}
            )
        elif btype == DELETE_BLOCK:
            cbuf = io.BytesIO(content)
            (_cver,) = struct.unpack(">i", cbuf.read(4))
            (plen,) = struct.unpack(">i", cbuf.read(4))
            pbuf = io.BytesIO(cbuf.read(plen))
            schema = (
                json.loads(header[H_SCHEMA])
                if H_SCHEMA in header
                else DELETE_RECORD_LIST_SCHEMA
            )
            rec: Any = decode_value(schema, pbuf)
            out.append(
                {
                    "type": "delete",
                    "instant": instant,
                    "records": [],
                    "deletes": [
                        (d["recordKey"], d.get("partitionPath", ""))
                        for d in rec["deleteRecordList"]
                    ],
                }
            )
        elif btype == COMMAND_BLOCK:
            # rollback command: blocks whose TARGET_INSTANT_TIME
            # matches a later command are invalid; surfaced so the
            # merge layer can drop them
            out.append(
                {
                    "type": "command",
                    "instant": instant,
                    "target_instant": header.get(
                        H_TARGET_INSTANT_TIME, ""
                    ),
                    "records": [],
                    "deletes": [],
                }
            )
        else:  # CORRUPT_BLOCK or unknown: skip, framing already walked
            out.append(
                {"type": "corrupt", "instant": instant,
                 "records": [], "deletes": []}
            )
    return out


def read_log_file(path: str | Path) -> list[dict]:
    return read_log_blocks(Path(path).read_bytes(), name=str(path))
