"""Minimal Avro object-container reader/writer (pure Python).

The environment ships neither ``fastavro`` nor the ``spark-avro``
datasource module, but Iceberg manifests are Avro files — and they are
*metadata-scale* (KBs), so a small driver-side codec is the right tool
(the reference likewise reads them on its single node via DuckDB's avro
reader, /root/reference/src/util/iceberg.ts:29-33).

Implements the Avro 1.x object container file format per the public
specification (https://avro.apache.org/docs/current/specification/):
magic ``Obj\\x01``, file-metadata map carrying ``avro.schema``, 16-byte
sync marker, blocks of zigzag-varint-encoded records.  Supported schema
subset: null/boolean/int/long/float/double/bytes/string primitives,
records, arrays, maps, unions, fixed — enough for Iceberg manifest
lists and manifest files (and then some).  Codec: ``null`` only.
"""

from __future__ import annotations

import json
import struct
from pathlib import Path
from typing import Any, BinaryIO

_MAGIC = b"Obj\x01"
_SYNC = bytes(range(16))  # deterministic sync marker for written files


# --------------------------------------------------------------------------
# primitive codecs
# --------------------------------------------------------------------------


def _encode_long(n: int) -> bytes:
    """zigzag + varint."""
    n = (n << 1) ^ (n >> 63) if n >= 0 else ((-n - 1) << 1 | 1)
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _decode_long(buf: BinaryIO) -> int:
    shift = 0
    acc = 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("unexpected end of avro data")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _encode_bytes(b: bytes) -> bytes:
    return _encode_long(len(b)) + b


def _encode_str(s: str) -> bytes:
    return _encode_bytes(s.encode("utf-8"))


# --------------------------------------------------------------------------
# schema-driven encode / decode
# --------------------------------------------------------------------------


def _type_name(schema: Any) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


def _temporal_to_avro(schema: Any, value: Any) -> Any:
    """datetime/date → the logical-type integer the schema declares
    (``timestamp-micros``/``timestamp-millis`` on long, ``date`` on
    int).  Naive datetimes encode as UTC wall time — symmetric with
    the decoder, timezone-free; AWARE datetimes convert to UTC first
    (``timegm`` reads wall-clock fields, so an un-converted aware
    value would shift the stored instant by its UTC offset)."""
    import calendar
    import datetime as _dt

    logical = (
        schema.get("logicalType") if isinstance(schema, dict) else None
    )
    if isinstance(value, _dt.datetime):
        if value.tzinfo is not None:
            value = value.astimezone(_dt.timezone.utc)
        micros = (
            calendar.timegm(value.timetuple()) * 1_000_000
            + value.microsecond
        )
        if logical == "timestamp-millis":
            return micros // 1000
        return micros
    if isinstance(value, _dt.date):
        return (value - _dt.date(1970, 1, 1)).days
    return value


def encode_value(schema: Any, value: Any) -> bytes:
    t = _type_name(schema)
    if t == "union":
        for idx, branch in enumerate(schema):
            if _matches(branch, value):
                return _encode_long(idx) + encode_value(branch, value)
        raise ValueError(f"value {value!r} matches no union branch {schema}")
    if t == "null":
        return b""
    if t == "boolean":
        return b"\x01" if value else b"\x00"
    if t in ("int", "long"):
        return _encode_long(int(_temporal_to_avro(schema, value)))
    if t == "float":
        return struct.pack("<f", float(value))
    if t == "double":
        return struct.pack("<d", float(value))
    if t == "bytes":
        return _encode_bytes(value)
    if t == "string":
        return _encode_str(value)
    if t == "fixed":
        return bytes(value)
    if t == "record":
        return b"".join(
            encode_value(f["type"], value[f["name"]])
            for f in schema["fields"]
        )
    if t == "array":
        if not value:
            return _encode_long(0)
        body = b"".join(encode_value(schema["items"], v) for v in value)
        return _encode_long(len(value)) + body + _encode_long(0)
    if t == "map":
        if not value:
            return _encode_long(0)
        body = b"".join(
            _encode_str(k) + encode_value(schema["values"], v)
            for k, v in value.items()
        )
        return _encode_long(len(value)) + body + _encode_long(0)
    raise ValueError(f"unsupported avro type {t!r}")


def _matches(branch: Any, value: Any) -> bool:
    import datetime as _dt

    t = _type_name(branch)
    if t == "null":
        return value is None
    if value is None:
        return False
    if t in ("int", "long"):
        # temporal python values match their logical integer branch
        if isinstance(value, (_dt.datetime, _dt.date)):
            return isinstance(branch, dict) and branch.get(
                "logicalType"
            ) in ("timestamp-micros", "timestamp-millis", "date")
        return isinstance(value, int) and not isinstance(value, bool)
    if t in ("float", "double"):
        return isinstance(value, (int, float)) and not isinstance(value, bool)
    if t == "boolean":
        return isinstance(value, bool)
    if t == "string":
        return isinstance(value, str)
    if t == "bytes":
        return isinstance(value, (bytes, bytearray))
    if t == "record":
        return isinstance(value, dict)
    if t == "array":
        return isinstance(value, list)
    if t == "map":
        return isinstance(value, dict)
    return True


def _compile_decoder(schema: Any):
    """Compile the schema into a closure tree ``fn(data, pos) ->
    (value, pos)`` over a flat ``bytes`` buffer.

    The schema-interpreting :func:`decode_value` dispatches on the
    schema node and calls ``BytesIO.read`` per varint byte — measured
    (cProfile, 512 manifests × 400 entries) that interpretation is
    ~70% of the Iceberg driver metadata walk.  Compiling once per
    file removes the per-value type dispatch and the stream-object
    overhead (direct byte indexing); same supported subset, same
    values (guide §1.2: per-task work, after the distributed shape)."""
    t = _type_name(schema)
    if t == "union":
        branches = tuple(_compile_decoder(b) for b in schema)

        def d_union(data, pos, _b=branches):
            acc = 0
            shift = 0
            while True:
                byte = data[pos]
                pos += 1
                acc |= (byte & 0x7F) << shift
                if not byte & 0x80:
                    break
                shift += 7
            return _b[(acc >> 1) ^ -(acc & 1)](data, pos)

        return d_union
    if t == "null":
        return lambda data, pos: (None, pos)
    if t == "boolean":
        def d_bool(data, pos):
            return data[pos] == 1, pos + 1

        return d_bool
    if t in ("int", "long"):
        def d_long(data, pos):
            acc = 0
            shift = 0
            while True:
                byte = data[pos]
                pos += 1
                acc |= (byte & 0x7F) << shift
                if not byte & 0x80:
                    break
                shift += 7
            return (acc >> 1) ^ -(acc & 1), pos

        return d_long
    if t == "float":
        unpack_f = struct.Struct("<f").unpack_from

        def d_float(data, pos):
            return unpack_f(data, pos)[0], pos + 4

        return d_float
    if t == "double":
        unpack_d = struct.Struct("<d").unpack_from

        def d_double(data, pos):
            return unpack_d(data, pos)[0], pos + 8

        return d_double
    if t in ("bytes", "string"):
        as_str = t == "string"

        def d_bytes(data, pos, _s=as_str):
            acc = 0
            shift = 0
            while True:
                byte = data[pos]
                pos += 1
                acc |= (byte & 0x7F) << shift
                if not byte & 0x80:
                    break
                shift += 7
            n = (acc >> 1) ^ -(acc & 1)
            raw = data[pos:pos + n]
            return (raw.decode("utf-8") if _s else raw), pos + n

        return d_bytes
    if t == "fixed":
        size = schema["size"]

        def d_fixed(data, pos, _n=size):
            return data[pos:pos + _n], pos + _n

        return d_fixed
    if t == "record":
        fields = tuple(
            (f["name"], _compile_decoder(f["type"]))
            for f in schema["fields"]
        )

        def d_record(data, pos, _f=fields):
            out = {}
            for name, dec in _f:
                out[name], pos = dec(data, pos)
            return out, pos

        return d_record
    if t in ("array", "map"):
        is_map = t == "map"
        item = _compile_decoder(schema["values" if is_map else "items"])

        def d_coll(data, pos, _item=item, _m=is_map):
            out = {} if _m else []
            while True:
                acc = 0
                shift = 0
                while True:
                    byte = data[pos]
                    pos += 1
                    acc |= (byte & 0x7F) << shift
                    if not byte & 0x80:
                        break
                    shift += 7
                count = (acc >> 1) ^ -(acc & 1)
                if count == 0:
                    return out, pos
                if count < 0:  # block with byte-size prefix
                    acc = 0
                    shift = 0
                    while True:
                        byte = data[pos]
                        pos += 1
                        acc |= (byte & 0x7F) << shift
                        if not byte & 0x80:
                            break
                        shift += 7
                    count = -count
                if _m:
                    for _ in range(count):
                        acc = 0
                        shift = 0
                        while True:
                            byte = data[pos]
                            pos += 1
                            acc |= (byte & 0x7F) << shift
                            if not byte & 0x80:
                                break
                            shift += 7
                        n = (acc >> 1) ^ -(acc & 1)
                        k = data[pos:pos + n].decode("utf-8")
                        pos += n
                        out[k], pos = _item(data, pos)
                else:
                    for _ in range(count):
                        v, pos = _item(data, pos)
                        out.append(v)

        return d_coll
    raise ValueError(f"unsupported avro type {t!r}")


def decode_value(schema: Any, buf: BinaryIO) -> Any:
    t = _type_name(schema)
    if t == "union":
        idx = _decode_long(buf)
        return decode_value(schema[idx], buf)
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return _decode_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return buf.read(_decode_long(buf))
    if t == "string":
        return buf.read(_decode_long(buf)).decode("utf-8")
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "record":
        return {
            f["name"]: decode_value(f["type"], buf)
            for f in schema["fields"]
        }
    if t == "array":
        out = []
        while True:
            count = _decode_long(buf)
            if count == 0:
                return out
            if count < 0:  # block with byte-size prefix
                _decode_long(buf)
                count = -count
            for _ in range(count):
                out.append(decode_value(schema["items"], buf))
    if t == "map":
        out = {}
        while True:
            count = _decode_long(buf)
            if count == 0:
                return out
            if count < 0:
                _decode_long(buf)
                count = -count
            for _ in range(count):
                k = buf.read(_decode_long(buf)).decode("utf-8")
                out[k] = decode_value(schema["values"], buf)
    raise ValueError(f"unsupported avro type {t!r}")


# --------------------------------------------------------------------------
# object container files
# --------------------------------------------------------------------------


def write_avro(path: str | Path, schema: dict, records: list[dict]) -> None:
    """Write an Avro object container file (codec: null)."""
    body = b"".join(encode_value(schema, r) for r in records)
    meta = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": b"null",
    }
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(_encode_long(len(meta)))
        for k, v in meta.items():
            f.write(_encode_str(k))
            f.write(_encode_bytes(v))
        f.write(_encode_long(0))
        f.write(_SYNC)
        if records:
            f.write(_encode_long(len(records)))
            f.write(_encode_long(len(body)))
            f.write(body)
            f.write(_SYNC)


def read_avro(path: str | Path) -> list[dict]:
    """Read every record of an Avro object container file."""
    with open(path, "rb") as f:
        data = f.read()
    return read_avro_bytes(data, name=str(path))


def read_avro_bytes(data: bytes, name: str = "<bytes>") -> list[dict]:
    """Decode an Avro object container from in-memory bytes (the shape
    an S3 GetObject body arrives in — no temp file round-trip)."""
    import io

    buf = io.BytesIO(data)
    if buf.read(4) != _MAGIC:
        raise ValueError(f"{name}: not an avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        count = _decode_long(buf)
        if count == 0:
            break
        if count < 0:
            _decode_long(buf)
            count = -count
        for _ in range(count):
            k = buf.read(_decode_long(buf)).decode("utf-8")
            meta[k] = buf.read(_decode_long(buf))
    codec = meta.get("avro.codec", b"null")
    schema = json.loads(meta["avro.schema"])
    sync = buf.read(16)
    decoder = _compile_decoder(schema)
    records: list[dict] = []
    while buf.tell() < len(data):
        count = _decode_long(buf)
        size = _decode_long(buf)
        block = buf.read(size)
        if codec == b"deflate":
            import zlib

            block = zlib.decompress(block, -15)
        elif codec != b"null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        pos = 0
        append = records.append
        for _ in range(count):
            rec, pos = decoder(block, pos)
            append(rec)
        if buf.read(16) != sync:
            raise ValueError(f"{name}: sync marker mismatch")
    return records
