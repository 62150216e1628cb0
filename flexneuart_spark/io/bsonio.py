"""BSON data-entry I/O (SURVEY.md §2 S1; reference
``flexneuart/io/pack.py:80-108`` ``write_json_to_bin``/``read_json_from_bin``
and ``utils/DataEntryReader.java:46-90`` format auto-detection).

The reference stores data entries as a stream of ``<uint32-LE length>``
prefixed BSON documents. This runtime ships no ``bson`` package, so the
subset of the BSON spec those entries use (documents, arrays, UTF-8
strings, doubles, int32/int64, booleans, null) is implemented here
directly from the published spec (bsonspec.org, version 1.1) — enough to
read and write reference-produced entry files byte-compatibly.

``read_bson_entries`` is the Spark reader: one task per input file (the
file is the unsplittable unit, as in the reference's sequential readers —
at scale, many files give the parallelism; this matches how the
reference shards collections into numbered .bin parts).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

_I32 = struct.Struct("<i")
_U32 = struct.Struct("<I")
_F64 = struct.Struct("<d")
_I64 = struct.Struct("<q")

_INT32_MIN, _INT32_MAX = -(2**31), 2**31 - 1


def _enc_element(name: str, v) -> bytes:
    key = name.encode("utf-8") + b"\x00"
    if isinstance(v, bool):  # before int: bool is an int subclass
        return b"\x08" + key + (b"\x01" if v else b"\x00")
    if v is None:
        return b"\x0a" + key
    if isinstance(v, float):
        return b"\x01" + key + _F64.pack(v)
    if isinstance(v, int):
        if _INT32_MIN <= v <= _INT32_MAX:
            return b"\x10" + key + _I32.pack(v)
        return b"\x12" + key + _I64.pack(v)
    if isinstance(v, str):
        b = v.encode("utf-8") + b"\x00"
        return b"\x02" + key + _I32.pack(len(b)) + b
    if isinstance(v, dict):
        return b"\x03" + key + bson_dumps(v)
    if isinstance(v, (list, tuple)):
        return b"\x04" + key + bson_dumps({str(i): x for i, x in enumerate(v)})
    raise TypeError(f"unsupported BSON value type: {type(v).__name__}")


def bson_dumps(doc: dict) -> bytes:
    body = b"".join(_enc_element(k, v) for k, v in doc.items())
    total = 4 + len(body) + 1
    return _I32.pack(total) + body + b"\x00"


def _dec_cstring(data: bytes, off: int) -> tuple[str, int]:
    end = data.index(b"\x00", off)
    return data[off:end].decode("utf-8"), end + 1


def _dec_element(data: bytes, off: int):
    t = data[off]
    name, off = _dec_cstring(data, off + 1)
    if t == 0x01:
        return name, _F64.unpack_from(data, off)[0], off + 8
    if t == 0x02:
        (n,) = _I32.unpack_from(data, off)
        s = data[off + 4 : off + 4 + n - 1].decode("utf-8")
        return name, s, off + 4 + n
    if t == 0x03:
        (n,) = _I32.unpack_from(data, off)
        return name, bson_loads(data[off : off + n]), off + n
    if t == 0x04:
        (n,) = _I32.unpack_from(data, off)
        d = bson_loads(data[off : off + n])
        return name, [d[str(i)] for i in range(len(d))], off + n
    if t == 0x08:
        return name, data[off] != 0, off + 1
    if t == 0x0A:
        return name, None, off
    if t == 0x10:
        return name, _I32.unpack_from(data, off)[0], off + 4
    if t == 0x12:
        return name, _I64.unpack_from(data, off)[0], off + 8
    raise ValueError(f"unsupported BSON element type 0x{t:02x} for field {name!r}")


def bson_loads(data: bytes) -> dict:
    (total,) = _I32.unpack_from(data, 0)
    if total != len(data) or data[-1:] != b"\x00":
        raise ValueError("corrupt BSON document (bad length or terminator)")
    out: dict = {}
    off = 4
    while off < total - 1:
        name, v, off = _dec_element(data, off)
        out[name] = v
    return out


def write_json_to_bin(data_elem: dict, out_file) -> None:
    """Length-prefixed BSON record (reference ``pack.py:80-91`` layout)."""
    b = bson_dumps(data_elem)
    out_file.write(_U32.pack(len(b)))
    out_file.write(b)


def read_json_from_bin(inp_file) -> dict | None:
    """Read one record; None at EOF (reference ``pack.py:93-108``)."""
    head = inp_file.read(4)
    if len(head) == 0:
        return None
    if len(head) != 4:
        raise ValueError(f"truncated record header ({len(head)} bytes)")
    (n,) = _U32.unpack(head)
    body = inp_file.read(n)
    if len(body) != n:
        raise ValueError("truncated BSON record body")
    return bson_loads(body)


def iter_bson_records(data: bytes) -> Iterator[dict]:
    off = 0
    while off < len(data):
        if off + 4 > len(data):
            raise ValueError("truncated record header")
        (n,) = _U32.unpack_from(data, off)
        if off + 4 + n > len(data):
            raise ValueError("truncated BSON record body")
        yield bson_loads(data[off + 4 : off + 4 + n])
        off += 4 + n


def read_bson_entries(spark: SparkSession, path: str) -> DataFrame:
    """Data-entry reader for ``*.bin`` BSON streams → DataFrame with
    schema inferred from the JSON-equivalent records (same inference the
    reference's JSONL path gets)."""
    import json

    files = spark.read.format("binaryFile").load(path).select("content")
    rows = files.rdd.flatMap(lambda r: [json.dumps(d) for d in iter_bson_records(bytes(r.content))])
    return spark.read.json(rows)
