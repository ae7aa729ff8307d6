"""MsgPack and BSONEachRow interchange formats — pure public binary specs.

Reference parity:
- MsgPack     — src/Processors/Formats/Impl/MsgPackRowInputFormat.cpp /
                MsgPackRowOutputFormat.cpp: a row is num_columns consecutive
                MessagePack values (no array wrapper); files are just rows
                back to back. Wire format per the public MessagePack spec
                (github.com/msgpack/msgpack/blob/master/spec.md).
- BSONEachRow — src/Processors/Formats/Impl/BSONEachRowRowInputFormat.cpp /
                BSONEachRowRowOutputFormat.cpp: each row is one BSON
                document (int32 size, elements, 0x00 terminator) keyed by
                column name. Wire format per the public BSON spec
                (bsonspec.org/spec.html). Type mapping (countBSONFieldSize,
                BSONEachRowRowOutputFormat.cpp:115-240):
                  Int8/16/32, UInt8/16, Date, Date32   -> int32  (0x10)
                  UInt32, Int64, UInt64, DateTime(64)  -> int64  (0x12)
                  Float32/64                           -> double (0x01)
                  Bool                                 -> bool   (0x08)
                  String/FixedString                   -> binary (0x05,
                    subtype 0) by default; BSON string (0x02) under
                    output_format_bson_string_as_string=1
                  Array / unnamed Tuple -> embedded array document (0x04)
                    with "0","1",… keys; named Tuple -> document (0x03)
                  Nullable(NULL) -> null (0x0A)
                Input validation (BSONEachRowRowInputFormat.cpp): a
                document size < 5 or past the buffer end, or a duplicate
                column name, raises INCORRECT_DATA.

Both codecs are driver-side for inline literals (the format() table
function / FORMAT output over collected rows, bounded by the render
max_rows cap) and Arrow-batched via mapInPandas for file reads — the same
per-file-parallel shape as binary_formats.py (neither format is
splittable; one task per file matches the reference's own reader unit).

Supported type subset (documented): the scalar table above + Array/Tuple
of scalars + Nullable(scalar). 128/256-bit ints raise loudly.
"""

from __future__ import annotations

import math
import struct

import pandas as pd


class FormatError(ValueError):
    """Malformed payload — maps to ClickHouse INCORRECT_DATA."""


def _split_type_args(s: str) -> list[str]:
    """Split a type-argument list on top-level commas."""
    parts, depth, cur = [], 0, []
    for c in s:
        if c in "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if c == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(c)
    if cur:
        parts.append("".join(cur))
    return parts


# ---------------------------------------------------------------------------
# MessagePack value codec (public spec)


class MpExt:
    """MessagePack ext value (type, data) — the reference writes UUIDs as
    fixext16 type 2 under output_format_msgpack_uuid_representation='ext'
    (MsgPackRowOutputFormat.cpp serializeUUID)."""

    __slots__ = ("type", "data")

    def __init__(self, type_: int, data: bytes):
        self.type, self.data = type_, data

    def __eq__(self, o):
        return isinstance(o, MpExt) and (self.type, self.data) == (o.type, o.data)

    def __repr__(self):
        return f"MpExt({self.type}, {self.data.hex()})"


def mp_pack(v, out: bytearray) -> None:
    if isinstance(v, MpExt):
        n = len(v.data)
        fix = {1: 0xD4, 2: 0xD5, 4: 0xD6, 8: 0xD7, 16: 0xD8}.get(n)
        if fix is not None:
            out.append(fix)
        elif n <= 0xFF:
            out += struct.pack(">BB", 0xC7, n)
        elif n <= 0xFFFF:
            out += struct.pack(">BH", 0xC8, n)
        else:
            out += struct.pack(">BI", 0xC9, n)
        out += struct.pack(">b", v.type)
        out += v.data
        return
    if v is None:
        out.append(0xC0)
    elif isinstance(v, bool):
        out.append(0xC3 if v else 0xC2)
    elif isinstance(v, int):
        if 0 <= v <= 0x7F:
            out.append(v)
        elif -32 <= v < 0:
            out.append(v & 0xFF)
        elif 0 <= v <= 0xFF:
            out += struct.pack(">BB", 0xCC, v)
        elif 0 <= v <= 0xFFFF:
            out += struct.pack(">BH", 0xCD, v)
        elif 0 <= v <= 0xFFFFFFFF:
            out += struct.pack(">BI", 0xCE, v)
        elif 0 <= v <= 0xFFFFFFFFFFFFFFFF:
            out += struct.pack(">BQ", 0xCF, v)
        elif -0x80 <= v < 0:
            out += struct.pack(">Bb", 0xD0, v)
        elif -0x8000 <= v < 0:
            out += struct.pack(">Bh", 0xD1, v)
        elif -0x80000000 <= v < 0:
            out += struct.pack(">Bi", 0xD2, v)
        elif -0x8000000000000000 <= v < 0:
            out += struct.pack(">Bq", 0xD3, v)
        else:
            raise FormatError(f"msgpack: integer out of 64-bit range: {v}")
    elif isinstance(v, float):
        out += struct.pack(">Bd", 0xCB, v)
    elif isinstance(v, str):
        b = v.encode("utf-8")
        n = len(b)
        if n <= 31:
            out.append(0xA0 | n)
        elif n <= 0xFF:
            out += struct.pack(">BB", 0xD9, n)
        elif n <= 0xFFFF:
            out += struct.pack(">BH", 0xDA, n)
        else:
            out += struct.pack(">BI", 0xDB, n)
        out += b
    elif isinstance(v, (bytes, bytearray)):
        n = len(v)
        if n <= 0xFF:
            out += struct.pack(">BB", 0xC4, n)
        elif n <= 0xFFFF:
            out += struct.pack(">BH", 0xC5, n)
        else:
            out += struct.pack(">BI", 0xC6, n)
        out += v
    elif isinstance(v, (list, tuple)):
        n = len(v)
        if n <= 15:
            out.append(0x90 | n)
        elif n <= 0xFFFF:
            out += struct.pack(">BH", 0xDC, n)
        else:
            out += struct.pack(">BI", 0xDD, n)
        for item in v:
            mp_pack(item, out)
    elif isinstance(v, dict):
        n = len(v)
        if n <= 15:
            out.append(0x80 | n)
        elif n <= 0xFFFF:
            out += struct.pack(">BH", 0xDE, n)
        else:
            out += struct.pack(">BI", 0xDF, n)
        for k, item in v.items():
            mp_pack(k, out)
            mp_pack(item, out)
    else:
        raise FormatError(f"msgpack: unsupported value {type(v).__name__}")


def mp_unpack(buf: bytes, pos: int):
    if pos >= len(buf):
        raise FormatError("msgpack: truncated data")
    b = buf[pos]
    pos += 1
    if b <= 0x7F:
        return b, pos
    if b >= 0xE0:
        return b - 0x100, pos
    if 0xA0 <= b <= 0xBF:
        n = b & 0x1F
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if 0x90 <= b <= 0x9F:
        n = b & 0x0F
        items = []
        for _ in range(n):
            v, pos = mp_unpack(buf, pos)
            items.append(v)
        return items, pos
    if 0x80 <= b <= 0x8F:
        n = b & 0x0F
        d = {}
        for _ in range(n):
            k, pos = mp_unpack(buf, pos)
            v, pos = mp_unpack(buf, pos)
            d[k] = v
        return d, pos
    if b == 0xC0:
        return None, pos
    if b == 0xC2:
        return False, pos
    if b == 0xC3:
        return True, pos
    fixed = {
        0xCC: (">B", 1), 0xCD: (">H", 2), 0xCE: (">I", 4), 0xCF: (">Q", 8),
        0xD0: (">b", 1), 0xD1: (">h", 2), 0xD2: (">i", 4), 0xD3: (">q", 8),
        0xCA: (">f", 4), 0xCB: (">d", 8),
    }
    if b in fixed:
        fmtc, n = fixed[b]
        if pos + n > len(buf):
            raise FormatError("msgpack: truncated number")
        return struct.unpack_from(fmtc, buf, pos)[0], pos + n
    if b in (0xD9, 0xDA, 0xDB):  # str 8/16/32
        n_len = {0xD9: 1, 0xDA: 2, 0xDB: 4}[b]
        n = int.from_bytes(buf[pos : pos + n_len], "big")
        pos += n_len
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if b in (0xC4, 0xC5, 0xC6):  # bin 8/16/32
        n_len = {0xC4: 1, 0xC5: 2, 0xC6: 4}[b]
        n = int.from_bytes(buf[pos : pos + n_len], "big")
        pos += n_len
        return bytes(buf[pos : pos + n]), pos + n
    if b in (0xDC, 0xDD):  # array 16/32
        n_len = {0xDC: 2, 0xDD: 4}[b]
        n = int.from_bytes(buf[pos : pos + n_len], "big")
        pos += n_len
        items = []
        for _ in range(n):
            v, pos = mp_unpack(buf, pos)
            items.append(v)
        return items, pos
    if b in (0xDE, 0xDF):  # map 16/32
        n_len = {0xDE: 2, 0xDF: 4}[b]
        n = int.from_bytes(buf[pos : pos + n_len], "big")
        pos += n_len
        d = {}
        for _ in range(n):
            k, pos = mp_unpack(buf, pos)
            v, pos = mp_unpack(buf, pos)
            d[k] = v
        return d, pos
    if b in (0xD4, 0xD5, 0xD6, 0xD7, 0xD8):  # fixext 1/2/4/8/16
        n = 1 << (b - 0xD4)
        t = struct.unpack_from(">b", buf, pos)[0]
        return MpExt(t, bytes(buf[pos + 1 : pos + 1 + n])), pos + 1 + n
    if b in (0xC7, 0xC8, 0xC9):  # ext 8/16/32
        n_len = {0xC7: 1, 0xC8: 2, 0xC9: 4}[b]
        n = int.from_bytes(buf[pos : pos + n_len], "big")
        pos += n_len
        t = struct.unpack_from(">b", buf, pos)[0]
        return MpExt(t, bytes(buf[pos + 1 : pos + 1 + n])), pos + 1 + n
    raise FormatError(f"msgpack: unsupported type byte 0x{b:02x}")


def encode_msgpack(rows: list[list], ch_types: list[str] | None = None) -> bytes:
    """Row-major stream of MessagePack values (MsgPackRowOutputFormat.cpp:
    one value per cell, no row wrapper). Strings stay str (the reference
    writes String as msgpack str by default)."""
    out = bytearray()
    for r in rows:
        for v in r:
            if hasattr(v, "item"):  # numpy scalar
                v = v.item()
            if isinstance(v, float) and math.isnan(v):
                v = None
            mp_pack(v, out)
    return bytes(out)


def decode_msgpack(data: bytes, n_cols: int) -> list[list]:
    """Split a MessagePack value stream into rows of n_cols values."""
    rows: list[list] = []
    pos = 0
    cur: list = []
    while pos < len(data):
        v, pos = mp_unpack(data, pos)
        cur.append(v)
        if len(cur) == n_cols:
            rows.append(cur)
            cur = []
    if cur:
        raise FormatError(
            f"msgpack: trailing {len(cur)} values do not fill a {n_cols}-column row"
        )
    return rows


# ---------------------------------------------------------------------------
# BSON document codec (public spec, bsonspec.org)

_BSON_DOUBLE = 0x01
_BSON_STRING = 0x02
_BSON_DOC = 0x03
_BSON_ARRAY = 0x04
_BSON_BINARY = 0x05
_BSON_BOOL = 0x08
_BSON_DATETIME = 0x09
_BSON_NULL = 0x0A
_BSON_INT32 = 0x10
_BSON_TIMESTAMP = 0x11
_BSON_INT64 = 0x12

_INT32_CH = {"int8", "int16", "int32", "uint8", "uint16", "date", "date32"}
_INT64_CH = {"uint32", "int64", "uint64", "datetime", "datetime64"}


def _bson_elem(name: str, ch_type: str, v, as_string: bool) -> bytes:
    """One BSON element: type byte, cstring name, payload."""
    key = name.encode("utf-8") + b"\x00"
    t = ch_type.strip()
    low = t.lower()
    if low.startswith("nullable("):
        if v is None:
            return bytes([_BSON_NULL]) + key
        return _bson_elem(name, t[9:-1], v, as_string)
    if v is None:
        return bytes([_BSON_NULL]) + key
    if low.startswith("array("):
        inner = t[6:-1]
        body = b"".join(
            _bson_elem(str(i), inner, item, as_string) for i, item in enumerate(v)
        )
        doc = struct.pack("<i", len(body) + 5) + body + b"\x00"
        return bytes([_BSON_ARRAY]) + key + doc
    if low.startswith("tuple("):
        parts = _split_type_args(t[6:-1])
        named = all(" " in p.strip() and not p.strip()[0].isdigit() for p in parts)
        items = list(v.values()) if isinstance(v, dict) else list(v)
        body = b""
        for i, (p, item) in enumerate(zip(parts, items)):
            p = p.strip()
            if named:
                nm, _, ty = p.partition(" ")
            else:
                nm, ty = str(i), p
            body += _bson_elem(nm, ty, item, as_string)
        doc = struct.pack("<i", len(body) + 5) + body + b"\x00"
        return bytes([_BSON_DOC if named else _BSON_ARRAY]) + key + doc
    if low in _INT32_CH:
        return bytes([_BSON_INT32]) + key + struct.pack("<i", int(v))
    if low in _INT64_CH or low.startswith("datetime64"):
        iv = int(v)
        if iv >= 1 << 63:  # UInt64 top half wraps to the signed lane
            iv -= 1 << 64
        return bytes([_BSON_INT64]) + key + struct.pack("<q", iv)
    if low in ("float32", "float64"):
        return bytes([_BSON_DOUBLE]) + key + struct.pack("<d", float(v))
    if low == "bool":
        return bytes([_BSON_BOOL]) + key + (b"\x01" if v else b"\x00")
    if low == "string" or low.startswith("fixedstring") or low.startswith("enum"):
        b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
        if as_string:
            return (
                bytes([_BSON_STRING]) + key
                + struct.pack("<i", len(b) + 1) + b + b"\x00"
            )
        return (
            bytes([_BSON_BINARY]) + key
            + struct.pack("<i", len(b)) + b"\x00" + b
        )
    raise FormatError(f"BSON: unsupported ClickHouse type {ch_type!r}")


def encode_bson_each_row(
    rows: list[list], ch_meta: list[tuple[str, str]], as_string: bool = False
) -> bytes:
    out = bytearray()
    for r in rows:
        body = b"".join(
            _bson_elem(nm, ty, v, as_string)
            for (nm, ty), v in zip(ch_meta, r)
        )
        out += struct.pack("<i", len(body) + 5) + body + b"\x00"
    return bytes(out)


def _bson_read_cstr(buf: bytes, pos: int) -> tuple[str, int]:
    end = buf.index(b"\x00", pos)
    return buf[pos:end].decode("utf-8", errors="replace"), end + 1


def _bson_read_value(buf: bytes, t: int, pos: int):
    if t == _BSON_DOUBLE:
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t == _BSON_STRING:
        n = struct.unpack_from("<i", buf, pos)[0]
        if n < 1 or pos + 4 + n > len(buf):
            raise FormatError("BSON: bad string length")
        return buf[pos + 4 : pos + 4 + n - 1].decode("utf-8", "replace"), pos + 4 + n
    if t in (_BSON_DOC, _BSON_ARRAY):
        n = struct.unpack_from("<i", buf, pos)[0]
        if n < 5 or pos + n > len(buf):
            raise FormatError("BSON: bad embedded document size")
        sub, _ = _bson_decode_doc(buf[pos : pos + n])
        if t == _BSON_ARRAY:
            return [sub[k] for k in sub], pos + n
        return sub, pos + n
    if t == _BSON_BINARY:
        n = struct.unpack_from("<i", buf, pos)[0]
        if n < 0 or pos + 5 + n > len(buf):
            raise FormatError("BSON: bad binary length")
        return bytes(buf[pos + 5 : pos + 5 + n]), pos + 5 + n
    if t == _BSON_BOOL:
        return buf[pos] != 0, pos + 1
    if t in (_BSON_DATETIME, _BSON_TIMESTAMP, _BSON_INT64):
        return struct.unpack_from("<q", buf, pos)[0], pos + 8
    if t == _BSON_NULL:
        return None, pos
    if t == _BSON_INT32:
        return struct.unpack_from("<i", buf, pos)[0], pos + 4
    raise FormatError(f"BSON: unsupported element type 0x{t:02x}")


def _bson_decode_doc(doc: bytes) -> tuple[dict, int]:
    """Decode one document (size already sliced). Returns (fields, size).
    Duplicate keys raise (BSONEachRowRowInputFormat INCORRECT_DATA)."""
    size = struct.unpack_from("<i", doc, 0)[0]
    if size != len(doc) or size < 5 or doc[-1] != 0:
        raise FormatError("BSON: invalid document size")
    fields: dict = {}
    pos = 4
    while pos < size - 1:
        t = doc[pos]
        pos += 1
        name, pos = _bson_read_cstr(doc, pos)
        if name in fields:
            raise FormatError(f"BSON: duplicate column {name!r}")
        v, pos = _bson_read_value(doc, t, pos)
        fields[name] = v
    return fields, size


def decode_bson_each_row(data: bytes) -> list[dict]:
    """Split a byte stream into BSON documents and decode each.
    Size-prefix validation mirrors the reference reader: a size that is
    < 5 or overruns the buffer is INCORRECT_DATA (02589)."""
    rows: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        if pos + 4 > n:
            raise FormatError("BSON: truncated document size")
        size = struct.unpack_from("<i", data, pos)[0]
        if size < 5 or pos + size > n:
            raise FormatError(f"BSON: invalid document size {size}")
        fields, _ = _bson_decode_doc(data[pos : pos + size])
        rows.append(fields)
        pos += size
    return rows


def bson_rows_to_pandas(rows: list[dict], names: list[str]) -> pd.DataFrame:
    cols = {nm: [] for nm in names}
    for r in rows:
        for nm in names:
            v = r.get(nm)
            if isinstance(v, bytes):  # String-as-binary default
                v = v.decode("utf-8", errors="replace")
            cols[nm].append(v)
    return pd.DataFrame(cols, columns=names)
