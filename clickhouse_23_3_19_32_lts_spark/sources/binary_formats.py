"""Binary interchange formats: Native, RowBinary, Arrow/ArrowStream.

Reference parity:
- Native       — src/Formats/NativeWriter.cpp:81-131 / NativeReader.cpp
                 (block = varuint n_cols, varuint n_rows, then per column
                 name/type strings + columnar binary bulk; blocks repeat
                 until EOF).
- RowBinary    — src/Processors/Formats/Impl/BinaryRowInputFormat.cpp
                 (row-major, same scalar codings; WithNamesAndTypes adds a
                 varuint column count + name strings [+ type strings]).
- Arrow        — src/Processors/Formats/Impl/ArrowBlockInputFormat.cpp
                 (Arrow IPC file / stream) — real pyarrow here, not a stub.

Scalar codings (src/DataTypes/Serializations/SerializationNumber.cpp,
SerializationString.cpp, SerializationNullable.cpp, SerializationArray.cpp):
little-endian fixed width numbers; String = varuint length + bytes;
Date = UInt16 days since epoch; Date32 = Int32 days; DateTime = UInt32
epoch seconds; DateTime64(p) = Int64 ticks; Nullable(T) = null-flag byte
stream (Native: all flags then all values; RowBinary: flag then value per
row); Array(T) = Native: UInt64 cumulative offsets then flattened nested
data / RowBinary: varuint size then elements.

Supported type subset (documented): U/Int8/16/32/64, Float32/64, String,
FixedString(N), Date, Date32, DateTime, DateTime64(p), Nullable(scalar),
Array(scalar). 128/256-bit ints and exotic nesting raise loudly.

Scale design: reads distribute one task per file via Spark's binaryFile
source + mapInPandas (Arrow-batched); ClickHouse Native/RowBinary files
are not splittable (no sync markers), so per-file parallelism is the same
unit the reference's own clickhouse-local uses. Writes emit one file per
Spark partition under the target directory (standard distributed sink
shape). Pure-Python decode runs vectorized through numpy.frombuffer for
fixed-width columns — only variable-width (String/Array) walks bytes.
"""

from __future__ import annotations

import io
import re
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# type table

_FIXED = {
    "UInt8": ("<u1", T.ShortType()),
    "UInt16": ("<u2", T.IntegerType()),
    "UInt32": ("<u4", T.LongType()),
    "UInt64": ("<u8", T.LongType()),  # documented: wraps to signed at 2^63
    "Int8": ("<i1", T.ByteType()),
    "Int16": ("<i2", T.ShortType()),
    "Int32": ("<i4", T.IntegerType()),
    "Int64": ("<i8", T.LongType()),
    "Float32": ("<f4", T.FloatType()),
    "Float64": ("<f8", T.DoubleType()),
    "Date": ("<u2", T.DateType()),
    "Date32": ("<i4", T.DateType()),
    "DateTime": ("<u4", T.TimestampType()),
    "Bool": ("<u1", T.BooleanType()),
}

_DT64_RE = re.compile(r"^DateTime64\((\d+)(?:\s*,\s*'[^']*')?\)$")
_FS_RE = re.compile(r"^FixedString\((\d+)\)$")
_ENUM_RE = re.compile(r"^Enum(8|16)\((.*)\)$")


def _strip_nullable(t: str) -> tuple[str, bool]:
    t = t.strip()
    if t.startswith("Nullable(") and t.endswith(")"):
        return t[len("Nullable(") : -1].strip(), True
    return t, False


def _spark_type(ch_type: str) -> T.DataType:
    inner, nullable = _strip_nullable(ch_type)
    if inner.startswith("Array(") and inner.endswith(")"):
        return T.ArrayType(_spark_type(inner[6:-1]))
    if inner in _FIXED:
        return _FIXED[inner][1]
    if inner in ("String",) or _FS_RE.match(inner) or _ENUM_RE.match(inner):
        return T.StringType()
    if _DT64_RE.match(inner):
        return T.TimestampType()
    raise ValueError(f"binary formats: unsupported ClickHouse type {ch_type!r}")


def schema_from_ch(pairs: list[tuple[str, str]]) -> T.StructType:
    """[(name, ch_type)] → Spark schema (used by file(..., 'Native') etc.)."""
    return T.StructType(
        [T.StructField(n, _spark_type(t), True) for n, t in pairs]
    )


# ---------------------------------------------------------------------------
# varint + primitives (LEB128 unsigned, src/IO/VarInt.h)


def _read_varuint(buf: memoryview, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _write_varuint(out: io.BytesIO, v: int) -> None:
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.write(bytes((b | 0x80,)))
        else:
            out.write(bytes((b,)))
            return


def _read_binstr(buf: memoryview, pos: int) -> tuple[bytes, int]:
    n, pos = _read_varuint(buf, pos)
    return bytes(buf[pos : pos + n]), pos + n


def _write_binstr(out: io.BytesIO, s: bytes) -> None:
    _write_varuint(out, len(s))
    out.write(s)


def _parse_enum(spec: str) -> dict[int, str]:
    # Enum8('a' = 1, 'b' = 2)
    mapping = {}
    for m in re.finditer(r"'((?:[^'\\]|\\.)*)'\s*=\s*(-?\d+)", spec):
        mapping[int(m.group(2))] = m.group(1)
    return mapping


# ---------------------------------------------------------------------------
# columnar (Native) decode / encode for one column of n rows


def _decode_fixed_col(code: str, buf: memoryview, pos: int, n: int) -> tuple[np.ndarray, int]:
    width = np.dtype(code).itemsize
    arr = np.frombuffer(buf, dtype=code, count=n, offset=pos)
    return arr, pos + n * width


def _to_values(ch_type: str, arr: np.ndarray):
    """Raw numeric array → python-friendly series for the logical type."""
    if ch_type == "Date":
        return pd.Series(arr.astype("int64"), dtype="int64").map(
            lambda d: pd.Timestamp(1970, 1, 1) + pd.Timedelta(days=int(d))
        ).dt.date
    if ch_type == "Date32":
        return pd.Series(arr.astype("int64")).map(
            lambda d: pd.Timestamp(1970, 1, 1) + pd.Timedelta(days=int(d))
        ).dt.date
    if ch_type == "DateTime":
        return pd.to_datetime(arr.astype("int64"), unit="s")
    m = _DT64_RE.match(ch_type)
    if m:
        scale = int(m.group(1))
        ns = arr.astype("int64") * (10 ** (9 - scale))
        return pd.to_datetime(ns, unit="ns")
    if ch_type == "Bool":
        return arr.astype(bool)
    return arr


def _decode_col(ch_type: str, buf: memoryview, pos: int, n: int):
    """Decode n values of ch_type (Native bulk layout) → (list/array, pos)."""
    inner, nullable = _strip_nullable(ch_type)
    if nullable:
        flags = np.frombuffer(buf, dtype="<u1", count=n, offset=pos)
        pos += n
        vals, pos = _decode_col(inner, buf, pos, n)
        out = pd.Series(list(vals), dtype=object)
        out[flags.astype(bool)] = None
        return out, pos
    if inner.startswith("Array("):
        elem = inner[6:-1]
        offs = np.frombuffer(buf, dtype="<u8", count=n, offset=pos)
        pos += 8 * n
        total = int(offs[-1]) if n else 0
        flat, pos = _decode_col(elem, buf, pos, total)
        flat = list(flat)
        starts = np.concatenate(([0], offs[:-1])).astype("int64")
        return [flat[int(s) : int(e)] for s, e in zip(starts, offs)], pos
    if inner == "String":
        out = []
        for _ in range(n):
            s, pos = _read_binstr(buf, pos)
            out.append(s.decode("utf-8", errors="replace"))
        return out, pos
    fm = _FS_RE.match(inner)
    if fm:
        w = int(fm.group(1))
        out = [
            bytes(buf[pos + i * w : pos + (i + 1) * w])
            .rstrip(b"\x00")
            .decode("utf-8", errors="replace")
            for i in range(n)
        ]
        return out, pos + n * w
    em = _ENUM_RE.match(inner)
    if em:
        code = "<i1" if em.group(1) == "8" else "<i2"
        arr, pos = _decode_fixed_col(code, buf, pos, n)
        mapping = _parse_enum(em.group(2))
        return [mapping.get(int(v)) for v in arr], pos
    if inner in _FIXED:
        arr, pos = _decode_fixed_col(_FIXED[inner][0], buf, pos, n)
        return _to_values(inner, arr), pos
    m = _DT64_RE.match(inner)
    if m:
        arr, pos = _decode_fixed_col("<i8", buf, pos, n)
        return _to_values(inner, arr), pos
    raise ValueError(f"Native decode: unsupported type {ch_type!r}")


def _is_null(v) -> bool:
    if v is None:
        return True
    if isinstance(v, (list, tuple, np.ndarray)):
        return False
    try:
        return bool(pd.isna(v))  # NaN / NaT from pandas object columns
    except (TypeError, ValueError):
        return False


def _encode_scalar(out: io.BytesIO, ch_type: str, v) -> None:
    if ch_type == "String":
        _write_binstr(out, ("" if v is None else str(v)).encode("utf-8"))
        return
    fm = _FS_RE.match(ch_type)
    if fm:
        w = int(fm.group(1))
        b = ("" if v is None else str(v)).encode("utf-8")[:w]
        out.write(b.ljust(w, b"\x00"))
        return
    if ch_type == "Date":
        days = 0 if v is None else (pd.Timestamp(v) - pd.Timestamp(1970, 1, 1)).days
        out.write(struct.pack("<H", max(0, days)))
        return
    if ch_type == "Date32":
        days = 0 if v is None else (pd.Timestamp(v) - pd.Timestamp(1970, 1, 1)).days
        out.write(struct.pack("<i", days))
        return
    if ch_type == "DateTime":
        secs = 0 if v is None else int(pd.Timestamp(v).value // 1_000_000_000)
        out.write(struct.pack("<I", max(0, secs)))
        return
    m = _DT64_RE.match(ch_type)
    if m:
        scale = int(m.group(1))
        ticks = 0 if v is None else int(pd.Timestamp(v).value // (10 ** (9 - scale)))
        out.write(struct.pack("<q", ticks))
        return
    code = _FIXED[ch_type][0]
    if v is None:
        v = 0
    if code[1] == "f":
        out.write(np.array([v], dtype=code).tobytes())
    else:
        out.write(np.array([int(v)], dtype=code).tobytes())


def _encode_col(out: io.BytesIO, ch_type: str, values: list) -> None:
    """Encode a full column (Native bulk layout)."""
    inner, nullable = _strip_nullable(ch_type)
    if nullable:
        out.write(bytes(1 if _is_null(v) else 0 for v in values))
        _encode_col(out, inner, [None if _is_null(v) else v for v in values])
        return
    if inner.startswith("Array("):
        elem = inner[6:-1]
        off = 0
        vals = [() if _is_null(v) else v for v in values]
        for v in vals:
            off += len(v)
            out.write(struct.pack("<Q", off))
        flat = [x for v in vals for x in v]
        _encode_col(out, elem, flat)
        return
    fixed = inner in _FIXED and inner not in ("Date", "Date32", "DateTime", "Bool")
    if fixed:
        code = _FIXED[inner][0]
        clean = [0 if _is_null(v) else v for v in values]
        out.write(np.asarray(clean, dtype=code).tobytes())
        return
    for v in values:
        _encode_scalar(out, inner, v)


# ---------------------------------------------------------------------------
# Native file <-> pandas


def decode_native(data: bytes) -> pd.DataFrame:
    """All blocks of a Native stream → one pandas DataFrame."""
    buf = memoryview(data)
    pos = 0
    frames = []
    names: list[str] = []
    while pos < len(buf):
        n_cols, pos = _read_varuint(buf, pos)
        n_rows, pos = _read_varuint(buf, pos)
        cols = {}
        names = []
        for _ in range(n_cols):
            name_b, pos = _read_binstr(buf, pos)
            type_b, pos = _read_binstr(buf, pos)
            vals, pos = _decode_col(type_b.decode(), buf, pos, n_rows)
            name = name_b.decode()
            names.append(name)
            cols[name] = list(vals)
        frames.append(pd.DataFrame(cols, columns=names))
    if not frames:
        return pd.DataFrame()
    return pd.concat(frames, ignore_index=True)


def encode_native(pdf: pd.DataFrame, ch_types: list[tuple[str, str]]) -> bytes:
    """pandas DataFrame → one Native block. ch_types = [(name, ch_type)]."""
    out = io.BytesIO()
    _write_varuint(out, len(ch_types))
    _write_varuint(out, len(pdf))
    for name, ch_type in ch_types:
        _write_binstr(out, name.encode())
        _write_binstr(out, ch_type.encode())
        _encode_col(out, ch_type, list(pdf[name]))
    return out.getvalue()


# ---------------------------------------------------------------------------
# RowBinary file <-> pandas


def _decode_row_value(ch_type: str, buf: memoryview, pos: int):
    inner, nullable = _strip_nullable(ch_type)
    if nullable:
        flag = buf[pos]
        pos += 1
        v, pos = _decode_row_value(inner, buf, pos)
        return (None if flag else v), pos
    if inner.startswith("Array("):
        elem = inner[6:-1]
        n, pos = _read_varuint(buf, pos)
        out = []
        for _ in range(n):
            v, pos = _decode_row_value(elem, buf, pos)
            out.append(v)
        return out, pos
    if inner == "String":
        s, pos = _read_binstr(buf, pos)
        return s.decode("utf-8", errors="replace"), pos
    fm = _FS_RE.match(inner)
    if fm:
        w = int(fm.group(1))
        s = bytes(buf[pos : pos + w]).rstrip(b"\x00").decode("utf-8", errors="replace")
        return s, pos + w
    em = _ENUM_RE.match(inner)
    if em:
        code = "<i1" if em.group(1) == "8" else "<i2"
        w = np.dtype(code).itemsize
        v = int(np.frombuffer(buf, dtype=code, count=1, offset=pos)[0])
        return _parse_enum(em.group(2)).get(v), pos + w
    m = _DT64_RE.match(inner)
    if m:
        v = int(np.frombuffer(buf, dtype="<i8", count=1, offset=pos)[0])
        scale = int(m.group(1))
        return pd.Timestamp(v * (10 ** (9 - scale))), pos + 8
    code = _FIXED[inner][0]
    w = np.dtype(code).itemsize
    raw = np.frombuffer(buf, dtype=code, count=1, offset=pos)[0]
    vals = _to_values(inner, np.array([raw]))
    v = vals[0] if not isinstance(vals, pd.Series) else vals.iloc[0]
    if isinstance(v, np.generic):
        v = v.item()
    return v, pos + w


def decode_rowbinary(
    data: bytes, ch_types: list[tuple[str, str]], header: str = "none"
) -> pd.DataFrame:
    """header: none | names | names_types (RowBinaryWithNames[AndTypes])."""
    buf = memoryview(data)
    pos = 0
    if header != "none":
        n, pos = _read_varuint(buf, pos)
        names = []
        for _ in range(n):
            b, pos = _read_binstr(buf, pos)
            names.append(b.decode())
        if header == "names_types":
            types = []
            for _ in range(n):
                b, pos = _read_binstr(buf, pos)
                types.append(b.decode())
            ch_types = list(zip(names, types))
        else:
            ch_types = [(nm, t) for nm, (_, t) in zip(names, ch_types)]
    rows = []
    while pos < len(buf):
        row = []
        for _, t in ch_types:
            v, pos = _decode_row_value(t, buf, pos)
            row.append(v)
        rows.append(row)
    return pd.DataFrame(rows, columns=[n for n, _ in ch_types])


def encode_rowbinary(
    pdf: pd.DataFrame, ch_types: list[tuple[str, str]], header: str = "none"
) -> bytes:
    out = io.BytesIO()
    if header != "none":
        _write_varuint(out, len(ch_types))
        for n, _ in ch_types:
            _write_binstr(out, n.encode())
        if header == "names_types":
            for _, t in ch_types:
                _write_binstr(out, t.encode())

    def _enc_value(t: str, v) -> None:
        inner, nullable = _strip_nullable(t)
        if nullable:
            if _is_null(v):
                out.write(b"\x01")
                _enc_value(inner, None)
            else:
                out.write(b"\x00")
                _enc_value(inner, v)
            return
        if inner.startswith("Array("):
            elem = inner[6:-1]
            v = () if _is_null(v) else v
            _write_varuint(out, len(v))
            for x in v:
                _enc_value(elem, x)
            return
        _encode_scalar(out, inner, v)

    for _, row in pdf.iterrows():
        for n, t in ch_types:
            _enc_value(t, row[n])
    return out.getvalue()


# ---------------------------------------------------------------------------
# Spark-facing readers/writers (distributed: one task per file)


def _read_via_binary_files(spark: SparkSession, path: str, schema: T.StructType, decode_one):
    """binaryFile scan → mapInPandas decode. One task per file; Arrow-batched
    transfer. Native/RowBinary files have no internal sync markers, so the
    file is the parallelism unit (same as the reference's reader)."""
    files = spark.read.format("binaryFile").load(path).select("content")

    def _gen(batches):
        for pdf in batches:
            for raw in pdf["content"]:
                out = decode_one(bytes(raw))
                for f in schema.fields:
                    if f.name not in out.columns:
                        out[f.name] = None
                yield out[[f.name for f in schema.fields]]

    return files.mapInPandas(_gen, schema=schema)


def read_native(spark: SparkSession, path: str, ch_types: list[tuple[str, str]] | None = None) -> DataFrame:
    """file(path, 'Native'). Schema comes from the stream itself when
    ch_types is omitted (first file is peeked on the driver — header-only,
    bounded read)."""
    if ch_types is None:
        sample = spark.read.format("binaryFile").load(path).select("content").head()
        ch_types = _native_header_types(bytes(sample["content"]))
    schema = schema_from_ch(ch_types)
    return _read_via_binary_files(spark, path, schema, decode_native)


def _native_header_types(data: bytes) -> list[tuple[str, str]]:
    buf = memoryview(data)
    pos = 0
    n_cols, pos = _read_varuint(buf, pos)
    n_rows, pos = _read_varuint(buf, pos)
    out = []
    for _ in range(n_cols):
        name_b, pos = _read_binstr(buf, pos)
        type_b, pos = _read_binstr(buf, pos)
        t = type_b.decode()
        out.append((name_b.decode(), t))
        _, pos = _decode_col(t, buf, pos, n_rows)
    return out


def write_native(df: DataFrame, path: str, ch_types: list[tuple[str, str]]) -> None:
    """One Native file per Spark partition under `path/`."""
    import os
    import uuid

    os.makedirs(path, exist_ok=True)
    cols = [n for n, _ in ch_types]

    def _write_part(batches):
        frames = [p for p in batches]
        pdf = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(columns=cols)
        if len(pdf):
            fname = os.path.join(path, f"part-{uuid.uuid4().hex}.native")
            with open(fname, "wb") as fh:
                fh.write(encode_native(pdf, ch_types))
        yield pd.DataFrame({"files": [1 if len(pdf) else 0]})

    df.select(*cols).mapInPandas(_write_part, schema="files int").collect()


def read_rowbinary(
    spark: SparkSession,
    path: str,
    ch_types: list[tuple[str, str]] | None = None,
    header: str = "none",
) -> DataFrame:
    if ch_types is None:
        if header != "names_types":
            raise ValueError("RowBinary without header needs explicit ch_types")
        sample = spark.read.format("binaryFile").load(path).select("content").head()
        ch_types = list(
            decode_rowbinary(bytes(sample["content"]), [], header).columns
        )
        # re-derive with types
        buf = memoryview(bytes(sample["content"]))
        pos = 0
        n, pos = _read_varuint(buf, pos)
        names = []
        for _ in range(n):
            b, pos = _read_binstr(buf, pos)
            names.append(b.decode())
        types = []
        for _ in range(n):
            b, pos = _read_binstr(buf, pos)
            types.append(b.decode())
        ch_types = list(zip(names, types))
    schema = schema_from_ch(ch_types)
    return _read_via_binary_files(
        spark, path, schema, lambda b: decode_rowbinary(b, ch_types, header)
    )


def write_rowbinary(
    df: DataFrame, path: str, ch_types: list[tuple[str, str]], header: str = "none"
) -> None:
    import os
    import uuid

    os.makedirs(path, exist_ok=True)
    cols = [n for n, _ in ch_types]

    def _write_part(batches):
        frames = [p for p in batches]
        pdf = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(columns=cols)
        if len(pdf):
            fname = os.path.join(path, f"part-{uuid.uuid4().hex}.bin")
            with open(fname, "wb") as fh:
                fh.write(encode_rowbinary(pdf, ch_types, header))
        yield pd.DataFrame({"files": [1 if len(pdf) else 0]})

    df.select(*cols).mapInPandas(_write_part, schema="files int").collect()


# ---------------------------------------------------------------------------
# Arrow (real pyarrow — IPC file and stream variants)


def _arrow_to_pandas(data: bytes, stream: bool) -> pd.DataFrame:
    import pyarrow as pa

    if stream:
        reader = pa.ipc.open_stream(pa.BufferReader(data))
    else:
        reader = pa.ipc.open_file(pa.BufferReader(data))
    return reader.read_all().to_pandas()


def read_arrow(spark: SparkSession, path: str, stream: bool = False) -> DataFrame:
    """file(path, 'Arrow' | 'ArrowStream') — schema from the first file,
    decode distributed one-task-per-file."""
    sample = spark.read.format("binaryFile").load(path).select("content").head()
    pdf = _arrow_to_pandas(bytes(sample["content"]), stream)
    schema = spark.createDataFrame(pdf.head(100)).schema if len(pdf) else spark.createDataFrame(pdf).schema
    return _read_via_binary_files(
        spark, path, schema, lambda b: _arrow_to_pandas(b, stream)
    )


def write_arrow(df: DataFrame, path: str, stream: bool = False) -> None:
    """One Arrow IPC file per Spark partition under `path/`."""
    import os
    import uuid

    import pyarrow as pa

    os.makedirs(path, exist_ok=True)
    ext = "arrows" if stream else "arrow"

    def _write_part(batches):
        frames = [p for p in batches]
        if frames:
            table = pa.Table.from_pandas(
                pd.concat(frames, ignore_index=True), preserve_index=False
            )
            fname = os.path.join(path, f"part-{uuid.uuid4().hex}.{ext}")
            opener = pa.ipc.new_stream if stream else pa.ipc.new_file
            with pa.OSFile(fname, "wb") as sink, opener(sink, table.schema) as w:
                w.write_table(table)
        yield pd.DataFrame({"files": [len(frames)]})

    df.mapInPandas(_write_part, schema="files int").collect()
