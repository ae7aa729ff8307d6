"""Native / RowBinary / Arrow binary interchange formats.

Byte-level codings validated two ways: pure-Python round-trips over the
full supported type table, and decode of the reference repo's own Arrow
fixture (tests/queries/0_stateless/data_arrow/test.arrow)."""

import datetime
import os

import numpy as np
import pandas as pd
import pytest

from clickhouse_23_3_19_32_lts_spark.sources import binary_formats as bf

TYPES = [
    ("u8", "UInt8"),
    ("u16", "UInt16"),
    ("u32", "UInt32"),
    ("u64", "UInt64"),
    ("i8", "Int8"),
    ("i16", "Int16"),
    ("i32", "Int32"),
    ("i64", "Int64"),
    ("f32", "Float32"),
    ("f64", "Float64"),
    ("s", "String"),
    ("fs", "FixedString(4)"),
    ("d", "Date"),
    ("d32", "Date32"),
    ("dt", "DateTime"),
    ("dt64", "DateTime64(3)"),
    ("ns", "Nullable(String)"),
    ("ni", "Nullable(Int32)"),
    ("ai", "Array(Int64)"),
    ("as_", "Array(String)"),
]


def _fixture() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "u8": [0, 255, 7],
            "u16": [0, 65535, 9],
            "u32": [0, 4294967295, 11],
            "u64": [0, 2**63 - 1, 13],
            "i8": [-128, 127, 0],
            "i16": [-32768, 32767, 1],
            "i32": [-(2**31), 2**31 - 1, 2],
            "i64": [-(2**63), 2**63 - 1, 3],
            "f32": [0.5, -1.25, 3.0],
            "f64": [1e300, -2.5, 0.0],
            "s": ["", "héllo", "a\tb\nc"],
            "fs": ["ab", "wxyz", ""],
            "d": [datetime.date(1970, 1, 1), datetime.date(2023, 3, 19), datetime.date(2106, 1, 1)],
            "d32": [datetime.date(1925, 1, 1), datetime.date(2023, 3, 19), datetime.date(1970, 1, 1)],
            "dt": [
                pd.Timestamp("1970-01-01 00:00:00"),
                pd.Timestamp("2023-03-19 12:34:56"),
                pd.Timestamp("2038-01-19 03:14:07"),
            ],
            "dt64": [
                pd.Timestamp("2023-03-19 12:34:56.789000"),
                pd.Timestamp("1970-01-01 00:00:00.001000"),
                pd.Timestamp("2000-01-01 00:00:00"),
            ],
            "ns": ["x", None, "z"],
            "ni": [1, None, -3],
            "ai": [[1, 2, 3], [], [-(2**40)]],
            "as_": [["a", ""], [], ["x", "y", "z"]],
        }
    )


def _assert_frames_equal(got: pd.DataFrame, want: pd.DataFrame) -> None:
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in want.columns:
        for g, w in zip(got[c], want[c]):
            w_null = not isinstance(w, (list, tuple)) and pd.isna(w)
            if isinstance(w, list):
                assert list(g) == list(w), (c, g, w)
            elif w_null:
                assert g is None or (isinstance(g, float) and np.isnan(g)), (c, g)
            elif isinstance(w, float):
                assert g == pytest.approx(w, rel=1e-6), (c, g, w)
            elif isinstance(w, pd.Timestamp):
                assert pd.Timestamp(g) == w, (c, g, w)
            else:
                assert g == w or str(g) == str(w), (c, g, w)


def test_native_roundtrip():
    pdf = _fixture()
    blob = bf.encode_native(pdf, TYPES)
    got = bf.decode_native(blob)
    _assert_frames_equal(got, pdf)


def test_native_multiblock_concat():
    pdf = _fixture()
    blob = bf.encode_native(pdf.iloc[:2], TYPES) + bf.encode_native(pdf.iloc[2:], TYPES)
    got = bf.decode_native(blob)
    assert len(got) == 3
    _assert_frames_equal(got.reset_index(drop=True), pdf.reset_index(drop=True))


@pytest.mark.parametrize("header", ["none", "names", "names_types"])
def test_rowbinary_roundtrip(header):
    pdf = _fixture()
    blob = bf.encode_rowbinary(pdf, TYPES, header)
    got = bf.decode_rowbinary(blob, TYPES, header)
    _assert_frames_equal(got, pdf)


def test_native_known_bytes():
    """Hand-checked byte layout per NativeWriter.cpp:81-131: varuint n_cols,
    varuint n_rows, then (name, type, data) per column."""
    pdf = pd.DataFrame({"x": [1, 2]})
    blob = bf.encode_native(pdf, [("x", "UInt8")])
    assert blob == bytes(
        [1, 2]  # 1 column, 2 rows (varuints)
        + [1, ord("x")]  # name "x"
        + [5] + list(b"UInt8")  # type
        + [1, 2]  # two UInt8 values
    )
    got = bf.decode_native(blob)
    assert list(got["x"]) == [1, 2]


def test_rowbinary_known_bytes():
    """BinaryRowInputFormat.cpp: row-major; String varuint+bytes; Nullable
    flag byte precedes the value."""
    pdf = pd.DataFrame({"a": [300], "b": ["hi"], "c": [None]})
    types = [("a", "UInt16"), ("b", "String"), ("c", "Nullable(Int8)")]
    blob = bf.encode_rowbinary(pdf, types)
    assert blob == bytes([0x2C, 0x01]) + bytes([2]) + b"hi" + bytes([1, 0])
    got = bf.decode_rowbinary(blob, types)
    assert got["a"][0] == 300 and got["b"][0] == "hi" and got["c"][0] is None


def test_varuint_multibyte():
    import io

    out = io.BytesIO()
    bf._write_varuint(out, 300)
    assert out.getvalue() == bytes([0xAC, 0x02])
    v, pos = bf._read_varuint(memoryview(out.getvalue()), 0)
    assert v == 300 and pos == 2


REF_ARROW = "/root/reference/tests/queries/0_stateless/data_arrow/test.arrow"


@pytest.mark.skipif(not os.path.exists(REF_ARROW), reason="reference fixture absent")
def test_reference_arrow_fixture_decodes():
    data = open(REF_ARROW, "rb").read()
    pdf = bf._arrow_to_pandas(data, stream=False)
    assert len(pdf) > 0 and len(pdf.columns) > 0


# ---- Spark-side distributed read/write ------------------------------------


def test_spark_native_roundtrip(spark, tmp_path):
    pdf = _fixture()
    df = spark.createDataFrame(pdf[["i64", "s", "ai"]])
    out = str(tmp_path / "native_out")
    bf.write_native(df, out, [("i64", "Int64"), ("s", "String"), ("ai", "Array(Int64)")])
    back = bf.read_native(spark, out + "/*.native")
    rows = {r["i64"]: r for r in back.collect()}
    assert set(rows) == set(pdf["i64"])
    assert rows[3]["s"] == "a\tb\nc" and list(rows[3]["ai"]) == [-(2**40)]


def test_spark_rowbinary_with_names_and_types(spark, tmp_path):
    pdf = _fixture()
    df = spark.createDataFrame(pdf[["i32", "ns"]])
    out = str(tmp_path / "rb_out")
    bf.write_rowbinary(df, out, [("i32", "Int32"), ("ns", "Nullable(String)")], "names_types")
    # self-describing: no schema passed
    back = bf.read_rowbinary(spark, out + "/*.bin", None, "names_types")
    rows = sorted(back.collect(), key=lambda r: r["i32"])
    assert [r["i32"] for r in rows] == sorted(pdf["i32"])
    assert {r["ns"] for r in rows} == {"x", None, "z"}


def test_spark_arrow_roundtrip(spark, tmp_path):
    df = spark.range(100).selectExpr("id", "cast(id as string) as s")
    out = str(tmp_path / "arrow_out")
    bf.write_arrow(df, out)
    back = bf.read_arrow(spark, out + "/*.arrow")
    assert back.count() == 100
    assert back.where("id = 42").collect()[0]["s"] == "42"


def test_read_format_dispatch(spark, tmp_path):
    from clickhouse_23_3_19_32_lts_spark.sources.formats import read_format

    df = spark.range(10).selectExpr("cast(id as long) as id")
    out = str(tmp_path / "disp")
    bf.write_native(df, out, [("id", "Int64")])
    got = read_format(spark, out + "/*.native", "Native")
    assert got.count() == 10
