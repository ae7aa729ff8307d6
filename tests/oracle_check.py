"""Local replica of the driver's DuckDB-oracle compare.

Mirrors the protocol in FIXTURES.md §Oracle: run the Spark query and the
oracle SQL over the same parquet files, sort columns by name, sort rows,
round floats to fixed precision, compare counts + schema + values.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from pyspark.sql import DataFrame

FLOAT_PRECISION = 6


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in pdf.columns:
        s = pdf[c]
        if s.dtype == object:
            # HUGEINT etc. come back as Python ints/Decimals; stringify uniformly
            pdf[c] = s.map(lambda v: None if v is None else str(v))
        elif s.dtype.kind == "f":
            pdf[c] = s.round(FLOAT_PRECISION)
        elif str(s.dtype).startswith("datetime64"):
            pdf[c] = s.astype("datetime64[us]")
    pdf = pdf.sort_values(by=list(pdf.columns), ignore_index=True, na_position="first")
    return pdf


def compare(spark_df: DataFrame, duck_con: duckdb.DuckDBPyConnection, oracle: str) -> tuple[bool, str]:
    got = _normalize(spark_df.toPandas())
    want = _normalize(duck_con.sql(oracle).df())
    if list(got.columns) != list(want.columns):
        return False, f"schema mismatch: spark={list(got.columns)} duck={list(want.columns)}"
    if len(got) != len(want):
        return False, f"row count mismatch: spark={len(got)} duck={len(want)}"
    for c in got.columns:
        a, b = got[c], want[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            af = pd.to_numeric(a, errors="coerce")
            bf = pd.to_numeric(b, errors="coerce")
            bad = ~(
                (af.isna() & bf.isna())
                | (af - bf).abs().le(10.0 ** -(FLOAT_PRECISION - 2) + (af.abs() + bf.abs()) * 1e-9)
            )
            if bad.any():
                i = bad.idxmax()
                return False, f"value mismatch col={c} row={i}: spark={a[i]!r} duck={b[i]!r}"
        else:
            eq = (a.isna() & b.isna()) | (a == b)
            if not eq.all():
                i = (~eq).idxmax()
                return False, f"value mismatch col={c} row={i}: spark={a[i]!r} duck={b[i]!r}"
    return True, "ok"


def assert_matches_oracle(spark_df: DataFrame, duck_con, oracle: str) -> None:
    ok, msg = compare(spark_df, duck_con, oracle)
    assert ok, msg
