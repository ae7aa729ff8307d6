"""Golden-corpus runner: execute reference stateless tests
(/root/reference/tests/queries/0_stateless/*.sql) through the dialect layer
and diff against their .reference files — the reference's own test method
(SURVEY §5.1: run the .sql, literally diff stdout).

Output formatting mirrors ClickHouse TSV: tab-separated values, one row per
line; strings bare at top level but single-quoted inside arrays/tuples;
floats in shortest form (12300, 0.1, 1e-7); NULL as \\N; booleans as 1/0.
"""

from __future__ import annotations

import datetime as _dt
import math
import re

from clickhouse_23_3_19_32_lts_spark.dialect import ChSqlError, translate


def _fmt_float(f: float) -> str:
    if math.isnan(f):
        return "nan"
    if math.isinf(f):
        return "inf" if f > 0 else "-inf"
    if f == int(f) and abs(f) < 1e16:
        return str(int(f))
    s = repr(f)
    s = s.replace("e+", "e")
    s = re.sub(r"e(-?)0(\d)", r"e\1\2", s)
    return s


def _fmt_nested(v) -> str:
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, str):
        escaped = v.replace("\\", "\\\\").replace("'", "\\'")
        return f"'{escaped}'"
    if isinstance(v, float):
        return _fmt_float(v)
    if isinstance(v, decimal.Decimal):
        return _fmt_float(float(v))
    if hasattr(v, "__fields__"):  # Row (struct) → tuple syntax
        return "(" + ",".join(_fmt_nested(x) for x in v) + ")"
    if isinstance(v, tuple):
        return "(" + ",".join(_fmt_nested(x) for x in v) + ")"
    if isinstance(v, list):
        return "[" + ",".join(_fmt_nested(x) for x in v) + "]"
    return str(v)


def _fmt_top(v) -> str:
    import decimal

    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, float):
        return _fmt_float(v)
    if isinstance(v, decimal.Decimal):
        return _fmt_float(float(v))
    if isinstance(v, str):
        return v.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n")
    if isinstance(v, list):
        return "[" + ",".join(_fmt_nested(x) for x in v) + "]"
    if isinstance(v, _dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if hasattr(v, "__fields__"):  # Row (struct)
        return "(" + ",".join(_fmt_nested(x) for x in v) + ")"
    if isinstance(v, tuple):
        return "(" + ",".join(_fmt_nested(x) for x in v) + ")"
    return str(v)


def split_statements(sql_text: str) -> list[str]:
    """Split on ';' outside quotes; strip -- comments."""
    lines = []
    for line in sql_text.splitlines():
        # strip -- comments not inside quotes (simple heuristic: no quote after)
        idx = line.find("--")
        if idx >= 0 and line[:idx].count("'") % 2 == 0:
            line = line[:idx]
        lines.append(line)
    text = "\n".join(lines)
    stmts, cur, in_str = [], [], False
    i = 0
    while i < len(text):
        c = text[i]
        if c == "'":
            in_str = not in_str
            cur.append(c)
        elif c == ";" and not in_str:
            stmts.append("".join(cur))
            cur = []
        else:
            cur.append(c)
        i += 1
    stmts.append("".join(cur))
    return [s.strip() for s in stmts if s.strip()]


def run_golden(spark, sql_path: str, reference_path: str) -> tuple[bool, str]:
    """Run every statement; compare concatenated formatted output to the
    .reference file. Returns (ok, detail)."""
    sql_text = open(sql_path).read()
    want = open(reference_path).read().rstrip("\n")
    out_lines: list[str] = []
    for stmt in split_statements(sql_text):
        try:
            spark_sql = translate(stmt)
            rows = spark.sql(spark_sql).collect()
        except ChSqlError as ex:
            return False, f"translate error: {ex}"
        except Exception as ex:  # noqa: BLE001 — report engine errors as diffs
            return False, f"exec error: {str(ex).splitlines()[0][:200]}"
        for r in rows:
            out_lines.append("\t".join(_fmt_top(v) for v in r))
    got = "\n".join(out_lines)
    if got == want:
        return True, "ok"
    return False, f"mismatch:\n--got--\n{got[:400]}\n--want--\n{want[:400]}"
