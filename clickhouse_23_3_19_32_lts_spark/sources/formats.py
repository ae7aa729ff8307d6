"""Format I/O: ClickHouse format names → Spark DataFrameReader/Writer.

Reference: ~40 input/output formats under src/Processors/Formats/Impl/
(SURVEY §2.1). Parity scope (per SURVEY): CSV/TSV families, JSONEachRow,
Parquet, ORC, Avro-if-available; the text exotica (Pretty*, Template,
Markdown, XML) are output-rendering concerns, not data formats, and are out
of scope for an analytics engine on Spark.

Each entry maps to a Spark source + fixed options so round-trips are
deterministic. All readers accept an explicit schema (ClickHouse requires
one in DDL; inference is opt-in like clickhouse's schema_inference)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

# name (ClickHouse, case-sensitive like FormatFactory) → (spark format, opts)
FORMAT_MAP: dict[str, tuple[str, dict[str, str]]] = {
    "CSV": ("csv", {"header": "false"}),
    "CSVWithNames": ("csv", {"header": "true"}),
    "TSV": ("csv", {"header": "false", "sep": "\t"}),
    "TabSeparated": ("csv", {"header": "false", "sep": "\t"}),
    "TSVWithNames": ("csv", {"header": "true", "sep": "\t"}),
    "TabSeparatedWithNames": ("csv", {"header": "true", "sep": "\t"}),
    "JSONEachRow": ("json", {}),
    "NDJSON": ("json", {}),
    "JSONLines": ("json", {}),
    "Parquet": ("parquet", {}),
    "ORC": ("orc", {}),
    "Avro": ("avro", {}),  # needs spark-avro on the cluster
    "RawBLOB": ("binaryFile", {}),
    "LineAsString": ("text", {}),
}


def read_format(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema=None,
    **options: str,
) -> DataFrame:
    """file(path, Format[, schema]) table function / FORMAT clause on read."""
    if fmt in _BINARY_READERS:
        from . import binary_formats as bf

        return _BINARY_READERS[fmt](bf, spark, path, schema)
    if fmt not in FORMAT_MAP:
        raise ValueError(f"unsupported format {fmt!r}; known: {sorted(FORMAT_MAP) + sorted(_BINARY_READERS)}")
    source, opts = FORMAT_MAP[fmt]
    reader = spark.read.format(source).options(**{**opts, **options})
    if schema is not None:
        reader = reader.schema(schema)
    elif source == "csv":
        reader = reader.option("inferSchema", "true")
    return reader.load(path)


def write_format(df: DataFrame, path: str, fmt: str, mode: str = "overwrite", **options: str) -> None:
    """INSERT INTO FUNCTION file(path, Format) / output FORMAT clause."""
    if fmt not in FORMAT_MAP:
        raise ValueError(f"unsupported format {fmt!r}; known: {sorted(FORMAT_MAP)}")
    source, opts = FORMAT_MAP[fmt]
    if source in ("binaryFile",):
        raise ValueError(f"format {fmt!r} is read-only")
    df.write.format(source).options(**{**opts, **options}).mode(mode).save(path)


# Binary interchange formats (Native / RowBinary* / Arrow*): schema param is
# either a [(name, ch_type)] list or None (self-describing variants derive it
# from the stream header). See binary_formats.py for codings + citations.
_BINARY_READERS = {
    "Native": lambda bf, sp, p, s: bf.read_native(sp, p, s),
    "RowBinary": lambda bf, sp, p, s: bf.read_rowbinary(sp, p, s, "none"),
    "RowBinaryWithNames": lambda bf, sp, p, s: bf.read_rowbinary(sp, p, s, "names"),
    "RowBinaryWithNamesAndTypes": lambda bf, sp, p, s: bf.read_rowbinary(
        sp, p, s, "names_types"
    ),
    "Arrow": lambda bf, sp, p, s: bf.read_arrow(sp, p, stream=False),
    "ArrowStream": lambda bf, sp, p, s: bf.read_arrow(sp, p, stream=True),
}


# --- structured-text input formats (parse with codegen expressions) ---------

from pyspark.sql import Column, functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402


def _cast_positional(parsed: Column, schema: T.StructType) -> list[Column]:
    return [
        F.element_at(parsed, i + 1).cast(f.dataType).alias(f.name)
        for i, f in enumerate(schema.fields)
    ]


def read_json_compact_each_row(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """JSONCompactEachRow (JSONCompactEachRowRowInputFormat.h): one JSON
    array per line, positional columns. Parsed with from_json — stays in
    codegen, no Python."""
    raw = spark.read.text(path)
    parsed = F.from_json("value", T.ArrayType(T.StringType()))
    return raw.select(_cast_positional(parsed, schema))


def read_tskv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """TSKV (TSKVRowInputFormat.h): `key=value<TAB>key=value` lines →
    str_to_map, then typed extraction by name."""
    raw = spark.read.text(path)
    m = F.str_to_map("value", F.lit("\t"), F.lit("="))
    return raw.select(
        *[F.element_at(m, f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )


def read_regexp(
    spark: SparkSession, path: str, schema: T.StructType, pattern: str
) -> DataFrame:
    """Regexp format (RegexpRowInputFormat.h): one capture group per column."""
    raw = spark.read.text(path)
    return raw.select(
        *[
            F.regexp_extract("value", pattern, i + 1).cast(f.dataType).alias(f.name)
            for i, f in enumerate(schema.fields)
        ]
    )


def read_values(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Values format (ValuesBlockInputFormat.cpp): `(a, b), (c, d)` literal
    rows. Parsed per file split via mapInPandas (Arrow-batched; the parser
    ships by value) — Values files are DDL-sized, never the bulk path."""
    names = [f.name for f in schema.fields]

    def _parse(iterator):
        import pandas as pd

        for pdf in iterator:
            rows = []
            for blob in pdf["value"]:
                depth, cur, in_str, fields, out = 0, [], False, [], []
                i = 0
                s = blob or ""
                while i < len(s):
                    c = s[i]
                    if in_str:
                        cur.append(c)
                        if c == "\\" and i + 1 < len(s):
                            cur.append(s[i + 1])
                            i += 2
                            continue
                        if c == "'":
                            in_str = False
                    elif c == "'":
                        in_str = True
                        cur.append(c)
                    elif c == "(":
                        depth += 1
                        if depth > 1:
                            cur.append(c)
                    elif c == ")":
                        depth -= 1
                        if depth:
                            cur.append(c)
                        else:
                            fields.append("".join(cur).strip())
                            out.append(fields)
                            fields, cur = [], []
                    elif c == "," and depth == 1:
                        fields.append("".join(cur).strip())
                        cur = []
                    elif depth:
                        cur.append(c)
                    i += 1
                for fs in out:
                    rows.append([_values_literal(v) for v in fs])
            yield pd.DataFrame(rows, columns=names) if rows else pd.DataFrame(
                columns=names
            )

    raw = spark.read.text(path, wholetext=True)
    parsed = raw.mapInPandas(_parse, schema=T.StructType(
        [T.StructField(n, T.StringType()) for n in names]
    ))
    return parsed.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )


def _values_literal(v: str):
    """Decode a single Values literal to its string form (CAST-ready)."""
    v = v.strip()
    if v.upper() == "NULL":
        return None
    if v.startswith("'") and v.endswith("'"):
        body = v[1:-1]
        out, i = [], 0
        while i < len(body):
            if body[i] == "\\" and i + 1 < len(body):
                out.append({"n": "\n", "t": "\t", "r": "\r", "0": "\0"}.get(body[i + 1], body[i + 1]))
                i += 2
            else:
                out.append(body[i])
                i += 1
        return "".join(out)
    return v


def read_template(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    row_format: str,
) -> DataFrame:
    """Template format (TemplateBlockInputFormat.cpp), row-template subset:
    `${col:Esc}` placeholders between literal delimiters become one regex
    capture group per column, reusing the Regexp reader machinery."""
    parts = re.split(r"\$\{[^}]*\}", row_format)
    n_cols = len(parts) - 1
    if n_cols != len(schema.fields):
        raise ValueError(
            f"row template has {n_cols} placeholders for {len(schema.fields)} columns"
        )
    pattern = "(.*?)".join(re.escape(p) for p in parts[:-1]) + "(.*?)" + re.escape(parts[-1]) + "$"
    return read_regexp(spark, path, schema, "^" + pattern)


def read_custom_separated(
    spark: SparkSession, path: str, schema: T.StructType, sep: str
) -> DataFrame:
    """CustomSeparated with a literal field separator."""
    return (
        spark.read.format("csv")
        .option("sep", sep)
        .schema(schema)
        .load(path)
    )


# --- output renderings (terminal/display formats; driver-side by design) ----
# The reference renders these on the server's output stream one block at a
# time (src/Processors/Formats/Impl/Pretty*, JSONRowOutputFormat.h,
# ValuesRowOutputFormat.h, VerticalRowOutputFormat.h, MarkdownRowOutput
# Format.h, XMLRowOutputFormat.h) — inherently a collect-to-display path,
# NOT a distributed sink, so a driver-side string builder is the honest
# Spark equivalent. Cap rows like clickhouse-client's default cutoff.


def _fmt_cell(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "1" if v else "0"
    return str(v)


def render_format(df: DataFrame, fmt: str, max_rows: int = 10000) -> str:
    rows = df.limit(max_rows).collect()
    names = df.columns
    if fmt in ("Pretty", "PrettyCompact", "PrettyCompactMonoBlock"):
        cells = [[_fmt_cell(v) for v in r] for r in rows]
        widths = [
            max([len(n)] + [len(c[i]) for c in cells]) for i, n in enumerate(names)
        ]
        sep_top = "┌" + "┬".join("─" * (w + 2) for w in widths) + "┐"
        sep_bot = "└" + "┴".join("─" * (w + 2) for w in widths) + "┘"
        head = "│" + "│".join(f" {n.ljust(w)} " for n, w in zip(names, widths)) + "│"
        body = [
            "│" + "│".join(f" {c[i].ljust(widths[i])} " for i in range(len(names))) + "│"
            for c in cells
        ]
        return "\n".join([sep_top, head, *body, sep_bot])
    if fmt == "Values":
        return ", ".join(
            "(" + ",".join(_sql_lit(v) for v in r) + ")" for r in rows
        )
    if fmt == "Vertical":
        blocks = []
        for i, r in enumerate(rows, 1):
            lines = [f"Row {i}:", "─" * 6]
            lines += [f"{n}: {_fmt_cell(v)}" for n, v in zip(names, r)]
            blocks.append("\n".join(lines))
        return "\n\n".join(blocks)
    if fmt == "Markdown":
        head = "| " + " | ".join(names) + " |"
        sep = "|" + "|".join(":---:" for _ in names) + "|"
        body = ["| " + " | ".join(_fmt_cell(v) for v in r) + " |" for r in rows]
        return "\n".join([head, sep, *body])
    if fmt == "JSON":
        import json

        return json.dumps(
            {
                "meta": [{"name": n} for n in names],
                "data": [dict(zip(names, [_json_v(v) for v in r])) for r in rows],
                "rows": len(rows),
            },
            default=str,
        )
    if fmt == "JSONCompact":
        import json

        return json.dumps(
            {
                "meta": [{"name": n} for n in names],
                "data": [[_json_v(v) for v in r] for r in rows],
                "rows": len(rows),
            },
            default=str,
        )
    if fmt == "TSKV":
        return "\n".join(
            "\t".join(f"{n}={_fmt_cell(v)}" for n, v in zip(names, r)) for r in rows
        )
    if fmt == "XML":
        out = ["<result>"]
        for r in rows:
            out.append("  <row>")
            out += [f"    <{n}>{_fmt_cell(v)}</{n}>" for n, v in zip(names, r)]
            out.append("  </row>")
        out.append("</result>")
        return "\n".join(out)
    raise ValueError(f"unsupported output rendering {fmt!r}")


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'" + v.replace("'", "\\'") + "'"
    return str(v)


def _json_v(v):
    import datetime

    if isinstance(v, (datetime.date, datetime.datetime)):
        return str(v)
    return v
