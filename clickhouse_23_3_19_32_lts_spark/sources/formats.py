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
    if fmt not in FORMAT_MAP:
        raise ValueError(f"unsupported format {fmt!r}; known: {sorted(FORMAT_MAP)}")
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
