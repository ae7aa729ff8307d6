"""Table functions (SURVEY §2.1, src/TableFunctions/ — 29 producers).

numbers/zeros → spark.range (distributed, partitioned — numbers(N) at any N
is one range split across executors, never a driver loop); generateRandom →
rand(seed)-derived columns; values → createDataFrame; merge → unionByName
over regexp-matched registry tables (StorageMerge.cpp). file/url/s3 are
read_format() (formats.py); remote/cluster are native Spark distribution.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DataType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructType,
    TimestampType,
)


def numbers(spark: SparkSession, n: int, start: int = 0, partitions: int | None = None) -> DataFrame:
    """numbers(N) / numbers(start, N): a `number` column of consecutive
    UInt64s (TableFunctionNumbers.cpp)."""
    rng = spark.range(start, start + n, 1, *((partitions,) if partitions else ()))
    return rng.select(F.col("id").alias("number"))


def zeros(spark: SparkSession, n: int) -> DataFrame:
    """zeros(N): N zero rows (TableFunctionZeros.cpp) — constant-folding
    benchmark source."""
    return spark.range(n).select(F.lit(0).alias("zero"))


def generate_random(
    spark: SparkSession, schema: StructType, n: int, seed: int = 42
) -> DataFrame:
    """generateRandom(schema, seed): deterministic pseudo-random rows
    (TableFunctionGenerateRandom.cpp). Column values derive from rand(seed)
    so the same (schema, n, seed) always produces the same table."""
    df = spark.range(n)
    for i, field in enumerate(schema.fields):
        r = F.rand(seed + i)
        t = field.dataType
        if isinstance(t, (IntegerType, LongType)):
            col = (r * (1 << 31)).cast(t)
        elif isinstance(t, (FloatType, DoubleType)):
            col = (r * 1000.0).cast(t)
        elif isinstance(t, StringType):
            col = F.concat(F.lit("s"), ((r * (1 << 31)).cast("long")).cast("string"))
        elif isinstance(t, TimestampType):
            col = F.timestamp_seconds((F.lit(1704067200) + (r * 86400 * 365).cast("long")))
        elif isinstance(t, DateType):
            col = F.date_add(F.lit("2024-01-01").cast("date"), (r * 365).cast("int"))
        else:
            raise ValueError(f"generateRandom: unsupported type {t}")
        df = df.withColumn(field.name, col)
    return df.drop("id")


def values_table(spark: SparkSession, columns: list[str], rows: list[tuple]) -> DataFrame:
    """VALUES (...) / values table function."""
    return spark.createDataFrame(rows, schema=columns)


def merge_tables(tables: dict[str, DataFrame], pattern: str) -> DataFrame:
    """merge(db, 'regexp') / StorageMerge: unionByName over matching tables,
    with a `_table` virtual column (same as the reference's)."""
    matched = {name: df for name, df in sorted(tables.items()) if re.fullmatch(pattern, name)}
    if not matched:
        raise ValueError(f"merge: no tables match {pattern!r}")
    parts = [
        df.withColumn("_table", F.lit(name)) for name, df in matched.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out
