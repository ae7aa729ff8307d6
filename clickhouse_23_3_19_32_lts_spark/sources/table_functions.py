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


def url(
    spark: SparkSession, address: str, fmt: str = "CSV", schema=None, **options: str
) -> DataFrame:
    """url(URL, Format[, schema]) (TableFunctionURL.cpp).

    Spark reads http(s)/s3a/hdfs/file URIs through its Hadoop filesystem
    layer when the matching connector is on the classpath; the format goes
    through the same FORMAT_MAP as file(). Plain http(s) without a
    connector raises Spark's own loud datasource error — never a silent
    empty result."""
    from clickhouse_23_3_19_32_lts_spark.sources.formats import read_format

    return read_format(spark, address, fmt, schema=schema, **options)


def s3(
    spark: SparkSession, uri: str, fmt: str = "Parquet", schema=None, **options: str
) -> DataFrame:
    """s3(uri, Format[, schema]) (TableFunctionS3.cpp): the uri is handed
    to Spark's s3a filesystem (s3:// is rewritten to s3a://) — on a real
    cluster this is the hadoop-aws connector; reads distribute and prune
    exactly like file-based scans."""
    if uri.startswith("s3://"):
        uri = "s3a://" + uri[len("s3://"):]
    from clickhouse_23_3_19_32_lts_spark.sources.formats import read_format

    return read_format(spark, uri, fmt, schema=schema, **options)


def remote(
    spark: SparkSession, addresses: str, table: str, database: str | None = None
) -> DataFrame:
    """remote('host:port', db, table) (TableFunctionRemote.cpp).

    The reference fans a query out to shards; Spark's executors ARE the
    shards, so remote() over the engine's own catalog resolves to the local
    registered table — one logical table, distribution handled by Spark.
    Cross-cluster federation (a genuinely different Spark cluster) is out
    of a single SparkSession's model and raises."""
    name = table.split(".")[-1]
    try:
        return spark.table(name)
    except Exception as ex:  # noqa: BLE001
        raise ValueError(
            f"remote(): table {name!r} is not registered in this engine "
            f"(addresses {addresses!r} are advisory on Spark — executors are the shards)"
        ) from ex


def cluster(spark: SparkSession, cluster_name: str, table: str) -> DataFrame:
    """cluster('name', db.table) (TableFunctionRemote.cpp clusterAllReplicas
    alias) — same resolution as remote(): Spark owns distribution."""
    return remote(spark, cluster_name, table)


def jdbc(
    spark: SparkSession, jdbc_url: str, table: str, **options: str
) -> DataFrame:
    """jdbc/mysql/postgresql/odbc table functions (TableFunctionJDBC et
    al.): Spark's native JDBC source — predicate pushdown, partitioned
    reads via partitionColumn/lowerBound/upperBound options. Needs the
    driver jar on the classpath (loud ClassNotFound otherwise)."""
    reader = spark.read.format("jdbc").option("url", jdbc_url).option("dbtable", table)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def view(spark: SparkSession, subquery_sql: str) -> DataFrame:
    """view(SELECT ...) (TableFunctionView.cpp): run the subquery through
    the ClickHouse-dialect translator."""
    from clickhouse_23_3_19_32_lts_spark.dialect import ch_sql

    return ch_sql(spark, subquery_sql)


def mysql(
    spark: SparkSession, host_port: str, database: str, table: str,
    user: str = "", password: str = "", **options: str,
) -> DataFrame:
    """mysql('host:port', db, table, user, password)
    (TableFunctionMySQL.cpp) → Spark JDBC with a mysql:// URL."""
    return jdbc(
        spark,
        f"jdbc:mysql://{host_port}/{database}",
        table,
        user=user,
        password=password,
        **options,
    )


def postgresql(
    spark: SparkSession, host_port: str, database: str, table: str,
    user: str = "", password: str = "", **options: str,
) -> DataFrame:
    """postgresql('host:port', db, table, user, password)
    (TableFunctionPostgreSQL.cpp) → Spark JDBC with a postgresql:// URL."""
    return jdbc(
        spark,
        f"jdbc:postgresql://{host_port}/{database}",
        table,
        user=user,
        password=password,
        **options,
    )


def deltalake(spark: SparkSession, path: str, **options: str) -> DataFrame:
    """deltaLake(path) (TableFunctionDeltaLake.cpp) → spark.read.format
    ('delta'). Needs delta-spark on the classpath; raises Spark's
    DATA_SOURCE_NOT_FOUND otherwise (documented, not silently skipped)."""
    return spark.read.format("delta").options(**options).load(path)


def iceberg(spark: SparkSession, path_or_table: str, **options: str) -> DataFrame:
    """iceberg(path|table) (TableFunctionIceberg.cpp) → spark.read.format
    ('iceberg'). Needs iceberg-spark-runtime on the classpath."""
    reader = spark.read.format("iceberg").options(**options)
    try:
        return reader.load(path_or_table)
    except Exception:
        return spark.table(path_or_table)
