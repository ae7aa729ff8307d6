"""SparkSession construction tuned for this engine.

Local test profile: one JVM, ``local[N]`` threads. Cluster profile: the same
settings minus driver-memory are what we'd ship to a 1000-executor job —
AQE on (runtime re-plan, skew-join splitting, partition coalescing), UTC
session time zone (oracle comparability), ANSI off (ClickHouse wraps integer
overflow silently — SURVEY.md §1.3), Arrow enabled for the pandas-UDF path.

Reference analogue: ``max_threads`` / settings profile
(/root/reference/src/Core/Settings.h) — here everything maps onto Spark conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Scale-aware defaults. At 100 TB these are overridden per-cluster; what
# matters is that they are *declared here* rather than hard-coded at call
# sites: shuffle partitioning is the single biggest lever at scale.
DEFAULT_CONFS: dict[str, str] = {
    # AQE: coalesce small shuffle partitions, split skewed ones, runtime
    # re-plan sort-merge -> broadcast when a side turns out small.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # ClickHouse integer arithmetic wraps (C++ semantics); ANSI would raise.
    "spark.sql.ansi.enabled": "false",
    # ClickHouse count() takes zero args (AggregateFunctionCount.cpp).
    "spark.sql.legacy.allowParameterlessCount": "true",
    # DuckDB oracle compares naive-UTC timestamps.
    "spark.sql.session.timeZone": "UTC",
    # Arrow transfer for pandas UDFs (the minhash/funnel/ANN path).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Parquet TIMESTAMP(NANOS) (events.ts) is unreadable as TimestampType in
    # Spark 4 — read as long and convert at load (engine.read_parquet_table).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Broadcast threshold: dims (region/nation/supplier/customer at test SF)
    # should broadcast; AQE also converts at runtime.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Files: pack small test files; at 100 TB the default 128m is right.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # Parquet: enable predicate pushdown machinery explicitly (defaults on;
    # pinned so a vendor default-flip can't silently disable pruning).
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.optimizer.dynamicPartitionPruning.enabled": "true",
}


def get_spark(
    app_name: str = "clickhouse_23_3_19_32_lts_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``SPARK_GRAFT_CPUS`` (driver env) controls local parallelism; shuffle
    partitions default to the same number — on a real cluster you would set
    this to ~2-3x total cores instead and let AQE coalesce.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    # Python workers must import this package (exact-hash pandas UDFs pickle
    # by reference). Workers inherit the JVM's environment, which inherits
    # ours — export the package root on PYTHONPATH before the JVM launches.
    # On a real cluster the equivalent is shipping the wheel via --py-files.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{pp}" if pp else pkg_root
        )

    builder = SparkSession.builder.appName(app_name).master(master)
    confs = dict(DEFAULT_CONFS)
    confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if master.startswith("local"):
        confs.setdefault(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")
        )
        confs.setdefault("spark.ui.enabled", "false")
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try:
        from clickhouse_23_3_19_32_lts_spark.functions.chhash import register_hash_udfs
        from clickhouse_23_3_19_32_lts_spark.functions.h3_udfs import register_h3_udfs
        from clickhouse_23_3_19_32_lts_spark.functions.besteffort_udfs import (
            register_besteffort_udfs,
        )
        from clickhouse_23_3_19_32_lts_spark.functions.s2_udfs import register_s2_udfs
        from clickhouse_23_3_19_32_lts_spark.functions.sql_udfs import register_sql_udfs

        from clickhouse_23_3_19_32_lts_spark.functions.variants2 import (
            register_variant_udfs,
        )

        register_sql_udfs(spark)
        register_hash_udfs(spark)
        register_h3_udfs(spark)
        register_s2_udfs(spark)
        register_besteffort_udfs(spark)
        register_variant_udfs(spark)
    except Exception:  # noqa: BLE001 — SQL UDF names are additive, never fatal
        pass
    return spark
