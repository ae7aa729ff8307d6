"""MergeTree-family table policies: the reference's merge-time semantics
(Replacing/Summing/Aggregating/Collapsing/VersionedCollapsing —
src/Processors/Merges/Algorithms/*.cpp) re-expressed as read-time views
(= FINAL) plus a compaction job (= OPTIMIZE FINAL), and mutations
(ALTER UPDATE/DELETE, src/Interpreters/MutationsInterpreter.h:37) as
partition rewrites.

Spark-first shape:
  - FINAL is a deterministic window/groupBy over the key columns — one
    shuffle on the table's ORDER BY key, the same key MergeTree sorts by;
    on a bucketed/sorted-written table Catalyst can drop that exchange.
  - compact() materializes FINAL back to storage so subsequent reads skip
    the dedup work — exactly the merge the reference runs in background.
  - mutations rewrite only the partitions the predicate can touch
    (partition-pruned read-filter-overwrite, Delta-style without the log).
  - TTL (TTLTransform.h:15) = the same compaction with a time filter.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# FINAL views (read-time policy application)
# ---------------------------------------------------------------------------


def replacing_final(
    df: DataFrame, keys: list[str], version: str | None = None
) -> DataFrame:
    """ReplacingMergeTree FINAL (ReplacingSortedAlgorithm.cpp): one row per
    key — the max-version row (ties: an arbitrary but deterministic last;
    we take the max over all remaining columns as tiebreak)."""
    others = [c for c in df.columns if c not in keys and c != version]
    order = ([F.desc(version)] if version else []) + [F.desc(c) for c in others]
    if not order:
        return df.dropDuplicates(keys)
    w = W.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    )


def summing_final(df: DataFrame, keys: list[str], sum_cols: list[str] | None = None) -> DataFrame:
    """SummingMergeTree FINAL (SummingSortedAlgorithm.cpp): numeric columns
    summed per key; non-summed, non-key columns take an arbitrary
    (deterministically: first by sum-col order) value."""
    if sum_cols is None:
        sum_cols = [
            c for c, t in df.dtypes
            if c not in keys and t in ("bigint", "int", "smallint", "tinyint", "double", "float")
            or t.startswith("decimal")
        ]
    others = [c for c in df.columns if c not in keys and c not in sum_cols]
    aggs = [F.sum(c).alias(c) for c in sum_cols] + [F.min(c).alias(c) for c in others]
    return df.groupBy(*keys).agg(*aggs).select(*df.columns)


def aggregating_final(
    df: DataFrame, keys: list[str], aggs: dict[str, Column]
) -> DataFrame:
    """AggregatingMergeTree FINAL: caller-specified aggregate per column —
    the -State/-Merge combinator surface (SURVEY §7 hard list) made explicit:
    Spark's partial aggregation plays the State role internally."""
    return df.groupBy(*keys).agg(*[c.alias(n) for n, c in aggs.items()])


def collapsing_final(df: DataFrame, keys: list[str], sign: str) -> DataFrame:
    """CollapsingMergeTree FINAL (CollapsingSortedAlgorithm.cpp): +1/-1 rows
    cancel pairwise per key; a key survives iff sum(sign) > 0, represented
    by its (deterministically) last +1 row."""
    counts = df.groupBy(*keys).agg(F.sum(sign).alias("__s"))
    survivors = counts.filter(F.col("__s") > 0).drop("__s")
    plus = df.filter(F.col(sign) == 1)
    others = [c for c in df.columns if c not in keys and c != sign]
    w = W.partitionBy(*keys).orderBy(*[F.desc(c) for c in others] or [F.lit(1)])
    latest_plus = (
        plus.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    )
    return latest_plus.join(survivors, on=keys, how="left_semi")


def versioned_collapsing_final(
    df: DataFrame, keys: list[str], sign: str, version: str
) -> DataFrame:
    """VersionedCollapsingMergeTree FINAL: the max-version row per key wins;
    the key survives iff that row's sign is +1."""
    w = W.partitionBy(*keys).orderBy(F.desc(version), F.asc(sign))
    latest = (
        df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    )
    return latest.filter(F.col(sign) == 1)


def ttl_filter(df: DataFrame, ts_col: str, ttl_expr: Column) -> DataFrame:
    """TTL expiry (TTLTransform.h:15): keep rows whose ts is inside the TTL
    horizon. `ttl_expr` is the cutoff timestamp column/literal."""
    return df.filter(F.col(ts_col) >= ttl_expr)


# ---------------------------------------------------------------------------
# Managed table: partitioned parquet + policy + compaction + mutations
# ---------------------------------------------------------------------------


@dataclass
class PolicyTable:
    """A parquet-backed table with MergeTree-style declaration:
    PARTITION BY (hive dirs), ORDER BY (sort-within-partitions on write →
    parquet row-group min/max pruning ≈ the primary-key index), and an
    engine policy applied on read via final().
    """

    spark: SparkSession
    path: str
    order_by: list[str] = field(default_factory=list)
    partition_by: list[str] = field(default_factory=list)
    policy: str = "plain"  # plain | replacing | summing | collapsing | versioned
    keys: list[str] = field(default_factory=list)
    version: str | None = None
    sign: str | None = None
    sum_cols: list[str] | None = None
    # CHECK constraints (CheckConstraintsTransform.cpp): name -> boolean Column
    constraints: dict = field(default_factory=dict)
    # column DEFAULTs (AddingDefaultsTransform.cpp): name -> Column/literal
    defaults: dict = field(default_factory=dict)
    # CLUSTER BY: hash-bucketed storage on the join/agg key. This is the
    # Spark analogue of MergeTree's keyed storage
    # (MergeTreeDataSelectExecutor.cpp reads parts already organized by the
    # key): two tables bucketed on the same key with the same bucket count
    # join WITHOUT any Exchange — at 100 TB this deletes the single biggest
    # shuffle in every fact-fact join (lineitem⋈orders; SCALING.md §Joins).
    # Bucket metadata lives in the catalog, so bucketed tables need a
    # table_name and are read back via spark.table(), not the bare path.
    bucket_by: list[str] = field(default_factory=list)
    num_buckets: int = 32
    table_name: str | None = None

    # -- write path --------------------------------------------------------
    def insert(self, df: DataFrame, mode: str = "append") -> None:
        """INSERT: defaults filled, CHECK constraints enforced (insert
        fails on violation, like the reference), sorted within partitions
        by ORDER BY (clusters row groups for min/max pruning — the
        MergeTree sort), written hive-partitioned."""
        for name, default in self.defaults.items():
            d = default if isinstance(default, Column) else F.lit(default)
            if name in df.columns:
                df = df.withColumn(name, F.coalesce(F.col(name), d))
            else:
                df = df.withColumn(name, d)
        for name, cond in self.constraints.items():
            bad = df.filter(~cond).count()
            if bad:
                raise ValueError(f"CHECK constraint {name!r} violated by {bad} row(s)")
        if self.bucket_by:
            self._write_bucketed(df, mode)
            return
        if self.order_by:
            df = df.sortWithinPartitions(*self.order_by)
        writer = df.write.mode(mode)
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(self.path)

    def _write_bucketed(self, df: DataFrame, mode: str) -> None:
        """Bucketed write: parquet files hash-clustered on bucket_by with
        per-bucket sortBy (order_by, else the bucket key) — the scan comes
        back with outputPartitioning=HashPartitioning(bucket_by), so equi-
        joins and groupBys on the key plan ZERO exchanges."""
        if not self.table_name:
            raise ValueError("bucketed PolicyTable needs table_name (bucket metadata lives in the catalog)")
        writer = (
            df.write.mode(mode)
            .format("parquet")
            .option("path", self.path)
            .bucketBy(self.num_buckets, *self.bucket_by)
            .sortBy(*(self.order_by or self.bucket_by))
        )
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.saveAsTable(self.table_name)

    # -- read path ---------------------------------------------------------
    def read(self) -> DataFrame:
        """Raw read (ClickHouse SELECT without FINAL: may see duplicates)."""
        if self.bucket_by and self.table_name:
            # the bare parquet path has no bucket spec; only the catalog
            # table carries outputPartitioning into the plan
            return self.spark.table(self.table_name)
        return self.spark.read.parquet(self.path)

    def final(self) -> DataFrame:
        """SELECT ... FINAL: policy applied on read."""
        df = self.read()
        if self.policy == "plain":
            return df
        if self.policy == "replacing":
            return replacing_final(df, self.keys, self.version)
        if self.policy == "summing":
            return summing_final(df, self.keys, self.sum_cols)
        if self.policy == "collapsing":
            return collapsing_final(df, self.keys, self.sign)
        if self.policy == "versioned":
            return versioned_collapsing_final(df, self.keys, self.sign, self.version)
        raise ValueError(f"unknown policy {self.policy!r}")

    # -- maintenance -------------------------------------------------------
    def optimize(self) -> None:
        """OPTIMIZE TABLE ... FINAL: materialize the policy back to storage
        (the background merge, run on demand)."""
        self._overwrite(self.final())

    def _overwrite(self, df: DataFrame) -> None:
        if self.bucket_by:
            # catalog-managed rewrite. The input plan reads the table being
            # replaced, so materialize DISTRIBUTED to a tmp path first,
            # then recreate with the same bucket spec — never .collect()
            tmpb = self.path.rstrip("/") + ".__compact_tmp"
            df.write.mode("overwrite").parquet(tmpb)
            mat = self.spark.read.parquet(tmpb)
            self.spark.sql(f"DROP TABLE IF EXISTS {self.table_name}")
            shutil.rmtree(self.path, ignore_errors=True)
            self._write_bucketed(mat, "overwrite")
            shutil.rmtree(tmpb, ignore_errors=True)
            return
        tmp = self.path.rstrip("/") + ".__compact_tmp"
        if self.order_by:
            df = df.sortWithinPartitions(*self.order_by)
        writer = df.write.mode("overwrite")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(tmp)
        shutil.rmtree(self.path)
        os.rename(tmp, self.path)

    # -- mutations (ALTER TABLE UPDATE / DELETE) ---------------------------
    def _mutate(self, transform, partition_predicate: Column | None) -> None:
        """Run a table rewrite. With partition_by + a partition predicate,
        only the touched partitions are read (partition-pruned scan) and
        rewritten in place via dynamic partition overwrite — untouched
        partitions' files are never opened. Otherwise full rewrite."""
        if self.partition_by and partition_predicate is not None:
            touched = self.read().filter(partition_predicate)
            df = transform(touched)
            if self.order_by:
                df = df.sortWithinPartitions(*self.order_by)
            (
                df.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(*self.partition_by)
                .parquet(self.path)
            )
        else:
            self._overwrite(transform(self.read()))

    def delete_where(
        self, predicate: Column, partition_predicate: Column | None = None
    ) -> None:
        """Lightweight DELETE (ParserDeleteQuery.cpp): rewrite minus matches.
        Pass partition_predicate (a predicate on partition columns covering
        every possibly-matching partition) to rewrite only those partitions."""
        self._mutate(lambda df: df.filter(~predicate), partition_predicate)

    def update_where(
        self,
        predicate: Column,
        assignments: dict[str, Column],
        partition_predicate: Column | None = None,
    ) -> None:
        """ALTER TABLE UPDATE col = expr WHERE pred: conditional rewrite."""

        def transform(df: DataFrame) -> DataFrame:
            for col, expr in assignments.items():
                df = df.withColumn(col, F.when(predicate, expr).otherwise(F.col(col)))
            return df

        self._mutate(transform, partition_predicate)
