"""LIVE VIEW (src/Storages/LiveView/StorageLiveView.cpp).

The reference keeps a stored query whose result block is re-evaluated when
source tables change; clients `WATCH` it and receive (result, _version)
pairs whenever the content hash moves.

Spark mapping: the stored query is a lazy DataFrame (or CH-dialect SQL
string); `watch()` re-executes it and bumps `_version` only when the
result's content hash changes — the same "version increments iff the block
changed" contract, with the hash computed DISTRIBUTEDLY (xxhash64 per row,
bit-xor aggregated: order-insensitive, one short job, no driver collect).
For push-style refresh over streams, pair the same query with
streaming/windows.py's incremental materialized views; LIVE VIEW is the
pull/WATCH surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class LiveView:
    def __init__(self, spark: SparkSession, query: "DataFrame | str", name: str = "live_view"):
        self.spark = spark
        self.name = name
        self._query = query
        self._version = 0
        self._last_hash: int | None = None

    def _df(self) -> DataFrame:
        if isinstance(self._query, str):
            from clickhouse_23_3_19_32_lts_spark.dialect import ch_sql

            return ch_sql(self.spark, self._query)
        return self._query

    def _content_hash(self, df: DataFrame) -> int:
        h = df.select(
            F.xxhash64(*[F.col(c).cast("string") for c in df.columns]).alias("__h")
        ).agg(F.bit_xor("__h").alias("h"))
        row = h.first()
        return 0 if row is None or row["h"] is None else row["h"]

    def watch(self) -> tuple[DataFrame, int]:
        """(result, _version): version bumps iff the content changed since
        the previous watch — StorageLiveView's WATCH contract."""
        df = self._df()
        content = self._content_hash(df)
        if content != self._last_hash:
            self._version += 1
            self._last_hash = content
        return df, self._version

    def refresh(self) -> int:
        """Force re-evaluation; returns the current version."""
        return self.watch()[1]
