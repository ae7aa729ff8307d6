"""Aggregate projections: materialized summary tables with query rewrite.

Reference: projection substitution — optimizeUseAggregateProjection.cpp /
optimizeUseNormalProjection.cpp (SURVEY §4.1 'what needs custom work in
Spark: implement as a query-rewrite layer over registered summary tables').
ClickHouse stores per-part partial aggregates and answers matching GROUP BY
queries from them; here the summary is a parquet table of partial
aggregates (sum/count/min/max per group) that

  - answers any query whose keys ⊆ projection keys and whose aggregates
    are derivable from the stored partials (sum, count, min, max, avg =
    sum/count) — a coarser GROUP BY re-aggregates the partials, never the
    base table;
  - refreshes incrementally: a new data batch folds in as one partial-agg
    union + re-aggregation (the AggregatingMergeTree merge), cost
    O(|batch| + |groups|), never a base-table rescan.

At 100 TB this is the difference between scanning the fact table and
scanning a |groups|-row summary — the reference's headline trick for
dashboard-style workloads, reproduced storage-natively.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# aggregates derivable from the stored partials
_DERIVABLE = {"sum", "count", "min", "max", "avg", "uniq"}


class AggregateProjection:
    """A materialized partial-aggregate table over (keys, measures).

    >>> proj = AggregateProjection(spark, path, keys=["l_returnflag"],
    ...                            measures=["l_quantity", "l_extendedprice"])
    >>> proj.build(lineitem_df)
    >>> proj.query(["l_returnflag"], {"s": ("sum", "l_quantity")})
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: list[str],
        measures: list[str],
        uniq_measures: list[str] | None = None,
    ):
        self.spark = spark
        self.path = path
        self.keys = keys
        self.measures = measures
        # columns whose distinct count is served from a stored HLL sketch
        # state (functions.states.uniqState — constant-size, mergeable,
        # the AggregateFunction(uniq, T) column of AggregatingMergeTree)
        self.uniq_measures = uniq_measures or []

    # -- storage schema: per group, per measure: sum/count/min/max ---------
    def _partials(self, df: DataFrame) -> DataFrame:
        aggs = []
        for m in self.measures:
            aggs += [
                F.sum(m).alias(f"__sum_{m}"),
                F.count(m).alias(f"__cnt_{m}"),
                F.min(m).alias(f"__min_{m}"),
                F.max(m).alias(f"__max_{m}"),
            ]
        for m in self.uniq_measures:
            aggs.append(F.hll_sketch_agg(m).alias(f"__hll_{m}"))
        aggs.append(F.count(F.lit(1)).alias("__rows"))
        return df.groupBy(*self.keys).agg(*aggs)

    def _merge(self, partials: DataFrame) -> DataFrame:
        """Re-aggregate partials (the -Merge combinator over stored -State)."""
        aggs = []
        for m in self.measures:
            aggs += [
                F.sum(f"__sum_{m}").alias(f"__sum_{m}"),
                F.sum(f"__cnt_{m}").alias(f"__cnt_{m}"),
                F.min(f"__min_{m}").alias(f"__min_{m}"),
                F.max(f"__max_{m}").alias(f"__max_{m}"),
            ]
        for m in self.uniq_measures:
            aggs.append(F.hll_union_agg(f"__hll_{m}").alias(f"__hll_{m}"))
        aggs.append(F.sum("__rows").alias("__rows"))
        return partials.groupBy(*self.keys).agg(*aggs)

    # -- lifecycle ---------------------------------------------------------
    def build(self, df: DataFrame) -> None:
        """Materialize from the base table (one full scan, once)."""
        self._partials(df).write.mode("overwrite").parquet(self.path)

    def refresh(self, new_data: DataFrame) -> None:
        """Fold a new batch in: partial-agg the batch, union with the
        stored summary, re-aggregate. Never rescans the base table."""
        combined = self._merge(self.read().unionByName(self._partials(new_data)))
        tmp = self.path.rstrip("/") + ".__tmp"
        combined.write.mode("overwrite").parquet(tmp)
        import shutil

        shutil.rmtree(self.path)
        os.rename(tmp, self.path)

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    # -- query rewrite -----------------------------------------------------
    def can_answer(self, group_cols: list[str], aggs: dict[str, tuple[str, str]]) -> bool:
        """True iff keys ⊆ projection keys and every aggregate derives from
        the stored partials. aggs: out_name -> (fn, measure|'*')."""
        if not set(group_cols) <= set(self.keys):
            return False
        for fn, m in aggs.values():
            if fn not in _DERIVABLE:
                return False
            if fn == "count" and m == "*":
                continue
            if fn == "uniq":
                if m not in self.uniq_measures:
                    return False
                continue
            if m not in self.measures:
                return False
        return True

    def query(self, group_cols: list[str], aggs: dict[str, tuple[str, str]]) -> DataFrame:
        """Answer GROUP BY group_cols with aggs from the summary.

        Raises ValueError when can_answer() is False — callers (or the
        Engine rewrite hook) fall back to the base table.
        """
        if not self.can_answer(group_cols, aggs):
            raise ValueError("projection cannot answer this query")
        out_aggs: list[Column] = []
        for name, (fn, m) in aggs.items():
            if fn == "sum":
                out_aggs.append(F.sum(f"__sum_{m}").alias(name))
            elif fn == "count":
                out_aggs.append(
                    F.sum("__rows").alias(name) if m == "*" else F.sum(f"__cnt_{m}").alias(name)
                )
            elif fn == "min":
                out_aggs.append(F.min(f"__min_{m}").alias(name))
            elif fn == "max":
                out_aggs.append(F.max(f"__max_{m}").alias(name))
            elif fn == "avg":
                out_aggs.append((F.sum(f"__sum_{m}") / F.sum(f"__cnt_{m}")).alias(name))
            elif fn == "uniq":
                out_aggs.append(
                    F.hll_sketch_estimate(F.hll_union_agg(f"__hll_{m}")).alias(name)
                )
        return self.read().groupBy(*group_cols).agg(*out_aggs)


class ProjectionRegistry:
    """The optimizeUseAggregateProjection analogue: try every registered
    projection for a (table, group_cols, aggs) aggregation; first match
    answers, else compute from the base DataFrame."""

    def __init__(self):
        self._projections: dict[str, list[AggregateProjection]] = {}

    def register(self, table: str, projection: AggregateProjection) -> None:
        self._projections.setdefault(table, []).append(projection)

    def aggregate(
        self,
        table: str,
        base_df: DataFrame,
        group_cols: list[str],
        aggs: dict[str, tuple[str, str]],
    ) -> tuple[DataFrame, bool]:
        """Returns (result, used_projection)."""
        for proj in self._projections.get(table, []):
            if proj.can_answer(group_cols, aggs):
                return proj.query(group_cols, aggs), True
        out_aggs = []
        for name, (fn, m) in aggs.items():
            col = F.lit(1) if m == "*" else F.col(m)
            if fn == "uniq":
                # same estimator as the projection path (one-shot sketch)
                out_aggs.append(F.hll_sketch_estimate(F.hll_sketch_agg(col)).alias(name))
            else:
                out_aggs.append(getattr(F, fn if fn != "count" else "count")(col).alias(name))
        return base_df.groupBy(*group_cols).agg(*out_aggs), False
