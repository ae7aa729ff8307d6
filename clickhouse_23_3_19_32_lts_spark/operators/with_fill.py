"""ORDER BY ... WITH FILL [FROM f] [TO t] [STEP s] + INTERPOLATE.

Reference: FillingTransform (src/Processors/Transforms/FillingTransform.h:16)
inserts rows for missing key values in sorted output; INTERPOLATE computes
expressions for the inserted rows (default: previous value).

Spark plan: generate the complete grid with sequence()+explode (distributed
— the grid generator is one row per partition-range, not a driver loop),
left-join the data onto it, then forward-fill interpolated columns with
last(ignorenulls) windows. For per-group fill pass `partition_by`.
"""

from __future__ import annotations

from datetime import date, datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _lit(v):
    return v if isinstance(v, Column) else F.lit(v)


def with_fill(
    df: DataFrame,
    col: str,
    from_=None,
    to=None,
    step=1,
    partition_by: list[str] | None = None,
    interpolate: list[str] | None = None,
) -> DataFrame:
    """Fill gaps in `col` with stepped values; other columns NULL unless
    interpolated (forward-filled).

    Numeric columns: step is a number; from/to default to per-frame min/max
    (TO is exclusive, matching ClickHouse). Date/timestamp columns: step is
    a number of seconds (or a string like '1 hour' handled by the caller
    via seconds).
    """
    partition_by = partition_by or []
    interpolate = interpolate or []

    dt = dict(df.dtypes)[col]
    is_time = dt in ("timestamp", "date")

    # Frame bounds: explicit, else min/max per partition group.
    agg_cols = [F.min(col).alias("__lo"), F.max(col).alias("__hi")]
    bounds = df.groupBy(*partition_by).agg(*agg_cols) if partition_by else df.agg(*agg_cols)

    lo = _lit(from_) if from_ is not None else F.col("__lo")
    hi = _lit(to) - (F.lit(1) if not is_time else F.expr(f"INTERVAL {int(step)} SECOND")) if to is not None else F.col("__hi")

    if is_time:
        grid_col = F.explode(
            F.sequence(
                lo.cast("timestamp"),
                hi.cast("timestamp"),
                F.expr(f"INTERVAL {int(step)} SECOND"),
            )
        )
    else:
        grid_col = F.explode(F.sequence(lo.cast("long"), hi.cast("long"), F.lit(int(step))))

    grid = bounds.select(*partition_by, grid_col.alias(col))
    if is_time and dt == "date":
        grid = grid.withColumn(col, F.col(col).cast("date"))

    joined = grid.join(df, on=[*partition_by, col], how="left")

    if interpolate:
        order = [F.col(col).asc()]
        w = (
            W.partitionBy(*partition_by).orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
            if partition_by
            else W.orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
        )
        # list form: INTERPOLATE (c) — carry previous value forward;
        # dict form: INTERPOLATE (c AS expr(prev)) — expr over the carried
        # value (the reference evaluates the expr against the previous row)
        items = (
            interpolate.items() if isinstance(interpolate, dict) else [(c, None) for c in interpolate]
        )
        for c, expr_fn in items:
            prev = F.last(c, ignorenulls=True).over(w)
            joined = joined.withColumn(
                c,
                F.coalesce(F.col(c), expr_fn(prev) if expr_fn is not None else prev),
            )

    return joined.orderBy(*partition_by, col)
