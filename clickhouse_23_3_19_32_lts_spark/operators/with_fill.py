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


# --- full FillingTransform surface: multi-column, DESC, FROM/TO/STEP,
# INTERPOLATE — the grid model ---------------------------------------------
#
# Observed reference semantics (00995_order_by_with_fill,
# 01379_with_fill_several_columns): each fill column lays a STEP-grid
# anchored at FROM (else the first value in sort direction), ending at TO
# (exclusive) else the last value (inclusive); deeper fill columns anchor
# per distinct prefix — at FROM, else at that prefix's first real value,
# else the type default for prefixes with no real rows. Real rows always
# appear; grid points colliding with real keys dedupe away. This is fully
# parallel (no adjacent-pair scan): bounds are aggregates, grids are
# sequence()+explode, dedup is an anti-join.

from dataclasses import dataclass


@dataclass
class FillItem:
    name: str
    desc: bool = False
    frm: object | None = None   # Column or None
    to: object | None = None    # Column or None
    step: float | None = None   # in domain units (days / seconds / value)
    cal: str | None = None      # "month" for calendar-month stepping


def _dom(c: Column, dt: str, cal: str | None = None) -> Column:
    """Map a value column into the double 'fill domain'."""
    if cal == "month":
        return F.months_between(c, F.lit("1970-01-01")).cast("double")
    if dt == "date":
        return F.datediff(c, F.lit("1970-01-01")).cast("double")
    if dt.startswith("timestamp"):
        return c.cast("timestamp").cast("double")
    return c.cast("double")


def _undom(n: Column, dt: str, cal: str | None = None) -> Column:
    if cal == "month":
        base = F.add_months(F.to_date(F.lit("1970-01-01")), n.cast("int"))
        return base if dt == "date" else base.cast("timestamp").cast(dt)
    if dt == "date":
        return F.date_add(F.to_date(F.lit("1970-01-01")), n.cast("int"))
    if dt.startswith("timestamp"):
        return n.cast("timestamp").cast(dt)
    return n.cast(dt)


def _type_default_col(dt):
    from pyspark.sql import types as T

    if isinstance(dt, T.StringType):
        return F.lit("")
    if isinstance(dt, T.DateType):
        return F.lit("1970-01-01").cast("date")
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return F.lit(0).cast("timestamp").cast(dt)
    if isinstance(dt, T.ArrayType):
        return F.array().cast(dt)
    if isinstance(dt, T.BooleanType):
        return F.lit(False)
    return F.lit(0).cast(dt)


def _grid_points(anchor: Column, end: Column, step: float, inclusive: Column) -> Column:
    """Array of anchor + k*step for k=0..K staying within end (direction of
    step); `inclusive` (bool column) marks a real-value end (grid may land ON
    it — the anti-join dedupes), vs an exclusive TO bound."""
    span = (end - anchor) / F.lit(step)
    k_incl = F.floor(span + F.lit(1e-9))
    k_excl = F.ceil(span - F.lit(1e-9)) - 1
    k = F.when(inclusive, k_incl).otherwise(k_excl)
    k = F.when(k < 0, F.lit(-1)).otherwise(k)
    idx = F.when(k >= 0, F.sequence(F.lit(0).cast("long"), k.cast("long"))).otherwise(
        F.array().cast("array<long>")
    )
    return F.transform(idx, lambda i: anchor + i.cast("double") * F.lit(step))


def fill_grid(
    df: DataFrame,
    items: list[FillItem],
    tail_order: list | None = None,
    interpolate: list | None = None,
    limit: int | None = None,
) -> DataFrame:
    """The full WITH FILL surface over a sorted result (see module notes)."""
    dtypes = dict(df.dtypes)
    fields = {f.name: f.dataType for f in df.schema.fields}
    for it in items:
        if it.name not in dtypes:
            raise ValueError(f"WITH FILL column {it.name!r} not in result")
        if it.step is None:
            it.step = 1.0
        elif it.step == 0:
            raise ValueError("WITH FILL STEP must be nonzero")
        elif (it.step > 0) == it.desc:
            # an explicit step against the sort direction is the reference's
            # serverError 475 (FillingTransform::transformSortDescription)
            raise ValueError("WITH FILL STEP sign contradicts sort direction")
        if it.desc and it.step > 0:
            it.step = -it.step

    # numeric-domain copy of the fill columns
    dcols = [f"__f{i}" for i in range(len(items))]
    src = df
    for i, it in enumerate(items):
        src = src.withColumn(dcols[i], _dom(F.col(it.name), dtypes[it.name], it.cal))

    # progressive grid: one row per grid combination, in domain doubles
    grid = None
    for i, it in enumerate(items):
        prefix = dcols[:i]
        agg_first = F.max(dcols[i]) if it.desc else F.min(dcols[i])
        agg_last = F.min(dcols[i]) if it.desc else F.max(dcols[i])
        if i == 0:
            b = src.agg(agg_first.alias("__lo"), agg_last.alias("__hi"))
            anchor = _dom(it.frm, dtypes[it.name], it.cal) if it.frm is not None else F.col("__lo")
            end = _dom(it.to, dtypes[it.name], it.cal) if it.to is not None else F.col("__hi")
            pts = _grid_points(anchor, end, it.step, F.lit(it.to is None))
            grid = b.select(F.explode(pts).alias(dcols[0]))
        else:
            bounds = src.groupBy(*prefix).agg(
                agg_first.alias("__lo"), agg_last.alias("__hi")
            )
            g = grid.join(bounds, prefix, "left")
            has_real = F.col("__lo").isNotNull()
            if it.frm is not None:
                anchor = _dom(it.frm, dtypes[it.name], it.cal)
            else:
                anchor = F.when(has_real, F.col("__lo")).otherwise(F.lit(0.0))
            if it.to is not None:
                end, incl = _dom(it.to, dtypes[it.name], it.cal), F.lit(False)
            else:
                end = F.when(has_real, F.col("__hi")).otherwise(anchor)
                incl = F.lit(True)
            pts = _grid_points(anchor, end, it.step, incl)
            grid = g.select(*grid.columns, F.explode(pts).alias(dcols[i]))

    # inserted rows: grid combos minus real fill-keys, other columns default
    inserted = grid.join(src.select(*dcols).distinct(), dcols, "left_anti")
    sel = []
    for name in df.columns:
        if name in [it.name for it in items]:
            i = [it.name for it in items].index(name)
            sel.append(_undom(F.col(dcols[i]), dtypes[name], items[i].cal).alias(name))
        else:
            sel.append(_type_default_col(fields[name]).alias(name))
    inserted = inserted.select(*sel).withColumn("__ins", F.lit(1))
    out = df.withColumn("__ins", F.lit(0)).unionByName(inserted)

    order = [
        F.col(it.name).desc() if it.desc else F.col(it.name).asc() for it in items
    ]
    for t in tail_order or []:
        order.append(t)

    if interpolate:
        # window in output order; per CH the expression applies iteratively
        # to the previous row — exact for const / identity / affine (x ± c),
        # one application otherwise
        w = W.orderBy(*order).rowsBetween(W.unboundedPreceding, -1)
        for colname, kind, delta in interpolate:
            # rows before the first real row interpolate from the column's
            # type default (FillingTransform starts from default-initialized
            # interpolate state)
            prev = F.coalesce(
                F.last(F.when(F.col("__ins") == 0, F.col(colname)), ignorenulls=True).over(w),
                _type_default_col(fields[colname]),
            )
            run = F.count(F.when(F.col("__ins") == 0, F.lit(1))).over(
                W.orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
            )
            # rows since last real row (1-based among inserted)
            kth = F.row_number().over(W.orderBy(*order)) - F.coalesce(
                F.max(
                    F.when(F.col("__ins") == 0, F.row_number().over(W.orderBy(*order)))
                ).over(w),
                F.lit(0),
            )
            if kind == "const":
                val = delta
            elif kind == "identity":
                val = prev
            elif kind == "concat":
                val = F.concat(prev, F.repeat(F.expr(delta), kth.cast("int")))
            elif kind == "affine":
                val = prev + kth.cast("double") * F.lit(delta)
            else:  # single application fallback
                val = delta(prev)
            out = out.withColumn(
                colname,
                F.when(F.col("__ins") == 1, val.cast(dict(out.dtypes)[colname])).otherwise(
                    F.col(colname)
                ),
            )

    out = out.drop("__ins").orderBy(*order)
    if limit is not None:
        out = out.limit(limit)
    return out
